"""End-to-end test of the batching inference server (apps/serve.py):
real HTTP round-trips against an in-process server, results compared to
the direct Python API, and concurrent same-shape requests verified to be
served in one batched device call."""

import io
import threading
import urllib.request

import numpy as np
import pytest


@pytest.fixture(scope="module")
def server():
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from apps.serve import serve
    httpd = serve(host="127.0.0.1", port=0, weights=None, top_k=64,
                  max_batch=8, max_wait_ms=50.0)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield httpd
    httpd.service.stop()
    httpd.shutdown()


def _post(port, path, body):
    req = urllib.request.Request(f"http://127.0.0.1:{port}{path}",
                                 data=body, method="POST")
    with urllib.request.urlopen(req, timeout=120) as r:
        return r.read()


def _npz(**arrays):
    buf = io.BytesIO()
    np.savez(buf, **arrays)
    return buf.getvalue()


def test_detect_matches_direct_api(server):
    port = server.server_address[1]
    rng = np.random.default_rng(0)
    img = (rng.uniform(0, 255, (64, 96, 3))).astype(np.uint8)

    raw = _post(port, "/detect?threshold=0.012", _npz(image=img))
    out = np.load(io.BytesIO(raw))
    assert set(out.files) >= {"keypoints", "scores", "descriptors"}
    assert out["keypoints"].shape[1] == 2

    direct = server.service.xfeat.detectAndCompute(
        img, detection_threshold=0.012)[0]
    np.testing.assert_allclose(out["keypoints"], direct["keypoints"])
    np.testing.assert_allclose(out["scores"], direct["scores"], rtol=1e-6)


def test_concurrent_requests_batched(server):
    port = server.server_address[1]
    rng = np.random.default_rng(1)
    imgs = [(rng.uniform(0, 255, (64, 96, 3))).astype(np.uint8)
            for _ in range(4)]
    results = [None] * 4

    def call(i):
        raw = _post(port, "/detect?threshold=0.012", _npz(image=imgs[i]))
        results[i] = np.load(io.BytesIO(raw))

    served0 = server.service.served
    threads = [threading.Thread(target=call, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert server.service.served == served0 + 4
    for i in range(4):
        direct = server.service.xfeat.detectAndCompute(
            imgs[i], detection_threshold=0.012)[0]
        np.testing.assert_allclose(results[i]["keypoints"],
                                   direct["keypoints"])


def test_match_endpoint_and_health(server):
    port = server.server_address[1]
    rng = np.random.default_rng(2)
    im0 = (rng.uniform(0, 255, (64, 96, 3))).astype(np.uint8)
    im1 = np.roll(im0, 5, axis=1)
    raw = _post(port, "/match?top_k=64", _npz(image0=im0, image1=im1))
    out = np.load(io.BytesIO(raw))
    assert out["mkpts0"].shape == out["mkpts1"].shape
    assert out["mkpts0"].shape[1] == 2

    import json
    with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/healthz", timeout=30) as r:
        health = json.loads(r.read())
    assert health["ok"] and health["served"] >= 1


def test_match_modes(server):
    """/match?mode=star runs the semi-dense pipeline through the owner
    thread; an unknown mode is a 400."""
    import urllib.error
    port = server.server_address[1]
    rng = np.random.default_rng(5)
    im0 = (rng.uniform(0, 255, (64, 96, 3))).astype(np.uint8)
    im1 = np.roll(im0, 3, axis=1)
    raw = _post(port, "/match?mode=star&top_k=64", _npz(image0=im0,
                                                        image1=im1))
    out = np.load(io.BytesIO(raw))
    assert out["mkpts0"].shape == out["mkpts1"].shape
    try:
        _post(port, "/match?mode=bogus", _npz(image0=im0, image1=im1))
        code = 200
    except urllib.error.HTTPError as e:
        code = e.code
    assert code == 400


def test_mixed_shapes_bucketed_correctly(server):
    """Concurrent requests with DIFFERENT image shapes must each get their
    own batch bucket and still return correct per-image results."""
    port = server.server_address[1]
    rng = np.random.default_rng(3)
    shapes = [(64, 96, 3), (96, 64, 3), (64, 96, 3)]
    imgs = [(rng.uniform(0, 255, s)).astype(np.uint8) for s in shapes]
    results = [None] * len(imgs)

    def call(i):
        raw = _post(port, "/detect?threshold=0.012", _npz(image=imgs[i]))
        results[i] = np.load(io.BytesIO(raw))

    threads = [threading.Thread(target=call, args=(i,))
               for i in range(len(imgs))]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for i in range(len(imgs)):
        direct = server.service.xfeat.detectAndCompute(
            imgs[i], detection_threshold=0.012)[0]
        np.testing.assert_allclose(results[i]["keypoints"],
                                   direct["keypoints"])


def test_mixed_dtypes_not_cross_contaminated(server):
    """A float [0,1] request and a uint8 0-255 request of the SAME shape
    arriving together must not corrupt each other: normalization happens
    per request before batching (a naive stack would trip the batch-global
    /255 heuristic and scale the float image twice)."""
    port = server.server_address[1]
    rng = np.random.default_rng(4)
    img8 = (rng.uniform(0, 255, (64, 96, 3))).astype(np.uint8)
    imgf = (img8.astype(np.float32) / 255.0)
    results = {}

    def call(name, img):
        raw = _post(port, "/detect?threshold=0.012", _npz(image=img))
        results[name] = np.load(io.BytesIO(raw))

    threads = [threading.Thread(target=call, args=("u8", img8)),
               threading.Thread(target=call, args=("f32", imgf))]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    d8 = server.service.xfeat.detectAndCompute(
        img8, detection_threshold=0.012)[0]
    np.testing.assert_allclose(results["u8"]["keypoints"], d8["keypoints"])
    np.testing.assert_allclose(results["f32"]["keypoints"],
                               d8["keypoints"])


def test_bf16_compute_path():
    """The server's TPU default (bfloat16 compute) works end-to-end —
    forced here on CPU: same top-k shape contract, keypoints broadly
    consistent with the f32 engine."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from apps.serve import serve
    httpd = serve(host="127.0.0.1", port=0, weights=None, top_k=32,
                  max_batch=4, max_wait_ms=5.0, compute_dtype="bfloat16")
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        port = httpd.server_address[1]
        rng = np.random.default_rng(6)
        img = (rng.uniform(0, 255, (64, 96, 3))).astype(np.uint8)
        raw = _post(port, "/detect?threshold=0.012", _npz(image=img))
        out = np.load(io.BytesIO(raw))
        assert out["keypoints"].shape == (32, 2)
        assert np.isfinite(out["descriptors"]).all()
    finally:
        httpd.service.stop()
        httpd.shutdown()


def test_bad_request(server):
    port = server.server_address[1]
    import urllib.error
    try:
        _post(port, "/detect", b"not an image")
        raised = False
    except urllib.error.HTTPError as e:
        raised = e.code == 400
    assert raised
