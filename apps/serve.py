"""Batching inference server for sparse extraction + matching.

The reference has no serving story (single-process scripts only); this is
the deployment shape a TPU chip wants: one process owns the device, many
clients submit images, and a batcher groups same-shape requests into one
fixed-shape `detectAndCompute` call so the chip always sees batched work
(the throughput headline is batched VGA, STATUS.md). Design:

  * stdlib only (ThreadingHTTPServer) — no framework dependencies;
  * handler threads enqueue (shape-bucketed) requests; ONE device thread
    drains the queue, groups up to --max_batch same-shape images waiting
    at most --max_wait_ms, runs the jitted engine, and fans results back
    out — so device programs are reused across requests and no two
    threads ever touch the TPU concurrently;
  * responses are npz bytes (keypoints/scores/descriptors/valid) — the
    same arrays the Python API returns.

Endpoints:
  POST /detect      body = npz with array 'image' (H,W[,C]) uint8/float,
                    or a PNG/JPG byte stream; query ?top_k=&threshold=
  POST /match       body = npz with 'image0', 'image1' -> mkpts0, mkpts1;
                    ?mode=mnn (default) | star | lighterglue
  GET  /healthz     liveness + device + served-request counter

Usage:  python apps/serve.py --port 8500 --weights weights/xfeat.npz
Client: see tests/test_serve.py or
        curl -s -X POST --data-binary @img.png localhost:8500/detect
"""
from __future__ import annotations

import argparse
import io
import json
import os
import queue
import sys
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.jax_cache"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


class _Request:
    __slots__ = ("kind", "images", "top_k", "threshold", "event", "result",
                 "error", "abandoned")

    def __init__(self, kind, images, top_k, threshold):
        self.kind = kind              # "detect" | "match"
        self.images = images          # tuple of arrays
        self.top_k = top_k
        self.threshold = threshold
        self.event = threading.Event()
        self.result = None
        self.error = None
        self.abandoned = False

    @property
    def key(self):
        return (self.kind,
                tuple((im.shape, str(im.dtype)) for im in self.images),
                self.top_k, self.threshold)


class InferenceService:
    """Single device-owner thread with shape-bucketed request batching."""

    def __init__(self, xfeat, max_batch: int = 16, max_wait_ms: float = 5.0):
        import collections
        self.xfeat = xfeat
        self.max_batch = max_batch
        self.max_wait = max_wait_ms / 1e3
        self.queue: "queue.Queue[_Request]" = queue.Queue()
        # requests pulled during grouping that belong to another bucket:
        # served FIRST next round (fairness — re-queuing at the tail would
        # let a sustained majority bucket starve minority shapes forever)
        self._backlog = collections.deque()
        self.served = 0
        self._stop = False
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def submit(self, kind: str, images, top_k=None, threshold=None,
               timeout: float = 60.0):
        # images are shape/scale-normalized HERE (handler thread, host-side
        # numpy) so the device thread only stacks. Integer images stay in
        # their native dtype (the /255 runs inside the jitted pipeline —
        # 1/4 the host->device bytes for uint8); floats are normalized to
        # [0,1] float32. Buckets key on (shape, dtype), so a batch never
        # mixes scales.
        def _norm(im):
            arr = np.asarray(im)
            if np.issubdtype(arr.dtype, np.integer):
                return np.asarray(self.xfeat._parse_input_raw(arr))[0]
            return np.asarray(self.xfeat.parse_input(arr))[0]
        images = tuple(_norm(im) for im in images)
        req = _Request(kind, images, top_k, threshold)
        self.queue.put(req)
        if not req.event.wait(timeout):
            req.abandoned = True      # device thread will skip it
            raise TimeoutError("inference timed out")
        if req.error is not None:
            raise req.error
        return req.result

    def stop(self):
        self._stop = True

    # ---------------- device thread ----------------

    def _next(self, timeout):
        if self._backlog:
            return self._backlog.popleft()
        return self.queue.get(timeout=timeout)

    def _loop(self):
        while not self._stop:
            try:
                first = self._next(timeout=0.1)
            except queue.Empty:
                continue
            if first.abandoned:
                continue
            # group same (kind, shapes, top_k, threshold) requests arriving
            # within the batching window
            group = [first]
            deadline = time.monotonic() + self.max_wait
            while len(group) < self.max_batch and first.kind == "detect":
                rem = deadline - time.monotonic()
                if rem <= 0:
                    break
                try:
                    r = self.queue.get(timeout=rem)
                except queue.Empty:
                    break
                if r.abandoned:
                    continue
                if r.key == first.key:
                    group.append(r)
                else:
                    self._backlog.append(r)  # head of the next round
            group = [r for r in group if not r.abandoned]
            if not group:
                continue
            try:
                if first.kind == "detect":
                    batch = np.stack([r.images[0] for r in group])
                    outs = self.xfeat.detectAndCompute(
                        batch, top_k=first.top_k,
                        detection_threshold=first.threshold)
                    for r, o in zip(group, outs):
                        r.result = o
                        r.event.set()
                else:                  # match: one pair per device call,
                    r = group[0]       # still on the owner thread
                    tk = r.top_k or self.xfeat.top_k
                    if r.kind == "match_star":
                        mk0, mk1 = self.xfeat.match_xfeat_star(
                            r.images[0], r.images[1], top_k=tk)
                    elif r.kind == "match_lg":
                        d0 = self.xfeat.detectAndCompute(
                            r.images[0], top_k=tk)[0]
                        d1 = self.xfeat.detectAndCompute(
                            r.images[1], top_k=tk)[0]
                        d0["image_size"] = r.images[0].shape[1::-1]
                        d1["image_size"] = r.images[1].shape[1::-1]
                        mk0, mk1, _ = self.xfeat.match_lighterglue(d0, d1)
                    else:
                        mk0, mk1 = self.xfeat.match_xfeat(
                            r.images[0], r.images[1], top_k=tk)
                    r.result = (np.asarray(mk0), np.asarray(mk1))
                    r.event.set()
                self.served += len(group)
            except Exception as e:           # pragma: no cover - device err
                for r in group:
                    r.error = e
                    r.event.set()


def _decode_image(body: bytes) -> np.ndarray:
    if body[:6] == b"\x93NUMPY" or body[:2] == b"PK":   # .npy / .npz
        data = np.load(io.BytesIO(body), allow_pickle=False)
        return data["image"] if hasattr(data, "files") else data
    import cv2
    img = cv2.imdecode(np.frombuffer(body, np.uint8), cv2.IMREAD_COLOR)
    if img is None:
        raise ValueError("body is neither npy/npz nor a decodable image")
    return img


def _npz_bytes(**arrays) -> bytes:
    buf = io.BytesIO()
    np.savez(buf, **arrays)
    return buf.getvalue()


def make_handler(service: InferenceService):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *a):     # quiet access log
            pass

        def _send(self, code, body, ctype="application/octet-stream"):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path.startswith("/healthz"):
                import jax
                info = {"ok": True, "backend": jax.default_backend(),
                        "served": service.served}
                self._send(200, json.dumps(info).encode(),
                           "application/json")
            else:
                self._send(404, b"not found")

        def do_POST(self):
            try:
                n = int(self.headers.get("Content-Length", 0))
                body = self.rfile.read(n)
                from urllib.parse import parse_qs, urlparse
                u = urlparse(self.path)
                q = parse_qs(u.query)
                top_k = int(q["top_k"][0]) if "top_k" in q else None
                thr = float(q["threshold"][0]) if "threshold" in q else None
                if u.path == "/detect":
                    imgs = (_decode_image(body),)
                    kind = "detect"
                elif u.path == "/match":
                    data = np.load(io.BytesIO(body), allow_pickle=False)
                    imgs = (data["image0"], data["image1"])
                    # mode: mnn (default, sparse MNN) | star (semi-dense
                    # coarse-to-fine) | lighterglue (attention matcher,
                    # server must be started with --lg_weights)
                    kind = "match_" + q.get("mode", ["mnn"])[0]
                    if kind not in ("match_mnn", "match_star", "match_lg",
                                    "match_lighterglue"):
                        raise ValueError(f"unknown match mode {kind[6:]}")
                    if kind == "match_lighterglue":
                        kind = "match_lg"
                else:
                    self._send(404, b"not found")
                    return
            except Exception as e:       # malformed request body/query
                self._send(400, json.dumps({"error": str(e)}).encode(),
                           "application/json")
                return
            try:
                # ALL device work goes through the single owner thread
                out = service.submit(kind, imgs, top_k, thr)
                if kind == "detect":
                    self._send(200, _npz_bytes(**{
                        k: np.asarray(v) for k, v in out.items()}))
                else:
                    self._send(200, _npz_bytes(mkpts0=out[0], mkpts1=out[1]))
            except TimeoutError as e:
                self._send(503, json.dumps({"error": str(e)}).encode(),
                           "application/json")
            except Exception as e:       # server-side inference failure
                self._send(500, json.dumps({"error": str(e)}).encode(),
                           "application/json")
    return Handler


def serve(host="127.0.0.1", port=8500, weights=None, top_k=4096,
          max_batch=16, max_wait_ms=5.0, compute_dtype=None,
          lg_weights=None):
    from accelerated_features_tpu import XFeat
    import jax
    if compute_dtype is None:
        compute_dtype = ("bfloat16" if jax.default_backend() == "tpu"
                         else "float32")
    xfeat = XFeat(weights=weights, top_k=top_k,
                  compute_dtype=compute_dtype)
    if lg_weights is not None:
        if lg_weights == "random":
            xfeat.set_lighterglue()
        else:
            # LighterGlue's loader handles .npz/.pt files AND training
            # checkpoint dirs (orbax or npz)
            xfeat.set_lighterglue(weights=lg_weights)
    service = InferenceService(xfeat, max_batch, max_wait_ms)
    httpd = ThreadingHTTPServer((host, port), make_handler(service))
    httpd.service = service            # for tests / shutdown hooks
    return httpd


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--host", type=str, default="0.0.0.0")
    ap.add_argument("--port", type=int, default=8500)
    ap.add_argument("--weights", type=str, default=None)
    ap.add_argument("--top_k", type=int, default=4096)
    ap.add_argument("--max_batch", type=int, default=16)
    ap.add_argument("--max_wait_ms", type=float, default=5.0)
    ap.add_argument("--lg_weights", type=str, default=None,
                    help="LighterGlue weights for /match?mode=lighterglue "
                         "('random' = smoke)")
    args = ap.parse_args()
    httpd = serve(args.host, args.port, args.weights, args.top_k,
                  args.max_batch, args.max_wait_ms,
                  lg_weights=args.lg_weights)
    print(f"[serve] listening on {args.host}:{args.port} "
          f"(max_batch={args.max_batch}, wait={args.max_wait_ms}ms)")
    httpd.serve_forever()


if __name__ == "__main__":
    main()
