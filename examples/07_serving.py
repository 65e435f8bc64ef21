"""Batching inference server: start it in-process, submit concurrent
requests over real HTTP, and read the npz responses.

In production you'd run `python apps/serve.py --port 8500 --weights
weights/xfeat.npz` in its own process (one process owns the TPU) and
talk to it from anywhere; this example does the same round-trip
in-process so it runs anywhere without free-port assumptions.
"""
import io
import os
import sys
import threading
import urllib.request

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    from apps.serve import serve

    httpd = serve(host="127.0.0.1", port=0, weights=None, top_k=512,
                  max_batch=8, max_wait_ms=10.0)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    port = httpd.server_address[1]
    print(f"server on 127.0.0.1:{port}")

    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, (480, 640, 3)).astype(np.uint8)
    buf = io.BytesIO()
    np.savez(buf, image=img)

    # concurrent same-shape requests are grouped into ONE batched device
    # call by the server's owner thread
    def detect(i, out):
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/detect?threshold=0.012",
            data=buf.getvalue(), method="POST")
        with urllib.request.urlopen(req, timeout=120) as r:
            out[i] = np.load(io.BytesIO(r.read()))

    results = {}
    threads = [threading.Thread(target=detect, args=(i, results))
               for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for i, out in sorted(results.items()):
        print(f"request {i}: {out['keypoints'].shape[0]} keypoints, "
              f"descriptors {out['descriptors'].shape}")

    import json
    with urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz",
                                timeout=30) as r:
        print("healthz:", json.loads(r.read()))
    httpd.service.stop()
    httpd.shutdown()


if __name__ == "__main__":
    main()
