"""Smoke-test script — the reference minimal_example.py equivalent: exercises
single, stress, and batched extraction plus both matchers on random inputs
and prints shapes/timings.

Run: python apps/minimal_example.py
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from accelerated_features_tpu import XFeat

    xfeat = XFeat(weights=None, top_k=4096, detection_threshold=0.012)
    rng = np.random.default_rng(0)

    x = rng.random((480, 640, 3), np.float32)
    out = xfeat.detectAndCompute(x, top_k=4096)[0]
    print("detectAndCompute:",
          {k: tuple(v.shape) for k, v in out.items()})

    # stress test
    x = rng.random((1, 480, 640, 3), np.float32)
    t0 = time.time()
    for _ in range(20):
        xfeat.detectAndCompute(x, top_k=4096)
    print(f"stress: {20 / (time.time() - t0):.1f} calls/s (b=1 VGA)")

    # batched mode
    x = rng.random((4, 480, 640, 3), np.float32)
    outputs = xfeat.detectAndCompute(x, top_k=4096)
    print(f"batched: {len(outputs)} results")

    # semi-dense matching
    x1 = rng.random((480, 640, 3), np.float32)
    x2 = rng.random((480, 640, 3), np.float32)
    mk0, mk1 = xfeat.match_xfeat_star(x1, x2, top_k=5000)
    print("match_xfeat_star:", mk0.shape, mk1.shape)

    # sparse matching
    mk0, mk1 = xfeat.match_xfeat(x1, x2, top_k=4096)
    print("match_xfeat:", mk0.shape, mk1.shape)


if __name__ == "__main__":
    main()
