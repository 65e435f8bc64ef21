"""On-chip A/B for the fused Pallas stem (STATUS.md round-2 target #1).

Measures, with in-program scan timing (utils.profiling.scan_time):
  1. stem region alone: XLA stem vs experiments/stem.stem_fused;
  2. the FULL detect_and_compute with fused_stem=False vs True — the
     decision metric, since graph-level stem rewrites were measured
     slower *in context* by breaking XLA's surrounding fusion
     (docs/DESIGN.md section 10) even when faster in isolation.

Both variants run in ONE process sequentially (never concurrently with
any other TPU process — see the contention note in STATUS.md). The
fused_stem flag is passed explicitly, so no env-var trace-time hazard.

Usage: python apps/measure_stem.py [--res 640x480 1024x768] [--batch 64]
"""
import argparse
import json
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=str, nargs="+",
                    default=["640x480", "1024x768"])
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--top_k", type=int, default=4096)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    from accelerated_features_tpu.models.backbone import (_block, conv2d,
                                                          input_norm)
    from accelerated_features_tpu.models.params import (fold_batchnorm,
                                                        init_xfeat_params)
    from accelerated_features_tpu.ops.extraction import detect_and_compute
    from accelerated_features_tpu.experiments.stem import stem_fused
    from accelerated_features_tpu.utils.profiling import scan_time

    params = fold_batchnorm(init_xfeat_params(jax.random.key(0)))
    cdt = jnp.bfloat16
    B, K = args.batch, args.top_k
    print(f"# backend={jax.default_backend()} B={B} top_k={K} bf16")

    results = {}
    for res in args.res:
        W, H = map(int, res.split("x"))
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.uniform(0, 1, (B, H, W, 1)), jnp.float32)
        xg = jax.jit(lambda im: input_norm(im).astype(cdt))(x)
        xg = jax.block_until_ready(xg)

        def stem_xla(p, z):
            x1 = _block(p["block1"], z, "block1", False, None)
            skip = jax.lax.reduce_window(
                z, 0.0, jax.lax.add, (1, 4, 4, 1), (1, 4, 4, 1),
                "VALID") / 16.0
            return x1 + conv2d(skip, p["skip1"]["w"], p["skip1"]["b"])

        t_xla = scan_time(jax.jit(stem_xla), params, xg, iters=args.iters)
        t_pal = scan_time(jax.jit(lambda p, z: stem_fused(p, z)),
                          params, xg, iters=args.iters)
        full0 = jax.jit(lambda p, im: detect_and_compute(
            p, im, top_k=K, compute_dtype=cdt, fused_stem=False))
        full1 = jax.jit(lambda p, im: detect_and_compute(
            p, im, top_k=K, compute_dtype=cdt, fused_stem=True))
        t_f0 = scan_time(full0, params, x, iters=args.iters)
        t_f1 = scan_time(full1, params, x, iters=args.iters)

        r = {"stem_xla_ms": t_xla * 1e3, "stem_fused_ms": t_pal * 1e3,
             "full_unfused_ms": t_f0 * 1e3, "full_fused_ms": t_f1 * 1e3,
             "full_fps_unfused": B / t_f0, "full_fps_fused": B / t_f1}
        results[res] = r
        print(json.dumps({res: {k: round(v, 3) for k, v in r.items()}}),
              flush=True)

    win = all(r["full_fused_ms"] < r["full_unfused_ms"]
              for r in results.values())
    print(f"# fused stem wins in-context at all sizes: {win}")


if __name__ == "__main__":
    main()
