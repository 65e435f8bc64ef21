"""int8-MXU probe (STATUS.md round-2 target #7 / TPU_AGENDA step 5).

Times one backbone-conv-shaped contraction as s8xs8->s32 vs bf16xbf16->f32
with the in-program scan harness. v5e's datasheet int8 peak is 2x bf16
(394 vs 197 TOPS); the int8 inference path is only worth designing if the
measured ratio is >= ~1.5x on the dot shapes the backbone actually runs
(im2col of the 64->64 /16 block: M = B*H/16*W/16, K = 9*64, N = 64).

Usage: python apps/probe_int8_mxu.py [--batch 64]
Prints one JSON line with both times and the speedup ratio.
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
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    from accelerated_features_tpu.utils.profiling import scan_time

    # im2col shape of the backbone's 64->64 conv at /8 on VGA b64
    M, K, N = args.batch * 60 * 80, 9 * 64, 64
    rng = np.random.default_rng(0)
    a8 = jnp.asarray(rng.integers(-127, 128, (M, K)), jnp.int8)
    b8 = jnp.asarray(rng.integers(-127, 128, (K, N)), jnp.int8)
    abf = a8.astype(jnp.bfloat16)
    bbf = b8.astype(jnp.bfloat16)

    def dot_i8(x, y):
        return jax.lax.dot_general(x, y, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.int32)

    def dot_bf(x, y):
        return jax.lax.dot_general(x, y, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    print(f"# backend={jax.default_backend()} M={M} K={K} N={N}",
          flush=True)
    t_bf = scan_time(jax.jit(dot_bf), abf, bbf, iters=args.iters)
    t_i8 = scan_time(jax.jit(dot_i8), a8, b8, iters=args.iters)
    flops = 2 * M * K * N
    out = {"bf16_ms": round(t_bf * 1e3, 4), "int8_ms": round(t_i8 * 1e3, 4),
           "speedup_int8": round(t_bf / t_i8, 3),
           "bf16_tflops": round(flops / t_bf / 1e12, 1),
           "int8_tops": round(flops / t_i8 / 1e12, 1)}
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
