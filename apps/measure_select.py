"""On-chip A/B of the decode + selection stages (VERDICT r3 'Next round'
#4: the last unmeasured perf lever — heatmap_decode ran at 24-30% SoL and
NMS+score+top-k at 7-8% in the round-2 tables).

Measures, per shape (VGA 640x480 and "Accurate" 1024x768, B=64):
  1. heatmap_decode variants: reshape-transpose (current), stride-8
     conv_transpose scatter (MXU does the data movement), 8-plane stack;
  2. the selection chain split: Pallas detect kernel alone, + 3-col
     reduce, + approx_max_k vs exact top_k finishers;
  3. end-to-end detect_and_compute with each decode variant wired.

Prints one JSON line per measurement. Run on the REAL chip with the
device otherwise idle (scan_time measures in-program steady state, but
compile times and HBM pressure interact with co-tenants).
"""
import argparse
import json
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def emit(**kw):
    print(json.dumps({k: (round(v, 4) if isinstance(v, float) else v)
                      for k, v in kw.items()}), flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from accelerated_features_tpu.models.params import (fold_batchnorm,
                                                        init_xfeat_params)
    from accelerated_features_tpu.ops import detect as D
    from accelerated_features_tpu.ops.pallas.detect_fused import (
        detect_scores_fused, topk_keypoints_fused)
    from accelerated_features_tpu.utils.profiling import scan_time

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--top_k", type=int, default=4096)
    ap.add_argument("--shapes", type=str, default="640x480,1024x768")
    ap.add_argument("--skip_e2e", action="store_true")
    args = ap.parse_args()

    dev = jax.devices()[0]
    rng = np.random.default_rng(0)
    B, K = args.batch, args.top_k

    for shape in args.shapes.split(","):
        W, H = map(int, shape.split("x"))
        h, w = H // 8, W // 8
        # realistic magnitudes: logits ~ N(0,2) -> peaked softmax cells;
        # reliability in (0,1)
        logits = jax.device_put(jnp.asarray(
            rng.normal(0, 2, (B, h, w, 65)).astype(np.float32)), dev)
        rel = jax.device_put(jnp.asarray(
            rng.uniform(0, 1, (B, h, w)).astype(np.float32)), dev)

        # --- decode variants -------------------------------------------
        for name, fn in [("reshape_transpose", D.heatmap_decode),
                         ("conv_transpose", D.heatmap_decode_convt),
                         ("plane_stack", D.heatmap_decode_planes)]:
            f = jax.jit(fn)
            dt = scan_time(f, logits, iters=args.iters, perturb_ints=True)
            emit(stage="decode", variant=name, shape=shape,
                 ms_per_batch=dt * 1e3)

        kheat = jax.jit(D.heatmap_decode)(logits)
        kheat = jax.device_put(jax.block_until_ready(kheat), dev)

        # --- selection chain split --------------------------------------
        fk = jax.jit(lambda kh, r: detect_scores_fused(kh, r, 0.05,
                                                       interpret=False))
        dt_kernel = scan_time(fk, kheat, rel, iters=args.iters)
        emit(stage="select", variant="pallas_kernel_only", shape=shape,
             ms_per_batch=dt_kernel * 1e3)

        for vname, recall in [("approx_0.9999", 0.9999), ("exact", None)]:
            ff = jax.jit(lambda kh, r, rc=recall: topk_keypoints_fused(
                kh, r, K, 0.05, interpret=False, approx_recall=rc))
            dt_full = scan_time(ff, kheat, rel, iters=args.iters)
            emit(stage="select", variant=f"kernel+reduce+{vname}",
                 shape=shape, ms_per_batch=dt_full * 1e3,
                 finisher_ms=(dt_full - dt_kernel) * 1e3)

        # --- end-to-end -------------------------------------------------
        if not args.skip_e2e:
            import accelerated_features_tpu.ops.extraction as EX
            params = jax.device_put(
                fold_batchnorm(init_xfeat_params(jax.random.key(0))), dev)
            imgs = jax.device_put(jnp.asarray(
                rng.integers(0, 256, (B, H, W, 3)), jnp.uint8), dev)
            orig = EX.heatmap_decode
            try:
                for name, fn in [("reshape_transpose", D.heatmap_decode),
                                 ("conv_transpose", D.heatmap_decode_convt),
                                 ("plane_stack", D.heatmap_decode_planes)]:
                    EX.heatmap_decode = fn
                    f = jax.jit(lambda p, x: EX.detect_and_compute(
                        p, x, top_k=K, detection_threshold=0.05,
                        compute_dtype=jnp.bfloat16))
                    dt = scan_time(f, params, imgs, iters=args.iters,
                               perturb_ints=True)
                    emit(stage="e2e", variant=f"decode={name}", shape=shape,
                         ms_per_batch=dt * 1e3, fps=B / dt)
            finally:
                EX.heatmap_decode = orig

            # fused Pallas detect vs XLA NMS+topk, END-TO-END under the
            # honest harness (the round-4 fused-wins verdict was measured
            # with loop-constant inputs; re-decided here, DESIGN.md 10e)
            import os as _os
            for fused in ("1", "0"):
                _os.environ["XFEAT_FUSED_DETECT"] = fused
                f = jax.jit(lambda p, x: EX.detect_and_compute(
                    p, x, top_k=K, detection_threshold=0.05,
                    compute_dtype=jnp.bfloat16))
                dt = scan_time(f, params, imgs, iters=args.iters,
                               perturb_ints=True)
                emit(stage="e2e", variant=f"fused_detect={fused}",
                     shape=shape, ms_per_batch=dt * 1e3, fps=B / dt)
            _os.environ.pop("XFEAT_FUSED_DETECT", None)

            # bicubic descriptor-sampling variants, END-TO-END: the XLA
            # matmul path is HBM-bound on a (B,K,w,c) intermediate
            # (~2.7 GB at VGA b64); 'w2' is the single-MXU-contraction
            # VMEM kernel built to retire it (pallas/bicubic.py)
            for bic in ("matmul", "fused", "w2"):
                _os.environ["XFEAT_BICUBIC"] = bic
                f = jax.jit(lambda p, x: EX.detect_and_compute(
                    p, x, top_k=K, detection_threshold=0.05,
                    compute_dtype=jnp.bfloat16))
                try:
                    dt = scan_time(f, params, imgs, iters=args.iters,
                                   perturb_ints=True)
                    emit(stage="e2e", variant=f"bicubic={bic}",
                         shape=shape, ms_per_batch=dt * 1e3, fps=B / dt)
                except Exception as e:
                    emit(stage="e2e", variant=f"bicubic={bic}",
                         shape=shape, error=str(e)[:200])
            _os.environ.pop("XFEAT_BICUBIC", None)


if __name__ == "__main__":
    main()
