"""Per-stage extraction profiler: times each pipeline stage on the current
backend and prints a speed-of-light table (VERDICT r1 next-step #1).

Stages: input_norm+block1 stem | rest of backbone | heatmap decode |
NMS+score+topk | descriptor sampling | full detect_and_compute.

Usage: python apps/profile_extraction.py [--res 640x480] [--batch 64]
"""
import argparse
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, n=20, warmup=3):
    # in-program scan timing: immune to the relay's unreliable
    # block_until_ready (see utils.profiling.scan_time docstring)
    from accelerated_features_tpu.utils.profiling import scan_time
    return scan_time(fn, *args, iters=n)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=str, default="640x480")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--top_k", type=int, default=4096)
    ap.add_argument("--dtype", type=str, default="bfloat16")
    args = ap.parse_args()
    W, H = map(int, args.res.split("x"))
    B, K = args.batch, args.top_k
    cdt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    from accelerated_features_tpu.models.backbone import (
        input_norm, xfeat_forward, _block, conv2d)
    from accelerated_features_tpu.models.params import (fold_batchnorm,
                                                        init_xfeat_params)
    from accelerated_features_tpu.ops.detect import heatmap_decode, score_map, topk_keypoints
    from accelerated_features_tpu.ops.extraction import detect_and_compute, l2_normalize
    from accelerated_features_tpu.ops.sample import sample_bicubic_matmul

    params = fold_batchnorm(init_xfeat_params(jax.random.key(0)))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (B, H, W, 1)), jnp.float32)

    dev = jax.devices()[0]
    print(f"# backend={jax.default_backend()} dev={dev.device_kind} "
          f"B={B} {W}x{H} top_k={K} dtype={args.dtype}")

    def stage(name, fn, *args):
        t = timeit(fn, *args)
        print(f"[stage] {name}: {t*1e3:.3f} ms/batch", flush=True)
        return t

    # full pipeline
    full = jax.jit(lambda p, im: detect_and_compute(
        p, im, top_k=K, detection_threshold=0.05, compute_dtype=cdt))
    t_full = stage("full", full, params, x)

    # backbone only
    bb = jax.jit(lambda p, im: xfeat_forward(p, im, compute_dtype=cdt))
    t_bb = stage("backbone", bb, params, x)

    # stem: input_norm + block1 + skip
    def stem_fn(p, im):
        z = input_norm(im).astype(cdt)
        x1 = _block(p["block1"], z, "block1", False, None)
        skip = jax.lax.reduce_window(
            z, 0.0, jax.lax.add, (1, 4, 4, 1), (1, 4, 4, 1), "VALID") / 16.0
        skip = conv2d(skip, p["skip1"]["w"], p["skip1"]["b"])
        return x1 + skip
    stem = jax.jit(stem_fn)
    t_stem = stage("stem", stem, params, x)

    # individual block1 convs
    from accelerated_features_tpu.models.backbone import _basic_layer, BLOCK_PLANS
    z0 = jax.block_until_ready(jax.jit(lambda im: input_norm(im).astype(cdt))(x))
    zs = [z0]
    for i, (_, s) in enumerate(BLOCK_PLANS["block1"]):
        zi = jax.jit(lambda p, a, s=s: _basic_layer(p, a, s, False, None))(
            params["block1"][i], zs[-1])
        zs.append(jax.block_until_ready(zi))
    t_convs = []
    for i, (_, s) in enumerate(BLOCK_PLANS["block1"]):
        t_convs.append(stage(
            f"block1.conv{i+1}",
            jax.jit(lambda p, a, s=s: _basic_layer(p, a, s, False, None)),
            params["block1"][i], zs[i]))
    t_in = stage("input_norm", jax.jit(lambda im: input_norm(im).astype(cdt)), x)

    # post-backbone stages
    feats, logits, heat = jax.block_until_ready(bb(params, x))
    featsn = jax.jit(lambda f: l2_normalize(f.astype(jnp.float32)))(feats)
    t_decode = stage("heatmap_decode", jax.jit(heatmap_decode),
                     jax.block_until_ready(logits.astype(jnp.float32)))
    kheat = jax.block_until_ready(jax.jit(heatmap_decode)(
        logits.astype(jnp.float32)))
    rel = jax.block_until_ready(heat[..., 0].astype(jnp.float32))

    use_fused = (cdt == jnp.bfloat16 and jax.default_backend() == "tpu"
                 and H % 16 == 0 and W % 2 == 0)
    if use_fused:
        from accelerated_features_tpu.ops.pallas.detect_fused import (
            topk_keypoints_fused)
        t_nms = stage("nms_topk_fused", jax.jit(lambda kh, r: topk_keypoints_fused(
            kh, r, K, 0.05, interpret=False)), kheat, rel)
        tag = "fused"
    else:
        t_nms = stage("nms_topk_xla", jax.jit(lambda kh, r: topk_keypoints(
            score_map(kh, r, 0.05), K)), kheat, rel)
        tag = "xla"
    kpts = jax.block_until_ready(
        jnp.zeros((B, K, 2), jnp.float32) + 8.0)
    t_samp = stage("bicubic", jax.jit(lambda f, kp: l2_normalize(
        sample_bicubic_matmul(f, kp, (H, W)))),
        jax.block_until_ready(featsn), kpts)

    rows = [
        ("input_norm", t_in),
        ("block1.conv1 1->4 s1", t_convs[0]),
        ("block1.conv2 4->8 s2", t_convs[1]),
        ("block1.conv3 8->8 s1", t_convs[2]),
        ("block1.conv4 8->24 s2", t_convs[3]),
        ("stem total (IN+block1+skip)", t_stem),
        ("backbone total", t_bb),
        (f"nms+score+topk ({tag})", t_nms),
        ("heatmap_decode", t_decode),
        ("bicubic sample+norm", t_samp),
        ("FULL detect_and_compute", t_full),
    ]
    print(f"{'stage':<32}{'ms/batch':>10}{'us/frame':>10}{'% of full':>10}",
          flush=True)
    for name, t in rows:
        print(f"{name:<32}{t*1e3:>10.3f}{t*1e6/B:>10.1f}"
              f"{100*t/t_full:>9.1f}%", flush=True)
    print(f"FPS: {B/t_full:.0f}", flush=True)


if __name__ == "__main__":
    main()
