"""Per-stage extraction profiler: times each pipeline stage on the current
backend and prints a speed-of-light table (VERDICT r1 next-step #1).

Stages: input_norm+block1 stem | rest of backbone | heatmap decode |
NMS+score+topk | descriptor sampling | full detect_and_compute.

Usage: python apps/profile_extraction.py [--res 640x480] [--batch 64]
"""
import argparse
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, n=20, warmup=3):
    # in-program scan timing: immune to the relay's unreliable
    # block_until_ready (see utils.profiling.scan_time docstring)
    from accelerated_features_tpu.utils.profiling import scan_time
    # perturb_ints: uint8 frames must vary per in-scan iteration or
    # image-dependent stages hoist out of the loop (DESIGN.md 10e)
    return scan_time(fn, *args, iters=n, perturb_ints=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=str, default="640x480")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--top_k", type=int, default=4096)
    ap.add_argument("--dtype", type=str, default="bfloat16")
    ap.add_argument("--input_dtype", type=str, default="float32",
                    choices=["float32", "uint8"],
                    help="uint8 = camera-native frames (the /255 runs "
                         "inside the jitted pipeline via to_unit_float; "
                         "bench.py measures this configuration)")
    ap.add_argument("--channels", type=int, default=1, choices=[1, 3],
                    help="input channel count. (B,H,W,1) uint8 measures "
                         "the degenerate-tiling case the public API now "
                         "avoids by expanding gray to the RGB layout "
                         "host-side (api.parse_input, VERDICT r4 #4); "
                         "3 measures what API users actually get")
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
    from accelerated_features_tpu.ops.resize import to_unit_float
    C = args.channels
    if args.input_dtype == "uint8":
        x = jnp.asarray(rng.integers(0, 256, (B, H, W, C)), jnp.uint8)
    else:
        x = jnp.asarray(rng.uniform(0, 1, (B, H, W, C)), jnp.float32)

    dev = jax.devices()[0]
    print(f"# backend={jax.default_backend()} dev={dev.device_kind} "
          f"B={B} {W}x{H} top_k={K} dtype={args.dtype} "
          f"input={args.input_dtype}")

    def stage(name, fn, *args):
        t = timeit(fn, *args)
        print(f"[stage] {name}: {t*1e3:.3f} ms/batch", flush=True)
        return t

    # full pipeline
    full = jax.jit(lambda p, im: detect_and_compute(
        p, im, top_k=K, detection_threshold=0.05, compute_dtype=cdt))
    t_full = stage("full", full, params, x)

    # backbone only
    bb = jax.jit(lambda p, im: xfeat_forward(p, to_unit_float(im),
                                             compute_dtype=cdt))
    t_bb = stage("backbone", bb, params, x)

    # stem: input_norm + block1 + skip
    def stem_fn(p, im):
        z = input_norm(to_unit_float(im)).astype(cdt)
        x1 = _block(p["block1"], z, "block1", False, None)
        skip = jax.lax.reduce_window(
            z, 0.0, jax.lax.add, (1, 4, 4, 1), (1, 4, 4, 1), "VALID") / 16.0
        skip = conv2d(skip, p["skip1"]["w"], p["skip1"]["b"])
        return x1 + skip
    stem = jax.jit(stem_fn)
    t_stem = stage("stem", stem, params, x)

    # individual block1 convs
    from accelerated_features_tpu.models.backbone import _basic_layer, BLOCK_PLANS
    z0 = jax.block_until_ready(jax.jit(
        lambda im: input_norm(to_unit_float(im)).astype(cdt))(x))
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
    t_in = stage("input_norm", jax.jit(
        lambda im: input_norm(to_unit_float(im)).astype(cdt)), x)

    # post-backbone stages
    feats, logits, heat = jax.block_until_ready(bb(params, x))
    featsn = jax.jit(lambda f: l2_normalize(f.astype(jnp.float32)))(feats)
    t_decode = stage("heatmap_decode", jax.jit(heatmap_decode),
                     jax.block_until_ready(logits.astype(jnp.float32)))
    kheat = jax.block_until_ready(jax.jit(heatmap_decode)(
        logits.astype(jnp.float32)))
    rel = jax.block_until_ready(heat[..., 0].astype(jnp.float32))

    # must mirror ops/extraction.py's gate exactly, or the stage table
    # times a different NMS path than the full pipeline runs
    use_fused = (cdt == jnp.bfloat16 and jax.default_backend() == "tpu")
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

    # ---- speed-of-light accounting (VERDICT r1 #1: publish per-stage SoL)
    # flops/bytes models are per batch; bytes assume each tensor crosses HBM
    # once per read/write (fusion can beat this, making SoL% > 100 possible
    # for fused elementwise stages).
    from accelerated_features_tpu.models.backbone import (BLOCK_CHANNELS,
                                                          FINAL_CONVS)
    dsz = 2 if cdt == jnp.bfloat16 else 4

    def conv_cost(hi, wi, cin, cout, stride, k=3):
        ho, wo = hi // stride, wi // stride
        fl = 2.0 * B * ho * wo * k * k * cin * cout
        by = float(B) * (hi * wi * cin + ho * wo * cout) * dsz
        return fl, by

    def block_cost(name, hi, wi):
        fl = by = 0.0
        for (k, s), (cin, cout) in zip(BLOCK_PLANS[name],
                                       BLOCK_CHANNELS[name]):
            f, b2 = conv_cost(hi, wi, cin, cout, s, k)
            fl += f
            by += b2
            hi, wi = hi // s, wi // s
        if name in FINAL_CONVS:
            cin, cout = FINAL_CONVS[name]
            f, b2 = conv_cost(hi, wi, cin, cout, 1, 1)
            fl += f
            by += b2
        return fl, by, hi, wi

    def backbone_cost():
        fl = by = 0.0
        # stride chain: block1 @ full res -> /4, block2 @ /4, block3 -> /8,
        # block4 -> /16, block5 -> /32, fusion+heads @ /8
        hi, wi = H, W
        for name in ["block1", "block2", "block3", "block4", "block5"]:
            f, b2, hi, wi = block_cost(name, hi, wi)
            fl += f
            by += b2
        h8, w8 = H // 8, W // 8
        for name in ["block_fusion", "heatmap_head", "keypoint_head"]:
            f, b2, _, _ = block_cost(name, h8, w8)
            fl += f
            by += b2
        by += 4.0 * B * h8 * w8 * 64 * dsz  # two bilinear ups + fusion sum
        return fl, by

    bb_fl, bb_by = backbone_cost()
    stem_fl, stem_by, _, _ = block_cost("block1", H, W)

    n_row3 = B * (-(-H // 3)) * W          # kernel output (H/3-reduced)
    n_tile3 = B * (-(-H // 3)) * (-(-W // 3))  # selection input (3x3 tiles)
    costs = {
        "input_norm": (0.0, 3.0 * B * H * W * 4),
        "stem": (stem_fl, stem_by),
        "backbone": (bb_fl, bb_by),
        "decode": (0.0, 2.0 * B * H * W * 4 + B * H * W * 4),
        # fused NMS v3: kernel reads kheat f32 + rel, writes the
        # 3-row-reduced packed map; the finisher re-reads it, writes the
        # 3x3-tiled map, and the selection re-reads that. FLOPs = the two
        # reliability-lerp matmuls (rel@(w,W) then (h,H)@(h,W)).
        "nms": (2.0 * B * (H * (W // 8) * (W // 8) + H * W * (H // 8)),
                B * H * W * 4 + 2 * n_row3 * 4 + 2 * n_tile3 * 4),
        # matmul bicubic: the (B,K,W/8,64) bf16 intermediate write+read
        # dominates; + feature map read + output write
        "bicubic": (2.0 * B * K * 64 * ((W // 8) * 4 + 4),
                    2.0 * B * K * (W // 8) * 64 * 2
                    + B * (H // 8) * (W // 8) * 64 * 4 + B * K * 64 * 4),
    }
    costs["full"] = tuple(map(sum, zip(costs["backbone"], costs["decode"],
                                       costs["nms"], costs["bicubic"],
                                       costs["input_norm"])))

    from accelerated_features_tpu.utils.profiling import speed_of_light
    dts = "bf16" if cdt == jnp.bfloat16 else "f32"

    def sol(t, key):
        fl, by = costs[key]
        s = speed_of_light(t, flops=fl, bytes_moved=by, dtype=dts)
        return s["sol_seconds"] * 1e3, 100.0 * s["sol_frac"]

    rows = [
        ("input_norm", t_in, "input_norm"),
        ("block1.conv1 1->4 s1", t_convs[0], None),
        ("block1.conv2 4->8 s2", t_convs[1], None),
        ("block1.conv3 8->8 s1", t_convs[2], None),
        ("block1.conv4 8->24 s2", t_convs[3], None),
        ("stem total (IN+block1+skip)", t_stem, "stem"),
        ("backbone total", t_bb, "backbone"),
        (f"nms+score+topk ({tag})", t_nms, "nms"),
        ("heatmap_decode", t_decode, "decode"),
        ("bicubic sample+norm", t_samp, "bicubic"),
        ("FULL detect_and_compute", t_full, "full"),
    ]
    print(f"{'stage':<32}{'ms/batch':>10}{'us/frame':>10}{'% of full':>10}"
          f"{'SoL ms':>9}{'SoL %':>7}", flush=True)
    for name, t, key in rows:
        extra = ""
        if key is not None:
            s_ms, s_pct = sol(t, key)
            extra = f"{s_ms:>9.3f}{s_pct:>6.0f}%"
        print(f"{name:<32}{t*1e3:>10.3f}{t*1e6/B:>10.1f}"
              f"{100*t/t_full:>9.1f}%{extra}", flush=True)
    print(f"FPS: {B/t_full:.0f}", flush=True)


if __name__ == "__main__":
    main()
