"""Full benchmark suite — one JSON line per metric (bench.py prints only the
headline; this covers the rest of the BASELINE.json targets).

  * sparse extraction FPS (batched VGA, top-4096, bf16)
  * semi-dense dual-scale extraction FPS
  * fused MNN matching latency (K=4096/8192)
  * LighterGlue matching latency (K=2048)
  * bundle adjustment iterations/s (synthetic 100-cam/20k-pt problem)
  * BA weak-scaling efficiency over the local device mesh (observations per
    device held constant; needs >1 device — on the 1-chip bench host this
    reports the harness result for 1 device and the CPU-mesh estimate)

Run: python apps/bench_suite.py [--quick]
"""

import argparse
import json
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def emit(metric, value, unit, baseline=None):
    rec = {"metric": metric, "value": round(float(value), 3), "unit": unit}
    if baseline:
        rec["vs_baseline"] = round(float(value) / baseline, 3)
    print(json.dumps(rec), flush=True)


def time_call(fn, *args, iters=20):
    # in-program scan timing: block_until_ready is unreliable through the
    # remote device relay (see utils/profiling.scan_time docstring)
    from accelerated_features_tpu.utils.profiling import scan_time
    return scan_time(fn, *args, iters=iters)


def bench_extraction(quick):
    import jax
    import jax.numpy as jnp
    from accelerated_features_tpu.models.params import (fold_batchnorm,
                                                        init_xfeat_params)
    from accelerated_features_tpu.ops.extraction import (
        detect_and_compute, detect_and_compute_dense)

    B = 32 if quick else 64
    params = jax.device_put(fold_batchnorm(init_xfeat_params(
        jax.random.key(0))))
    rng = np.random.default_rng(0)
    x = jax.device_put(jnp.asarray(rng.uniform(0, 1, (B, 480, 640, 3)),
                                   jnp.float32))
    f = jax.jit(lambda p, im: detect_and_compute(
        p, im, top_k=4096, compute_dtype=jnp.bfloat16))
    dt = time_call(f, params, x, iters=10 if quick else 20)
    emit("sparse_extraction_vga_fps", B / dt, "frames/s/chip", 1400.0)

    fd = jax.jit(lambda p, im: detect_and_compute_dense(
        p, im, top_k=4096, compute_dtype=jnp.bfloat16))
    dt = time_call(fd, params, x, iters=5 if quick else 10)
    emit("semidense_extraction_vga_fps", B / dt, "frames/s/chip")


def bench_matching(quick):
    import jax
    import jax.numpy as jnp
    from accelerated_features_tpu.ops.pallas.mnn import mnn_match_fused
    from accelerated_features_tpu.models.lighterglue import (
        init_lighterglue_params, lighterglue_forward)

    rng = np.random.default_rng(0)
    for K in ([4096] if quick else [4096, 8192]):
        d1 = jax.device_put(jnp.asarray(
            rng.normal(size=(K, 64)).astype(np.float32)))
        d2 = jax.device_put(jnp.asarray(
            rng.normal(size=(K, 64)).astype(np.float32)))
        f = jax.jit(lambda a, b: mnn_match_fused(a, b, interpret=False))
        dt = time_call(f, d1, d2)
        emit(f"fused_mnn_k{K}_ms", dt * 1e3, "ms/pair")

    K = 2048
    params = init_lighterglue_params(jax.random.key(0))
    kpts = jax.device_put(jnp.asarray(
        rng.uniform(0, [640, 480], (1, K, 2)).astype(np.float32)))
    descs = jax.device_put(jnp.asarray(
        rng.normal(size=(1, K, 64)).astype(np.float32)))
    size = jnp.asarray([[640.0, 480.0]])
    f = jax.jit(lambda p, k, d: lighterglue_forward(p, k, k, d, d, size,
                                                    size))
    dt = time_call(f, params, kpts, descs, iters=10)
    emit(f"lighterglue_k{K}_ms", dt * 1e3, "ms/pair")


def _synth_ba(n_cams, n_pts, obs_per_pt):
    import jax.numpy as jnp
    from accelerated_features_tpu.sfm import BAProblem, project
    rng = np.random.default_rng(0)
    K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]], np.float32)
    X = rng.uniform([-4, -4, 6], [4, 4, 14], (n_pts, 3)).astype(np.float32)
    cams = np.zeros((n_cams, 6), np.float32)
    cams[:, 1] = np.linspace(-0.3, 0.3, n_cams)
    cams[:, 3] = np.linspace(-2, 2, n_cams)
    obs_cam = rng.integers(0, n_cams, n_pts * obs_per_pt).astype(np.int32)
    obs_pt = np.repeat(np.arange(n_pts, dtype=np.int32), obs_per_pt)
    import jax
    uv = jax.vmap(lambda c, p: project(jnp.asarray(cams)[c],
                                       jnp.asarray(X)[p], jnp.asarray(K)))(
        jnp.asarray(obs_cam), jnp.asarray(obs_pt))
    uv = np.asarray(uv) + rng.normal(0, 1.0, (len(obs_cam), 2))
    cams_n = cams + rng.normal(0, 0.02, cams.shape).astype(np.float32)
    cams_n[0] = cams[0]
    X_n = X + rng.normal(0, 0.05, X.shape).astype(np.float32)
    fixed = np.zeros(n_cams, bool)
    fixed[0] = True
    return BAProblem(
        cams=jnp.asarray(cams_n), points=jnp.asarray(X_n), K=jnp.asarray(K),
        obs_cam=jnp.asarray(obs_cam), obs_pt=jnp.asarray(obs_pt),
        obs_uv=jnp.asarray(uv, jnp.float32),
        obs_mask=jnp.ones((len(obs_cam),), bool),
        fixed_cams=jnp.asarray(fixed))


def bench_ba(quick):
    import jax
    from accelerated_features_tpu.sfm.ba import ba_step

    n_cams, n_pts, obs = (50, 5000, 4) if quick else (100, 20000, 4)
    p = _synth_ba(n_cams, n_pts, obs)
    f = jax.jit(lambda q: ba_step(q, 1e-3, cg_iters=30)[0])
    dt = time_call(f, p, iters=5 if quick else 10)
    emit(f"ba_lm_iters_per_s_c{n_cams}_p{n_pts}", 1.0 / dt, "iters/s")

    # weak scaling over the local mesh: observations per device constant
    ndev = len(jax.devices())
    if ndev > 1:
        from accelerated_features_tpu.parallel import make_mesh
        from accelerated_features_tpu.parallel.ba import bundle_adjust_sharded
        base = p                          # same args + seed as p above
        big = _synth_ba(n_cams, n_pts * ndev // 4, obs * 4)  # ndev x load
        mesh = make_mesh((ndev, 1))
        t1 = time_call(f, base, iters=3)

        def run_sharded(q):
            return bundle_adjust_sharded(q, mesh, iters=1, cg_iters=30)[0]
        tN = time_call(run_sharded, big, iters=3)
        eff = t1 / tN
        emit(f"ba_weak_scaling_eff_{ndev}dev", eff, "x", 0.8)

        # point-partitioned solver (map sharded: O(P/ndev + C) per-device
        # memory — the north-star layout) on the same scaled problem
        from accelerated_features_tpu.parallel.ba import (
            bundle_adjust_point_sharded)

        def run_pt(q):
            return bundle_adjust_point_sharded(q, mesh, iters=1,
                                               cg_iters=30)[0]
        tP = time_call(run_pt, big, iters=3)
        emit(f"ba_point_weak_scaling_eff_{ndev}dev", t1 / tP, "x", 0.8)
    else:
        emit("ba_weak_scaling_eff", -1,
             "unavailable: single device on this host")


def bench_training(quick):
    import jax
    import jax.numpy as jnp
    from accelerated_features_tpu.models.params import init_xfeat_params
    from accelerated_features_tpu.train.trainer import (TrainConfig,
                                                        init_train_state,
                                                        train_step)
    cfg = TrainConfig(use_distill=False)
    state = init_train_state(init_xfeat_params(jax.random.key(0)), cfg)
    rng = np.random.default_rng(0)
    # full 800x608 reference-config step takes the remote compiler many
    # minutes; opt in via BENCH_TRAIN_FULL=1
    full = os.environ.get("BENCH_TRAIN_FULL") == "1" and not quick
    B, (W, H), M = (10, (800, 608), 1024) if full else (4, (256, 192), 256)
    batch = {
        "image0": jnp.asarray(rng.uniform(0, 1, (B, H, W, 1)), jnp.float32),
        "image1": jnp.asarray(rng.uniform(0, 1, (B, H, W, 1)), jnp.float32),
        "corrs": jnp.asarray(rng.integers(2, H // 8 - 2, (B, M, 4)),
                             jnp.float32),
        "corr_valid": jnp.ones((B, M), bool),
    }
    f = jax.jit(lambda s, b, r: train_step(s, b, r, cfg))

    def call(s):
        return f(s, batch, jax.random.key(0))[0]
    dt = time_call(call, state, iters=5 if quick else 10)
    emit(f"train_step_per_s_b{B}_{W}x{H}", 1.0 / dt, "steps/s")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--only", type=str, default=None,
                    choices=[None, "extraction", "matching", "ba", "train"])
    ap.add_argument("--trace", type=str, default=None,
                    help="write a jax.profiler trace (XProf/TensorBoard) of "
                         "the benchmarked programs to this directory")
    args = ap.parse_args()
    if args.trace:
        import jax
        jax.profiler.start_trace(args.trace)
    if args.only in (None, "extraction"):
        bench_extraction(args.quick)
    if args.only in (None, "matching"):
        bench_matching(args.quick)
    if args.only in (None, "ba"):
        bench_ba(args.quick)
    if args.only in (None, "train"):
        bench_training(args.quick)
    if args.trace:
        import jax
        jax.profiler.stop_trace()
        print(f"# trace written to {args.trace}", file=sys.stderr)


if __name__ == "__main__":
    main()
