"""End-to-end SLAM/ATE benchmark on a rendered ground-truth trajectory
(VERDICT r4 #5 — the last north-star metric without a measured analogue).

Renders a smooth orbit trajectory through a procedural scene
(train/render.render_trajectory: exact K + world-to-camera poses), runs
the REAL pipeline — XFeat extraction -> MNN matching -> LO-RANSAC
odometry -> windowed BA -> loop closure + pose-graph optimization
(sfm/slam.IncrementalSlam) — and reports ATE RMSE (Umeyama-aligned,
sfm/posegraph.absolute_trajectory_error) with and without loop closure,
plus window-BA reprojection RMSE. The reference has no SLAM layer at
all; its nearest anchor is the two-view pose math
(reference modules/dataset/megadepth/megadepth_warper.py:18-82).

Usage:
  python apps/eval_slam.py --textures /tmp/synth_pool \
      [--weights artifacts/run_md_ckpt13250.npz] [--frames 80] \
      [--res 640x480] [--seed 0] [--json out.json] [--platform cpu]
"""
import argparse
import json
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def gt_pose6(T_w2c: np.ndarray) -> np.ndarray:
    """(4,4) world-to-camera -> pose6 (rotvec, t) for the ATE helper."""
    import jax.numpy as jnp

    from accelerated_features_tpu.sfm.lie import so3_log
    w = np.asarray(so3_log(jnp.asarray(T_w2c[:3, :3], jnp.float32)))
    return np.concatenate([w, T_w2c[:3, 3]]).astype(np.float32)


def run_slam(frames, K, enable_loop_closure, weights, top_k, window):
    from accelerated_features_tpu import XFeat
    from accelerated_features_tpu.sfm import (IncrementalSlam, SlamConfig,
                                              absolute_trajectory_error)

    xf = XFeat(weights=weights, top_k=top_k,
               detection_threshold=0.012 if weights is None else 0.05)
    slam = IncrementalSlam(
        K, SlamConfig(window=window, enable_loop_closure=enable_loop_closure),
        extract=lambda im: xf.detectAndCompute(im)[0],
        match=lambda d0, d1: xf.match(d0["descriptors"], d1["descriptors"],
                                      min_cossim=-1))
    inliers = []
    for fr in frames:
        out = slam.process_frame(fr)
        inliers.append(out["n_inliers"])
    return slam, float(np.mean(inliers[1:])) if len(inliers) > 1 else 0.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--textures", type=str, required=True)
    ap.add_argument("--weights", type=str, default=None)
    ap.add_argument("--frames", type=int, default=80)
    ap.add_argument("--res", type=str, default="640x480")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--top_k", type=int, default=2048)
    ap.add_argument("--window", type=int, default=6)
    ap.add_argument("--arc_deg", type=float, default=35.0)
    ap.add_argument("--quads", type=int, default=16)
    ap.add_argument("--json", type=str, default=None)
    ap.add_argument("--platform", type=str, default=None,
                    help="force a jax platform (e.g. cpu) so the eval can "
                         "run while the TPU is busy training")
    args = ap.parse_args()

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    from accelerated_features_tpu.sfm import absolute_trajectory_error
    from accelerated_features_tpu.train.render import render_trajectory
    from apps.render_depth_dataset import load_textures

    w, h = map(int, args.res.split("x"))
    rng = np.random.default_rng(args.seed)
    texs = load_textures(args.textures, 16, rng)
    print(f"[render] {args.frames} frames {w}x{h}, arc {args.arc_deg} deg",
          flush=True)
    traj = render_trajectory(rng, texs, args.frames, w, h,
                             n_quads=args.quads, arc_deg=args.arc_deg,
                             loop=True)
    gt6 = np.stack([gt_pose6(T) for T in traj["poses"]])

    results = {}
    for lc in (False, True):
        tag = "loop_closure" if lc else "odometry"
        slam, mean_inl = run_slam(traj["images"], traj["K"], lc,
                                  args.weights, args.top_k, args.window)
        fids = slam.keyframe_frame_ids()
        est = slam.trajectory()
        ate = absolute_trajectory_error(est, gt6[fids])
        # scale-free context: ATE relative to the GT trajectory extent
        centers = []
        for p in gt6[fids]:
            import jax.numpy as jnp

            from accelerated_features_tpu.sfm.lie import so3_exp
            R = np.asarray(so3_exp(jnp.asarray(p[:3])))
            centers.append(-R.T @ p[3:])
        extent = float(np.linalg.norm(
            np.ptp(np.asarray(centers), axis=0)))
        results[tag] = {
            "ate_rmse": float(ate),
            "ate_pct_of_extent": 100.0 * float(ate) / max(extent, 1e-9),
            "n_keyframes": int(len(est)),
            "n_loop_closures": int(slam.n_loop_closures),
            "mean_inliers": mean_inl,
            "last_window_ba_rmse_px": (float(slam.last_ba_rmse)
                                       if slam.last_ba_rmse else None),
        }
        print(f"[{tag}] ATE {ate:.4f} ({results[tag]['ate_pct_of_extent']:.2f}% "
              f"of extent), {len(est)} KFs, "
              f"{slam.n_loop_closures} loop closures, "
              f"mean inliers {mean_inl:.0f}, "
              f"BA rmse {results[tag]['last_window_ba_rmse_px']}",
              flush=True)

    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=2)
        print(f"[out] {args.json}")


if __name__ == "__main__":
    main()
