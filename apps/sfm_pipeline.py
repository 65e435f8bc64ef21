"""Incremental SfM pipeline over an image sequence — the north-star demo:
XFeat extraction -> MNN matching -> two-view RANSAC -> keyframe pose graph
-> global bundle adjustment (optionally sharded over the device mesh).

Run: python apps/sfm_pipeline.py --images <dir> --fx 600 [--sharded]
Outputs poses + map stats; with --gt_poses (N,6 .npy) prints ATE.
"""

import argparse
import glob
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", required=True, help="directory of frames")
    ap.add_argument("--fx", type=float, default=None,
                    help="focal (px); default 1.2*max(W,H)")
    ap.add_argument("--top_k", type=int, default=2048)
    ap.add_argument("--weights", type=str, default=None)
    ap.add_argument("--ba_iters", type=int, default=15)
    ap.add_argument("--sharded", action="store_true",
                    help="run BA sharded over all devices")
    ap.add_argument("--gt_poses", type=str, default=None)
    ap.add_argument("--max_frames", type=int, default=50)
    args = ap.parse_args()

    import cv2
    import jax
    import jax.numpy as jnp
    from accelerated_features_tpu import XFeat
    from accelerated_features_tpu.sfm import (
        BAProblem, PoseGraph, absolute_trajectory_error, bundle_adjust,
        optimize_pose_graph, reprojection_rmse, se3_compose, se3_from_Rt,
        se3_inverse)
    from accelerated_features_tpu.geometry import estimate_relative_pose
    from accelerated_features_tpu.sfm.twoview import triangulate_linear

    paths = sorted(glob.glob(os.path.join(args.images, "*")))[:args.max_frames]
    frames = [cv2.imread(p) for p in paths]
    frames = [f for f in frames if f is not None]
    assert len(frames) >= 2, "need at least two readable frames"
    h, w = frames[0].shape[:2]
    fx = args.fx or 1.2 * max(h, w)
    K = np.array([[fx, 0, w / 2], [0, fx, h / 2], [0, 0, 1]])
    print(f"[sfm] {len(frames)} frames {w}x{h}, fx={fx:.0f}")

    xf = XFeat(weights=args.weights, top_k=args.top_k,
               detection_threshold=0.012 if args.weights is None else 0.05)
    feats = [xf.detectAndCompute(f)[0] for f in frames]
    print(f"[sfm] extracted ({np.mean([len(f['keypoints']) for f in feats]):.0f} kpts/frame)")

    # sequential two-view geometry -> pose graph; pairwise inlier matches
    # also feed multi-view track building
    graph = PoseGraph.empty()
    graph.add_keyframe(np.zeros(6, np.float32))
    rel_poses = []
    pair_matches = {}
    for i in range(len(frames) - 1):
        i0, i1 = xf.match(feats[i]["descriptors"], feats[i + 1]["descriptors"],
                          min_cossim=-1)
        p0 = feats[i]["keypoints"][i0]
        p1 = feats[i + 1]["keypoints"][i1]
        res = estimate_relative_pose(p0, p1, K, K, max_epipolar_error=2.0)
        if res is None:
            print(f"[sfm] pair {i}-{i+1}: pose failed; identity edge")
            rel = np.zeros(6, np.float32)
            inl = np.zeros(len(p0), bool)
        else:
            R, t, inl = res
            rel = np.asarray(se3_from_Rt(jnp.asarray(R, jnp.float32),
                                         jnp.asarray(t, jnp.float32)))
        prev = graph.poses[i]
        graph.add_keyframe(np.asarray(
            se3_compose(jnp.asarray(rel), jnp.asarray(prev))))
        graph.add_edge(i, i + 1, rel, weight=float(max(inl.sum(), 1)))
        rel_poses.append((rel, p0, p1, inl))
        pair_matches[(i, i + 1)] = (i0[inl], i1[inl])
        print(f"[sfm] pair {i}-{i+1}: {len(p0)} matches, {inl.sum()} inliers")

    poses, info = optimize_pose_graph(graph, iters=20)
    print(f"[sfm] pose graph: cost {info['initial_cost']:.3f} -> "
          f"{info['final_cost']:.3f}")

    # multi-view tracks from pairwise inlier matches -> triangulation
    from accelerated_features_tpu.sfm import build_tracks, triangulate_tracks
    kpts_per_frame = [f["keypoints"] for f in feats]
    obs_cam, obs_pt, obs_uv, n_tracks = build_tracks(
        pair_matches, kpts_per_frame, min_length=2)
    print(f"[sfm] {n_tracks} tracks "
          f"(mean length {len(obs_cam)/max(n_tracks,1):.1f})")
    X = triangulate_tracks(obs_cam, obs_pt, obs_uv, n_tracks,
                           np.asarray(poses, np.float32),
                           np.asarray(K, np.float32))
    # drop tracks behind any observing camera or absurdly far
    from accelerated_features_tpu.sfm import se3_matrix
    Ts = np.asarray(se3_matrix(jnp.asarray(np.asarray(poses, np.float32))))
    z = np.einsum("nij,mj->nmi", Ts[:, :3, :3], X)[:, :, 2] + Ts[:, None, 2, 3]
    # vectorized per-track cheirality: a track is bad if ANY of its
    # observations sees it at non-positive depth (the per-track Python
    # loop was O(n_tracks * n_obs))
    bad_obs = z[obs_cam, obs_pt] <= 1e-2
    ok = ((np.bincount(obs_pt, weights=bad_obs, minlength=n_tracks) == 0)
          & (np.linalg.norm(X, axis=1) < 1e4))
    keep_obs = ok[obs_pt]
    remap = np.cumsum(ok) - 1
    obs_cam = obs_cam[keep_obs]
    obs_pt = remap[obs_pt[keep_obs]].astype(np.int32)
    obs_uv = obs_uv[keep_obs]
    X = X[ok].astype(np.float32)
    print(f"[sfm] map: {len(X)} points, {len(obs_cam)} observations")

    fixed = np.zeros(len(poses), bool)
    fixed[0] = True
    problem = BAProblem(
        cams=jnp.asarray(poses), points=jnp.asarray(X),
        K=jnp.asarray(K, jnp.float32),
        obs_cam=jnp.asarray(obs_cam), obs_pt=jnp.asarray(obs_pt),
        obs_uv=jnp.asarray(obs_uv),
        obs_mask=jnp.ones((len(obs_cam),), bool),
        fixed_cams=jnp.asarray(fixed))

    rmse0 = float(reprojection_rmse(problem))
    if args.sharded and len(jax.devices()) > 1:
        from accelerated_features_tpu.parallel import make_mesh
        from accelerated_features_tpu.parallel.ba import bundle_adjust_sharded
        mesh = make_mesh((len(jax.devices()), 1))
        solved, binfo = bundle_adjust_sharded(problem, mesh,
                                              iters=args.ba_iters)
        print(f"[sfm] BA sharded over {len(jax.devices())} devices")
    else:
        solved, binfo = jax.jit(lambda p: bundle_adjust(
            p, iters=args.ba_iters))(problem)
    rmse1 = float(reprojection_rmse(solved))
    print(f"[sfm] BA: reprojection RMSE {rmse0:.2f} -> {rmse1:.2f} px "
          f"(cost {float(binfo['initial_cost']):.1f} -> "
          f"{float(binfo['final_cost']):.1f})")

    out_poses = np.asarray(solved.cams)
    np.save("sfm_poses.npy", out_poses)
    np.save("sfm_points.npy", np.asarray(solved.points))
    print("[sfm] wrote sfm_poses.npy / sfm_points.npy")

    if args.gt_poses:
        gt = np.load(args.gt_poses)
        ate = absolute_trajectory_error(out_poses, gt[:len(out_poses)])
        print(f"[sfm] ATE vs GT: {ate:.4f}")


if __name__ == "__main__":
    main()
