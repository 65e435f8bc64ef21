"""Incremental SLAM demo: stream frames from a directory through the online
tracker (keyframing + sliding-window BA) and report the trajectory.

Run: python apps/slam_demo.py --images <dir> [--fx 600] [--gt_poses gt.npy]
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
    ap.add_argument("--images", required=True)
    ap.add_argument("--fx", type=float, default=None)
    ap.add_argument("--top_k", type=int, default=2048)
    ap.add_argument("--weights", type=str, default=None)
    ap.add_argument("--window", type=int, default=6)
    ap.add_argument("--gt_poses", type=str, default=None)
    ap.add_argument("--max_frames", type=int, default=200)
    args = ap.parse_args()

    import cv2
    from accelerated_features_tpu import XFeat
    from accelerated_features_tpu.sfm import (IncrementalSlam, SlamConfig,
                                              absolute_trajectory_error)

    paths = sorted(glob.glob(os.path.join(args.images, "*")))[:args.max_frames]
    # the first READABLE image defines the resolution; skip stray
    # non-image files (gt.npy, README, corrupt frames)
    first = None
    for p in paths:
        first = cv2.imread(p)
        if first is not None:
            break
    if first is None:
        raise SystemExit(f"no readable images in {args.images}")
    h, w = first.shape[:2]
    fx = args.fx or 1.2 * max(h, w)
    K = np.array([[fx, 0, w / 2], [0, fx, h / 2], [0, 0, 1]])

    xf = XFeat(weights=args.weights, top_k=args.top_k,
               detection_threshold=0.012 if args.weights is None else 0.05)
    slam = IncrementalSlam(
        K, SlamConfig(window=args.window),
        extract=lambda im: xf.detectAndCompute(im)[0],
        match=lambda d0, d1: xf.match(d0["descriptors"], d1["descriptors"],
                                      min_cossim=-1))

    for i, p in enumerate(paths):
        frame = cv2.imread(p)
        if frame is None:
            continue
        out = slam.process_frame(frame)
        tag = "KF" if out["is_keyframe"] else "  "
        print(f"[slam] frame {i:4d} {tag} inliers {out['n_inliers']:4d} "
              f"pose t=({out['pose6'][3]:+.2f},{out['pose6'][4]:+.2f},"
              f"{out['pose6'][5]:+.2f})"
              + (f" ba_rmse {slam.last_ba_rmse:.2f}px"
                 if out["is_keyframe"] and slam.last_ba_rmse else ""))

    traj = slam.trajectory()
    np.save("slam_trajectory.npy", traj)
    print(f"[slam] {len(traj)} keyframes -> slam_trajectory.npy")
    if args.gt_poses:
        gt = np.load(args.gt_poses)
        # keyframes are a subset of frames: compare against the GT pose of
        # each keyframe's SOURCE frame, not the first len(traj) frames
        fids = slam.keyframe_frame_ids()
        print(f"[slam] ATE: "
              f"{absolute_trajectory_error(traj, gt[fids]):.4f}")


if __name__ == "__main__":
    main()
