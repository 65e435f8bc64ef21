"""Monocular SLAM on a rendered ground-truth trajectory, with ATE.

Renders a short orbit sequence with exact poses
(train/render.render_trajectory), streams it through the incremental
tracker — XFeat extraction, MNN matching, E/H-model-selected two-view
pose (geometry.decompose_homography guards the planar degeneracy),
monocular scale propagation, windowed bundle adjustment, loop closure +
pose-graph optimization (sfm/slam.py) — and reports Umeyama-aligned ATE
RMSE against the ground truth. The reference has no SLAM layer; its
nearest anchor is the two-view pose eval
(reference modules/dataset/megadepth/megadepth_warper.py:18-82).

Run: python examples/09_slam_ate.py   (~2-4 min on CPU; small frames)
"""
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from accelerated_features_tpu import XFeat
    from accelerated_features_tpu.sfm import (IncrementalSlam, SlamConfig,
                                              absolute_trajectory_error)
    from accelerated_features_tpu.train.render import render_trajectory
    from apps.eval_slam import gt_pose6

    rng = np.random.default_rng(0)
    # corner-rich noise textures (a texture pool directory works too)
    texs = [rng.integers(0, 256, (128, 128, 3)).astype(np.uint8)
            for _ in range(12)]
    traj = render_trajectory(rng, texs, n_frames=16, w=320, h=240,
                             arc_deg=30.0, loop=True)

    xf = XFeat(top_k=1024, detection_threshold=0.012)
    slam = IncrementalSlam(
        traj["K"], SlamConfig(window=5),
        extract=lambda im: xf.detectAndCompute(im)[0],
        match=lambda d0, d1: xf.match(d0["descriptors"],
                                      d1["descriptors"], min_cossim=-1))
    for i, frame in enumerate(traj["images"]):
        out = slam.process_frame(frame)
        print(f"frame {i:3d} {'KF' if out['is_keyframe'] else '  '} "
              f"inliers {out['n_inliers']:4d}"
              f"{'  LOOP' if out['loop_closed'] else ''}")

    gt6 = np.stack([gt_pose6(T) for T in traj["poses"]])
    fids = slam.keyframe_frame_ids()
    ate = absolute_trajectory_error(slam.trajectory(), gt6[fids])
    print(f"\n{len(fids)} keyframes, {slam.n_loop_closures} loop "
          f"closures, ATE RMSE {ate:.4f} (random weights: expect rough "
          f"poses; pass weights=... for a trained extractor)")


if __name__ == "__main__":
    main()
