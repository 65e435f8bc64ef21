from .pose import (decompose_homography, estimate_homography,
                   estimate_relative_pose, five_point, posekit_available,
                   sampson_sq)


def get_pose_estimator(backend: str = "posekit"):
    """Relative-pose estimator registry (VERDICT r1 #9).

    "posekit": native C++ 5-pt Nistér + LO-RANSAC (accuracy default,
               poselib-equivalent — reference megadepth1500.py:98-113);
    "tpu":     batched-hypothesis 8-pt MSAC + Sampson GN refinement on the
               accelerator (throughput mode; amortizes over pairs).
    Both return (R, t, inlier_mask) or None from pixel correspondences.
    """
    if backend == "posekit":
        return estimate_relative_pose
    if backend == "tpu":
        from .ransac_tpu import estimate_relative_pose_tpu
        return estimate_relative_pose_tpu
    raise ValueError(f"unknown pose backend {backend!r} "
                     "(expected 'posekit' or 'tpu')")


__all__ = ["estimate_relative_pose", "estimate_homography",
           "decompose_homography", "five_point", "sampson_sq",
           "posekit_available", "get_pose_estimator"]
