from .pose import (estimate_homography, estimate_relative_pose, five_point,
                   posekit_available, sampson_sq)

__all__ = ["estimate_relative_pose", "estimate_homography", "five_point",
           "sampson_sq", "posekit_available"]
