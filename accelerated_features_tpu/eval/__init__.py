from .metrics import (error_auc, mean_accuracy, pose_errors_to_summary,
                      relative_pose_error)

__all__ = ["relative_pose_error", "error_auc", "mean_accuracy",
           "pose_errors_to_summary"]
