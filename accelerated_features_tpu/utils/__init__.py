from .checkpoint import (latest_checkpoint, restore_checkpoint,
                         resume_or_init, save_checkpoint)

__all__ = ["save_checkpoint", "restore_checkpoint", "latest_checkpoint",
           "resume_or_init"]
