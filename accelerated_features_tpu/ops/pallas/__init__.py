from .mnn import batch_mnn_match_fused, mnn_match_fused

__all__ = ["mnn_match_fused", "batch_mnn_match_fused"]
