from .detect import (dense_topk, heatmap_decode, local_max_mask, score_map,
                     topk_keypoints)
from .extraction import (detect_and_compute, detect_and_compute_dense,
                         extract_dense, extract_dualscale, l2_normalize)
from .matching import batch_mnn_match, batch_mnn_match_dense, mnn_match
from .refine import refine_matches, subpix_softmax2d
from .resize import (preprocess_image, preprocess_shape, resize_bilinear,
                     resize_nearest_torch)
from .sample import (interpolate_sparse2d, sample_bicubic,
                     sample_bicubic_matmul, sample_bilinear, sample_nearest)

__all__ = [
    "heatmap_decode", "local_max_mask", "score_map", "topk_keypoints",
    "dense_topk", "detect_and_compute", "detect_and_compute_dense",
    "extract_dense", "extract_dualscale", "l2_normalize", "mnn_match",
    "batch_mnn_match", "batch_mnn_match_dense", "refine_matches",
    "subpix_softmax2d", "preprocess_image", "preprocess_shape",
    "resize_bilinear", "resize_nearest_torch", "interpolate_sparse2d",
    "sample_bicubic", "sample_bicubic_matmul", "sample_bilinear",
    "sample_nearest",
]
