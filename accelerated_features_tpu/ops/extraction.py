"""End-to-end extraction pipelines (sparse + semi-dense), fixed-shape.

These are the jit-compiled device programs behind the public API:
  * `detect_and_compute`       == reference XFeat.detectAndCompute
                                  (xfeat.py:49-103) with static (B, K, ·)
                                  outputs + validity mask.
  * `extract_dense`            == reference extractDense (xfeat.py:356-377).
  * `extract_dualscale`        == reference extract_dualscale
                                  (xfeat.py:379-394).
  * `detect_and_compute_dense` == reference detectAndComputeDense
                                  (xfeat.py:105-128).

All functions take NHWC float images in [0, 1] and return dicts of arrays.
Note the reference does NOT L2-normalize semi-dense descriptors
(xfeat.py:356-377) while the sparse path normalizes twice (xfeat.py:70, 93) —
both behaviours preserved.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..models.backbone import xfeat_forward
from .detect import (dense_topk, heatmap_decode_auto as heatmap_decode,
                     score_map, topk_keypoints)
from .resize import preprocess_image, resize_bilinear, to_unit_float
from .sample import sample_bicubic, sample_bicubic_matmul


def l2_normalize(x: jax.Array, axis: int = -1, eps: float = 1e-12) -> jax.Array:
    """torch F.normalize semantics: x / max(||x||, eps)."""
    n = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(n, eps)


def detect_and_compute(params: Dict[str, Any], images: jax.Array,
                       top_k: int = 4096, detection_threshold: float = 0.05,
                       compute_dtype: jnp.dtype = jnp.float32,
                       topk_approx_recall=0.9999,
                       fused_stem: Optional[bool] = None
                       ) -> Dict[str, jax.Array]:
    """Sparse keypoints + scores + 64-D descriptors (xfeat.py:49-103).

    Returns dict with fixed shapes:
      keypoints (B,K,2) f32 xy in input-image coords, scores (B,K),
      descriptors (B,K,64) L2-normalized, valid (B,K) bool.

    `topk_approx_recall`: recall target for the TPU-accelerated keypoint
    selection on the fused bf16 path (see pallas.detect_fused); None for
    exact selection. Only consulted when the fused path is taken.

    `fused_stem`: forwarded to xfeat_forward; callers under jit should
    resolve the XFEAT_FUSED_STEM env var BEFORE tracing and pass it here
    (api.XFeat does), or the env read is frozen into the compiled program.
    """
    x, rh, rw = preprocess_image(to_unit_float(images))
    H, W = x.shape[1], x.shape[2]

    feats, logits, heat = xfeat_forward(params, x, compute_dtype=compute_dtype,
                                        fused_stem=fused_stem)
    feats = l2_normalize(feats.astype(jnp.float32))
    logits = logits.astype(jnp.float32)

    kheat = heatmap_decode(logits)                       # (B, H, W)
    import os as _os
    _fused_env = _os.environ.get("XFEAT_FUSED_DETECT", "auto")
    if _fused_env not in ("auto", "0", "1"):
        raise ValueError(f"XFEAT_FUSED_DETECT={_fused_env!r}; expected "
                         "'auto', '0' or '1'")
    use_fused = (compute_dtype == jnp.bfloat16
                 and jax.default_backend() == "tpu"
                 if _fused_env == "auto" else _fused_env == "1")
    if use_fused:
        # Pallas fused NMS+score+3x3-reduce kernel with the winner's
        # in-tile position packed into the score mantissa (identical
        # keypoint sets; ordering may differ within ~3e-4 score ties;
        # covers any size incl. 800x608 and the MegaDepth eval sizes)
        from .pallas.detect_fused import topk_keypoints_fused
        kpts_i, scores = topk_keypoints_fused(
            kheat, heat[..., 0].astype(jnp.float32), top_k,
            detection_threshold, interpret=False,
            approx_recall=topk_approx_recall)
    else:
        scores_dense = score_map(kheat, heat[..., 0].astype(jnp.float32),
                                 detection_threshold)
        kpts_i, scores = topk_keypoints(scores_dense, top_k)

    if compute_dtype == jnp.bfloat16:
        b = images.shape[0]
        # The matmul formulation materializes a (B,K,w,c) bf16 intermediate
        # in HBM; past ~4 GB (large batches at high resolution) switch to
        # the VMEM-resident Pallas sampler, which trades ~1.7x stage time
        # for O(B*K*c) HBM footprint (measured: matmul 6.5 ms vs fused
        # ~16 ms per VGA b64 batch, but fused never OOMs). XFEAT_BICUBIC
        # in {'auto','matmul','fused','w2'} overrides ('w2' = the
        # single-contraction VMEM kernel, pallas/bicubic.py
        # sample_bicubic_w2 — the A/B candidate for retiring the
        # HBM-bound matmul path).
        _bic = _os.environ.get("XFEAT_BICUBIC", "auto")
        if _bic not in ("auto", "matmul", "fused", "w2"):
            raise ValueError(f"XFEAT_BICUBIC={_bic!r}; expected one of "
                             "auto/matmul/fused/w2")
        mid_bytes = b * top_k * (W // 8) * 64 * 2
        if _bic == "auto":
            _bic = "fused" if (jax.default_backend() == "tpu"
                               and mid_bytes > 4 << 30) else "matmul"
        if _bic == "fused":
            from .pallas.bicubic import sample_bicubic_fused
            descs = sample_bicubic_fused(feats, kpts_i.astype(jnp.float32),
                                         (H, W), normalize=True,
                                         interpret=False)
        elif _bic == "w2":
            from .pallas.bicubic import sample_bicubic_w2
            descs = sample_bicubic_w2(feats, kpts_i.astype(jnp.float32),
                                      (H, W), normalize=True,
                                      interpret=False)
        else:
            descs = l2_normalize(sample_bicubic_matmul(
                feats, kpts_i.astype(jnp.float32), (H, W)))
    else:
        descs = l2_normalize(sample_bicubic(
            feats, kpts_i.astype(jnp.float32), (H, W)))

    kpts = kpts_i.astype(jnp.float32) * jnp.asarray([rw, rh], jnp.float32)
    return {
        "keypoints": kpts,
        "scores": scores,
        "descriptors": descs,
        "valid": scores > 0,
    }


def extract_dense(params: Dict[str, Any], images: jax.Array, top_k: int,
                  compute_dtype: jnp.dtype = jnp.float32,
                  fused_stem: Optional[bool] = None):
    """Dense /8-grid coarse features, top-k by reliability
    (xfeat.py:356-377). Descriptors are raw (NOT L2-normalized)."""
    x, rh, rw = preprocess_image(to_unit_float(images))
    feats, _, heat = xfeat_forward(params, x, compute_dtype=compute_dtype,
                                   fused_stem=fused_stem)
    b, h, w, c = feats.shape
    k = min(h * w, top_k)

    feat_flat = feats.astype(jnp.float32).reshape(b, h * w, c)
    rel_flat = heat.astype(jnp.float32).reshape(b, h * w)
    idx, descs = dense_topk(feat_flat, rel_flat, k)

    xs = (idx % w).astype(jnp.float32) * 8.0 * rw
    ys = (idx // w).astype(jnp.float32) * 8.0 * rh
    kpts = jnp.stack([xs, ys], axis=-1)
    return kpts, descs


def extract_dualscale(params: Dict[str, Any], images: jax.Array, top_k: int,
                      s1: float = 0.6, s2: float = 1.3,
                      compute_dtype: jnp.dtype = jnp.float32,
                      fused_stem: Optional[bool] = None):
    """Two-scale coarse extraction (xfeat.py:379-394): 20% of the budget at
    0.6x, 80% at 1.3x, keypoints mapped back to input coords, per-keypoint
    extraction scale recorded for the refinement step."""
    images = to_unit_float(images)
    h, w = images.shape[1], images.shape[2]
    x1 = resize_bilinear(images, (math.floor(h * s1), math.floor(w * s1)))
    x2 = resize_bilinear(images, (math.floor(h * s2), math.floor(w * s2)))

    k1, k2 = int(top_k * 0.20), int(top_k * 0.80)
    mk1, f1 = extract_dense(params, x1, k1, compute_dtype, fused_stem)
    mk2, f2 = extract_dense(params, x2, k2, compute_dtype, fused_stem)

    kpts = jnp.concatenate([mk1 / s1, mk2 / s2], axis=1)
    sc = jnp.concatenate([
        jnp.full(mk1.shape[:2], 1.0 / s1, jnp.float32),
        jnp.full(mk2.shape[:2], 1.0 / s2, jnp.float32)], axis=1)
    feats = jnp.concatenate([f1, f2], axis=1)
    return kpts, sc, feats


def detect_and_compute_dense(params: Dict[str, Any], images: jax.Array,
                             top_k: int = 4096, multiscale: bool = True,
                             compute_dtype: jnp.dtype = jnp.float32,
                             fused_stem: Optional[bool] = None
                             ) -> Dict[str, jax.Array]:
    """Semi-dense coarse extraction dispatcher (xfeat.py:105-128)."""
    if multiscale:
        kpts, sc, feats = extract_dualscale(params, images, top_k,
                                            compute_dtype=compute_dtype,
                                            fused_stem=fused_stem)
    else:
        kpts, feats = extract_dense(params, images, top_k, compute_dtype,
                                    fused_stem)
        sc = jnp.ones(kpts.shape[:2], jnp.float32)
    return {"keypoints": kpts, "descriptors": feats, "scales": sc}
