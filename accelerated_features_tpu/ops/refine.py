"""Semi-dense match refinement — the XFeat* core, batched and fixed-shape.

Replaces the reference's per-item Python loop (xfeat.py:212-215, 292-325):
matched coarse descriptor pairs go through the fine-matcher MLP; the 64
logits are re-read as an 8x8 offset heatmap; a temperature-3 soft-argmax
yields a sub-pixel offset that is scaled by the extraction scale and added to
the source keypoint; matches below the confidence gate are masked out.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from ..models.backbone import fine_matcher_forward


def subpix_softmax2d(logits: jax.Array, temp: float = 3.0) -> jax.Array:
    """(…, 64) logits -> (…, 2) soft-argmax offsets over the 8x8 grid,
    centered at (W//2, H//2) = (4, 4) (reference xfeat.py:292-304)."""
    probs = jax.nn.softmax(logits * temp, axis=-1)
    grid = jnp.arange(8, dtype=probs.dtype) - 4.0
    px = probs.reshape(*probs.shape[:-1], 8, 8)
    off_x = jnp.sum(px * grid[None, :], axis=(-2, -1))
    off_y = jnp.sum(px * grid[:, None], axis=(-2, -1))
    return jnp.stack([off_x, off_y], axis=-1)


def refine_matches(params: Dict[str, Any],
                   kpts0: jax.Array, kpts1: jax.Array,
                   descs0: jax.Array, descs1: jax.Array,
                   scales0: jax.Array,
                   idx1: jax.Array, match_mask: jax.Array,
                   fine_conf: float = 0.25,
                   ) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Refine coarse matches (reference xfeat.py:306-325), batched.

    Args:
      params: model pytree (uses params['fine_matcher']).
      kpts0/1: (B, K, 2) coarse keypoints (image coords).
      descs0/1: (B, K, 64) coarse descriptors.
      scales0: (B, K) extraction scale of set 0 (dual-scale path).
      idx1: (B, K) per-slot match index into set 1 (from batch MNN).
      match_mask: (B, K) bool — which slots are actual mutual matches.
      fine_conf: confidence gate (reference default 0.25).

    Returns:
      mkpts0: (B, K, 2) refined source keypoints.
      mkpts1: (B, K, 2) matched target keypoints (gathered).
      conf:   (B, K) refinement confidence.
      mask:   (B, K) match_mask & (conf > fine_conf).
    """
    f1 = descs0
    f2 = jnp.take_along_axis(descs1, idx1[..., None], axis=1)
    k1 = jnp.take_along_axis(kpts1, idx1[..., None], axis=1)

    logits = fine_matcher_forward(params, jnp.concatenate([f1, f2], axis=-1))
    conf = jnp.max(jax.nn.softmax(logits * 3.0, axis=-1), axis=-1)
    offsets = subpix_softmax2d(logits, temp=3.0)

    mkpts0 = kpts0 + offsets * scales0[..., None]
    mask = match_mask & (conf > fine_conf)
    return mkpts0, k1, conf, mask
