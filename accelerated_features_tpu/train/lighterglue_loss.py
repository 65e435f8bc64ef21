"""LighterGlue training loss — negative log-likelihood of the ground-truth
assignment under the dustbin log-assignment matrix (the LightGlue training
objective; the reference ships only pretrained weights via kornia, so this
is capability the reference lacks in-repo).

GT supervision comes from the same fixed-shape correspondence machinery the
detector trainer uses (train/warp.py spvs_coarse or
train/augmentation.pair_correspondences): matched keypoint index pairs plus
unmatchable sets.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp


def assignment_nll(log_assignment: jax.Array,
                   gt_idx0: jax.Array, gt_idx1: jax.Array,
                   gt_valid: jax.Array,
                   unmatched0: Optional[jax.Array] = None,
                   unmatched1: Optional[jax.Array] = None
                   ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """NLL of GT matches + dustbin NLL for unmatchable points.

    Args:
      log_assignment: (B, M+1, N+1) from lighterglue_forward.
      gt_idx0, gt_idx1: (B, S) index pairs of true correspondences (padded).
      gt_valid: (B, S) bool.
      unmatched0: (B, M) bool — keypoints of image0 with no true match.
      unmatched1: (B, N) bool.

    Returns (scalar loss, metrics dict).
    """
    b, m1, n1 = log_assignment.shape
    m, n = m1 - 1, n1 - 1

    # positive terms
    flat = log_assignment.reshape(b, -1)
    lin = gt_idx0 * n1 + gt_idx1
    pos = jnp.take_along_axis(flat, lin, axis=1)
    n_pos = jnp.maximum(jnp.sum(gt_valid), 1)
    loss_pos = -jnp.sum(jnp.where(gt_valid, pos, 0.0)) / n_pos

    metrics = {"nll_pos": loss_pos}
    loss = loss_pos

    # dustbin terms (LightGlue averages the two unmatchable sides)
    if unmatched0 is not None:
        dust0 = log_assignment[:, :m, n]
        n0 = jnp.maximum(jnp.sum(unmatched0), 1)
        loss_un0 = -jnp.sum(jnp.where(unmatched0, dust0, 0.0)) / n0
        loss = loss + 0.5 * loss_un0
        metrics["nll_unmatched0"] = loss_un0
    if unmatched1 is not None:
        dust1 = log_assignment[:, m, :n]
        nu1 = jnp.maximum(jnp.sum(unmatched1), 1)
        loss_un1 = -jnp.sum(jnp.where(unmatched1, dust1, 0.0)) / nu1
        loss = loss + 0.5 * loss_un1
        metrics["nll_unmatched1"] = loss_un1

    # accuracy: argmax over rows recovers gt for valid pairs
    inner = log_assignment[:, :m, :n]
    pred = jnp.argmax(inner, axis=2)
    hit = jnp.take_along_axis(pred, gt_idx0, axis=1) == gt_idx1
    metrics["match_acc"] = jnp.sum(hit & gt_valid) / n_pos
    metrics["loss_total"] = loss
    return loss, metrics


def lighterglue_loss(params, batch: Dict[str, jax.Array], heads: int = 1):
    """Full forward + loss on a fixed-shape batch:
      kpts0/1 (B,M,2), descs0/1 (B,M,64), size0/1 (B,2), mask0/1 (B,M),
      gt_idx0/gt_idx1/gt_valid (B,S), unmatched0/1 (B,M)."""
    from ..models.lighterglue import lighterglue_forward
    out = lighterglue_forward(
        params, batch["kpts0"], batch["kpts1"],
        batch["descs0"], batch["descs1"],
        batch["size0"], batch["size1"],
        batch.get("mask0"), batch.get("mask1"), heads=heads)
    return assignment_nll(out["log_assignment"],
                          batch["gt_idx0"], batch["gt_idx1"],
                          batch["gt_valid"],
                          batch.get("unmatched0"), batch.get("unmatched1"))
