"""Depth-based ground-truth correspondence generation — fixed-shape JAX
re-design of the reference warper (modules/dataset/megadepth/megadepth_warper.py).

The reference builds per-item variable-length correspondence lists with
Python loops and LUT tensors (spvs_coarse, megadepth_warper.py:86-145); here
everything is batched, masked, and jit-compatible so GT generation runs on
device inside the input pipeline.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp


def warp_kpts(kpts0: jax.Array, depth0: jax.Array, depth1: jax.Array,
              T_0to1: jax.Array, K0: jax.Array, K1: jax.Array
              ) -> Tuple[jax.Array, jax.Array]:
    """Warp (B, L, 2) pixel keypoints from view 0 to view 1 using dense depth
    (reference warp_kpts, megadepth_warper.py:18-82).

    depth*: (B, H, W); T_0to1: (B, 4, 4) or (B, 3, 4); K: (B, 3, 3).
    Returns (valid (B, L), warped (B, L, 2)). Border depth rows/cols are
    treated as invalid (the reference zeroes row/col 0)."""
    b, l, _ = kpts0.shape
    h, w = depth0.shape[1:3]

    xi = jnp.clip(jnp.round(kpts0[..., 0]).astype(jnp.int32), 0, w - 1)
    yi = jnp.clip(jnp.round(kpts0[..., 1]).astype(jnp.int32), 0, h - 1)
    flat = depth0.reshape(b, h * w)
    d = jnp.take_along_axis(flat, yi * w + xi, axis=1)
    # reference zeroes depth row 0 and col 0 (megadepth_warper.py:36-37)
    border = (xi == 0) | (yi == 0)
    d = jnp.where(border, 0.0, d)
    valid = d > 0

    ones = jnp.ones_like(kpts0[..., :1])
    pts_h = jnp.concatenate([kpts0, ones], axis=-1) * d[..., None]
    K0inv = jnp.linalg.inv(K0)
    cam = jnp.einsum("bij,blj->bli", K0inv, pts_h)
    R = T_0to1[:, :3, :3]
    t = T_0to1[:, :3, 3]
    cam1 = jnp.einsum("bij,blj->bli", R, cam) + t[:, None, :]
    proj = jnp.einsum("bij,blj->bli", K1, cam1)
    warped = proj[..., :2] / (proj[..., 2:3] + 1e-5)
    return valid, warped


def spvs_coarse(data: Dict[str, jax.Array], scale: int = 8):
    """Coarse-grid GT correspondences with mutual-reprojection check and
    per-cell dedup (reference spvs_coarse, megadepth_warper.py:86-145),
    fully batched/fixed-shape.

    data: image0/image1 (B, H, W, C), depth0/depth1 (B, Hd, Wd),
          T_0to1/T_1to0 (B, 4, 4), K0/K1 (B, 3, 3),
          optional scale0/scale1 (B, 2) original/resized scale factors.

    Returns:
      corrs: (B, h1*w1, 4) (x0, y0, x1, y1) in /`scale` grid coords.
      mask:  (B, h1*w1) validity.
    """
    b, H0, W0 = data["image0"].shape[:3]
    H1, W1 = data["image1"].shape[1:3]
    h0, w0 = H0 // scale, W0 // scale
    h1, w1 = H1 // scale, W1 // scale

    scale0 = data.get("scale0")
    scale1 = data.get("scale1")
    s0 = scale * (scale0[:, None, :] if scale0 is not None else 1.0)
    s1 = scale * (scale1[:, None, :] if scale1 is not None else 1.0)

    gx = jnp.arange(w1, dtype=jnp.float32)
    gy = jnp.arange(h1, dtype=jnp.float32)
    grid = jnp.stack(jnp.meshgrid(gx, gy, indexing="xy"), axis=-1)
    grid_c = jnp.tile(grid.reshape(1, h1 * w1, 2), (b, 1, 1))
    grid_i = grid_c * s1

    valid1, w_pt1 = warp_kpts(grid_i, data["depth1"], data["depth0"],
                              data["T_1to0"], data["K1"], data["K0"])
    valid2, w_back = warp_kpts(w_pt1, data["depth0"], data["depth1"],
                               data["T_0to1"], data["K0"], data["K1"])
    dist = jnp.linalg.norm(grid_i - w_back, axis=-1)
    mutual = (dist < 1.5) & valid1 & valid2

    # to /scale grid coords in each image (reference divides the image-res
    # warp by scale0 then by the cell size, megadepth_warper.py:114-124)
    pts0 = w_pt1 / s0
    pts1 = grid_c  # already grid coords

    # bounds check in image0's grid
    inb = ((pts0[..., 0] >= 0) & (pts0[..., 0] < w0) &
           (pts0[..., 1] >= 0) & (pts0[..., 1] < h0))
    mask = mutual & inb

    # Dedup: at most one correspondence per source cell and per target cell
    # (reference LUT write-last-wins, megadepth_warper.py:120-136). We keep
    # the candidate with the highest linear index per cell — deterministic
    # equivalent of torch's last-write-wins index_put.
    cand_idx = jnp.arange(h1 * w1, dtype=jnp.int32)[None, :].repeat(b, 0)
    src_cell = (jnp.clip(pts0[..., 1].astype(jnp.int32), 0, h0 - 1) * w0 +
                jnp.clip(pts0[..., 0].astype(jnp.int32), 0, w0 - 1))

    def dedup_one(cells, m, idxs):
        lut = jnp.full((h0 * w0,), -1, jnp.int32)
        lut = lut.at[jnp.where(m, cells, h0 * w0)].max(
            jnp.where(m, idxs, -1), mode="drop")
        winner = lut[cells]
        return m & (winner == idxs)

    mask = jax.vmap(dedup_one)(src_cell, mask, cand_idx)
    # target-cell dedup is implicit: each target cell appears once in the grid

    corrs = jnp.concatenate([pts0, pts1], axis=-1)
    corrs = jnp.where(mask[..., None], corrs, 0.0)
    return corrs, mask


def spvs_full(data: Dict[str, jax.Array], key: jax.Array, scale: int = 8
              ) -> Tuple[jax.Array, jax.Array]:
    """FULL-resolution depth-warped correspondences from a sub-pixel
    jittered grid — the teacher-free keypoint_position_loss input for
    MegaDepth pairs (see augmentation.pair_correspondences_full for why
    both sides must carry sub-cell offsets). Same mutual-reprojection
    gate as spvs_coarse, no per-cell dedup (the loss's write-last-wins
    hashmap dedups, reference losses.py:128-130).

    Returns corrs_full (B, h1*w1, 4) (x0, y0, x1, y1) in RESIZED-image
    pixels + mask."""
    b, H0, W0 = data["image0"].shape[:3]
    H1, W1 = data["image1"].shape[1:3]
    h1, w1 = H1 // scale, W1 // scale

    scale0 = data.get("scale0")
    scale1 = data.get("scale1")
    s0 = scale0[:, None, :] if scale0 is not None else jnp.ones((1, 1, 2))
    s1 = scale1[:, None, :] if scale1 is not None else jnp.ones((1, 1, 2))

    gx = jnp.arange(w1, dtype=jnp.float32)
    gy = jnp.arange(h1, dtype=jnp.float32)
    grid = jnp.stack(jnp.meshgrid(gx, gy, indexing="xy"), axis=-1)
    jitter = jax.random.uniform(key, (b, h1 * w1, 2),
                                minval=0.0, maxval=float(scale))
    pts1_px = grid.reshape(1, h1 * w1, 2) * scale + jitter  # resized px
    pts1_i = pts1_px * s1                                   # intrinsics px

    valid1, w_pt1 = warp_kpts(pts1_i, data["depth1"], data["depth0"],
                              data["T_1to0"], data["K1"], data["K0"])
    valid2, w_back = warp_kpts(w_pt1, data["depth0"], data["depth1"],
                               data["T_0to1"], data["K0"], data["K1"])
    dist = jnp.linalg.norm(pts1_i - w_back, axis=-1)
    mutual = (dist < 1.5) & valid1 & valid2

    pts0_px = w_pt1 / s0                                    # resized px
    inb = ((pts0_px[..., 0] >= 0) & (pts0_px[..., 0] < W0) &
           (pts0_px[..., 1] >= 0) & (pts0_px[..., 1] < H0) &
           (pts1_px[..., 0] < W1) & (pts1_px[..., 1] < H1))
    mask = mutual & inb
    corrs_full = jnp.concatenate([pts0_px, pts1_px], axis=-1)
    return jnp.where(mask[..., None], corrs_full, 0.0), mask


def corr_to_fixed(corrs: jax.Array, mask: jax.Array, max_corrs: int,
                  key: jax.Array = None) -> Tuple[jax.Array, jax.Array]:
    """Compact (pack valid first) and pad/truncate to a fixed M — keeps the
    trainer's shapes static across batches.

    `key`: when given, valid correspondences are randomly subsampled when
    they exceed `max_corrs`. Without it, truncation keeps the first
    `max_corrs` valid rows in raster order — a systematic top-of-image
    bias whenever a pair has more than `max_corrs` valid correspondences
    (the reference trains on ALL correspondences, train.py:222-249, so
    the fixed-budget port must at least sample them uniformly)."""
    if key is not None:
        prio = jnp.where(mask, jax.random.uniform(key, mask.shape), 2.0)
        order = jnp.argsort(prio, axis=1)            # random valid first
    else:
        order = jnp.argsort(~mask, axis=1, stable=True)  # valid first
    corrs = jnp.take_along_axis(corrs, order[..., None], axis=1)
    mask = jnp.take_along_axis(mask, order, axis=1)
    return corrs[:, :max_corrs], mask[:, :max_corrs]
