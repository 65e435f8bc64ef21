"""Fused keypoint-detection kernel — Pallas TPU.

Fuses the sparse-detection post-processing chain for one image into a
single VMEM-resident kernel (the XLA path materializes ~5 full-res f32
maps in HBM and pays a 39 MB tile-transpose before top-k):

  heatmap (H, W)  [XLA heatmap_decode upstream: cheap, and the softmax/
                   pixel-shuffle lane restructuring is unsupported in vregs]
  --5x5 separable local-max + threshold--> NMS mask
  --reliability lerp (two banded matmuls on the MXU)--> rel_up (H, W)
  --score = heat * rel_up masked to -1--> scores
  --pack (row%3, col%3) into the low 4 MANTISSA bits--> packed (H, W)
  --3-row tile max (reshape, no winner tracking)--> packed (ceil(H/3), W)

The winner's sub-tile position rides INSIDE the f32 score (positive-f32
bit order == value order), so every subsequent max/top-k carries it for
free: the XLA finisher does the 3-column tile max (a minor-dim reshape +
reduce) and ONE value-ordered selection — `lax.top_k` (exact) or
`lax.approx_max_k` (TPU-accelerated, recall 0.9999 default) — with no
`take_along_axis` gather. A 3x3 tile holds at most one 5x5-NMS survivor
(two survivors within Chebyshev distance <= 2 lie in each other's 5x5
windows, so both survive only on an exact tie — the same measure-zero
case the reference's `x == maxpool(x)` already double-counts), so the
reduction is exact. v2 of this kernel tracked the 2x2 winner index with
one-hot compaction matmuls; those were 82% of kernel FLOPs and the 2x2
tiles left a 2.25x-larger selection input.

Score decode loses the 4 low mantissa bits (~2e-6 relative) — far below
the 3e-4 tie window the XLA path already tolerates.

Works for any H, W (tile tails are padded with -1 inside the kernel /
finisher), so 800x608 training/eval and all /32-divisible MegaDepth eval
sizes take the fast path. Semantics identical to ops.detect.score_map +
topk_keypoints (reference xfeat.py:49-103) — verified in tests.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PALLAS = True
except ImportError:  # pragma: no cover
    _HAS_PALLAS = False

def _lerp_matrix(in_size: int, out_size: int) -> np.ndarray:
    """Banded matrix M (in, out): out = src @ M equals the reference's
    grid_sample-style bilinear upsample (align_corners=False positions with
    (out-1) normalization, zeros padding)."""
    i = np.arange(out_size, dtype=np.float64)
    src = i * (in_size / (out_size - 1)) - 0.5
    i0 = np.floor(src).astype(int)
    t = src - i0
    M = np.zeros((in_size, out_size), np.float32)
    for j in range(out_size):
        if 0 <= i0[j] < in_size:
            M[i0[j], j] += 1 - t[j]
        if 0 <= i0[j] + 1 < in_size:
            M[i0[j] + 1, j] += t[j]
    return M


def _detect_kernel(thr_smem, heat_ref, rel_ref, mw_ref, mh_ref, packed_ref):
    H, W = heat_ref.shape[1:]
    H3 = packed_ref.shape[1]                          # ceil(H / 3)
    thr = thr_smem[0, 0]
    heat = heat_ref[0]

    # 5x5 separable local max via shifted maxima (-inf outside)
    def shift_max_axis(x, axis):
        out = x
        for s in (1, 2):
            size = x.shape
            lo = jax.lax.pad(
                jax.lax.slice_in_dim(x, 0, size[axis] - s, axis=axis),
                -jnp.inf, [(s, 0, 0) if a == axis else (0, 0, 0)
                           for a in range(2)])
            hi = jax.lax.pad(
                jax.lax.slice_in_dim(x, s, size[axis], axis=axis),
                -jnp.inf, [(0, s, 0) if a == axis else (0, 0, 0)
                           for a in range(2)])
            out = jnp.maximum(out, jnp.maximum(lo, hi))
        return out

    lmax = shift_max_axis(shift_max_axis(heat, 1), 0)
    is_max = (heat >= lmax) & (heat > thr)

    # reliability upsample: two banded matmuls on the MXU, in manual
    # bf16x3: plain DEFAULT precision would truncate f32 operands to bf16
    # and quantize the scores to a ~1e-3 grid; splitting each operand into
    # bf16 hi + bf16 lo and summing hi@hi + hi@lo + lo@hi recovers ~f32
    # accuracy (error ~2^-22 relative) at 3 MXU passes instead of
    # HIGHEST's 6 (Mosaic rejects the HIGH precision that would do this
    # natively).
    def dot3(a, bm, dims):
        a_hi = a.astype(jnp.bfloat16)
        a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        b_hi = bm.astype(jnp.bfloat16)
        b_lo = (bm - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        dd = lambda x, y: jax.lax.dot_general(
            x, y, dims, preferred_element_type=jnp.float32)
        return dd(a_hi, b_hi) + (dd(a_hi, b_lo) + dd(a_lo, b_hi))

    rel = rel_ref[0]                                  # (h, w)
    rel_w = dot3(rel, mw_ref[:], (((1,), (0,)), ((), ())))    # (h, W)
    rel_up = dot3(mh_ref[:], rel_w, (((0,), (0,)), ((), ()))) # (H, W)

    # nearest-sampling border kill (last row/col), padding kill at (0,0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    border = (col_ids == W - 1) | (row_ids == H - 1)
    origin = (col_ids == 0) & (row_ids == 0)
    scores = jnp.where(is_max & ~border, heat * rel_up, -1.0)
    scores = jnp.where(origin, -1.0, scores)

    # pack the in-tile position into the low 4 mantissa bits: for positive
    # f32, bit order == value order, so the 3x3 winner's sub-position
    # survives every subsequent max for free. Invalid slots (-1.0) only
    # get infinitesimally more negative.
    sub = (row_ids % 3) * 3 + (col_ids % 3)
    bi = pltpu.bitcast(scores, jnp.int32)
    packed = pltpu.bitcast((bi & jnp.int32(~15)) | sub, jnp.float32)

    # 3-row tile max via a major-dim reshape (tail rows padded invalid)
    if H3 * 3 > H:
        packed = jax.lax.pad(packed, jnp.float32(-1.0),
                             [(0, H3 * 3 - H, 0), (0, 0, 0)])
    packed_ref[0] = jnp.max(packed.reshape(H3, 3, W), axis=1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _detect_call(kheat, rel, mw, mh, thr, interpret=False):
    b, H, W = kheat.shape
    h, w = rel.shape[1:]
    H3 = -(-H // 3)
    # Per-image working set is ~12 f32 (H, W) buffer lifetimes (NMS shifts,
    # lerp output, scores, packing); above the 16 MiB default scoped-VMEM
    # budget for >~VGA images. v5e has 128 MiB VMEM — size the cap to the
    # problem (MegaDepth eval maxes at 1216x912 -> ~70 MiB).
    vmem_cap = min(112, max(16, (14 * H * W * 4) // (1024 * 1024) + 4))
    return pl.pallas_call(
        _detect_kernel,
        grid=(b,),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_cap * 1024 * 1024),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, H, W), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w, W), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h, H), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H3, W), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, H3, W), jnp.float32),
        interpret=interpret,
    )(thr, kheat, rel, mw, mh)


def detect_scores_fused(kheat: jax.Array, reliability: jax.Array,
                        detection_threshold: float = 0.05,
                        interpret=None) -> jax.Array:
    """(B,H,W) decoded heatmap + (B,h,w) reliability -> packed f32
    (B,ceil(H/3),W): the 3-row-reduced score with the in-tile position
    embedded in the low 4 mantissa bits (value order preserved; invalid
    slots < 0). Feed to the 3-column reduction + selection in
    `topk_keypoints_fused`."""
    if not _HAS_PALLAS:
        raise RuntimeError("jax.experimental.pallas unavailable in this jax "
                           "build; use ops.detect.score_map + topk_keypoints")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, H, W = kheat.shape
    h, w = reliability.shape[1:]
    mw = jnp.asarray(_lerp_matrix(w, W))
    mh = jnp.asarray(_lerp_matrix(h, H))
    thr = jnp.full((1, 1), detection_threshold, jnp.float32)
    return _detect_call(kheat.astype(jnp.float32),
                        reliability.astype(jnp.float32), mw, mh,
                        thr, interpret=interpret)


def topk_keypoints_fused(kheat: jax.Array, reliability: jax.Array,
                         top_k: int, detection_threshold: float = 0.05,
                         interpret=None,
                         approx_recall: Optional[float] = 0.9999
                         ) -> Tuple[jax.Array, jax.Array]:
    """Fused replacement for score_map + topk_keypoints (feed it the
    heatmap_decode output). Returns ((B,K,2) int xy, (B,K) scores), same
    contract as ops.detect.topk_keypoints (scores within 4 mantissa LSBs).

    `approx_recall`: when set and running compiled on TPU, the selection
    uses the hardware-accelerated `lax.approx_max_k` at this recall target
    (default 0.9999 — expected < 1 of 4096 keypoints differing from exact,
    and only in the lowest-score tail; measured keypoint-set-identical to
    exact on realistic heatmaps). Pass None for exact selection. On CPU /
    interpret runs the exact path is always used (jax lowers approx_max_k
    to exact top_k there anyway)."""
    b, H, W = kheat.shape
    packed = detect_scores_fused(kheat, reliability, detection_threshold,
                                 interpret)
    h3 = packed.shape[1]
    w3 = -(-W // 3)
    if w3 * 3 > W:
        packed = jnp.pad(packed, ((0, 0), (0, 0), (0, w3 * 3 - W)),
                         constant_values=-1.0)
    red = jnp.max(packed.reshape(b, h3, w3, 3), axis=-1)
    flat = red.reshape(b, h3 * w3)
    use_approx = (approx_recall is not None and not interpret
                  and jax.default_backend() == "tpu"
                  and top_k <= h3 * w3)
    if use_approx:
        top, idx = jax.lax.approx_max_k(flat, top_k,
                                        recall_target=approx_recall)
    else:
        from ..detect import _padded_top_k
        top, idx = _padded_top_k(flat, top_k)
    ti = jax.lax.bitcast_convert_type(top, jnp.int32)
    sub_sel = ti & 15
    scores = jax.lax.bitcast_convert_type(ti & jnp.int32(~15), jnp.float32)
    ty = idx // w3
    tx = idx % w3
    # clamp: tile-tail padding slots (always score < 0 = invalid) would
    # otherwise decode to coordinates just past the image edge
    ys = jnp.minimum(ty * 3 + sub_sel // 3, H - 1).astype(jnp.int32)
    xs = jnp.minimum(tx * 3 + sub_sel % 3, W - 1).astype(jnp.int32)
    return jnp.stack([xs, ys], axis=-1), scores
