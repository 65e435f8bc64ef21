"""Sparse keypoint extraction post-processing, fixed-shape TPU-native.

Replaces the reference's dynamic-shape pipeline (xfeat.py:49-103, 242-263)
with dense masked computation + one `lax.top_k`:

  reference:  softmax->pixelshuffle heatmap; 5x5 maxpool NMS; per-item
              `.nonzero()` (device->host sync!); python pad loop; sparse
              score sampling; argsort; gather top-k.
  here:       heatmap decode (pure XLA); dense local-max mask via
              reduce_window; a *dense* score map computed with the exact
              sampling semantics the reference applies at sparse points
              (nearest on the full-res heatmap == identity w/ last-row/col
              OOB; bilinear on the /8 reliability map); invalid pixels
              scored -1; single top_k over H*W. No host syncs, no dynamic
              shapes, batched end-to-end.

Selection semantics match the reference exactly: the reference keeps all
local maxima above threshold, scores them with nearest(K1h)*bilinear(H1),
argsorts descending and truncates to top_k, padding with score -1
(xfeat.py:74-87). Our dense score map assigns non-maxima -1 and takes the
same top_k, so the selected set and ordering coincide (up to score ties).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def heatmap_decode(logits: jax.Array, softmax_temp: float = 1.0) -> jax.Array:
    """Keypoint logits (B,h,w,65) -> full-res heatmap (B, h*8, w*8).

    Softmax over the 65 bins, drop the dustbin, pixel-shuffle the 64 in-cell
    bins (channel = 8*dy + dx) to 8x8 pixels (reference xfeat.py:242-247)."""
    b, h, w, _ = logits.shape
    scores = jax.nn.softmax(logits * softmax_temp, axis=-1)[..., :64]
    scores = scores.reshape(b, h, w, 8, 8)          # (B,h,w,dy,dx)
    scores = scores.transpose(0, 1, 3, 2, 4)        # (B,h,dy,w,dx)
    return scores.reshape(b, h * 8, w * 8)


def heatmap_decode_convt(logits: jax.Array,
                         softmax_temp: float = 1.0) -> jax.Array:
    """`heatmap_decode` with the pixel-shuffle expressed as a stride-8
    transposed convolution with a 0/1 scatter kernel — candidate measured
    for VERDICT r3 'Next round' #4 (the decode stage ran at 24-30% SoL:
    XLA lowers the (b,h,w,8,8)->(b,h,8,w,8) transpose as an HBM
    transpose-copy). Each output pixel receives exactly ONE contribution
    (weight 1), so with HIGHEST precision the result is bit-faithful to
    the reshape formulation. The MXU does the data movement: FLOPs are
    b*h*w*64*64 ~= 1.3 G MAC per VGA image batch item — noise."""
    b, h, w, _ = logits.shape
    scores = jax.nn.softmax(logits * softmax_temp, axis=-1)[..., :64]
    # kernel[7-dy, 7-dx, c == 8*dy+dx, 0] = 1: conv_transpose applies the
    # HWIO kernel spatially mirrored (fractionally-strided conv), so the
    # scatter offsets are stored flipped (verified bit-exact vs the
    # reshape formulation in tests)
    k = jnp.eye(64, dtype=scores.dtype).reshape(8, 8, 64)[::-1, ::-1]
    out = jax.lax.conv_transpose(
        scores, k[:, :, :, None], strides=(8, 8), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST)
    return out[..., 0]


def heatmap_decode_planes(logits: jax.Array,
                          softmax_temp: float = 1.0) -> jax.Array:
    """`heatmap_decode` with the pixel-shuffle expressed as 8 channel-slice
    row planes + stack (the (w, dx) minor-dims merge is a free reshape;
    only the dy axis moves) — measured alternative lowering of the same
    transpose."""
    b, h, w, _ = logits.shape
    scores = jax.nn.softmax(logits * softmax_temp, axis=-1)[..., :64]
    hd = scores.reshape(b, h, w, 8, 8)
    planes = [hd[:, :, :, dy, :].reshape(b, h, w * 8) for dy in range(8)]
    return jnp.stack(planes, axis=2).reshape(b, h * 8, w * 8)


def heatmap_decode_auto(logits: jax.Array,
                        softmax_temp: float = 1.0) -> jax.Array:
    """Dispatch between the bit-exact decode formulations, default
    'reshape' everywhere; override with XFEAT_DECODE in {'reshape',
    'convt', 'planes'}. Resolved at TRACE time (same caveat as
    XFEAT_FUSED_STEM): set the env var before the first jitted call.

    History (docs/DESIGN.md section 10e): round 4 made 'convt' the TPU
    default off an end-to-end A/B that showed +7.6%% — but that harness
    perturbed only a PARAM leaf between scan iterations, which let XLA
    treat the image-dependent majority of the pipeline as loop-constant;
    under an honest harness (input perturbed every iteration, round 5)
    the conv_transpose lowering is a catastrophic 8x END-TO-END
    regression on v5e (435 vs 3486 FPS at VGA b64), matching its 131 ms
    isolated cost. 'reshape' and 'planes' measure within noise of each
    other (3486 vs 3456 FPS). All variants are bit-exact (tested), so
    the choice never changes results."""
    import os
    default = "reshape"
    impl = os.environ.get("XFEAT_DECODE", default)
    variants = {"reshape": heatmap_decode, "convt": heatmap_decode_convt,
                "planes": heatmap_decode_planes}
    if impl not in variants:
        # a typo would otherwise surface as a bare KeyError at trace time
        # deep inside jit with no hint of valid values (ADVICE r4)
        raise ValueError(
            f"XFEAT_DECODE={impl!r} is not a decode variant; expected one "
            f"of {sorted(variants)}")
    return variants[impl](logits, softmax_temp)


def local_max_mask(heat: jax.Array, threshold: float = 0.05,
                   kernel_size: int = 5) -> jax.Array:
    """(B,H,W) -> bool mask of 5x5 local maxima above threshold
    (reference NMS, xfeat.py:249-253). Ties inside the window all pass, same
    as the reference's `x == maxpool(x)` test."""
    pad = kernel_size // 2
    lmax = jax.lax.reduce_window(
        heat, -jnp.inf, jax.lax.max,
        (1, kernel_size, kernel_size), (1, 1, 1),
        [(0, 0), (pad, pad), (pad, pad)])
    return (heat == lmax) & (heat > threshold)


def _upsample_reliability(rel: jax.Array, out_hw: Tuple[int, int]) -> jax.Array:
    """Dense equivalent of bilinearly sampling the /8 reliability map at every
    integer full-res pixel with the reference convention
    (interpolator.py:17-32): ix = x * w/(W-1) - 0.5, zeros padding.

    Separable 1-D lerps along W then H (cheap, fully vectorized)."""
    b, h, w = rel.shape
    H, W = out_hw

    def lerp_axis(arr, in_size, out_size, axis):
        i = jnp.arange(out_size, dtype=jnp.float32)
        src = i * (in_size / (out_size - 1)) - 0.5
        i0 = jnp.floor(src).astype(jnp.int32)
        t = src - i0
        v0_in = (i0 >= 0) & (i0 < in_size)
        v1_in = (i0 + 1 >= 0) & (i0 + 1 < in_size)
        g0 = jnp.take(arr, jnp.clip(i0, 0, in_size - 1), axis=axis)
        g1 = jnp.take(arr, jnp.clip(i0 + 1, 0, in_size - 1), axis=axis)
        shape = [1] * arr.ndim
        shape[axis] = out_size
        t = t.reshape(shape)
        m0 = v0_in.reshape(shape).astype(arr.dtype)
        m1 = v1_in.reshape(shape).astype(arr.dtype)
        return g0 * m0 * (1 - t) + g1 * m1 * t

    out = lerp_axis(rel, w, W, axis=2)
    out = lerp_axis(out, h, H, axis=1)
    return out


def score_map(kpt_heat: jax.Array, reliability: jax.Array,
              threshold: float = 0.05, kernel_size: int = 5) -> jax.Array:
    """Dense keypoint score map (B,H,W): nearest(K1h) * bilinear(H1) at local
    maxima, -1 elsewhere (reference xfeat.py:74-80 semantics).

    `reliability` is the /8 map (B,h,w) (squeezed heatmap head output).
    The reference's 'nearest' sampling of the full-res heatmap at integer
    pixels is the identity except at the last row/column where torch's
    half-to-even rounding falls out of bounds (zeros padding) — reproduced by
    zeroing that border (H, W are /32-divisible hence even).
    Pixel (0,0) is forced to -1, mirroring the reference's padding-kill
    `scores[all(mkpts==0)] = -1` (xfeat.py:80)."""
    b, H, W = kpt_heat.shape
    mask = local_max_mask(kpt_heat, threshold, kernel_size)

    near = kpt_heat.at[:, :, W - 1].set(0.0).at[:, H - 1, :].set(0.0)
    rel_up = _upsample_reliability(reliability, (H, W))
    scores = near * rel_up
    scores = jnp.where(mask, scores, -1.0)
    scores = scores.at[:, 0, 0].set(-1.0)
    return scores


def _padded_top_k(flat: jax.Array, k: int) -> Tuple[jax.Array, jax.Array]:
    """lax.top_k that tolerates k > axis size: clamps k and pads the tail
    with (-1.0, index 0) so callers keep a static (B, K) shape. Matches the
    reference's argsort[:top_k] slice, which also just yields fewer valid
    entries on tiny images (xfeat.py:83-87)."""
    n = flat.shape[-1]
    if k <= n:
        return jax.lax.top_k(flat, k)
    scores, idx = jax.lax.top_k(flat, n)
    pad = [(0, 0)] * (flat.ndim - 1) + [(0, k - n)]
    return (jnp.pad(scores, pad, constant_values=-1.0),
            jnp.pad(idx, pad, constant_values=0))


def topk_keypoints(scores: jax.Array, top_k: int
                   ) -> Tuple[jax.Array, jax.Array]:
    """Dense (B,H,W) score map -> ((B,K,2) int xy keypoints, (B,K) scores),
    sorted by descending score. Invalid slots have score <= 0 (same contract
    as the reference's `valid = scores > 0`, xfeat.py:98).

    Fast path: the 5x5 NMS guarantees two (tie-free) local maxima are >= 3
    apart in Chebyshev distance, so each 2x2 tile holds at most one positive
    score — an exact 2x2 max-reduction shrinks the top-k problem 4x (a large
    win on TPU, where top_k cost scales with the scan length). Exact up to
    ties inside a tile, which for real score maps (softmax*sigmoid products)
    occur only on degenerate flat inputs."""
    b, h, w = scores.shape
    if h % 2 or w % 2:
        flat = scores.reshape(b, h * w)
        top_scores, idx = _padded_top_k(flat, top_k)
        xs = (idx % w).astype(jnp.int32)
        ys = (idx // w).astype(jnp.int32)
        return jnp.stack([xs, ys], axis=-1), top_scores

    # tile-transpose to (…, 4) + argmax: measured fastest on v5e among
    # reduce_window / reshape-max / gather-recovery variants
    s4 = scores.reshape(b, h // 2, 2, w // 2, 2)
    s4 = s4.transpose(0, 1, 3, 2, 4).reshape(b, h // 2, w // 2, 4)
    best = jnp.max(s4, axis=-1)
    arg = jnp.argmax(s4, axis=-1).astype(jnp.int32)
    top_scores, idx = _padded_top_k(best.reshape(b, -1), top_k)
    sub = jnp.take_along_axis(arg.reshape(b, -1), idx, axis=1)
    ty = idx // (w // 2)
    tx = idx % (w // 2)
    ys = (ty * 2 + sub // 2).astype(jnp.int32)
    xs = (tx * 2 + sub % 2).astype(jnp.int32)
    return jnp.stack([xs, ys], axis=-1), top_scores


def dense_topk(feat_flat: jax.Array, rel_flat: jax.Array, top_k: int):
    """Semi-dense extraction selector (reference extractDense,
    xfeat.py:356-377): top-k /8 cells by reliability; gather descriptors.

    feat_flat: (B, h*w, C); rel_flat: (B, h*w) -> (idx (B,K), feats (B,K,C)).
    For tiny images with fewer than K cells the tail is padded (cell 0,
    reliability -1) rather than erroring, mirroring the reference's
    shorter-output behavior (xfeat.py:371)."""
    scores, idx = _padded_top_k(rel_flat, top_k)
    feats = jnp.take_along_axis(feat_flat, idx[..., None], axis=1)
    return idx, feats
