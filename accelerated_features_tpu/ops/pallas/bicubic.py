"""Fused bicubic descriptor sampling — Pallas TPU kernel.

The XLA throughput path (`ops/sample.py:sample_bicubic_matmul`) evaluates
the separable bicubic interpolation as two contractions whose intermediate
`rows` tensor is (B, K, w, c) — 2.7 GB at VGA/B=64/K=4096 — so the stage is
HBM-bound at ~6.5 ms/batch. This kernel keeps the whole per-image problem
in VMEM. MEASURED (TPU v5e, VGA b64): ~16 ms/batch — the per-tile
(TK, hp) @ (hp, w*c) matmul re-reduces the full map height per keypoint
tile, so it LOSES to the matmul path on time while winning on HBM
footprint (O(B*K*c) — never OOMs at high resolution/batch). The extraction
pipeline therefore uses it only when the matmul intermediate would exceed
~4 GB (ops/extraction.py):

  per (image, keypoint-tile):
    Sy (TK, hp)   built on the VPU from y0 + cubic weights (4 compare-FMAs)
    mid (TK, w*c) = Sy @ F  on the MXU  (F = feature map reshaped (hp, w*c))
    out (TK, c)   = sum_x Sx[:,x] * mid[:, x*c:(x+1)*c]  (VPU column loop)
    L2-normalize rows (torch F.normalize semantics) and write.

Only the inputs (once) and the (B, K, c) output touch HBM. Out-of-bounds
taps contribute zero exactly like grid_sample zeros padding (the index
comparison never fires). Matches `sample_bicubic` up to bf16 rounding of
the mid accumulation — parity-tested in interpret mode and vs the f32
reference (reference semantics: interpolator.py:21-33 bicubic,
xfeat.py:90-93 sampling + F.normalize).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PALLAS = True
except ImportError:  # pragma: no cover
    _HAS_PALLAS = False

from ..sample import _cubic_weights, _source_coords


def _bicubic_kernel(y0_ref, x0_ref, wy_ref, wx_ref, f_ref, out_ref,
                    *, w: int, c: int, hp: int, normalize: bool):
    tk = y0_ref.shape[1]
    y0 = y0_ref[0]                            # (TK, 1) int32
    x0 = x0_ref[0]
    wy = wy_ref[0]                            # (TK, 4)
    wx = wx_ref[0]

    iy = jax.lax.broadcasted_iota(jnp.int32, (tk, hp), 1)
    sy = jnp.zeros((tk, hp), jnp.float32)
    for d in range(4):
        sy = sy + wy[:, d:d + 1] * (iy == (y0 + (d - 1))).astype(jnp.float32)

    ix = jax.lax.broadcasted_iota(jnp.int32, (tk, w), 1)
    sx = jnp.zeros((tk, w), jnp.float32)
    for d in range(4):
        sx = sx + wx[:, d:d + 1] * (ix == (x0 + (d - 1))).astype(jnp.float32)

    # f32 accumulator (Mosaic requires a 32-bit matmul acc); TK is sized
    # so the (TK, w*c) buffer fits VMEM comfortably
    mid = jax.lax.dot_general(
        sy.astype(jnp.bfloat16), f_ref[0],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)   # (TK, w*c)

    acc = jnp.zeros((tk, c), jnp.float32)
    for x in range(w):
        acc = acc + sx[:, x:x + 1] * mid[:, x * c:(x + 1) * c]

    if normalize:
        norm = jnp.sqrt(jnp.sum(acc * acc, axis=-1, keepdims=True))
        acc = acc / jnp.maximum(norm, 1e-12)
    out_ref[0] = acc


@functools.partial(jax.jit,
                   static_argnames=("tk", "normalize", "interpret"))
def _bicubic_call(y0, x0, wy, wx, f_perm, tk, normalize, interpret):
    b, k = y0.shape[:2]
    hp, wc = f_perm.shape[1:]
    c = 64
    w = wc // c
    kernel = functools.partial(_bicubic_kernel, w=w, c=c, hp=hp,
                               normalize=normalize)
    return pl.pallas_call(
        kernel,
        grid=(b, k // tk),
        in_specs=[
            pl.BlockSpec((1, tk, 1), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk, 1), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk, 4), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk, 4), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hp, wc), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tk, c), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, k, c), jnp.float32),
        interpret=interpret,
    )(y0, x0, wy, wx, f_perm)


def sample_bicubic_fused(maps: jax.Array, pos: jax.Array,
                         ref_hw: Tuple[int, int],
                         normalize: bool = True,
                         interpret=None) -> jax.Array:
    """Bicubic-sample (B,h,w,64) maps at (B,K,2) xy positions given in the
    (H, W) = `ref_hw` frame; optionally L2-normalize the descriptors.

    Drop-in for `l2_normalize(sample_bicubic_matmul(...))` on TPU."""
    if not _HAS_PALLAS:
        raise RuntimeError("jax.experimental.pallas unavailable in this jax "
                           "build; use ops.sample.sample_bicubic_matmul")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, h, w, c = maps.shape
    k = pos.shape[1]
    assert c == 64, "kernel is specialized for 64-D descriptors"

    ix, iy = _source_coords(pos, ref_hw, (h, w))
    x0 = jnp.floor(ix).astype(jnp.int32)
    y0 = jnp.floor(iy).astype(jnp.int32)
    wx = jnp.stack(_cubic_weights(ix - x0), axis=-1)   # (B, K, 4)
    wy = jnp.stack(_cubic_weights(iy - y0), axis=-1)

    hp = h + (-h) % 8
    f_perm = maps.astype(jnp.bfloat16).reshape(b, h, w * c)
    if hp != h:
        f_perm = jnp.pad(f_perm, ((0, 0), (0, hp - h), (0, 0)))

    # keypoint tile sized to the VMEM budget: the (TK, w*c) f32 `mid`
    # buffer (plus its matmul accumulator copy) dominates scoped VMEM, so
    # shrink TK as the feature-map width grows (w = W/8; MegaDepth eval
    # sizes reach w = 150)
    tk = 256 if w <= 80 else (128 if w <= 160 else 64)
    kp = k + (-k) % tk
    if kp != k:
        pad = ((0, 0), (0, kp - k), (0, 0))
        y0 = jnp.pad(y0[..., None], ((0, 0), (0, kp - k), (0, 0)))
        x0 = jnp.pad(x0[..., None], ((0, 0), (0, kp - k), (0, 0)))
        wy = jnp.pad(wy, pad)
        wx = jnp.pad(wx, pad)
    else:
        y0 = y0[..., None]
        x0 = x0[..., None]

    out = _bicubic_call(y0, x0, wy.astype(jnp.float32),
                        wx.astype(jnp.float32), f_perm, tk, normalize,
                        interpret)
    return out[:, :k]


def _bicubic_w2_kernel(y0_ref, x0_ref, wy_ref, wx_ref, f_ref, out_ref,
                       *, w: int, c: int, hp: int, normalize: bool):
    """One dense MXU contraction per keypoint tile: the separable one-hot
    factors are multiplied into a flat (TK, hp*w) weight matrix (16
    nonzeros per row) and contracted against the map viewed as
    (hp*w, c). Avoids both the HBM-resident (B,K,w,c) intermediate of
    the XLA matmul path AND the per-column VPU slice loop that made the
    first fused kernel lose on time (its unaligned c=64-wide slices of
    `mid` relayout every iteration): here the only non-matmul work is
    the VPU one-hot build + one minor-dim reshape."""
    tk = y0_ref.shape[1]
    y0 = y0_ref[0]                            # (TK, 1) int32
    x0 = x0_ref[0]
    wy = wy_ref[0]                            # (TK, 4) f32
    wx = wx_ref[0]

    iy = jax.lax.broadcasted_iota(jnp.int32, (tk, hp), 1)
    sy = jnp.zeros((tk, hp), jnp.float32)
    for d in range(4):
        sy = sy + wy[:, d:d + 1] * (iy == (y0 + (d - 1))).astype(jnp.float32)
    ix = jax.lax.broadcasted_iota(jnp.int32, (tk, w), 1)
    sx = jnp.zeros((tk, w), jnp.float32)
    for d in range(4):
        sx = sx + wx[:, d:d + 1] * (ix == (x0 + (d - 1))).astype(jnp.float32)

    w2 = (sy[:, :, None] * sx[:, None, :]).reshape(tk, hp * w)
    acc = jax.lax.dot_general(
        w2.astype(jnp.bfloat16), f_ref[0],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)   # (TK, c)

    if normalize:
        norm = jnp.sqrt(jnp.sum(acc * acc, axis=-1, keepdims=True))
        acc = acc / jnp.maximum(norm, 1e-12)
    out_ref[0] = acc


@functools.partial(jax.jit,
                   static_argnames=("tk", "w", "hp", "normalize",
                                    "interpret"))
def _bicubic_w2_call(y0, x0, wy, wx, f_flat, tk, w, hp, normalize,
                     interpret):
    b, k = y0.shape[:2]
    hw, c = f_flat.shape[1:]
    return pl.pallas_call(
        functools.partial(_bicubic_w2_kernel, w=w, c=c, hp=hp,
                          normalize=normalize),
        grid=(b, k // tk),
        in_specs=[
            pl.BlockSpec((1, tk, 1), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk, 1), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk, 4), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk, 4), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hw, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tk, c), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, k, c), jnp.float32),
        interpret=interpret,
    )(y0, x0, wy, wx, f_flat)


def sample_bicubic_w2(maps: jax.Array, pos: jax.Array,
                      ref_hw: Tuple[int, int],
                      normalize: bool = True,
                      interpret=None) -> jax.Array:
    """Bicubic sampling as ONE VMEM-resident MXU contraction per keypoint
    tile (see _bicubic_w2_kernel). Candidate replacement for
    `l2_normalize(sample_bicubic_matmul(...))`: the XLA matmul path is
    HBM-bound on its (B,K,w,c) intermediate (~2.7 GB -> ~6.5 ms at VGA
    b64, ~1% SoL), while this kernel's only HBM traffic is the inputs
    once and the (B,K,c) output. Roofline: ~161 GFLOP at VGA
    b64/K=4096 -> sub-2 ms at half-MXU utilization. Decided by on-chip
    A/B (apps/measure_select.py) per the only-in-context-measurements
    rule; numerically matches sample_bicubic up to bf16 rounding."""
    if not _HAS_PALLAS:
        raise RuntimeError("jax.experimental.pallas unavailable in this jax "
                           "build; use ops.sample.sample_bicubic_matmul")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, h, w, c = maps.shape
    k = pos.shape[1]
    assert c == 64, "kernel is specialized for 64-D descriptors"

    ix, iy = _source_coords(pos, ref_hw, (h, w))
    x0 = jnp.floor(ix).astype(jnp.int32)
    y0 = jnp.floor(iy).astype(jnp.int32)
    wx = jnp.stack(_cubic_weights(ix - x0), axis=-1)   # (B, K, 4)
    wy = jnp.stack(_cubic_weights(iy - y0), axis=-1)

    hp = h + (-h) % 8
    f = maps.astype(jnp.bfloat16)
    if hp != h:
        f = jnp.pad(f, ((0, 0), (0, hp - h), (0, 0), (0, 0)))
    f_flat = f.reshape(b, hp * w, c)

    # the (TK, hp*w) f32 weight matrix dominates scoped VMEM; shrink the
    # keypoint tile as the /8 map area grows
    area = hp * w
    tk = 256 if area <= 5120 else (128 if area <= 12800 else 64)
    kp = k + (-k) % tk
    if kp != k:
        pad = ((0, 0), (0, kp - k), (0, 0))
        y0 = jnp.pad(y0[..., None], ((0, 0), (0, kp - k), (0, 0)))
        x0 = jnp.pad(x0[..., None], ((0, 0), (0, kp - k), (0, 0)))
        wy = jnp.pad(wy, pad)
        wx = jnp.pad(wx, pad)
    else:
        y0 = y0[..., None]
        x0 = x0[..., None]

    out = _bicubic_w2_call(y0, x0, wy.astype(jnp.float32),
                           wx.astype(jnp.float32), f_flat, tk, w, hp,
                           normalize, interpret)
    return out[:, :k]
