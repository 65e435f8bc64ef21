"""VMEM-resident bicubic descriptor sampler — Pallas TPU.

`ops.sample.sample_bicubic_matmul` (the current default TPU path,
reference semantics xfeat.py:90 / interpolator.py:21-33) contracts
  rows = Sy (B,K,h) @ F (B,h,w,c)      -> (B,K,w,c)  <- HBM intermediate
  out  = Sx (B,K,w) . rows             -> (B,K,c)
and the (B,K,w,c) intermediate (4.3 GB bf16 at 1024x768 b64 K=4096) is
written to and re-read from HBM. This kernel performs the same
computation tile-by-tile with `rows` living only in VMEM:

  grid (batch, K/KT); per tile:
    rows = Sy_tile (KT,h) @ F2 (h, wp*c)     MXU, f32 accumulate
           [F2 = row-major view of (h,w,c), w zero-padded to a power of 2]
    Sxe[k, j] = sum_d wx[k,d] * (j//c == x0[k]+d-1)   lane iota, pure VPU
    out = fold_w(rows * Sxe)                 log2(wp) lane-halving adds

The x-weight expansion is elementwise (no gather, no one-hot matmul) and
the w-group sum is a log-step lane fold (layout j = w_idx*c + ch, so
adding lane-shifted halves sums over w at stride c; all slice offsets are
multiples of c). Zero-padded w-columns contribute rows == 0, so stray
Sxe matches in the pad region (possible when x0 == w-1) are harmless.

Numerics match sample_bicubic_matmul: bf16 inputs, f32 accumulation;
out-of-bounds taps get zero weight == grid_sample zeros padding.

MEASURED NEGATIVE RESULT (round 2, kept per DESIGN.md §10): correct
on-chip (max |Δ| vs matmul path 0.015, closer to the f32 reference than
the matmul path is) but SLOWER — 8.5 ms/batch at both VGA and 1024x768
b64 K=4096 vs 4.1 / 6.9 ms for `sample_bicubic_matmul`. The cost is the
Sxe construction: ~13 VPU passes over the full (KT, wp*c) lane domain
per tile, ~4.7 ms total, dwarfing the HBM saved. The fix would be
building Sxe on the 64x-smaller (KT, wp) domain and broadcasting across
c, but Mosaic (jax 0.9.0) rejects the required (KT, wp*c)->(KT, wp, c)
shape cast ("infer-vector-layout: unsupported shape cast") and has no
per-lane gather/dynamic-roll primitive. Revisit when Mosaic grows
either; until then the XLA matmul formulation stays the default.
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

from ..ops.sample import _cubic_weights, _source_coords


def _sampler_kernel(f2_ref, sy_ref, wx_ref, x0_ref, out_ref, *, c: int,
                    w_pad: int):
    KT = sy_ref.shape[1]
    # DEFAULT precision: operands are bf16 (native MXU input), accumulate
    # f32 — Mosaic rejects HIGHEST (fp32 contract) on bf16 vectors.
    rows = jax.lax.dot_general(
        sy_ref[0], f2_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)           # (KT, wp*c) f32

    j = jax.lax.broadcasted_iota(jnp.int32, (KT, w_pad * c), 1)
    wi = jax.lax.shift_right_logical(j, int(np.log2(c)))
    x0 = x0_ref[0]                                    # (KT, 1) int32
    sxe = jnp.zeros((KT, w_pad * c), jnp.float32)
    for d in range(4):
        wd = wx_ref[0, :, d:d + 1]                    # (KT, 1)
        sxe = sxe + jnp.where(wi == x0 + (d - 1), wd, 0.0)
    prod = rows * sxe

    half = w_pad // 2
    while half >= 1:
        prod = (jax.lax.slice_in_dim(prod, 0, half * c, axis=1)
                + jax.lax.slice_in_dim(prod, half * c, 2 * half * c, axis=1))
        half //= 2
    out_ref[0] = prod                                  # (KT, c)


@functools.partial(jax.jit,
                   static_argnames=("kt", "w_pad", "interpret"))
def _sampler_call(f2, sy, wx, x0, kt, w_pad, interpret=False):
    b, h, _ = f2.shape
    k = sy.shape[1]
    c = f2.shape[2] // w_pad
    grid = (b, k // kt)
    kernel = functools.partial(_sampler_kernel, c=c, w_pad=w_pad)
    return pl.pallas_call(
        kernel,
        grid=grid,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        in_specs=[
            pl.BlockSpec((1, h, w_pad * c), lambda i, t: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kt, h), lambda i, t: (i, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kt, 4), lambda i, t: (i, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kt, 1), lambda i, t: (i, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, kt, c), lambda i, t: (i, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, k, c), jnp.float32),
        interpret=interpret,
    )(f2, sy, wx, x0)


def sample_bicubic_mxu(maps: jax.Array, pos: jax.Array,
                       ref_hw: Tuple[int, int],
                       compute_dtype=jnp.bfloat16,
                       kt: int = 256,
                       interpret: Optional[bool] = None) -> jax.Array:
    """(B,h,w,C), (B,K,2) xy -> (B,K,C) f32. Same contract + numerics as
    `sample_bicubic_matmul` but with the (K,w,C) row intermediate held in
    VMEM tile-by-tile instead of materialized in HBM. Requires C a power
    of two (descriptors: 64)."""
    if not _HAS_PALLAS:
        raise RuntimeError("jax.experimental.pallas unavailable in this jax "
                           "build; use ops.sample.sample_bicubic_matmul")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, h, w, c = maps.shape
    k = pos.shape[1]
    assert c & (c - 1) == 0, f"channel count {c} must be a power of 2"
    ix, iy = _source_coords(pos, ref_hw, (h, w))
    x0 = jnp.floor(ix).astype(jnp.int32)
    y0 = jnp.floor(iy).astype(jnp.int32)
    wx = jnp.stack(_cubic_weights(ix - x0), axis=-1).astype(jnp.float32)
    wy = jnp.stack(_cubic_weights(iy - y0), axis=-1)

    # y-side one-hot-weighted matrix (same construction as the matmul
    # sampler); OOB rows get zero weight == zeros padding.
    yy = jax.lax.broadcasted_iota(jnp.int32, (1, 1, h), 2)
    sy = jnp.zeros((b, k, h), compute_dtype)
    for d in range(4):
        sy = sy + (wy[..., d, None] *
                   (yy == (y0 + d - 1)[..., None])).astype(compute_dtype)

    w_pad = 1 << int(np.ceil(np.log2(max(w, 2))))
    fm = maps.astype(compute_dtype)
    if w_pad > w:
        fm = jnp.pad(fm, ((0, 0), (0, 0), (0, w_pad - w), (0, 0)))
    f2 = fm.reshape(b, h, w_pad * c)                  # free view

    kt = min(kt, k)
    k_pad = -(-k // kt) * kt
    if k_pad > k:
        sy = jnp.pad(sy, ((0, 0), (0, k_pad - k), (0, 0)))
        wx = jnp.pad(wx, ((0, 0), (0, k_pad - k), (0, 0)))
        x0 = jnp.pad(x0, ((0, 0), (0, k_pad - k)))
    out = _sampler_call(f2, sy, wx, x0[..., None], kt, w_pad,
                        interpret=interpret)
    return out[:, :k]
