"""Halo-grouped convolution — MXU lane packing for low-channel convs.

The XFeat stem (reference model.py:40-50) runs 3x3 convs with 1-24 channels
at full/half resolution. A direct conv maps to an MXU matmul with
K = 9*C_in (<= 216) and N = C_out (<= 24): at C_in=1, C_out=4 the systolic
array runs at ~0.2% utilization, and the stem dominates backbone time
(measured 9.2 ms of a 28.6 ms VGA b64 extraction).

Fix attempt: evaluate G consecutive output columns per matmul row ("halo"
grouping). The im2col patch widens from 3 to G+2 columns (stride 1) /
2G+1 (stride 2) and the weight matrix becomes a banded (3*win*C_in,
G*C_out) block-Toeplitz expansion of the 3x3 kernel, pushing K and N
toward 128 at a (G+2)/3-fold FLOP overhead.

MEASURED RESULT (TPU v5e, VGA b64 bf16): parity holds and the op wins or
ties layer-by-layer in isolation, but routing the stem through it in the
full backbone costs +46 ms/batch (2585 -> 734 FPS) — the strided
slice+stack im2col breaks XLA's stem fusion and round-trips HBM. Kept as
a parity-tested op and a documented negative result; NOT used by the
default forward path (models/backbone.py uses plain conv2d everywhere).

Numerics: identical contraction as the direct conv (zero padding included)
up to float reduction order; the extra band entries multiply structural
zeros. Parity-tested against `conv2d` at f32/bf16.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _pick_group(w_out: int, c_in: int, c_out: int, stride: int) -> int:
    """Largest group with N = G*C_out <= 128 and K = 3*win*C_in <= 512
    that divides the output width."""
    best = 1
    for g in range(1, 129):
        if w_out % g or g * c_out > 128:
            continue
        win = g + 2 if stride == 1 else 2 * g + 1
        if 3 * win * c_in > 512:
            continue
        best = g
    return best


def conv2d_halo(x: jax.Array, w: jax.Array, b: Optional[jax.Array] = None,
                stride: int = 1, group: Optional[int] = None,
                precision=jax.lax.Precision.HIGHEST) -> jax.Array:
    """NHWC 3x3 conv, torch 'same' padding (pad=1), stride 1 or 2, computed
    as a single grouped-halo matmul. Drop-in for `conv2d` on 3x3 kernels.

    x: (B, H, W, C_in); w: (3, 3, C_in, C_out); H, W divisible by stride;
    the group must divide W//stride (auto-picked otherwise)."""
    B, H, W, C = x.shape
    kh, kw, _, Cout = w.shape
    assert kh == 3 and kw == 3, "halo conv supports 3x3 kernels"
    Ho, Wo = H // stride, W // stride
    g = group or _pick_group(Wo, C, Cout, stride)
    if g <= 1:
        from ..models.backbone import conv2d
        return conv2d(x, w, b, stride)
    win = g + 2 if stride == 1 else 2 * g + 1
    colstride = g * stride

    w = w.astype(x.dtype)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))

    parts = []
    for dy in range(3):
        row = jax.lax.slice_in_dim(xp, dy, dy + stride * (Ho - 1) + 1,
                                   stride, axis=1)
        for dx in range(win):
            parts.append(jax.lax.slice_in_dim(
                row, dx, dx + colstride * (Wo // g - 1) + 1, colstride,
                axis=2))
    patches = jnp.stack(parts, axis=-2)              # (B,Ho,Wo/g,3*win,C)
    patches = patches.reshape(B, Ho, Wo // g, 3 * win * C)

    wmat = jnp.zeros((3, win, C, g, Cout), x.dtype)
    for gx in range(g):
        off = gx if stride == 1 else 2 * gx
        wmat = wmat.at[:, off:off + 3, :, gx, :].set(w)
    wmat = wmat.reshape(3 * win * C, g * Cout)

    out = jax.lax.dot_general(patches, wmat, (((3,), (0,)), ((), ())),
                              precision=precision)
    out = out.reshape(B, Ho, Wo, Cout)
    if b is not None:
        out = out + b.astype(out.dtype)
    return out
