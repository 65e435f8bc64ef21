"""Fused XFeat stem (block1 + skip) — Pallas TPU, MXU halo-im2col.

Computes, in ONE VMEM-resident kernel per image, the whole stem region
between input normalization and block2 (reference model.py:40-50,139-141;
our XLA path models/backbone.py:173-177):

    c1 = relu(conv3x3_s1(x, W1) + b1)          # 1 -> 4
    c2 = relu(conv3x3_s2(c1, W2) + b2)         # 4 -> 8   (/2)
    c3 = relu(conv3x3_s1(c2, W3) + b3)         # 8 -> 8
    c4 = relu(conv3x3_s2(c3, W4) + b4)         # 8 -> 24  (/4)
    out = c4 + (avgpool4x4(x) @ Wskip + bskip) # block2 input

Why a kernel: these convs have 1-24 channels, so the direct XLA lowering
runs MXU matmuls with K = 9*C_in <= 72 and N = C_out <= 24 — under 4%
systolic-array utilization — and the stem measures ~1.85 ms / 4.7 ms per
b64 batch (VGA / 1024x768) at ~48% of its HBM speed-of-light (STATUS.md
round-2 tables). Two XLA-level rewrites (column-grouped halo conv,
shifted-add conv1) were measured SLOWER because any graph-level rewrite
breaks XLA's surrounding stem fusion (docs/DESIGN.md section 10). This
kernel fuses the WHOLE region instead, so there is no XLA fusion to
break: HBM traffic is one read of the gray image + one write of the
(H/4, W/4, 24) output.

MXU packing ("halo grouping", per-conv):
  * activations live in VMEM as 2D (rows, W*C) with lane index w*C + c;
  * each matmul row evaluates G consecutive output columns, and the
    contraction is split into THREE dots — one per kernel row dy — so no
    lane-dim concatenation of row-shifted windows is needed (Mosaic
    rejects tpu.concatenate whose operands disagree in sublane offset,
    and strided vector slices outright; both were hit on hardware);
  * group lane strides are chosen so every window slice starts at a lane
    offset ≡ 0 (mod 128): G1=128 (conv1, ci=1), G2=G3=16 (4- and 8-ch,
    /2 grid), G4=8 (8-ch stride 2), GS=32 (skip, pooled rows). conv1 and
    the skip pad the trailing group with zero lanes when 128 ∤ W and
    slice the garbage columns off after reassembly;
  * stride-2 row access uses an even/odd major-dim reshape split
    ((2h+2, L) -> (h+1, 2, L)) instead of stride-2 slices;
  * weights are per-kernel-row banded block-Toeplitz expansions of the
    3x3 kernels (built with scatter-at once per trace; the extra band
    entries multiply structural zeros, so numerics match the direct
    conv up to float reduction order);
  * the avg-pool skip is a second small matmul (K = 128 lanes of the
    row-pooled input) added AFTER conv4's ReLU, matching the reference
    dataflow exactly.

Estimated MXU cost at VGA b64: ~8k cycles/image (~0.55 ms/batch) vs the
~0.9 ms/batch HBM roofline of the unfused stage chain — i.e. the kernel
is compute-bound but ~2-3x under the current measured stem time.

Inference-only (requires BatchNorm folded into per-conv biases, like the
fused detect path). Any /32-divisible H, W. Output bit-identity with the
XLA stem is NOT expected (different contraction grouping); parity is
tested to tight f32 / loose bf16 tolerances in tests/test_stem_fused.py.

ROUTING: wired into models/backbone.py behind
`xfeat_forward(..., fused_stem=True)` / the XFEAT_FUSED_STEM env var
(resolved at jit-construction in api.XFeat), DEFAULT OFF — measured
on-chip in round 3 and the result is NEGATIVE: once compiled the
kernel runs 6.1x SLOWER than the XLA stem (5.14 vs 0.836 ms/batch at
256x512 b64 bf16), and Mosaic compile time grows ~quadratically with
width (320 s at 256x512; 640x480 never finished in 25 min). Kept as a
tested negative result; do not route. Full post-mortem in
docs/DESIGN.md section 10a.
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu  # noqa: F401
    _HAS_PALLAS = True
except ImportError:  # pragma: no cover
    _HAS_PALLAS = False

# Output columns evaluated per matmul row, per conv, chosen so every
# window slice starts at lane offset 0 (mod 128). conv2-4 divide every
# /32-divisible width exactly; conv1 and the skip pad the tail group.
_G1, _G2, _G3, _G4, _GS = 128, 16, 16, 8, 32


def _banded(w: jax.Array, g: int, stride: int, dtype) -> jax.Array:
    """Per-kernel-row block-Toeplitz expansion of a (3, 3, ci, co) kernel
    for the halo matmul, shape (3, win*ci, g*co): band dy, row k = j*ci+c
    reads window column j, channel c of input row (r*stride + dy); column
    n = u*co_n + co evaluates output position u in the group. Entry =
    w[dy, j - stride*u, c, co] when the offset is a valid tap. Built with
    one scatter; index tables are numpy constants so this folds into a
    few cheap device ops per trace."""
    ci, co = int(w.shape[2]), int(w.shape[3])
    win = g + 2 if stride == 1 else 2 * g + 1
    K, N = win * ci, g * co
    dy, u, cc, oo = np.meshgrid(np.arange(3), np.arange(g), np.arange(ci),
                                np.arange(co), indexing="ij")
    bands, rows, cols, wi = [], [], [], []
    for dx in range(3):
        j = stride * u + dx
        bands.append(dy)
        rows.append(j * ci + cc)
        cols.append(u * co + oo)
        wi.append((np.full_like(dy, dx), dy, cc, oo))
    bands = np.concatenate([b.ravel() for b in bands])
    rows = np.concatenate([r.ravel() for r in rows])
    cols = np.concatenate([c.ravel() for c in cols])
    dxs = np.concatenate([w_[0].ravel() for w_ in wi])
    dys = np.concatenate([w_[1].ravel() for w_ in wi])
    cis = np.concatenate([w_[2].ravel() for w_ in wi])
    cos = np.concatenate([w_[3].ravel() for w_ in wi])
    vals = w[dys, dxs, cis, cos]
    out = jnp.zeros((3, K, N), jnp.float32)
    return out.at[bands, rows, cols].set(vals).astype(dtype)


def _skip_mat(w: jax.Array, dtype) -> jax.Array:
    """(1x1 conv after 4x4 avgpool) as a (128 -> GS*24) matmul over 4*GS
    columns of the row-pooled input: lane cc covers pooled output
    u = cc // 4 with weight w[co] / 16 (col pooling folded in)."""
    co = int(w.shape[3])
    cc = np.arange(4 * _GS)
    u = cc // 4
    rows = np.repeat(cc, co)
    cols = (np.repeat(u, co) * co + np.tile(np.arange(co), 4 * _GS))
    vals = jnp.tile(w[0, 0, 0, :] / 16.0, 4 * _GS)
    out = jnp.zeros((4 * _GS, _GS * co), jnp.float32)
    return out.at[rows, cols].set(vals).astype(dtype)


def _stem_kernel(x_ref, wb1, wb2, wb3, wb4, wsk, bv_ref, out_ref,
                 *, H: int, W: int):
    x = x_ref[0]                                   # (H, W) gray, normalized
    dt = x.dtype
    f32 = jnp.float32

    def dot(a, b):
        return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                   preferred_element_type=f32)

    def conv(xp, wb, bias_row, ng, win, ci, co, wout, hout, stride):
        """One halo-grouped conv as three MXU matmuls (one per kernel
        row).

        xp: input padded by 1 row top/bottom and laid out so group gi's
        window starts at lane 128*gi (offset 0 mod 128 — required for
        the group row-concatenation to share a Mosaic layout). For each
        kernel row dy the im2col operand A_dy row-concatenates the ng
        window slices, row-shifted (stride 1) or even/odd-split via a
        major-dim reshape (stride 2; Mosaic rejects strided vector
        slices). Accumulate the three dots, bias, ReLU, reassemble
        groups along lanes. Returns (hout, wout * co_lanes)."""
        lanes_w = win * ci
        rows_a = [[] for _ in range(3)]
        for gi in range(ng):
            base = 128 * gi
            ws = jax.lax.slice(xp, (0, base), (xp.shape[0],
                                               base + lanes_w))
            if stride == 1:
                for d in range(3):
                    rows_a[d].append(ws[d:d + hout])
            else:
                r = ws[:2 * hout + 2].reshape(hout + 1, 2, lanes_w)
                even, odd = r[:, 0, :], r[:, 1, :]
                rows_a[0].append(even[:hout])
                rows_a[1].append(odd[:hout])
                rows_a[2].append(even[1:hout + 1])
        acc = None
        for d in range(3):
            Ad = (jnp.concatenate(rows_a[d], axis=0) if ng > 1
                  else rows_a[d][0])                # (ng*hout, lanes_w)
            o = dot(Ad.astype(dt), wb[d].astype(dt))
            acc = o if acc is None else acc + o
        O = jnp.maximum(acc + bias_row, 0.0).astype(dt)
        full = jnp.concatenate(
            [O[gi * hout:(gi + 1) * hout] for gi in range(ng)],
            axis=1) if ng > 1 else O                # (hout, ng*g*co)
        return full[:, :wout * co]

    bv = bv_ref[:]                                  # (5, 768) f32 bias rows

    # conv1: 1 -> 4, stride 1, groups of 128 output cols (window 130),
    # tail group zero-padded when 128 does not divide W
    ng1 = -(-W // _G1)
    xp = jnp.pad(x, ((1, 1), (1, 1 + ng1 * 128 - W)))
    x1 = conv(xp, wb1, bv[0, :_G1 * 4], ng1, _G1 + 2, 1, 4, W, H,
              stride=1)                             # (H, 4W)

    # conv2: 4 -> 8, stride 2, groups of 16 output cols (window 33)
    x1p = jnp.pad(x1, ((1, 1), (4, 4)))
    x2 = conv(x1p, wb2, bv[1, :_G2 * 8], (W // 2) // _G2, 33, 4, 8,
              W // 2, H // 2, stride=2)             # (H/2, 8*(W/2))

    # conv3: 8 -> 8, stride 1, groups of 16 (window 18)
    x2p = jnp.pad(x2, ((1, 1), (8, 8)))
    x3 = conv(x2p, wb3, bv[2, :_G3 * 8], (W // 2) // _G3, 18, 8, 8,
              W // 2, H // 2, stride=1)

    # conv4: 8 -> 24, stride 2, groups of 8 (window 17)
    x3p = jnp.pad(x3, ((1, 1), (8, 8)))
    x4 = conv(x3p, wb4, bv[3, :_G4 * 24], (W // 4) // _G4, 17, 8,
              24, W // 4, H // 4, stride=2)         # (H/4, 24*(W/4))

    # skip: rows pooled via a major-dim reshape sum, column pooling
    # folded into wsk; groups of 32 pooled output cols = 128 input lanes
    H4, W4 = H // 4, W // 4
    xr = x.reshape(H4, 4, W).sum(axis=1)            # (H/4, W)
    ngs = -(-W4 // _GS)
    xrp = jnp.pad(xr, ((0, 0), (0, ngs * 128 - W)))
    As = jnp.concatenate(
        [jax.lax.slice(xrp, (0, 128 * gi), (H4, 128 * gi + 128))
         for gi in range(ngs)], axis=0) if ngs > 1 else xrp  # (ngs*H4,128)
    Os = dot(As.astype(dt), wsk[:].astype(dt)) + bv[4]
    skip = (jnp.concatenate(
        [Os[gi * H4:(gi + 1) * H4] for gi in range(ngs)], axis=1)
        if ngs > 1 else Os)[:, :W4 * 24]            # (H/4, 24*(W/4))

    out_ref[0] = (x4.astype(f32) + skip).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _stem_call(xg, wb1, wb2, wb3, wb4, wsk, bv, interpret=False):
    b, H, W = xg.shape
    H4, W4 = H // 4, W // 4
    # Working set: im2col operands + activations, ~44 bytes per input
    # pixel at bf16 — and ~2x that for a float32 compute dtype (the
    # xfeat_forward default). Cap scales with image size AND dtype.
    bpp = 44 * (xg.dtype.itemsize / 2)
    vmem_cap = min(120, max(24, int(bpp * H * W) // (1024 * 1024) + 8))
    kern = functools.partial(_stem_kernel, H=H, W=W)
    return pl.pallas_call(
        kern,
        grid=(b,),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_cap * 1024 * 1024),
        in_specs=[
            pl.BlockSpec((1, H, W), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(wb1.shape, lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(wb2.shape, lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(wb3.shape, lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(wb4.shape, lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(wsk.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(bv.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H4, W4 * 24), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, H4, W4 * 24), xg.dtype),
        interpret=interpret,
    )(xg, wb1, wb2, wb3, wb4, wsk, bv)


def stem_fused(params: Dict[str, Any], xg: jax.Array,
               interpret=None) -> jax.Array:
    """Fused block1 + skip on normalized gray input.

    Args:
      params: folded-BN parameter pytree (models/params.fold_batchnorm);
        uses params['block1'][0..3]['w'/'b'] and params['skip1'].
      xg: (B, H, W, 1) input_norm output; H, W divisible by 32.

    Returns: (B, H/4, W/4, 24) block2 input, == XLA stem within float
    reassociation tolerance. Raises if BN is not folded.
    """
    if not _HAS_PALLAS:  # pragma: no cover
        raise RuntimeError("pallas unavailable")
    b1 = params["block1"]
    if any("b" not in p for p in b1):
        raise ValueError("stem_fused requires folded BatchNorm params "
                         "(models/params.fold_batchnorm)")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, H, W, _ = xg.shape
    if H % 32 or W % 32:
        raise ValueError(f"H, W must be /32-divisible, got {(H, W)}")
    dt = xg.dtype
    wb1 = _banded(b1[0]["w"], _G1, 1, dt)
    wb2 = _banded(b1[1]["w"], _G2, 2, dt)
    wb3 = _banded(b1[2]["w"], _G3, 1, dt)
    wb4 = _banded(b1[3]["w"], _G4, 2, dt)
    wsk = _skip_mat(params["skip1"]["w"], dt)
    BW = _GS * 24                                   # widest bias row (768)
    bv = jnp.stack([
        jnp.pad(jnp.tile(b1[0]["b"], _G1), (0, BW - _G1 * 4)),
        jnp.pad(jnp.tile(b1[1]["b"], _G2), (0, BW - _G2 * 8)),
        jnp.pad(jnp.tile(b1[2]["b"], _G3), (0, BW - _G3 * 8)),
        jnp.pad(jnp.tile(b1[3]["b"], _G4), (0, BW - _G4 * 24)),
        jnp.tile(params["skip1"]["b"], _GS),
    ]).astype(jnp.float32)                          # (5, 768)
    out = _stem_call(xg[..., 0], wb1, wb2, wb3, wb4, wsk, bv,
                     interpret=interpret)
    return out.reshape(B, H // 4, W // 4, 24)


def stem_reference(params: Dict[str, Any], xg: jax.Array) -> jax.Array:
    """XLA stem (models/backbone.py:173-177) for parity tests: block1 on
    the normalized gray input plus the avgpool4 + 1x1 skip."""
    from ..models.backbone import _block, conv2d
    x1 = _block(params["block1"], xg, "block1", False, None)
    skip = jax.lax.reduce_window(
        xg, 0.0, jax.lax.add, (1, 4, 4, 1), (1, 4, 4, 1), "VALID") / 16.0
    skip = conv2d(skip, params["skip1"]["w"], params["skip1"]["b"])
    return x1 + skip
