"""Blockwise (flash-style) attention — Pallas TPU kernel for LighterGlue.

softmax(Q K^T / sqrt(d)) V computed with the online-softmax recurrence over
key tiles: the N x N attention matrix never touches HBM, so self/cross
attention over large keypoint sets (N >= 4k, where 24 attention ops x N^2
floats dominate the matcher's runtime) becomes matmul-bound.

Single-head kernel (LighterGlue is 1-head, 96-D); the wrapper pads the
feature dim to the 128-lane boundary (zero features don't perturb dot
products) and folds batch x heads into the grid. Key-side masking supported
(padded keypoints attend nowhere).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PALLAS = True
except ImportError:  # pragma: no cover
    _HAS_PALLAS = False

NEG = -1e9
TQ = 256   # query tile
TK = 512   # key tile


def _attn_kernel(scale_smem, q_ref, k_ref, v_ref, mask_ref, o_ref):
    """One (batch, query-tile) grid step; loops key tiles with online
    softmax. Block refs carry a leading singleton batch dim:
    q (1, TQ, D); k/v (1, N, D); mask (1, 1, N); out (1, TQ, D)."""
    _, tq, d = q_ref.shape
    n = k_ref.shape[1]
    scale = scale_smem[0, 0]
    q = q_ref[0] * scale

    def body(j, carry):
        m, l, acc = carry
        kt = k_ref[0, pl.ds(j * TK, TK), :]
        vt = v_ref[0, pl.ds(j * TK, TK), :]
        mt = mask_ref[0, 0, pl.ds(j * TK, TK)]
        s = jax.lax.dot_general(q, kt, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = jnp.where(mt[None, :] > 0, s, NEG)
        m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)
        corr = jnp.exp(m - m_new)
        l_new = l * corr + jnp.sum(p, axis=1, keepdims=True)
        pv = jax.lax.dot_general(p, vt, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        acc_new = acc * corr + pv
        return m_new, l_new, acc_new

    m0 = jnp.full((tq, 1), NEG, jnp.float32)
    l0 = jnp.zeros((tq, 1), jnp.float32)
    a0 = jnp.zeros((tq, d), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, n // TK, body, (m0, l0, a0))
    o_ref[0] = acc / jnp.maximum(l, 1e-30)


def _round_up(x, m):
    return (x + m - 1) // m * m


@functools.partial(jax.jit, static_argnames=("interpret",))
def _flash_call(q, k, v, mask, scale, interpret=False):
    b, nq, d = q.shape
    nk = k.shape[1]
    grid = (b, nq // TQ)
    # K and V live in VMEM as whole (nk, d) blocks: size the scoped-vmem
    # budget to the problem (the 16 MiB default fails to compile past
    # ~8k keys; v5e has 128 MiB VMEM). ~3x covers q/out/mask/softmax
    # accumulators and double buffering.
    per_buf = nk * d * 4
    vmem_cap = min(120, max(16, (3 * per_buf) // (1 << 20) + 8))
    return pl.pallas_call(
        _attn_kernel,
        grid=grid,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_cap * 1024 * 1024),
        in_specs=[
            pl.BlockSpec((1, 1), lambda bi, qi: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, TQ, d), lambda bi, qi: (bi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk, d), lambda bi, qi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk, d), lambda bi, qi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, nk), lambda bi, qi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TQ, d), lambda bi, qi: (bi, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, nq, d), jnp.float32),
        interpret=interpret,
    )(scale, q, k, v, mask)


def flash_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                    mask_k: Optional[jax.Array] = None,
                    scale: Optional[float] = None,
                    interpret: Optional[bool] = None) -> jax.Array:
    """softmax(q k^T * scale) v with key-side masking.

    q: (B, Nq, D); k, v: (B, Nk, D); mask_k: (B, Nk) bool.
    Default scale 1/sqrt(D). Pads Nq/Nk/D to tile boundaries internally."""
    if not _HAS_PALLAS:
        raise RuntimeError("jax.experimental.pallas unavailable in this jax "
                           "build; use attention_reference instead")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, nq, d = q.shape
    nk = k.shape[1]
    if scale is None:
        scale = 1.0 / math.sqrt(d)

    dp = _round_up(d, 128)
    nqp = _round_up(max(nq, TQ), TQ)
    nkp = _round_up(max(nk, TK), TK)

    def pad3(x, n_to, d_to):
        return jnp.pad(x.astype(jnp.float32),
                       ((0, 0), (0, n_to - x.shape[1]), (0, d_to - x.shape[2])))

    qp = pad3(q, nqp, dp)
    kp = pad3(k, nkp, dp)
    vp = pad3(v, nkp, dp)
    if mask_k is None:
        mask_k = jnp.ones((b, nk), bool)
    mp = jnp.pad(mask_k.astype(jnp.float32), ((0, 0), (0, nkp - nk)))[:, None]

    sc = jnp.full((1, 1), scale, jnp.float32)
    out = _flash_call(qp, kp, vp, mp, sc, interpret=interpret)
    return out[:, :nq, :d]


def attention_reference(q, k, v, mask_k=None, scale=None):
    """XLA dense attention (the LighterGlue default path) for comparison."""
    d = q.shape[-1]
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    s = jnp.einsum("bmd,bnd->bmn", q, k,
                   precision=jax.lax.Precision.HIGHEST) * scale
    if mask_k is not None:
        s = jnp.where(mask_k[:, None, :], s, NEG)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bmn,bnd->bmd", p, v,
                      precision=jax.lax.Precision.HIGHEST)
