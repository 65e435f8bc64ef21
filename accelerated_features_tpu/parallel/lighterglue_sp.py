"""Sequence-parallel LighterGlue: keypoint-sharded attention matching.

Scales the attention matcher past one chip for large keypoint sets
(N >= 16k, e.g. dense SfM track building): both sets' keypoint axes shard
over the mesh's `model` axis; every pointwise op (projections, FFN,
rotary) stays local, and the only ICI traffic per layer is the all-gather
of the 96-D keys/values — O(N * D) floats, never an N x N score matrix
(the same O(N) pattern as parallel.matching.mnn_match_sp; SURVEY §5
long-context, VERDICT r1 #10).

The assignment head is computed as local (M/d, N) slabs: the row softmax
is local (full rows), the column softmax reduces over the device axis
with a gathered max/log-sum-exp, and the mutual-argmax combine follows
mnn_match_sp's first-maximal-device tie-breaking. The full (M+1, N+1)
log-assignment matrix is intentionally never materialized — the SP entry
point returns matches + confidences only.

Numerics match models.lighterglue.lighterglue_forward up to float
reduction order (exact-parity test on the virtual CPU mesh).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..models.lighterglue import (NEG, _apply, _ffn, apply_rotary,
                                  normalize_keypoints, rotary_encoding)


def _attend(q, k, v, mask_k, heads: int):
    """Dense SDPA (B, M_loc, D) x (B, N, D); the slab is already small
    enough per device — flash is unnecessary and interp-unfriendly here."""
    b, m, d = q.shape
    hd = d // heads

    def split(x):
        return x.reshape(b, -1, heads, hd).transpose(0, 2, 1, 3)

    qh, kh, vh = split(q), split(k), split(v)
    scores = jnp.einsum("bhmd,bhnd->bhmn", qh, kh,
                        precision=jax.lax.Precision.HIGHEST) / math.sqrt(hd)
    scores = jnp.where(mask_k[:, None, None, :], scores, NEG)
    attn = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhmn,bhnd->bhmd", attn, vh,
                     precision=jax.lax.Precision.HIGHEST)
    return out.transpose(0, 2, 1, 3).reshape(b, m, d)


def lighterglue_forward_sp(mesh: Mesh, params, kpts0, kpts1, descs0, descs1,
                           size0, size1,
                           mask0: Optional[jax.Array] = None,
                           mask1: Optional[jax.Array] = None,
                           heads: int = 1, axis: str = "model",
                           filter_threshold: float = 0.0
                           ) -> Tuple[jax.Array, jax.Array]:
    """Keypoint-sharded LighterGlue forward.

    kpts0 (B, M, 2), kpts1 (B, N, 2), descs (B, ., 64); M and N must be
    divisible by the `axis` size. Returns replicated
    (matches0 (B, M) int32 with -1 for unmatched, mscores0 (B, M)) —
    the same contract as lighterglue_forward's matches0/mscores0 plus the
    confidence gate.
    """
    b, m, _ = kpts0.shape
    n = kpts1.shape[1]
    ndev = mesh.shape[axis]
    assert m % ndev == 0 and n % ndev == 0, (m, n, ndev)
    if mask0 is None:
        mask0 = jnp.ones((b, m), bool)
    if mask1 is None:
        mask1 = jnp.ones((b, n), bool)

    def local(params, k0, k1, d0, d1, s0, s1, v0, v1):
        my = jax.lax.axis_index(axis)
        m_loc = k0.shape[1]

        def gather(x):
            return jax.lax.all_gather(x, axis, axis=1, tiled=True)

        v0_g, v1_g = gather(v0), gather(v1)

        x0 = _apply(params["input_proj"], d0.astype(jnp.float32))
        x1 = _apply(params["input_proj"], d1.astype(jnp.float32))
        cos0, sin0 = rotary_encoding(
            normalize_keypoints(k0.astype(jnp.float32), s0),
            params["posenc_wr"])
        cos1, sin1 = rotary_encoding(
            normalize_keypoints(k1.astype(jnp.float32), s1),
            params["posenc_wr"])

        def self_block(p, x, cos, sin, vmask_g):
            qkv = _apply(p["qkv"], x)
            q, k, v = jnp.split(qkv, 3, axis=-1)
            q = apply_rotary(q, cos, sin)
            k = apply_rotary(k, cos, sin)
            ctx = _attend(q, gather(k), gather(v), vmask_g, heads)
            return _ffn(p, x, _apply(p["out"], ctx))

        def cross_block(p, x0, x1, vmask0_g, vmask1_g):
            qk0 = _apply(p["to_qk"], x0)
            qk1 = _apply(p["to_qk"], x1)
            vv0 = _apply(p["to_v"], x0)
            vv1 = _apply(p["to_v"], x1)
            msg0 = _attend(qk0, gather(qk1), gather(vv1), vmask1_g, heads)
            msg1 = _attend(qk1, gather(qk0), gather(vv0), vmask0_g, heads)
            return (_ffn(p, x0, _apply(p["to_out"], msg0)),
                    _ffn(p, x1, _apply(p["to_out"], msg1)))

        for layer in params["layers"]:
            x0 = self_block(layer["self"], x0, cos0, sin0, v0_g)
            x1 = self_block(layer["self"], x1, cos1, sin1, v1_g)
            x0, x1 = cross_block(layer["cross"], x0, x1, v0_g, v1_g)

        # assignment head on local (m_loc, N) slabs
        asg = params["assignments"][-1]
        dim = x0.shape[-1]
        md0 = _apply(asg["final_proj"], x0) / dim ** 0.25      # (B, m_loc, D)
        md1 = _apply(asg["final_proj"], x1) / dim ** 0.25
        md1_g = gather(md1)                                     # (B, N, D)
        sim = jnp.einsum("bmd,bnd->bmn", md0, md1_g,
                         precision=jax.lax.Precision.HIGHEST)
        sim = jnp.where(v1_g[:, None, :], sim, NEG)
        sim = jnp.where(v0[:, :, None], sim, NEG)

        z0 = _apply(asg["matchability"], x0)[..., 0]            # (B, m_loc)
        z1_g = gather(_apply(asg["matchability"], x1)[..., 0])  # (B, N)

        scores0 = jax.nn.log_softmax(sim, axis=2)               # rows local
        # column softmax spans the device axis: gathered max + LSE
        loc_max = jnp.max(sim, axis=1)                          # (B, N)
        gmax = jax.lax.pmax(loc_max, axis)
        loc_sum = jnp.sum(jnp.exp(sim - gmax[:, None, :]), axis=1)
        lse = jnp.log(jax.lax.psum(loc_sum, axis)) + gmax
        scores1 = sim - lse[:, None, :]
        inner = (scores0 + scores1 +
                 jax.nn.log_sigmoid(z0)[:, :, None] +
                 jax.nn.log_sigmoid(z1_g)[:, None, :])          # (B,m_loc,N)

        # mutual argmax; row side local (full rows), column side combined
        # over devices with first-maximal-device tie-breaking
        m0 = jnp.argmax(inner, axis=2).astype(jnp.int32)        # (B, m_loc)
        best0 = jnp.max(inner, axis=2)
        col_max = jnp.max(inner, axis=1)                        # (B, N)
        col_arg = (jnp.argmax(inner, axis=1).astype(jnp.int32)
                   + my * m_loc)
        all_max = jax.lax.all_gather(col_max, axis)             # (dev, B, N)
        all_arg = jax.lax.all_gather(col_arg, axis)
        best_dev = jnp.argmax(all_max, axis=0)
        m1 = jnp.take_along_axis(all_arg, best_dev[None], axis=0)[0]

        rows = my * m_loc + jnp.arange(m_loc, dtype=jnp.int32)[None]
        mutual = jnp.take_along_axis(m1, m0, axis=1) == rows
        mscores = jnp.where(mutual, jnp.exp(best0), 0.0)
        ok = mutual & v0
        if filter_threshold > 0.0:
            ok = ok & (mscores >= filter_threshold)
        matches0 = jnp.where(ok, m0, -1)
        mscores = jnp.where(ok, mscores, 0.0)
        return (jax.lax.all_gather(matches0, axis, axis=1, tiled=True),
                jax.lax.all_gather(mscores, axis, axis=1, tiled=True))

    specs = (P(), P(None, axis), P(None, axis), P(None, axis), P(None, axis),
             P(), P(), P(None, axis), P(None, axis))
    try:
        smap = jax.shard_map(local, mesh=mesh, in_specs=specs,
                             out_specs=(P(), P()), check_vma=False)
    except TypeError:
        smap = jax.shard_map(local, mesh=mesh, in_specs=specs,
                             out_specs=(P(), P()), check_rep=False)
    return jax.jit(smap)(params, kpts0, kpts1, descs0, descs1,
                         size0, size1, mask0, mask1)
