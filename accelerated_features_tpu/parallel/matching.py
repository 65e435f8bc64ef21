"""Mesh-parallel matching and extraction.

Two scaling paths (SURVEY §2.3 / §5 long-context equivalents):

  * `sharded_detect_and_compute` — data parallelism: the image batch splits
    over the 'data' axis; each device runs the full extraction pipeline on
    its shard (the reference's batched inference, xfeat.py:50, scaled past
    one chip).

  * `mnn_match_sp` — sequence parallelism for the keypoint axis: when the
    N x M similarity matrix exceeds one chip's HBM (e.g. 100k x 100k dense
    matching for SfM track building), the *target* keypoint set is sharded
    over devices; each device computes its N x (M/d) slab's row-wise
    (max, argmax), and a psum-style tree combine resolves the global row
    argmax while the column argmax stays local. Only O(N) floats cross the
    ICI per direction — never the similarity matrix.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.extraction import detect_and_compute
from ..ops.matching import NEG, similarity


def sharded_detect_and_compute(mesh: Mesh, params, images: jax.Array,
                               top_k: int = 4096,
                               detection_threshold: float = 0.05,
                               compute_dtype=jnp.float32,
                               axis: str = "data") -> Dict[str, jax.Array]:
    """Batch-sharded sparse extraction: jit with explicit shardings; XLA
    runs each device's shard independently (no collectives needed)."""
    fn = jax.jit(
        functools.partial(detect_and_compute, top_k=top_k,
                          detection_threshold=detection_threshold,
                          compute_dtype=compute_dtype),
        in_shardings=(NamedSharding(mesh, P()),
                      NamedSharding(mesh, P(axis))),
        out_shardings=NamedSharding(mesh, P(axis)),
    )
    return fn(params, images)


def mnn_match_sp(mesh: Mesh, d1: jax.Array, d2: jax.Array,
                 valid1: Optional[jax.Array] = None,
                 valid2: Optional[jax.Array] = None,
                 min_cossim: float = -1.0,
                 axis: str = "model") -> Tuple[jax.Array, jax.Array]:
    """Keypoint-set (sequence) parallel MNN.

    d1 (K1, C) replicated; d2 (K2, C) sharded over `axis` (K2 divisible by
    the axis size). Returns (idx1 (K1,), mask (K1,)) replicated — identical
    to ops.matching.mnn_match up to float reduction order, but NOTE the
    different `min_cossim` default: -1.0 (the reference's pipeline
    default) instead of mnn_match's bare-`match` 0.82; pass it explicitly
    when swapping call sites."""
    ndev = mesh.shape[axis]
    k1 = d1.shape[0]
    k2 = d2.shape[0]
    assert k2 % ndev == 0, f"K2={k2} not divisible by {ndev}"
    shard = k2 // ndev

    if valid1 is None:
        valid1 = jnp.ones((k1,), bool)
    if valid2 is None:
        valid2 = jnp.ones((k2,), bool)

    def local(d1_r, d2_s, v1_r, v2_s):
        # local slab: (K1, shard)
        sim = similarity(d1_r, d2_s)
        sim = jnp.where(v2_s[None, :], sim, NEG)
        simT = jnp.where(v1_r[None, :], sim.T, NEG)

        my = jax.lax.axis_index(axis)
        # row side: local best among my columns
        loc_max = jnp.max(sim, axis=1)                       # (K1,)
        loc_arg = jnp.argmax(sim, axis=1).astype(jnp.int32) + my * shard
        # global row argmax: argmax over the device axis picks the FIRST
        # maximal device (device order == column order), preserving torch's
        # first-index tie-breaking
        all_max = jax.lax.all_gather(loc_max, axis)          # (ndev, K1)
        all_arg = jax.lax.all_gather(loc_arg, axis)
        best_dev = jnp.argmax(all_max, axis=0)
        gmax = jnp.take_along_axis(all_max, best_dev[None], axis=0)[0]
        garg = jnp.take_along_axis(all_arg, best_dev[None], axis=0)[0]

        # column side: match21 for my shard is fully local
        m21_local = jnp.argmax(simT, axis=1).astype(jnp.int32)  # (shard,)
        m21_all = jax.lax.all_gather(m21_local, axis,
                                     tiled=True)             # (K2,)

        idx = jnp.arange(k1, dtype=jnp.int32)
        mutual = jnp.take(m21_all, garg) == idx
        mask = mutual & v1_r
        if min_cossim > 0:
            mask = mask & (gmax > min_cossim)
        return garg, mask

    # check_vma off: outputs are replicated over the unused mesh axes by
    # construction (inputs replicated there), which the static replication
    # checker cannot infer
    try:
        smap = jax.shard_map(local, mesh=mesh,
                             in_specs=(P(), P(axis), P(), P(axis)),
                             out_specs=(P(), P()), check_vma=False)
    except TypeError:
        smap = jax.shard_map(local, mesh=mesh,
                             in_specs=(P(), P(axis), P(), P(axis)),
                             out_specs=(P(), P()), check_rep=False)
    fn = jax.jit(smap)
    return fn(d1, d2, valid1, valid2)
