"""Descriptor matching kernels — fixed-shape, masked, batched.

Replaces the reference's dynamic-shape matchers (xfeat.py:265-348):
  * `mnn_match`       == XFeat.match (xfeat.py:327-348): mutual nearest
                         neighbour w/ optional cosine-sim gate.
  * `batch_mnn_match` == XFeat.batch_match (xfeat.py:265-290), vmapped
                         instead of a Python loop over the batch.

Contract: descriptor rows may be padding; `valid` masks mark real rows. The
returned `idx1` gives, for every slot i of set 1, its candidate in set 2; the
returned mask selects mutual (and gated) matches among valid rows. Downstream
consumers stay fixed-shape; host-side compaction happens only at the API edge.

The similarity matmul runs in float32 on the MXU (preferred_element_type) —
for K=4096/8000 descriptors this is the hot op and tiles perfectly (K x 64
by 64 x K).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

NEG = -1e9


def similarity(d1: jax.Array, d2: jax.Array) -> jax.Array:
    """(K1, C) x (K2, C) -> (K1, K2) cosine-similarity (descriptors are
    L2-normalized upstream, xfeat.py:93).

    Full f32 precision is mandatory: JAX's default matmul precision truncates
    inputs bf16-style (~2e-3 error), which destroys mutual-argmax decisions
    when similarities cluster tightly."""
    return jax.lax.dot_general(
        d1, d2, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)


def mnn_match(d1: jax.Array, d2: jax.Array,
              valid1: Optional[jax.Array] = None,
              valid2: Optional[jax.Array] = None,
              min_cossim: float = 0.82) -> Tuple[jax.Array, jax.Array]:
    """Mutual-nearest-neighbour matching (reference xfeat.py:327-348).

    Args:
      d1, d2: (K, C) L2-normalized descriptors (padded rows allowed).
      valid1, valid2: (K,) bool masks of real rows.
      min_cossim: gate on max similarity; <= 0 disables (reference default
        0.82 for `match`, -1 for the pipelines).

    Returns:
      idx1: (K,) int32 — for each slot of d1, the argmax column in d2.
      mask: (K,) bool — mutual && gated && valid matches.
    """
    sim = similarity(d1, d2)
    if valid2 is not None:
        sim = jnp.where(valid2[None, :], sim, NEG)
    simT = sim.T
    if valid1 is not None:
        simT = jnp.where(valid1[None, :], simT, NEG)

    match12 = jnp.argmax(sim, axis=1).astype(jnp.int32)
    match21 = jnp.argmax(simT, axis=1).astype(jnp.int32)

    k1 = d1.shape[0]
    arange = jnp.arange(k1, dtype=jnp.int32)
    mutual = jnp.take(match21, match12) == arange
    mask = mutual
    if valid1 is not None:
        mask = mask & valid1
    if min_cossim > 0:
        best = jnp.max(sim, axis=1)
        mask = mask & (best > min_cossim)
    return match12, mask


batch_mnn_match = jax.vmap(mnn_match, in_axes=(0, 0, 0, 0, None))


def batch_mnn_match_dense(d1: jax.Array, d2: jax.Array,
                          min_cossim: float = -1.0):
    """batch_match for the semi-dense path where every row is real
    (reference xfeat.py:265-290 with its default min_cossim=-1)."""
    def one(a, b):
        return mnn_match(a, b, None, None, min_cossim)
    return jax.vmap(one)(d1, d2)
