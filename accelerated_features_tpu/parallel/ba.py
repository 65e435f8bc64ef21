"""Distributed bundle adjustment over a device mesh.

The Schur-complement reduction of sfm/ba.py is expressed entirely in
per-observation products + segment-sums, so distributing it = sharding the
observation table across the 'data' mesh axis and inserting `psum` after
every segment-sum (the reduced camera system and per-point accumulators ride
the ICI as all-reduces). Cameras and points are replicated — they are small
relative to observations; the heavy O(N_obs) work (Jacobians, W products,
matvecs) scales with devices.

This is the BASELINE.json north-star capability: map/keyframe blocks
partitioned across a pod slice with Schur reduction over collectives.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..sfm.ba import BAProblem, bundle_adjust


def pad_observations(p: BAProblem, multiple: int) -> BAProblem:
    """Pad the observation table to a device-count multiple (masked rows)."""
    n = p.obs_cam.shape[0]
    rem = (-n) % multiple
    if rem == 0:
        return p
    return p._replace(
        obs_cam=jnp.concatenate([p.obs_cam,
                                 jnp.zeros((rem,), p.obs_cam.dtype)]),
        obs_pt=jnp.concatenate([p.obs_pt,
                                jnp.zeros((rem,), p.obs_pt.dtype)]),
        obs_uv=jnp.concatenate([p.obs_uv, jnp.zeros((rem, 2),
                                                    p.obs_uv.dtype)]),
        obs_mask=jnp.concatenate([p.obs_mask,
                                  jnp.zeros((rem,), bool)]),
    )


def bundle_adjust_sharded(p: BAProblem, mesh: Mesh, iters: int = 20,
                          lam0: float = 1e-3, cg_iters: int = 50,
                          axis: str = "data"
                          ) -> Tuple[BAProblem, Dict[str, jax.Array]]:
    """Run LM-BA with observations sharded over `axis` of `mesh`.

    Numerically equivalent to single-device `bundle_adjust` up to float
    reduction order (verified in tests on the virtual CPU mesh)."""
    ndev = mesh.shape[axis]
    p = pad_observations(p, ndev)

    obs_spec = P(axis)
    rep = P()

    in_specs = BAProblem(
        cams=rep, points=rep, K=rep,
        obs_cam=obs_spec, obs_pt=obs_spec, obs_uv=obs_spec,
        obs_mask=obs_spec,
        fixed_cams=rep if p.fixed_cams is not None else None,
    )

    def run(local: BAProblem):
        psum = functools.partial(jax.lax.psum, axis_name=axis)
        return bundle_adjust(local, iters=iters, lam0=lam0,
                             cg_iters=cg_iters, reduce_fn=psum)

    fn = jax.jit(jax.shard_map(
        run, mesh=mesh,
        in_specs=(in_specs,),
        out_specs=(BAProblem(cams=rep, points=rep, K=rep, obs_cam=obs_spec,
                             obs_pt=obs_spec, obs_uv=obs_spec,
                             obs_mask=obs_spec,
                             fixed_cams=rep if p.fixed_cams is not None
                             else None),
                   {"initial_cost": rep, "final_cost": rep,
                    "final_lambda": rep}),
    ))
    return fn(p)
