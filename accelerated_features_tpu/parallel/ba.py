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


# ---------------------------------------------------------------------------
# point-partitioned (owner-computes) distribution — the north-star layout
# ---------------------------------------------------------------------------

def partition_by_point(p: BAProblem, ndev: int) -> Tuple[BAProblem,
                                                         "jnp.ndarray"]:
    """Reorder the problem so points AND their observations shard cleanly
    over `ndev` devices (owner-computes).

    Points are distributed round-robin (point i -> device i % ndev, local
    slot i // ndev); every observation moves to its point's owner shard and
    its obs_pt is rewritten to the LOCAL point index. Per-device memory is
    then O(P/ndev + C): the V^{-1} blocks, b_p, and back-substitution never
    leave the owner, and only C-sized camera accumulators ride the ICI
    (all-reduce), unlike `bundle_adjust_sharded` which replicates the map.

    Returns the reordered/padded problem (leading dims divisible by ndev;
    shard s occupies the contiguous block s) and the permutation that maps
    reordered points back to the original order.
    """
    import numpy as np

    n_pts = int(p.points.shape[0])
    ppad = (-n_pts) % ndev
    Ploc = (n_pts + ppad) // ndev

    pts = np.asarray(p.points)
    pts = np.concatenate([pts, np.zeros((ppad, 3), pts.dtype)])
    owner = np.arange(n_pts + ppad) % ndev
    slot = np.arange(n_pts + ppad) // ndev
    # shard-major layout: row s*Ploc + slot
    new_index = owner * Ploc + slot                  # old id -> new row
    pts_sh = np.empty_like(pts)
    pts_sh[new_index] = pts
    # gather map restoring original order: orig[i] = sharded[new_index[i]]
    inverse = new_index

    obs_cam = np.asarray(p.obs_cam)
    obs_pt = np.asarray(p.obs_pt)
    obs_uv = np.asarray(p.obs_uv)
    obs_mask = np.asarray(p.obs_mask)
    obs_owner = np.where(obs_mask, obs_pt % ndev, -1)

    counts = [int(np.sum(obs_owner == d)) for d in range(ndev)]
    nloc = max(max(counts), 1)
    nloc += (-nloc) % 8  # tile-friendly pad

    oc = np.zeros((ndev, nloc), obs_cam.dtype)
    op = np.zeros((ndev, nloc), obs_pt.dtype)
    ouv = np.zeros((ndev, nloc, 2), obs_uv.dtype)
    om = np.zeros((ndev, nloc), bool)
    for d in range(ndev):
        sel = obs_owner == d
        n = counts[d]
        oc[d, :n] = obs_cam[sel]
        op[d, :n] = obs_pt[sel] // ndev              # LOCAL point index
        ouv[d, :n] = obs_uv[sel]
        om[d, :n] = True

    q = p._replace(
        points=jnp.asarray(pts_sh),
        obs_cam=jnp.asarray(oc.reshape(-1)),
        obs_pt=jnp.asarray(op.reshape(-1)),
        obs_uv=jnp.asarray(ouv.reshape(-1, 2)),
        obs_mask=jnp.asarray(om.reshape(-1)),
    )
    return q, jnp.asarray(inverse)


def bundle_adjust_point_sharded(p: BAProblem, mesh: Mesh, iters: int = 20,
                                lam0: float = 1e-3, cg_iters: int = 50,
                                axis: str = "data"
                                ) -> Tuple[BAProblem, Dict[str, jax.Array]]:
    """LM-BA with the MAP partitioned across the mesh: each device owns
    P/ndev points, their V^{-1} blocks, and all their observations; cameras
    are replicated and reduced with `psum` (C-sized traffic only).

    Numerically equivalent to single-device `bundle_adjust` up to float
    reduction order (verified in tests on the 8-device virtual mesh)."""
    ndev = mesh.shape[axis]
    q, inverse = partition_by_point(p, ndev)

    sh = P(axis)
    rep = P()
    in_specs = BAProblem(
        cams=rep, points=sh, K=rep,
        obs_cam=sh, obs_pt=sh, obs_uv=sh, obs_mask=sh,
        fixed_cams=rep if q.fixed_cams is not None else None,
    )

    def run(local: BAProblem):
        psum = functools.partial(jax.lax.psum, axis_name=axis)
        return bundle_adjust(local, iters=iters, lam0=lam0,
                             cg_iters=cg_iters, reduce_cam=psum)

    fn = jax.jit(jax.shard_map(
        run, mesh=mesh,
        in_specs=(in_specs,),
        out_specs=(in_specs,
                   {"initial_cost": rep, "final_cost": rep,
                    "final_lambda": rep}),
    ))
    solved, stats = fn(q)
    # restore original point order (drop padding)
    n_orig = p.points.shape[0]
    solved = solved._replace(points=solved.points[inverse][:n_orig],
                             obs_cam=p.obs_cam, obs_pt=p.obs_pt,
                             obs_uv=p.obs_uv, obs_mask=p.obs_mask)
    return solved, stats
