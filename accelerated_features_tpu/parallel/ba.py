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


def collective_accounting(n_cams: int, cg_iters: int = 50,
                          dtype_bytes: int = 4,
                          precond: bool = True) -> Dict[str, float]:
    """Analytic per-LM-iteration ICI traffic of
    `bundle_adjust_point_sharded` (VERDICT r3 'Next round' #5).

    With point-owner sharding only CAMERA-space accumulators ride the
    interconnect (reduce_pt is the identity — V blocks, b_p, and
    back-substitution never leave the owning device). Per LM iteration
    the psum'd arrays are, in program order (sfm/ba.py):

      build_normal_blocks: U (C,6,6), b_c (C,6), cost ()
      ba_step S_diag:      (C,6,6) block-Jacobi Schur diagonal
                           (precond=True default; ADVICE r4)
      ba_step rhs:         (C,6)
      cg_solve:            cg_iters x schur_matvec back-reduce (C,6)
      accept test:         ba_cost () scalar

    A ring all-reduce moves ~2*(n-1)/n ~= 2 bytes per payload byte per
    device, independent of device count — which is WHY the layout weak-
    scales: per-device compute grows with the local observation count
    while wire traffic stays O(C).

    Returns bytes per LM iteration (payload, not wire) and the breakdown.
    """
    C = n_cams
    u_bytes = C * 36 * dtype_bytes
    sdiag_bytes = C * 36 * dtype_bytes if precond else 0
    bc_bytes = C * 6 * dtype_bytes
    rhs_bytes = C * 6 * dtype_bytes
    cg_bytes = cg_iters * C * 6 * dtype_bytes
    scalar_bytes = 2 * dtype_bytes
    total = (u_bytes + sdiag_bytes + bc_bytes + rhs_bytes + cg_bytes
             + scalar_bytes)
    return {
        "U": u_bytes, "S_diag": sdiag_bytes, "b_c": bc_bytes,
        "rhs": rhs_bytes, "cg_matvecs": cg_bytes,
        "cost_scalars": scalar_bytes,
        "per_lm_iteration": total,
    }


def flops_accounting(n_obs_local: int, n_cams: int, n_pts_local: int,
                     cg_iters: int = 50) -> float:
    """Approximate per-device FLOPs per LM iteration (principal terms;
    sfm/ba.py):

      residuals + forward-mode Jacobians  ~ 650 flops/obs
      normal-block builds (U, V, W, b_*)  ~ 290 flops/obs
      per CG iter: W/W^T products 72/obs + U x 72/cam + Vinv z 36/pt
      back-substitution                   ~ 110 flops/obs
    """
    N, C, Ploc = n_obs_local, n_cams, n_pts_local
    fixed = N * (650 + 290 + 110)
    per_cg = 72 * N + 72 * C + 36 * Ploc
    return float(fixed + cg_iters * per_cg)


def hbm_accounting(n_obs_local: int, n_pts_local: int,
                   cg_iters: int = 50) -> float:
    """Approximate per-device HBM bytes per LM iteration — the binding
    resource for this op mix (per-observation einsums and segment-sums
    stream (N,2,6)/(N,6,3) tensors; arithmetic intensity is ~1-2
    flops/byte, far below the TPU's ~25 flops/byte ridge):

      residual+Jacobian build: write r/Jc/Jp     ~ 100 B/obs
      normal blocks U,V,W,b_*: read Jc/Jp, write ~ 220 B/obs
      per CG iter (schur_matvec): re-read W (72) + gathers/writes
                                                 ~ 170 B/obs
      back-substitution + cost                   ~ 120 B/obs
      point-space V/Vinv traffic                 ~ 150 B/pt (once)
    """
    N, Ploc = n_obs_local, n_pts_local
    return float(N * (100 + 220 + 120) + 150 * Ploc
                 + cg_iters * 170 * N)


def predicted_weak_scaling(n_cams: int, n_pts_per_dev: int,
                           obs_per_pt: float, ndev: int,
                           cg_iters: int = 50,
                           ici_bandwidth: float = 4.5e10,
                           flops_rate: float = 2.0e13,
                           hbm_bandwidth: float = 8.1e11,
                           hop_latency: float = 1e-6,
                           precond: bool = True) -> Dict[str, float]:
    """Predicted weak-scaling efficiency of point-sharded BA on a TPU
    slice: per-device problem size FIXED (n_pts_per_dev points with
    obs_per_pt observations each), camera set shared.

    Model parameters (all overridable; defaults stated so the numbers
    are auditable):
      * `ici_bandwidth`: one-way per-chip all-reduce payload bandwidth,
        bytes/s. 4.5e10 is a conservative v5e figure.
      * `flops_rate`: achieved f32 rate for this op mix. Segment-sums
        and (N,2,6)-shaped einsums run far below matmul peak; 20
        Tflop/s (~10% of bf16 peak) is the measured ballpark for
        gather/scatter-heavy TPU kernels.
      * `hop_latency`: per-ICI-hop launch+traversal latency. A ring
        all-reduce over n chips serializes ~2(n-1) hops, so each
        collective costs 2(n-1)*hop_latency + payload-bytes*2/BW.

      * `hbm_bandwidth`: per-chip HBM bandwidth (v5e: ~819 GB/s).

    t_compute = max(FLOPs time, HBM time): this op mix (segment-sums,
    small einsums, gathers) has ~1-2 flops/byte arithmetic intensity,
    so HBM is the binding resource — the FLOPs-only estimate would
    understate per-device time ~30x and with it the scaling efficiency.
    The comm latency term is what a bandwidth-only model hides: each CG
    iteration psums only 24*C bytes (24 KB at C=1000), so the ~53
    collectives/LM-iteration cost more in hops than in bytes. The two
    levers that move the break-even left are fewer CG iterations
    (linear in the latency term) and communication-avoiding s-step CG
    (s iterations per psum).

    efficiency = t_compute / (t_compute + t_comm); compute stays
    constant under weak scaling while comm grows only through the ring
    factor.
    """
    n_obs_local = n_pts_per_dev * obs_per_pt
    fl = flops_accounting(int(n_obs_local), n_cams, n_pts_per_dev, cg_iters)
    hbm = hbm_accounting(int(n_obs_local), n_pts_per_dev, cg_iters)
    t_compute = max(fl / flops_rate, hbm / hbm_bandwidth)
    acct = collective_accounting(n_cams, cg_iters, precond=precond)
    payload = acct["per_lm_iteration"]
    # collectives per LM iteration, counted from the actual program
    # (ADVICE r4): U, b_c, rhs, 2 cost scalars, cg_iters matvecs, plus
    # the S_diag psum the block-Jacobi preconditioner adds
    n_collectives = 5 + cg_iters + (1 if precond else 0)
    ring = 2.0 * (ndev - 1) / max(ndev, 1)
    wire = ring * payload
    t_comm = n_collectives * 2 * (ndev - 1) * hop_latency \
        + wire / ici_bandwidth
    eff = t_compute / (t_compute + t_comm)
    return {
        "ndev": ndev,
        "flops_per_dev_per_iter": fl,
        "hbm_bytes_per_dev_per_iter": hbm,
        "payload_bytes_per_iter": payload,
        "wire_bytes_per_iter": wire,
        "n_collectives_per_iter": n_collectives,
        "t_compute_s": t_compute,
        "t_comm_s": t_comm,
        "efficiency": eff,
    }


def bundle_adjust_point_sharded(p: BAProblem, mesh: Mesh, iters: int = 20,
                                lam0: float = 1e-3, cg_iters: int = 50,
                                axis: str = "data",
                                lower_only: bool = False
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
    if lower_only:
        # for collective-traffic inspection (tests compare the compiled
        # HLO's all-reduce inventory against collective_accounting)
        return fn.lower(q), None
    solved, stats = fn(q)
    # restore original point order (drop padding)
    n_orig = p.points.shape[0]
    solved = solved._replace(points=solved.points[inverse][:n_orig],
                             obs_cam=p.obs_cam, obs_pt=p.obs_pt,
                             obs_uv=p.obs_uv, obs_mask=p.obs_mask)
    return solved, stats
