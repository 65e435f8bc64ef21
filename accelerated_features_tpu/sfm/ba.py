"""Bundle adjustment — TPU-native matrix-free Schur-complement solver.

New capability beyond the reference (north star in BASELINE.json; the
reference's only pose math is the eval-time RANSAC, megadepth1500.py:98-113).

Design (TPU-first, not a port of any CPU BA):
  * fixed-shape observation table (obs_cam, obs_pt, obs_uv, mask) — ragged
    tracks become masked rows;
  * residuals + analytic-quality Jacobians via vectorized jacfwd;
  * Levenberg-Marquardt normal equations, point blocks eliminated by the
    Schur complement;
  * the reduced camera system S dc = rhs is solved MATRIX-FREE with
    conjugate gradients: S x is evaluated with per-observation products and
    `segment_sum`s — no S materialization, perfectly parallel, and the same
    code shards over a device mesh by splitting observations (partial
    segment-sums + psum over the camera-space vectors; see parallel/ba.py).

All arrays f32; damping keeps the normal equations well-conditioned.
"""

from __future__ import annotations

import functools
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from .lie import rotate


class BAProblem(NamedTuple):
    cams: jax.Array       # (C, 6) [angle-axis, t], world->cam
    points: jax.Array     # (P, 3)
    K: jax.Array          # (3, 3) shared intrinsics
    obs_cam: jax.Array    # (N,) int32
    obs_pt: jax.Array     # (N,) int32
    obs_uv: jax.Array     # (N, 2) pixel observations
    obs_mask: jax.Array   # (N,) bool
    fixed_cams: Optional[jax.Array] = None  # (C,) bool — gauge freeze


def project(cam6: jax.Array, X: jax.Array, K: jax.Array) -> jax.Array:
    """World point -> pixel (pinhole, no distortion)."""
    Xc = rotate(cam6[:3], X) + cam6[3:]
    z = jnp.maximum(Xc[2], 1e-6)
    u = K[0, 0] * Xc[0] / z + K[0, 2]
    v = K[1, 1] * Xc[1] / z + K[1, 2]
    return jnp.stack([u, v])


def _residual_one(cam6, X, uv, K):
    return project(cam6, X, K) - uv


def residuals_and_jacobians(p: BAProblem):
    """Per-observation residual (N,2), J_cam (N,2,6), J_pt (N,2,3)."""
    cams_g = p.cams[p.obs_cam]
    pts_g = p.points[p.obs_pt]

    def rj(cam6, X, uv):
        r = _residual_one(cam6, X, uv, p.K)
        Jc = jax.jacfwd(lambda c: _residual_one(c, X, uv, p.K))(cam6)
        Jp = jax.jacfwd(lambda x: _residual_one(cam6, x, uv, p.K))(X)
        return r, Jc, Jp

    r, Jc, Jp = jax.vmap(rj)(cams_g, pts_g, p.obs_uv)
    m = p.obs_mask[:, None]
    r = jnp.where(m, r, 0.0)
    Jc = jnp.where(m[..., None], Jc, 0.0)
    Jp = jnp.where(m[..., None], Jp, 0.0)
    if p.fixed_cams is not None:
        Jc = jnp.where(p.fixed_cams[p.obs_cam][:, None, None], 0.0, Jc)
    return r, Jc, Jp


def _inv3(M: jax.Array) -> jax.Array:
    """Batched closed-form 3x3 inverse."""
    a = M[..., 0, 0]; b = M[..., 0, 1]; c = M[..., 0, 2]
    d = M[..., 1, 0]; e = M[..., 1, 1]; f = M[..., 1, 2]
    g = M[..., 2, 0]; h = M[..., 2, 1]; i = M[..., 2, 2]
    A = e * i - f * h
    B = -(d * i - f * g)
    C = d * h - e * g
    det = a * A + b * B + c * C
    det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    adj = jnp.stack([
        jnp.stack([A, -(b * i - c * h), (b * f - c * e)], -1),
        jnp.stack([B, (a * i - c * g), -(a * f - c * d)], -1),
        jnp.stack([C, -(a * h - b * g), (a * e - b * d)], -1),
    ], -2)
    return adj / det[..., None, None]


def build_normal_blocks(p: BAProblem, lam: float, reduce_cam=lambda x: x,
                        reduce_pt=lambda x: x):
    """Per-camera U (C,6,6), per-point V^{-1} (P,3,3), gradients, and the
    per-observation coupling blocks W_i = J_c^T J_p (N,6,3).

    `reduce_cam` / `reduce_pt` sum partial segment-sums across devices
    (psum) for camera-space / point-space accumulators when the observation
    table is sharded (parallel/ba.py). With point-owner sharding (all of a
    point's observations on its owner device) `reduce_pt` stays identity —
    points and their V blocks never cross the interconnect."""
    r, Jc, Jp = residuals_and_jacobians(p)
    C = p.cams.shape[0]
    P = p.points.shape[0]

    U = reduce_cam(jax.ops.segment_sum(jnp.einsum("nri,nrj->nij", Jc, Jc),
                                       p.obs_cam, num_segments=C))
    V = reduce_pt(jax.ops.segment_sum(jnp.einsum("nri,nrj->nij", Jp, Jp),
                                      p.obs_pt, num_segments=P))
    b_c = -reduce_cam(jax.ops.segment_sum(jnp.einsum("nri,nr->ni", Jc, r),
                                          p.obs_cam, num_segments=C))
    b_p = -reduce_pt(jax.ops.segment_sum(jnp.einsum("nri,nr->ni", Jp, r),
                                         p.obs_pt, num_segments=P))

    U = U + lam * jnp.eye(6)
    V = V + lam * jnp.eye(3)
    Vinv = _inv3(V)
    W = jnp.einsum("nri,nrj->nij", Jc, Jp)  # (N, 6, 3)
    cost = reduce_cam(0.5 * jnp.sum(r ** 2))
    return U, Vinv, W, b_c, b_p, cost


def schur_matvec(x: jax.Array, U, Vinv, W, obs_cam, obs_pt, C, P,
                 reduce_cam=lambda x: x, reduce_pt=lambda x: x):
    """S x = U x - W V^{-1} W^T x, evaluated observation-wise.

    x: (C, 6) camera-space vector -> (C, 6)."""
    Ux = jnp.einsum("cij,cj->ci", U, x)
    wtx = jnp.einsum("nji,nj->ni", W, x[obs_cam])          # (N,3): W^T x
    z = reduce_pt(jax.ops.segment_sum(wtx, obs_pt, num_segments=P))
    z = jnp.einsum("pij,pj->pi", Vinv, z)
    wz = jnp.einsum("nij,nj->ni", W, z[obs_pt])            # (N,6)
    back = reduce_cam(jax.ops.segment_sum(wz, obs_cam, num_segments=C))
    return Ux - back


def cg_solve(matvec, b: jax.Array, iters: int = 50, tol: float = 1e-8,
             precond_mv=None):
    """(Preconditioned) conjugate gradients on a PSD operator (fixed
    iteration count — static control flow for jit).

    `precond_mv`: optional z = M^{-1} r application. In BA the natural
    choice is block-Jacobi on the reduced camera system (M = damped U,
    per-camera 6x6 blocks): U is replicated under every sharding layout
    used here, so preconditioning adds ZERO interconnect traffic while
    cutting the iterations needed — and each CG iteration costs one
    camera-space psum, the latency-dominated term in the distributed
    cost model (parallel/ba.predicted_weak_scaling). Measured on the
    synthetic BA benchmark problem: block-Jacobi PCG reaches plain-CG@50
    residual in ~2-3x fewer iterations (tests/test_sfm.py)."""
    ident = (lambda r: r) if precond_mv is None else precond_mv
    x0 = jnp.zeros_like(b)
    r0 = b
    z0 = ident(r0)
    p0 = z0
    rz0 = jnp.vdot(r0, z0)
    rr0 = jnp.vdot(r0, r0)

    def body(_, state):
        x, r, pv, rz = state
        # relative-residual stop (masked update — static shapes): besides
        # saving matvecs' worth of work being wasted, this is what keeps
        # a STRONG preconditioner well-behaved on gauge-deficient BA
        # systems: once ||r|| is down 1e-5, further iterations only walk
        # the near-null (gauge) directions where the cost is flat —
        # plain CG barely moves there (tiny eigenvalues), but
        # preconditioned CG strides along them, drifting the solution at
        # equal cost and amplifying cross-device reduction-order noise.
        live = jnp.vdot(r, r) > (1e-5 ** 2) * rr0
        Ap = matvec(pv)
        denom = jnp.vdot(pv, Ap)
        alpha = jnp.where(live & (jnp.abs(denom) > 1e-20),
                          rz / denom, 0.0)
        x = x + alpha * pv
        r = r - alpha * Ap
        z = ident(r)
        rz_new = jnp.vdot(r, z)
        beta = jnp.where(live & (jnp.abs(rz) > 1e-20), rz_new / rz, 0.0)
        pv = jnp.where(live, z + beta * pv, pv)
        rz_keep = jnp.where(live, rz_new, rz)
        return x, r, pv, rz_keep

    x, _, _, _ = jax.lax.fori_loop(0, iters, body, (x0, r0, p0, rz0))
    return x


def ba_step(p: BAProblem, lam: float, cg_iters: int = 50,
            reduce_cam=lambda x: x, reduce_pt=lambda x: x,
            precond: bool = True) -> Tuple[BAProblem, jax.Array]:
    """One LM step: Schur-eliminate points, block-Jacobi-preconditioned
    CG on the camera system, back-substitute points."""
    C = p.cams.shape[0]
    P = p.points.shape[0]
    U, Vinv, W, b_c, b_p, cost = build_normal_blocks(p, lam, reduce_cam,
                                                     reduce_pt)

    # rhs = b_c - W V^{-1} b_p
    vb = jnp.einsum("pij,pj->pi", Vinv, b_p)
    wvb = jnp.einsum("nij,nj->ni", W, vb[p.obs_pt])
    rhs = b_c - reduce_cam(
        jax.ops.segment_sum(wvb, p.obs_cam, num_segments=C))

    mv = functools.partial(schur_matvec, U=U, Vinv=Vinv, W=W,
                           obs_cam=p.obs_cam, obs_pt=p.obs_pt, C=C, P=P,
                           reduce_cam=reduce_cam, reduce_pt=reduce_pt)
    pc_mv = None
    if precond:
        # Block-Jacobi with the TRUE diagonal block of S: since BA has at
        # most one observation per (camera, point) pair, the per-camera
        # Schur diagonal is exactly S_cc = U_c - sum_{i: cam(i)=c}
        # W_i V^{-1}_{pt(i)} W_i^T — one extra camera-space segment-sum
        # (+psum under sharding) per LM step, OUTSIDE the CG loop.
        # (Preconditioning with U alone matched on cost but drifted along
        # the weakly-determined near-gauge directions — larger parameter
        # error at equal cost. The exact S diagonal preserves S's
        # geometry there.) Fixed cameras reduce to lam*I: invertible,
        # and their dc is zeroed below anyway.
        wvw = jnp.einsum("nij,njk,nlk->nil", W, Vinv[p.obs_pt], W)
        S_diag = U - reduce_cam(jax.ops.segment_sum(
            wvw, p.obs_cam, num_segments=C))
        Minv = jnp.linalg.inv(S_diag)                  # (C, 6, 6)
        pc_mv = lambda r: jnp.einsum("cij,cj->ci", Minv, r)
    dc = cg_solve(mv, rhs, cg_iters, precond_mv=pc_mv)

    # dp = V^{-1} (b_p - W^T dc)
    wtdc = reduce_pt(jax.ops.segment_sum(
        jnp.einsum("nji,nj->ni", W, dc[p.obs_cam]),
        p.obs_pt, num_segments=P))
    dp = jnp.einsum("pij,pj->pi", Vinv, b_p - wtdc)

    if p.fixed_cams is not None:
        dc = jnp.where(p.fixed_cams[:, None], 0.0, dc)
    new = p._replace(cams=p.cams + dc, points=p.points + dp)
    return new, cost


def ba_cost(p: BAProblem, reduce_cam=lambda x: x) -> jax.Array:
    r, _, _ = residuals_and_jacobians(p)
    return reduce_cam(0.5 * jnp.sum(r ** 2))


def bundle_adjust(p: BAProblem, iters: int = 20, lam0: float = 1e-3,
                  cg_iters: int = 50, reduce_fn=None,
                  reduce_cam=None, reduce_pt=None, precond: bool = True
                  ) -> Tuple[BAProblem, Dict[str, jax.Array]]:
    """LM loop with multiplicative damping adaptation (accept/reject),
    jit-compatible (lax control flow).

    `reduce_fn` applies one reduction to BOTH camera- and point-space
    accumulators (observation sharding with replicated cams+points);
    `reduce_cam`/`reduce_pt` set them independently (point-owner sharding
    uses reduce_cam=psum, reduce_pt=identity)."""
    ident = lambda x: x
    reduce_cam = reduce_cam or reduce_fn or ident
    reduce_pt = reduce_pt or reduce_fn or ident

    def body(_, state):
        p, lam, cost_prev = state
        p_new, _ = ba_step(p, lam, cg_iters, reduce_cam, reduce_pt,
                           precond=precond)
        cost_new = ba_cost(p_new, reduce_cam)
        accept = cost_new < cost_prev
        p = jax.tree.map(lambda a, b: jnp.where(accept, a, b), p_new, p)
        lam = jnp.where(accept, jnp.maximum(lam * 0.5, 1e-8),
                        jnp.minimum(lam * 4.0, 1e3))
        cost = jnp.where(accept, cost_new, cost_prev)
        return p, lam, cost

    cost0 = ba_cost(p, reduce_cam)
    p_out, lam, cost = jax.lax.fori_loop(
        0, iters, body, (p, jnp.asarray(lam0, jnp.float32), cost0))
    return p_out, {"initial_cost": cost0, "final_cost": cost,
                   "final_lambda": lam}


def reprojection_rmse(p: BAProblem) -> jax.Array:
    r, _, _ = residuals_and_jacobians(p)
    n = jnp.maximum(jnp.sum(p.obs_mask), 1)
    return jnp.sqrt(jnp.sum(r ** 2) / (2 * n))
