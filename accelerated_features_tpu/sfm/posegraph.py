"""Keyframe pose graph + SE(3) pose-graph optimization.

New capability (BASELINE.json north star). Nodes are keyframe poses
(world->cam 6-vectors); edges are relative-pose measurements from two-view
geometry. Optimization is Gauss-Newton on the SE(3) residual
log(T_meas^{-1} T_i T_j^{-1}) with dense normal equations (keyframe counts
are small; the landmark-scale work lives in BA).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from .lie import se3_compose, se3_inverse, so3_exp


@dataclasses.dataclass
class PoseGraph:
    """Mutable host-side container; optimization happens on device."""
    poses: np.ndarray                       # (N, 6) world->cam
    edges: List[Tuple[int, int]]            # (i, j) pairs
    measurements: np.ndarray                # (E, 6) T_i_to_j measurements
    weights: np.ndarray                     # (E,) edge weights

    @classmethod
    def empty(cls):
        return cls(np.zeros((0, 6), np.float32), [],
                   np.zeros((0, 6), np.float32), np.zeros((0,), np.float32))

    def add_keyframe(self, pose6: np.ndarray) -> int:
        self.poses = np.concatenate([self.poses,
                                     np.asarray(pose6, np.float32)[None]])
        return len(self.poses) - 1

    def add_edge(self, i: int, j: int, T_i_to_j: np.ndarray,
                 weight: float = 1.0):
        self.edges.append((i, j))
        self.measurements = np.concatenate(
            [self.measurements, np.asarray(T_i_to_j, np.float32)[None]])
        self.weights = np.concatenate(
            [self.weights, np.asarray([weight], np.float32)])


def edge_residual(pose_i: jax.Array, pose_j: jax.Array,
                  meas_i_to_j: jax.Array) -> jax.Array:
    """r = log(T_meas^{-1} * (T_j * T_i^{-1})) — 6-vector."""
    rel = se3_compose(pose_j, se3_inverse(pose_i))
    err = se3_compose(se3_inverse(meas_i_to_j), rel)
    return err


def pgo_cost(poses: jax.Array, edges_i: jax.Array, edges_j: jax.Array,
             meas: jax.Array, weights: jax.Array) -> jax.Array:
    r = jax.vmap(edge_residual)(poses[edges_i], poses[edges_j], meas)
    return 0.5 * jnp.sum(weights[:, None] * r ** 2)


def optimize_pose_graph(graph: PoseGraph, iters: int = 20,
                        lam0: float = 1e-4, fix_first: bool = True,
                        robust_c: Optional[float] = 0.7
                        ) -> Tuple[np.ndarray, Dict[str, float]]:
    """Dense LM on the pose graph with IRLS Cauchy robustification.

    `robust_c`: Cauchy scale on the per-edge residual norm (se3 log
    units). A FALSE loop edge — repeated scene texture can produce
    geometrically self-consistent wrong matches that pass inlier and
    scale gates — would otherwise warp the whole trajectory, since
    quadratic cost lets one ~1-rad edge outvote dozens of ~0.05-rad
    ones. IRLS: each LM step reweights every edge by
    1/(1 + ||r||^2/c^2) at the CURRENT poses, so inconsistent edges get
    asymptotically zero influence while near-consensus edges keep full
    weight. None disables (pure least squares). Returns optimized (N,6)
    poses."""
    n = len(graph.poses)
    if n == 0 or not graph.edges:
        return graph.poses, {"initial_cost": 0.0, "final_cost": 0.0}
    ei = jnp.asarray([e[0] for e in graph.edges], jnp.int32)
    ej = jnp.asarray([e[1] for e in graph.edges], jnp.int32)
    meas = jnp.asarray(graph.measurements)
    wts = jnp.asarray(graph.weights)
    poses0 = jnp.asarray(graph.poses)

    def robust_w(poses):
        if robust_c is None:
            return jnp.ones(len(graph.edges), wts.dtype)
        r = jax.vmap(edge_residual)(poses[ei], poses[ej], meas)
        rn2 = jnp.sum(r ** 2, axis=-1)
        return 1.0 / (1.0 + rn2 / (robust_c ** 2))

    def residual_vec(poses_flat, w_eff):
        poses = poses_flat.reshape(n, 6)
        r = jax.vmap(edge_residual)(poses[ei], poses[ej], meas)
        return (jnp.sqrt(w_eff)[:, None] * r).reshape(-1)

    @jax.jit
    def lm(poses0):
        def body(_, state):
            poses, lam, cost_prev = state
            flat = poses.reshape(-1)
            w_eff = wts * robust_w(poses)   # IRLS: frozen for this step
            J = jax.jacfwd(residual_vec)(flat, w_eff)
            r = residual_vec(flat, w_eff)
            H = J.T @ J + lam * jnp.eye(flat.shape[0])
            g = J.T @ r
            if fix_first:
                # gauge: freeze pose 0 by zeroing its rows/cols and unit diag
                m = jnp.arange(flat.shape[0]) < 6
                H = jnp.where(m[:, None] | m[None, :], 0.0, H)
                H = H + jnp.diag(m.astype(H.dtype))
                g = jnp.where(m, 0.0, g)
            dx = jnp.linalg.solve(H, -g)
            new = (flat + dx).reshape(n, 6)
            # accept test under THIS step's frozen IRLS weights so the
            # comparison is apples-to-apples (classic IRLS-LM)
            cost_prev_eff = 0.5 * jnp.sum(r ** 2)
            cost_new = pgo_cost(new.reshape(n, 6), ei, ej, meas, w_eff)
            accept = cost_new < cost_prev_eff
            poses = jnp.where(accept, new, poses)
            lam = jnp.where(accept, jnp.maximum(lam * 0.5, 1e-9),
                            jnp.minimum(lam * 4.0, 1e3))
            cost = jnp.where(accept, cost_new, cost_prev)
            return poses, lam, cost

        cost0 = pgo_cost(poses0, ei, ej, meas, wts)
        poses, lam, cost = jax.lax.fori_loop(
            0, iters, body, (poses0, jnp.asarray(lam0, jnp.float32), cost0))
        return poses, cost0, cost

    poses, cost0, cost = lm(poses0)
    return np.asarray(poses), {"initial_cost": float(cost0),
                               "final_cost": float(cost)}


def absolute_trajectory_error(poses_est: np.ndarray, poses_gt: np.ndarray
                              ) -> float:
    """ATE RMSE over camera centers after Umeyama (similarity) alignment —
    the standard SLAM trajectory metric for the benchmark harness."""
    def centers(poses):
        out = []
        for p in poses:
            R = np.asarray(so3_exp(jnp.asarray(p[:3])))
            out.append(-R.T @ p[3:])
        return np.asarray(out)

    A = centers(poses_est)
    B = centers(poses_gt)
    mu_a, mu_b = A.mean(0), B.mean(0)
    Ac, Bc = A - mu_a, B - mu_b
    U, S, Vt = np.linalg.svd(Ac.T @ Bc / len(A))
    d = np.sign(np.linalg.det(U @ Vt))
    D = np.diag([1.0, 1.0, d])
    R = U @ D @ Vt
    var_a = (Ac ** 2).sum() / len(A)
    s = np.trace(np.diag(S) @ D) / max(var_a, 1e-12)
    t = mu_b - s * R.T @ mu_a
    A_aligned = s * (R.T @ Ac.T).T + mu_b
    return float(np.sqrt(np.mean(np.sum((A_aligned - B) ** 2, axis=1))))
