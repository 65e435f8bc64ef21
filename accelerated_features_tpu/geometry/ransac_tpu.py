"""Batched essential-matrix RANSAC on TPU (throughput mode).

Complement to the native sequential LO-RANSAC (geometry/pose.py): evaluates
ALL hypotheses in parallel as batched linear algebra — the right operating
point when many pairs are processed per step (SfM front ends, training-time
filtering). Uses the 8-point solver per hypothesis (batched SVD on the MXU),
MSAC scoring over all correspondences at once, an inlier-weighted linear
refit, and cheirality-checked pose recovery. Fixed shapes, one jit.

The native 5-pt path remains the protocol-parity estimator for the pose
benchmarks; this one trades minimal-sample optimality for device-saturating
parallelism.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import numpy as np

import jax
import jax.numpy as jnp


class RansacResult(NamedTuple):
    R: jax.Array          # (3, 3)
    t: jax.Array          # (3,)
    E: jax.Array          # (3, 3)
    inliers: jax.Array    # (N,) bool
    num_inliers: jax.Array


def _normalize(pts: jax.Array, K: jax.Array) -> jax.Array:
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    return jnp.stack([(pts[:, 0] - cx) / fx, (pts[:, 1] - cy) / fy], -1)


def _eight_point(x0: jax.Array, x1: jax.Array) -> jax.Array:
    """x0, x1: (8, 2) normalized -> E (3,3) (smallest right singular vector
    + essential projection)."""
    q = jnp.stack([
        x1[:, 0] * x0[:, 0], x1[:, 0] * x0[:, 1], x1[:, 0],
        x1[:, 1] * x0[:, 0], x1[:, 1] * x0[:, 1], x1[:, 1],
        x0[:, 0], x0[:, 1], jnp.ones_like(x0[:, 0])], -1)  # (8, 9)
    _, _, vt = jnp.linalg.svd(q, full_matrices=True)
    E = vt[-1].reshape(3, 3)
    u, s, v = jnp.linalg.svd(E)
    sm = (s[0] + s[1]) / 2
    return (u * jnp.array([sm, sm, 0.0])) @ v


def _sampson_sq(E: jax.Array, x0: jax.Array, x1: jax.Array) -> jax.Array:
    """E (3,3); x0, x1 (N,2) -> squared Sampson errors (N,)."""
    x0h = jnp.concatenate([x0, jnp.ones_like(x0[:, :1])], -1)
    x1h = jnp.concatenate([x1, jnp.ones_like(x1[:, :1])], -1)
    Ex0 = x0h @ E.T
    Etx1 = x1h @ E
    num = jnp.sum(x1h * Ex0, -1) ** 2
    den = Ex0[:, 0] ** 2 + Ex0[:, 1] ** 2 + Etx1[:, 0] ** 2 + Etx1[:, 1] ** 2
    return num / jnp.maximum(den, 1e-18)


def _pose_to_E(wvec: jax.Array, t: jax.Array) -> jax.Array:
    from ..sfm.lie import so3_exp
    R = so3_exp(wvec)
    tx = jnp.array([[0.0, -t[2], t[1]],
                    [t[2], 0.0, -t[0]],
                    [-t[1], t[0], 0.0]])
    return tx @ R


def _sampson_signed(E, x0, x1):
    x0h = jnp.concatenate([x0, jnp.ones_like(x0[:, :1])], -1)
    x1h = jnp.concatenate([x1, jnp.ones_like(x1[:, :1])], -1)
    Ex0 = x0h @ E.T
    Etx1 = x1h @ E
    num = jnp.sum(x1h * Ex0, -1)
    den = Ex0[:, 0] ** 2 + Ex0[:, 1] ** 2 + Etx1[:, 0] ** 2 + Etx1[:, 1] ** 2
    return num * jax.lax.rsqrt(jnp.maximum(den, 1e-18))


def _refine_pose_sampson(wvec, t, x0, x1, weights, iters: int = 8,
                         damping: float = 1e-6):
    """Gauss-Newton on (angle-axis, t) minimizing weighted Sampson error —
    local optimization ON the essential manifold (a linear 8-point refit is
    ill-conditioned near the manifold: the two smallest singular values of
    the design matrix are barely separated for narrow-FOV scenes)."""
    def residuals(p):
        E = _pose_to_E(p[:3], p[3:])
        return jnp.sqrt(weights) * _sampson_signed(E, x0, x1)

    p = jnp.concatenate([wvec, t])

    def body(_, p):
        J = jax.jacfwd(residuals)(p)       # (N, 6)
        r = residuals(p)
        H = J.T @ J + damping * jnp.eye(6)
        g = J.T @ r
        dp = jnp.linalg.solve(H, -g)
        p_new = p + dp
        better = jnp.sum(residuals(p_new) ** 2) < jnp.sum(r ** 2)
        return jnp.where(better, p_new, p)

    p = jax.lax.fori_loop(0, iters, body, p)
    t_out = p[3:] / jnp.maximum(jnp.linalg.norm(p[3:]), 1e-12)
    return p[:3], t_out


def _recover_pose(E, x0, x1, w):
    """Cheirality-checked (R, t) from E using weighted correspondences."""
    u, s, vt = jnp.linalg.svd(E)
    d = jnp.linalg.det(u) * jnp.linalg.det(vt)
    vt = vt * jnp.sign(d)  # make R proper
    W = jnp.array([[0.0, -1, 0], [1, 0, 0], [0, 0, 1]])
    Ra = u @ W @ vt
    Rb = u @ W.T @ vt
    t = u[:, 2]

    def count(R, tc):
        x0h = jnp.concatenate([x0, jnp.ones_like(x0[:, :1])], -1)
        x1h = jnp.concatenate([x1, jnp.ones_like(x1[:, :1])], -1)
        Rx0 = x0h @ R.T
        a11 = jnp.sum(Rx0 * Rx0, -1)
        a12 = -jnp.sum(Rx0 * x1h, -1)
        a22 = jnp.sum(x1h * x1h, -1)
        b1 = -Rx0 @ tc
        b2 = x1h @ tc
        det = a11 * a22 - a12 ** 2
        d0 = (b1 * a22 - b2 * a12) / jnp.where(jnp.abs(det) < 1e-18, 1.0, det)
        d1 = (a11 * b2 - a12 * b1) / jnp.where(jnp.abs(det) < 1e-18, 1.0, det)
        return jnp.sum(w * ((d0 > 0) & (d1 > 0)))

    cands = [(Ra, t), (Ra, -t), (Rb, t), (Rb, -t)]
    counts = jnp.stack([count(R, tc) for R, tc in cands])
    best = jnp.argmax(counts)
    Rs = jnp.stack([c[0] for c in cands])
    ts = jnp.stack([c[1] for c in cands])
    return Rs[best], ts[best]


@functools.partial(jax.jit, static_argnames=("n_hypotheses",))
def ransac_essential_tpu(p0: jax.Array, p1: jax.Array, K0: jax.Array,
                         K1: jax.Array, valid: Optional[jax.Array] = None,
                         max_epipolar_error: float = 2.5,
                         n_hypotheses: int = 512,
                         key: Optional[jax.Array] = None) -> RansacResult:
    """Batched-hypothesis essential RANSAC.

    p0, p1: (N, 2) pixel correspondences (padded rows allowed via `valid`).
    Returns RansacResult with R, t (world0 -> cam1 convention, |t| = 1).
    """
    n = p0.shape[0]
    if valid is None:
        valid = jnp.ones((n,), bool)
    if key is None:
        key = jax.random.key(0)

    x0 = _normalize(p0.astype(jnp.float32), K0)
    x1 = _normalize(p1.astype(jnp.float32), K1)
    favg = (K0[0, 0] + K0[1, 1] + K1[0, 0] + K1[1, 1]) / 4.0
    thr_sq = (max_epipolar_error / favg) ** 2

    # hypothesis sampling: random 8-subsets WITHOUT replacement via the
    # Gumbel-top-k trick (categorical sampling with replacement produced
    # duplicate rows in a minimal sample — a rank-deficient 8-point system
    # whose null-space vector is an arbitrary invalid E; at N=30 about 61%
    # of hypotheses were degenerate). Invalid rows stay excluded by logit.
    logits = jnp.where(valid, 0.0, -1e9)
    keys = jax.random.split(key, n_hypotheses)
    samples = jax.vmap(lambda k: jax.lax.top_k(
        logits + jax.random.gumbel(k, (n,)), 8)[1])(keys)    # (H, 8)

    Es = jax.vmap(lambda idx: _eight_point(x0[idx], x1[idx]))(samples)

    errs = jax.vmap(lambda E: _sampson_sq(E, x0, x1))(Es)  # (H, N)
    inl = (errs < thr_sq) & valid[None, :]
    msac = jnp.sum(jnp.where(valid[None, :],
                             jnp.minimum(errs, thr_sq), 0.0), axis=1)
    best = jnp.argmin(msac)

    # local optimization: cheirality-resolve the best E, then Gauss-Newton
    # on (R, t) over the inliers (Sampson), then re-collect inliers
    w = inl[best].astype(jnp.float32)
    E = Es[best]
    from ..sfm.lie import so3_log
    R0, t0 = _recover_pose(E, x0, x1, w)
    wvec, t = _refine_pose_sampson(so3_log(R0), t0, x0, x1, w)
    for _ in range(1):
        E = _pose_to_E(wvec, t)
        err = _sampson_sq(E, x0, x1)
        w = ((err < thr_sq) & valid).astype(jnp.float32)
        wvec, t = _refine_pose_sampson(wvec, t, x0, x1, w)

    E = _pose_to_E(wvec, t)
    err = _sampson_sq(E, x0, x1)
    inliers = (err < thr_sq) & valid
    from ..sfm.lie import so3_exp
    R = so3_exp(wvec)
    return RansacResult(R=R, t=t, E=E, inliers=inliers,
                        num_inliers=jnp.sum(inliers))


def _pad_bucket(n: int) -> int:
    """Round match counts up to a small set of buckets so the jitted RANSAC
    compiles a handful of programs instead of one per pair."""
    b = 256
    while b < n:
        b *= 2
    return b


def estimate_relative_pose_tpu(pts0: np.ndarray, pts1: np.ndarray,
                               K0: np.ndarray, K1: np.ndarray,
                               max_epipolar_error: float = 2.5,
                               n_hypotheses: int = 512,
                               seed: int = 0,
                               success_prob: float = 0.99999,
                               max_iters: int = 10_000):
    """Drop-in TPU-backed counterpart of geometry.pose.estimate_relative_pose
    (same host contract: numpy in, (R, t, inlier_mask) or None out).

    Pads the correspondence list to a power-of-two bucket (masked rows) so
    repeat calls reuse a few compiled programs; runs the batched-hypothesis
    8-pt MSAC + Sampson Gauss-Newton LO on the accelerator. Selectable via
    `pose_backend="tpu"` in the eval harnesses (VERDICT r1 #9); the native
    posekit 5-pt LO-RANSAC stays the accuracy-default. `success_prob` and
    `max_iters` are accepted for signature compatibility but unused — the
    hypothesis count is fixed (`n_hypotheses`), not adaptive."""
    pts0 = np.asarray(pts0, np.float64)
    pts1 = np.asarray(pts1, np.float64)
    n = len(pts0)
    if n < 8:
        return None
    m = _pad_bucket(n)
    p0 = np.zeros((m, 2), np.float32)
    p1 = np.zeros((m, 2), np.float32)
    p0[:n] = pts0
    p1[:n] = pts1
    valid = np.zeros((m,), bool)
    valid[:n] = True
    res = ransac_essential_tpu(
        jnp.asarray(p0), jnp.asarray(p1),
        jnp.asarray(np.asarray(K0, np.float32)),
        jnp.asarray(np.asarray(K1, np.float32)),
        jnp.asarray(valid), max_epipolar_error,
        n_hypotheses=n_hypotheses, key=jax.random.key(seed))
    ninl = int(res.num_inliers)
    if ninl < 5:
        return None
    R = np.asarray(res.R, np.float64)
    t = np.asarray(res.t, np.float64)
    mask = np.asarray(res.inliers)[:n]
    return R, t, mask


def ransac_essential_batch(p0, p1, K0, K1, valid=None,
                           max_epipolar_error: float = 2.5,
                           n_hypotheses: int = 512, key=None):
    """vmapped multi-pair version: p0/p1 (B, N, 2), K (B, 3, 3)."""
    b = p0.shape[0]
    if valid is None:
        valid = jnp.ones(p0.shape[:2], bool)
    if key is None:
        key = jax.random.key(0)
    keys = jax.random.split(key, b)
    return jax.vmap(
        lambda a0, a1, k0, k1, v, k: ransac_essential_tpu(
            a0, a1, k0, k1, v, max_epipolar_error, n_hypotheses, k)
    )(p0, p1, K0, K1, valid, keys)
