"""SO(3)/SE(3) utilities for the SfM layer (angle-axis parameterization)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def hat(w: jax.Array) -> jax.Array:
    """(…,3) -> (…,3,3) skew-symmetric."""
    zeros = jnp.zeros_like(w[..., 0])
    return jnp.stack([
        jnp.stack([zeros, -w[..., 2], w[..., 1]], -1),
        jnp.stack([w[..., 2], zeros, -w[..., 0]], -1),
        jnp.stack([-w[..., 1], w[..., 0], zeros], -1),
    ], -2)


def so3_exp(w: jax.Array) -> jax.Array:
    """Rodrigues: (…,3) angle-axis -> (…,3,3) rotation."""
    theta = jnp.linalg.norm(w, axis=-1, keepdims=True)[..., None]
    K = hat(w / jnp.maximum(theta[..., 0], 1e-12))
    eye = jnp.broadcast_to(jnp.eye(3), K.shape)
    s, c = jnp.sin(theta), jnp.cos(theta)
    R = eye + s * K + (1 - c) * (K @ K)
    # small-angle fallback
    R_small = eye + hat(w)
    return jnp.where(theta > 1e-7, R, R_small)


def so3_log(R: jax.Array) -> jax.Array:
    """(…,3,3) -> (…,3) angle-axis."""
    cos = jnp.clip((jnp.trace(R, axis1=-2, axis2=-1) - 1) / 2, -1.0, 1.0)
    theta = jnp.arccos(cos)
    w = jnp.stack([R[..., 2, 1] - R[..., 1, 2],
                   R[..., 0, 2] - R[..., 2, 0],
                   R[..., 1, 0] - R[..., 0, 1]], -1)
    scale = jnp.where(theta[..., None] > 1e-7,
                      theta[..., None] / (2 * jnp.sin(theta[..., None])),
                      0.5)
    return w * scale


def rotate(w: jax.Array, x: jax.Array) -> jax.Array:
    """Rotate points x (…,3) by angle-axis w (…,3) without materializing R
    (Rodrigues on vectors — cheaper and jacobian-friendly)."""
    theta = jnp.linalg.norm(w, axis=-1, keepdims=True)
    axis = w / jnp.maximum(theta, 1e-12)
    s, c = jnp.sin(theta), jnp.cos(theta)
    cross = jnp.cross(axis, x)
    dot = jnp.sum(axis * x, -1, keepdims=True)
    rotated = x * c + cross * s + axis * dot * (1 - c)
    small = x + jnp.cross(w, x)
    return jnp.where(theta > 1e-7, rotated, small)


def se3_apply(pose6: jax.Array, x: jax.Array) -> jax.Array:
    """pose6 = [w(3), t(3)] world->cam; x (…,3) -> R x + t."""
    return rotate(pose6[..., :3], x) + pose6[..., 3:]


def se3_matrix(pose6: jax.Array) -> jax.Array:
    R = so3_exp(pose6[..., :3])
    T = jnp.zeros(pose6.shape[:-1] + (4, 4))
    T = T.at[..., :3, :3].set(R)
    T = T.at[..., :3, 3].set(pose6[..., 3:])
    return T.at[..., 3, 3].set(1.0)


def se3_from_Rt(R: jax.Array, t: jax.Array) -> jax.Array:
    return jnp.concatenate([so3_log(R), t], -1)


def se3_inverse(pose6: jax.Array) -> jax.Array:
    w = pose6[..., :3]
    t = pose6[..., 3:]
    return jnp.concatenate([-w, -rotate(-w, t)], -1)


def se3_compose(a: jax.Array, b: jax.Array) -> jax.Array:
    """T_a * T_b as 6-vectors."""
    Ra = so3_exp(a[..., :3])
    Rb = so3_exp(b[..., :3])
    R = Ra @ Rb
    t = rotate(a[..., :3], b[..., 3:]) + a[..., 3:]
    return jnp.concatenate([so3_log(R), t], -1)
