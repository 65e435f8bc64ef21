"""Image resize ops with exact torch `F.interpolate(align_corners=False)`
semantics (the reference preprocess at xfeat.py:236-239 and the dual-scale
path at xfeat.py:380-381 depend on them).

`jax.image.resize(method='bilinear')` already uses half-pixel centers, which
matches torch's align_corners=False for arbitrary scale factors, so the dense
resize is a thin wrapper; nearest is the torch 'nearest' (floor of the scaled
index) used by the augmentation pipeline (reference augmentation.py:268-269).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def to_unit_float(x: jax.Array) -> jax.Array:
    """Device-side pixel normalization: integer images -> float32 / 255
    (the reference's host-side `parse_input` /255, xfeat.py:400-401, moved
    inside the jitted program so uint8 frames cross host->device and HBM
    at 1/4 the bytes of float32); float images pass through as float32.
    Idempotent — safe at every raw-image entry point."""
    if jnp.issubdtype(x.dtype, jnp.integer):
        return x.astype(jnp.float32) / 255.0
    return x.astype(jnp.float32)


def resize_bilinear(x: jax.Array, out_hw: Tuple[int, int]) -> jax.Array:
    """(B, H, W, C) -> (B, h, w, C), half-pixel bilinear (anti-alias off,
    like torch)."""
    b, _, _, c = x.shape
    return jax.image.resize(x, (b, out_hw[0], out_hw[1], c), method="bilinear", antialias=False)


def resize_nearest_torch(x: jax.Array, out_hw: Tuple[int, int]) -> jax.Array:
    """torch F.interpolate(mode='nearest'): src_idx = floor(dst * in/out)."""
    b, h, w, c = x.shape
    oh, ow = out_hw
    ys = jnp.floor(jnp.arange(oh) * (h / oh)).astype(jnp.int32)
    xs = jnp.floor(jnp.arange(ow) * (w / ow)).astype(jnp.int32)
    return x[:, ys][:, :, xs]


def preprocess_shape(h: int, w: int) -> Tuple[int, int, float, float]:
    """Round a shape down to /32 (reference xfeat.py:236-238). Returns
    (_H, _W, rh, rw) with rh/rw mapping resized coords back to the input."""
    _h, _w = (h // 32) * 32, (w // 32) * 32
    if _h == 0 or _w == 0:
        raise ValueError(f"image {h}x{w} is smaller than the /32 stride; "
                         "inputs must be at least 32x32")
    return _h, _w, h / _h, w / _w


def preprocess_image(x: jax.Array) -> Tuple[jax.Array, float, float]:
    """Resize a (B, H, W, C) batch so H, W are divisible by 32
    (reference xfeat.py:219-240). Static-shape: factors are Python floats."""
    h, w = x.shape[1], x.shape[2]
    _h, _w, rh, rw = preprocess_shape(h, w)
    if (_h, _w) != (h, w):
        x = resize_bilinear(x, (_h, _w))
    return x, rh, rw
