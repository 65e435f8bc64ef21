"""Halo-grouped conv (experiments/halo_conv.py) == direct conv, all stem configs."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from accelerated_features_tpu.models.backbone import conv2d
from accelerated_features_tpu.experiments.halo_conv import _pick_group, conv2d_halo


@pytest.mark.parametrize("C,Cout,stride,H,W", [
    (1, 4, 1, 32, 64),     # stem conv1
    (4, 8, 2, 32, 64),     # stem conv2
    (8, 8, 1, 16, 48),     # stem conv3
    (8, 24, 2, 16, 48),    # stem conv4
    (24, 24, 1, 16, 32),   # block2
    (3, 5, 1, 24, 40),     # odd channel counts
])
def test_halo_conv_parity(C, Cout, stride, H, W):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, H, W, C)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, C, Cout)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(Cout,)), jnp.float32)
    ref = jax.jit(lambda a, ww, bb: conv2d(a, ww, bb, stride))(x, w, b)
    got = jax.jit(lambda a, ww, bb: conv2d_halo(a, ww, bb, stride))(x, w, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_halo_conv_bf16_parity():
    """bf16 activations: same contraction values as the direct bf16 conv."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 32, 64, 4)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(3, 3, 4, 8)), jnp.float32)
    ref = jax.jit(lambda a, ww: conv2d(a, ww, None, 2))(x, w)
    got = jax.jit(lambda a, ww: conv2d_halo(a, ww, None, 2))(x, w)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32),
                               atol=3e-2, rtol=3e-2)


def test_pick_group_bounds():
    for (wo, c, cout, s) in [(320, 4, 8, 2), (640, 1, 4, 1), (80, 8, 24, 2),
                             (304, 8, 8, 1)]:
        g = _pick_group(wo, c, cout, s)
        assert wo % g == 0
        assert g * cout <= 128
        win = g + 2 if s == 1 else 2 * g + 1
        assert 3 * win * c <= 512
