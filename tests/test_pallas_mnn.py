"""Fused Pallas MNN kernel vs the XLA reference path (interpret mode on the
CPU test mesh; the same kernel compiles to Mosaic on TPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from accelerated_features_tpu.ops.matching import mnn_match
from accelerated_features_tpu.ops.pallas.mnn import mnn_match_fused


@pytest.mark.parametrize("k1,k2", [(100, 80), (256, 512), (300, 300)])
def test_fused_matches_xla(k1, k2):
    rng = np.random.default_rng(0)
    d1 = rng.normal(size=(k1, 64)).astype(np.float32)
    d2 = rng.normal(size=(k2, 64)).astype(np.float32)
    d1 /= np.linalg.norm(d1, axis=1, keepdims=True)
    d2 /= np.linalg.norm(d2, axis=1, keepdims=True)

    idx_ref, mask_ref = jax.jit(
        lambda a, b: mnn_match(a, b, None, None, -1.0))(
            jnp.asarray(d1), jnp.asarray(d2))
    idx_f, mask_f = mnn_match_fused(jnp.asarray(d1), jnp.asarray(d2))

    np.testing.assert_array_equal(np.asarray(mask_f), np.asarray(mask_ref))
    m = np.asarray(mask_ref)
    np.testing.assert_array_equal(np.asarray(idx_f)[m],
                                  np.asarray(idx_ref)[m])


def test_fused_with_masks_and_gate():
    rng = np.random.default_rng(1)
    k = 128
    d1 = rng.normal(size=(k, 64)).astype(np.float32)
    d2 = rng.normal(size=(k, 64)).astype(np.float32)
    d1 /= np.linalg.norm(d1, axis=1, keepdims=True)
    d2 /= np.linalg.norm(d2, axis=1, keepdims=True)
    v1 = jnp.asarray(rng.uniform(size=k) > 0.3)
    v2 = jnp.asarray(rng.uniform(size=k) > 0.3)

    idx_ref, mask_ref = jax.jit(
        lambda a, b, x, y: mnn_match(a, b, x, y, 0.1))(
            jnp.asarray(d1), jnp.asarray(d2), v1, v2)
    idx_f, mask_f = mnn_match_fused(jnp.asarray(d1), jnp.asarray(d2),
                                    v1, v2, min_cossim=0.1)
    np.testing.assert_array_equal(np.asarray(mask_f), np.asarray(mask_ref))
    m = np.asarray(mask_ref)
    np.testing.assert_array_equal(np.asarray(idx_f)[m],
                                  np.asarray(idx_ref)[m])
