"""Parity tests for the fused Pallas stem kernel (experiments/stem.py).

Oracle: the XLA stem (models/backbone.py:173-177 — block1 + avgpool/1x1
skip), which is itself parity-tested against the torch reference in
tests/test_backbone.py. Interpret mode on CPU; the kernel's only
TPU-specific surface is Mosaic lowering, exercised on-chip.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from accelerated_features_tpu.models.backbone import input_norm
from accelerated_features_tpu.models.params import (fold_batchnorm,
                                                    init_xfeat_params)
from accelerated_features_tpu.experiments.stem import (stem_fused,
                                                      stem_reference)


@pytest.fixture(scope="module")
def folded_params():
    return fold_batchnorm(init_xfeat_params(jax.random.key(7)))


def _gray(b, h, w, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.uniform(0, 1, (b, h, w, 3)), jnp.float32)
    return input_norm(x)


@pytest.mark.parametrize("hw", [(64, 96), (96, 64), (160, 224)])
def test_stem_fused_parity_f32(folded_params, hw):
    xg = _gray(2, *hw)
    ref = stem_reference(folded_params, xg)
    out = stem_fused(folded_params, xg, interpret=True)
    assert out.shape == (2, hw[0] // 4, hw[1] // 4, 24)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_stem_fused_parity_bf16(folded_params):
    xg = _gray(2, 96, 128, seed=3).astype(jnp.bfloat16)
    ref = stem_reference(folded_params, xg).astype(jnp.float32)
    out = stem_fused(folded_params, xg, interpret=True).astype(jnp.float32)
    # both paths round activations to bf16 between layers but contract in
    # different groupings; bound the relative deviation on the f32 oracle
    f32 = stem_reference(folded_params, _gray(2, 96, 128, seed=3))
    scale = float(jnp.std(f32))
    err_k = float(jnp.max(jnp.abs(out - f32))) / scale
    err_x = float(jnp.max(jnp.abs(ref - f32))) / scale
    assert err_k < max(4 * err_x, 0.1), (err_k, err_x)


def test_stem_fused_min_size(folded_params):
    xg = _gray(1, 32, 32, seed=5)
    ref = stem_reference(folded_params, xg)
    out = stem_fused(folded_params, xg, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_stem_fused_requires_folded_bn():
    params = init_xfeat_params(jax.random.key(0))
    with pytest.raises(ValueError):
        stem_fused(params, _gray(1, 32, 32))


def test_xfeat_forward_explicit_fused_stem_raises_unfolded():
    """Explicit fused_stem=True with unfolded BN is a caller bug and must
    hard-fail rather than silently run the unfused stem (the env-var
    default may still fall back)."""
    from accelerated_features_tpu.models.backbone import xfeat_forward
    params = init_xfeat_params(jax.random.key(1))
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    with pytest.raises(ValueError):
        xfeat_forward(params, x, fused_stem=True)
    folded = fold_batchnorm(params)
    with pytest.raises(ValueError):
        xfeat_forward(folded, x, train=True, fused_stem=True)


def test_env_toggle_rebuilds_jit(monkeypatch):
    """XFEAT_FUSED_STEM is resolved at jit-construction time in the API:
    toggling it between calls must produce a different cached program (the
    old trace-time read silently reused the stale executable, so an A/B
    'measuring the fused kernel' would time the XLA stem)."""
    from accelerated_features_tpu.api import XFeat
    xf = XFeat(weights=None, top_k=16, detection_threshold=0.012)
    x = np.random.default_rng(0).uniform(0, 1, (32, 32, 3)).astype(np.float32)
    monkeypatch.delenv("XFEAT_FUSED_STEM", raising=False)
    out0 = xf.detectAndCompute(x)[0]
    monkeypatch.setenv("XFEAT_FUSED_STEM", "1")
    out1 = xf.detectAndCompute(x)[0]
    keys = [k for k in xf._jitted if k[0] == "dac"]
    assert len(keys) == 2 and {k[-1] for k in keys} == {False, True}
    # same keypoints either way (stem kernel is numerically equivalent)
    np.testing.assert_allclose(out0["keypoints"], out1["keypoints"])


def test_xfeat_forward_fused_stem_routing(folded_params):
    from accelerated_features_tpu.models.backbone import xfeat_forward
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.uniform(0, 1, (1, 64, 96, 3)), jnp.float32)
    ref = xfeat_forward(folded_params, x, fused_stem=False)
    out = xfeat_forward(folded_params, x, fused_stem=True)
    for a, b in zip(out, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-4)
