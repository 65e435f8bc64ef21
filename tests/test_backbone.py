"""Backbone numerical parity vs the reference PyTorch model (oracle only —
the reference at /root/reference is imported read-only to generate golden
outputs from random weights; no reference code lives in this repo)."""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from accelerated_features_tpu.models import (
    count_params, export_torch_state_dict, fine_matcher_forward,
    fold_batchnorm, import_torch_state_dict, init_xfeat_params, xfeat_forward)

REF = "/root/reference"


def _make_ref_model(seed=0):
    torch = pytest.importorskip("torch")
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from modules.model import XFeatModel  # reference oracle
    torch.manual_seed(seed)
    model = XFeatModel()
    # randomize BN running stats so the import path is actually exercised
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, (torch.nn.BatchNorm2d, torch.nn.BatchNorm1d)):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.5, 1.5)
    model.eval()
    return torch, model


@pytest.fixture(scope="module")
def ref_pair():
    torch, model = _make_ref_model()
    params = import_torch_state_dict(model.state_dict())
    return torch, model, params


def test_param_count(ref_pair):
    torch, model, params = ref_pair
    n_torch = sum(p.numel() for p in model.state_dict().values()
                  if p.dim() > 0 and "num_batches" not in str(p.dtype))
    # our count includes running stats, torch state_dict too (minus trackers)
    n_torch = sum(v.numel() for k, v in model.state_dict().items()
                  if "num_batches_tracked" not in k)
    assert count_params(params) == n_torch


def test_forward_parity(ref_pair):
    torch, model, params = ref_pair
    rng = np.random.default_rng(1)
    x = rng.uniform(0, 1, size=(2, 96, 128, 3)).astype(np.float32)

    with torch.no_grad():
        tf, tk, th = model(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    jf, jk, jh = jax.jit(xfeat_forward)(params, jnp.asarray(x))

    np.testing.assert_allclose(np.asarray(jf), tf.numpy().transpose(0, 2, 3, 1),
                               atol=1e-3, rtol=0)
    np.testing.assert_allclose(np.asarray(jk), tk.numpy().transpose(0, 2, 3, 1),
                               atol=1e-3, rtol=0)
    np.testing.assert_allclose(np.asarray(jh), th.numpy().transpose(0, 2, 3, 1),
                               atol=1e-3, rtol=0)


def test_forward_parity_folded(ref_pair):
    """BN folding must be output-invariant."""
    torch, model, params = ref_pair
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.uniform(0, 1, size=(1, 64, 96, 1)).astype(np.float32))
    ref = jax.jit(xfeat_forward)(params, x)
    folded = jax.jit(xfeat_forward)(fold_batchnorm(params), x)
    for a, b in zip(ref, folded):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-3, rtol=0)


def test_fine_matcher_parity(ref_pair):
    torch, model, params = ref_pair
    rng = np.random.default_rng(3)
    x = rng.normal(size=(50, 128)).astype(np.float32)
    with torch.no_grad():
        t_out = model.fine_matcher(torch.from_numpy(x)).numpy()
    fm = jax.jit(fine_matcher_forward)
    j_out = np.asarray(fm(params, jnp.asarray(x)))
    np.testing.assert_allclose(j_out, t_out, atol=1e-3, rtol=0)
    # folded path parity too
    j_fold = np.asarray(fm(fold_batchnorm(params), jnp.asarray(x)))
    np.testing.assert_allclose(j_fold, t_out, atol=1e-3, rtol=0)


def test_export_roundtrip(ref_pair):
    torch, model, params = ref_pair
    sd = export_torch_state_dict(params)
    params2 = import_torch_state_dict(sd)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_train_mode_shapes():
    params = init_xfeat_params(jax.random.key(0))
    x = jnp.zeros((2, 64, 64, 1))
    feats, logits, heat, stats = jax.jit(
        lambda p, x: xfeat_forward(p, x, train=True))(params, x)
    assert feats.shape == (2, 8, 8, 64)
    assert logits.shape == (2, 8, 8, 65)
    assert heat.shape == (2, 8, 8, 1)
    assert len(stats["block1"]) == 4


def test_bfloat16_close():
    params = init_xfeat_params(jax.random.key(0))
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32))
    f32 = jax.jit(xfeat_forward)(params, x)
    bf16 = jax.jit(lambda p, x: xfeat_forward(
        p, x, compute_dtype=jnp.bfloat16))(params, x)
    # loose: bf16 is the throughput path, not the parity path
    err = np.abs(np.asarray(bf16[0], np.float32) - np.asarray(f32[0]))
    assert float(np.mean(err)) < 0.05
