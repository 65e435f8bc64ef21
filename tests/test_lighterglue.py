"""LighterGlue self-consistency tests (kornia is unavailable in this image,
and the published checkpoint is stripped from the mount, so the oracle here
is the architecture contract: masking/padding invariance, permutation
equivariance, rotary math, assignment normalization, state-dict import)."""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from accelerated_features_tpu.models.lighterglue import (
    DEFAULT_CONF, LighterGlue, apply_rotary, import_lighterglue_state_dict,
    init_lighterglue_params, lighterglue_forward, normalize_keypoints,
    rotary_encoding, sigmoid_log_double_softmax)


@pytest.fixture(scope="module")
def setup():
    params = init_lighterglue_params(jax.random.key(0))
    rng = np.random.default_rng(0)
    n0, n1 = 24, 20
    k0 = rng.uniform(0, [640, 480], (1, n0, 2)).astype(np.float32)
    k1 = rng.uniform(0, [640, 480], (1, n1, 2)).astype(np.float32)
    d0 = rng.normal(size=(1, n0, 64)).astype(np.float32)
    d1 = rng.normal(size=(1, n1, 64)).astype(np.float32)
    size = np.array([[640.0, 480.0]], np.float32)
    return params, k0, k1, d0, d1, size


def _run(params, k0, k1, d0, d1, size, m0=None, m1=None):
    return jax.jit(lambda *a: lighterglue_forward(*a))(
        params, jnp.asarray(k0), jnp.asarray(k1), jnp.asarray(d0),
        jnp.asarray(d1), jnp.asarray(size), jnp.asarray(size),
        None if m0 is None else jnp.asarray(m0),
        None if m1 is None else jnp.asarray(m1))


def test_shapes(setup):
    params, k0, k1, d0, d1, size = setup
    out = _run(params, k0, k1, d0, d1, size)
    assert out["log_assignment"].shape == (1, 25, 21)
    assert out["matches0"].shape == (1, 24)
    assert out["mscores0"].shape == (1, 24)


def test_log_assignment_normalized(setup):
    """exp of the (M,N) block row-sums must be <= 1 (it's a sub-probability
    assignment: softmax product x sigmoid certainties)."""
    params, k0, k1, d0, d1, size = setup
    la = np.asarray(_run(params, k0, k1, d0, d1, size)["log_assignment"])
    inner = np.exp(la[0, :-1, :-1])
    assert (inner.sum(axis=1) <= 1.0 + 1e-5).all()
    assert (inner.sum(axis=0) <= 1.0 + 1e-5).all()


def test_padding_invariance(setup):
    """Appending masked-out padding keypoints must not change results for
    real slots — the fixed-shape batching contract."""
    params, k0, k1, d0, d1, size = setup
    base = _run(params, k0, k1, d0, d1, size)

    pad = 8
    k0p = np.concatenate([k0, np.zeros((1, pad, 2), np.float32)], 1)
    d0p = np.concatenate([d0, np.zeros((1, pad, 64), np.float32)], 1)
    m0 = np.arange(k0p.shape[1])[None] < k0.shape[1]
    m1 = np.ones((1, k1.shape[1]), bool)
    padded = _run(params, k0p, k1, d0p, d1, size, m0, m1)

    np.testing.assert_allclose(
        np.asarray(padded["matches0"])[0, :k0.shape[1]],
        np.asarray(base["matches0"])[0], atol=0)
    np.testing.assert_allclose(
        np.asarray(padded["mscores0"])[0, :k0.shape[1]],
        np.asarray(base["mscores0"])[0], atol=1e-5)


def test_permutation_equivariance(setup):
    """Permuting image-1 keypoints permutes match targets accordingly."""
    params, k0, k1, d0, d1, size = setup
    base = _run(params, k0, k1, d0, d1, size)
    perm = np.random.default_rng(1).permutation(k1.shape[1])
    out = _run(params, k0, k1[:, perm], d0, d1[:, perm], size)

    m_base = np.asarray(base["matches0"])[0]
    m_perm = np.asarray(out["matches0"])[0]
    inv = np.empty_like(perm)
    inv[perm] = np.arange(len(perm))
    expect = np.where(m_base >= 0, inv[np.clip(m_base, 0, None)], -1)
    np.testing.assert_array_equal(m_perm, expect)


def test_rotary_math():
    """apply_rotary == explicit 2x2 rotation of coordinate pairs."""
    rng = np.random.default_rng(2)
    t = rng.normal(size=(1, 4, 8)).astype(np.float32)
    theta = rng.normal(size=(1, 4, 4)).astype(np.float32)
    cos = np.repeat(np.cos(theta), 2, axis=-1)
    sin = np.repeat(np.sin(theta), 2, axis=-1)
    got = np.asarray(apply_rotary(jnp.asarray(t), jnp.asarray(cos),
                                  jnp.asarray(sin)))
    expect = np.empty_like(t)
    for i in range(4):
        c, s = np.cos(theta[0, :, i]), np.sin(theta[0, :, i])
        x1, x2 = t[0, :, 2 * i], t[0, :, 2 * i + 1]
        expect[0, :, 2 * i] = x1 * c - x2 * s
        expect[0, :, 2 * i + 1] = x1 * s + x2 * c
    np.testing.assert_allclose(got, expect, atol=1e-6)


def test_normalize_keypoints():
    k = jnp.asarray([[[0.0, 0.0], [640.0, 480.0], [320.0, 240.0]]])
    size = jnp.asarray([[640.0, 480.0]])
    out = np.asarray(normalize_keypoints(k, size))
    np.testing.assert_allclose(out[0, 2], [0.0, 0.0])
    np.testing.assert_allclose(out[0, 0], [-1.0, -0.75])
    np.testing.assert_allclose(out[0, 1], [1.0, 0.75])


def test_state_dict_import_roundtrip():
    """A synthetic torch-layout state dict (kornia LightGlue key names with
    the reference's renames, lighterglue.py:40-48) imports and runs."""
    rng = np.random.default_rng(3)
    dim, n_layers = 96, 6
    sd = {}
    sd["input_proj.weight"] = rng.normal(size=(dim, 64)).astype(np.float32)
    sd["input_proj.bias"] = rng.normal(size=(dim,)).astype(np.float32)
    sd["posenc.Wr.weight"] = rng.normal(size=(dim // 2, 2)).astype(np.float32)
    for i in range(n_layers):
        # pre-rename layout (as stored in the published checkpoint)
        for blk, names in [
            (f"self_attn.{i}", [("Wqkv", (3 * dim, dim)),
                                ("out_proj", (dim, dim))]),
            (f"cross_attn.{i}", [("to_qk", (dim, dim)), ("to_v", (dim, dim)),
                                 ("to_out", (dim, dim))]),
        ]:
            for nm, shape in names:
                sd[f"{blk}.{nm}.weight"] = rng.normal(
                    size=shape).astype(np.float32)
                sd[f"{blk}.{nm}.bias"] = rng.normal(
                    size=(shape[0],)).astype(np.float32)
            sd[f"{blk}.ffn.0.weight"] = rng.normal(
                size=(2 * dim, 2 * dim)).astype(np.float32)
            sd[f"{blk}.ffn.0.bias"] = rng.normal(
                size=(2 * dim,)).astype(np.float32)
            sd[f"{blk}.ffn.1.weight"] = rng.normal(
                size=(2 * dim,)).astype(np.float32)
            sd[f"{blk}.ffn.1.bias"] = rng.normal(
                size=(2 * dim,)).astype(np.float32)
            sd[f"{blk}.ffn.3.weight"] = rng.normal(
                size=(dim, 2 * dim)).astype(np.float32)
            sd[f"{blk}.ffn.3.bias"] = rng.normal(
                size=(dim,)).astype(np.float32)
        sd[f"log_assignment.{i}.matchability.weight"] = rng.normal(
            size=(1, dim)).astype(np.float32)
        sd[f"log_assignment.{i}.matchability.bias"] = rng.normal(
            size=(1,)).astype(np.float32)
        sd[f"log_assignment.{i}.final_proj.weight"] = rng.normal(
            size=(dim, dim)).astype(np.float32)
        sd[f"log_assignment.{i}.final_proj.bias"] = rng.normal(
            size=(dim,)).astype(np.float32)
        sd[f"token_confidence.{i}.token.0.weight"] = rng.normal(
            size=(1, dim)).astype(np.float32)
        sd[f"token_confidence.{i}.token.0.bias"] = rng.normal(
            size=(1,)).astype(np.float32)

    params = import_lighterglue_state_dict(sd)
    assert len(params["layers"]) == n_layers
    np.testing.assert_allclose(np.asarray(params["posenc_wr"]),
                               sd["posenc.Wr.weight"].T)

    k = np.zeros((1, 8, 2), np.float32)
    d = np.zeros((1, 8, 64), np.float32)
    size = np.array([[64.0, 64.0]], np.float32)
    out = _run(params, k, k, d, d, size)
    assert np.isfinite(np.asarray(out["mscores0"])).all()


def test_match_wrapper(setup):
    params, k0, k1, d0, d1, size = setup
    lg = LighterGlue(weights=params)
    idx = lg.match(
        {"keypoints": k0[0], "descriptors": d0[0], "image_size": (640, 480)},
        {"keypoints": k1[0], "descriptors": d1[0], "image_size": (640, 480)},
        min_conf=0.0)
    assert idx.ndim == 2 and idx.shape[1] == 2
    assert (idx[:, 0] < k0.shape[1]).all() and (idx[:, 1] < k1.shape[1]).all()
    # mutual consistency: no duplicated targets
    assert len(np.unique(idx[:, 1])) == len(idx)


def test_lighterglue_loads_training_checkpoint_dir(tmp_path):
    """LighterGlue(weights=<ckpt dir>) resolves the latest training
    checkpoint and extracts the params subtree (train/lighterglue_run
    output loads directly into the inference engine)."""
    from accelerated_features_tpu.models.lighterglue import LighterGlue
    from accelerated_features_tpu.utils.checkpoint import _flatten

    params = init_lighterglue_params(jax.random.key(3))
    state = {"params": params, "opt_state": (np.int32(0),),
             "step": np.int64(5)}
    np.savez(str(tmp_path / "ckpt_00000005.npz"), **dict(_flatten(state)))

    lg = LighterGlue(weights=str(tmp_path))
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(lg.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_lg_train_state_orbax_resume_roundtrip(tmp_path):
    """Regression: the LG trainer's state dict must round-trip through the
    ORBAX checkpoint path via resume_or_init. The original init used a
    numpy SCALAR (np.int64) for `step`, which orbax's StandardCheckpointer
    rejects as a restore-target leaf ('Unsupported type') — resume of any
    saved LG run failed. The trainer now uses an int32 array like
    trainer.init_train_state."""
    import optax

    from accelerated_features_tpu.train.lighterglue_run import \
        init_lg_train_state
    from accelerated_features_tpu.utils.checkpoint import (resume_or_init,
                                                           save_checkpoint)

    params = init_lighterglue_params(jax.random.key(4))
    opt = optax.adam(1e-4)
    # the REAL state constructor lighterglue_run.main uses — so a
    # regression in its step dtype fails here, not only in a hand copy
    state = init_lg_train_state(params, opt)
    assert hasattr(state["step"], "dtype") and state["step"].ndim == 0
    saved = dict(state, step=state["step"] + 7)
    save_checkpoint(str(tmp_path), jax.device_get(saved), 7)

    fresh = init_lg_train_state(init_lighterglue_params(jax.random.key(5)),
                                opt)
    restored, resumed = resume_or_init(str(tmp_path), fresh)
    assert resumed
    assert int(restored["step"]) == 7
    for a, b in zip(jax.tree.leaves(restored["params"]),
                    jax.tree.leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_lg_batch_gt_from_warp(monkeypatch):
    """build_lg_batch derives correct GT assignments from the analytic
    warp: with a stubbed extractor that returns exact correspondences
    (kpts0 = view2_to_view1(kpts1)), every in-budget pair must be matched
    identity-wise and dustbin sets empty for matched points."""
    from accelerated_features_tpu.train import lighterglue_run as LR
    from accelerated_features_tpu.train.augmentation import (AugConfig,
                                                             make_pair,
                                                             view2_to_view1)
    import accelerated_features_tpu.ops.extraction as EX

    cfg = AugConfig(warp_resolution=(160, 128), out_resolution=(160, 128),
                    photometric=False)
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.uniform(0, 1, (1, 128, 160, 3)), jnp.float32)
    pair = make_pair(jax.random.key(1), imgs, cfg, 0.05, tps_prob=0.0)
    K = 64
    k1 = jnp.asarray(rng.uniform([20, 20], [140, 108], (1, K, 2)),
                     jnp.float32)
    ctrl, dst, wgt, aff = pair["tps2"]
    k0 = view2_to_view1(k1[0], pair["H1"][0], pair["H2"][0], cfg,
                        (ctrl[0], dst[0], wgt[0], aff[0]))[None]

    calls = []

    def stub(params, g, top_k, detection_threshold):
        kk = k0 if not calls else k1      # first call = view1
        calls.append(1)
        return {"keypoints": kk, "descriptors": jnp.zeros((1, K, 64)),
                "valid": jnp.ones((1, K), bool),
                "scores": jnp.ones((1, K))}

    monkeypatch.setattr(EX, "detect_and_compute", stub)
    b = LR.build_lg_batch({}, pair, cfg, top_k=K, detection_threshold=0.05)
    gi = np.asarray(b["gt_idx0"][0])
    gj = np.asarray(b["gt_idx1"][0])
    gv = np.asarray(b["gt_valid"][0])
    # mapped points within bounds (margin > match_px) must all match i==j
    inb = np.asarray((k0[0, :, 0] >= 4) & (k0[0, :, 0] < 156) &
                     (k0[0, :, 1] >= 4) & (k0[0, :, 1] < 124))
    assert gv.sum() >= inb.sum()
    assert (gi[gv] == gj[gv]).all()
    # matched keypoints are not dustbin-supervised
    um0 = np.asarray(b["unmatched0"][0])
    assert not um0[gi[gv]].any()


def test_lighterglue_loss_trains():
    """A few Adam steps on a toy matching problem reduce the loss and raise
    match accuracy (the matcher is trainable end-to-end)."""
    import optax
    from accelerated_features_tpu.train.lighterglue_loss import (
        lighterglue_loss)

    rng = np.random.default_rng(0)
    M, S = 32, 24
    # distinctive descriptors, identical in both images for the matched set
    base = rng.normal(size=(M, 64)).astype(np.float32)
    perm = rng.permutation(M)
    batch = {
        "kpts0": jnp.asarray(rng.uniform(0, [640, 480], (1, M, 2)),
                             jnp.float32),
        "kpts1": jnp.asarray(rng.uniform(0, [640, 480], (1, M, 2)),
                             jnp.float32),
        "descs0": jnp.asarray(base)[None],
        "descs1": jnp.asarray(base[perm])[None],
        "size0": jnp.asarray([[640.0, 480.0]]),
        "size1": jnp.asarray([[640.0, 480.0]]),
        # gt pairs: descs1[j] == base[perm[j]] so match i=perm[j] <-> j
        "gt_idx0": jnp.asarray(perm[None, :S], jnp.int32),
        "gt_idx1": jnp.asarray(np.arange(S)[None], jnp.int32),
        "gt_valid": jnp.ones((1, S), bool),
    }

    params = init_lighterglue_params(jax.random.key(0))
    opt = optax.adam(1e-4)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        (loss, metrics), grads = jax.value_and_grad(
            lambda p: lighterglue_loss(p, batch), has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss, metrics

    losses = []
    for _ in range(12):
        params, opt_state, loss, metrics = step(params, opt_state)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses
    assert np.isfinite(losses[-1])
