"""Loss parity vs the reference training losses (oracle import with the
ALIKE teacher stubbed out — its submodule is not vendored in the mount)."""

import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from accelerated_features_tpu.train.losses import (
    coordinate_classification_loss, distill_labels_from_kpts, distill_loss,
    dual_softmax_loss, keypoint_reliability_loss)

torch = pytest.importorskip("torch")

REF = "/root/reference"
if REF not in sys.path:
    sys.path.insert(0, REF)


@pytest.fixture(scope="module")
def ref_losses():
    # stub the teacher wrapper (third_party/ALIKE submodule is not vendored)
    stub = types.ModuleType("third_party.alike_wrapper")
    stub.extract_alike_kpts = lambda img: np.zeros((0, 2), np.float32)
    sys.modules.setdefault("third_party.alike_wrapper", stub)
    # stub kornia (+ matplotlib if absent) so the reference loss module's
    # transitive imports resolve; the oracles under test don't touch them
    if "kornia" not in sys.modules:
        k = types.ModuleType("kornia")
        ku = types.ModuleType("kornia.utils")

        def create_meshgrid(h, w, normalized=True, device=None):
            ys, xs = torch.meshgrid(torch.arange(h), torch.arange(w),
                                    indexing="ij")
            return torch.stack([xs, ys], -1).float()[None]

        ku.create_meshgrid = create_meshgrid
        k.utils = ku
        sys.modules["kornia"] = k
        sys.modules["kornia.utils"] = ku
    try:
        import matplotlib  # noqa: F401
    except ImportError:
        sys.modules["matplotlib"] = types.ModuleType("matplotlib")
        sys.modules["matplotlib.pyplot"] = types.ModuleType(
            "matplotlib.pyplot")
    import importlib
    mod = importlib.import_module("modules.training.losses")
    return mod


def test_dual_softmax_loss_parity(ref_losses):
    rng = np.random.default_rng(0)
    m1 = rng.normal(size=(64, 16)).astype(np.float32)
    m2 = (m1 + 0.3 * rng.normal(size=(64, 16))).astype(np.float32)

    tl, tconf = ref_losses.dual_softmax_loss(torch.from_numpy(m1),
                                             torch.from_numpy(m2))
    valid = jnp.ones((64,), bool)
    jl, jconf = jax.jit(dual_softmax_loss)(jnp.asarray(m1), jnp.asarray(m2),
                                           valid)
    np.testing.assert_allclose(float(jl), float(tl), atol=1e-4)
    np.testing.assert_allclose(np.asarray(jconf), tconf.numpy(), atol=1e-5)


def test_dual_softmax_loss_masking():
    """Masked padded version == compact version on the valid prefix."""
    rng = np.random.default_rng(1)
    m1 = rng.normal(size=(40, 16)).astype(np.float32)
    m2 = (m1 + 0.3 * rng.normal(size=(40, 16))).astype(np.float32)

    lc, cc = jax.jit(dual_softmax_loss)(jnp.asarray(m1), jnp.asarray(m2),
                                        jnp.ones((40,), bool))
    pad = np.zeros((24, 16), np.float32)
    m1p = np.concatenate([m1, pad])
    m2p = np.concatenate([m2, pad])
    valid = jnp.arange(64) < 40
    lp, cp = jax.jit(dual_softmax_loss)(jnp.asarray(m1p), jnp.asarray(m2p),
                                        valid)
    np.testing.assert_allclose(float(lp), float(lc), atol=1e-5)
    np.testing.assert_allclose(np.asarray(cp)[:40], np.asarray(cc), atol=1e-6)
    assert (np.asarray(cp)[40:] == 0).all()


def test_coordinate_classification_loss_parity(ref_losses):
    rng = np.random.default_rng(2)
    n = 50
    coords = rng.normal(size=(n, 64)).astype(np.float32)
    pts1 = rng.uniform(0, 60, size=(n, 2)).astype(np.float32)
    conf = rng.uniform(0.05, 1.0, size=(n,)).astype(np.float32)

    tl, tacc = ref_losses.coordinate_classification_loss(
        torch.from_numpy(coords), torch.from_numpy(pts1),
        torch.from_numpy(pts1), torch.from_numpy(conf))
    jl, jacc = jax.jit(coordinate_classification_loss)(
        jnp.asarray(coords), jnp.asarray(pts1), jnp.asarray(conf),
        jnp.ones((n,), bool))
    np.testing.assert_allclose(float(jl), float(tl), atol=1e-4)
    np.testing.assert_allclose(float(jacc), float(tacc), atol=1e-5)


def test_keypoint_loss_parity(ref_losses):
    rng = np.random.default_rng(3)
    n = 64
    h1 = rng.uniform(0, 1, size=(n,)).astype(np.float32)
    h2 = rng.uniform(0, 1, size=(n,)).astype(np.float32)
    conf = rng.uniform(0, 1, size=(n,)).astype(np.float32)

    tl = (ref_losses.keypoint_loss(torch.from_numpy(h1), torch.from_numpy(conf))
          + ref_losses.keypoint_loss(torch.from_numpy(h2),
                                     torch.from_numpy(conf)))
    jl = jax.jit(keypoint_reliability_loss)(
        jnp.asarray(h1), jnp.asarray(h2), jnp.asarray(conf),
        jnp.ones((n,), bool))
    np.testing.assert_allclose(float(jl), float(tl), atol=1e-5)


def test_distill_labels(ref_losses):
    """Label construction parity with alike_distill_loss's label block
    (losses.py:80-85)."""
    rng = np.random.default_rng(4)
    h = w = 8
    kpts = rng.uniform(0, 63.9, size=(10, 2)).astype(np.float32)

    labels_t = torch.ones((h, w), dtype=torch.long) * 64
    ak = torch.from_numpy(kpts)
    offsets = (((ak / 8) - (ak / 8).long()) * 8).long()
    offsets = offsets[:, 0] + 8 * offsets[:, 1]
    labels_t[(ak[:, 1] / 8).long(), (ak[:, 0] / 8).long()] = offsets

    ours = np.asarray(jax.jit(
        lambda k, v: distill_labels_from_kpts(k, v, h, w))(
            jnp.asarray(kpts), jnp.ones((10,), bool)))
    np.testing.assert_array_equal(ours, labels_t.numpy())


def test_distill_loss_runs():
    rng = np.random.default_rng(5)
    h = w = 8
    logits = jnp.asarray(rng.normal(size=(h, w, 65)), jnp.float32)
    kpts = jnp.asarray(rng.uniform(0, 63, size=(20, 2)), jnp.float32)
    labels = distill_labels_from_kpts(kpts, jnp.ones((20,), bool), h, w)
    loss, acc = jax.jit(distill_loss)(logits, labels, jax.random.key(0))
    assert np.isfinite(float(loss))
    assert 0.0 <= float(acc) <= 1.0


def test_train_step_descends():
    """A few steps on a fixed synthetic batch reduce the loss."""
    from accelerated_features_tpu.models.params import init_xfeat_params
    from accelerated_features_tpu.train.trainer import (
        TrainConfig, init_train_state, train_step)

    cfg = TrainConfig(use_distill=False, lr=2e-3)
    params = init_xfeat_params(jax.random.key(0))
    state = init_train_state(params, cfg)

    rng = np.random.default_rng(0)
    B, H, W, M = 2, 64, 64, 32
    batch = {
        "image0": jnp.asarray(rng.uniform(0, 1, (B, H, W, 1)), jnp.float32),
        "image1": jnp.asarray(rng.uniform(0, 1, (B, H, W, 1)), jnp.float32),
        "corrs": jnp.asarray(rng.integers(0, H // 8, (B, M, 4)), jnp.float32),
        "corr_valid": jnp.ones((B, M), bool),
    }
    step = jax.jit(lambda s, b, r: train_step(s, b, r, cfg))
    losses = []
    for i in range(8):
        state, metrics = step(state, batch, jax.random.key(i))
        losses.append(float(metrics["loss_total"]))
    assert losses[-1] < losses[0], losses
    assert int(state["step"]) == 8


def test_check_accuracy_parity(ref_losses):
    """vs reference check_accuracy (training/utils.py:177-194)."""
    import importlib
    ref_utils = importlib.import_module("modules.training.utils")
    from accelerated_features_tpu.train.utils import check_accuracy
    rng = np.random.default_rng(8)
    m1 = rng.normal(size=(40, 16)).astype(np.float32)
    m2 = (m1 + 0.5 * rng.normal(size=(40, 16))).astype(np.float32)
    ref = ref_utils.check_accuracy(torch.from_numpy(m1), torch.from_numpy(m2))
    ours = float(jax.jit(check_accuracy)(jnp.asarray(m1), jnp.asarray(m2)))
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_crop_patches_parity(ref_losses):
    """vs reference crop_patches (training/utils.py:136-160)."""
    import importlib
    ref_utils = importlib.import_module("modules.training.utils")
    from accelerated_features_tpu.train.utils import crop_patches
    rng = np.random.default_rng(9)
    maps = rng.normal(size=(20, 24, 3)).astype(np.float32)
    coords = rng.integers(3, 17, size=(10, 2)).astype(np.int64)

    t = torch.from_numpy(maps.transpose(2, 0, 1))[None]
    ref = ref_utils.crop_patches(t, torch.from_numpy(coords), size=7)
    # reference returns [B, C, N, s, s]; note it offsets by +halfsize due to
    # padding, i.e. patches centered at coords
    ref = ref[0].permute(1, 2, 3, 0).numpy()  # (N, s, s, C)

    ours = np.asarray(jax.jit(lambda m, c: crop_patches(m, c, 7))(
        jnp.asarray(maps), jnp.asarray(coords)))
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_teacher_labels(tmp_path):
    from accelerated_features_tpu.train.utils import (PrecomputedTeacher,
                                                      save_teacher_keypoints)
    rng = np.random.default_rng(10)
    kpts = rng.uniform(0, 63, (30, 2)).astype(np.float32)
    save_teacher_keypoints(str(tmp_path / "t.npz"), {"img0": kpts})
    teacher = PrecomputedTeacher(str(tmp_path / "t.npz"))
    labels = np.asarray(teacher.labels("img0", (8, 8)))
    assert labels.shape == (8, 8)
    assert (labels <= 64).all() and (labels >= 0).all()
    assert (labels < 64).sum() >= 1


def test_checkpoint_params_to_inference(tmp_path):
    """Training checkpoint -> inference engine interop."""
    from accelerated_features_tpu.models.params import init_xfeat_params
    from accelerated_features_tpu.train.trainer import (TrainConfig,
                                                        init_train_state)
    from accelerated_features_tpu.utils import (load_params_from_checkpoint,
                                                save_checkpoint)
    from accelerated_features_tpu.api import XFeat

    state = init_train_state(init_xfeat_params(jax.random.key(3)),
                             TrainConfig())
    save_checkpoint(str(tmp_path), state, 7)
    params = load_params_from_checkpoint(str(tmp_path))
    for a, b in zip(jax.tree.leaves(params),
                    jax.tree.leaves(state["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    xf = XFeat(weights=params, top_k=32, detection_threshold=0.012)
    res = xf.detectAndCompute(np.random.default_rng(0).uniform(
        0, 1, (64, 64, 3)).astype(np.float32))
    assert len(res) == 1


def test_smooth_l1_loss_parity(ref_losses):
    from accelerated_features_tpu.train.losses import smooth_l1_loss
    rng = np.random.default_rng(5)
    x = rng.normal(size=(37, 2)).astype(np.float32) * 4
    t = rng.normal(size=(37, 2)).astype(np.float32) * 4
    ref = float(ref_losses.smooth_l1_loss(torch.from_numpy(x),
                                          torch.from_numpy(t)))
    ours = float(jax.jit(smooth_l1_loss)(jnp.asarray(x), jnp.asarray(t)))
    np.testing.assert_allclose(ours, ref, rtol=1e-5)
    # masked version == compact version
    pad = np.zeros((11, 2), np.float32)
    v = np.arange(48) < 37
    ours_m = float(jax.jit(smooth_l1_loss)(
        jnp.asarray(np.concatenate([x, pad])),
        jnp.asarray(np.concatenate([t, pad + 7])), 2.0,
        jnp.asarray(v)))
    np.testing.assert_allclose(ours_m, ref, rtol=1e-5)


def test_keypoint_position_loss_parity(ref_losses):
    """Teacher-free keypoint supervision == reference losses.py:111-168."""
    from accelerated_features_tpu.train.losses import keypoint_position_loss
    rng = np.random.default_rng(6)
    h, w, C = 8, 10, 65
    H, W = h * 8, w * 8
    logits1 = rng.normal(size=(h, w, C)).astype(np.float32)
    logits2 = rng.normal(size=(h, w, C)).astype(np.float32)
    # the reference formula indexes the hashmap out of bounds when a
    # last-row cell's argmax is the dustbin (off//8 == 8) -> keep the
    # oracle runnable by suppressing the dustbin in the last row
    logits1[-1, :, 64] -= 100.0

    m = 40
    # one correspondence per unique view-1 cell, placed AT the cell's argmax
    # position (the loss only supervises cells whose argmax hits a stored
    # correspondence; random placement would give zero hits -> reference
    # returns nan on the empty mean)
    cells = rng.choice(h * w, size=m, replace=False)
    cy, cx = cells // w, cells % w
    bins = rng.integers(0, 64, m)
    logits1[cy, cx, :] -= 5.0
    logits1[cy, cx, bins] += 20.0
    pts1 = np.stack([cx * 8 + bins % 8, cy * 8 + bins // 8],
                    -1).astype(np.float32)
    pts2 = np.stack([rng.integers(0, W, m),
                     rng.integers(0, H, m)], -1).astype(np.float32)

    tl, tacc = ref_losses.keypoint_position_loss(
        torch.from_numpy(logits1.transpose(2, 0, 1)),
        torch.from_numpy(logits2.transpose(2, 0, 1)),
        torch.from_numpy(pts1), torch.from_numpy(pts2))

    valid = jnp.ones((m,), bool)
    jl, jacc = jax.jit(keypoint_position_loss)(
        jnp.asarray(logits1), jnp.asarray(logits2),
        jnp.asarray(pts1), jnp.asarray(pts2), valid)
    np.testing.assert_allclose(float(jl), float(tl), rtol=1e-4)
    np.testing.assert_allclose(float(jacc), float(tacc), atol=1e-6)

    # masked padded rows change nothing
    padn = 30
    jl2, jacc2 = jax.jit(keypoint_position_loss)(
        jnp.asarray(logits1), jnp.asarray(logits2),
        jnp.asarray(np.concatenate([pts1, np.zeros((padn, 2), np.float32)])),
        jnp.asarray(np.concatenate([pts2, np.zeros((padn, 2), np.float32)])),
        jnp.asarray(np.arange(m + padn) < m))
    np.testing.assert_allclose(float(jl2), float(tl), rtol=1e-4)


def test_fine_loss_parity(ref_losses, monkeypatch):
    """Patch sub-pixel regression loss == reference losses.py:35-71 (same
    identity fine module, pinned random offsets)."""
    from accelerated_features_tpu.train.losses import fine_loss
    rng = np.random.default_rng(7)
    Hf, Wf, C = 24, 30, 16
    n, ws = 12, 7
    f1 = rng.normal(size=(Hf, Wf, C)).astype(np.float32)
    f2 = rng.normal(size=(Hf, Wf, C)).astype(np.float32)
    pts1 = np.stack([rng.uniform(4, Wf - 5, n),
                     rng.uniform(4, Hf - 5, n)], -1).astype(np.float32)
    pts2 = np.stack([rng.uniform(4, Wf - 5, n),
                     rng.uniform(4, Hf - 5, n)], -1).astype(np.float32)
    offs = rng.uniform(-2.5, 2.5, (n, 2)).astype(np.float32)

    monkeypatch.setattr(
        torch, "rand",
        lambda *a, **k: torch.from_numpy((3.0 - offs) / 6.0))
    identity = lambda p1, p2: (p1, p2)
    tref = float(ref_losses.fine_loss(
        torch.from_numpy(f1.transpose(2, 0, 1)),
        torch.from_numpy(f2.transpose(2, 0, 1)),
        torch.from_numpy(pts1), torch.from_numpy(pts2), identity, ws=ws))

    ours = float(jax.jit(
        lambda a, b, p, q, o: fine_loss(a, b, p, q, identity,
                                        jax.random.key(0), offsets=o))(
        jnp.asarray(f1), jnp.asarray(f2), jnp.asarray(pts1),
        jnp.asarray(pts2), jnp.asarray(offs)))
    np.testing.assert_allclose(ours, tref, rtol=1e-4)


def test_train_step_kp_position_descends():
    """Teacher-free mode (use_kp_position + corrs_full): the keypoint head
    gets a live loss and the total still descends (VERDICT r1 #5)."""
    from accelerated_features_tpu.models.params import init_xfeat_params
    from accelerated_features_tpu.train.trainer import (
        TrainConfig, init_train_state, train_step)

    cfg = TrainConfig(use_distill=False, use_kp_position=True, lr=2e-3)
    params = init_xfeat_params(jax.random.key(1))
    state = init_train_state(params, cfg)

    rng = np.random.default_rng(1)
    B, H, W, M = 2, 64, 64, 32
    # dense full-res set (one per pixel of a cell -> high hashmap hit rate,
    # as the real batchers provide one jittered point per /8 cell)
    Mf = 1024
    batch = {
        "image0": jnp.asarray(rng.uniform(0, 1, (B, H, W, 1)), jnp.float32),
        "image1": jnp.asarray(rng.uniform(0, 1, (B, H, W, 1)), jnp.float32),
        "corrs": jnp.asarray(rng.integers(0, H // 8, (B, M, 4)), jnp.float32),
        "corr_valid": jnp.ones((B, M), bool),
        "corrs_full": jnp.asarray(rng.uniform(0, H - 1, (B, Mf, 4)),
                                  jnp.float32),
        "corr_full_valid": jnp.ones((B, Mf), bool),
    }
    step = jax.jit(lambda s, b, r: train_step(s, b, r, cfg))
    losses, kp = [], []
    for i in range(8):
        state, metrics = step(state, batch, jax.random.key(i))
        losses.append(float(metrics["loss_total"]))
        kp.append(float(metrics["loss_distill"]))
    assert losses[-1] < losses[0], losses
    assert kp[0] > 0.0  # the keypoint head is actually supervised
    assert kp[-1] < kp[0], kp


def test_pair_correspondences_full_offsets_nondegenerate():
    """Full-res jittered GT: both sides must carry sub-cell offsets — a
    grid-aligned side silently turns keypoint_position_loss into 'always
    predict bin 0' (label side) or 'only bin-0 argmaxes supervise' (hash
    side)."""
    from accelerated_features_tpu.train.augmentation import (
        AugConfig, make_pair, pair_correspondences_full)
    rng = np.random.default_rng(2)
    cfg = AugConfig(warp_resolution=(128, 96), out_resolution=(128, 96))
    images = jnp.asarray(rng.uniform(0, 1, (2, 96, 128, 3)), jnp.float32)
    pair = make_pair(jax.random.key(0), images, cfg, 0.1, tps_prob=1.0)
    cf, mask = jax.jit(lambda p, k: pair_correspondences_full(p, cfg, k))(
        pair, jax.random.key(3))
    cf, mask = np.asarray(cf), np.asarray(mask)
    assert mask.any()
    v = cf[mask]
    for col in range(4):
        offs = np.floor(v[:, col]).astype(int) % 8
        assert len(np.unique(offs)) >= 6, f"column {col} offsets degenerate"
    # pairs are warp-consistent: view2->view1 of the target equals source
    from accelerated_features_tpu.train.augmentation import view2_to_view1
    b = 0
    m0 = mask[0]
    src = jax.jit(lambda t, p: view2_to_view1(
        t, p["H1"][b], p["H2"][b], cfg,
        tuple(x[b] for x in p["tps2"])))(jnp.asarray(cf[0][:, 2:]), pair)
    np.testing.assert_allclose(np.asarray(src)[m0], cf[0][m0][:, :2],
                               atol=1e-3)


def test_spvs_full_offsets_nondegenerate():
    """MegaDepth full-res jittered GT (spvs_full): sub-cell offsets on both
    sides + mutual-warp consistency on a synthetic fronto-parallel scene."""
    from accelerated_features_tpu.train.warp import spvs_full
    B, H, W = 1, 64, 80
    depth = np.full((B, H, W), 2.0, np.float32)
    K = np.asarray([[[100.0, 0, 40], [0, 100.0, 32], [0, 0, 1]]], np.float32)
    T01 = np.tile(np.eye(4, dtype=np.float32), (B, 1, 1))
    T01[:, 0, 3] = 0.37  # pure x-translation -> 18.5 px disparity
    T10 = np.linalg.inv(T01)
    data = {
        "image0": jnp.zeros((B, H, W, 1)), "image1": jnp.zeros((B, H, W, 1)),
        "depth0": jnp.asarray(depth), "depth1": jnp.asarray(depth),
        "T_0to1": jnp.asarray(T01), "T_1to0": jnp.asarray(T10),
        "K0": jnp.asarray(K), "K1": jnp.asarray(K),
    }
    cf, mask = jax.jit(lambda d, k: spvs_full(d, k))(data, jax.random.key(0))
    cf, mask = np.asarray(cf), np.asarray(mask)
    assert mask.sum() > 20
    v = cf[mask]
    # cam1 = cam0 + t (t_x > 0) => x1 = x0 + 18.5 px => x0 = x1 - 18.5
    np.testing.assert_allclose(v[:, 0] - v[:, 2], -18.5, atol=0.2)
    np.testing.assert_allclose(v[:, 1], v[:, 3], atol=0.2)
    offs = np.floor(v[:, 2]).astype(int) % 8
    assert len(np.unique(offs)) >= 6
