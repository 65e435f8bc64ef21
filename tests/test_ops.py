"""Op-level parity: sparse sampling vs torch.grid_sample, resize vs
torch.F.interpolate, heatmap decode / NMS / score map vs the reference's
formulation. torch is only an oracle."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from accelerated_features_tpu.ops import (heatmap_decode,
                                          interpolate_sparse2d,
                                          local_max_mask, resize_bilinear,
                                          resize_nearest_torch, score_map,
                                          subpix_softmax2d, topk_keypoints)

torch = pytest.importorskip("torch")
F = torch.nn.functional


def _torch_sparse_sample(maps_nhwc, pos, H, W, mode):
    """Reference InterpolateSparse2d semantics (interpolator.py:10-33)."""
    x = torch.from_numpy(np.ascontiguousarray(maps_nhwc.transpose(0, 3, 1, 2)))
    p = torch.from_numpy(pos)
    grid = 2.0 * (p / torch.tensor([W - 1, H - 1], dtype=p.dtype)) - 1.0
    out = F.grid_sample(x, grid.unsqueeze(-2), mode=mode, align_corners=False)
    return out.permute(0, 2, 3, 1).squeeze(-2).numpy()


@pytest.mark.parametrize("mode", ["nearest", "bilinear", "bicubic"])
def test_sparse_sample_parity(mode):
    rng = np.random.default_rng(0)
    B, h, w, C = 2, 12, 16, 5
    H, W = 96, 128
    maps = rng.normal(size=(B, h, w, C)).astype(np.float32)
    # positions spanning in-bounds, borders, and out-of-bounds
    pos = np.concatenate([
        rng.uniform(0, [W - 1, H - 1], size=(B, 40, 2)),
        np.tile(np.array([[0.0, 0.0], [W - 1, H - 1], [W - 1, 0], [17.0, 0.0],
                          [W + 5.0, 10.0], [-3.0, 4.0]], np.float32),
                (B, 1, 1)),
        rng.integers(0, [W, H], size=(B, 20, 2)).astype(np.float64),
    ], axis=1).astype(np.float32)

    ours = np.asarray(jax.jit(
        lambda m, p: interpolate_sparse2d(m, p, H, W, mode))(
            jnp.asarray(maps), jnp.asarray(pos)))
    ref = _torch_sparse_sample(maps, pos, H, W, mode)
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-4)


def test_resize_bilinear_parity():
    rng = np.random.default_rng(1)
    for (h, w), (oh, ow) in [((100, 90), (96, 64)), ((30, 40), (39, 52)),
                             ((64, 64), (128, 128))]:
        x = rng.normal(size=(2, h, w, 3)).astype(np.float32)
        ours = np.asarray(jax.jit(
            lambda a: resize_bilinear(a, (oh, ow)))(jnp.asarray(x)))
        ref = F.interpolate(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                            (oh, ow), mode="bilinear",
                            align_corners=False).numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(ours, ref, atol=5e-5, rtol=1e-5)


def test_resize_nearest_parity():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(1, 50, 70, 2)).astype(np.float32)
    ours = np.asarray(jax.jit(
        lambda a: resize_nearest_torch(a, (30, 44)))(jnp.asarray(x)))
    ref = F.interpolate(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                        (30, 44), mode="nearest").numpy().transpose(0, 2, 3, 1)
    np.testing.assert_array_equal(ours, ref)


def test_heatmap_decode_parity():
    """vs reference get_kpts_heatmap (xfeat.py:242-247)."""
    rng = np.random.default_rng(3)
    B, h, w = 2, 6, 8
    logits = rng.normal(size=(B, h, w, 65)).astype(np.float32)

    t = torch.from_numpy(logits.transpose(0, 3, 1, 2))
    scores = F.softmax(t, 1)[:, :64]
    hm = scores.permute(0, 2, 3, 1).reshape(B, h, w, 8, 8)
    hm = hm.permute(0, 1, 3, 2, 4).reshape(B, 1, h * 8, w * 8).numpy()

    ours = np.asarray(jax.jit(heatmap_decode)(jnp.asarray(logits)))
    np.testing.assert_allclose(ours, hm[:, 0], atol=1e-6, rtol=1e-5)


def test_local_max_mask_parity():
    """vs reference NMS local-max test (xfeat.py:249-253)."""
    rng = np.random.default_rng(4)
    x = rng.uniform(0, 1, size=(2, 32, 48)).astype(np.float32)
    t = torch.from_numpy(x)[:, None]
    lmax = torch.nn.MaxPool2d(5, stride=1, padding=2)(t)
    ref = ((t == lmax) & (t > 0.05))[:, 0].numpy()
    ours = np.asarray(jax.jit(local_max_mask)(jnp.asarray(x)))
    np.testing.assert_array_equal(ours, ref)


def test_score_map_matches_sparse_reference():
    """Dense score map == reference's sparse score computation
    (xfeat.py:74-80) evaluated at every local-max pixel."""
    rng = np.random.default_rng(5)
    B, H, W = 1, 64, 96
    kheat = rng.uniform(0, 1, size=(B, H, W)).astype(np.float32)
    rel = rng.uniform(0, 1, size=(B, H // 8, W // 8)).astype(np.float32)

    dense = np.asarray(jax.jit(score_map)(jnp.asarray(kheat),
                                          jnp.asarray(rel)))

    mask = np.asarray(jax.jit(local_max_mask)(jnp.asarray(kheat)))
    ys, xs = np.nonzero(mask[0])
    pos = np.stack([xs, ys], -1).astype(np.float32)[None]
    near = _torch_sparse_sample(kheat[..., None], pos, H, W, "nearest")
    bil = _torch_sparse_sample(rel[..., None], pos, H, W, "bilinear")
    ref_scores = (near * bil)[0, :, 0]

    got = dense[0, ys, xs]
    # pixel (0,0) is force-killed in both (padding kill, xfeat.py:80)
    keep = ~((xs == 0) & (ys == 0))
    np.testing.assert_allclose(got[keep], ref_scores[keep], atol=1e-5)
    # non-maxima are -1
    assert (dense[0][~mask[0]] == -1.0).all()
    assert dense[0, 0, 0] == -1.0


def test_topk_keypoints():
    s = -np.ones((1, 16, 16), np.float32)
    s[0, 3, 5] = 0.9
    s[0, 10, 2] = 0.7
    s[0, 1, 1] = 0.8
    kpts, scores = jax.jit(lambda x: topk_keypoints(x, 4))(jnp.asarray(s))
    kpts, scores = np.asarray(kpts), np.asarray(scores)
    assert list(scores[0, :3]) == [np.float32(0.9), np.float32(0.8),
                                   np.float32(0.7)]
    np.testing.assert_array_equal(kpts[0, 0], [5, 3])
    np.testing.assert_array_equal(kpts[0, 1], [1, 1])
    np.testing.assert_array_equal(kpts[0, 2], [2, 10])
    assert scores[0, 3] <= 0  # padding slot invalid


def test_topk_keypoints_k_exceeds_map():
    """top_k larger than the score map (tiny images) pads instead of
    erroring — mirrors the reference's argsort[:top_k] short output
    (xfeat.py:83-87). Regression: 32x32 image with top_k=1024 crashed."""
    s = -np.ones((1, 4, 4), np.float32)
    s[0, 1, 2] = 0.5
    kpts, scores = jax.jit(lambda x: topk_keypoints(x, 64))(jnp.asarray(s))
    kpts, scores = np.asarray(kpts), np.asarray(scores)
    assert kpts.shape == (1, 64, 2) and scores.shape == (1, 64)
    np.testing.assert_array_equal(kpts[0, 0], [2, 1])
    assert scores[0, 0] == np.float32(0.5)
    assert (scores[0, 1:] <= 0).all()
    # odd-size fallback path too
    s = -np.ones((1, 3, 5), np.float32)
    s[0, 2, 4] = 0.25
    kpts, scores = jax.jit(lambda x: topk_keypoints(x, 32))(jnp.asarray(s))
    assert np.asarray(scores).shape == (1, 32)
    np.testing.assert_array_equal(np.asarray(kpts)[0, 0], [4, 2])
    assert (np.asarray(scores)[0, 1:] <= 0).all()


def test_detect_and_compute_tiny_image():
    """Full pipeline on a 32x32 image with top_k much larger than the
    pixel count: static (B,K) output, tail marked invalid."""
    from accelerated_features_tpu.models.params import init_xfeat_params
    from accelerated_features_tpu.ops.extraction import detect_and_compute
    params = init_xfeat_params(jax.random.key(0))
    x = jnp.asarray(np.random.default_rng(0).uniform(
        0, 1, (1, 32, 32, 1)), jnp.float32)
    out = jax.jit(lambda p, im: detect_and_compute(
        p, im, top_k=1024, detection_threshold=0.012))(params, x)
    assert out["keypoints"].shape == (1, 1024, 2)
    valid = np.asarray(out["scores"][0]) > 0
    assert valid.sum() <= 256  # at most one kpt per 2x2 of the 32x32 grid


def test_subpix_softmax2d_parity():
    """vs reference subpix_softmax2d (xfeat.py:292-304, temp=3)."""
    rng = np.random.default_rng(6)
    logits = rng.normal(size=(10, 64)).astype(np.float32)

    hm = torch.softmax(torch.from_numpy(logits) * 3, -1).view(-1, 8, 8)
    x, y = torch.meshgrid(torch.arange(8), torch.arange(8), indexing="xy")
    cx = ((x - 4)[None] * hm).sum((1, 2))
    cy = ((y - 4)[None] * hm).sum((1, 2))
    ref = torch.stack([cx, cy], -1).numpy()

    ours = np.asarray(jax.jit(subpix_softmax2d)(jnp.asarray(logits)))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_bicubic_matmul_matches_gather():
    """MXU-matmul bicubic == 16-tap gather bicubic (throughput path parity)."""
    from accelerated_features_tpu.ops import sample_bicubic_matmul
    rng = np.random.default_rng(9)
    B, h, w, C = 2, 12, 16, 8
    H, W = 96, 128
    maps = rng.normal(size=(B, h, w, C)).astype(np.float32)
    pos = np.concatenate([
        rng.uniform(0, [W - 1, H - 1], size=(B, 30, 2)),
        np.tile(np.array([[0.0, 0.0], [W - 1.0, H - 1.0]], np.float32),
                (B, 1, 1)),
    ], axis=1).astype(np.float32)
    exact = np.asarray(jax.jit(
        lambda m, p: interpolate_sparse2d(m, p, H, W, "bicubic"))(
            jnp.asarray(maps), jnp.asarray(pos)))
    fast = np.asarray(jax.jit(
        lambda m, p: sample_bicubic_matmul(m, p, (H, W),
                                           compute_dtype=jnp.float32))(
            jnp.asarray(maps), jnp.asarray(pos)))
    np.testing.assert_allclose(fast, exact, atol=1e-5)
    bf16 = np.asarray(jax.jit(
        lambda m, p: sample_bicubic_matmul(m, p, (H, W)))(
            jnp.asarray(maps), jnp.asarray(pos)))
    assert np.abs(bf16 - exact).max() < 0.05


def test_topk_keypoints_reduced_matches_dense():
    """2x2-reduced top-k == dense top-k on tie-free score maps."""
    rng = np.random.default_rng(10)
    s = -np.ones((2, 64, 96), np.float32)
    for b in range(2):
        # positives honor the 5x5-NMS spacing guarantee (>=3 apart Chebyshev):
        # one candidate per 4x4 cell with +-1 jitter cannot violate... it can;
        # use a strict grid with spacing 4 instead
        cells = [(y, x) for y in range(1, 64, 4) for x in range(1, 96, 4)]
        pick = rng.choice(len(cells), size=200, replace=False)
        for rank, ci in enumerate(pick):
            y, x = cells[ci]
            s[b, y, x] = float(200 - rank)
    kpts, scores = jax.jit(lambda x: topk_keypoints(x, 128))(jnp.asarray(s))
    kpts, scores = np.asarray(kpts), np.asarray(scores)
    flat = s.reshape(2, -1)
    for b in range(2):
        order = np.argsort(-flat[b], kind="stable")[:128]
        ref_xy = np.stack([order % 96, order // 96], -1)
        valid = flat[b][order] > 0
        np.testing.assert_array_equal(kpts[b][valid], ref_xy[valid])
        np.testing.assert_allclose(scores[b][valid], flat[b][order][valid])


def test_config_tree():
    from accelerated_features_tpu.config import DEFAULT, make_xfeat
    assert DEFAULT.detector.nms_kernel_size == 5
    assert DEFAULT.semidense.scale1 == 0.6
    xf = make_xfeat()
    assert xf.top_k == DEFAULT.detector.top_k


def test_heatmap_decode_variants_bit_exact():
    """The conv_transpose (MXU scatter) and plane-stack formulations of
    the pixel-shuffle decode are BIT-exact vs the reshape-transpose
    reference implementation (apps/measure_select.py A/Bs them on-chip;
    exactness is what allows wiring whichever measures fastest)."""
    from accelerated_features_tpu.ops.detect import (heatmap_decode,
                                                     heatmap_decode_convt,
                                                     heatmap_decode_planes)
    rng = np.random.default_rng(7)
    for (h, w) in [(12, 16), (60, 80), (5, 7)]:
        logits = jnp.asarray(rng.normal(0, 2, (2, h, w, 65)).astype(
            np.float32))
        a = heatmap_decode(logits)
        np.testing.assert_array_equal(np.asarray(a),
                                      np.asarray(heatmap_decode_convt(logits)))
        np.testing.assert_array_equal(np.asarray(a),
                                      np.asarray(heatmap_decode_planes(logits)))


def test_heatmap_decode_auto_env_validation(monkeypatch):
    """A typo'd XFEAT_DECODE raises a ValueError naming the valid set at
    dispatch time instead of a bare KeyError deep inside jit (ADVICE r4);
    valid values dispatch to their bit-exact variant."""
    import pytest

    from accelerated_features_tpu.ops.detect import (heatmap_decode,
                                                     heatmap_decode_auto)
    logits = jnp.asarray(np.random.default_rng(0).normal(
        0, 2, (1, 8, 10, 65)).astype(np.float32))
    monkeypatch.setenv("XFEAT_DECODE", "convT")
    with pytest.raises(ValueError, match="convT.*reshape|reshape.*convT"):
        heatmap_decode_auto(logits)
    monkeypatch.setenv("XFEAT_DECODE", "planes")
    np.testing.assert_array_equal(np.asarray(heatmap_decode_auto(logits)),
                                  np.asarray(heatmap_decode(logits)))
