"""Flash-attention Pallas kernel vs dense XLA attention (interpret mode on
the CPU mesh; compiles to Mosaic on TPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from accelerated_features_tpu.ops.pallas.attention import (
    attention_reference, flash_attention)


@pytest.mark.parametrize("nq,nk,d", [(100, 80, 96), (256, 512, 96),
                                     (300, 300, 64)])
def test_flash_matches_dense(nq, nk, d):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(2, nq, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(2, nk, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(2, nk, d)).astype(np.float32))

    ref = np.asarray(jax.jit(attention_reference)(q, k, v))
    got = np.asarray(flash_attention(q, k, v))
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)


def test_flash_with_mask():
    rng = np.random.default_rng(1)
    b, nq, nk, d = 1, 64, 128, 96
    q = jnp.asarray(rng.normal(size=(b, nq, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, nk, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, nk, d)).astype(np.float32))
    mask = jnp.asarray(rng.uniform(size=(b, nk)) > 0.4)

    ref = np.asarray(jax.jit(attention_reference)(q, k, v, mask))
    got = np.asarray(flash_attention(q, k, v, mask))
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)


def test_flash_padding_invariance():
    """Masked-out padded keys never contribute, whatever their values."""
    rng = np.random.default_rng(2)
    b, nq, nk, d = 1, 32, 48, 32
    q = jnp.asarray(rng.normal(size=(b, nq, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, nk, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, nk, d)).astype(np.float32))
    base = np.asarray(flash_attention(q, k, v))

    pad = 16
    k2 = jnp.concatenate([k, 100.0 * jnp.ones((b, pad, d))], axis=1)
    v2 = jnp.concatenate([v, -50.0 * jnp.ones((b, pad, d))], axis=1)
    mask = jnp.asarray(np.arange(nk + pad)[None] < nk)
    got = np.asarray(flash_attention(q, k2, v2, mask))
    np.testing.assert_allclose(got, base, atol=2e-5, rtol=1e-4)


def test_fused_detect_matches_xla():
    """Fused detection kernel (interpret mode) == XLA score_map + topk."""
    from accelerated_features_tpu.ops.detect import (heatmap_decode,
                                                     score_map,
                                                     topk_keypoints)
    from accelerated_features_tpu.ops.pallas.detect_fused import (
        topk_keypoints_fused)
    rng = np.random.default_rng(3)
    B, h, w = 2, 8, 16
    logits = jnp.asarray(rng.normal(size=(B, h, w, 65)).astype(np.float32)) * 3
    rel = jnp.asarray(rng.uniform(0.1, 1, (B, h, w)).astype(np.float32))
    kheat = heatmap_decode(logits)
    k_ref, s_ref = topk_keypoints(score_map(kheat, rel, 0.012), 96)
    k_f, s_f = topk_keypoints_fused(kheat, rel, 96, 0.012)
    k_ref, s_ref, k_f, s_f = map(np.asarray, (k_ref, s_ref, k_f, s_f))
    for b in range(B):
        v = s_ref[b] > 0
        assert (s_f[b] > 0).sum() == v.sum()
        np.testing.assert_allclose(s_f[b][:v.sum()], s_ref[b][v], atol=1e-5)
        np.testing.assert_array_equal(k_f[b][:v.sum()], k_ref[b][v])


def test_fused_detect_non_128_width():
    """The fused kernel must cover W % 128 != 0 (800x608 train/eval size;
    VERDICT r1 #6): parity at w=76 -> W=608."""
    from accelerated_features_tpu.ops.detect import (heatmap_decode,
                                                     score_map,
                                                     topk_keypoints)
    from accelerated_features_tpu.ops.pallas.detect_fused import (
        topk_keypoints_fused)
    rng = np.random.default_rng(5)
    B, h, w = 2, 10, 76
    logits = jnp.asarray(rng.normal(size=(B, h, w, 65)).astype(np.float32)) * 3
    rel = jnp.asarray(rng.uniform(0.1, 1, (B, h, w)).astype(np.float32))
    kheat = heatmap_decode(logits)
    k_ref, s_ref = topk_keypoints(score_map(kheat, rel, 0.012), 128)
    k_f, s_f = topk_keypoints_fused(kheat, rel, 128, 0.012)
    k_ref, s_ref, k_f, s_f = map(np.asarray, (k_ref, s_ref, k_f, s_f))
    for b in range(B):
        v = s_ref[b] > 0
        assert (s_f[b] > 0).sum() == v.sum()
        np.testing.assert_allclose(s_f[b][:v.sum()], s_ref[b][v], atol=1e-5)
        np.testing.assert_array_equal(k_f[b][:v.sum()], k_ref[b][v])


def test_fused_detect_tiny_image():
    """Smallest supported input (32x32 -> 4x4 cell grid): H3=ceil(32/3)
    exercises both tile-tail paddings; K > number of valid slots."""
    from accelerated_features_tpu.ops.detect import (heatmap_decode,
                                                     score_map,
                                                     topk_keypoints)
    from accelerated_features_tpu.ops.pallas.detect_fused import (
        topk_keypoints_fused)
    rng = np.random.default_rng(11)
    B, h, w = 2, 4, 4
    logits = jnp.asarray(rng.normal(size=(B, h, w, 65)).astype(np.float32)) * 3
    rel = jnp.asarray(rng.uniform(0.1, 1, (B, h, w)).astype(np.float32))
    kheat = heatmap_decode(logits)
    k_ref, s_ref = topk_keypoints(score_map(kheat, rel, 0.012), 64)
    k_f, s_f = topk_keypoints_fused(kheat, rel, 64, 0.012)
    k_ref, s_ref, k_f, s_f = map(np.asarray, (k_ref, s_ref, k_f, s_f))
    for b in range(B):
        v = s_ref[b] > 0
        assert (s_f[b] > 0).sum() == v.sum()
        np.testing.assert_allclose(s_f[b][:v.sum()], s_ref[b][v], atol=1e-5)
        np.testing.assert_array_equal(k_f[b][:v.sum()], k_ref[b][v])
        # padded slots must stay inside the image
        assert k_f[b][:, 0].max() < 32 and k_f[b][:, 1].max() < 32


def test_fused_bicubic_parity():
    """Pallas bicubic sampler (interpret) == f32 gather reference."""
    from accelerated_features_tpu.ops.extraction import l2_normalize
    from accelerated_features_tpu.ops.pallas.bicubic import (
        sample_bicubic_fused)
    from accelerated_features_tpu.ops.sample import sample_bicubic
    rng = np.random.default_rng(6)
    B, h, w, K = 2, 30, 40, 700
    H, W = h * 8, w * 8
    maps = jnp.asarray(rng.normal(size=(B, h, w, 64)), jnp.float32)
    pos = jnp.asarray(np.stack([rng.uniform(-8, W + 8, (B, K)),
                                rng.uniform(-8, H + 8, (B, K))], -1),
                      jnp.float32)
    ref = l2_normalize(sample_bicubic(maps, pos, (H, W)))
    got = sample_bicubic_fused(maps, pos, (H, W), interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-2)
