"""Parity tests for the VMEM-resident MXU bicubic sampler.

The sampler is a documented negative result for throughput (see module
docstring / DESIGN.md §10) but is kept correct: these tests pin its
numerics against the f32 gather reference and the production matmul path
(reference semantics: interpolator.py:21-33, xfeat.py:90).
"""
import numpy as np
import jax.numpy as jnp

from accelerated_features_tpu.ops.sample import (sample_bicubic,
                                                 sample_bicubic_matmul)
from accelerated_features_tpu.experiments.bicubic_mxu import sample_bicubic_mxu


def _case(rng, h, w, K, HW, seed_shift=0):
    B, c = 2, 64
    maps = jnp.asarray(rng.normal(size=(B, h, w, c)).astype(np.float32))
    pos = jnp.asarray(
        rng.uniform(0, [HW[1] - 1, HW[0] - 1], (B, K, 2)).astype(np.float32))
    ref = np.asarray(sample_bicubic(maps, pos, HW))
    mm = np.asarray(sample_bicubic_matmul(maps, pos, HW))
    got = np.asarray(sample_bicubic_mxu(maps, pos, HW, interpret=True))
    # as accurate as the production bf16 matmul path (f32 second stage
    # actually makes it closer to the f32 reference)
    assert np.abs(got - ref).max() <= np.abs(mm - ref).max() + 1e-3
    np.testing.assert_allclose(got, mm, atol=0.05, rtol=0.05)


def test_mxu_bicubic_vga_grid(rng):
    _case(rng, 60, 80, 512, (480, 640))


def test_mxu_bicubic_non_pow2_w_and_k(rng):
    # w=13 -> wp=16 pad fold; K=70 -> padded keypoint tile tail
    _case(rng, 10, 13, 70, (80, 104))


def test_mxu_bicubic_edge_positions(rng):
    """Positions at the exact borders exercise OOB taps and the
    x0 == w-1 pad-region Sxe match (must contribute zero)."""
    B, h, w, c, HW = 1, 12, 16, 64, (96, 128)
    maps = jnp.asarray(rng.normal(size=(B, h, w, c)).astype(np.float32))
    pos = jnp.asarray(np.array(
        [[[0, 0], [127, 95], [127, 0], [0, 95], [126.5, 94.5], [0.5, 0.5]]],
        np.float32))
    ref = np.asarray(sample_bicubic(maps, pos, HW))
    got = np.asarray(sample_bicubic_mxu(maps, pos, HW, interpret=True))
    np.testing.assert_allclose(got, ref, atol=0.05, rtol=0.05)


def test_sample_bicubic_w2_parity():
    """The single-contraction W2 kernel (pallas/bicubic.sample_bicubic_w2)
    matches the f32 gather reference + L2-norm to bf16 tolerance across
    shapes incl. non-multiple-of-8 heights and padded keypoint tiles."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from accelerated_features_tpu.ops.extraction import l2_normalize
    from accelerated_features_tpu.ops.pallas.bicubic import sample_bicubic_w2
    from accelerated_features_tpu.ops.sample import sample_bicubic

    rng = np.random.default_rng(1)
    for (h, w, K, H, W) in [(60, 80, 300, 480, 640),
                            (38, 50, 70, 304, 400),
                            (96, 128, 512, 768, 1024)]:
        maps = jnp.asarray(rng.normal(size=(2, h, w, 64)).astype(np.float32))
        pos = jnp.asarray(np.stack([
            rng.uniform(2, W - 3, (2, K)),
            rng.uniform(2, H - 3, (2, K))], -1).astype(np.float32))
        ref = np.asarray(l2_normalize(sample_bicubic(maps, pos, (H, W))))
        got = np.asarray(sample_bicubic_w2(maps, pos, (H, W),
                                           interpret=True))
        np.testing.assert_allclose(got, ref, atol=6e-3)
