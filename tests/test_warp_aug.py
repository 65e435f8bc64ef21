"""GT-correspondence warper parity vs the reference + augmentation
self-consistency tests."""

import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from accelerated_features_tpu.train.augmentation import (
    AugConfig, apply_h, make_pair, pair_correspondences, random_homography,
    render_view, solve_tps, tps_apply, view2_to_view1)
from accelerated_features_tpu.train.warp import (corr_to_fixed, spvs_coarse,
                                                 warp_kpts)

torch = pytest.importorskip("torch")

REF = "/root/reference"
if REF not in sys.path:
    sys.path.insert(0, REF)


@pytest.fixture(scope="module")
def ref_warper():
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
    return importlib.import_module("modules.dataset.megadepth.megadepth_warper")


def _synth_views(seed=0, B=2, H=64, W=96):
    """Two pinhole views of a smooth synthetic depth surface."""
    rng = np.random.default_rng(seed)
    K = np.array([[120.0, 0, W / 2], [0, 120.0, H / 2], [0, 0, 1]])
    data = {}
    depth0 = 5.0 + rng.uniform(0, 0.5, (B, H, W)).astype(np.float32)
    depth1 = np.zeros_like(depth0)
    T = np.zeros((B, 4, 4))
    for b in range(B):
        ang = rng.uniform(-0.05, 0.05)
        c, s = np.cos(ang), np.sin(ang)
        R = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
        t = rng.uniform(-0.2, 0.2, 3)
        T[b] = np.eye(4)
        T[b, :3, :3] = R
        T[b, :3, 3] = t
        # render depth1 by warping depth0 forward (approximate: constant-ish)
        depth1[b] = depth0[b].mean()
    data["image0"] = np.zeros((B, H, W, 1), np.float32)
    data["image1"] = np.zeros((B, H, W, 1), np.float32)
    data["depth0"] = depth0
    data["depth1"] = depth1
    data["T_0to1"] = T
    data["T_1to0"] = np.stack([np.linalg.inv(T[b]) for b in range(B)])
    data["K0"] = np.tile(K[None], (B, 1, 1))
    data["K1"] = np.tile(K[None], (B, 1, 1))
    data["scale0"] = np.ones((B, 2), np.float32)
    data["scale1"] = np.ones((B, 2), np.float32)
    return data


def test_warp_kpts_parity(ref_warper):
    data = _synth_views()
    rng = np.random.default_rng(1)
    B, L = 2, 50
    kpts = rng.uniform([0, 0], [95, 63], (B, L, 2)).astype(np.float32)

    tv, tw = ref_warper.warp_kpts(
        torch.from_numpy(kpts),
        torch.from_numpy(data["depth0"].copy()),
        torch.from_numpy(data["depth1"].copy()),
        torch.from_numpy(data["T_0to1"][:, :3].astype(np.float32)),
        torch.from_numpy(data["K0"].astype(np.float32)),
        torch.from_numpy(data["K1"].astype(np.float32)))

    jv, jw = jax.jit(warp_kpts)(
        jnp.asarray(kpts), jnp.asarray(data["depth0"]),
        jnp.asarray(data["depth1"]),
        jnp.asarray(data["T_0to1"], jnp.float32),
        jnp.asarray(data["K0"], jnp.float32),
        jnp.asarray(data["K1"], jnp.float32))

    np.testing.assert_array_equal(np.asarray(jv), tv.numpy())
    np.testing.assert_allclose(np.asarray(jw), tw.numpy(), atol=1e-2)


def test_spvs_coarse_parity(ref_warper):
    data = _synth_views(seed=2)
    d_torch = {k: torch.from_numpy(np.asarray(v, np.float32))
               for k, v in data.items()}
    d_torch["image0"] = d_torch["image0"].permute(0, 3, 1, 2)
    d_torch["image1"] = d_torch["image1"].permute(0, 3, 1, 2)
    d_torch["T_0to1"] = d_torch["T_0to1"][:, :3]
    d_torch["T_1to0"] = d_torch["T_1to0"][:, :3]
    ref_corrs = ref_warper.spvs_coarse(d_torch, 8)

    jc, jm = jax.jit(lambda d: spvs_coarse(d, 8))(
        {k: jnp.asarray(np.asarray(v, np.float32)) for k, v in data.items()})
    jc, jm = np.asarray(jc), np.asarray(jm)

    for b in range(len(ref_corrs)):
        ref_set = {tuple(np.round(r, 3)) for r in ref_corrs[b].numpy()}
        our_set = {tuple(np.round(r, 3)) for r in jc[b][jm[b]]}
        assert len(ref_set) > 10, "test vacuous"
        inter = len(ref_set & our_set)
        # dedup keeps one arbitrary candidate per cell; near-complete overlap
        assert inter >= 0.97 * max(len(ref_set), len(our_set)), \
            (len(ref_set), len(our_set), inter)


def test_corr_to_fixed():
    corrs = jnp.asarray(np.arange(24, dtype=np.float32).reshape(1, 6, 4))
    mask = jnp.asarray([[False, True, False, True, True, False]])
    c, m = corr_to_fixed(corrs, mask, 4)
    assert c.shape == (1, 4, 4)
    np.testing.assert_array_equal(np.asarray(m)[0], [True, True, True, False])
    np.testing.assert_allclose(np.asarray(c)[0, 0], np.arange(4, 8))


def test_corr_to_fixed_random_subsample():
    """With a key, over-budget truncation samples valid rows uniformly
    instead of keeping the first (raster-order) rows — the set kept must
    vary with the key, always be valid rows, and never contain invalid
    rows while valid ones are dropped."""
    rng = np.random.default_rng(0)
    n, budget = 64, 8
    corrs = jnp.asarray(rng.normal(size=(1, n, 4)).astype(np.float32))
    mask = jnp.asarray((np.arange(n) % 2 == 0)[None])  # 32 valid rows

    kept = []
    for seed in range(4):
        c, m = corr_to_fixed(corrs, mask, budget, key=jax.random.key(seed))
        assert bool(m.all())                       # budget < n_valid
        rows = {tuple(np.asarray(c)[0, i]) for i in range(budget)}
        valid_rows = {tuple(np.asarray(corrs)[0, i])
                      for i in range(n) if i % 2 == 0}
        assert rows <= valid_rows                  # only valid rows kept
        kept.append(frozenset(rows))
    assert len(set(kept)) > 1                      # varies with the key


def test_homography_point_roundtrip():
    H = np.asarray(random_homography(jax.random.key(0), (100, 150), 0.2))
    pts = np.random.default_rng(0).uniform(0, 100, (20, 2)).astype(np.float32)
    out = np.asarray(apply_h(jnp.asarray(H), jnp.asarray(pts)))
    back = np.asarray(apply_h(jnp.asarray(np.linalg.inv(H)),
                              jnp.asarray(out)))
    np.testing.assert_allclose(back, pts, atol=1e-3)


def test_tps_interpolates_control_points():
    rng = np.random.default_rng(3)
    ctrl = rng.uniform(-1, 1, (20, 2)).astype(np.float32)
    target = ctrl + rng.uniform(-0.1, 0.1, (20, 2)).astype(np.float32)
    w, a = solve_tps(jnp.asarray(ctrl), jnp.asarray(target))
    got = np.asarray(tps_apply(jnp.asarray(ctrl), jnp.asarray(ctrl), w, a))
    np.testing.assert_allclose(got, target, atol=1e-4)


def test_augmented_pair_correspondence_consistency():
    """The advertised property of the redesign: image warps and
    correspondence maps are *exactly* consistent — pixels at corresponding
    /8-grid points show the same source content (photometric off)."""
    rng = np.random.default_rng(4)
    # smooth source images so bilinear sampling is benign
    base = rng.uniform(0, 1, (2, 19, 25, 3))
    imgs = np.stack([np.kron(b, np.ones((8, 8, 1)))[:152, :200]
                     for b in base]).astype(np.float32)

    cfg = AugConfig(warp_resolution=(200, 152), out_resolution=(96, 64),
                    photometric=False)
    pair = jax.jit(lambda k, im: make_pair(k, im, cfg, difficulty=0.05,
                                           tps_prob=1.0))(
        jax.random.key(0), jnp.asarray(imgs))
    corrs, mask = jax.jit(lambda p: pair_correspondences(p, cfg))(pair)
    corrs, mask = np.asarray(corrs), np.asarray(mask)
    v1 = np.asarray(pair["view1"])
    v2 = np.asarray(pair["view2"])
    m1 = np.asarray(pair["mask1"])

    # /8 grid on 96x64 has only 12x8 cells and pad=2 removes the border,
    # so ~32 interior cells/image is the ceiling
    assert mask.sum() > 20, "test vacuous: no valid correspondences"
    errs = []
    for b in range(2):
        c = corrs[b][mask[b]]
        # sample both views at corresponding points (nearest pixel)
        p1 = np.clip(np.round(c[:, :2] * 8).astype(int), 0, [95, 63])
        p2 = np.clip(np.round(c[:, 2:] * 8).astype(int), 0, [95, 63])
        keep = m1[b][p1[:, 1], p1[:, 0]]
        a = v1[b][p1[keep, 1], p1[keep, 0]]
        bb = v2[b][p2[keep, 1], p2[keep, 0]]
        errs.append(np.abs(a - bb).mean())
    assert np.mean(errs) < 0.1, errs


def test_equalize_parity():
    """vs torchvision-style equalize on an 8-bit image."""
    from accelerated_features_tpu.train.augmentation import equalize
    rng = np.random.default_rng(8)
    img8 = rng.integers(0, 256, (32, 40, 3)).astype(np.uint8)
    img = img8.astype(np.float32) / 255.0

    # reference formula (torchvision F.equalize)
    ref = np.empty_like(img)
    for c in range(3):
        hist = np.bincount(img8[..., c].reshape(-1), minlength=256)
        cdf = np.cumsum(hist)
        cdf_min = cdf[hist > 0].min()
        denom = max(img8[..., c].size - cdf_min, 1)
        lut = np.clip((cdf - cdf_min) / denom, 0, 1)
        ref[..., c] = lut[img8[..., c]]

    got = np.asarray(jax.jit(equalize)(jnp.asarray(img)))
    np.testing.assert_allclose(got, ref, atol=1e-5)
