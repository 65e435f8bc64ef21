"""MegaDepth input pipeline: local-disk and S3-routed IO (reference
megadepth/utils.py:25-58), scene-index overlap filtering, pair assembly."""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")
h5py = pytest.importorskip("h5py")

from accelerated_features_tpu.train import megadepth as md


def _make_scene(tmp_path, n_imgs=3):
    rng = np.random.default_rng(0)
    img_rel, dep_rel, Ks, poses = [], [], [], []
    for i in range(n_imgs):
        rel = f"imgs/{i:02d}.jpg"
        drel = f"depths/{i:02d}.h5"
        p = tmp_path / rel
        p.parent.mkdir(parents=True, exist_ok=True)
        cv2.imwrite(str(p), rng.integers(0, 255, (48, 64, 3), np.uint8))
        dp = tmp_path / drel
        dp.parent.mkdir(parents=True, exist_ok=True)
        with h5py.File(dp, "w") as f:
            f["depth"] = rng.uniform(1, 5, (48, 64)).astype(np.float32)
        img_rel.append(rel)
        dep_rel.append(drel)
        Ks.append(np.diag([100.0, 100.0, 1.0]).astype(np.float32))
        T = np.eye(4, dtype=np.float32)
        T[0, 3] = 0.1 * i
        poses.append(T)
    npz = tmp_path / "scene.npz"
    np.savez(npz,
             image_paths=np.asarray(img_rel, object),
             depth_paths=np.asarray(dep_rel, object),
             intrinsics=np.asarray(Ks),
             poses=np.asarray(poses),
             pair_infos=np.asarray(
                 [((0, 1), 0.5, None), ((0, 2), 0.1, None),
                  ((1, 2), 0.7, None)], object))
    return str(npz)


def test_megadepth_dataset_local(tmp_path):
    npz = _make_scene(tmp_path)
    ds = md.MegaDepthDataset(str(tmp_path), npz, image_size=(64, 48),
                             depth_pad=64)
    # overlap filter keeps 0.5 and 0.7, drops 0.1 (reference
    # megadepth.py:58-61, bounds (0.3, 1.0))
    assert len(ds) == 2
    item = ds[0]
    assert item["image0"].shape == (48, 64, 1)
    assert item["depth0"].shape == (64, 64)
    assert item["depth0"].max() > 0
    np.testing.assert_allclose(
        item["T_0to1"] @ item["T_1to0"], np.eye(4), atol=1e-6)


def test_megadepth_dataset_s3_route(tmp_path, monkeypatch):
    """s3:// roots fetch through the object client (bytes served from a
    dict here) and produce identical items to the local path."""
    npz = _make_scene(tmp_path)

    store = {}
    for root, _, files in os.walk(tmp_path):
        for fn in files:
            p = os.path.join(root, fn)
            rel = os.path.relpath(p, tmp_path)
            with open(p, "rb") as f:
                store["s3://bucket/scenes/" + rel.replace(os.sep, "/")] = \
                    f.read()

    class FakeClient:
        def get(self, path):
            return store[path]

    ds_local = md.MegaDepthDataset(str(tmp_path), npz, image_size=(64, 48),
                                   depth_pad=64)
    ds_s3 = md.MegaDepthDataset("s3://bucket/scenes", npz,
                                image_size=(64, 48), depth_pad=64,
                                client=FakeClient())
    a, b = ds_local[1], ds_s3[1]
    for k in a:
        np.testing.assert_allclose(a[k], b[k], atol=1e-6, err_msg=k)


def test_read_bytes_local(tmp_path):
    p = tmp_path / "x.bin"
    p.write_bytes(b"hello")
    assert md.read_bytes(str(p)) == b"hello"


def test_image_folder_source_device_pool(tmp_path):
    """ImageFolderSource keeps a uint8 pool; sample_indices drives the
    device-resident sampling path (SyntheticBatcher ships the pool to HBM
    once and per-step transfers are just indices — the full-f32-batch
    path leaked ~58 MB/step through the relay client and OOMed long
    training runs); sample_batch stays the normalized f32 [0,1] batch."""
    import cv2

    from accelerated_features_tpu.train.megadepth import ImageFolderSource

    rng = np.random.default_rng(0)
    for i in range(12):
        cv2.imwrite(str(tmp_path / f"im_{i:02d}.png"),
                    rng.integers(0, 255, (40, 64, 3)).astype(np.uint8))
    src = ImageFolderSource(str(tmp_path), resolution=(64, 48),
                            max_num_imgs=12, reload_step=5)
    pool = src.pool_u8()
    assert pool.dtype == np.uint8 and pool.shape == (12, 48, 64, 3)

    idx, changed = src.sample_indices(4)
    assert idx.shape == (4,) and idx.dtype == np.int32 and not changed
    assert idx.max() < 12

    # reloads that cannot change the pool (all files already loaded) must
    # report unchanged so the device copy is not re-shipped
    for _ in range(10):
        _, changed = src.sample_indices(4)
        assert not changed

    # f32 convenience path: normalized, equal to the pool rows
    b = src.sample_batch(3)
    assert b.dtype == np.float32 and b.max() <= 1.0 and b.shape[1:] == (48, 64, 3)


def test_synthetic_batcher_device_pool(tmp_path):
    """SyntheticBatcher.next() produces the full fixed-shape training batch
    from the device pool + indices (no per-step image upload)."""
    import cv2

    import jax.numpy as jnp
    from accelerated_features_tpu.train.augmentation import AugConfig
    from accelerated_features_tpu.train.megadepth import ImageFolderSource
    from accelerated_features_tpu.train.run import SyntheticBatcher

    rng = np.random.default_rng(1)
    for i in range(10):
        cv2.imwrite(str(tmp_path / f"im_{i:02d}.png"),
                    rng.integers(0, 255, (80, 100, 3)).astype(np.uint8))
    cfg = AugConfig(warp_resolution=(64, 64), out_resolution=(64, 64))
    sb = SyntheticBatcher(
        ImageFolderSource(str(tmp_path), resolution=(64, 64)),
        cfg, batch_size=2, max_corrs=64)
    batch = sb.next()
    assert batch["image0"].shape == (2, 64, 64, 1)
    assert batch["image0"].dtype == jnp.float32
    assert batch["corrs"].shape == (2, 64, 4)
    assert bool(jnp.all(batch["image0"] >= -1e-6))
    assert float(jnp.max(batch["image0"])) <= 1.0
    # second draw reuses the device pool object
    pool_ref = sb._pool_dev
    sb.next()
    assert sb._pool_dev is pool_ref
