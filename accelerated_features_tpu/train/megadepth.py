"""MegaDepth training dataset — host-side input pipeline.

Equivalent of the reference MegaDepthDataset (modules/dataset/megadepth/
megadepth.py + utils.py): per-scene npz index with pairwise overlap
filtering, grayscale images resized to a /32-divisible training resolution,
HDF5 depth maps padded to a fixed size, intrinsics/pose assembly with
relative transforms. Differences: returns NHWC numpy batches ready for
`spvs_coarse` on device, and the loader is a simple shuffled iterator (no
torch DataLoader dependency).
"""

from __future__ import annotations

import glob
import os
import random
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np


class S3Client:
    """Minimal s3:// object reader (reference megadepth/utils.py:25-58 uses
    an internal petrel client; this is the boto3 equivalent). Lazily
    constructed so local-disk training never imports boto3 (not bundled in
    this image — install it where S3 access is actually needed)."""

    def __init__(self, endpoint_url: Optional[str] = None):
        try:
            import boto3
        except ImportError as e:
            raise RuntimeError(
                "s3:// paths need boto3 (pip install boto3)") from e
        self._s3 = boto3.client("s3", endpoint_url=endpoint_url)

    def get(self, path: str) -> bytes:
        bucket, _, key = path[len("s3://"):].partition("/")
        return self._s3.get_object(Bucket=bucket, Key=key)["Body"].read()


def read_bytes(path: str, client: Optional[S3Client] = None) -> bytes:
    """Local-or-S3 byte read (reference load_array_from_s3 dispatch,
    megadepth/utils.py:45-50)."""
    if str(path).startswith("s3://"):
        return (client or S3Client()).get(str(path))
    with open(path, "rb") as f:
        return f.read()


def imread_gray(path: str, client: Optional[S3Client] = None):
    """Grayscale image from disk or S3 (reference imread_gray,
    megadepth/utils.py:45-58). Returns None if the image can't decode."""
    import cv2
    if str(path).startswith("s3://"):
        raw = np.frombuffer(read_bytes(path, client), np.uint8)
        return cv2.imdecode(raw, cv2.IMREAD_GRAYSCALE)
    return cv2.imread(str(path), cv2.IMREAD_GRAYSCALE)


def load_depth_h5(path: str, client: Optional[S3Client] = None
                  ) -> Optional[np.ndarray]:
    """HDF5 '/depth' array from disk or S3 (reference megadepth/utils.py:
    33-36,151-160)."""
    import io

    import h5py
    if str(path).startswith("s3://"):
        buf = io.BytesIO(read_bytes(path, client))
        with h5py.File(buf, "r") as f:
            return np.asarray(f["depth"], np.float32)
    if not os.path.exists(path):
        return None
    with h5py.File(path, "r") as f:
        return np.asarray(f["depth"], np.float32)


def fix_path_from_d2net(path: str) -> str:
    """Path fixups carried over from the d2-net index format (reference
    megadepth/utils.py:100-108)."""
    if path is None:
        return None
    path = path.replace("Undistorted_SfM/", "")
    if not path.startswith("s3://") and not os.path.exists(path):
        path = path.replace(".jpg", ".JPG")
    return path


def load_scene_index(npz_path: str, min_overlap: float = 0.3,
                     max_overlap: float = 1.0) -> List[Tuple[int, int]]:
    """Read a LoFTR-format scene_info npz and return valid pair indices
    filtered by overlap (reference megadepth.py:58-61)."""
    info = np.load(npz_path, allow_pickle=True)
    pair_infos = info["pair_infos"]
    pairs = []
    for pi in pair_infos:
        (i0, i1), overlap = pi[0], pi[1]
        if min_overlap < overlap < max_overlap:
            pairs.append((int(i0), int(i1)))
    return pairs


class MegaDepthDataset:
    """One scene; yields pair dicts (reference megadepth.py:21-174)."""

    def __init__(self, root_dir: str, npz_path: str,
                 image_size: Tuple[int, int] = (800, 608),
                 depth_pad: int = 2000,
                 min_overlap: float = 0.3, max_overlap: float = 1.0,
                 client: Optional[S3Client] = None):
        self.root = root_dir
        self.image_size = image_size  # (W, H)
        self.depth_pad = depth_pad
        self.client = client  # set (or let it lazy-init) for s3:// roots
        info = np.load(npz_path, allow_pickle=True)
        self.image_paths = info["image_paths"]
        self.depth_paths = info["depth_paths"]
        self.intrinsics = info["intrinsics"]
        self.poses = info["poses"]
        self.pairs = load_scene_index(npz_path, min_overlap, max_overlap)

    def __len__(self):
        return len(self.pairs)

    def _join(self, rel: str) -> str:
        if self.root.startswith("s3://"):
            return self.root.rstrip("/") + "/" + str(rel)
        return os.path.join(self.root, str(rel))

    def _load_view(self, idx: int):
        import cv2
        path = self._join(self.image_paths[idx])
        img = imread_gray(fix_path_from_d2net(path), self.client)
        if img is None:
            raise FileNotFoundError(path)
        W, H = self.image_size
        scale = np.array([img.shape[1] / W, img.shape[0] / H], np.float32)
        img = cv2.resize(img, (W, H)).astype(np.float32) / 255.0

        depth = np.zeros((self.depth_pad, self.depth_pad), np.float32)
        d = load_depth_h5(self._join(self.depth_paths[idx]), self.client)
        if d is not None:
            depth[:d.shape[0], :d.shape[1]] = d

        K = np.asarray(self.intrinsics[idx], np.float32).reshape(3, 3)
        pose_w2c = np.asarray(self.poses[idx], np.float32).reshape(4, 4)
        return img[..., None], depth, K, pose_w2c, scale

    def __getitem__(self, i: int) -> Dict[str, np.ndarray]:
        i0, i1 = self.pairs[i]
        im0, d0, K0, P0, s0 = self._load_view(i0)
        im1, d1, K1, P1, s1 = self._load_view(i1)
        T_0to1 = P1 @ np.linalg.inv(P0)
        return {
            "image0": im0, "image1": im1,
            "depth0": d0, "depth1": d1,
            "K0": K0, "K1": K1,
            "T_0to1": T_0to1.astype(np.float32),
            "T_1to0": np.linalg.inv(T_0to1).astype(np.float32),
            "scale0": s0, "scale1": s1,
        }


class MegaDepthLoader:
    """Shuffled multi-scene batch iterator (replaces ConcatDataset +
    DataLoader, reference train.py:118-125)."""

    def __init__(self, megadepth_root: str, batch_size: int,
                 image_size=(800, 608), seed: int = 0,
                 npz_glob: str = "train_data/megadepth_indices/"
                                 "scene_info_0.1_0.7/*.npz"):
        src = os.path.join(megadepth_root, "MegaDepth_v1")
        paths = sorted(glob.glob(os.path.join(megadepth_root, npz_glob)))
        if not paths:
            raise FileNotFoundError(
                f"no scene indices under {megadepth_root}/{npz_glob}")
        self.datasets = [MegaDepthDataset(src, p, image_size) for p in paths]
        self.index = [(d_i, p_i) for d_i, d in enumerate(self.datasets)
                      for p_i in range(len(d))]
        self.batch_size = batch_size
        self.rng = random.Random(seed)

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        order = list(self.index)
        self.rng.shuffle(order)
        batch = []
        for d_i, p_i in order:
            try:
                batch.append(self.datasets[d_i][p_i])
            except (FileNotFoundError, OSError):
                continue
            if len(batch) == self.batch_size:
                yield collate(batch)
                batch = []

    def infinite(self) -> Iterator[Dict[str, np.ndarray]]:
        while True:
            yield from iter(self)


def collate(items: List[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
    return {k: np.stack([it[k] for it in items]) for k in items[0]}


def load_all_views(megadepth_root: str, image_size=(800, 608),
                   npz_glob: str = "train_data/megadepth_indices/"
                                   "scene_info_0.1_0.7/*.npz"):
    """Load EVERY view referenced by any overlap-filtered pair into host
    arrays, for device-resident training (see run.py
    ResidentMegaDepthBatcher): the whole dataset ships to HBM once and
    per-step host->device traffic is a handful of indices.

    Only valid for datasets that fit in HBM (the rendered procedural
    dataset, apps/render_depth_dataset.py: ~0.5 GB for 260 views; real
    MegaDepth must use the streaming MegaDepthLoader). All depth maps
    must share one shape (true for rendered data; no 2000^2 padding is
    applied — spvs_coarse takes depth at native resolution).

    Returns dict of stacked arrays:
      images (V, H, W, 1) uint8, depths (V, Hd, Wd) f32, Ks (V, 3, 3),
      scales (V, 2), T_0to1/T_1to0 (Npairs, 4, 4),
      pair_i0/pair_i1 (Npairs,) int32 global view indices.
    """
    import cv2
    src = os.path.join(megadepth_root, "MegaDepth_v1")
    paths = sorted(glob.glob(os.path.join(megadepth_root, npz_glob)))
    if not paths:
        raise FileNotFoundError(
            f"no scene indices under {megadepth_root}/{npz_glob}")
    W, H = image_size
    images, depths, Ks, scales, poses = [], [], [], [], []
    pair_i0, pair_i1 = [], []
    for npz_path in paths:
        ds = MegaDepthDataset(src, npz_path, image_size)
        used = sorted({i for pr in ds.pairs for i in pr})
        local = {}
        for vi in used:
            path = fix_path_from_d2net(ds._join(ds.image_paths[vi]))
            img = imread_gray(path, ds.client)
            if img is None:
                continue
            d = load_depth_h5(ds._join(ds.depth_paths[vi]), ds.client)
            if d is None:
                continue
            local[vi] = len(images)
            scales.append(np.array([img.shape[1] / W, img.shape[0] / H],
                                   np.float32))
            images.append(cv2.resize(img, (W, H))[..., None])
            depths.append(np.asarray(d, np.float32))
            Ks.append(np.asarray(ds.intrinsics[vi],
                                 np.float32).reshape(3, 3))
            poses.append(np.asarray(ds.poses[vi],
                                    np.float32).reshape(4, 4))
        for i0, i1 in ds.pairs:
            if i0 in local and i1 in local:
                pair_i0.append(local[i0])
                pair_i1.append(local[i1])
    if not pair_i0:
        raise RuntimeError(f"no loadable pairs under {megadepth_root}")
    shapes = {d.shape for d in depths}
    if len(shapes) != 1:
        raise RuntimeError(
            f"device-resident loading needs uniform depth shapes, got "
            f"{sorted(shapes)[:3]}...; use the streaming MegaDepthLoader")
    poses_np = np.stack(poses)
    i0 = np.asarray(pair_i0, np.int32)
    i1 = np.asarray(pair_i1, np.int32)
    T_0to1 = np.einsum("nij,njk->nik", poses_np[i1],
                       np.linalg.inv(poses_np[i0]))
    return {
        "images": np.stack(images),
        "depths": np.stack(depths),
        "Ks": np.stack(Ks),
        "scales": np.stack(scales),
        "T_0to1": T_0to1.astype(np.float32),
        "T_1to0": np.linalg.inv(T_0to1).astype(np.float32),
        "pair_i0": i0,
        "pair_i1": i1,
    }


class ImageFolderSource:
    """Random-image pool for the synthetic augmentation pipeline (replaces
    the COCO loader, reference augmentation.py:151-175): loads up to
    `max_num_imgs` images resized to `resolution`, reshuffles the pool every
    `reload_step` draws."""

    def __init__(self, img_dir: str, resolution: Tuple[int, int] = (800, 608),
                 max_num_imgs: int = 3000, reload_step: int = 4000,
                 seed: int = 0):
        self.dir = img_dir
        self.resolution = resolution
        self.max_num = max_num_imgs
        self.reload_step = reload_step
        self.rng = random.Random(seed)
        self.all_paths = sorted(
            glob.glob(os.path.join(img_dir, "*.jpg")) +
            glob.glob(os.path.join(img_dir, "*.png")))
        if len(self.all_paths) < 10:
            raise RuntimeError(f"not enough images in {img_dir}")
        self._count = 0
        self._load()

    def _load(self):
        import cv2
        self.rng.shuffle(self.all_paths)
        self.pool = []
        W, H = self.resolution
        for p in self.all_paths[:self.max_num]:
            im = cv2.imread(p)
            if im is None:
                continue
            if im.shape[0] > im.shape[1]:
                im = np.rot90(im)  # landscape (reference augmentation.py:160)
            # pool stays uint8 (1/4 the float32 host memory); consumers
            # normalize on use (sample_batch) or on device (pool_u8 +
            # ops.resize.to_unit_float)
            self.pool.append(np.ascontiguousarray(cv2.resize(im, (W, H))))

    def sample_indices(self, n: int) -> Tuple[np.ndarray, bool]:
        """Draw n pool indices; returns (indices, pool_changed). The pool
        only actually changes on reload when there are more files on disk
        than pool slots — otherwise a reload is a pure reshuffle of the
        same images and device-resident copies stay valid."""
        self._count += 1
        changed = False
        if self._count % self.reload_step == 0:
            if len(self.all_paths) > len(self.pool):
                self._load()
                changed = True
        idx = np.asarray([self.rng.randrange(len(self.pool))
                          for _ in range(n)], np.int32)
        return idx, changed

    def pool_u8(self) -> np.ndarray:
        """(N, H, W, 3) uint8 stack of the whole pool — for device-resident
        sampling (ship the pool to HBM once, then per-step transfers are
        just indices; see SyntheticBatcher)."""
        return np.stack(self.pool)

    def sample_batch(self, n: int) -> np.ndarray:
        idx, _ = self.sample_indices(n)
        return np.stack([self.pool[i] for i in idx]).astype(np.float32) / 255.0
