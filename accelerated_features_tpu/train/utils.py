"""Training utilities — JAX counterparts of the reference helpers
(modules/training/utils.py) plus the teacher-distillation interface.

The ALIKE teacher itself is an external model (the reference wraps a git
submodule, third_party/alike_wrapper.py, and round-trips images through the
CPU per step, losses.py:78). TPU-native replacement: teacher keypoints are
either precomputed to .npz (preferred — zero in-loop teacher cost) or
supplied by any callable; `teacher_labels_for_batch` converts them to the
fixed-shape label maps consumed by train.losses.distill_loss.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from .losses import distill_labels_from_kpts


def check_accuracy(m1: jax.Array, m2: jax.Array,
                   valid: Optional[jax.Array] = None) -> jax.Array:
    """Fraction of rows whose nearest neighbour is the diagonal match
    (reference check_accuracy, training/utils.py:177-194), masked."""
    sim = jax.lax.dot_general(m1, m2, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32,
                              precision=jax.lax.Precision.HIGHEST)
    if valid is not None:
        sim = jnp.where(valid[None, :], sim, -1e9)
    nn = jnp.argmax(sim, axis=1)
    correct = nn == jnp.arange(m1.shape[0])
    if valid is None:
        return jnp.mean(correct.astype(jnp.float32))
    n = jnp.maximum(jnp.sum(valid), 1)
    return jnp.sum(correct & valid) / n


def crop_patches(maps: jax.Array, coords: jax.Array, size: int = 7
                 ) -> jax.Array:
    """Crop size x size patches around integer coords (reference
    crop_patches, training/utils.py:136-160), zero padding at borders.

    maps: (H, W, C); coords: (N, 2) xy -> (N, size, size, C)."""
    h, w, c = maps.shape
    half = size // 2
    offs = jnp.arange(-half, half + 1)
    ys = coords[:, 1, None, None] + offs[None, :, None]   # (N, s, 1)
    xs = coords[:, 0, None, None] + offs[None, None, :]   # (N, 1, s)
    ys = jnp.broadcast_to(ys, (coords.shape[0], size, size)).astype(jnp.int32)
    xs = jnp.broadcast_to(xs, (coords.shape[0], size, size)).astype(jnp.int32)
    inb = (ys >= 0) & (ys < h) & (xs >= 0) & (xs < w)
    flat = maps.reshape(h * w, c)
    idx = jnp.clip(ys, 0, h - 1) * w + jnp.clip(xs, 0, w - 1)
    out = flat[idx.reshape(-1)].reshape(coords.shape[0], size, size, c)
    return out * inb[..., None].astype(maps.dtype)


TeacherFn = Callable[[np.ndarray], np.ndarray]  # image (H,W,C)[0,1] -> (N,2)


def teacher_labels_for_batch(images: jax.Array,
                             teacher: TeacherFn,
                             max_kpts: int = 1024) -> jax.Array:
    """Run a host-side teacher per image and build (B, h, w) distill label
    maps. For throughput, prefer `PrecomputedTeacher`."""
    b, H, W = images.shape[:3]
    h, w = H // 8, W // 8
    out = []
    for i in range(b):
        img = np.asarray(images[i])
        kpts = np.asarray(teacher(img), np.float32).reshape(-1, 2)[:max_kpts]
        pad = max_kpts - len(kpts)
        valid = np.arange(max_kpts) < len(kpts)
        kpts = np.concatenate([kpts, np.zeros((pad, 2), np.float32)])
        out.append(distill_labels_from_kpts(jnp.asarray(kpts),
                                            jnp.asarray(valid), h, w))
    return jnp.stack(out)


class PrecomputedTeacher:
    """Teacher keypoints precomputed to an .npz (key per image id). Create
    with `save_teacher_keypoints`; serves label maps with zero in-loop
    teacher cost (removes the reference's per-step GPU->CPU teacher
    round-trip, losses.py:78-81)."""

    def __init__(self, npz_path: str):
        self._data = np.load(npz_path, allow_pickle=True)

    def labels(self, image_id: str, hw: tuple, max_kpts: int = 1024
               ) -> jax.Array:
        h, w = hw
        kpts = np.asarray(self._data[image_id], np.float32)[:max_kpts]
        pad = max_kpts - len(kpts)
        valid = np.arange(max_kpts) < len(kpts)
        kpts = np.concatenate([kpts, np.zeros((pad, 2), np.float32)])
        return distill_labels_from_kpts(jnp.asarray(kpts),
                                        jnp.asarray(valid), h, w)


def save_teacher_keypoints(npz_path: str,
                           kpts_by_id: Dict[str, np.ndarray]) -> None:
    np.savez_compressed(npz_path,
                        **{k: np.asarray(v, np.float32)
                           for k, v in kpts_by_id.items()})


def make_xfeat_teacher(weights: str, top_k: int = 1024,
                       detection_threshold: float = 0.05):
    """On-device teacher: a (stronger / pretrained) XFeat detector whose
    keypoints supervise the keypoint head — the TPU-native replacement for
    the reference's in-loop ALIKE CPU round-trip (losses.py:78-81). Returns
    a jitted batch function (B,H,W,1)[0,1] -> (B,h,w) int32 label maps."""
    import jax
    from ..api import load_params
    from ..ops.extraction import detect_and_compute

    params = load_params(weights)

    @jax.jit
    def labels_fn(images: jax.Array) -> jax.Array:
        out = detect_and_compute(params, images, top_k=top_k,
                                 detection_threshold=detection_threshold)
        h, w = images.shape[1] // 8, images.shape[2] // 8
        return jax.vmap(lambda k, v: distill_labels_from_kpts(k, v, h, w))(
            out["keypoints"], out["valid"])

    return labels_fn
