"""Shared batched-extraction machinery for the eval harnesses.

Both pose benchmarks are per-pair loops in the reference (megadepth
megadepth1500.py:199-237, scannet scannet1500.py:207-230) — batch size 1
on the accelerator. These helpers bucket eval images by size, run
batched `detect_and_compute` per bucket, and match pairs with a vmapped
masked MNN, producing exactly the per-pair results (equivalence-tested
in tests/test_eval.py).
"""
from __future__ import annotations

import functools
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

Feats = Tuple[np.ndarray, np.ndarray, np.ndarray]   # kpts, descs, valid


def extract_features_batched(params, records: Sequence[tuple],
                             data_root: str, top_k: int,
                             detection_threshold: float,
                             compute_dtype=None, batch_size: int = 8,
                             progress: bool = True,
                             tag: str = "batched-extract"
                             ) -> Dict[object, Feats]:
    """records: (key, relative_path, size_hw or None). Images sharing a
    size_hw are grouped into fixed-shape batches; size_hw None means "use
    the file's native size" (such images are bucketed by actual shape
    after loading the first of each). Returns {key: (kpts, descs, valid)}.
    """
    import cv2
    import jax
    import jax.numpy as jnp

    from ..ops.extraction import detect_and_compute

    if compute_dtype is None:
        compute_dtype = (jnp.bfloat16 if jax.default_backend() == "tpu"
                         else jnp.float32)
    jit_dac = jax.jit(functools.partial(
        detect_and_compute, top_k=top_k,
        detection_threshold=detection_threshold,
        compute_dtype=compute_dtype))

    def load(path, size_hw):
        im = cv2.imread(os.path.join(data_root, path))
        if im is None:
            raise FileNotFoundError(path)
        if size_hw is not None and im.shape[:2] != tuple(size_hw):
            im = cv2.resize(im, (int(size_hw[1]), int(size_hw[0])))
        return im.astype(np.float32) / 255.0

    buckets: Dict[tuple, list] = {}
    for key, path, size_hw in records:
        bkey = tuple(int(x) for x in size_hw) if size_hw is not None else None
        buckets.setdefault(bkey, []).append((key, path, size_hw))

    # native-size images: resolve their real shapes into buckets
    native = buckets.pop(None, [])
    for key, path, _ in native:
        import cv2 as _cv2
        im = _cv2.imread(os.path.join(data_root, path))
        if im is None:
            raise FileNotFoundError(path)
        buckets.setdefault(im.shape[:2], []).append((key, path, None))

    out: Dict[object, Feats] = {}
    total = sum(len(v) for v in buckets.values())
    done = 0
    for bkey, recs in buckets.items():
        for c0 in range(0, len(recs), batch_size):
            chunk = recs[c0:c0 + batch_size]
            imgs = np.stack([load(p, s if s is not None else bkey)
                             for _, p, s in chunk])
            res = jit_dac(params, jnp.asarray(imgs))
            kpts = np.asarray(res["keypoints"])
            descs = np.asarray(res["descriptors"])
            valid = np.asarray(res["valid"])
            for j, (key, _, _) in enumerate(chunk):
                out[key] = (kpts[j], descs[j], valid[j])
            done += len(chunk)
            if progress:
                print(f"\r[{tag}] {done}/{total}", end="", flush=True)
    if progress and total:
        print()
    return out


def match_pairs_batched(feats: Dict[object, Feats],
                        id_pairs: Sequence[Tuple[object, object]],
                        batch_size: int = 8, min_cossim: float = -1.0
                        ) -> List[Tuple[np.ndarray, np.ndarray]]:
    """Vmapped masked MNN over (key0, key1) pairs; returns compacted
    (mkpts0, mkpts1) per pair — same semantics as XFeat.match on each
    pair individually."""
    import jax
    import numpy as np

    from ..ops.matching import mnn_match

    bmatch = jax.jit(jax.vmap(
        lambda a, b, va, vb: mnn_match(a, b, va, vb,
                                       min_cossim=min_cossim)))
    matches: List[Tuple[np.ndarray, np.ndarray]] = []
    for c0 in range(0, len(id_pairs), batch_size):
        chunk = id_pairs[c0:c0 + batch_size]
        d0 = np.stack([feats[a][1] for a, _ in chunk])
        d1 = np.stack([feats[b][1] for _, b in chunk])
        v0 = np.stack([feats[a][2] for a, _ in chunk])
        v1 = np.stack([feats[b][2] for _, b in chunk])
        idx1, mask = map(np.asarray, bmatch(d0, d1, v0, v1))
        for j, (a, b) in enumerate(chunk):
            sel = mask[j]
            matches.append((feats[a][0][sel], feats[b][0][idx1[j][sel]]))
    return matches
