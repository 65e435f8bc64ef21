"""Shared batched-extraction machinery for the eval harnesses.

Both pose benchmarks are per-pair loops in the reference (megadepth
megadepth1500.py:199-237, scannet scannet1500.py:207-230) — batch size 1
on the accelerator. These helpers bucket eval images by size, run
batched `detect_and_compute` per bucket, and match pairs with a vmapped
masked MNN, producing exactly the per-pair results (equivalence-tested
in tests/test_eval.py).

`compute_dtype` defaults to float32 everywhere — the same dtype the
per-pair path (XFeat's default) uses — so batched and per-pair runs are
numerically identical; pass bfloat16 explicitly for throughput mode and
record it in any cache key.
"""
from __future__ import annotations

import functools
import os
from typing import Dict, List, Sequence, Tuple

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
    the file's native size" (bucketed by actual shape, each file decoded
    exactly once, buckets flushed as they fill). Short final chunks are
    padded to `batch_size` by repeating the last image (one compiled
    program per shape instead of one per remainder size).
    Returns {key: (kpts, descs, valid)}."""
    import cv2
    import jax
    import jax.numpy as jnp

    from ..ops.extraction import detect_and_compute

    if compute_dtype is None:
        compute_dtype = jnp.float32      # per-pair-path parity default
    jit_dac = jax.jit(functools.partial(
        detect_and_compute, top_k=top_k,
        detection_threshold=detection_threshold,
        compute_dtype=compute_dtype))

    out: Dict[object, Feats] = {}
    total = len(records)
    done = 0

    def run_batch(chunk_keys, imgs):
        nonlocal done
        n = len(imgs)
        while len(imgs) < batch_size:    # pad tail: one program per shape
            imgs = imgs + [imgs[-1]]
        res = jit_dac(params, jnp.asarray(np.stack(imgs)))
        kpts = np.asarray(res["keypoints"])[:n]
        descs = np.asarray(res["descriptors"])[:n]
        valid = np.asarray(res["valid"])[:n]
        for j, key in enumerate(chunk_keys):
            out[key] = (kpts[j], descs[j], valid[j])
        done += n
        if progress:
            print(f"\r[{tag}] {done}/{total}", end="", flush=True)

    def decode(path, size_hw=None):
        im = cv2.imread(os.path.join(data_root, path))
        if im is None:
            raise FileNotFoundError(path)
        if size_hw is not None and im.shape[:2] != tuple(size_hw):
            im = cv2.resize(im, (int(size_hw[1]), int(size_hw[0])))
        # keep uint8: /255 runs inside the jitted extraction
        # (ops.resize.to_unit_float) exactly like the per-pair API path,
        # so batched and sequential evals share one normalization program
        # (and the host->device transfer is 1/4 the float32 bytes)
        return im

    # fixed-size records: lazy per-chunk decode, grouped up front
    sized: Dict[tuple, list] = {}
    native: List[tuple] = []
    for key, path, size_hw in records:
        if size_hw is None:
            native.append((key, path))
        else:
            sized.setdefault(tuple(int(x) for x in size_hw), []) \
                .append((key, path))
    for hw, recs in sized.items():
        for c0 in range(0, len(recs), batch_size):
            chunk = recs[c0:c0 + batch_size]
            run_batch([k for k, _ in chunk],
                      [decode(p, hw) for _, p in chunk])

    # native-size records: decode once, stream into shape buckets and
    # flush each bucket as it fills (bounded memory: at most
    # n_shapes * batch_size decoded images held)
    pend: Dict[tuple, list] = {}
    for key, path in native:
        im = decode(path)
        b = pend.setdefault(im.shape[:2], [])
        b.append((key, im))
        if len(b) == batch_size:
            run_batch([k for k, _ in b], [im for _, im in b])
            b.clear()
    for b in pend.values():
        if b:
            run_batch([k for k, _ in b], [im for _, im in b])
    if progress and total:
        print()
    return out


def match_pairs_batched(feats: Dict[object, Feats],
                        id_pairs: Sequence[Tuple[object, object]],
                        batch_size: int = 8, min_cossim: float = -1.0
                        ) -> List[Tuple[np.ndarray, np.ndarray]]:
    """Vmapped masked MNN over (key0, key1) pairs; returns compacted
    (mkpts0, mkpts1) per pair — same semantics as XFeat.match on each
    pair individually. The final short chunk is padded by repetition so
    only one program compiles."""
    import jax

    from ..ops.matching import mnn_match

    bmatch = jax.jit(jax.vmap(
        lambda a, b, va, vb: mnn_match(a, b, va, vb,
                                       min_cossim=min_cossim)))
    matches: List[Tuple[np.ndarray, np.ndarray]] = []
    for c0 in range(0, len(id_pairs), batch_size):
        chunk = list(id_pairs[c0:c0 + batch_size])
        n = len(chunk)
        while len(chunk) < batch_size:
            chunk.append(chunk[-1])
        d0 = np.stack([feats[a][1] for a, _ in chunk])
        d1 = np.stack([feats[b][1] for _, b in chunk])
        v0 = np.stack([feats[a][2] for a, _ in chunk])
        v1 = np.stack([feats[b][2] for _, b in chunk])
        idx1, mask = map(np.asarray, bmatch(d0, d1, v0, v1))
        for j in range(n):
            a, b = chunk[j]
            sel = mask[j]
            matches.append((feats[a][0][sel], feats[b][0][idx1[j][sel]]))
    return matches
