"""ScanNet-1500 relative-pose benchmark harness.

Protocol follows the reference (modules/eval/scannet1500.py): the LoFTR pair
list (`test.npz` with scene/image indices), per-scene intrinsics and
ground-truth poses from the ScanNet export, match extraction with on-disk
caching, a RANSAC-threshold sweep (0.5..6.0 px) with best-mean selection,
and AUC@{5,10,20} of max(angular R, t error). Pose estimation uses our
native posekit LO-RANSAC (reference used poselib or OpenCV,
scannet1500.py:48-92).
"""

from __future__ import annotations

import argparse
import json
import os
from concurrent.futures import ProcessPoolExecutor
from typing import Dict, List, Optional, Tuple

import numpy as np

from .metrics import pose_errors_to_summary, relative_pose_error

THRESHOLDS = [0.5 * i for i in range(1, 13)]  # 0.5 .. 6.0 (reference sweep)


def load_pair_list(npz_path: str) -> List[dict]:
    """LoFTR-format test.npz: array 'name' of (scene, sub, im0, im1)
    (reference scannet1500.py:171-190)."""
    data = np.load(npz_path)
    names = data["name"]
    pairs = []
    for scene, sub, i0, i1 in names:
        sname = f"scene{int(scene):04d}_{int(sub):02d}"
        pairs.append({
            "scene": sname,
            "im0": f"{sname}/color/{int(i0)}.jpg",
            "im1": f"{sname}/color/{int(i1)}.jpg",
            "pose0": f"{sname}/pose/{int(i0)}.txt",
            "pose1": f"{sname}/pose/{int(i1)}.txt",
            "intrinsic": f"{sname}/intrinsic/intrinsic_color.txt",
        })
    return pairs


def read_pose(path: str) -> np.ndarray:
    return np.loadtxt(path).reshape(4, 4)


def rel_pose_0to1(pose0_c2w: np.ndarray, pose1_c2w: np.ndarray) -> np.ndarray:
    """ScanNet poses are camera-to-world; T_0to1 = inv(pose1) @ pose0."""
    return np.linalg.inv(pose1_c2w) @ pose0_c2w


def _read_match_cache(cache_path, cache_meta, n_pairs):
    """Return cached matches if the file exists AND matches the config
    meta + pair count; None (with a notice) otherwise."""
    if not (cache_path and os.path.exists(cache_path)):
        return None
    data = np.load(cache_path, allow_pickle=True)
    stored_meta = str(data["meta"]) if "meta" in data else None
    if ((cache_meta is None or stored_meta == cache_meta)
            and len(data["matches"]) == n_pairs):
        return [tuple(m) for m in data["matches"]]
    print(f"[ScanNet-1500] cache {cache_path} is for a different "
          f"configuration ({stored_meta!r} != {cache_meta!r}); "
          "recomputing matches")
    return None


def _write_match_cache(cache_path, matches, cache_meta):
    # build the object array explicitly: np.asarray(out, dtype=object)
    # on homogeneous-shape match lists produces a 4-D numeric-style
    # object array that doesn't round-trip as a list of pairs
    arr = np.empty(len(matches), dtype=object)
    for i, m in enumerate(matches):
        arr[i] = m
    np.savez_compressed(cache_path, matches=arr,
                        meta=np.str_(cache_meta or ""))


def extract_matches(matcher_fn, data_root: str, pairs: List[dict],
                    cache_path: Optional[str] = None, progress: bool = True,
                    cache_meta: Optional[str] = None
                    ) -> List[Tuple[np.ndarray, np.ndarray]]:
    """Run the matcher over all pairs, with npz caching
    (reference scannet1500.py:207-230).

    `cache_meta`: identity string for the matcher configuration (matcher
    name, weights, top_k, pair list). Stored in the cache file; a cached
    file whose meta differs (or whose pair count differs) is recomputed
    instead of silently serving another configuration's matches."""
    import cv2
    cached = _read_match_cache(cache_path, cache_meta, len(pairs))
    if cached is not None:
        return cached
    out = []
    it = pairs
    if progress:
        try:
            import tqdm
            it = tqdm.tqdm(pairs, desc="[ScanNet-1500] matching")
        except ImportError:
            pass
    for pair in it:
        im0 = cv2.imread(os.path.join(data_root, pair["im0"]))
        im1 = cv2.imread(os.path.join(data_root, pair["im1"]))
        if im0 is None or im1 is None:
            raise FileNotFoundError(pair)
        mk0, mk1 = matcher_fn(im0, im1)
        out.append((np.asarray(mk0), np.asarray(mk1)))
    if cache_path:
        _write_match_cache(cache_path, out, cache_meta)
    return out


def extract_matches_batched(data_root: str, pairs: List[dict],
                            top_k: int = 4096,
                            weights: Optional[str] = None,
                            batch_size: int = 16,
                            detection_threshold: float = 0.05,
                            cache_path: Optional[str] = None,
                            cache_meta: Optional[str] = None,
                            progress: bool = True
                            ) -> List[Tuple[np.ndarray, np.ndarray]]:
    """Batched sparse matching over the pair list: every ScanNet eval
    image is 640x480, so extraction runs as full fixed-shape batches and
    matching as a vmapped masked MNN (eval/batched.py) — same results as
    the per-pair `extract_matches` with XFeat.match_xfeat, at batch
    operating points. Honors the same cache file format/meta."""
    cached = _read_match_cache(cache_path, cache_meta, len(pairs))
    if cached is not None:
        return cached

    from ..api import load_params
    from .batched import extract_features_batched, match_pairs_batched

    params = load_params(weights)
    images = {}
    for i, pair in enumerate(pairs):
        images[(i, 0)] = pair["im0"]
        images[(i, 1)] = pair["im1"]
    # dedup identical image paths across pairs (ScanNet reuses frames)
    by_path = {}
    for key, path in images.items():
        by_path.setdefault(path, []).append(key)
    records = [(path, path, None) for path in by_path]
    feats_by_path = extract_features_batched(
        params, records, data_root, top_k, detection_threshold,
        None, batch_size, progress, tag="ScanNet-1500 batched")
    feats = {key: feats_by_path[path]
             for path, keys in by_path.items() for key in keys}
    out = match_pairs_batched(
        feats, [((i, 0), (i, 1)) for i in range(len(pairs))], batch_size)
    if cache_path:
        _write_match_cache(cache_path, out, cache_meta)
    return out


def _pose_error_one(args):
    mk0, mk1, K, T_0to1, thr, backend = args
    err = {"R_err": 180.0, "t_err": 180.0}
    if len(mk0) >= 5:
        from ..geometry import get_pose_estimator
        res = get_pose_estimator(backend)(mk0, mk1, K, K,
                                          max_epipolar_error=thr,
                                          success_prob=0.99999)
        if res is not None:
            R, t, _ = res
            err = relative_pose_error(T_0to1, R, t)
    return max(err["R_err"], err["t_err"])


def run_threshold_sweep(matches, gt: List[dict], thresholds=THRESHOLDS,
                        workers: int = 0,
                        cache_dir: Optional[str] = None,
                        pose_backend: str = "posekit"
                        ) -> Dict[str, Dict[str, float]]:
    """Evaluate every RANSAC threshold; reference sweeps and reports the
    best-mean threshold (scannet1500.py:258-311). With `cache_dir`,
    per-threshold pose-error files are cached so interrupted sweeps resume
    incrementally (reference scannet1500.py:242-251)."""
    results = {}
    if cache_dir:
        os.makedirs(cache_dir, exist_ok=True)
        # Key cached error files by the pose backend AND a digest of the
        # match set, so re-running with a different matcher/backend in the
        # same cache_dir recomputes instead of silently reusing stale errors.
        import hashlib
        h = hashlib.sha1()
        for mk0, mk1 in matches:
            h.update(np.ascontiguousarray(mk0, np.float32).tobytes())
            h.update(np.ascontiguousarray(mk1, np.float32).tobytes())
        tag = f"{pose_backend}_{h.hexdigest()[:10]}"
    if workers > 1 and pose_backend == "tpu":
        raise ValueError("pose_backend='tpu' is single-process "
                         "(one device); use workers<=1")
    # one spawn pool for the WHOLE sweep: each spawned worker re-imports
    # the package (incl. jax) at startup, so per-threshold pools would pay
    # that cost 12x. spawn (not fork): the parent may hold a live TPU
    # client; workers build the ctypes posekit library lazily on first use
    # (the build is atomic-rename, so concurrent first builds are safe).
    ex = None
    if workers > 1:
        import multiprocessing as mp
        ex = ProcessPoolExecutor(max_workers=workers,
                                 mp_context=mp.get_context("spawn"))
    try:
        for thr in thresholds:
            err_path = (os.path.join(cache_dir,
                                     f"errors_{tag}_thr_{thr:g}.npy")
                        if cache_dir else None)
            if err_path and os.path.exists(err_path):
                pose_errs = np.load(err_path).tolist()
            else:
                jobs = [(m[0], m[1], g["K"], g["T_0to1"], thr, pose_backend)
                        for m, g in zip(matches, gt)]
                if ex is not None:
                    pose_errs = list(ex.map(_pose_error_one, jobs,
                                            chunksize=16))
                else:
                    pose_errs = [_pose_error_one(j) for j in jobs]
                if err_path:
                    np.save(err_path, np.asarray(pose_errs, np.float64))
            errors = [{"R_err": e, "t_err": e} for e in pose_errs]
            results[f"thr_{thr}"] = pose_errors_to_summary(errors)
    finally:
        if ex is not None:
            ex.shutdown()
    return results


def best_result(sweep: Dict[str, Dict[str, float]]) -> Dict[str, float]:
    best_key = max(sweep, key=lambda k: (sweep[k]["auc@5"] +
                                         sweep[k]["auc@10"] +
                                         sweep[k]["auc@20"]) / 3)
    out = dict(sweep[best_key])
    out["best_threshold"] = float(best_key.split("_")[1])
    return out


def run_benchmark(matcher_fn, data_root: str, npz_path: str,
                  cache_path: Optional[str] = None,
                  workers: int = 0,
                  cache_dir: Optional[str] = None,
                  summary_path: Optional[str] = None,
                  pose_backend: str = "posekit",
                  cache_meta: Optional[str] = None,
                  batched: Optional[dict] = None) -> Dict[str, float]:
    """`batched`: dict of extract_matches_batched kwargs (top_k, weights,
    batch_size, detection_threshold) to use size-batched extraction +
    vmapped MNN instead of the per-pair matcher_fn (sparse mode only)."""
    pairs = load_pair_list(npz_path)
    if batched is not None:
        matches = extract_matches_batched(data_root, pairs,
                                          cache_path=cache_path,
                                          cache_meta=cache_meta, **batched)
    else:
        matches = extract_matches(matcher_fn, data_root, pairs, cache_path,
                                  cache_meta=cache_meta)
    gt = []
    for pair in pairs:
        K = np.loadtxt(os.path.join(data_root, pair["intrinsic"]))[:3, :3]
        T = rel_pose_0to1(read_pose(os.path.join(data_root, pair["pose0"])),
                          read_pose(os.path.join(data_root, pair["pose1"])))
        gt.append({"K": K, "T_0to1": T})
    sweep = run_threshold_sweep(matches, gt, workers=workers,
                                cache_dir=cache_dir,
                                pose_backend=pose_backend)
    best = best_result(sweep)
    if summary_path:
        with open(summary_path, "w") as f:
            json.dump({"sweep": sweep, "best": best}, f, indent=2)
    return best


def report(summary_paths: List[str], metric_keys=("auc@5", "auc@10",
                                                  "auc@20", "mAcc")):
    """Pandas summary table over saved sweep JSONs — the reference's
    `--show` reporter (scannet1500.py:293-452). Rows = (run, threshold),
    plus a 'best' row per run; returns the DataFrame (also printed)."""
    import pandas as pd
    rows = []
    for path in summary_paths:
        with open(path) as f:
            data = json.load(f)
        run = os.path.splitext(os.path.basename(path))[0]
        def _get(summ, k):
            # mAcc (mean of acc@{5,10,20}) is derived, not stored
            if k == "mAcc" and k not in summ:
                accs = [summ.get(f"acc@{t}") for t in (5, 10, 20)]
                return (float(np.mean(accs))
                        if all(a is not None for a in accs) else None)
            return summ.get(k)

        for key, summ in data.get("sweep", {}).items():
            rows.append({"run": run, "threshold": float(key.split("_")[1]),
                         **{k: _get(summ, k) for k in metric_keys}})
        best = data.get("best")
        if best:
            rows.append({"run": run,
                         "threshold": best.get("best_threshold"),
                         "best": True,
                         **{k: _get(best, k) for k in metric_keys}})
    df = pd.DataFrame(rows)
    if not df.empty:
        df = df.sort_values(["run", "threshold"]).reset_index(drop=True)
    print(df.to_string(index=False))
    return df


def main():
    ap = argparse.ArgumentParser(description="ScanNet-1500 pose benchmark")
    ap.add_argument("--show", nargs="*", default=None,
                    help="print a pandas summary table over saved sweep "
                         "JSONs instead of running the benchmark")
    ap.add_argument("--data_root", type=str, default=None)
    ap.add_argument("--npz", type=str, default=None,
                    help="LoFTR test.npz pair list")
    ap.add_argument("--matcher", type=str, default="xfeat",
                    choices=["xfeat", "xfeat-star", "xfeat-lighterglue"])
    ap.add_argument("--weights", type=str, default=None)
    ap.add_argument("--lg_weights", type=str, default=None,
                    help="LighterGlue checkpoint (.pt/.npz) for the "
                         "xfeat-lighterglue matcher")
    ap.add_argument("--top_k", type=int, default=4096)
    ap.add_argument("--cache", type=str, default=None)
    ap.add_argument("--cache_dir", type=str, default=None,
                    help="per-threshold pose-error cache directory")
    ap.add_argument("--out", type=str, default=None,
                    help="write the full sweep + best summary JSON here")
    ap.add_argument("--workers", type=int, default=os.cpu_count())
    ap.add_argument("--pose_backend", type=str, default="posekit",
                    choices=["posekit", "tpu"],
                    help="posekit: native 5-pt LO-RANSAC (accuracy); "
                         "tpu: batched 8-pt MSAC on-device (single-process)")
    ap.add_argument("--batched", action="store_true",
                    help="size-batched extraction + vmapped MNN (sparse "
                         "'xfeat' matcher only; identical results, "
                         "batch-sized device work)")
    ap.add_argument("--batch_size", type=int, default=16)
    args = ap.parse_args()
    if args.batched and args.matcher != "xfeat":
        ap.error("--batched supports the sparse 'xfeat' matcher")
    if args.pose_backend == "tpu":
        args.workers = 1

    if args.show is not None:
        report(args.show)
        return
    if not args.data_root or not args.npz:
        ap.error("--data_root and --npz are required unless --show is given")

    fn = None
    if not args.batched:
        from .megadepth1500 import make_matcher
        fn = make_matcher(args.matcher, args.top_k, args.weights,
                          lg_weights=args.lg_weights)
    meta = (f"matcher={args.matcher} top_k={args.top_k} "
            f"weights={args.weights} lg_weights={args.lg_weights} "
            f"npz={os.path.basename(args.npz)} "
            f"mode={'batched-f32' if args.batched else 'perpair'}")
    batched = ({"top_k": args.top_k, "weights": args.weights,
                "batch_size": args.batch_size}
               if args.batched else None)
    print(json.dumps(run_benchmark(fn, args.data_root, args.npz, args.cache,
                                   args.workers, cache_dir=args.cache_dir,
                                   summary_path=args.out,
                                   pose_backend=args.pose_backend,
                                   cache_meta=meta, batched=batched),
                     indent=2))


if __name__ == "__main__":
    main()
