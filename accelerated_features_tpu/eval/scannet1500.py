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
from typing import Callable, Dict, List, Optional, Tuple

import numpy as np

from ..geometry import estimate_relative_pose
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


def extract_matches(matcher_fn, data_root: str, pairs: List[dict],
                    cache_path: Optional[str] = None, progress: bool = True
                    ) -> List[Tuple[np.ndarray, np.ndarray]]:
    """Run the matcher over all pairs, with npz caching
    (reference scannet1500.py:207-230)."""
    import cv2
    if cache_path and os.path.exists(cache_path):
        data = np.load(cache_path, allow_pickle=True)
        return list(data["matches"])
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
        np.savez_compressed(cache_path,
                            matches=np.asarray(out, dtype=object))
    return out


def _pose_error_one(args):
    mk0, mk1, K, T_0to1, thr = args
    err = {"R_err": 180.0, "t_err": 180.0}
    if len(mk0) >= 5:
        res = estimate_relative_pose(mk0, mk1, K, K, max_epipolar_error=thr,
                                     success_prob=0.99999)
        if res is not None:
            R, t, _ = res
            err = relative_pose_error(T_0to1, R, t)
    return max(err["R_err"], err["t_err"])


def run_threshold_sweep(matches, gt: List[dict], thresholds=THRESHOLDS,
                        workers: int = 0) -> Dict[str, Dict[str, float]]:
    """Evaluate every RANSAC threshold; reference sweeps and reports the
    best-mean threshold (scannet1500.py:258-311)."""
    results = {}
    for thr in thresholds:
        jobs = [(m[0], m[1], g["K"], g["T_0to1"], thr)
                for m, g in zip(matches, gt)]
        if workers > 1:
            # spawn (not fork): the parent may hold a live TPU client, and
            # spawned workers only need numpy + the ctypes posekit library
            import multiprocessing as mp
            with ProcessPoolExecutor(
                    max_workers=workers,
                    mp_context=mp.get_context("spawn")) as ex:
                pose_errs = list(ex.map(_pose_error_one, jobs,
                                        chunksize=16))
        else:
            pose_errs = [_pose_error_one(j) for j in jobs]
        errors = [{"R_err": e, "t_err": e} for e in pose_errs]
        results[f"thr_{thr}"] = pose_errors_to_summary(errors)
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
                  workers: int = 0) -> Dict[str, float]:
    pairs = load_pair_list(npz_path)
    matches = extract_matches(matcher_fn, data_root, pairs, cache_path)
    gt = []
    for pair in pairs:
        K = np.loadtxt(os.path.join(data_root, pair["intrinsic"]))[:3, :3]
        T = rel_pose_0to1(read_pose(os.path.join(data_root, pair["pose0"])),
                          read_pose(os.path.join(data_root, pair["pose1"])))
        gt.append({"K": K, "T_0to1": T})
    sweep = run_threshold_sweep(matches, gt, workers=workers)
    return best_result(sweep)


def main():
    ap = argparse.ArgumentParser(description="ScanNet-1500 pose benchmark")
    ap.add_argument("--data_root", type=str, required=True)
    ap.add_argument("--npz", type=str, required=True,
                    help="LoFTR test.npz pair list")
    ap.add_argument("--matcher", type=str, default="xfeat",
                    choices=["xfeat", "xfeat-star", "xfeat-lighterglue"])
    ap.add_argument("--weights", type=str, default=None)
    ap.add_argument("--top_k", type=int, default=4096)
    ap.add_argument("--cache", type=str, default=None)
    ap.add_argument("--workers", type=int, default=os.cpu_count())
    args = ap.parse_args()

    from .megadepth1500 import make_matcher
    fn = make_matcher(args.matcher, args.top_k, args.weights)
    print(json.dumps(run_benchmark(fn, args.data_root, args.npz, args.cache,
                                   args.workers), indent=2))


if __name__ == "__main__":
    main()
