"""Incremental SLAM front end: online keyframe selection, pose tracking,
sliding-window bundle adjustment, loop closure, and relocalization.

Completes the north-star SLAM capability (BASELINE.json) on top of the
batch SfM layer: frames stream in, each is matched against the last
keyframe; relative pose comes from the native LO-RANSAC; keyframes are
inserted on viewpoint change or match decay; a windowed BA over the last W
keyframes refines poses and the local map after every insertion. The same
BAProblem machinery scales the window BA across a mesh
(parallel/ba.bundle_adjust_sharded) unchanged.

Loop closure: every new keyframe is scored against past keyframes by a
pooled global descriptor (mean of L2-normalized local descriptors); the
top candidates beyond a temporal gap are MNN-matched and geometrically
verified with the same LO-RANSAC. A verified loop adds an edge to the pose
graph and triggers full pose-graph optimization, distributing accumulated
drift around the loop (the reference has no SLAM at all; nearest anchor is
its two-view eval geometry, megadepth1500.py:98-113).

Relocalization: when tracking is lost (too few matches/inliers against the
last keyframe), the same retrieval + verification machinery searches ALL
keyframes and re-anchors the track on the best match.

The extractor/matcher are injectable callables so the tracker is testable
with synthetic geometry and usable with any feature front end (default:
XFeat sparse + MNN).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..geometry import estimate_relative_pose
from .ba import BAProblem, bundle_adjust, reprojection_rmse
from .lie import se3_compose, se3_from_Rt
from .posegraph import PoseGraph, optimize_pose_graph
from .tracks import build_tracks, triangulate_tracks


@dataclasses.dataclass
class SlamConfig:
    window: int = 6                 # keyframes in the BA window
    kf_min_inliers: int = 60        # insert KF when inliers drop below
    kf_max_inlier_ratio: float = 0.6  # ... or inlier ratio decays below
    min_matches: int = 20           # below this the frame is untrackable
    ba_iters: int = 6
    cg_iters: int = 25
    ransac_px: float = 2.0
    min_track_length: int = 2
    # loop closure / relocalization
    enable_loop_closure: bool = True
    loop_min_gap: int = 4           # skip this many most-recent keyframes
    loop_candidates: int = 3        # geometric checks per new keyframe
    loop_min_sim: float = 0.6       # global-descriptor cosine gate
    loop_min_inliers: int = 30      # RANSAC inliers to accept a loop
    reloc_min_inliers: int = 25     # RANSAC inliers to accept a reloc


@dataclasses.dataclass
class Keyframe:
    index: int                       # keyframe id
    features: Dict[str, np.ndarray]  # 'keypoints' (N,2), 'descriptors'
    pose6: np.ndarray                # world->cam
    global_desc: np.ndarray          # pooled retrieval descriptor


def _global_desc(feats: Dict[str, np.ndarray]) -> np.ndarray:
    """Pooled retrieval descriptor; zero vector when the front end provides
    no descriptors (retrieval then never fires — plain odometry)."""
    d = np.asarray(feats.get("descriptors",
                             np.zeros((0, 1), np.float32)), np.float32)
    if d.size == 0:
        return np.zeros((1,), np.float32)
    d = d / np.maximum(np.linalg.norm(d, axis=1, keepdims=True), 1e-12)
    g = d.mean(0)
    return g / max(np.linalg.norm(g), 1e-12)


class IncrementalSlam:
    """Streaming tracker. `extract(image) -> {'keypoints','descriptors'}`
    and `match(d0, d1) -> (idx0, idx1)` are injectable."""

    def __init__(self, K: np.ndarray, config: Optional[SlamConfig] = None,
                 extract: Optional[Callable] = None,
                 match: Optional[Callable] = None):
        self.K = np.asarray(K, np.float64)
        # fresh default per instance: SlamConfig is mutable, so a shared
        # default instance would leak config edits across trackers
        self.cfg = config if config is not None else SlamConfig()
        self._extract = extract
        self._match = match
        self._xfeat = None

        self.graph = PoseGraph.empty()
        self.keyframes: List[Keyframe] = []
        self.pair_matches: Dict[Tuple[int, int],
                                Tuple[np.ndarray, np.ndarray]] = {}
        self.current_pose = np.zeros(6, np.float32)
        self.n_frames = 0
        self.n_loop_closures = 0
        self.n_relocalizations = 0
        self.last_ba_rmse: Optional[float] = None
        self._ba_cache = {}

    # ------------------------------------------------------------ defaults

    def _default_extract(self, image):
        if self._xfeat is None:
            from ..api import XFeat
            self._xfeat = XFeat(top_k=2048)
        return self._xfeat.detectAndCompute(image)[0]

    def _default_match(self, d0, d1):
        from ..api import XFeat
        if self._xfeat is None:
            self._xfeat = XFeat(top_k=2048)
        return self._xfeat.match(d0["descriptors"], d1["descriptors"],
                                 min_cossim=-1)

    # ------------------------------------------------------------ pipeline

    def process_frame(self, image) -> Dict[str, np.ndarray]:
        """Track one frame. Returns {'pose6', 'is_keyframe', 'n_inliers',
        'loop_closed', 'relocalized'}."""
        extract = self._extract or self._default_extract
        match = self._match or self._default_match
        feats = extract(image)
        self.n_frames += 1
        loop_closed = False
        relocalized = False

        if not self.keyframes:
            self._insert_keyframe(feats, np.zeros(6, np.float32))
            return {"pose6": self.current_pose.copy(), "is_keyframe": True,
                    "n_inliers": 0, "loop_closed": False,
                    "relocalized": False}

        kf = self.keyframes[-1]
        i0, i1 = match(kf.features, feats)
        n_matches = len(i0)
        rel = np.zeros(6, np.float32)
        n_inl = 0
        inlier_mask = np.zeros(n_matches, bool)
        if n_matches >= self.cfg.min_matches:
            res = estimate_relative_pose(
                kf.features["keypoints"][i0], feats["keypoints"][i1],
                self.K, self.K, max_epipolar_error=self.cfg.ransac_px)
            if res is not None:
                R, t, inlier_mask = res
                n_inl = int(inlier_mask.sum())
                rel = np.asarray(se3_from_Rt(
                    jnp.asarray(R, jnp.float32), jnp.asarray(t, jnp.float32)))

        if n_inl < 8:
            # tracking lost -> relocalize against the whole keyframe set
            anchor = self._relocalize(feats, match)
            if anchor is not None:
                kf, i0, i1, rel, inlier_mask, n_inl = anchor
                relocalized = True
                self.n_relocalizations += 1

        self.current_pose = np.asarray(
            se3_compose(jnp.asarray(rel), jnp.asarray(kf.pose6)), np.float32)

        is_kf = relocalized or (
            n_inl < self.cfg.kf_min_inliers or
            n_inl < self.cfg.kf_max_inlier_ratio * max(n_matches, 1))
        if is_kf and n_inl >= 8:
            prev = kf.index
            new_idx = self._insert_keyframe(feats, self.current_pose)
            mask_idx = np.nonzero(inlier_mask)[0]
            self.pair_matches[(prev, new_idx)] = (i0[mask_idx], i1[mask_idx])
            self.graph.add_edge(prev, new_idx, rel,
                                weight=float(max(n_inl, 1)))
            if self.cfg.enable_loop_closure:
                loop_closed = self._try_loop_closure(new_idx, match)
            if not loop_closed:
                self._window_ba()
        return {"pose6": self.current_pose.copy(), "is_keyframe": bool(is_kf),
                "n_inliers": n_inl, "loop_closed": loop_closed,
                "relocalized": relocalized}

    # ------------------------------------------------------- loop closure

    def _retrieve(self, gdesc: np.ndarray, exclude_after: int,
                  k: int) -> List[int]:
        """Top-k past keyframes by pooled-descriptor cosine similarity."""
        sims = [(float(np.dot(kf.global_desc, gdesc)), kf.index)
                for kf in self.keyframes if kf.index < exclude_after]
        sims.sort(reverse=True)
        return [idx for s, idx in sims[:k] if s >= self.cfg.loop_min_sim]

    def _verify_pair(self, kf_old: Keyframe, feats, match):
        """MNN + LO-RANSAC geometric verification against one keyframe."""
        i0, i1 = match(kf_old.features, feats)
        if len(i0) < self.cfg.min_matches:
            return None
        res = estimate_relative_pose(
            kf_old.features["keypoints"][i0], feats["keypoints"][i1],
            self.K, self.K, max_epipolar_error=self.cfg.ransac_px)
        if res is None:
            return None
        R, t, mask = res
        rel = np.asarray(se3_from_Rt(jnp.asarray(R, jnp.float32),
                                     jnp.asarray(t, jnp.float32)))
        return i0, i1, rel, mask, int(mask.sum())

    def _try_loop_closure(self, new_idx: int, match) -> bool:
        """Detect + close a loop for the just-inserted keyframe `new_idx`:
        retrieval by pooled descriptor, geometric verification, loop edge,
        then full pose-graph optimization to spread the drift."""
        kf_new = self.keyframes[new_idx]
        cands = self._retrieve(kf_new.global_desc,
                               new_idx - self.cfg.loop_min_gap,
                               self.cfg.loop_candidates)
        closed = False
        for cand in cands:
            ver = self._verify_pair(self.keyframes[cand], kf_new.features,
                                    match)
            if ver is None or ver[4] < self.cfg.loop_min_inliers:
                continue
            i0, i1, rel, mask, n_inl = ver
            mask_idx = np.nonzero(mask)[0]
            self.pair_matches[(cand, new_idx)] = (i0[mask_idx], i1[mask_idx])
            self.graph.add_edge(cand, new_idx, rel,
                                weight=float(n_inl))
            closed = True
        if closed:
            self.n_loop_closures += 1
            poses, _ = optimize_pose_graph(self.graph)
            self.graph.poses = np.array(poses)  # writable copy
            for kf in self.keyframes:
                kf.pose6 = poses[kf.index].astype(np.float32)
            self.current_pose = self.keyframes[-1].pose6.copy()
            self._window_ba()
        return closed

    def _relocalize(self, feats, match):
        """Search all keyframes for the lost frame; return the best anchor
        (kf, i0, i1, rel, mask, n_inl) or None."""
        gdesc = _global_desc(feats)
        cands = self._retrieve(gdesc, len(self.keyframes),
                               self.cfg.loop_candidates)
        best = None
        for cand in cands:
            ver = self._verify_pair(self.keyframes[cand], feats, match)
            if ver is None or ver[4] < self.cfg.reloc_min_inliers:
                continue
            if best is None or ver[4] > best[5]:
                i0, i1, rel, mask, n_inl = ver
                best = (self.keyframes[cand], i0, i1, rel, mask, n_inl)
        return best

    def _insert_keyframe(self, feats, pose6) -> int:
        self.keyframes.append(Keyframe(
            len(self.keyframes), feats, np.asarray(pose6, np.float32),
            _global_desc(feats)))
        self.graph.add_keyframe(pose6)
        return len(self.keyframes) - 1

    # ------------------------------------------------------------ window BA

    def _window_ba(self):
        cfg = self.cfg
        n_kf = len(self.keyframes)
        lo = max(0, n_kf - cfg.window)
        window = list(range(lo, n_kf))
        pairs = {(i - lo, j - lo): m
                 for (i, j), m in self.pair_matches.items()
                 if i in window and j in window}
        if not pairs:
            return
        kpts = [self.keyframes[i].features["keypoints"] for i in window]
        obs_cam, obs_pt, obs_uv, n_tracks = build_tracks(
            pairs, kpts, min_length=cfg.min_track_length)
        if n_tracks < 8:
            return
        poses = np.stack([self.keyframes[i].pose6 for i in window])
        X = triangulate_tracks(obs_cam, obs_pt, obs_uv, n_tracks,
                               poses, self.K.astype(np.float32))
        good = np.isfinite(X).all(1) & (np.linalg.norm(X, axis=1) < 1e4)
        keep_obs = good[obs_pt]
        remap = np.cumsum(good) - 1
        obs_cam, obs_pt, obs_uv = (obs_cam[keep_obs],
                                   remap[obs_pt[keep_obs]].astype(np.int32),
                                   obs_uv[keep_obs])
        X = X[good]
        if len(X) < 8:
            return

        fixed = np.zeros(len(window), bool)
        fixed[0] = True
        # bucket point/observation counts to powers of two so successive
        # window BAs reuse the same compiled program (masked padding)
        n_obs = len(obs_cam)
        pt_cap = 1 << max(int(np.ceil(np.log2(max(len(X), 64)))), 6)
        obs_cap = 1 << max(int(np.ceil(np.log2(max(n_obs, 128)))), 7)
        Xp = np.zeros((pt_cap, 3), np.float32)
        Xp[:len(X)] = X
        Xp[len(X):, 2] = 1.0  # benign padding in front of the cameras
        oc = np.zeros(obs_cap, np.int32)
        op = np.zeros(obs_cap, np.int32)
        ouv = np.zeros((obs_cap, 2), np.float32)
        oc[:n_obs] = obs_cam
        op[:n_obs] = obs_pt
        ouv[:n_obs] = obs_uv
        omask = np.arange(obs_cap) < n_obs
        problem = BAProblem(
            cams=jnp.asarray(poses),
            points=jnp.asarray(Xp),
            K=jnp.asarray(self.K, jnp.float32),
            obs_cam=jnp.asarray(oc), obs_pt=jnp.asarray(op),
            obs_uv=jnp.asarray(ouv),
            obs_mask=jnp.asarray(omask),
            fixed_cams=jnp.asarray(fixed))
        solved, _ = self._ba_fn()(problem)
        self.last_ba_rmse = float(reprojection_rmse(solved))
        new_poses = np.asarray(solved.cams)
        for w_idx, kf_idx in enumerate(window):
            self.keyframes[kf_idx].pose6 = new_poses[w_idx]
            self.graph.poses[kf_idx] = new_poses[w_idx]
        self.current_pose = self.keyframes[-1].pose6.copy()

    def _ba_fn(self):
        key = (self.cfg.ba_iters, self.cfg.cg_iters)
        if key not in self._ba_cache:
            import functools
            self._ba_cache[key] = jax.jit(functools.partial(
                bundle_adjust, iters=self.cfg.ba_iters,
                cg_iters=self.cfg.cg_iters))
        return self._ba_cache[key]

    # ------------------------------------------------------------ outputs

    def trajectory(self) -> np.ndarray:
        return np.stack([kf.pose6 for kf in self.keyframes]) \
            if self.keyframes else np.zeros((0, 6), np.float32)
