"""ctypes bindings for the native posekit library (native/posekit.cpp) —
the framework's equivalent of the reference's poselib dependency
(reference megadepth1500.py:14,98-113; scannet1500.py:52-66).

The shared library is built on first use with g++ (no pip deps); callers can
also prebuild with `make -C native`.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_LOCK = threading.Lock()
_LIB = None

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libposekit.so")


_HASH_PATH = _SO_PATH + ".srchash"


def _src_hash():
    import hashlib
    cpp = os.path.join(_NATIVE_DIR, "posekit.cpp")
    if not os.path.exists(cpp):
        return None
    with open(cpp, "rb") as f:
        return hashlib.sha1(f.read()).hexdigest()


def _build() -> bool:
    src = os.path.join(_NATIVE_DIR, "posekit.cpp")
    h = _src_hash()
    if h is None:
        return False
    # compile to a private temp name, then atomically rename into place:
    # concurrent first-use builds (e.g. a spawned eval worker pool) must
    # never dlopen a partially written .so. CXX/CXXFLAGS honored (same
    # contract as native/Makefile).
    tmp = f"{_SO_PATH}.tmp.{os.getpid()}"
    cxx = os.environ.get("CXX", "g++")
    flags = os.environ.get(
        "CXXFLAGS", "-O3 -march=native -fPIC -std=c++17").split()
    try:
        subprocess.run([cxx, *flags, "-shared", "-o", tmp, src],
                       check=True, capture_output=True, timeout=300)
        os.replace(tmp, _SO_PATH)
        htmp = f"{_HASH_PATH}.tmp.{os.getpid()}"
        with open(htmp, "w") as f:
            f.write(h)
        os.replace(htmp, _HASH_PATH)
        return True
    except Exception:
        try:
            os.remove(tmp)
        except OSError:
            pass
        return False


def _lib():
    global _LIB
    with _LOCK:
        if _LIB is not None:
            return _LIB
        # staleness: a sidecar .srchash records which posekit.cpp the
        # .so was compiled from (mtimes are meaningless after git
        # checkout, and a foreign -march=native binary could SIGILL).
        # Rebuild when sources are present and the sidecar is missing or
        # differs; a prebuilt .so WITHOUT sources (wheel/minimal deploy)
        # is used as-is.
        h = _src_hash()
        stored = None
        if os.path.exists(_HASH_PATH):
            with open(_HASH_PATH) as f:
                stored = f.read().strip()
        if not os.path.exists(_SO_PATH) or (h is not None and stored != h):
            if not _build() and not os.path.exists(_SO_PATH):
                raise RuntimeError("posekit build failed; run `make -C native`")
        lib = ctypes.CDLL(_SO_PATH)
        lib.pk_estimate_relative_pose.restype = ctypes.c_int
        lib.pk_estimate_homography.restype = ctypes.c_int
        lib.pk_five_point.restype = ctypes.c_int
        lib.pk_sampson_sq.restype = ctypes.c_double
        _LIB = lib
        return lib


def posekit_available() -> bool:
    try:
        _lib()
        return True
    except Exception:
        return False


def _cptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def estimate_relative_pose(pts0: np.ndarray, pts1: np.ndarray,
                           K0: np.ndarray, K1: np.ndarray,
                           max_epipolar_error: float = 2.5,
                           success_prob: float = 0.99999,
                           max_iters: int = 10_000,
                           seed: int = 0
                           ) -> Optional[Tuple[np.ndarray, np.ndarray,
                                               np.ndarray]]:
    """5-pt + LO-RANSAC relative pose from pixel correspondences.

    Mirrors the reference's poselib call (megadepth1500.py:98-113: ransac
    options {'max_epipolar_error': 2.5}; returns (R, t, inlier_mask) or None.
    """
    pts0 = np.ascontiguousarray(pts0, np.float64)
    pts1 = np.ascontiguousarray(pts1, np.float64)
    if len(pts0) != len(pts1):
        raise ValueError(f"pts0/pts1 length mismatch: "
                         f"{len(pts0)} != {len(pts1)}")
    n = len(pts0)
    if n < 5:
        return None
    K0 = np.ascontiguousarray(K0, np.float64)
    K1 = np.ascontiguousarray(K1, np.float64)
    R = np.zeros((3, 3), np.float64)
    t = np.zeros((3,), np.float64)
    mask = np.zeros((n,), np.uint8)
    ninl = _lib().pk_estimate_relative_pose(
        _cptr(pts0), _cptr(pts1), ctypes.c_int(n), _cptr(K0), _cptr(K1),
        ctypes.c_double(max_epipolar_error), ctypes.c_double(success_prob),
        ctypes.c_int(max_iters), ctypes.c_uint(seed), _cptr(R), _cptr(t),
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)))
    if ninl <= 0:
        return None
    return R, t, mask.astype(bool)


def estimate_homography(pts0: np.ndarray, pts1: np.ndarray,
                        thresh: float = 4.0, max_iters: int = 700,
                        seed: int = 0, success_prob: float = 0.99999
                        ) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """4-pt DLT + LO-RANSAC homography (reference realtime_demo.py:225
    equivalent: USAC_MAGSAC thr 4.0, maxIters 700). Returns (H, mask)."""
    pts0 = np.ascontiguousarray(pts0, np.float64)
    pts1 = np.ascontiguousarray(pts1, np.float64)
    if len(pts0) != len(pts1):
        raise ValueError(f"pts0/pts1 length mismatch: "
                         f"{len(pts0)} != {len(pts1)}")
    n = len(pts0)
    if n < 4:
        return None
    H = np.zeros((3, 3), np.float64)
    mask = np.zeros((n,), np.uint8)
    ninl = _lib().pk_estimate_homography(
        _cptr(pts0), _cptr(pts1), ctypes.c_int(n), ctypes.c_double(thresh),
        ctypes.c_int(max_iters), ctypes.c_uint(seed), _cptr(H),
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        ctypes.c_double(success_prob))
    if ninl <= 0:
        return None
    return H, mask.astype(bool)


def five_point(x0: np.ndarray, x1: np.ndarray) -> np.ndarray:
    """Minimal 5-pt solver on normalized coords -> (N<=10, 3, 3) E stack."""
    x0 = np.ascontiguousarray(x0, np.float64)
    x1 = np.ascontiguousarray(x1, np.float64)
    if len(x0) < 5 or len(x1) < 5:
        raise ValueError("five_point needs exactly 5 correspondences "
                         f"(got {len(x0)}, {len(x1)})")
    out = np.zeros((10, 3, 3), np.float64)
    cnt = _lib().pk_five_point(_cptr(x0), _cptr(x1), _cptr(out))
    return out[:cnt]


def sampson_sq(E: np.ndarray, p0: np.ndarray, p1: np.ndarray) -> float:
    E = np.ascontiguousarray(E, np.float64)
    p0 = np.ascontiguousarray(p0, np.float64)
    p1 = np.ascontiguousarray(p1, np.float64)
    return float(_lib().pk_sampson_sq(_cptr(E), _cptr(p0), _cptr(p1)))


def decompose_homography(H: np.ndarray, K0: np.ndarray, K1: np.ndarray,
                         pts0: Optional[np.ndarray] = None,
                         pts1: Optional[np.ndarray] = None
                         ) -> list:
    """Faugeras SVD decomposition of a pixel homography into rigid-motion
    candidates [(R, t_unit_or_zero, n), ...].

    Planar scenes make the essential matrix DEGENERATE — a 2-parameter
    family of E fits coplanar correspondences, so 5-pt LO-RANSAC can
    converge to a wrong member with full inlier support (measured on the
    rendered SLAM benchmark: near-identity rotations with hundreds of
    "inliers"). The classical remedy — what ORB-SLAM-style trackers do,
    and what this framework's SLAM front end uses via
    `sfm.slam.IncrementalSlam` — is to ALSO fit a homography and, when it
    explains the matches as well as E does, decompose H = d*R + t*n^T
    instead (Faugeras & Lustman 1988). The reference has no SLAM layer;
    nearest anchor is its two-view pose eval (megadepth1500.py:98-113).

    `pts0/pts1` (pixel coords) fix the sign of the calibrated homography
    (x1^T Hn x0 > 0 for points in front); a few inliers suffice. The
    translation is returned unit-normalized (its true magnitude is
    |t|/d, unrecoverable from H alone); a near-pure-rotation H returns a
    single candidate with t = 0.
    """
    Hn = np.linalg.inv(np.asarray(K1, np.float64)) \
        @ np.asarray(H, np.float64) @ np.asarray(K0, np.float64)
    if pts0 is not None and len(pts0):
        x0 = np.concatenate([np.asarray(pts0, np.float64)[:8],
                             np.ones((min(len(pts0), 8), 1))], axis=1)
        x1 = np.concatenate([np.asarray(pts1, np.float64)[:8],
                             np.ones((min(len(pts1), 8), 1))], axis=1)
        x0n = x0 @ np.linalg.inv(K0).T
        x1n = x1 @ np.linalg.inv(K1).T
        sgn = np.sign(np.median(np.sum(x1n * (x0n @ Hn.T), axis=1)))
        if sgn != 0:
            Hn = Hn * sgn

    U, S, Vt = np.linalg.svd(Hn)
    d1, d2, d3 = S
    if d1 / max(d2, 1e-12) < 1.0001 or d2 / max(d3, 1e-12) < 1.0001:
        # (near-)pure rotation: H/d2 is (near) orthogonal; project to SO(3)
        Un, _, Vtn = np.linalg.svd(Hn / d2)
        Rr = Un @ np.diag([1.0, 1.0,
                           np.sign(np.linalg.det(Un @ Vtn))]) @ Vtn
        return [(Rr, np.zeros(3), np.array([0.0, 0.0, 1.0]))]

    s = np.linalg.det(U) * np.linalg.det(Vt)
    x1_ = np.sqrt((d1 ** 2 - d2 ** 2) / (d1 ** 2 - d3 ** 2))
    x3_ = np.sqrt((d2 ** 2 - d3 ** 2) / (d1 ** 2 - d3 ** 2))
    sin_t = np.sqrt((d1 ** 2 - d2 ** 2) * (d2 ** 2 - d3 ** 2)) \
        / ((d1 + d3) * d2)
    cos_t = (d2 ** 2 + d1 * d3) / ((d1 + d3) * d2)
    out = []
    for e1 in (1.0, -1.0):
        for e3 in (1.0, -1.0):
            st = e1 * e3 * sin_t
            Rp = np.array([[cos_t, 0.0, -st],
                           [0.0, 1.0, 0.0],
                           [st, 0.0, cos_t]])
            tp = (d1 - d3) * np.array([e1 * x1_, 0.0, -e3 * x3_])
            np_ = np.array([e1 * x1_, 0.0, e3 * x3_])
            R = s * (U @ Rp @ Vt)
            t = U @ tp
            n = Vt.T @ np_
            tn = np.linalg.norm(t)
            if tn > 1e-12:
                t = t / tn
            # report the normal on the +z (visible) side
            if n[2] < 0:
                n, t = -n, -t if tn > 1e-12 else t
            out.append((R, t, n))
    return out
