"""Image-registration demo — the reference realtime_demo.py capability
(method registry XFeat / XFeat* / ORB / SIFT, robust homography, match
visualization) as an offline tool with an optional webcam loop.

Offline:   python apps/register_demo.py --ref a.png --tgt b.png --out out.png
Webcam:    python apps/register_demo.py --webcam [--cam 0]
Method:    --method {XFeat, XFeat*, ORB, SIFT}  (reference registry,
           realtime_demo.py:57-70)

Homography uses our native LO-RANSAC (thr 4.0, <=700 iters, min 50 inliers —
the reference's cv2.USAC_MAGSAC settings, realtime_demo.py:90-92,223-229).
"""

import argparse
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_method(name, top_k, weights):
    import cv2
    if name in ("XFeat", "XFeat*"):
        from accelerated_features_tpu import XFeat
        xf = XFeat(weights=weights, top_k=top_k)
        if name == "XFeat":
            return lambda a, b: xf.match_xfeat(a, b)
        return lambda a, b: xf.match_xfeat_star(a, b)
    if name in ("ORB", "SIFT"):
        det = (cv2.ORB_create(top_k, fastThreshold=10) if name == "ORB"
               else cv2.SIFT_create(top_k, contrastThreshold=-1,
                                    edgeThreshold=1000))
        norm = cv2.NORM_HAMMING if name == "ORB" else cv2.NORM_L2

        def fn(a, b):
            k0, d0 = det.detectAndCompute(a, None)
            k1, d1 = det.detectAndCompute(b, None)
            if d0 is None or d1 is None:
                return np.zeros((0, 2)), np.zeros((0, 2))
            matches = cv2.BFMatcher(norm, crossCheck=True).match(d0, d1)
            p0 = np.float32([k0[m.queryIdx].pt for m in matches])
            p1 = np.float32([k1[m.trainIdx].pt for m in matches])
            return p0, p1
        return fn
    raise ValueError(name)


def register(matcher, im_ref, im_tgt, min_inliers=50):
    from accelerated_features_tpu.geometry import estimate_homography
    p0, p1 = matcher(im_ref, im_tgt)
    if len(p0) < 4:
        return None, p0, p1, np.zeros((0,), bool)
    res = estimate_homography(np.asarray(p0, np.float64),
                              np.asarray(p1, np.float64),
                              thresh=4.0, max_iters=700)
    if res is None or res[1].sum() < min_inliers:
        return None, p0, p1, np.zeros((len(p0),), bool)
    return res[0], p0, p1, res[1]


def draw(im_ref, im_tgt, H, p0, p1, inl, fps=None):
    import cv2
    vis = np.concatenate([im_ref, im_tgt], axis=1)
    off = im_ref.shape[1]
    for a, b, ok in zip(p0.astype(int), p1.astype(int), inl):
        if ok:
            cv2.line(vis, tuple(a), (b[0] + off, b[1]), (0, 255, 0), 1)
    if H is not None:
        h, w = im_ref.shape[:2]
        corners = np.float32([[0, 0], [w, 0], [w, h], [0, h]]).reshape(-1, 1, 2)
        warped = cv2.perspectiveTransform(corners, H).reshape(-1, 2)
        warped[:, 0] += off
        cv2.polylines(vis, [warped.astype(np.int32)], True, (0, 0, 255), 3)
    label = f"inliers: {int(inl.sum())}"
    if fps is not None:
        label += f"  fps: {fps:.1f}"
    cv2.putText(vis, label, (10, 30), cv2.FONT_HERSHEY_SIMPLEX, 1,
                (255, 255, 255), 2)
    return vis


def main():
    import cv2
    ap = argparse.ArgumentParser()
    ap.add_argument("--method", default="XFeat",
                    choices=["XFeat", "XFeat*", "ORB", "SIFT"])
    ap.add_argument("--ref", type=str, default=None)
    ap.add_argument("--tgt", type=str, default=None)
    ap.add_argument("--out", type=str, default="registration.png")
    ap.add_argument("--webcam", action="store_true")
    ap.add_argument("--cam", type=int, default=0)
    ap.add_argument("--top_k", type=int, default=4096)
    ap.add_argument("--weights", type=str, default=None)
    args = ap.parse_args()

    matcher = build_method(args.method, args.top_k, args.weights)

    if args.webcam:
        cap = cv2.VideoCapture(args.cam)
        ok, ref = cap.read()
        assert ok, "no camera frame"
        while True:
            ok, frame = cap.read()
            if not ok:
                break
            t0 = time.time()
            H, p0, p1, inl = register(matcher, ref, frame)
            vis = draw(ref, frame, H, p0, p1, inl, fps=1 / (time.time() - t0))
            cv2.imshow("register", vis)
            k = cv2.waitKey(1)
            if k == ord("s"):
                ref = frame
            elif k == ord("q"):
                break
        return

    assert args.ref and args.tgt, "--ref and --tgt required (or --webcam)"
    im_ref = cv2.imread(args.ref)
    im_tgt = cv2.imread(args.tgt)
    t0 = time.time()
    H, p0, p1, inl = register(matcher, im_ref, im_tgt)
    dt = time.time() - t0
    vis = draw(im_ref, im_tgt, H, np.asarray(p0), np.asarray(p1), inl)
    cv2.imwrite(args.out, vis)
    print(f"{args.method}: {len(p0)} matches, {int(inl.sum())} inliers, "
          f"{dt*1000:.0f} ms -> {args.out}")
    if H is not None:
        print("H =\n", np.round(H, 4))


if __name__ == "__main__":
    main()
