"""Matching + robust homography + warp overlay (reference homography
notebook equivalent; uses our native LO-RANSAC)."""
import os, sys
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import cv2
import numpy as np
from accelerated_features_tpu import XFeat
from accelerated_features_tpu.geometry import estimate_homography

REF = "/root/reference/assets"
im0 = cv2.imread(f"{REF}/ref.png")
im1 = cv2.imread(f"{REF}/tgt.png")
xfeat = XFeat(weights=None, top_k=4096, detection_threshold=0.012)
mk0, mk1 = xfeat.match_xfeat(im0, im1)
print(f"{len(mk0)} matches")
res = estimate_homography(mk0.astype(np.float64), mk1.astype(np.float64),
                          thresh=4.0)
if res is None:
    print("homography failed (expected with random weights)")
else:
    H, inl = res
    print(f"homography inliers: {inl.sum()}\nH=\n{np.round(H, 4)}")
    warp = cv2.warpPerspective(im0, H, (im1.shape[1], im1.shape[0]))
    cv2.imwrite("/tmp/warped.png", warp)
    print("wrote /tmp/warped.png")
