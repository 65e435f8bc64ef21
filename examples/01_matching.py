"""Sparse and semi-dense matching on an image pair (reference
notebooks/xfeat_matching.ipynb equivalent)."""
import os, sys
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import cv2
import numpy as np
from accelerated_features_tpu import XFeat

REF = "/root/reference/assets"
im0 = cv2.imread(f"{REF}/ref.png") if os.path.exists(f"{REF}/ref.png") else \
    (np.random.default_rng(0).uniform(0, 255, (480, 640, 3))).astype(np.uint8)
im1 = cv2.imread(f"{REF}/tgt.png") if os.path.exists(f"{REF}/tgt.png") else im0

xfeat = XFeat(weights=None, top_k=4096, detection_threshold=0.012)

out = xfeat.detectAndCompute(im0)[0]
print(f"keypoints: {out['keypoints'].shape}, descriptors: "
      f"{out['descriptors'].shape}, score range "
      f"[{out['scores'].min():.3f}, {out['scores'].max():.3f}]")

mk0, mk1 = xfeat.match_xfeat(im0, im1)
print(f"sparse MNN matches: {len(mk0)}")

sk0, sk1 = xfeat.match_xfeat_star(im0, im1)
print(f"semi-dense refined matches: {len(sk0)}")
