"""LighterGlue attention matching (reference LighterGlue notebook
equivalent). With random weights the matches are arbitrary; load the
published xfeat-lighterglue.pt via LighterGlue(weights=...) for real use."""
import os, sys
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import cv2
import numpy as np
from accelerated_features_tpu import XFeat

im0 = cv2.imread("/root/reference/assets/ref.png")
im1 = cv2.imread("/root/reference/assets/tgt.png")
xfeat = XFeat(weights=None, top_k=2048, detection_threshold=0.012)
# explicit opt-in to random LighterGlue weights (smoke test only; pass
# weights=... here for real matching)
xfeat.set_lighterglue()
d0 = xfeat.detectAndCompute(im0)[0]
d1 = xfeat.detectAndCompute(im1)[0]
d0["image_size"] = (im0.shape[1], im0.shape[0])
d1["image_size"] = (im1.shape[1], im1.shape[0])
mk0, mk1, idx = xfeat.match_lighterglue(d0, d1, min_conf=0.0)
print(f"LighterGlue matches: {len(idx)}")
