"""Hub-style model loading (reference xfeat_torch_hub.ipynb equivalent)."""
import os, sys
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import hubconf

xfeat = hubconf.XFeat(weights=None, top_k=1024)
x = np.random.default_rng(0).uniform(0, 1, (480, 640, 3)).astype(np.float32)
print(len(xfeat.detectAndCompute(x, detection_threshold=0.012)[0]["keypoints"]),
      "keypoints via hub entry")
