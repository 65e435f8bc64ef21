"""accelerated_features_tpu — a TPU-native accelerated local-feature framework.

Brand-new JAX/XLA/Pallas implementation of the capabilities of
verlab/accelerated_features (XFeat, CVPR 2024): sparse keypoint detection +
64-D descriptors, MNN / semi-dense coarse-to-fine / attention (LighterGlue)
matching, training, relative-pose evaluation, and a multi-chip SfM layer with
distributed bundle adjustment.

Public API mirrors the reference surface (reference modules/xfeat.py) while
all device compute is fixed-shape, jit-compiled, NHWC, and mesh-shardable.
"""

__version__ = "0.1.0"

from .models import (fold_batchnorm, import_torch_state_dict,
                     init_xfeat_params, xfeat_forward)

__all__ = [
    "XFeat", "xfeat_forward", "init_xfeat_params", "import_torch_state_dict",
    "fold_batchnorm",
]


def __getattr__(name):
    # Lazy import of the heavier API layer to keep `import accelerated_features_tpu` cheap.
    if name == "XFeat":
        from .api import XFeat
        return XFeat
    raise AttributeError(name)
