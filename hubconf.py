"""Hub-style entry points (reference hubconf.py equivalent).

>>> xfeat = hubconf.XFeat(weights="weights/xfeat.npz", top_k=4096)
Works with torch.hub-style loading too:
>>> torch.hub.load('<this repo>', 'XFeat', source='local', weights=...)
"""

dependencies = ["jax", "numpy"]


def XFeat(weights=None, top_k=4096, detection_threshold=0.05, **kwargs):
    """Construct the TPU-native XFeat inference engine. `weights` may be a
    .npz pytree, a torch .pt state_dict path, or None for random init."""
    from accelerated_features_tpu import XFeat as _XFeat
    return _XFeat(weights=weights, top_k=top_k,
                  detection_threshold=detection_threshold, **kwargs)


def LighterGlue(weights=None, **kwargs):
    from accelerated_features_tpu.models.lighterglue import LighterGlue as _LG
    return _LG(weights=weights, **kwargs)
