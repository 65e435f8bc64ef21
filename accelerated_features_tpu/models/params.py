"""Parameter pytree construction for the XFeat backbone.

Three entry points:
  * `init_xfeat_params(rng)` — fresh initialization (torch-default-style
    kaiming-uniform fan-in scheme so training from scratch behaves like the
    reference, /root/reference/modules/model.py:27-111).
  * `import_torch_state_dict(sd)` — convert a PyTorch `state_dict` from the
    reference `XFeatModel` (reference xfeat.py:30-35 loads `weights/xfeat.pt`)
    into our NHWC pytree. Accepts tensors or numpy arrays.
  * `fold_batchnorm(params)` — fold affine-free BatchNorm running statistics
    into conv weights/biases for inference (single fused conv+bias+relu per
    layer; removes all normalization traffic at runtime).

Param schema (pytree of jnp arrays):
  {
    'skip1':        {'w': (1,1,1,24), 'b': (24,)},
    'block1':       [ {'w': HWIO, 'mean': (C,), 'var': (C,)} x4 ],
    'block2'..'block5', similarly,
    'block_fusion': [ basic x2, {'w','b'} ],
    'heatmap_head': [ basic x2, {'w','b'} ],
    'keypoint_head':[ basic x3, {'w','b'} ],
    'fine_matcher': [ {'w': (in,out), 'b', 'mean', 'var'} x4, {'w','b'} ],
  }
After `fold_batchnorm`, every 'basic' entry becomes {'w','b'}.
"""

from __future__ import annotations

import math
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from .backbone import (BLOCK_CHANNELS, BLOCK_PLANS, BN_EPS, FINAL_CONVS,
                       FINE_MATCHER_DIMS)

BLOCK_NAMES = ["block1", "block2", "block3", "block4", "block5",
               "block_fusion", "heatmap_head", "keypoint_head"]


def _kaiming_uniform_conv(key, kh, kw, cin, cout):
    """torch Conv2d default init: kaiming_uniform(a=sqrt(5)) -> U(-b, b)
    with b = sqrt(3) * gain / sqrt(fan_in), gain = sqrt(2/(1+5)), i.e.
    exactly 1/sqrt(fan_in)."""
    fan_in = cin * kh * kw
    bound = math.sqrt(1.0 / fan_in)
    return jax.random.uniform(key, (kh, kw, cin, cout), jnp.float32,
                              -bound, bound)


def _bias_uniform(key, fan_in, n):
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, (n,), jnp.float32, -bound, bound)


def init_xfeat_params(rng: jax.Array) -> Dict[str, Any]:
    keys = iter(jax.random.split(rng, 64))
    params: Dict[str, Any] = {}

    params["skip1"] = {
        "w": _kaiming_uniform_conv(next(keys), 1, 1, 1, 24),
        "b": _bias_uniform(next(keys), 1, 24),
    }

    for name in BLOCK_NAMES:
        layers = []
        for (k, _), (cin, cout) in zip(BLOCK_PLANS[name], BLOCK_CHANNELS[name]):
            layers.append({
                "w": _kaiming_uniform_conv(next(keys), k, k, cin, cout),
                "mean": jnp.zeros((cout,), jnp.float32),
                "var": jnp.ones((cout,), jnp.float32),
            })
        if name in FINAL_CONVS:
            cin, cout = FINAL_CONVS[name]
            layers.append({
                "w": _kaiming_uniform_conv(next(keys), 1, 1, cin, cout),
                "b": _bias_uniform(next(keys), cin, cout),
            })
        params[name] = layers

    mlp = []
    for i, (din, dout) in enumerate(FINE_MATCHER_DIMS):
        # torch Linear default: same kaiming_uniform(a=sqrt(5)) bound
        bound = 1.0 / math.sqrt(din)
        layer = {
            "w": jax.random.uniform(next(keys), (din, dout), jnp.float32,
                                    -bound, bound),
            "b": _bias_uniform(next(keys), din, dout),
        }
        if i < len(FINE_MATCHER_DIMS) - 1:
            layer["mean"] = jnp.zeros((dout,), jnp.float32)
            layer["var"] = jnp.ones((dout,), jnp.float32)
        mlp.append(layer)
    params["fine_matcher"] = mlp
    return params


def _to_np(v) -> np.ndarray:
    if hasattr(v, "detach"):
        v = v.detach().cpu().numpy()
    return np.asarray(v, dtype=np.float32)


def _conv_w(sd, key):
    # torch OIHW -> HWIO
    return jnp.asarray(_to_np(sd[key]).transpose(2, 3, 1, 0))


def import_torch_state_dict(sd: Dict[str, Any]) -> Dict[str, Any]:
    """Convert a reference-format torch state_dict into our pytree.

    Key layout of the reference model (model.py:40-111): BasicLayer i inside a
    Sequential 'name' lives at 'name.{i}.layer.0' (conv) and 'name.{i}.layer.1'
    (BatchNorm running stats); plain convs at their sequential index.
    """
    params: Dict[str, Any] = {}
    params["skip1"] = {"w": _conv_w(sd, "skip1.1.weight"),
                      "b": jnp.asarray(_to_np(sd["skip1.1.bias"]))}

    final_idx = {"block_fusion": 2, "heatmap_head": 2, "keypoint_head": 3}
    for name in BLOCK_NAMES:
        layers = []
        for i in range(len(BLOCK_PLANS[name])):
            layers.append({
                "w": _conv_w(sd, f"{name}.{i}.layer.0.weight"),
                "mean": jnp.asarray(_to_np(sd[f"{name}.{i}.layer.1.running_mean"])),
                "var": jnp.asarray(_to_np(sd[f"{name}.{i}.layer.1.running_var"])),
            })
        if name in final_idx:
            i = final_idx[name]
            layers.append({"w": _conv_w(sd, f"{name}.{i}.weight"),
                           "b": jnp.asarray(_to_np(sd[f"{name}.{i}.bias"]))})
        params[name] = layers

    # fine_matcher Sequential: Linear at 0,3,6,9,12; BN1d at 1,4,7,10
    mlp = []
    for li, bi in [(0, 1), (3, 4), (6, 7), (9, 10)]:
        mlp.append({
            "w": jnp.asarray(_to_np(sd[f"fine_matcher.{li}.weight"]).T),
            "b": jnp.asarray(_to_np(sd[f"fine_matcher.{li}.bias"])),
            "mean": jnp.asarray(_to_np(sd[f"fine_matcher.{bi}.running_mean"])),
            "var": jnp.asarray(_to_np(sd[f"fine_matcher.{bi}.running_var"])),
        })
    mlp.append({"w": jnp.asarray(_to_np(sd["fine_matcher.12.weight"]).T),
                "b": jnp.asarray(_to_np(sd["fine_matcher.12.bias"]))})
    params["fine_matcher"] = mlp
    return params


def export_torch_state_dict(params: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Inverse of `import_torch_state_dict` (for interop with the reference
    ecosystem). Only valid for unfolded params."""
    sd: Dict[str, np.ndarray] = {}
    sd["skip1.1.weight"] = np.asarray(params["skip1"]["w"]).transpose(3, 2, 0, 1)
    sd["skip1.1.bias"] = np.asarray(params["skip1"]["b"])
    final_idx = {"block_fusion": 2, "heatmap_head": 2, "keypoint_head": 3}
    for name in BLOCK_NAMES:
        for i in range(len(BLOCK_PLANS[name])):
            p = params[name][i]
            sd[f"{name}.{i}.layer.0.weight"] = np.asarray(p["w"]).transpose(3, 2, 0, 1)
            sd[f"{name}.{i}.layer.1.running_mean"] = np.asarray(p["mean"])
            sd[f"{name}.{i}.layer.1.running_var"] = np.asarray(p["var"])
        if name in final_idx:
            p = params[name][-1]
            i = final_idx[name]
            sd[f"{name}.{i}.weight"] = np.asarray(p["w"]).transpose(3, 2, 0, 1)
            sd[f"{name}.{i}.bias"] = np.asarray(p["b"])
    for j, (li, bi) in enumerate([(0, 1), (3, 4), (6, 7), (9, 10)]):
        p = params["fine_matcher"][j]
        sd[f"fine_matcher.{li}.weight"] = np.asarray(p["w"]).T
        sd[f"fine_matcher.{li}.bias"] = np.asarray(p["b"])
        sd[f"fine_matcher.{bi}.running_mean"] = np.asarray(p["mean"])
        sd[f"fine_matcher.{bi}.running_var"] = np.asarray(p["var"])
    p = params["fine_matcher"][-1]
    sd["fine_matcher.12.weight"] = np.asarray(p["w"]).T
    sd["fine_matcher.12.bias"] = np.asarray(p["b"])
    return sd


def fold_batchnorm(params: Dict[str, Any]) -> Dict[str, Any]:
    """Fold BN running stats into conv weights -> inference-only params.

    y = (w*x - mean) / sqrt(var+eps)  ==  (w*inv)*x + (-mean*inv).
    Every BN in the tree is folded, including the fine_matcher MLP's
    (fine_matcher_forward's running-stats branch then sees no 'mean' key).
    Folded params cannot be re-exported via export_torch_state_dict."""
    def fold_layer(p):
        if "mean" not in p:
            return dict(p)
        inv = 1.0 / np.sqrt(np.asarray(p["var"]) + BN_EPS)
        w = np.asarray(p["w"])
        if w.ndim == 4:  # conv HWIO: scale output channels
            w = w * inv[None, None, None, :]
        else:  # linear (in,out)
            w = w * inv[None, :]
        b = -np.asarray(p["mean"]) * inv
        if "b" in p:  # linear with original bias: fold it through BN too
            b = (np.asarray(p["b"]) - np.asarray(p["mean"])) * inv
        return {"w": jnp.asarray(w), "b": jnp.asarray(b)}

    out: Dict[str, Any] = {"skip1": dict(params["skip1"])}
    for name in BLOCK_NAMES:
        out[name] = [fold_layer(p) for p in params[name]]
    out["fine_matcher"] = [fold_layer(p) for p in params["fine_matcher"]]
    return out


def count_params(params) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
