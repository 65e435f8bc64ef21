"""LighterGlue — attention-based sparse matcher, TPU-native JAX.

Our own implementation of the capability the reference gets by wrapping
kornia's LightGlue (reference modules/lighterglue.py:7-57 configures a
6-layer / 1-head / 96-D variant over 64-D XFeat descriptors; the matching
API is reference xfeat.py:131-162). Architecture follows the LightGlue
design (Lindenberger et al., ICCV 2023):

  * keypoints normalized by image size; learnable Fourier positional
    encoding produces rotary cos/sin applied to q and k in self-attention;
  * per layer: self-attention block (fused qkv) then cross-attention block
    between the two images, each with a residual 2x-wide GELU MLP over
    [x, message];
  * assignment head: matchability logits (sigmoid) + scaled descriptor
    similarity -> log double-softmax with dustbins; mutual-argmax filter
    with a confidence threshold (reference filter_threshold 0.1,
    lighterglue.py:25).

TPU-first design: fixed (B, M) keypoint sets with validity masks (padded
slots attend nowhere and match the dustbin), everything under one jit, bf16
compute optional.

Width-confidence point pruning (reference lighterglue.py:24 runs
width_confidence=0.95) is implemented in MASKED form: where the official
LightGlue gathers the surviving points into a smaller set each layer
(dynamic shapes), we keep static shapes and AND the per-layer keep rule
(matchability > 1 - width_confidence, evaluated with that layer's
assignment head; official lightglue.py get_pruning_mask — the token-
confidence OR-term is inactive because the reference disables
depth_confidence, lighterglue.py:23) into the attention/assignment masks.
Masked attention over the kept set is numerically identical to attention
over the gathered set, so the final matches equal the official pruned
output (cross-checked against a gather-based torch implementation in
tests/test_lighterglue_oracle.py). Pruning engages above
`pruning_min_kpts` points (default 1536 = the official flash-path
threshold, matching the reference's flash=True CUDA config); depth
early-exit stays disabled exactly like the reference.

Weights: imports the torch state_dict layout of the published
`xfeat-lighterglue.pt` (after the reference's key remapping,
lighterglue.py:40-48). Fresh init available for training.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

NEG = -1e9
DEFAULT_CONF = {
    "input_dim": 64,
    "descriptor_dim": 96,
    "n_layers": 6,
    "num_heads": 1,
    "filter_threshold": 0.1,
    # reference lighterglue.py:23-24: depth_confidence -1 (off),
    # width_confidence 0.95 (on); engages above the official flash-path
    # keypoint threshold (1536), which the reference's flash=True uses
    "width_confidence": 0.95,
    "pruning_min_kpts": 1536,
}


# ---------------------------------------------------------------------------
# params
# ---------------------------------------------------------------------------

def _linear_init(key, din, dout):
    k1, k2 = jax.random.split(key)
    bound = 1.0 / math.sqrt(din)
    return {
        "w": jax.random.uniform(k1, (din, dout), jnp.float32, -bound, bound),
        "b": jax.random.uniform(k2, (dout,), jnp.float32, -bound, bound),
    }


def init_lighterglue_params(rng: jax.Array,
                            conf: Dict[str, Any] = DEFAULT_CONF):
    dim = conf["descriptor_dim"]
    heads = conf["num_heads"]
    head_dim = dim // heads
    keys = iter(jax.random.split(rng, 200))

    params: Dict[str, Any] = {
        "input_proj": _linear_init(next(keys), conf["input_dim"], dim),
        # Fourier posenc: Linear(2, head_dim/2, bias=False), N(0, 1) init
        "posenc_wr": jax.random.normal(next(keys), (2, head_dim // 2)),
        "layers": [],
        "assignments": [],
        "token_confidence": [],
    }
    for _ in range(conf["n_layers"]):
        layer = {
            "self": {
                "qkv": _linear_init(next(keys), dim, 3 * dim),
                "out": _linear_init(next(keys), dim, dim),
                "ffn0": _linear_init(next(keys), 2 * dim, 2 * dim),
                "ln": {"w": jnp.ones((2 * dim,)), "b": jnp.zeros((2 * dim,))},
                "ffn1": _linear_init(next(keys), 2 * dim, dim),
            },
            "cross": {
                "to_qk": _linear_init(next(keys), dim, dim),
                "to_v": _linear_init(next(keys), dim, dim),
                "to_out": _linear_init(next(keys), dim, dim),
                "ffn0": _linear_init(next(keys), 2 * dim, 2 * dim),
                "ln": {"w": jnp.ones((2 * dim,)), "b": jnp.zeros((2 * dim,))},
                "ffn1": _linear_init(next(keys), 2 * dim, dim),
            },
        }
        params["layers"].append(layer)
        params["assignments"].append({
            "matchability": _linear_init(next(keys), dim, 1),
            "final_proj": _linear_init(next(keys), dim, dim),
        })
        params["token_confidence"].append(_linear_init(next(keys), dim, 1))
    return params


def _t(sd, key):
    v = sd[key]
    if hasattr(v, "detach"):
        v = v.detach().cpu().numpy()
    return jnp.asarray(np.asarray(v, np.float32))


def _lin(sd, prefix):
    out = {"w": _t(sd, prefix + ".weight").T}
    if prefix + ".bias" in sd:
        out["b"] = _t(sd, prefix + ".bias")
    else:
        out["b"] = jnp.zeros((out["w"].shape[1],), jnp.float32)
    return out


def _qkv_row_perm(dim: int, heads: int) -> np.ndarray:
    """Row permutation mapping the official/kornia fused Wqkv packing to our
    chunked [q | k | v] layout.

    The official LightGlue SelfBlock does
    `qkv.unflatten(-1, (num_heads, -1, 3))` before `q, k, v = qkv[..., 0],
    qkv[..., 1], qkv[..., 2]` — i.e. output row o of Wqkv encodes
    (head h = o // (3*hd), feature d = (o % (3*hd)) // 3, which = o % 3)
    with q/k/v INTERLEAVED per scalar feature, not chunked. Our forward
    splits the projection into contiguous thirds, so the import permutes
    rows accordingly (verified against the independent HuggingFace
    LightGlue port in tests/test_lighterglue_oracle.py)."""
    hd = dim // heads
    out = np.empty(3 * dim, np.int64)
    t = 0
    for which in range(3):
        for h in range(heads):
            for d in range(hd):
                out[t] = h * 3 * hd + d * 3 + which
                t += 1
    return out


def import_lighterglue_state_dict(sd: Dict[str, Any],
                                  conf: Dict[str, Any] = DEFAULT_CONF):
    """Convert a torch LightGlue state_dict (kornia layout, with the
    reference's `self_attn.{i}` -> `transformers.{i}.self_attn` renames
    already applied or not) into our pytree."""
    # normalize key names (accept both pre- and post-rename layouts,
    # reference lighterglue.py:40-48)
    norm = {}
    for k, v in sd.items():
        k = k.replace("matcher.", "")
        for i in range(conf["n_layers"]):
            k = k.replace(f"self_attn.{i}", f"transformers.{i}.self_attn")
            k = k.replace(f"cross_attn.{i}", f"transformers.{i}.cross_attn")
        norm[k] = v
    sd = norm

    params: Dict[str, Any] = {
        "input_proj": _lin(sd, "input_proj"),
        "posenc_wr": _t(sd, "posenc.Wr.weight").T,
        "layers": [],
        "assignments": [],
        "token_confidence": [],
    }
    dim = conf["descriptor_dim"]
    perm = _qkv_row_perm(dim, conf["num_heads"])
    for i in range(conf["n_layers"]):
        s = f"transformers.{i}.self_attn"
        c = f"transformers.{i}.cross_attn"
        qkv = _lin(sd, s + ".Wqkv")
        qkv = {"w": qkv["w"][:, perm], "b": qkv["b"][perm]}
        params["layers"].append({
            "self": {
                "qkv": qkv,
                "out": _lin(sd, s + ".out_proj"),
                "ffn0": _lin(sd, s + ".ffn.0"),
                "ln": {"w": _t(sd, s + ".ffn.1.weight"),
                       "b": _t(sd, s + ".ffn.1.bias")},
                "ffn1": _lin(sd, s + ".ffn.3"),
            },
            "cross": {
                "to_qk": _lin(sd, c + ".to_qk"),
                "to_v": _lin(sd, c + ".to_v"),
                "to_out": _lin(sd, c + ".to_out"),
                "ffn0": _lin(sd, c + ".ffn.0"),
                "ln": {"w": _t(sd, c + ".ffn.1.weight"),
                       "b": _t(sd, c + ".ffn.1.bias")},
                "ffn1": _lin(sd, c + ".ffn.3"),
            },
        })
        params["assignments"].append({
            "matchability": _lin(sd, f"log_assignment.{i}.matchability"),
            "final_proj": _lin(sd, f"log_assignment.{i}.final_proj"),
        })
        if f"token_confidence.{i}.token.0.weight" in sd:
            params["token_confidence"].append(
                _lin(sd, f"token_confidence.{i}.token.0"))
    return params


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _apply(p, x):
    return jax.lax.dot_general(
        x, p["w"].astype(x.dtype), (((x.ndim - 1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST) + p["b"].astype(x.dtype)


def normalize_keypoints(kpts: jax.Array, size: jax.Array) -> jax.Array:
    """kpts (B,M,2) xy; size (B,2) (W,H) -> centered, scaled by max-dim/2."""
    size = size.astype(jnp.float32)
    shift = size / 2.0
    scale = jnp.max(size, axis=-1, keepdims=True) / 2.0
    return (kpts - shift[:, None, :]) / scale[:, None, :]


def rotary_encoding(kpts_n: jax.Array, wr: jax.Array):
    """Learnable Fourier positional encoding -> (cos, sin) each (B, M, D)
    with pair-repeated layout [c0,c0,c1,c1,...]."""
    proj = kpts_n @ wr  # (B, M, D/2)
    cos = jnp.repeat(jnp.cos(proj), 2, axis=-1)
    sin = jnp.repeat(jnp.sin(proj), 2, axis=-1)
    return cos, sin


def _rotate_half(x: jax.Array) -> jax.Array:
    x = x.reshape(*x.shape[:-1], -1, 2)
    x1, x2 = x[..., 0], x[..., 1]
    return jnp.stack([-x2, x1], axis=-1).reshape(*x1.shape[:-1], -1)


def apply_rotary(t: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    return t * cos + _rotate_half(t) * sin


FLASH_MIN_N = 1024  # below this the dense XLA path wins (kernel overhead)


def _attention(q, k, v, mask_k: Optional[jax.Array], heads: int):
    """Multi-head SDPA on (B, M, D) with optional key-side mask (B, N).

    Large keypoint sets on TPU route to the Pallas flash-attention kernel
    (ops/pallas/attention.py): the N x N score matrix stays in VMEM."""
    b, m, d = q.shape
    if (heads == 1 and jax.default_backend() == "tpu"
            and max(m, k.shape[1]) >= FLASH_MIN_N):
        from ..ops.pallas.attention import flash_attention
        return flash_attention(q, k, v, mask_k,
                               scale=1.0 / math.sqrt(d), interpret=False)
    hd = d // heads

    def split(x):
        return x.reshape(b, -1, heads, hd).transpose(0, 2, 1, 3)

    qh, kh, vh = split(q), split(k), split(v)
    scores = jnp.einsum("bhmd,bhnd->bhmn", qh, kh,
                        precision=jax.lax.Precision.HIGHEST) / math.sqrt(hd)
    if mask_k is not None:
        scores = jnp.where(mask_k[:, None, None, :], scores, NEG)
    attn = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhmn,bhnd->bhmd", attn, vh,
                     precision=jax.lax.Precision.HIGHEST)
    return out.transpose(0, 2, 1, 3).reshape(b, m, d)


def _ffn(p, x, message):
    y = jnp.concatenate([x, message], axis=-1)
    y = _apply(p["ffn0"], y)
    mean = jnp.mean(y, axis=-1, keepdims=True)
    var = jnp.var(y, axis=-1, keepdims=True)
    y = (y - mean) * jax.lax.rsqrt(var + 1e-5)
    y = y * p["ln"]["w"] + p["ln"]["b"]
    y = jax.nn.gelu(y, approximate=False)
    return x + _apply(p["ffn1"], y)


def _self_block(p, x, cos, sin, mask, heads):
    qkv = _apply(p["qkv"], x)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = apply_rotary(q, cos, sin)
    k = apply_rotary(k, cos, sin)
    ctx = _attention(q, k, v, mask, heads)
    return _ffn(p, x, _apply(p["out"], ctx))


def _cross_block(p, x0, x1, mask0, mask1, heads):
    qk0 = _apply(p["to_qk"], x0)
    qk1 = _apply(p["to_qk"], x1)
    v0 = _apply(p["to_v"], x0)
    v1 = _apply(p["to_v"], x1)
    m0 = _attention(qk0, qk1, v1, mask1, heads)
    m1 = _attention(qk1, qk0, v0, mask0, heads)
    x0 = _ffn(p, x0, _apply(p["to_out"], m0))
    x1 = _ffn(p, x1, _apply(p["to_out"], m1))
    return x0, x1


def sigmoid_log_double_softmax(sim: jax.Array, z0: jax.Array, z1: jax.Array,
                               mask0: jax.Array, mask1: jax.Array):
    """(B,M,N) similarity + matchability logits -> (B,M+1,N+1) log
    assignment with dustbins (LightGlue assignment head)."""
    b, m, n = sim.shape
    sim = jnp.where(mask1[:, None, :], sim, NEG)
    sim = jnp.where(mask0[:, :, None], sim, NEG)
    certainties = (jax.nn.log_sigmoid(z0)[:, :, None] +
                   jax.nn.log_sigmoid(z1)[:, None, :])
    scores0 = jax.nn.log_softmax(sim, axis=2)
    scores1 = jax.nn.log_softmax(sim, axis=1)
    scores = jnp.full((b, m + 1, n + 1), float("-inf"), sim.dtype)
    scores = scores.at[:, :m, :n].set(scores0 + scores1 + certainties)
    scores = scores.at[:, :m, n].set(jax.nn.log_sigmoid(-z0))
    scores = scores.at[:, m, :n].set(jax.nn.log_sigmoid(-z1))
    return scores


def get_matchability(asg_params, x: jax.Array) -> jax.Array:
    """Per-point match probability from a layer's assignment head (official
    lightglue.py MatchAssignment.get_matchability)."""
    return jax.nn.sigmoid(_apply(asg_params["matchability"], x)[..., 0])


def lighterglue_forward(params, kpts0, kpts1, descs0, descs1,
                        size0, size1,
                        mask0: Optional[jax.Array] = None,
                        mask1: Optional[jax.Array] = None,
                        heads: int = 1,
                        width_confidence: float = -1.0,
                        pruning_min_kpts: int = 1536):
    """Run the matcher. All arrays batched; masks select real keypoints.

    width_confidence > 0 enables masked point pruning (see module
    docstring): after layer i < n_layers-1, points whose matchability under
    that layer's assignment head is <= 1 - width_confidence are removed
    from all later attention and from the final assignment. Engages only
    when max(M, N) > pruning_min_kpts (static gate).

    Returns dict:
      log_assignment: (B, M+1, N+1)
      matches0: (B, M) best index in image1 (or -1)
      mscores0: (B, M) confidence
    """
    b, m, _ = kpts0.shape
    n = kpts1.shape[1]
    if mask0 is None:
        mask0 = jnp.ones((b, m), bool)
    if mask1 is None:
        mask1 = jnp.ones((b, n), bool)

    x0 = _apply(params["input_proj"], descs0.astype(jnp.float32))
    x1 = _apply(params["input_proj"], descs1.astype(jnp.float32))
    cos0, sin0 = rotary_encoding(
        normalize_keypoints(kpts0.astype(jnp.float32), size0),
        params["posenc_wr"])
    cos1, sin1 = rotary_encoding(
        normalize_keypoints(kpts1.astype(jnp.float32), size1),
        params["posenc_wr"])

    do_prune = width_confidence > 0 and max(m, n) > pruning_min_kpts
    keep0, keep1 = mask0, mask1
    n_layers = len(params["layers"])
    for i, layer in enumerate(params["layers"]):
        x0 = _self_block(layer["self"], x0, cos0, sin0, keep0, heads)
        x1 = _self_block(layer["self"], x1, cos1, sin1, keep1, heads)
        x0, x1 = _cross_block(layer["cross"], x0, x1, keep0, keep1, heads)
        if do_prune and i < n_layers - 1:
            # official get_pruning_mask with confidences=None (depth
            # confidence disabled): keep iff matchability > 1 - width_conf;
            # once pruned a point never returns (AND-accumulate)
            asg_i = params["assignments"][i]
            keep0 &= get_matchability(asg_i, x0) > (1.0 - width_confidence)
            keep1 &= get_matchability(asg_i, x1) > (1.0 - width_confidence)

    asg = params["assignments"][-1]
    dim = x0.shape[-1]
    md0 = _apply(asg["final_proj"], x0) / dim ** 0.25
    md1 = _apply(asg["final_proj"], x1) / dim ** 0.25
    sim = jnp.einsum("bmd,bnd->bmn", md0, md1,
                     precision=jax.lax.Precision.HIGHEST)
    z0 = _apply(asg["matchability"], x0)[..., 0]
    z1 = _apply(asg["matchability"], x1)[..., 0]
    scores = sigmoid_log_double_softmax(sim, z0, z1, keep0, keep1)
    m0, ms0 = filter_matches_from_scores(scores, m, n)
    if do_prune:
        # pruned points are unmatched with zero confidence, exactly like
        # the official scatter-back (-1 / 0 for indices not in ind0/ind1)
        m0 = jnp.where(keep0, m0, -1)
        ms0 = jnp.where(keep0, ms0, 0.0)
    return {"log_assignment": scores, "matches0": m0, "mscores0": ms0}


def filter_matches_from_scores(scores: jax.Array, m: int, n: int):
    """Mutual-argmax over the (M, N) part of the log assignment; confidence
    = exp(best log score). matches0 == -1 where not mutual."""
    inner = scores[:, :m, :n]
    m0 = jnp.argmax(inner, axis=2).astype(jnp.int32)
    m1 = jnp.argmax(inner, axis=1).astype(jnp.int32)
    idx = jnp.arange(m, dtype=jnp.int32)
    mutual = jnp.take_along_axis(m1, m0, axis=1) == idx[None, :]
    best = jnp.max(inner, axis=2)
    mscores = jnp.exp(best)
    matches0 = jnp.where(mutual, m0, -1)
    return matches0, jnp.where(mutual, mscores, 0.0)


# ---------------------------------------------------------------------------
# user-facing wrapper
# ---------------------------------------------------------------------------

class LighterGlue:
    """Inference wrapper mirroring the reference LighterGlue usage
    (reference lighterglue.py + xfeat.py:131-162)."""

    def __init__(self, weights: Optional[Any] = None,
                 conf: Dict[str, Any] = DEFAULT_CONF):
        self.conf = dict(conf)
        if weights is None:
            self.params = init_lighterglue_params(jax.random.key(0), conf)
        elif isinstance(weights, str):
            import os as _os
            if _os.path.isdir(weights):
                # training checkpoint directory (orbax or npz) produced by
                # train/lighterglue_run: resolve the latest checkpoint and
                # extract the params subtree. (Files keep the suffix-based
                # branches below — a non-directory path can't be an orbax
                # checkpoint, and torch.load gives clear errors for typos.)
                from ..utils.checkpoint import load_params_from_checkpoint
                self.params = load_params_from_checkpoint(weights)
            elif weights.endswith(".npz"):
                from ..api import _unflatten
                data = np.load(weights, allow_pickle=True)
                keys = list(data.keys())
                if any(k.startswith("params/") for k in keys):
                    # full train-state checkpoint (params/ + opt_state/ +
                    # step): extract the params subtree, like api.load_params
                    flat = {k[len("params/"):]: jnp.asarray(data[k])
                            for k in keys if k.startswith("params/")}
                else:
                    flat = {k: jnp.asarray(data[k]) for k in keys}
                self.params = _unflatten(flat)
            else:
                import torch
                sd = torch.load(weights, map_location="cpu",
                                weights_only=True)
                self.params = import_lighterglue_state_dict(sd, conf)
        elif isinstance(weights, dict) and any("." in str(k)
                                               for k in weights):
            self.params = import_lighterglue_state_dict(weights, conf)
        else:
            self.params = weights
        self._jitted = {}

    def _fn(self, m, n, width_confidence=-1.0):
        # the official pruning gate compares the ACTUAL keypoint count to
        # pruning_min_kpts; the caller decides and passes the resolved
        # width_confidence (padding to the jit bucket would otherwise
        # inflate the count)
        key = (m, n, width_confidence)
        if key not in self._jitted:
            self._jitted[key] = jax.jit(
                lambda p, k0, k1, d0, d1, s0, s1, v0, v1:
                lighterglue_forward(p, k0, k1, d0, d1, s0, s1, v0, v1,
                                    heads=self.conf["num_heads"],
                                    width_confidence=width_confidence,
                                    pruning_min_kpts=0))
        return self._jitted[key]

    @staticmethod
    def _pad_to(x, k):
        pad = k - x.shape[0]
        if pad <= 0:
            return x[:k]
        return np.concatenate(
            [np.asarray(x), np.zeros((pad,) + x.shape[1:], x.dtype)])

    def match(self, d0: Dict[str, Any], d1: Dict[str, Any],
              min_conf: float = 0.1) -> np.ndarray:
        """d0/d1: dicts with 'keypoints' (N,2), 'descriptors' (N,64),
        'image_size' (W,H). Returns (S, 2) matched index pairs."""
        k0 = np.asarray(d0["keypoints"], np.float32)
        k1 = np.asarray(d1["keypoints"], np.float32)
        n0, n1 = len(k0), len(k1)
        K = max(int(2 ** math.ceil(math.log2(max(n0, n1, 16)))), 16)

        wc = self.conf.get("width_confidence", -1.0)
        if not (wc > 0 and max(n0, n1) >
                self.conf.get("pruning_min_kpts", 1536)):
            wc = -1.0
        out = self._fn(K, K, wc)(
            self.params,
            jnp.asarray(self._pad_to(k0, K))[None],
            jnp.asarray(self._pad_to(k1, K))[None],
            jnp.asarray(self._pad_to(
                np.asarray(d0["descriptors"], np.float32), K))[None],
            jnp.asarray(self._pad_to(
                np.asarray(d1["descriptors"], np.float32), K))[None],
            jnp.asarray(np.asarray(d0["image_size"], np.float32))[None],
            jnp.asarray(np.asarray(d1["image_size"], np.float32))[None],
            jnp.asarray(np.arange(K) < n0)[None],
            jnp.asarray(np.arange(K) < n1)[None],
        )
        matches0 = np.asarray(out["matches0"][0])
        mscores0 = np.asarray(out["mscores0"][0])
        rows = np.nonzero((matches0 >= 0) & (mscores0 > min_conf)
                          & (np.arange(K) < n0))[0]
        cols = matches0[rows]
        keep = cols < n1
        return np.stack([rows[keep], cols[keep]], axis=-1).astype(np.int64)
