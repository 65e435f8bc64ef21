"""XFeat backbone + heads, TPU-native (JAX, NHWC, functional).

Re-implements the capability of the reference CNN (see
/root/reference/modules/model.py:27-154) as a pure function over an explicit
parameter pytree:

  * input normalization: RGB->gray mean + per-instance normalization
    (reference model.py:134-136), not backpropagated through.
  * 5 conv blocks with early downsampling and an avg-pool skip connection
    (reference model.py:40-71), all convs NHWC for TPU MXU tiling.
  * pyramid fusion: /16 and /32 features bilinearly upsampled to /8 and summed
    (reference model.py:145-148).
  * heatmap (reliability) head -> (B, h, w, 1) sigmoid map
    (reference model.py:79-84).
  * keypoint head on the space-to-depth re-blocked raw image -> 65 logits per
    8x8 cell (64 in-cell positions + dustbin) (reference model.py:87-92,
    113-120).
  * fine-matcher MLP 128->512x4->64 with BatchNorm1d, used by the semi-dense
    match refinement (reference model.py:97-111).

Design differences from the reference (TPU-first, not a port):
  * NHWC layout everywhere (channels-last tiles onto the 8x128 VPU lanes and
    MXU natively; the reference uses NCHW).
  * BatchNorm is affine-free (as in the reference) and can be *folded* into
    the preceding conv for inference via `fold_batchnorm` -> a single
    conv+bias+relu chain that XLA fuses.
  * All control flow is static; the whole forward lives under one `jit`.
  * Supports bfloat16 compute with float32 parameters.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

BN_EPS = 1e-5  # torch BatchNorm2d default eps
IN_EPS = 1e-5  # torch InstanceNorm2d default eps

# (kernel_size, stride) plans per block, mirroring reference model.py:40-92.
BLOCK_PLANS: Dict[str, List[Tuple[int, int]]] = {
    "block1": [(3, 1), (3, 2), (3, 1), (3, 2)],
    "block2": [(3, 1), (3, 1)],
    "block3": [(3, 2), (3, 1), (1, 1)],
    "block4": [(3, 2), (3, 1), (3, 1)],
    "block5": [(3, 2), (3, 1), (3, 1), (1, 1)],
    "block_fusion": [(3, 1), (3, 1)],   # + final plain 1x1 conv w/ bias
    "heatmap_head": [(1, 1), (1, 1)],   # + final plain 1x1 conv w/ bias
    "keypoint_head": [(1, 1), (1, 1), (1, 1)],  # + final plain 1x1 conv w/ bias
}

# Channel plans (in, out) per conv, mirroring reference model.py:40-92.
BLOCK_CHANNELS: Dict[str, List[Tuple[int, int]]] = {
    "block1": [(1, 4), (4, 8), (8, 8), (8, 24)],
    "block2": [(24, 24), (24, 24)],
    "block3": [(24, 64), (64, 64), (64, 64)],
    "block4": [(64, 64), (64, 64), (64, 64)],
    "block5": [(64, 128), (128, 128), (128, 128), (128, 64)],
    "block_fusion": [(64, 64), (64, 64)],
    "heatmap_head": [(64, 64), (64, 64)],
    "keypoint_head": [(64, 64), (64, 64), (64, 64)],
}

FINAL_CONVS: Dict[str, Tuple[int, int]] = {
    "block_fusion": (64, 64),
    "heatmap_head": (64, 1),
    "keypoint_head": (64, 65),
}

FINE_MATCHER_DIMS = [(128, 512), (512, 512), (512, 512), (512, 512), (512, 64)]


def conv2d(x: jax.Array, w: jax.Array, b: Optional[jax.Array] = None,
           stride: int = 1) -> jax.Array:
    """NHWC conv with torch-style 'same-ish' padding (pad = k // 2)."""
    pad = w.shape[0] // 2
    out = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype),
        window_strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST,
    )
    if b is not None:
        out = out + b.astype(out.dtype)
    return out


def _basic_layer(p: Dict[str, jax.Array], x: jax.Array, stride: int,
                 train: bool, stats_out: Optional[list]) -> jax.Array:
    """Conv -> BatchNorm(affine=False) -> ReLU (reference model.py:12-25).

    If `p` contains a folded bias 'b' (inference), BN is skipped entirely.
    In train mode, batch statistics are used and (mean, unbiased var) appended
    to `stats_out` for the running-average update in the trainer.
    """
    x = conv2d(x, p["w"], stride=stride)
    if "b" in p:  # BN pre-folded into conv output scale/bias
        return jnp.maximum(x + p["b"].astype(x.dtype), 0.0)
    if train:
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=(0, 1, 2))
        var = jnp.var(xf, axis=(0, 1, 2))
        if stats_out is not None:
            n = x.shape[0] * x.shape[1] * x.shape[2]
            stats_out.append({"mean": mean, "var": var * n / max(n - 1, 1)})
    else:
        mean, var = p["mean"], p["var"]
    inv = jax.lax.rsqrt(var + BN_EPS)
    return jnp.maximum((x - mean.astype(x.dtype)) * inv.astype(x.dtype), 0.0)


def _block(params_list, x: jax.Array, name: str, train: bool,
           stats_out: Optional[dict]) -> jax.Array:
    sub = [] if stats_out is not None else None
    for p, (_, stride) in zip(params_list, BLOCK_PLANS[name]):
        x = _basic_layer(p, x, stride, train, sub)
    if stats_out is not None:
        stats_out[name] = sub
    return x


def space_to_depth(x: jax.Array, ws: int = 8) -> jax.Array:
    """NHWC space-to-depth; channel order = 8*dy + dx for C=1, matching the
    reference `_unfold2d` channel ordering (model.py:113-120) so keypoint-head
    weights imported from torch line up."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # (B, h', w', dy, dx, C)
    return x.reshape(b, h // ws, w // ws, ws * ws * c)


def upsample_bilinear(x: jax.Array, out_hw: Tuple[int, int]) -> jax.Array:
    """Bilinear resize with half-pixel centers (== torch align_corners=False,
    reference model.py:146-147)."""
    b, _, _, c = x.shape
    return jax.image.resize(x, (b, out_hw[0], out_hw[1], c), method="bilinear", antialias=False)


def input_norm(x: jax.Array) -> jax.Array:
    """RGB->gray mean + InstanceNorm (reference model.py:134-136).

    Gradients are cut (the reference wraps this in no_grad)."""
    x = jnp.mean(x, axis=-1, keepdims=True)
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
    var = jnp.var(xf, axis=(1, 2), keepdims=True)
    out = (xf - mean) * jax.lax.rsqrt(var + IN_EPS)
    return jax.lax.stop_gradient(out.astype(x.dtype))


def xfeat_forward(params: Dict[str, Any], x: jax.Array, *, train: bool = False,
                  compute_dtype: jnp.dtype = jnp.float32,
                  fused_stem: Optional[bool] = None):
    """Full XFeat forward (reference model.py:123-154).

    Args:
      params: parameter pytree (see models/params.py for schema).
      x: (B, H, W, C) images in [0, 1]; H, W divisible by 32.
      train: use batch statistics in BN and return them for running updates.
      compute_dtype: bfloat16 for TPU inference throughput, float32 for parity.
      fused_stem: route input_norm output through the fused Pallas stem
        kernel (experiments/stem.py; inference + folded BN only). Default
        comes from the XFEAT_FUSED_STEM env var — off until the kernel is
        measured faster on-chip (see STATUS.md).

    Returns:
      feats:  (B, H/8, W/8, 64) dense local features.
      logits: (B, H/8, W/8, 65) keypoint logit map.
      heat:   (B, H/8, W/8, 1) reliability map in (0, 1).
      [bn_stats: nested dict of batch stats when train=True]
    """
    stats: Optional[dict] = {} if train else None
    x = input_norm(x).astype(compute_dtype)

    explicit = fused_stem is not None
    if fused_stem is None:
        import os
        fused_stem = os.environ.get("XFEAT_FUSED_STEM", "0") == "1"
    folded = all("b" in p for p in params["block1"])
    if fused_stem and explicit and (train or not folded):
        # only the env-var default may silently fall back; an explicit
        # fused_stem=True with an incompatible config is a caller bug
        raise ValueError(
            "fused_stem=True requires inference (train=False) and "
            "BatchNorm folded into conv biases "
            "(models.params.fold_batchnorm)")
    if fused_stem and not train and folded:
        from ..experiments.stem import stem_fused
        stem_out = stem_fused(params, x)
    else:
        x1 = _block(params["block1"], x, "block1", train, stats)
        skip = jax.lax.reduce_window(
            x, 0.0, jax.lax.add, (1, 4, 4, 1), (1, 4, 4, 1), "VALID") / 16.0
        skip = conv2d(skip, params["skip1"]["w"], params["skip1"]["b"])
        stem_out = x1 + skip
    x2 = _block(params["block2"], stem_out, "block2", train, stats)
    x3 = _block(params["block3"], x2, "block3", train, stats)
    x4 = _block(params["block4"], x3, "block4", train, stats)
    x5 = _block(params["block5"], x4, "block5", train, stats)

    hw = (x3.shape[1], x3.shape[2])
    x4 = upsample_bilinear(x4, hw)
    x5 = upsample_bilinear(x5, hw)

    fused = x3 + x4 + x5
    sub = [] if stats is not None else None
    for p, (_, stride) in zip(params["block_fusion"][:-1],
                              BLOCK_PLANS["block_fusion"]):
        fused = _basic_layer(p, fused, stride, train, sub)
    if stats is not None:
        stats["block_fusion"] = sub
    pf = params["block_fusion"][-1]
    feats = conv2d(fused, pf["w"], pf["b"])

    # Reliability head (reference model.py:79-84,151)
    h = feats
    sub = [] if stats is not None else None
    for p in params["heatmap_head"][:-1]:
        h = _basic_layer(p, h, 1, train, sub)
    if stats is not None:
        stats["heatmap_head"] = sub
    ph = params["heatmap_head"][-1]
    heat = jax.nn.sigmoid(conv2d(h, ph["w"], ph["b"]))

    # Keypoint head on re-blocked raw image (reference model.py:87-92,152)
    k = space_to_depth(x, 8)
    sub = [] if stats is not None else None
    for p in params["keypoint_head"][:-1]:
        k = _basic_layer(p, k, 1, train, sub)
    if stats is not None:
        stats["keypoint_head"] = sub
    pk = params["keypoint_head"][-1]
    logits = conv2d(k, pk["w"], pk["b"])

    if train:
        return feats, logits, heat, stats
    return feats, logits, heat


def fine_matcher_forward(params: Dict[str, Any], x: jax.Array, *,
                         train: bool = False,
                         valid: Optional[jax.Array] = None):
    """Fine-matcher MLP 128 -> 512x4 -> 64 (reference model.py:97-111).

    BatchNorm1d statistics are computed over the *valid* rows only when
    `train=True` and a validity mask is given — the TPU-native replacement for
    the reference's variable-length batch of matches.

    Args:
      x: (..., 128) concatenated descriptor pairs.
      valid: optional (...) bool mask of real (non-padded) rows.

    Returns: (..., 64) logits [, list of bn batch stats when train=True].
    """
    stats = [] if train else None
    def matmul(a, w):
        return jax.lax.dot_general(
            a, w, (((a.ndim - 1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST)

    mlp = params["fine_matcher"]
    for i, layer in enumerate(mlp[:-1]):
        x = matmul(x, layer["w"].astype(x.dtype)) + layer["b"].astype(x.dtype)
        if train:
            xf = x.astype(jnp.float32)
            if valid is not None:
                m = valid[..., None].astype(jnp.float32)
                n = jnp.maximum(jnp.sum(m), 1.0)
                red = tuple(range(x.ndim - 1))
                mean = jnp.sum(xf * m, axis=red) / n
                var = jnp.sum(m * (xf - mean) ** 2, axis=red) / n
            else:
                red = tuple(range(x.ndim - 1))
                mean = jnp.mean(xf, axis=red)
                var = jnp.var(xf, axis=red)
                n = float(x.size // x.shape[-1])
            stats.append({"mean": mean, "var": var * n / jnp.maximum(n - 1, 1)})
        elif "mean" not in layer:  # BN already folded into w/b at load time
            x = jnp.maximum(x, 0.0)
            continue
        else:
            mean, var = layer["mean"], layer["var"]
        inv = jax.lax.rsqrt(var + BN_EPS)
        x = jnp.maximum((x - mean.astype(x.dtype)) * inv.astype(x.dtype), 0.0)
    last = mlp[-1]
    x = matmul(x, last["w"].astype(x.dtype)) + last["b"].astype(x.dtype)
    if train:
        return x, stats
    return x
