"""TPU-native trainer: one jitted training step over an explicit device mesh.

Re-designs the reference training loop (reference train.py:141-289) as a pure
function:
  * fixed-shape batches: correspondences padded to M with validity masks
    (replacing the per-item variable-length positives list, train.py:222-249);
  * teacher distillation labels precomputed host-side as (h, w) int maps
    (replacing the in-loop ALIKE teacher round-trip, losses.py:74-108);
  * BatchNorm running stats threaded functionally (fixing the reference's
    no-resume gap: optimizer + schedule + step all live in TrainState);
  * optax Adam + staircase LR decay (30k x 0.5, train.py:88-89) + global-norm
    clip 1.0 (train.py:266);
  * data parallel over the 'data' mesh axis; Megatron-style tensor parallel
    over 'model' for the fine-matcher MLP (column/row alternated; XLA GSPMD
    inserts the collectives).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.backbone import fine_matcher_forward, xfeat_forward
from .losses import (coordinate_classification_loss, distill_loss,
                     dual_softmax_loss, keypoint_position_loss,
                     keypoint_reliability_loss)


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    lr: float = 3e-4
    lr_step: int = 30_000
    lr_gamma: float = 0.5
    grad_clip: float = 1.0
    bn_momentum: float = 0.1  # torch BatchNorm default
    distill_weight: float = 2.0  # reference train.py:241
    use_distill: bool = True
    # teacher-FREE keypoint-head supervision via keypoint_position_loss
    # (reference losses.py:111-168) — the bootstrap path when no teacher
    # checkpoint exists (VERDICT r1 #5); needs batch["corrs_full"]
    use_kp_position: bool = False
    kp_position_weight: float = 1.0


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    schedule = optax.exponential_decay(
        init_value=cfg.lr, transition_steps=cfg.lr_step,
        decay_rate=cfg.lr_gamma, staircase=True)
    return optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip),
        optax.scale_by_adam(),
        optax.scale_by_learning_rate(schedule),
    )


def init_train_state(params, cfg: TrainConfig) -> Dict[str, Any]:
    opt = make_optimizer(cfg)
    return {
        "params": params,
        "opt_state": opt.init(params),
        "step": jnp.zeros((), jnp.int32),
    }


def _gather_at(maps: jax.Array, pts: jax.Array) -> jax.Array:
    """maps (h, w, C); pts (M, 2) integer /8-grid xy -> (M, C)."""
    h, w, c = maps.shape
    x = jnp.clip(pts[:, 0].astype(jnp.int32), 0, w - 1)
    y = jnp.clip(pts[:, 1].astype(jnp.int32), 0, h - 1)
    return maps.reshape(h * w, c)[y * w + x]


def loss_fn(params, batch: Dict[str, jax.Array], rng: jax.Array,
            cfg: TrainConfig):
    """Full XFeat training loss on one fixed-shape batch.

    batch:
      image0, image1: (B, H, W, 1) grayscale in [0,1].
      corrs:      (B, M, 4) (x0, y0, x1, y1) in /8-grid coords.
      corr_valid: (B, M) bool.
      distill_labels0/1: (B, h, w) int32 in [0, 64] (optional).
    """
    feats1, k1, h1, stats1 = xfeat_forward(params, batch["image0"], train=True)
    feats2, k2, h2, stats2 = xfeat_forward(params, batch["image1"], train=True)

    B = feats1.shape[0]
    rngs = jax.random.split(rng, (B, 2))

    def per_item(f1, f2, hm1, hm2, kl1, kl2, corrs, valid, lbl1, lbl2, r,
                 corrs_full=None, cf_valid=None):
        pts1, pts2 = corrs[:, :2], corrs[:, 2:]
        m1 = _gather_at(f1, pts1)
        m2 = _gather_at(f2, pts2)
        hv1 = _gather_at(hm1, pts1)[:, 0]
        hv2 = _gather_at(hm2, pts2)[:, 0]

        loss_ds, conf = dual_softmax_loss(m1, m2, valid)
        coords1, fm_stats = fine_matcher_forward(
            params, jnp.concatenate([m1, m2], axis=-1), train=True,
            valid=valid)
        loss_coords, acc_coords = coordinate_classification_loss(
            coords1, pts1, conf, valid)
        loss_kp = keypoint_reliability_loss(hv1, hv2, conf, valid)

        if cfg.use_distill and lbl1 is not None:
            l1, a1 = distill_loss(kl1, lbl1, r[0])
            l2, a2 = distill_loss(kl2, lbl2, r[1])
            loss_distill = (l1 + l2) * cfg.distill_weight
            acc_pos = (a1 + a2) / 2
        elif cfg.use_kp_position and corrs_full is not None:
            # corrs_full: jitter-sampled full-res pairs, BOTH sides float
            # (pair_correspondences_full / spvs_full) — required for the
            # loss's hashmap keys and 8x8 offset labels to carry signal
            loss_distill, acc_pos = keypoint_position_loss(
                kl1, kl2, corrs_full[:, :2], corrs_full[:, 2:], cf_valid)
            loss_distill = loss_distill * cfg.kp_position_weight
        else:
            loss_distill = jnp.zeros(())
            acc_pos = jnp.zeros(())

        item_loss = (loss_ds + loss_coords + loss_kp + loss_distill) / 4.0
        metrics = {
            "loss_coarse": loss_ds, "loss_fine": loss_coords,
            "loss_reliability": loss_kp, "loss_distill": loss_distill,
            "acc_fine": acc_coords, "acc_distill": acc_pos,
            "n_corr": jnp.sum(valid),
        }
        return item_loss, metrics, fm_stats

    lbl0 = batch.get("distill_labels0") if cfg.use_distill else None
    lbl1 = batch.get("distill_labels1") if cfg.use_distill else None
    cfull = batch.get("corrs_full") if cfg.use_kp_position else None
    if lbl0 is not None:
        item_losses, metrics, fm_stats = jax.vmap(per_item)(
            feats1, feats2, h1, h2, k1, k2,
            batch["corrs"], batch["corr_valid"], lbl0, lbl1, rngs)
    elif cfull is not None:
        cf_valid = batch.get("corr_full_valid", batch["corr_valid"])
        per = lambda f1, f2, hm1, hm2, kl1, kl2, c, v, r, cf, cfv: per_item(
            f1, f2, hm1, hm2, kl1, kl2, c, v, None, None, r, cf, cfv)
        item_losses, metrics, fm_stats = jax.vmap(per)(
            feats1, feats2, h1, h2, k1, k2,
            batch["corrs"], batch["corr_valid"], rngs, cfull, cf_valid)
    else:
        per = lambda f1, f2, hm1, hm2, kl1, kl2, c, v, r: per_item(
            f1, f2, hm1, hm2, kl1, kl2, c, v, None, None, r)
        item_losses, metrics, fm_stats = jax.vmap(per)(
            feats1, feats2, h1, h2, k1, k2,
            batch["corrs"], batch["corr_valid"], rngs)

    loss = jnp.mean(item_losses)
    metrics = {k: jnp.mean(v.astype(jnp.float32)) for k, v in metrics.items()}
    metrics["loss_total"] = loss

    # average fine-matcher batch stats over items; pair with the two backbone
    # stat snapshots for the sequential running update
    fm_stats = jax.tree.map(lambda s: jnp.mean(s, axis=0), fm_stats)
    return loss, (metrics, (stats1, stats2, fm_stats))


def _update_running_stats(params, stats_pair, momentum: float):
    """Apply torch-style running-stat updates. Two forwards happened, so two
    sequential EMA steps (reference runs BN twice per step, train.py:217-218);
    the fine matcher ran once."""
    stats1, stats2, fm_stats = stats_pair

    def upd(run, batch):
        return (1.0 - momentum) * run + momentum * batch

    new = jax.tree.map(lambda x: x, params)  # shallow-copy pytree

    def apply_block(plist, s1, s2):
        out = []
        for i, p in enumerate(plist):
            if "mean" in p and i < len(s1):
                m = upd(upd(p["mean"], s1[i]["mean"]), s2[i]["mean"])
                v = upd(upd(p["var"], s1[i]["var"]), s2[i]["var"])
                q = dict(p)
                q["mean"], q["var"] = m, v
                out.append(q)
            else:
                out.append(p)
        return out

    for name in stats1:
        new[name] = apply_block(params[name], stats1[name], stats2[name])

    fm = []
    for i, p in enumerate(params["fine_matcher"]):
        if "mean" in p and i < len(fm_stats):
            q = dict(p)
            q["mean"] = upd(p["mean"], fm_stats[i]["mean"])
            q["var"] = upd(p["var"], fm_stats[i]["var"])
            fm.append(q)
        else:
            fm.append(p)
    new["fine_matcher"] = fm
    return new


def train_step(state: Dict[str, Any], batch: Dict[str, jax.Array],
               rng: jax.Array, cfg: TrainConfig):
    """One full step: grads, clip, Adam, LR schedule, BN running update."""
    opt = make_optimizer(cfg)
    (loss, (metrics, stats)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(state["params"], batch, rng, cfg)

    updates, new_opt = opt.update(grads, state["opt_state"], state["params"])
    new_params = optax.apply_updates(state["params"], updates)
    new_params = _update_running_stats(new_params, stats, cfg.bn_momentum)

    new_state = {
        "params": new_params,
        "opt_state": new_opt,
        "step": state["step"] + 1,
    }
    return new_state, metrics


# ---------------------------------------------------------------------------
# Sharding specs (DP over 'data', Megatron TP over 'model' for the MLP)
# ---------------------------------------------------------------------------

def param_pspecs(params) -> Dict[str, Any]:
    """PartitionSpecs: convs replicated (0.66M params — replication is the
    right call on any mesh); fine-matcher MLP column/row alternated over
    'model'."""
    specs = jax.tree.map(lambda _: P(), params)
    fm = []
    for i, p in enumerate(params["fine_matcher"]):
        if i == len(params["fine_matcher"]) - 1:
            fm.append(jax.tree.map(lambda _: P(), p))
            continue
        col = (i % 2 == 0)
        s = {}
        for k in p:
            if k == "w":
                s[k] = P(None, "model") if col else P("model", None)
            else:  # b, mean, var follow the output dim
                s[k] = P("model") if col else P()
        fm.append(s)
    specs["fine_matcher"] = fm
    return specs


def batch_pspecs(batch: Dict[str, Any]) -> Dict[str, Any]:
    return {k: P("data") for k in batch}


def make_sharded_train_step(mesh: Mesh, state, batch, cfg: TrainConfig):
    """jit the train step with explicit shardings over `mesh`.

    Returns (jitted_fn, sharded_state, shard_batch_fn)."""
    pspec = param_pspecs(state["params"])
    state_spec = {
        "params": pspec,
        "opt_state": _opt_state_pspecs(state["opt_state"], pspec),
        "step": P(),
    }
    to_sharding = lambda tree: jax.tree.map(
        lambda s: NamedSharding(mesh, s), tree,
        is_leaf=lambda x: isinstance(x, P))
    state_sh = to_sharding(state_spec)
    batch_sh = to_sharding(batch_pspecs(batch))

    fn = jax.jit(
        lambda s, b, r: train_step(s, b, r, cfg),
        in_shardings=(state_sh, batch_sh, None),
        out_shardings=(state_sh, None),
        donate_argnums=(0,),
    )
    sharded_state = jax.device_put(state, state_sh)

    def shard_batch(b):
        return jax.device_put(b, {k: batch_sh[k] for k in b})

    return fn, sharded_state, shard_batch


def _opt_state_pspecs(opt_state, pspec):
    """Mirror param specs onto optimizer state: any sub-tree with the same
    structure as the params (Adam mu/nu) inherits the param specs; everything
    else (counts, empty states) is replicated."""
    param_struct = jax.tree.structure(pspec,
                                      is_leaf=lambda x: isinstance(x, P))

    def assign(node):
        if hasattr(node, "_fields"):  # namedtuple state (e.g. ScaleByAdamState)
            repl = {}
            for f in node._fields:
                v = getattr(node, f)
                try:
                    same = jax.tree.structure(v) == param_struct
                except Exception:
                    same = False
                repl[f] = pspec if same else jax.tree.map(lambda _: P(), v)
            return type(node)(**repl)
        return jax.tree.map(lambda _: P(), node)

    return tuple(assign(piece) for piece in opt_state)
