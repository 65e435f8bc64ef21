"""LighterGlue matcher training — capability the reference lacks in-repo
(its LighterGlue wraps kornia and ships only pretrained weights,
reference lighterglue.py:29-48; the LightGlue training recipe exists only
upstream in glue-factory).

Pipeline (all fixed-shape, one jit per step):
  synthetic warped pair (train/augmentation.make_pair)
    -> frozen XFeat extraction on both views (ops.extraction, top-K)
    -> GT assignment from the analytic warp: map view-2 keypoints into
       view 1 (view2_to_view1), mutual-nearest < match_px -> matched
       pairs; valid keypoints farther than unmatch_px from every
       counterpart -> dustbin supervision
    -> assignment NLL (train/lighterglue_loss) + Adam.

CLI:
  python -m accelerated_features_tpu.train.lighterglue_run \
      --synthetic_root_path /data/coco_20k --ckpt_save_path /tmp/lg \
      --xfeat_weights weights/xfeat.npz --n_steps 50000

The produced checkpoints load directly into the inference engine:
`XFeat.set_lighterglue(weights="/tmp/lg/ckpt_....npz")` (the loader
extracts the params/ subtree of a train-state checkpoint).
"""
from __future__ import annotations

import argparse
import os
import signal
import time
from typing import Any, Dict, Optional

# Persistent compile cache (see train/run.py): chunked/resumed runs must
# not re-pay the train-step compile. Set before the first jax import.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.jax_cache"))

import jax
import jax.numpy as jnp


def init_lg_train_state(params, opt):
    """LighterGlue train state. `step` must be an ARRAY (not a numpy
    scalar): orbax's StandardCheckpointer rejects numpy scalars
    (np.int64) as restore-target leaves, which broke resume of saved LG
    checkpoints; int32 also matches what a saved post-jit state contains.
    Shared by main() and tests so the contract is guarded where it
    lives."""
    return {"params": params, "opt_state": opt.init(params),
            "step": jnp.zeros((), jnp.int32)}


def build_lg_batch(xfeat_params: Dict[str, Any], pair: Dict[str, jax.Array],
                   cfg, top_k: int = 512,
                   detection_threshold: float = 0.05,
                   match_px: float = 3.0, unmatch_px: float = 5.0,
                   n_gt: Optional[int] = None,
                   key: Optional[jax.Array] = None) -> Dict[str, jax.Array]:
    """Extract keypoints on both views of an augmented pair and derive the
    ground-truth assignment from the analytic warp. Returns the batch dict
    `train.lighterglue_loss.lighterglue_loss` consumes."""
    from ..ops.extraction import detect_and_compute
    from .augmentation import view2_to_view1

    g1 = jnp.mean(pair["view1"], -1, keepdims=True)
    g2 = jnp.mean(pair["view2"], -1, keepdims=True)
    o0 = detect_and_compute(xfeat_params, g1, top_k=top_k,
                            detection_threshold=detection_threshold)
    o1 = detect_and_compute(xfeat_params, g2, top_k=top_k,
                            detection_threshold=detection_threshold)
    k0, k1 = o0["keypoints"], o1["keypoints"]            # (B, K, 2)
    v0, v1 = o0["valid"], o1["valid"]

    # view-2 keypoints mapped into the view-1 frame via the exact inverse
    # warp (homography + optional TPS), per item
    ctrl, dst, wgt, aff = pair["tps2"]
    k1_in1 = jax.vmap(
        lambda p2, H1, H2, c, d, w, a: view2_to_view1(
            p2, H1, H2, cfg, (c, d, w, a)))(
        k1, pair["H1"], pair["H2"], ctrl, dst, wgt, aff)

    d2 = jnp.sum((k0[:, :, None, :] - k1_in1[:, None, :, :]) ** 2, -1)
    d2 = jnp.where(v0[:, :, None] & v1[:, None, :], d2, jnp.inf)
    j_star = jnp.argmin(d2, axis=2)                      # (B, K) best j per i
    i_star = jnp.argmin(d2, axis=1)                      # (B, K) best i per j
    dmin0 = jnp.min(d2, axis=2)
    dmin1 = jnp.min(d2, axis=1)
    K = k0.shape[1]
    ar = jnp.arange(K)[None, :]
    mutual = jnp.take_along_axis(i_star, j_star, axis=1) == ar
    matched = mutual & (dmin0 < match_px ** 2) & v0

    # pack matched rows first and truncate to the GT budget; with a key,
    # over-budget matches are randomly subsampled (raster-order truncation
    # would systematically drop late-raster keypoints — the same bias
    # train/warp.corr_to_fixed fixes)
    S = n_gt or K
    if key is not None:
        prio = jnp.where(matched, jax.random.uniform(key, matched.shape),
                         2.0)
        order = jnp.argsort(prio, axis=1)
    else:
        order = jnp.argsort(~matched, axis=1, stable=True)
    gt_idx0 = order[:, :S].astype(jnp.int32)
    gt_idx1 = jnp.take_along_axis(j_star, order, axis=1)[:, :S] \
        .astype(jnp.int32)
    gt_valid = jnp.take_along_axis(matched, order, axis=1)[:, :S]

    w_out, h_out = cfg.out_resolution
    size = jnp.broadcast_to(jnp.asarray([float(w_out), float(h_out)]),
                            (k0.shape[0], 2))
    return {
        "kpts0": k0, "kpts1": k1,
        "descs0": o0["descriptors"], "descs1": o1["descriptors"],
        "size0": size, "size1": size,
        "mask0": v0, "mask1": v1,
        "gt_idx0": gt_idx0, "gt_idx1": gt_idx1, "gt_valid": gt_valid,
        "unmatched0": v0 & (dmin0 > unmatch_px ** 2),
        "unmatched1": v1 & (dmin1 > unmatch_px ** 2),
    }


def parse_args():
    ap = argparse.ArgumentParser(description="LighterGlue training")
    ap.add_argument("--synthetic_root_path", type=str, required=True)
    ap.add_argument("--ckpt_save_path", type=str, required=True)
    ap.add_argument("--xfeat_weights", type=str, default=None,
                    help="frozen extractor weights (.npz/.pt or a training "
                         "checkpoint); None = random init (smoke only)")
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--top_k", type=int, default=512)
    ap.add_argument("--n_steps", type=int, default=50_000)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--training_res", type=lambda s: tuple(
        map(int, s.split(","))), default=(800, 608))
    ap.add_argument("--detection_threshold", type=float, default=None,
                    help="default 0.012 for random extractor, 0.05 trained")
    ap.add_argument("--save_ckpt_every", type=int, default=1000)
    ap.add_argument("--difficulty", type=float, default=0.10)
    return ap.parse_args()


def main(argv=None):
    import optax

    from ..api import load_params
    from ..models.lighterglue import DEFAULT_CONF, init_lighterglue_params
    from ..utils.checkpoint import resume_or_init, save_checkpoint
    from .augmentation import AugConfig, make_pair
    from .lighterglue_loss import lighterglue_loss
    from .megadepth import ImageFolderSource

    args = parse_args() if argv is None else argv
    thr = args.detection_threshold
    if thr is None:
        thr = 0.05 if args.xfeat_weights else 0.012
    xfeat_params = load_params(args.xfeat_weights)

    cfg = AugConfig(warp_resolution=args.training_res,
                    out_resolution=args.training_res)
    source = ImageFolderSource(args.synthetic_root_path, args.training_res)

    params = init_lighterglue_params(jax.random.key(0), DEFAULT_CONF)
    opt = optax.adam(args.lr)
    state = init_lg_train_state(params, opt)
    state, resumed = resume_or_init(args.ckpt_save_path, state)
    start = int(state["step"])
    if resumed:
        print(f"[resume] from step {start}")

    @jax.jit
    def make_batch(key, pool, idx):
        # device-resident uint8 pool: per-step transfer is (key, idx) only
        # (the relay client leaks transfer buffers — see train/run.py
        # SyntheticBatcher.gen — and full f32 batches OOM long runs)
        from ..ops.resize import to_unit_float
        images = to_unit_float(pool[idx])
        k1, k2 = jax.random.split(key)
        pair = make_pair(k1, images, cfg, args.difficulty, tps_prob=0.7)
        return build_lg_batch(xfeat_params, pair, cfg, args.top_k, thr,
                              key=k2)

    pool_dev = jnp.asarray(source.pool_u8())

    @jax.jit
    def step_fn(state, batch):
        (loss, metrics), grads = jax.value_and_grad(
            lambda p: lighterglue_loss(p, batch), has_aux=True)(
            state["params"])
        updates, opt_state = opt.update(grads, state["opt_state"])
        new = {"params": optax.apply_updates(state["params"], updates),
               "opt_state": opt_state, "step": state["step"] + 1}
        return new, loss, metrics

    # preemption safety (same contract as train/run.py): on SIGTERM/SIGINT,
    # checkpoint at the next step boundary and exit cleanly so a driver
    # kill never loses more than one step
    stop_requested = {"flag": False}

    def _request_stop(signum, frame):
        stop_requested["flag"] = True
        print(f"[signal {signum}] checkpoint-and-exit requested", flush=True)

    # save + restore the previous handlers so library callers (tests,
    # drivers invoking main(argv=...)) keep their process-global handlers
    prev_term = signal.signal(signal.SIGTERM, _request_stop)
    prev_int = signal.signal(signal.SIGINT, _request_stop)

    key = jax.random.key(start + 1)
    t0 = time.time()
    try:
        for i in range(start, args.n_steps):
            key, sub = jax.random.split(key)
            idx, changed = source.sample_indices(args.batch_size)
            if changed:
                pool_dev = jnp.asarray(source.pool_u8())
            batch = make_batch(sub, pool_dev, jnp.asarray(idx))
            state, loss, metrics = step_fn(state, batch)
            if (i + 1) % args.save_ckpt_every == 0 or stop_requested["flag"]:
                path = save_checkpoint(args.ckpt_save_path,
                                       jax.device_get(state), i + 1)
                print(f"[ckpt] step {i + 1} -> {path}")
            if stop_requested["flag"]:
                print(f"[preempt] state saved at step {i + 1}; exiting "
                      "(resume with the same --ckpt_save_path)", flush=True)
                return
            if (i + 1) % 10 == 0:
                rate = (i + 1 - start) / (time.time() - t0)
                m = {k: float(v) for k, v in metrics.items()}
                n_gt = float(jnp.sum(batch["gt_valid"])) / len(
                    batch["gt_valid"])
                print(f"step {i + 1} loss {float(loss):.4f} "
                      f"match_acc {m.get('match_acc', 0):.3f} "
                      f"gt/pair {n_gt:.0f} ({rate:.2f} it/s)", flush=True)
        final_step = int(state["step"])
        if final_step > start and final_step % args.save_ckpt_every != 0:
            # label with the ACTUAL step (n_steps would mislabel a resumed
            # or already-finished run); skip if the loop just saved it
            save_checkpoint(args.ckpt_save_path, jax.device_get(state),
                            final_step)
        print("done")
    finally:
        signal.signal(signal.SIGTERM, prev_term)
        signal.signal(signal.SIGINT, prev_int)


if __name__ == "__main__":
    main()
