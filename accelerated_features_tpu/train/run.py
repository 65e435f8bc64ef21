"""Training entry point — the reference's `python -m modules.training.train`
equivalent (reference train.py), TPU-native.

Data recipe matches the reference default (train.py:86-125): batch split 40%
synthetic homography/TPS warps + 60% MegaDepth depth-supervised pairs; Adam
3e-4 with staircase decay; losses per train/losses.py. Improvements over the
reference: checkpoints carry full state and RESUME (utils/checkpoint.py),
the whole step is one jit over a device mesh (dp x tp), and GT generation is
on-device fixed-shape (train/warp.py, train/augmentation.py).

Runs without datasets in --dry_run mode (synthetic random batch, sanity
check — reference train.py:35-36 analogue).

Usage:
  python -m accelerated_features_tpu.train.run --ckpt_save_path /tmp/ckpts \
      [--megadepth_root_path ...] [--synthetic_root_path ...] [--dry_run]
"""

from __future__ import annotations

import argparse
import os
import signal
import time
from typing import Dict, Iterator, Optional

# Persistent compile cache: the sharded train step is a large program
# (~20 min first compile via the TPU relay); chunked/resumed runs must
# not re-pay it. Must be set before the first jax import in-process.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.jax_cache"))

import numpy as np

import jax
import jax.numpy as jnp

from ..models.params import init_xfeat_params
from ..ops.resize import to_unit_float
from ..parallel.mesh import make_mesh
from ..utils.checkpoint import resume_or_init, save_checkpoint
from .augmentation import (AugConfig, make_pair, pair_correspondences,
                           pair_correspondences_full)
from .megadepth import ImageFolderSource, MegaDepthLoader
from .trainer import (TrainConfig, init_train_state,
                      make_sharded_train_step)
from .warp import corr_to_fixed, spvs_coarse, spvs_full


def parse_args():
    ap = argparse.ArgumentParser(description="XFeat TPU training")
    ap.add_argument("--megadepth_root_path", type=str, default=None)
    ap.add_argument("--synthetic_root_path", type=str, default=None)
    ap.add_argument("--ckpt_save_path", type=str, required=True)
    ap.add_argument("--training_type", type=str, default="xfeat_default",
                    choices=["xfeat_default", "xfeat_synthetic",
                             "xfeat_megadepth"])
    ap.add_argument("--batch_size", type=int, default=10)
    ap.add_argument("--n_steps", type=int, default=160_000)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--gamma_steplr", type=float, default=0.5)
    ap.add_argument("--training_res", type=lambda s: tuple(
        map(int, s.split(","))), default=(800, 608))
    ap.add_argument("--dry_run", action="store_true")
    ap.add_argument("--save_ckpt_every", type=int, default=500)
    ap.add_argument("--max_corrs", type=int, default=1024,
                    help="fixed correspondence budget per pair")
    ap.add_argument("--mesh", type=lambda s: tuple(map(int, s.split("x"))),
                    default=None, help="data x model mesh, e.g. 4x2")
    ap.add_argument("--platform", type=str, default=None,
                    choices=["cpu", "tpu"],
                    help="force the JAX backend. Needed for CPU smoke "
                         "runs in environments whose sitecustomize "
                         "ignores JAX_PLATFORMS (jax.config is applied "
                         "before first backend use)")
    ap.add_argument("--md_resident", action="store_true",
                    help="ship the WHOLE MegaDepth-layout dataset to HBM "
                         "once (uint8 images + depths) and stream only "
                         "pair indices per step — required for long runs "
                         "through the dev relay (transfer-buffer leak) and "
                         "only valid for datasets that fit in HBM, e.g. "
                         "the rendered procedural set")
    ap.add_argument("--distill_teacher", type=str, default=None,
                    help="weights (.npz/.pt) of a teacher XFeat whose "
                         "keypoints supervise the keypoint head on-device "
                         "(replaces the reference's in-loop ALIKE teacher)")
    return ap.parse_args()


class SyntheticBatcher:
    """Synthetic warped-pair stream (reference make_batch,
    training/utils.py:7-24): images -> two augmented views + /8 GT."""

    def __init__(self, source: Optional[ImageFolderSource], cfg: AugConfig,
                 batch_size: int, max_corrs: int, difficulty: float = 0.10):
        self.source = source
        self.cfg = cfg
        self.batch_size = batch_size
        self.max_corrs = max_corrs
        self.difficulty = difficulty
        self._key = jax.random.key(0)

        def gen(key, pool, idx):
            # images gathered from the DEVICE-RESIDENT uint8 pool: the
            # per-step host->device transfer is just (key, idx) — a few
            # bytes. This matters doubly here: the dev environment's
            # remote-relay client leaks every transfer buffer (~59 MB
            # retained per step when full f32 batches were shipped, OOM
            # at ~2200 steps), and even healthy runtimes save the 58
            # MB/step of PCIe/relay traffic.
            images = to_unit_float(pool[idx])
            k1, k2, k3 = jax.random.split(key, 3)
            pair = make_pair(k1, images, cfg, difficulty, tps_prob=0.7)
            corrs, mask = pair_correspondences(pair, cfg)
            corrs, mask = corr_to_fixed(corrs, mask, max_corrs, key=k3)
            # independent jittered full-res set for the teacher-free
            # keypoint_position_loss (rows need not align with `corrs`;
            # already fixed-shape at one point per /8 cell — kept whole,
            # since the loss's hashmap hit rate scales with density)
            cf, cf_mask = pair_correspondences_full(pair, cfg, k2)
            g1 = jnp.mean(pair["view1"], -1, keepdims=True)
            g2 = jnp.mean(pair["view2"], -1, keepdims=True)
            return {"image0": g1, "image1": g2, "corrs": corrs,
                    "corr_valid": mask, "corrs_full": cf,
                    "corr_full_valid": cf_mask}

        self._gen = jax.jit(gen)
        self._pool_dev = None

    def next(self) -> Dict[str, jax.Array]:
        self._key, sub = jax.random.split(self._key)
        idx, changed = self.source.sample_indices(self.batch_size)
        if self._pool_dev is None or changed:
            self._pool_dev = jnp.asarray(self.source.pool_u8())
        return self._gen(sub, self._pool_dev, jnp.asarray(idx))


class ResidentMegaDepthBatcher:
    """Depth-supervised stream with the WHOLE dataset resident in HBM
    (megadepth.load_all_views): per-step host->device traffic is just
    (key, pair indices). This is what makes long MegaDepth-branch runs
    possible through the dev relay (it retains every transfer buffer,
    ~59 MB host RSS per 60 MB shipped — a streamed 2x6-image depth batch
    is ~55 MB/step, i.e. OOM within ~2k steps), and on healthy runtimes
    it still removes ~55 MB/step of host->device traffic. Use the
    streaming MegaDepthBatcher for datasets that exceed HBM."""

    def __init__(self, megadepth_root: str, batch_size: int,
                 image_size, max_corrs: int, seed: int = 0):
        from .megadepth import load_all_views
        views = load_all_views(megadepth_root, image_size)
        n_bytes = sum(v.nbytes for v in views.values())
        print(f"[md-resident] {views['images'].shape[0]} views, "
              f"{len(views['pair_i0'])} pairs, "
              f"{n_bytes / 1e9:.2f} GB -> device")
        self.n_pairs = len(views["pair_i0"])
        self.batch_size = batch_size
        self._rng = np.random.default_rng(seed)
        self._key = jax.random.key(2)
        # depths ride HBM as bf16 (halves the dominant resident buffer:
        # 2.35 GB -> 1.17 GB for the 1206-view round-5 dataset, which
        # otherwise OOMs the v5e at the step-checkpoint readback). bf16's
        # ~0.4% relative precision is far inside the 3% depth-consistency
        # tolerance spvs_coarse filters with (train/warp.py).
        self._dev = {k: jnp.asarray(v, jnp.bfloat16) if k == "depths"
                     else jnp.asarray(v) for k, v in views.items()}

        def gen(key, idx, dev):
            i0 = dev["pair_i0"][idx]
            i1 = dev["pair_i1"][idx]
            d = {
                "image0": to_unit_float(dev["images"][i0]),
                "image1": to_unit_float(dev["images"][i1]),
                "depth0": dev["depths"][i0].astype(jnp.float32),
                "depth1": dev["depths"][i1].astype(jnp.float32),
                "K0": dev["Ks"][i0], "K1": dev["Ks"][i1],
                "T_0to1": dev["T_0to1"][idx],
                "T_1to0": dev["T_1to0"][idx],
                "scale0": dev["scales"][i0],
                "scale1": dev["scales"][i1],
            }
            k1, k2 = jax.random.split(key)
            corrs, mask = spvs_coarse(d, 8)
            corrs, mask = corr_to_fixed(corrs, mask, max_corrs, key=k1)
            cf, cf_mask = spvs_full(d, k2, 8)
            return {"image0": d["image0"], "image1": d["image1"],
                    "corrs": corrs, "corr_valid": mask,
                    "corrs_full": cf, "corr_full_valid": cf_mask}

        self._gen = jax.jit(gen)

    def next(self) -> Dict[str, jax.Array]:
        self._key, sub = jax.random.split(self._key)
        idx = self._rng.integers(0, self.n_pairs, self.batch_size)
        return self._gen(sub, jnp.asarray(idx, jnp.int32), self._dev)


class MegaDepthBatcher:
    """Depth-supervised stream: host loader + on-device spvs_coarse."""

    def __init__(self, loader: MegaDepthLoader, max_corrs: int):
        self.it = loader.infinite()
        self.max_corrs = max_corrs

        def gen(d, key):
            k1, k2 = jax.random.split(key)
            corrs, mask = spvs_coarse(d, 8)
            corrs, mask = corr_to_fixed(corrs, mask, max_corrs, key=k1)
            cf, cf_mask = spvs_full(d, k2, 8)
            g0 = jnp.mean(d["image0"], -1, keepdims=True)
            g1 = jnp.mean(d["image1"], -1, keepdims=True)
            return {"image0": g0, "image1": g1, "corrs": corrs,
                    "corr_valid": mask, "corrs_full": cf,
                    "corr_full_valid": cf_mask}

        self._gen = jax.jit(gen)
        self._key = jax.random.key(1)

    def next(self) -> Dict[str, jax.Array]:
        d = next(self.it)
        self._key, sub = jax.random.split(self._key)
        return self._gen({k: jnp.asarray(v) for k, v in d.items()}, sub)


def dry_run_batch(batch_size: int, res, max_corrs: int):
    rng = np.random.default_rng(0)
    W, H = res
    return {
        "image0": jnp.asarray(rng.uniform(0, 1, (batch_size, H, W, 1)),
                              jnp.float32),
        "image1": jnp.asarray(rng.uniform(0, 1, (batch_size, H, W, 1)),
                              jnp.float32),
        "corrs": jnp.asarray(
            rng.integers(2, min(H, W) // 8 - 2,
                         (batch_size, max_corrs, 4)), jnp.float32),
        "corr_valid": jnp.ones((batch_size, max_corrs), bool),
        "corrs_full": jnp.asarray(
            rng.uniform(16, min(H, W) - 16, (batch_size, max_corrs, 4)),
            jnp.float32),
        "corr_full_valid": jnp.ones((batch_size, max_corrs), bool),
    }


def main():
    args = parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    # Distillation: on when a teacher checkpoint is given — its keypoints
    # are computed ON DEVICE per batch (train/utils.py make_xfeat_teacher),
    # replacing the reference's per-step ALIKE CPU round-trip
    # (reference losses.py:78-81).
    teacher_fn = None
    if args.distill_teacher:
        from .utils import make_xfeat_teacher
        teacher_fn = make_xfeat_teacher(args.distill_teacher)
    # without a teacher, the keypoint head bootstraps teacher-free via
    # keypoint_position_loss (VERDICT r1 #5; reference losses.py:111-168)
    cfg = TrainConfig(lr=args.lr, lr_gamma=args.gamma_steplr,
                      use_distill=teacher_fn is not None,
                      use_kp_position=teacher_fn is None)

    params = init_xfeat_params(jax.random.key(0))
    state = init_train_state(params, cfg)
    state, resumed = resume_or_init(args.ckpt_save_path, state)
    start_step = int(state["step"])
    if resumed:
        print(f"[resume] from step {start_step}")

    # data sources. The per-source sizes are fixed FIRST so the mesh data
    # axis can be derived from the batch that actually reaches the step:
    # in the 40/60 split int(0.4B)+int(0.6B) != B for e.g. B=7, and sharding
    # by B would shape-error at step time.
    use_synth = args.training_type in ("xfeat_default", "xfeat_synthetic")
    use_md = args.training_type in ("xfeat_default", "xfeat_megadepth")
    bs_synth = int(args.batch_size * 0.4) if args.training_type == \
        "xfeat_default" else args.batch_size
    bs_md = int(args.batch_size * 0.6) if args.training_type == \
        "xfeat_default" else args.batch_size
    eff_batch = (bs_synth + bs_md) if args.training_type == "xfeat_default" \
        else args.batch_size
    if (use_synth and bs_synth < 1) or (use_md and bs_md < 1):
        raise SystemExit(f"--batch_size {args.batch_size} leaves an empty "
                         f"sub-batch under the 40/60 split of "
                         f"'{args.training_type}'; use batch_size >= 3")
    # a training_type that requires a data source must get its path (only
    # --dry_run may run on the fixed random batch; otherwise a forgotten
    # path would silently 'train' n_steps on noise and write checkpoints)
    if not args.dry_run:
        if use_synth and not args.synthetic_root_path:
            raise SystemExit(f"--training_type {args.training_type} needs "
                             "--synthetic_root_path (or pass --dry_run)")
        if use_md and not args.megadepth_root_path:
            raise SystemExit(f"--training_type {args.training_type} needs "
                             "--megadepth_root_path (or pass --dry_run)")

    n_dev = len(jax.devices())
    if args.mesh:
        mesh_shape = args.mesh
    else:
        # data axis must divide the batch: largest divisor of batch <= n_dev
        data_ax = max(d for d in range(1, n_dev + 1)
                      if eff_batch % d == 0 and n_dev % d == 0)
        mesh_shape = (data_ax, 1)
        if data_ax < n_dev:
            print(f"[mesh] using {data_ax} of {n_dev} devices on the data "
                  f"axis (batch {eff_batch}); pass --mesh to override")
    mesh = make_mesh(mesh_shape, devices=jax.devices()[
        :mesh_shape[0] * mesh_shape[1]])

    synth = md = None
    if not args.dry_run:
        if use_synth and args.synthetic_root_path:
            aug_cfg = AugConfig(warp_resolution=args.training_res,
                                out_resolution=args.training_res)
            synth = SyntheticBatcher(
                ImageFolderSource(args.synthetic_root_path,
                                  args.training_res),
                aug_cfg, bs_synth, args.max_corrs)
        if use_md and args.megadepth_root_path:
            if args.md_resident:
                md = ResidentMegaDepthBatcher(
                    args.megadepth_root_path, bs_md,
                    (args.training_res[0], args.training_res[1]),
                    args.max_corrs)
            else:
                md = MegaDepthBatcher(
                    MegaDepthLoader(
                        args.megadepth_root_path, bs_md,
                        (args.training_res[0], args.training_res[1])),
                    args.max_corrs)
    if args.dry_run or (synth is None and md is None):
        fixed = dry_run_batch(eff_batch, args.training_res, args.max_corrs)
        get_batch = lambda: fixed
        n_steps = min(args.n_steps, 10) if args.dry_run else args.n_steps
    else:
        def get_batch():
            parts = []
            if synth is not None:
                parts.append(synth.next())
            if md is not None:
                parts.append(md.next())
            return {k: jnp.concatenate([p[k] for p in parts])
                    for k in parts[0]}
        n_steps = args.n_steps

    class _Prefetcher:
        """Producer thread for get_batch(): overlaps host-side batch work
        (MegaDepth disk/h5 IO — the reference's stated bottleneck,
        train.py:70-71 — plus numpy assembly and dispatch of the on-device
        augmentation) with the device training step. Queue depth 2 keeps
        exactly one batch in flight without ballooning device memory."""

        def __init__(self, fn, depth: int = 2):
            import queue as _q
            import threading as _t
            self._queue = _q.Queue(maxsize=depth)
            self._stop = False

            def worker():
                import queue as _q2
                while not self._stop:
                    try:
                        item = (fn(), None)
                    except BaseException as e:   # surface in the main loop
                        item = (None, e)
                    while not self._stop:        # interruptible put
                        try:
                            self._queue.put(item, timeout=0.5)
                            break
                        except _q2.Full:
                            continue
                    if item[1] is not None:
                        return
            self._thread = _t.Thread(target=worker, daemon=True)
            self._thread.start()

        def __call__(self):
            batch, err = self._queue.get()
            if err is not None:
                raise err
            return batch

        def stop(self):
            self._stop = True

    if not (args.dry_run or (synth is None and md is None)):
        get_batch = _Prefetcher(get_batch)

    def prepare(batch):
        if teacher_fn is not None:
            batch = dict(batch)
            batch["distill_labels0"] = teacher_fn(batch["image0"])
            batch["distill_labels1"] = teacher_fn(batch["image1"])
        return batch

    # preemption safety: on SIGTERM/SIGINT, checkpoint at the next step
    # boundary and exit cleanly (TPU pods are frequently preemptible; the
    # reference has no recovery story at all, train.py:271-273)
    stop_requested = {"flag": False}

    def _request_stop(signum, frame):
        stop_requested["flag"] = True
        print(f"[signal {signum}] checkpoint-and-exit requested")

    # save + restore the previous handlers so library callers (tests,
    # drivers invoking main()) keep their process-global handlers
    prev_term = signal.signal(signal.SIGTERM, _request_stop)
    prev_int = signal.signal(signal.SIGINT, _request_stop)

    example = prepare(get_batch())
    try:
        _train_loop(args, cfg, mesh, state, example, get_batch, prepare,
                    start_step, n_steps, stop_requested)
    finally:
        signal.signal(signal.SIGTERM, prev_term)
        signal.signal(signal.SIGINT, prev_int)
        if isinstance(get_batch, _Prefetcher):
            get_batch.stop()     # don't leak the producer thread to callers


def _train_loop(args, cfg, mesh, state, example, get_batch, prepare,
                start_step, n_steps, stop_requested):
    with mesh:
        step_fn, state_sh, shard_batch = make_sharded_train_step(
            mesh, state, example, cfg)
        writer = _make_writer(args.ckpt_save_path)
        t0 = time.time()
        for i in range(start_step, n_steps):
            batch = prepare(get_batch())
            # skip corrupted batches (<30 correspondences anywhere,
            # reference train.py:207-214)
            n_ok = np.asarray(jnp.sum(batch["corr_valid"], -1))
            if (n_ok < 30).any() and not args.dry_run:
                continue
            state_sh, metrics = step_fn(state_sh, shard_batch(batch),
                                        jax.random.key(i))
            if (i + 1) % args.save_ckpt_every == 0 or stop_requested["flag"]:
                path = save_checkpoint(args.ckpt_save_path,
                                       jax.device_get(state_sh), i + 1)
                print(f"[ckpt] step {i + 1} -> {path}")
            if stop_requested["flag"]:
                print(f"[preempt] state saved at step {i + 1}; exiting "
                      "(resume with the same --ckpt_save_path)")
                return
            if (i + 1) % 10 == 0 or args.dry_run:
                m = {k: float(v) for k, v in metrics.items()}
                rate = (i + 1 - start_step) / (time.time() - t0)
                print(f"step {i + 1} loss {m['loss_total']:.4f} "
                      f"coarse {m['loss_coarse']:.3f} fine {m['loss_fine']:.3f} "
                      f"rel {m['loss_reliability']:.3f} "
                      f"({rate:.2f} it/s)")
                if writer:
                    for k, v in m.items():
                        writer.add_scalar(k, v, i + 1)
    print("done")


def _make_writer(ckpt_dir: str):
    try:
        from torch.utils.tensorboard import SummaryWriter
        return SummaryWriter(os.path.join(ckpt_dir, "logdir"))
    except Exception:
        return None


if __name__ == "__main__":
    main()
