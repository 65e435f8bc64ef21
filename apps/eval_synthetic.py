"""Held-out synthetic homography benchmark — the offline AUC proxy.

With the reference checkpoints stripped and no network egress, MegaDepth
AUC@5 can't be measured here; this harness provides the closest offline
substitute (VERDICT r1 #5): known-homography pairs from HELD-OUT images
(never seen by training), scored end to end through the real user path
(XFeat.match_xfeat -> native LO-RANSAC homography):

  * match precision @3 px under the GT homography,
  * matches per pair,
  * homography mean-average-corner-error (MACE) + AUC@{3,5,10} px of the
    corner error (the homography analogue of the pose AUC protocol,
    reference megadepth1500.py:159-196).

Usage:
  python apps/eval_synthetic.py --images /tmp/synth_pool_holdout \
      [--ckpt /tmp/run_tf] [--pairs 100] [--top_k 2048] [--json out.json]
No --ckpt evaluates random init (the "before" row).
"""
import argparse
import json
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def gt_homography(rng, w, h, difficulty=0.25):
    """Random projective warp around the image center (same family as the
    reference's augmentation homographies, augmentation.py:54-87)."""
    ang = rng.uniform(-30, 30) * np.pi / 180
    sc = rng.uniform(0.8, 1.25)
    tx, ty = rng.uniform(-0.08, 0.08, 2) * [w, h]
    px, py = rng.uniform(-1e-4, 1e-4, 2) * difficulty * 4
    shear = rng.uniform(-0.15, 0.15)
    c, s = np.cos(ang), np.sin(ang)
    T0 = np.array([[1, 0, -w / 2], [0, 1, -h / 2], [0, 0, 1]])
    # shear perturbs one off-diagonal only (keeps the generator identical
    # to the seeded distribution used for the recorded convergence tables)
    A = np.array([[sc * c, sc * (shear - s), tx],
                  [sc * s, sc * c, ty],
                  [px, py, 1.0]])
    T1 = np.array([[1, 0, w / 2], [0, 1, h / 2], [0, 0, 1]])
    return T1 @ A @ T0


def corner_error(H_est, H_gt, w, h):
    corners = np.array([[0, 0], [w, 0], [w, h], [0, h]], np.float64)

    def warp(H, p):
        ph = np.concatenate([p, np.ones((len(p), 1))], 1) @ H.T
        return ph[:, :2] / ph[:, 2:]

    return float(np.mean(np.linalg.norm(warp(H_est, corners) -
                                        warp(H_gt, corners), axis=1)))


def main():
    import cv2

    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=str, required=True)
    ap.add_argument("--ckpt", type=str, default=None,
                    help="training checkpoint dir/file; None = random "
                         "init. Comma-separated list sweeps several "
                         "checkpoints in ONE process (the jitted programs "
                         "are reused across checkpoints — params are call "
                         "arguments; see XFeat.set_params). The literal "
                         "'random' evaluates random init as a sweep row.")
    ap.add_argument("--pairs", type=int, default=100)
    ap.add_argument("--top_k", type=int, default=2048)
    ap.add_argument("--detection_threshold", type=float, default=None,
                    help="default: 0.012 for random init, 0.05 trained")
    ap.add_argument("--json", type=str, default=None)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--platform", type=str, default=None,
                    help="force a jax platform (e.g. cpu) so the sweep can "
                         "run while the TPU is busy training")
    ap.add_argument("--matcher", type=str, default="mnn",
                    choices=["mnn", "star", "lighterglue"],
                    help="mnn: match_xfeat; star: semi-dense "
                         "match_xfeat_star; lighterglue: attention "
                         "matcher (needs --lg_weights)")
    ap.add_argument("--lg_weights", type=str, default=None,
                    help="LighterGlue checkpoint (.npz/.pt or a "
                         "train/lighterglue_run checkpoint dir)")
    ap.add_argument("--lg_min_conf", type=str, default="0.1",
                    help="comma-separated confidence gates to sweep for "
                         "--matcher lighterglue (reference "
                         "filter_threshold 0.1); each value is one "
                         "result row, programs are reused across rows")
    args = ap.parse_args()

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    from accelerated_features_tpu import XFeat
    from accelerated_features_tpu.geometry import estimate_homography

    ckpts = [c.strip() for c in args.ckpt.split(",")] if args.ckpt \
        else [None]
    ckpts = [None if c in ("", "random") else c for c in ckpts]

    def ckpt_params(ckpt):
        if ckpt is None:
            return None
        from accelerated_features_tpu.utils.checkpoint import (
            load_params_from_checkpoint)
        return load_params_from_checkpoint(ckpt)

    def ckpt_thr(ckpt):
        if args.detection_threshold is not None:
            return args.detection_threshold
        return 0.05 if ckpt else 0.012

    xf = XFeat(weights=ckpt_params(ckpts[0]), top_k=args.top_k,
               detection_threshold=ckpt_thr(ckpts[0]))

    if args.matcher == "lighterglue":
        if not args.lg_weights:
            raise SystemExit("--matcher lighterglue needs --lg_weights "
                             "(pass 'random' to smoke-test random weights)")
        if args.lg_weights == "random":
            xf.set_lighterglue()
        else:
            # LighterGlue's loader handles .npz/.pt files AND training
            # checkpoint dirs (orbax or npz)
            xf.set_lighterglue(weights=args.lg_weights)

    def run_matcher(im0, im1, lg_min_conf=0.1):
        if args.matcher == "mnn":
            return xf.match_xfeat(im0, im1)
        if args.matcher == "star":
            return xf.match_xfeat_star(im0, im1)
        d0 = xf.detectAndCompute(im0)[0]
        d0["image_size"] = im0.shape[1::-1]
        d1 = xf.detectAndCompute(im1)[0]
        d1["image_size"] = im1.shape[1::-1]
        mk0, mk1, _ = xf.match_lighterglue(d0, d1, min_conf=lg_min_conf)
        return mk0, mk1

    import glob
    paths = sorted(glob.glob(os.path.join(args.images, "*.png")) +
                   glob.glob(os.path.join(args.images, "*.jpg")))
    if not paths:
        raise FileNotFoundError(args.images)

    def eval_one(ckpt, lg_min_conf=0.1):
        # same seed per checkpoint: every row sees the SAME pair set
        rng = np.random.default_rng(args.seed)
        prec, nm, mace, ok = [], [], [], 0
        for i in range(args.pairs):
            path = paths[i % len(paths)]
            im0 = cv2.imread(path)
            if im0 is None:
                print(f"[eval_synthetic] unreadable image skipped: {path}")
                prec.append(0.0)
                nm.append(0)
                continue
            h, w = im0.shape[:2]
            H_gt = gt_homography(rng, w, h)
            im1 = cv2.warpPerspective(im0, H_gt, (w, h))
            mk0, mk1 = run_matcher(im0, im1, lg_min_conf)
            nm.append(len(mk0))
            if len(mk0) >= 4:
                ph = np.concatenate([mk0, np.ones((len(mk0), 1))], 1) @ H_gt.T
                proj = ph[:, :2] / ph[:, 2:]
                err = np.linalg.norm(proj - mk1, axis=1)
                prec.append(float(np.mean(err < 3.0)))
                res = estimate_homography(mk0, mk1, thresh=4.0)
                if res is not None:
                    ok += 1
                    mace.append(corner_error(res[0], H_gt, w, h))
            else:
                prec.append(0.0)

        mace_arr = np.asarray(mace) if mace else np.asarray([1e9])
        # shared AUC implementation (eval/metrics.py); pairs with no
        # homography count as infinite error
        from accelerated_features_tpu.eval.metrics import error_auc
        errors_full = list(mace) + [np.inf] * (args.pairs - len(mace))
        a = error_auc(errors_full, thresholds=(3, 5, 10))
        aucs = {f"h_auc@{t}px": a[f"auc@{t}"] for t in (3, 5, 10)}
        row = {
            "ckpt": ckpt or "random-init",
            "matcher": args.matcher,
            "pairs": args.pairs,
            "seed": args.seed,
            "detection_threshold": xf.detection_threshold,
            "mean_matches": float(np.mean(nm)),
            "precision@3px": float(np.mean(prec)),
            "homography_success": ok / args.pairs,
            "mace_median_px": float(np.median(mace_arr)),
            **aucs,
        }
        if args.matcher == "lighterglue":
            row["lg_min_conf"] = lg_min_conf
        return row

    lg_confs = [float(c) for c in args.lg_min_conf.split(",")] \
        if args.matcher == "lighterglue" else [0.1]
    results = []
    for j, ckpt in enumerate(ckpts):
        if j > 0:     # first checkpoint was loaded at construction
            xf.set_params(ckpt_params(ckpt))
            xf.detection_threshold = ckpt_thr(ckpt)
        for mc in lg_confs:
            out = eval_one(ckpt, mc)
            print(json.dumps(out, indent=2), flush=True)
            results.append(out)
    if args.json:
        with open(args.json, "w") as f:
            json.dump(results if len(results) > 1 else results[0], f,
                      indent=2)


if __name__ == "__main__":
    main()
