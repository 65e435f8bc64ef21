"""Render a procedural depth dataset in the MegaDepth on-disk layout.

Produces exactly what train/megadepth.py consumes (reference layout,
modules/dataset/megadepth/megadepth.py:21-86):

  <out>/MegaDepth_v1/rendered/scene_NNNN/imgs/view_V.png
  <out>/MegaDepth_v1/rendered/scene_NNNN/depths/view_V.h5   ('/depth')
  <out>/train_data/megadepth_indices/scene_info_0.1_0.7/scene_NNNN.npz
      (image_paths, depth_paths, intrinsics, poses, pair_infos)

plus, for `--holdout_scenes` extra scenes, a relative-pose eval manifest
in the megadepth_1500.json schema (pair_names/K0/K1/T_0to1) at
<out>/rendered_pose_pairs.json — directly consumable by
eval/megadepth1500.run_benchmark(data_root=<out>, json_path=<that file>),
giving an offline essential-matrix AUC@{5,10,20} deg benchmark with
exact ground-truth poses (VERDICT r3 'Next round' #3).

Usage:
  python apps/render_depth_dataset.py --out /tmp/rendered_md \
      --textures /tmp/synth_pool --scenes 50 --views 4 \
      --holdout_scenes 15 [--res 800x608] [--seed 0]
"""
import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def load_textures(tex_dir: str, n: int, rng, res=(256, 256)):
    """Random texture crops from a pool directory (the synthetic pool
    images are corner-rich by construction)."""
    import cv2
    paths = sorted(glob.glob(os.path.join(tex_dir, "*.png")) +
                   glob.glob(os.path.join(tex_dir, "*.jpg")))
    if not paths:
        raise FileNotFoundError(f"no textures in {tex_dir}")
    out = []
    for p in rng.choice(paths, size=min(n, len(paths)), replace=False):
        im = cv2.imread(str(p))
        if im is None:
            continue
        h, w = im.shape[:2]
        ch, cw = min(res[1], h), min(res[0], w)
        y0 = rng.integers(0, h - ch + 1)
        x0 = rng.integers(0, w - cw + 1)
        out.append(np.ascontiguousarray(im[y0:y0 + ch, x0:x0 + cw]))
    if not out:
        raise RuntimeError("no readable textures")
    return out


def write_scene(scene_dir: str, views: dict, h5py):
    """Write imgs/ + depths/ for one rendered scene; returns relative
    image/depth paths (relative to MegaDepth_v1)."""
    import cv2
    os.makedirs(os.path.join(scene_dir, "imgs"), exist_ok=True)
    os.makedirs(os.path.join(scene_dir, "depths"), exist_ok=True)
    rel = os.path.relpath(scene_dir,
                          os.path.join(scene_dir, "..", ".."))
    img_paths, depth_paths = [], []
    for vi, (img, depth) in enumerate(zip(views["images"],
                                          views["depths"])):
        ip = os.path.join(scene_dir, "imgs", f"view_{vi}.png")
        dp = os.path.join(scene_dir, "depths", f"view_{vi}.h5")
        cv2.imwrite(ip, img)
        with h5py.File(dp, "w") as f:
            f.create_dataset("depth", data=depth, compression="gzip")
        img_paths.append(os.path.join(rel, "imgs", f"view_{vi}.png"))
        depth_paths.append(os.path.join(rel, "depths", f"view_{vi}.h5"))
    return img_paths, depth_paths


def main():
    import cv2  # noqa: F401  (fail fast if unavailable)
    import h5py

    from accelerated_features_tpu.train.render import (pair_overlap,
                                                       render_scene_views)

    ap = argparse.ArgumentParser()
    ap.add_argument("--out", type=str, required=True)
    ap.add_argument("--textures", type=str, required=True)
    ap.add_argument("--scenes", type=int, default=50)
    ap.add_argument("--views", type=int, default=4)
    ap.add_argument("--holdout_scenes", type=int, default=15,
                    help="extra scenes for the relative-pose eval JSON "
                         "(never indexed for training)")
    ap.add_argument("--res", type=str, default="800x608")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--quads", type=int, default=12)
    ap.add_argument("--textures_per_scene", type=int, default=16)
    ap.add_argument("--min_overlap", type=float, default=0.3)
    ap.add_argument("--scene_offset", type=int, default=0,
                    help="offset added to scene numbering so several "
                         "renderer processes can shard one dataset")
    ap.add_argument("--baseline", type=str, default="0.08,0.35",
                    help="min,max camera baseline as a fraction of the "
                         "scene distance (wider = harder pairs)")
    args = ap.parse_args()
    b_lo, b_hi = map(float, args.baseline.split(","))

    w, h = map(int, args.res.split("x"))
    rng = np.random.default_rng(args.seed)

    md_root = os.path.join(args.out, "MegaDepth_v1")
    idx_dir = os.path.join(args.out, "train_data", "megadepth_indices",
                           "scene_info_0.1_0.7")
    os.makedirs(idx_dir, exist_ok=True)

    n_total = args.scenes + args.holdout_scenes
    eval_pairs = []
    n_train_pairs = 0
    for si in range(n_total):
        train_scene = si < args.scenes
        texs = load_textures(args.textures, args.textures_per_scene, rng)
        views = render_scene_views(rng, texs, args.views, w, h,
                                   n_quads=args.quads,
                                   baseline_frac=(b_lo, b_hi))
        sn = si + args.scene_offset
        name = f"scene_{sn:04d}" if train_scene else f"holdout_{sn:04d}"
        scene_dir = os.path.join(md_root, "rendered", name)
        img_paths, depth_paths = write_scene(scene_dir, views, h5py)

        # all view pairs with overlap inside the training filter window
        pair_infos = []
        for i in range(args.views):
            for j in range(i + 1, args.views):
                T_i2j = views["poses"][j] @ np.linalg.inv(views["poses"][i])
                ov = pair_overlap(views["depths"][i], views["depths"][j],
                                  views["Ks"][i], views["Ks"][j], T_i2j)
                if not (args.min_overlap < ov < 1.0):
                    continue
                if train_scene:
                    pair_infos.append(((i, j), float(ov), 0))
                else:
                    eval_pairs.append({
                        "pair_names": [
                            os.path.join("MegaDepth_v1", img_paths[i]),
                            os.path.join("MegaDepth_v1", img_paths[j])],
                        "K0": views["Ks"][i].tolist(),
                        "K1": views["Ks"][j].tolist(),
                        "T_0to1": T_i2j.tolist(),
                        "overlap": float(ov),
                    })

        if train_scene:
            n_train_pairs += len(pair_infos)
            np.savez(
                os.path.join(idx_dir, f"{name}.npz"),
                image_paths=np.array(img_paths, dtype=object),
                depth_paths=np.array(depth_paths, dtype=object),
                intrinsics=np.array([k for k in views["Ks"]]),
                poses=np.array([p for p in views["poses"]]),
                pair_infos=np.array(
                    [(np.array(ij), ov, nc)
                     for (ij, ov, nc) in pair_infos], dtype=object),
            )
        if (si + 1) % 10 == 0:
            print(f"[{si + 1}/{n_total}] scenes rendered "
                  f"({n_train_pairs} train pairs so far)", flush=True)

    if eval_pairs:
        with open(os.path.join(args.out, "rendered_pose_pairs.json"),
                  "w") as f:
            json.dump(eval_pairs, f)
    print(f"done: {args.scenes} train scenes ({n_train_pairs} pairs), "
          f"{args.holdout_scenes} holdout scenes "
          f"({len(eval_pairs)} eval pairs) at {args.out}")


if __name__ == "__main__":
    main()
