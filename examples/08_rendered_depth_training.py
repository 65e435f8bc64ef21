"""End-to-end depth-supervised training + relative-pose eval WITHOUT any
real dataset: render a tiny procedural multi-view scene set in the
MegaDepth on-disk layout, train the depth-supervised branch on it for a
few steps, and run the essential-matrix pose benchmark on the held-out
rendered pairs.

This exercises the exact code paths a real MegaDepth download would:
  train/megadepth.py (scene_info npz index, h5 depths)
    -> train/warp.spvs_coarse (depth-warped GT, reference
       megadepth_warper.py:86-145)
    -> train/run.py (mixed trainer, --md_resident device-resident path)
  eval/megadepth1500.run_benchmark (protocol-exact pose AUC,
    reference megadepth1500.py) over rendered GT poses.

Runs in ~3 minutes on CPU at toy resolution; scale --scenes/--res up on
a real chip (apps/render_depth_dataset.py defaults render 800x608).
"""
import json
import os
import subprocess
import sys
import tempfile

import numpy as np

# CPU everywhere: the example must run anywhere in ~3 minutes, and this
# environment's sitecustomize ignores JAX_PLATFORMS (jax.config wins)
import jax
jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RES = "160x128"


def main():
    import cv2
    work = tempfile.mkdtemp(prefix="rendered_demo_")
    tex_dir = os.path.join(work, "textures")
    data_dir = os.path.join(work, "data")
    os.makedirs(tex_dir)

    # 1. a handful of procedural textures (any image folder works)
    rng = np.random.default_rng(0)
    for i in range(8):
        cv2.imwrite(os.path.join(tex_dir, f"t{i}.png"),
                    (rng.random((96, 96, 3)) * 255).astype(np.uint8))

    # 2. render train + holdout scenes in the MegaDepth layout
    subprocess.run([
        sys.executable, os.path.join(REPO, "apps",
                                     "render_depth_dataset.py"),
        "--out", data_dir, "--textures", tex_dir, "--scenes", "2",
        "--views", "3", "--holdout_scenes", "1", "--res", RES,
        "--quads", "8", "--textures_per_scene", "4"], check=True)

    # 3. train the depth-supervised branch for a few steps
    w, h = RES.split("x")
    subprocess.run([
        sys.executable, "-m", "accelerated_features_tpu.train.run",
        "--training_type", "xfeat_megadepth",
        "--megadepth_root_path", data_dir, "--md_resident",
        "--ckpt_save_path", os.path.join(work, "ckpts"),
        "--batch_size", "2", "--n_steps", "3", "--max_corrs", "64",
        "--training_res", f"{w},{h}", "--save_ckpt_every", "3",
        "--platform", "cpu"],
        check=True, cwd=REPO)

    # 4. held-out relative-pose eval with GT intrinsics/poses
    from accelerated_features_tpu.eval.megadepth1500 import (make_matcher,
                                                             run_benchmark)
    fn = make_matcher("xfeat", top_k=512,
                      weights=os.path.join(work, "ckpts"))
    summary = run_benchmark(fn, data_dir,
                            os.path.join(data_dir,
                                         "rendered_pose_pairs.json"),
                            progress=False)
    print(json.dumps(summary, indent=2))
    print("ok: rendered-data training + pose eval ran end to end")


if __name__ == "__main__":
    main()
