"""Derive resolution-variant pose-eval manifests from a rendered pairs
JSON — the reference's published table evaluates at max-dimension 640
("Fast", 1300 kpts) and 1024 ("Accurate", 4096 kpts)
(reference README.md:212-216); the megadepth_1500.json schema carries
that as per-pair `size0_hw`/`size1_hw` (resize target) and
`scale0`/`scale1` (kpt -> intrinsic-resolution factors), which
eval/megadepth1500._resize_pair_images consumes.

Usage:
  python apps/make_eval_variants.py --json <pairs.json> \
      --data_root <root> --max_dim 640 --out <pairs_640.json>
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import cv2
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", required=True)
    ap.add_argument("--data_root", required=True)
    ap.add_argument("--max_dim", type=int, required=True)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    with open(args.json) as f:
        pairs = json.load(f)
    size_cache = {}
    for pair in pairs:
        for k, size_key, scale_key in [(0, "size0_hw", "scale0"),
                                       (1, "size1_hw", "scale1")]:
            name = pair["pair_names"][k]
            if name not in size_cache:
                im = cv2.imread(os.path.join(args.data_root, name))
                if im is None:
                    raise FileNotFoundError(name)
                size_cache[name] = im.shape[:2]
            h, w = size_cache[name]
            s = args.max_dim / max(h, w)
            nh, nw = int(round(h * s)), int(round(w * s))
            pair[size_key] = [nh, nw]
            # kpts at resized resolution * scale -> intrinsic resolution
            pair[scale_key] = [w / nw, h / nh]
    with open(args.out, "w") as f:
        json.dump(pairs, f)
    print(f"{len(pairs)} pairs -> {args.out} (max_dim {args.max_dim})")


if __name__ == "__main__":
    main()
