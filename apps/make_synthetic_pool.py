"""Procedural image-pool generator for offline synthetic training.

The reference trains its synthetic branch on COCO_20k photographs
(reference train.py:29-31, augmentation.py:151-175); this container has no
network egress, so this script synthesizes a stand-in pool: layered
low-frequency gradients + value-noise texture + polygons / ellipses /
lines / checker patches at random scales. The point is corner-rich,
locally-distinctive structure at many scales — enough signal for the
detector/descriptor bootstrap and the train->eval convergence evidence
(VERDICT r1 #5); it does not claim photographic realism.

Usage: python apps/make_synthetic_pool.py --out /tmp/synth_pool \
          [--n 600] [--res 800x608] [--holdout 40]
`--holdout` images are written to <out>_holdout/ for evaluation.
"""
import argparse
import os

import numpy as np


def _value_noise(rng, h, w, octaves=4):
    """Multi-octave smoothed value noise in [0, 1] (cv2-resize upsampling)."""
    import cv2
    out = np.zeros((h, w), np.float32)
    amp, total = 1.0, 0.0
    for o in range(octaves):
        gh, gw = max(2, h >> (octaves - o + 1)), max(2, w >> (octaves - o + 1))
        g = rng.random((gh, gw), dtype=np.float32)
        out += amp * cv2.resize(g, (w, h), interpolation=cv2.INTER_CUBIC)
        total += amp
        amp *= 0.55
    out /= total
    return np.clip(out, 0, 1)


def make_image(rng, h, w):
    import cv2
    # low-frequency color gradient background
    img = np.zeros((h, w, 3), np.float32)
    for c in range(3):
        a, b = rng.random(2)
        gx = np.linspace(a, b, w, dtype=np.float32)[None, :]
        c0, c1 = rng.random(2)
        gy = np.linspace(c0, c1, h, dtype=np.float32)[:, None]
        img[..., c] = 0.5 * gx + 0.5 * gy
    # texture layer
    tex = _value_noise(rng, h, w)
    img = 0.6 * img + 0.4 * tex[..., None] * rng.random(3)[None, None]

    # random opaque shapes (corners!)
    n_shapes = rng.integers(12, 40)
    for _ in range(n_shapes):
        color = rng.random(3).astype(float)
        kind = rng.integers(0, 4)
        x, y = int(rng.integers(0, w)), int(rng.integers(0, h))
        s = int(rng.integers(6, max(8, min(h, w) // 3)))
        if kind == 0:    # polygon
            k = rng.integers(3, 8)
            ang = np.sort(rng.random(k) * 2 * np.pi)
            r = s * (0.4 + 0.6 * rng.random(k))
            pts = np.stack([x + r * np.cos(ang), y + r * np.sin(ang)],
                           -1).astype(np.int32)
            cv2.fillPoly(img, [pts], color)
        elif kind == 1:  # rotated rectangle
            box = cv2.boxPoints(((x, y), (s, s * rng.random() + 3),
                                 float(rng.random() * 180)))
            cv2.fillPoly(img, [box.astype(np.int32)], color)
        elif kind == 2:  # ellipse
            cv2.ellipse(img, (x, y), (s, max(3, int(s * rng.random()))),
                        float(rng.random() * 180), 0, 360, color, -1)
        else:            # checker patch
            cells = int(rng.integers(2, 6))
            cs = max(3, s // cells)
            for i in range(cells):
                for j in range(cells):
                    if (i + j) % 2 == 0:
                        x0, y0 = x + j * cs, y + i * cs
                        cv2.rectangle(img, (x0, y0), (x0 + cs, y0 + cs),
                                      color, -1)
    # thin lines
    for _ in range(int(rng.integers(4, 14))):
        p0 = (int(rng.integers(0, w)), int(rng.integers(0, h)))
        p1 = (int(rng.integers(0, w)), int(rng.integers(0, h)))
        cv2.line(img, p0, p1, rng.random(3).astype(float),
                 int(rng.integers(1, 4)))
    return (np.clip(img, 0, 1) * 255).astype(np.uint8)


def main():
    import cv2
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", type=str, required=True)
    ap.add_argument("--n", type=int, default=600)
    ap.add_argument("--res", type=str, default="800x608")
    ap.add_argument("--holdout", type=int, default=40)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    w, h = map(int, args.res.split("x"))
    rng = np.random.default_rng(args.seed)
    os.makedirs(args.out, exist_ok=True)
    hold_dir = args.out.rstrip("/") + "_holdout"
    os.makedirs(hold_dir, exist_ok=True)
    for i in range(args.n + args.holdout):
        im = make_image(rng, h, w)
        d = args.out if i < args.n else hold_dir
        cv2.imwrite(os.path.join(d, f"img_{i:05d}.png"), im)
    print(f"wrote {args.n} train + {args.holdout} holdout images "
          f"({w}x{h}) to {args.out}[,_holdout]")


if __name__ == "__main__":
    main()
