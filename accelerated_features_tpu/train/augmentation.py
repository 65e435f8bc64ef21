"""Synthetic self-supervised augmentation — JAX re-design of the reference
pipeline (modules/dataset/augmentation.py): random homography + thin-plate
-spline warps with exact inverse correspondence lookup, plus photometric
augmentation (jitter, blur, correlated noise, shadows).

Design difference from the reference (kornia/cv2-based, augmentation.py:206-
304): we compose *coordinate maps* instead of materializing a high-res warp
then nearest-downsampling. Each generated view carries its analytic map
`out pixel -> source pixel`, so image warping (one bilinear sample) and
correspondence generation (pure function evaluation) are exactly consistent
— no sub-pixel mismatch between image and labels. Everything is batched,
jittable, and runs on device.

View model (matching the reference's coordinate bookkeeping,
augmentation.py:114-117,177-204):
  out px -> [TPS deform in out coords] -> linear crop/scale to warp-res
  -> H^-1 -> source px.
Correspondences view2 -> view1:  p1 = C^-1(H1(H2^-1(C(tps2(p2))))).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class AugConfig:
    warp_resolution: Tuple[int, int] = (800, 608)   # (W, H), ref train.py:32
    out_resolution: Tuple[int, int] = (800, 608)
    sides_crop: float = 0.1                          # ref train.py:99
    tps_grid: Tuple[int, int] = (8, 6)               # ref augmentation.py:256
    photometric: bool = True

    @property
    def crop_low(self):
        w, h = self.warp_resolution
        return (int(w * self.sides_crop), int(h * self.sides_crop))

    @property
    def crop_high(self):
        w, h = self.warp_resolution
        return (int(w * (1 - self.sides_crop)), int(h * (1 - self.sides_crop)))

    @property
    def dims_t(self):
        """Cropped extent - 1 (reference dims_t, augmentation.py:114)."""
        (lx, ly), (hx, hy) = self.crop_low, self.crop_high
        return (hx - lx - 1, hy - ly - 1)

    @property
    def dims_s(self):
        """out-res -> cropped-res point scale (reference dims_s)."""
        tw, th = self.dims_t
        ow, oh = self.out_resolution
        return (tw / ow, th / oh)


# --------------------------------------------------------------- homography

def random_homography(key: jax.Array, shape_hw: Tuple[int, int],
                      difficulty: float = 0.3) -> jax.Array:
    """Random rot/scale/affine/projective/translation homography with the
    reference's parameter distributions (augmentation.py:54-87)."""
    h, w = shape_hw
    k = jax.random.split(key, 6)
    theta = jnp.radians(jax.random.uniform(k[0], (), minval=-30.0,
                                           maxval=30.0))
    scale = jax.random.uniform(k[1], (2,), minval=0.35, maxval=1.2)
    txn = jax.random.normal(k[2], (2,)) * 120.0 * difficulty
    sxy = jax.random.normal(k[3], (2,)) * 0.6 * difficulty
    p12 = jax.random.normal(k[4], (2,)) * 0.006 * difficulty

    tx, ty = -w / 2.0, -h / 2.0
    c, s = jnp.cos(theta), jnp.sin(theta)
    H_t = jnp.array([[1, 0, tx], [0, 1, ty], [0, 0, 1]], jnp.float32)
    H_r = jnp.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], jnp.float32)
    H_a = jnp.stack([jnp.stack([1.0, sxy[1], 0.0]),
                     jnp.stack([sxy[0], 1.0, 0.0]),
                     jnp.stack([0.0, 0.0, 1.0])])
    H_p = jnp.stack([jnp.stack([1.0, 0.0, 0.0]),
                     jnp.stack([0.0, 1.0, 0.0]),
                     jnp.stack([p12[0], p12[1], 1.0])])
    H_s = jnp.diag(jnp.stack([scale[0], scale[1], 1.0]))
    H_b = jnp.stack([jnp.stack([1.0, 0.0, -tx + txn[0]]),
                     jnp.stack([0.0, 1.0, -ty + txn[1]]),
                     jnp.stack([0.0, 0.0, 1.0])])
    return H_b @ H_s @ H_p @ H_a @ H_r @ H_t


def apply_h(H: jax.Array, pts: jax.Array) -> jax.Array:
    """(…,2) points through a 3x3 homography."""
    ph = jnp.concatenate([pts, jnp.ones_like(pts[..., :1])], -1)
    out = ph @ H.T
    return out[..., :2] / (out[..., 2:3] + 1e-12)


# --------------------------------------------------------------------- TPS

def _tps_kernel(r2: jax.Array) -> jax.Array:
    return r2 * jnp.log(jnp.sqrt(r2) + 1e-9)


def solve_tps(ctrl: jax.Array, target: jax.Array):
    """Solve TPS interpolating ctrl -> target (both (N,2) in normalized
    coords). Returns (weights (N,2), affine (3,2))."""
    n = ctrl.shape[0]
    d2 = jnp.sum((ctrl[:, None] - ctrl[None, :]) ** 2, -1)
    K = _tps_kernel(d2)
    P = jnp.concatenate([jnp.ones((n, 1)), ctrl], -1)
    A = jnp.zeros((n + 3, n + 3))
    A = A.at[:n, :n].set(K).at[:n, n:].set(P).at[n:, :n].set(P.T)
    b = jnp.zeros((n + 3, 2)).at[:n].set(target)
    sol = jnp.linalg.solve(A + 1e-8 * jnp.eye(n + 3), b)
    return sol[:n], sol[n:]


def tps_apply(pts: jax.Array, ctrl: jax.Array, weights: jax.Array,
              affine: jax.Array) -> jax.Array:
    """Evaluate the TPS map at (…,2) points."""
    d2 = jnp.sum((pts[..., None, :] - ctrl) ** 2, -1)
    U = _tps_kernel(d2)
    ph = jnp.concatenate([jnp.ones_like(pts[..., :1]), pts], -1)
    return ph @ affine + U @ weights


def random_tps(key: jax.Array, grid: Tuple[int, int] = (8, 6),
               difficulty: float = 0.3, prob: float = 0.5):
    """Random TPS in [-1,1] normalized coords (reference generateRandomTPS,
    augmentation.py:35-51): grid control points jittered by up to ~half a
    cell, applied with probability `prob`."""
    gy, gx = grid
    k1, k2 = jax.random.split(key)
    ys = jnp.linspace(-1.0, 1.0, gy + 1)
    xs = jnp.linspace(-1.0, 1.0, gx + 1)
    ctrl = jnp.stack(jnp.meshgrid(xs, ys, indexing="xy"), -1).reshape(-1, 2)
    cell = jnp.array([2.0 / gx, 2.0 / gy]) / 2.0
    offs = (jax.random.uniform(k1, ctrl.shape) - 0.5) * cell * \
        jnp.minimum(0.97, 2.0 * difficulty)
    apply_it = jax.random.uniform(k2, ()) < prob
    dst = ctrl + jnp.where(apply_it, 1.0, 0.0) * offs
    weights, affine = solve_tps(dst, ctrl)  # backward map dst -> src
    return ctrl, dst, weights, affine


# ----------------------------------------------------------------- warping

def _bilinear_sample_hw(img: jax.Array, xy: jax.Array) -> jax.Array:
    """img (H,W,C); xy (...,2) pixel coords -> sampled (...,C), zeros OOB."""
    h, w, c = img.shape
    x, y = xy[..., 0], xy[..., 1]
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    tx = (x - x0)[..., None]
    ty = (y - y0)[..., None]

    def tap(xi, yi):
        inb = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        v = img[jnp.clip(yi, 0, h - 1), jnp.clip(xi, 0, w - 1)]
        return v * inb[..., None]

    v00, v01 = tap(x0, y0), tap(x0 + 1, y0)
    v10, v11 = tap(x0, y0 + 1), tap(x0 + 1, y0 + 1)
    return ((v00 * (1 - tx) + v01 * tx) * (1 - ty) +
            (v10 * (1 - tx) + v11 * tx) * ty)


def _out_to_src(pts_out: jax.Array, H: jax.Array, cfg: AugConfig,
                tps: Optional[tuple]) -> jax.Array:
    """Map out-res pixels to source pixels (the view's backward map)."""
    ow, oh = cfg.out_resolution
    if tps is not None:
        ctrl, _, weights, affine = tps
        norm = pts_out / jnp.array([ow, oh]) * 2.0 - 1.0
        norm = tps_apply(norm, ctrl, weights, affine)
        pts_out = (norm + 1.0) / 2.0 * jnp.array([ow, oh])
    sx, sy = cfg.dims_s
    lx, ly = cfg.crop_low
    warp_pts = pts_out * jnp.array([sx, sy]) + jnp.array([lx, ly])
    Hinv = jnp.linalg.inv(H)
    return apply_h(Hinv, warp_pts)


def render_view(img: jax.Array, H: jax.Array, cfg: AugConfig,
                tps: Optional[tuple] = None):
    """Generate the warped out-res view + validity mask from a source image
    (replaces warp_perspective + crop + TPS + nearest-downsample,
    reference augmentation.py:240-271)."""
    ow, oh = cfg.out_resolution
    gx = jnp.arange(ow, dtype=jnp.float32)
    gy = jnp.arange(oh, dtype=jnp.float32)
    grid = jnp.stack(jnp.meshgrid(gx, gy, indexing="xy"), -1)  # (oh, ow, 2)
    src = _out_to_src(grid, H, cfg, tps)
    out = _bilinear_sample_hw(img, src)
    h, w = img.shape[:2]
    mask = ((src[..., 0] >= 0) & (src[..., 0] <= w - 1) &
            (src[..., 1] >= 0) & (src[..., 1] <= h - 1))
    return out, mask


def view2_to_view1(pts2: jax.Array, H1: jax.Array, H2: jax.Array,
                   cfg: AugConfig, tps2: Optional[tuple]) -> jax.Array:
    """Correspondences: out-res points of view2 -> out-res points of view1
    (reference get_correspondences + warp_points,
    augmentation.py:196-204,306-313)."""
    src = _out_to_src(pts2, H2, cfg, tps2)
    warp1 = apply_h(H1, src)
    sx, sy = cfg.dims_s
    lx, ly = cfg.crop_low
    return (warp1 - jnp.array([lx, ly])) / jnp.array([sx, sy])


# ------------------------------------------------------------- photometric

def color_jitter(key, img, strength=0.15):
    """Brightness/contrast/saturation jitter (ColorJitter 0.15 analogue,
    reference augmentation.py:128)."""
    k = jax.random.split(key, 3)
    b = jax.random.uniform(k[0], (), minval=1 - strength, maxval=1 + strength)
    c = jax.random.uniform(k[1], (), minval=1 - strength, maxval=1 + strength)
    s = jax.random.uniform(k[2], (), minval=1 - strength, maxval=1 + strength)
    img = img * b
    mean = jnp.mean(img, axis=(-3, -2, -1), keepdims=True)
    img = (img - mean) * c + mean
    gray = jnp.mean(img, axis=-1, keepdims=True)
    img = (img - gray) * s + gray
    return jnp.clip(img, 0.0, 1.0)


def equalize(img):
    """Per-channel histogram equalization on [0,1] images (torchvision
    `equalize` analogue; reference RandomEqualize p=0.4,
    augmentation.py:129)."""
    def eq_channel(c):
        v = jnp.clip((c * 255.0), 0, 255).astype(jnp.int32)
        hist = jnp.zeros((256,), jnp.float32).at[v.reshape(-1)].add(1.0)
        cdf = jnp.cumsum(hist)
        n = c.size
        # torchvision: lut = (cdf - cdf_min) / (n - cdf_min) scaled to 255
        nonzero = hist > 0
        cdf_min = jnp.min(jnp.where(nonzero, cdf, jnp.inf))
        denom = jnp.maximum(n - cdf_min, 1.0)
        lut = jnp.clip((cdf - cdf_min) / denom, 0.0, 1.0)
        return lut[v]
    return jnp.stack([eq_channel(img[..., i])
                      for i in range(img.shape[-1])], axis=-1)


def gaussian_blur7(img, sigma=2.0):
    """7x7 separable gaussian (reference RandomGaussianBlur,
    augmentation.py:130)."""
    x = jnp.arange(-3, 4, dtype=jnp.float32)
    g = jnp.exp(-x ** 2 / (2 * sigma ** 2))
    g = g / jnp.sum(g)
    img4 = img[None] if img.ndim == 3 else img
    c = img4.shape[-1]
    # separable depthwise convs
    kx = jnp.broadcast_to(g.reshape(1, 7, 1, 1), (1, 7, 1, c))
    ky = jnp.broadcast_to(g.reshape(7, 1, 1, 1), (7, 1, 1, c))
    out = jax.lax.conv_general_dilated(
        img4, kx, (1, 1), [(0, 0), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)
    out = jax.lax.conv_general_dilated(
        out, ky, (1, 1), [(3, 3), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)
    return out[0] if img.ndim == 3 else out


def correlated_noise(key, shape_hwc, amp=10.0 / 255.0):
    """Half-res gaussian noise upsampled bicubic-ish (reference
    augmentation.py:284-288); bilinear upsample is visually equivalent."""
    h, w, c = shape_hwc
    n = jax.random.normal(key, (1, h // 2, w // 2, c)) * amp
    n = jax.image.resize(n, (1, h, w, c), "bilinear", antialias=False)
    return n[0]


def random_shadows(key, shape_hwc, lo=0.25, hi=1.0):
    """Low-frequency multiplicative shadow field (reference
    augmentation.py:291-297)."""
    h, w, c = shape_hwc
    n = jax.random.uniform(key, (1, max(h // 64, 1), max(w // 64, 1), 1)) * 1.3
    n = jnp.clip(n, lo, hi)
    n = jax.image.resize(n, (1, h, w, 1), "bicubic")
    return jnp.clip(n[0], lo, hi)


def photometric_augment(key, img, p_blur=0.3, p_noise=0.5, p_shadow=0.4,
                        p_equalize=0.4):
    k = jax.random.split(key, 7)
    img = color_jitter(k[0], img)
    do_eq = jax.random.uniform(k[6], ()) < p_equalize
    img = jnp.where(do_eq, equalize(img), img)
    do_blur = jax.random.uniform(k[1], ()) < p_blur
    img = jnp.where(do_blur, gaussian_blur7(img), img)
    do_noise = jax.random.uniform(k[2], ()) < p_noise
    img = jnp.where(do_noise,
                    jnp.clip(img + correlated_noise(k[3], img.shape), 0, 1),
                    img)
    do_shadow = jax.random.uniform(k[4], ()) < p_shadow
    img = jnp.where(do_shadow, img * random_shadows(k[5], img.shape), img)
    return jnp.clip(img, 0.0, 1.0)


# ------------------------------------------------------------ full pipeline

def make_pair(key: jax.Array, images: jax.Array, cfg: AugConfig,
              difficulty: float = 0.1, tps_prob: float = 0.7):
    """Generate two warped views of a batch + all transform state
    (the reference's make_batch + AugmentationPipe.forward,
    training/utils.py:7-24). images: (B, H, W, C) in [0,1].

    Returns dict with view1/view2 (B, oh, ow, C), masks, and transforms
    (H1, H2, tps2 tuple) for correspondence generation."""
    b = images.shape[0]
    h, w = images.shape[1:3]
    keys = jax.random.split(key, 5)
    h1_keys = jax.random.split(keys[0], b)
    h2_keys = jax.random.split(keys[1], b)
    tps_keys = jax.random.split(keys[2], b)
    ph1_keys = jax.random.split(keys[3], b)
    ph2_keys = jax.random.split(keys[4], b)

    H1 = jax.vmap(lambda k: random_homography(k, (h, w), difficulty))(h1_keys)
    H2 = jax.vmap(lambda k: random_homography(k, (h, w), difficulty))(h2_keys)
    tps2 = jax.vmap(lambda k: random_tps(k, cfg.tps_grid, difficulty,
                                         tps_prob))(tps_keys)

    v1, m1 = jax.vmap(lambda im, Hm: render_view(im, Hm, cfg))(images, H1)
    v2, m2 = jax.vmap(
        lambda im, Hm, c, d, wg, a: render_view(im, Hm, cfg, (c, d, wg, a)))(
            images, H2, *tps2)

    # fill invalid pixels with texture from the rolled batch
    # (reference augmentation.py:274-277)
    v1 = jnp.where(m1[..., None], v1, jnp.roll(images_to_out(images, cfg),
                                               1, axis=0))
    v2 = jnp.where(m2[..., None], v2, jnp.roll(images_to_out(images, cfg),
                                               2, axis=0))

    if cfg.photometric:
        v1 = jax.vmap(photometric_augment)(ph1_keys, v1)
        v2 = jax.vmap(photometric_augment)(ph2_keys, v2)

    return {"view1": v1, "view2": v2, "mask1": m1, "mask2": m2,
            "H1": H1, "H2": H2, "tps2": tps2}


def images_to_out(images: jax.Array, cfg: AugConfig) -> jax.Array:
    ow, oh = cfg.out_resolution
    if images.shape[1:3] == (oh, ow):
        return images
    return jax.image.resize(images,
                            (images.shape[0], oh, ow, images.shape[3]),
                            "bilinear", antialias=False)


def pair_correspondences(pair: Dict[str, jax.Array], cfg: AugConfig,
                         grid_scale: int = 8, pad: int = 2):
    """Dense /8-grid GT correspondences view2 -> view1 with validity mask
    (the reference get_corresponding_pts, training/utils.py:53-133).

    Returns corrs (B, n, 4) (x1, y1, x2, y2) in /8 coords + mask (B, n)."""
    ow, oh = cfg.out_resolution
    gw, gh = ow // grid_scale, oh // grid_scale
    gx = jnp.arange(gw, dtype=jnp.float32)
    gy = jnp.arange(gh, dtype=jnp.float32)
    mesh = jnp.stack(jnp.meshgrid(gx, gy, indexing="xy"), -1).reshape(-1, 2)
    tgt_out = mesh * grid_scale  # out-res coords

    def per_item(H1, H2, ctrl, dst, wgt, aff, m1, m2):
        src_out = view2_to_view1(tgt_out, H1, H2, cfg, (ctrl, dst, wgt, aff))
        inb = ((src_out[:, 0] >= 0) & (src_out[:, 0] < ow) &
               (src_out[:, 1] >= 0) & (src_out[:, 1] < oh))
        xi = jnp.clip(src_out[:, 0].astype(jnp.int32), 0, ow - 1)
        yi = jnp.clip(src_out[:, 1].astype(jnp.int32), 0, oh - 1)
        ti = jnp.clip(tgt_out[:, 0].astype(jnp.int32), 0, ow - 1)
        tj = jnp.clip(tgt_out[:, 1].astype(jnp.int32), 0, oh - 1)
        vmask = inb & m1[yi, xi] & m2[tj, ti]

        src_g = src_out / grid_scale
        tgt_g = tgt_out / grid_scale
        good = (vmask &
                (src_g[:, 0] >= pad) & (src_g[:, 0] < gw - pad) &
                (src_g[:, 1] >= pad) & (src_g[:, 1] < gh - pad) &
                (tgt_g[:, 0] >= pad) & (tgt_g[:, 0] < gw - pad) &
                (tgt_g[:, 1] >= pad) & (tgt_g[:, 1] < gh - pad))

        # per-source-cell dedup (reference LUT, training/utils.py:120-128)
        cell = (jnp.clip(src_g[:, 1].astype(jnp.int32), 0, gh - 1) * gw +
                jnp.clip(src_g[:, 0].astype(jnp.int32), 0, gw - 1))
        idxs = jnp.arange(cell.shape[0], dtype=jnp.int32)
        lut = jnp.full((gh * gw,), -1, jnp.int32)
        lut = lut.at[jnp.where(good, cell, gh * gw)].max(
            jnp.where(good, idxs, -1), mode="drop")
        good = good & (lut[cell] == idxs)
        corr = jnp.concatenate([src_g, tgt_g], -1)
        return jnp.where(good[:, None], corr, 0.0), good

    return jax.vmap(per_item)(pair["H1"], pair["H2"], *pair["tps2"],
                              pair["mask1"], pair["mask2"])


def pair_correspondences_full(pair: Dict[str, jax.Array], cfg: AugConfig,
                              key: jax.Array, grid_scale: int = 8):
    """FULL-resolution GT correspondences from a sub-pixel-jittered grid —
    input for the teacher-free keypoint_position_loss (reference
    losses.py:111-168).

    That loss hashes view-1 positions at arbitrary integer pixels and reads
    8x8 in-cell offset labels from view-2 positions, so BOTH sides must
    carry sub-cell offsets: grid-aligned points on the hash side are only
    reachable by bin-0 argmaxes, and on the label side make every label
    bin 0. A uniform [0, grid_scale) jitter per view-2 grid point fixes
    both. No per-cell dedup (the loss's write-last-wins hashmap is the
    dedup, as in the reference).

    Returns corrs_full (B, n, 4) (x1, y1, x2, y2) full-res + mask (B, n).
    """
    ow, oh = cfg.out_resolution
    gw, gh = ow // grid_scale, oh // grid_scale
    gx = jnp.arange(gw, dtype=jnp.float32)
    gy = jnp.arange(gh, dtype=jnp.float32)
    mesh = jnp.stack(jnp.meshgrid(gx, gy, indexing="xy"), -1).reshape(-1, 2)
    b = pair["H1"].shape[0]
    jitter = jax.random.uniform(key, (b, mesh.shape[0], 2),
                                minval=0.0, maxval=float(grid_scale))
    tgt = mesh[None] * grid_scale + jitter                 # (B, n, 2) float

    def per_item(tgt_out, H1, H2, ctrl, dst, wgt, aff, m1, m2):
        src_out = view2_to_view1(tgt_out, H1, H2, cfg, (ctrl, dst, wgt, aff))
        inb = ((src_out[:, 0] >= 0) & (src_out[:, 0] < ow) &
               (src_out[:, 1] >= 0) & (src_out[:, 1] < oh) &
               (tgt_out[:, 0] < ow) & (tgt_out[:, 1] < oh))
        xi = jnp.clip(src_out[:, 0].astype(jnp.int32), 0, ow - 1)
        yi = jnp.clip(src_out[:, 1].astype(jnp.int32), 0, oh - 1)
        ti = jnp.clip(tgt_out[:, 0].astype(jnp.int32), 0, ow - 1)
        tj = jnp.clip(tgt_out[:, 1].astype(jnp.int32), 0, oh - 1)
        good = inb & m1[yi, xi] & m2[tj, ti]
        corr = jnp.concatenate([src_out, tgt_out], -1)
        return jnp.where(good[:, None], corr, 0.0), good

    return jax.vmap(per_item)(tgt, pair["H1"], pair["H2"], *pair["tps2"],
                              pair["mask1"], pair["mask2"])
