"""On-device, jit-compiled augmentation (parity target: the reference's
Albumentations train policy, ref dataset.py:136-146 — HorizontalFlip(0.5),
ColorJitter(defaults 0.2), RandomResizedCrop(scale 0.8-1), Normalize(0,1),
bbox-aware with min_visibility=0.1).

The reference augments per-image in Python on the host; here the whole batch
is one fused XLA program over ``jax.random`` streams (vmapped per image), so
augmentation rides the TPU's VPU and overlaps with the host reading the next
batch. Exact RNG streams necessarily differ from Albumentations; parity is
distributional for the train path, while the deterministic eval path
(host resize + /255) is bit-comparable (SURVEY.md §7).

All shapes are static: boxes stay padded ``(N, 5)`` with a validity mask that
the visibility filter updates in place of Albumentations' list filtering.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


def _rgb_to_hsv(rgb: jnp.ndarray) -> jnp.ndarray:
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    maxc = jnp.max(rgb, axis=-1)
    minc = jnp.min(rgb, axis=-1)
    v = maxc
    rng = maxc - minc
    s = jnp.where(maxc > 0, rng / jnp.maximum(maxc, 1e-12), 0.0)
    safe_rng = jnp.maximum(rng, 1e-12)
    rc = (maxc - r) / safe_rng
    gc = (maxc - g) / safe_rng
    bc = (maxc - b) / safe_rng
    h = jnp.where(
        maxc == r, bc - gc, jnp.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc)
    )
    h = jnp.where(rng > 0, (h / 6.0) % 1.0, 0.0)
    return jnp.stack([h, s, v], axis=-1)


def _hsv_to_rgb(hsv: jnp.ndarray) -> jnp.ndarray:
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


def _color_jitter_batch(imgs: jnp.ndarray, key: jax.Array,
                        strengths: Tuple[float, float, float, float]
                        ) -> jnp.ndarray:
    """Brightness/contrast/saturation/hue jitter with Albumentations-default
    strengths (0.2 each) for a ``(B, H, W, 3)`` batch. Factors are sampled
    PER IMAGE; the application order is random PER BATCH. (Albumentations
    shuffles per call, i.e. per image — but a per-image order under ``vmap``
    turns ``lax.switch`` into evaluate-all-branches-and-select, 16 transform
    evaluations per image instead of 4. A shared order per step keeps each
    image's marginal distribution identical — every image still sees a
    uniformly random order across steps — at 1/4 the cost; the order is
    merely correlated within a batch.)"""
    kb, kc, ks, kh, kperm = jax.random.split(key, 5)
    sb, sc, ss, sh = strengths
    n = imgs.shape[0]

    fb = jax.random.uniform(kb, (n, 1, 1, 1), minval=1.0 - sb, maxval=1.0 + sb)
    fc = jax.random.uniform(kc, (n, 1, 1, 1), minval=1.0 - sc, maxval=1.0 + sc)
    fs = jax.random.uniform(ks, (n, 1, 1, 1), minval=1.0 - ss, maxval=1.0 + ss)
    fh = jax.random.uniform(kh, (n, 1, 1), minval=-sh, maxval=sh)

    def _luma(im):
        return 0.299 * im[..., 0] + 0.587 * im[..., 1] + 0.114 * im[..., 2]

    def brightness(im):
        return jnp.clip(im * fb, 0.0, 1.0)

    def contrast(im):
        gray_mean = jnp.mean(_luma(im), axis=(1, 2), keepdims=True)[..., None]
        return jnp.clip((im - gray_mean) * fc + gray_mean, 0.0, 1.0)

    def saturation(im):
        gray = _luma(im)[..., None]
        return jnp.clip(gray + (im - gray) * fs, 0.0, 1.0)

    def hue(im):
        hsv = _rgb_to_hsv(im)
        hsv = hsv.at[..., 0].set((hsv[..., 0] + fh) % 1.0)
        return jnp.clip(_hsv_to_rgb(hsv), 0.0, 1.0)

    perm = jax.random.permutation(kperm, 4)
    for i in range(4):
        imgs = jax.lax.switch(perm[i],
                              (brightness, contrast, saturation, hue), imgs)
    return imgs


def sample_crop_window(
    key: jax.Array,
    scale: Tuple[float, float],
    ratio: Tuple[float, float],
    attempts: int = 10,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """RandomResizedCrop window sampler, matching Albumentations'
    (torchvision-derived) algorithm in relative units (ref dataset.py:139):

    Up to ``attempts`` draws of (area_fraction ~ U(scale),
    aspect ~ exp(U(log ratio))); a draw is ACCEPTED iff the implied
    ``w = sqrt(area*aspect)`` and ``h = sqrt(area/aspect)`` both fit in the
    unit square — oversized draws are rejected and resampled, NOT clipped
    (clipping would put a point mass at w=1 and distort the accepted aspect
    distribution). If all attempts fail, fall back to the deterministic
    center crop with the aspect clamped to the ratio bounds (for a square
    image with 1 inside [ratio_min, ratio_max] that is the identity crop).
    The offset is continuous-uniform over the feasible range; the reference
    rounds to integer pixels, an O(1/W) discretization documented as the one
    intentional difference.

    Returns scalar ``(x0, y0, w, h)`` in [0, 1] units.
    """
    ka, kr, kx, ky = jax.random.split(key, 4)
    area = jax.random.uniform(ka, (attempts,), minval=scale[0], maxval=scale[1])
    log_r = jax.random.uniform(
        kr, (attempts,), minval=jnp.log(ratio[0]), maxval=jnp.log(ratio[1]))
    r = jnp.exp(log_r)
    w = jnp.sqrt(area * r)
    h = jnp.sqrt(area / r)
    ok = (w <= 1.0) & (h <= 1.0)
    # index of the first accepted attempt (argmax returns the first True)
    first = jnp.argmax(ok)
    any_ok = jnp.any(ok)

    # torchvision fallback: clamp the (square) image ratio 1.0 into bounds
    in_ratio = 1.0
    fb_w = jnp.where(in_ratio < ratio[0], 1.0,
                     jnp.where(in_ratio > ratio[1], ratio[1], 1.0))
    fb_h = jnp.where(in_ratio < ratio[0], 1.0 / ratio[0],
                     jnp.where(in_ratio > ratio[1], 1.0, 1.0))

    crop_w = jnp.where(any_ok, w[first], fb_w)
    crop_h = jnp.where(any_ok, h[first], fb_h)
    x0 = jax.random.uniform(kx, ()) * (1.0 - crop_w)
    y0 = jax.random.uniform(ky, ()) * (1.0 - crop_h)
    return x0, y0, crop_w, crop_h


def _random_resized_crop(
    img: jnp.ndarray,
    boxes: jnp.ndarray,
    valid: jnp.ndarray,
    key: jax.Array,
    scale: Tuple[float, float],
    ratio: Tuple[float, float],
    min_visibility: float,
    out_size: int = None,
):
    """Sample a crop window (relative units), resample the image to
    ``out_size`` (default: its own size) via ``scale_and_translate``, and
    remap/clip/filter the boxes.

    ``out_size < img.shape[0]`` is the crop-fidelity path: the host decodes
    the train image ABOVE the model resolution
    (``DataConfig.train_decode_size``), so the crop samples at or above
    target resolution — like Albumentations cropping the original image then
    resizing once (ref dataset.py:139) — instead of re-upsampling an
    already-downsampled image."""
    in_size = img.shape[0]
    out_size = in_size if out_size is None else out_size
    x0, y0, crop_w, crop_h = sample_crop_window(key, scale, ratio)

    # out[o] samples in[(o + 0.5 - t)/s - 0.5]; choose s, t so the crop window
    # [y0, y0+crop_h] (relative units of the INPUT) maps onto the full
    # out_size output.
    sy = out_size / (crop_h * in_size)
    sx = out_size / (crop_w * in_size)
    ty = -y0 * in_size * sy
    tx = -x0 * in_size * sx
    img = jax.image.scale_and_translate(
        img,
        shape=(out_size, out_size) + img.shape[2:],
        spatial_dims=(0, 1),
        scale=jnp.stack([sy, sx]),
        translation=jnp.stack([ty, tx]),
        method="linear",
    )
    img = jnp.clip(img, 0.0, 1.0)

    # Remap boxes into crop coordinates.
    cx = (boxes[:, 0] - x0) / crop_w
    cy = (boxes[:, 1] - y0) / crop_h
    w = boxes[:, 2] / crop_w
    h = boxes[:, 3] / crop_h
    xmin = jnp.clip(cx - w / 2, 0.0, 1.0)
    xmax = jnp.clip(cx + w / 2, 0.0, 1.0)
    ymin = jnp.clip(cy - h / 2, 0.0, 1.0)
    ymax = jnp.clip(cy + h / 2, 0.0, 1.0)
    new_w = xmax - xmin
    new_h = ymax - ymin
    # Visibility = surviving area fraction (Albumentations min_visibility
    # filter, ref dataset.py:141).
    vis = (new_w * new_h) / jnp.maximum(w * h, 1e-12)
    keep = valid & (vis >= min_visibility) & (new_w > 1e-4) & (new_h > 1e-4)
    new_boxes = jnp.stack(
        [(xmin + xmax) / 2, (ymin + ymax) / 2, new_w, new_h, boxes[:, 4]], axis=-1)
    new_boxes = jnp.where(keep[:, None], new_boxes, 0.0)
    return img, new_boxes, keep


def _flip_crop_one(
    img: jnp.ndarray,
    boxes: jnp.ndarray,
    valid: jnp.ndarray,
    key: jax.Array,
    hflip_prob: float,
    crop_scale: Tuple[float, float],
    crop_ratio: Tuple[float, float],
    min_visibility: float,
    out_size: int = None,
):
    """Per-image spatial augmentation (the color jitter runs batch-level in
    ``augment_batch`` — it is pixelwise/permutation-invariant, so it commutes
    exactly with the horizontal flip and the reference's flip->jitter->crop
    order is preserved)."""
    kf, kcrop = jax.random.split(key, 2)

    flip = jax.random.uniform(kf, ()) < hflip_prob
    img = jnp.where(flip, img[:, ::-1, :], img)
    boxes = jnp.where(
        flip, boxes.at[:, 0].set(1.0 - boxes[:, 0]), boxes)

    img, boxes, valid = _random_resized_crop(
        img, boxes, valid, kcrop, crop_scale, crop_ratio, min_visibility,
        out_size)
    return img, boxes, valid


@partial(
    jax.jit,
    static_argnames=(
        "hflip_prob", "color_strengths", "crop_scale", "crop_ratio",
        "min_visibility", "out_size",
    ),
)
def augment_batch(
    images_u8: jnp.ndarray,
    boxes: jnp.ndarray,
    valid: jnp.ndarray,
    key: jax.Array,
    hflip_prob: float = 0.5,
    color_strengths: Tuple[float, float, float, float] = (0.2, 0.2, 0.2, 0.2),
    crop_scale: Tuple[float, float] = (0.8, 1.0),
    crop_ratio: Tuple[float, float] = (0.75, 4.0 / 3.0),
    min_visibility: float = 0.1,
    out_size: int = None,
):
    """Train-time augmentation for a batch: ``(B, H, W, 3) u8`` + padded boxes
    -> normalized float images + remapped boxes + updated validity.

    ``out_size``: model input resolution of the emitted batch (default: the
    input resolution). Feeding images decoded ABOVE out_size
    (``DataConfig.train_decode_size``) makes the random crop sample at or
    above target resolution — the Albumentations crop-the-original fidelity
    (ref dataset.py:139) — with identical window/box geometry (all the crop
    math is in relative units)."""
    kjit, kspatial = jax.random.split(key)
    imgs = images_u8.astype(jnp.float32) / 255.0  # Normalize, ref dataset.py:140
    if any(s > 0 for s in color_strengths):
        imgs = _color_jitter_batch(imgs, kjit, color_strengths)
    keys = jax.random.split(kspatial, images_u8.shape[0])
    return jax.vmap(
        lambda i, b, v, k: _flip_crop_one(
            i, b, v, k, hflip_prob, crop_scale, crop_ratio, min_visibility,
            out_size)
    )(imgs, boxes, valid, keys)


def _mosaic_one(imgs4, boxes4, valid4, key,
                center_range: Tuple[float, float], out_size: int):
    """Compose ONE mosaic from 4 source images (4, H, W, 3 float in [0,1]).

    YOLOv4 mosaic (Bochkovskiy et al. 2020, arXiv:2004.10934), static-shape
    formulation: a random center (cx, cy) splits the unit square into 4
    quadrants; source image q is RESIZED into quadrant q (TL, TR, BL, BR) by
    one ``scale_and_translate`` each, and the output is the quadrant-masked
    sum — no dynamic slicing, no 2x canvas. Boxes map by the same per-
    quadrant affine (no clipping needed: each source fits its quadrant
    whole); sub-pixel boxes are invalidated.

    Returns ``(out_size, out_size, 3)`` image, ``(4*N, 5)`` boxes, ``(4*N,)``
    validity."""
    kc = jax.random.split(key, 2)
    lo, hi = center_range
    cx = jax.random.uniform(kc[0], (), minval=lo, maxval=hi)
    cy = jax.random.uniform(kc[1], (), minval=lo, maxval=hi)

    in_size = imgs4.shape[1]
    # quadrant q: x origin/width, y origin/height (relative units)
    qx0 = jnp.stack([0.0 * cx, cx, 0.0 * cx, cx])
    qy0 = jnp.stack([0.0 * cy, 0.0 * cy, cy, cy])
    qw = jnp.stack([cx, 1.0 - cx, cx, 1.0 - cx])
    qh = jnp.stack([cy, cy, 1.0 - cy, 1.0 - cy])

    def paste(img, x0, y0, w, h):
        # map the full source onto [y0, y0+h] x [x0, x0+w] of the output
        sy = h * out_size / in_size
        sx = w * out_size / in_size
        return jax.image.scale_and_translate(
            img, shape=(out_size, out_size) + img.shape[2:],
            spatial_dims=(0, 1), scale=jnp.stack([sy, sx]),
            translation=jnp.stack([y0 * out_size, x0 * out_size]),
            method="linear")

    pasted = jax.vmap(paste)(imgs4, qx0, qy0, qw, qh)  # (4, S, S, 3)
    # quadrant ownership mask per output pixel (right/bottom quadrants own
    # the boundary pixel, matching scale_and_translate's zero-fill outside)
    ys = (jnp.arange(out_size) + 0.5) / out_size
    xs = (jnp.arange(out_size) + 0.5) / out_size
    right = xs[None, :] >= cx
    bottom = ys[:, None] >= cy
    owner = (right.astype(jnp.int32)
             + 2 * bottom.astype(jnp.int32))  # (S, S) in {0,1,2,3}
    mask = jax.nn.one_hot(owner, 4, axis=0, dtype=pasted.dtype)  # (4, S, S)
    img = jnp.einsum("qhwc,qhw->hwc", pasted, mask)
    img = jnp.clip(img, 0.0, 1.0)

    # boxes: source q's (cx, cy, w, h) -> affine into quadrant q
    bx = boxes4[..., 0] * qw[:, None] + qx0[:, None]
    by = boxes4[..., 1] * qh[:, None] + qy0[:, None]
    bw = boxes4[..., 2] * qw[:, None]
    bh = boxes4[..., 3] * qh[:, None]
    keep = valid4 & (bw > 1.0 / out_size) & (bh > 1.0 / out_size)
    out_boxes = jnp.stack([bx, by, bw, bh, boxes4[..., 4]], axis=-1)
    out_boxes = jnp.where(keep[..., None], out_boxes, 0.0)
    return img, out_boxes.reshape(-1, 5), keep.reshape(-1)


@partial(jax.jit, static_argnames=("prob", "center_range", "out_size"))
def mosaic_batch(
    images_u8: jnp.ndarray,
    boxes: jnp.ndarray,
    valid: jnp.ndarray,
    key: jax.Array,
    prob: float = 1.0,
    center_range: Tuple[float, float] = (0.25, 0.75),
    out_size: int = None,
):
    """Batch mosaic augmentation (beyond parity — the reference has no
    mosaic; YOLOv4 arXiv:2004.10934 §3.1). For each output image b the 4
    sources are b itself plus 3 draws from independent batch permutations
    (every image appears in ~4 mosaics per step). Applied per image with
    probability ``prob``; non-mosaic images pass through (padded to the 4N
    box slots). Emits uint8 so the standard ``augment_batch``
    (flip/jitter/crop) composes downstream unchanged.

    Returns ``(B, out, out, 3) u8``, ``(B, 4N, 5)`` boxes, ``(B, 4N)``
    validity."""
    b, in_size = images_u8.shape[0], images_u8.shape[1]
    out_size = in_size if out_size is None else out_size
    kp, ks, kc = jax.random.split(key, 3)
    perms = jnp.stack(
        [jnp.arange(b)]
        + [jax.random.permutation(k, b) for k in jax.random.split(ks, 3)],
        axis=1)  # (B, 4) source indices per output image
    imgs = images_u8.astype(jnp.float32) / 255.0
    keys = jax.random.split(kc, b)
    mimg, mboxes, mvalid = jax.vmap(
        lambda idx, k: _mosaic_one(imgs[idx], boxes[idx], valid[idx], k,
                                   center_range, out_size)
    )(perms, keys)

    # pass-through arm, padded to the mosaic's 4N box slots
    n = boxes.shape[1]
    pimg = imgs
    if out_size != in_size:
        pimg = jax.image.resize(
            imgs, (b, out_size, out_size, imgs.shape[3]), method="linear")
    pboxes = jnp.pad(boxes, ((0, 0), (0, 3 * n), (0, 0)))
    pvalid = jnp.pad(valid, ((0, 0), (0, 3 * n)))

    apply = jax.random.uniform(kp, (b,)) < prob
    img = jnp.where(apply[:, None, None, None], mimg, pimg)
    out_boxes = jnp.where(apply[:, None, None], mboxes, pboxes)
    out_valid = jnp.where(apply[:, None], mvalid, pvalid)
    img_u8 = jnp.round(jnp.clip(img, 0.0, 1.0) * 255.0).astype(jnp.uint8)
    return img_u8, out_boxes, out_valid


@partial(jax.jit, static_argnames=("prob", "alpha"))
def mixup_batch(
    images_u8: jnp.ndarray,
    boxes: jnp.ndarray,
    valid: jnp.ndarray,
    key: jax.Array,
    prob: float = 1.0,
    alpha: float = 1.5,
):
    """Detection mixup (beyond parity — the reference has no mixup; the
    detection variant of mixup keeps the box UNION rather than soft labels,
    as in Zhang et al. 2019 arXiv:1902.04103 "Bag of Freebies" §3.1).

    Each image blends with a permutation partner: ``img = λ·x + (1-λ)·x̂``
    with ``λ ~ Beta(alpha, alpha)`` per image, and BOTH images' boxes are
    kept (the YOLO loss has no per-box weight, so the union is the exact
    formulation). Applied per image with probability ``prob``; pass-through
    images keep their boxes in the first N slots with the partner half
    invalid. Returns ``(B,H,W,3) u8``, ``(B, 2N, 5)`` boxes, ``(B, 2N)``.
    """
    b, n = boxes.shape[0], boxes.shape[1]
    kp, kperm, klam = jax.random.split(key, 3)
    perm = jax.random.permutation(kperm, b)
    lam = jax.random.beta(klam, alpha, alpha, (b,))
    # symmetric blend: fold λ into [0.5, 1] so the "primary" image dominates
    # (keeps the pass-through arm continuous as prob -> 0)
    lam = jnp.maximum(lam, 1.0 - lam)
    apply = jax.random.uniform(kp, (b,)) < prob

    x = images_u8.astype(jnp.float32)
    mixed = lam[:, None, None, None] * x + (1 - lam)[:, None, None, None] * x[perm]
    img = jnp.where(apply[:, None, None, None], mixed, x)
    img_u8 = jnp.round(jnp.clip(img, 0.0, 255.0)).astype(jnp.uint8)

    out_boxes = jnp.concatenate([boxes, boxes[perm]], axis=1)
    out_valid = jnp.concatenate(
        [valid, valid[perm] & apply[:, None]], axis=1)
    out_boxes = jnp.where(out_valid[..., None], out_boxes, 0.0)
    return img_u8, out_boxes, out_valid


@jax.jit
def preprocess_eval_batch(images_u8: jnp.ndarray) -> jnp.ndarray:
    """Eval path: just Normalize(0,1) — the host already resized, so this is
    bit-comparable to the reference's ``A.Resize + A.Normalize(0,1)``
    (ref dataset.py:143-146)."""
    return images_u8.astype(jnp.float32) / 255.0
