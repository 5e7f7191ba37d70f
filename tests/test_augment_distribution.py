"""Distributional parity of the on-device augmentation against the
reference's Albumentations train policy (ref dataset.py:136-146).

Albumentations is not installed in this container, so the oracle is an
independent numpy re-derivation of its documented, torchvision-derived
sampling algorithm (RandomResizedCrop: up to 10 rejection-sampled
(area, aspect) draws, center-crop fallback; HorizontalFlip(p);
min_visibility box filter). Comparisons are two-sample KS statistics and
binomial-tolerance rates over thousands of samples — exact RNG streams
necessarily differ (SURVEY.md §7 'distributional parity' bar).
"""

import jax
import jax.numpy as jnp
import numpy as np

from keras_object_detection_tpu.data.augment import (
    augment_batch, sample_crop_window,
)

SCALE = (0.8, 1.0)
RATIO = (0.75, 4.0 / 3.0)
N = 4000


def oracle_crop_windows(rng, n, scale=SCALE, ratio=RATIO, attempts=10):
    """Numpy twin of torchvision RandomResizedCrop.get_params in relative
    units (the algorithm Albumentations implements, ref dataset.py:139)."""
    out = np.zeros((n, 4))
    log_lo, log_hi = np.log(ratio[0]), np.log(ratio[1])
    for i in range(n):
        for _ in range(attempts):
            area = rng.uniform(scale[0], scale[1])
            r = np.exp(rng.uniform(log_lo, log_hi))
            w = np.sqrt(area * r)
            h = np.sqrt(area / r)
            if w <= 1.0 and h <= 1.0:
                x0 = rng.uniform(0, 1) * (1 - w)
                y0 = rng.uniform(0, 1) * (1 - h)
                out[i] = (x0, y0, w, h)
                break
        else:  # fallback: square image, ratio 1 is inside bounds -> identity
            out[i] = (0.0, 0.0, 1.0, 1.0)
    return out


def ks_stat(a, b):
    """Two-sample Kolmogorov-Smirnov statistic (no scipy needed)."""
    a, b = np.sort(a), np.sort(b)
    both = np.concatenate([a, b])
    cdf_a = np.searchsorted(a, both, side="right") / len(a)
    cdf_b = np.searchsorted(b, both, side="right") / len(b)
    return np.max(np.abs(cdf_a - cdf_b))


# 1% critical value for n=m=4000: 1.63*sqrt(2/4000) = 0.0364
KS_BOUND = 0.04


def test_crop_window_distribution_matches_oracle():
    keys = jax.random.split(jax.random.PRNGKey(0), N)
    x0, y0, w, h = jax.vmap(
        lambda k: sample_crop_window(k, SCALE, RATIO))(keys)
    ours = np.stack([np.asarray(x0), np.asarray(y0),
                     np.asarray(w), np.asarray(h)], axis=-1)
    theirs = oracle_crop_windows(np.random.RandomState(1), N)

    # area fraction, aspect ratio, and offset marginals
    assert ks_stat(ours[:, 2] * ours[:, 3],
                   theirs[:, 2] * theirs[:, 3]) < KS_BOUND, "area"
    assert ks_stat(ours[:, 2] / ours[:, 3],
                   theirs[:, 2] / theirs[:, 3]) < KS_BOUND, "aspect"
    assert ks_stat(ours[:, 0], theirs[:, 0]) < KS_BOUND, "x offset"
    assert ks_stat(ours[:, 1], theirs[:, 1]) < KS_BOUND, "y offset"

    # every accepted window fits the unit square (no clipping point mass):
    # a clipped sampler puts ~8% of draws exactly at w == 1.0 for this
    # scale/ratio range; rejection sampling leaves only the rare fallback.
    at_edge = np.mean(ours[:, 2] >= 1.0 - 1e-6)
    assert at_edge < 0.01, f"point mass at w=1: {at_edge:.3f}"
    assert np.all(ours[:, 2] <= 1.0 + 1e-6) and np.all(ours[:, 3] <= 1.0 + 1e-6)


def test_flip_rate():
    """With the crop disabled (scale=ratio=(1,1) -> identity window), the
    output cx is exactly cx or 1-cx, exposing the flip decisions."""
    b = 2000
    images = np.zeros((b, 8, 8, 3), np.uint8)
    boxes = np.zeros((b, 1, 5), np.float32)
    boxes[:, 0] = [0.3, 0.5, 0.1, 0.1, 0.0]
    valid = np.ones((b, 1), bool)
    _, aboxes, _ = augment_batch(
        jnp.asarray(images), jnp.asarray(boxes), jnp.asarray(valid),
        jax.random.PRNGKey(2), hflip_prob=0.5,
        crop_scale=(1.0, 1.0), crop_ratio=(1.0, 1.0))
    cx = np.asarray(aboxes[:, 0, 0])
    flipped = np.isclose(cx, 0.7, atol=1e-5)
    kept = np.isclose(cx, 0.3, atol=1e-5)
    assert np.all(flipped | kept), "crop was not the identity"
    rate = flipped.mean()
    # 4-sigma binomial bound: 0.5 +- 4*sqrt(0.25/2000) = +-0.045
    assert abs(rate - 0.5) < 0.045, f"flip rate {rate:.3f}"


def oracle_survival(rng, box, n, scale, ratio, min_visibility):
    """Numpy twin of the full flip+crop box pipeline's survival decision."""
    cx0, cy0, bw, bh = box
    wins = oracle_crop_windows(rng, n, scale, ratio)
    survived = 0
    for (x0, y0, cw, ch), flip in zip(wins, rng.uniform(size=n) < 0.5):
        cx = 1.0 - cx0 if flip else cx0
        ncx = (cx - x0) / cw
        ncy = (cy0 - y0) / ch
        nw, nh = bw / cw, bh / ch
        xmin, xmax = np.clip(ncx - nw / 2, 0, 1), np.clip(ncx + nw / 2, 0, 1)
        ymin, ymax = np.clip(ncy - nh / 2, 0, 1), np.clip(ncy + nh / 2, 0, 1)
        vis = (xmax - xmin) * (ymax - ymin) / (nw * nh)
        if (vis >= min_visibility and xmax - xmin > 1e-4
                and ymax - ymin > 1e-4):
            survived += 1
    return survived / n


def test_box_survival_rate_matches_oracle():
    """Survival under min_visibility with an aggressive crop range (the
    default (0.8, 1.0) nearly never kills a box; (0.2, 0.6) does)."""
    scale, ratio, minvis = (0.2, 0.6), RATIO, 0.1
    box = (0.15, 0.5, 0.2, 0.3)  # near the left edge: crops often cut it
    n = 3000
    images = np.zeros((n, 8, 8, 3), np.uint8)
    boxes = np.zeros((n, 1, 5), np.float32)
    boxes[:, 0] = [box[0], box[1], box[2], box[3], 0.0]
    valid = np.ones((n, 1), bool)
    _, _, avalid = augment_batch(
        jnp.asarray(images), jnp.asarray(boxes), jnp.asarray(valid),
        jax.random.PRNGKey(3), hflip_prob=0.5,
        crop_scale=scale, crop_ratio=ratio, min_visibility=minvis)
    ours = float(np.asarray(avalid)[:, 0].mean())
    theirs = oracle_survival(np.random.RandomState(4), box, n, scale, ratio,
                             minvis)
    # two independent binomial estimates; 4-sigma tolerance at p~0.5 is
    # ~4*sqrt(2*0.25/3000) = 0.052
    assert 0.02 < theirs < 0.98, f"degenerate oracle survival {theirs}"
    assert abs(ours - theirs) < 0.06, f"{ours:.3f} vs oracle {theirs:.3f}"
