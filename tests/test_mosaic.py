"""Mosaic augmentation (beyond parity — the reference has no mosaic;
YOLOv4 arXiv:2004.10934 §3.1): quadrant geometry, box affine remap,
sub-pixel filtering, pass-through arm, and train-step integration."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from keras_object_detection_tpu.config import (
    Config, DataConfig, GridConfig, ModelConfig, TrainConfig,
)
from keras_object_detection_tpu.data.augment import mosaic_batch
from keras_object_detection_tpu.train.loop import (
    create_train_state, make_train_step,
)


def _solid_batch(n=4, size=32):
    """n images of distinct solid colors + one centered box each."""
    colors = (np.arange(1, n + 1) * (255 // (n + 1))).astype(np.uint8)
    imgs = np.zeros((n, size, size, 3), np.uint8)
    for i, c in enumerate(colors):
        imgs[i] = c
    boxes = np.zeros((n, 2, 5), np.float32)
    boxes[:, 0] = [0.5, 0.5, 0.5, 0.5, 0.0]
    boxes[:, 0, 4] = np.arange(n)  # class = source index
    valid = np.zeros((n, 2), bool)
    valid[:, 0] = True
    return jnp.asarray(imgs), jnp.asarray(boxes), jnp.asarray(valid)


def test_mosaic_quadrants_and_boxes():
    """Pin the center at exactly (0.5, 0.5) via a degenerate center_range:
    quadrants are exact halves, so the geometry is fully deterministic.
    Source 0 of every mosaic is the image itself (TL quadrant); each
    surviving box sits at its quadrant center with half the size, and the
    pixel under each box center carries its source's solid color."""
    imgs, boxes, valid = _solid_batch()
    out_i, out_b, out_v = mosaic_batch(imgs, boxes, valid,
                                       jax.random.PRNGKey(0), prob=1.0,
                                       center_range=(0.5, 0.5))
    out_i, out_b, out_v = map(np.asarray, (out_i, out_b, out_v))
    assert out_i.shape == (4, 32, 32, 3)
    assert out_b.shape == (4, 8, 5) and out_v.shape == (4, 8)

    palette = set(int(c) for c in np.unique(np.asarray(imgs)[:, 0, 0, 0]))
    centers = {(0.25, 0.25), (0.75, 0.25), (0.25, 0.75), (0.75, 0.75)}
    for b in range(4):
        img = out_i[b]
        # quadrant-center probes are solid source colors; TL is image b
        probes = [img[8, 8, 0], img[8, 24, 0], img[24, 8, 0], img[24, 24, 0]]
        for c in probes:
            assert int(c) in palette, (c, palette)
        assert int(probes[0]) == int(np.asarray(imgs)[b, 0, 0, 0])

        # all 4 source boxes survive: center at a quadrant center, size
        # exactly halved (source w=h=0.5 -> 0.25), class = source index,
        # and the pixel under the center matches the class's color
        kept = out_b[b][out_v[b]]
        assert len(kept) == 4
        for cx, cy, w, h, cls in kept:
            assert (round(float(cx), 6), round(float(cy), 6)) in centers
            np.testing.assert_allclose([w, h], [0.25, 0.25], atol=1e-6)
            px = img[int(cy * 32), int(cx * 32), 0]
            expected = np.asarray(imgs)[int(cls), 0, 0, 0]
            assert abs(int(px) - int(expected)) <= 1, (px, expected, cls)


def test_mosaic_center_within_range():
    imgs, boxes, valid = _solid_batch(n=8, size=16)
    lo, hi = 0.4, 0.6
    out_i, _, _ = mosaic_batch(imgs, boxes, valid, jax.random.PRNGKey(1),
                               prob=1.0, center_range=(lo, hi))
    out_i = np.asarray(out_i)
    # each row/col boundary (color change) must fall inside [lo, hi]
    for b in range(8):
        top = out_i[b, 0, :, 0]
        change = np.nonzero(np.diff(top.astype(int)) != 0)[0]
        if len(change):  # same-source draws may hide the boundary
            assert lo * 16 - 1 <= change[0] + 1 <= hi * 16 + 1


def test_mosaic_prob_zero_is_passthrough():
    imgs, boxes, valid = _solid_batch()
    out_i, out_b, out_v = mosaic_batch(imgs, boxes, valid,
                                       jax.random.PRNGKey(2), prob=0.0)
    np.testing.assert_array_equal(np.asarray(out_i), np.asarray(imgs))
    np.testing.assert_array_equal(np.asarray(out_b[:, :2]), np.asarray(boxes))
    np.testing.assert_array_equal(np.asarray(out_v[:, :2]), np.asarray(valid))
    assert not np.asarray(out_v[:, 2:]).any()
    assert not np.asarray(out_b[:, 2:]).any()


def test_mosaic_filters_subpixel_boxes():
    imgs, boxes, valid = _solid_batch(size=16)
    tiny = boxes.at[:, 0, 2].set(0.02).at[:, 0, 3].set(0.02)  # 0.32 px after
    _, out_b, out_v = mosaic_batch(imgs, tiny, valid, jax.random.PRNGKey(3),
                                   prob=1.0)
    # 0.02 * qw * 16 px < 1 px for any center in (0.25, 0.75) => all dropped
    assert not np.asarray(out_v).any()


def test_train_step_with_mosaic():
    cfg = Config(
        grid=GridConfig(grid=7, num_boxes=2, num_classes=3),
        model=ModelConfig(backbone="darknet_micro", head="conv",
                          image_size=56, compute_dtype="float32"),
        data=DataConfig(batch_size=4, max_boxes_per_image=8,
                        mosaic_prob=0.5),
        train=TrainConfig(optimizer="adam"),
    )
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(cfg))
    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.randint(0, 256, (4, 56, 56, 3), dtype=np.uint8))
    boxes = np.zeros((4, 8, 5), np.float32)
    boxes[:, 0] = [0.5, 0.5, 0.4, 0.3, 1.0]
    valid = np.zeros((4, 8), bool)
    valid[:, 0] = True
    new_state, metrics = step(state, imgs, jnp.asarray(boxes),
                              jnp.asarray(valid), jax.random.PRNGKey(5))
    assert np.isfinite(float(metrics["total"]))
    assert int(new_state.step) == 1
