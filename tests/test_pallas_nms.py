"""Pallas NMS kernel parity vs the XLA implementation (which is itself
golden-tested against the executed reference). Runs in interpreter mode on
CPU; the same kernel compiles on TPU."""

import numpy as np
import jax.numpy as jnp

from keras_object_detection_tpu.ops.nms import batched_non_max_suppression
from keras_object_detection_tpu.ops.pallas_nms import (
    pallas_batched_non_max_suppression,
)


def _random_batch(seed, b=4, n=49, num_classes=3):
    rng = np.random.RandomState(seed)
    base = rng.uniform(0.1, 0.9, size=(8, 2))
    cls = rng.randint(0, num_classes, size=(b, n)).astype(np.float32)
    conf = rng.uniform(0, 1, size=(b, n)).astype(np.float32)
    centers = base[rng.randint(0, 8, size=(b, n))] + rng.normal(
        0, 0.03, size=(b, n, 2))
    wh = rng.uniform(0.05, 0.35, size=(b, n, 2))
    return np.concatenate(
        [cls[..., None], conf[..., None], centers, wh], axis=-1
    ).astype(np.float32)


def test_pallas_nms_matches_xla():
    for seed in range(3):
        boxes = jnp.asarray(_random_batch(seed))
        pb, pv = pallas_batched_non_max_suppression(boxes, interpret=True)
        xb, xv = batched_non_max_suppression(boxes)
        np.testing.assert_array_equal(np.asarray(pv), np.asarray(xv))
        # compare only valid rows: the padded tail ordering after compaction
        # is unspecified in both implementations
        for i in range(boxes.shape[0]):
            np.testing.assert_allclose(
                np.asarray(pb[i])[np.asarray(pv[i])],
                np.asarray(xb[i])[np.asarray(xv[i])],
                rtol=1e-5, atol=1e-6)


def test_pallas_nms_goldens(goldens):
    """Directly against the executed-reference goldens too."""
    for case in goldens["nms"]:
        boxes = jnp.asarray(case["boxes"], dtype=jnp.float32)[None]
        expected = np.asarray(case["kept"], dtype=np.float32).reshape(-1, 6)
        out, valid = pallas_batched_non_max_suppression(boxes, interpret=True)
        got = np.asarray(out[0])[np.asarray(valid[0])]
        assert got.shape == expected.shape
        np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-6)


def test_pallas_nms_empty():
    boxes = jnp.zeros((2, 49, 6), jnp.float32)
    out, valid = pallas_batched_non_max_suppression(boxes, interpret=True)
    assert not bool(valid.any())


def test_pallas_nms_tie_confidences():
    # equal confidences: stable order must match the XLA/NumPy-stable twin
    boxes = np.zeros((1, 8, 6), np.float32)
    boxes[0, :, 0] = [0, 1, 0, 1, 2, 2, 0, 1]
    boxes[0, :, 1] = 0.9  # all tied
    boxes[0, :, 2:4] = np.linspace(0.1, 0.9, 8)[:, None]
    boxes[0, :, 4:6] = 0.05
    pb, pv = pallas_batched_non_max_suppression(jnp.asarray(boxes),
                                                interpret=True)
    xb, xv = batched_non_max_suppression(jnp.asarray(boxes))
    np.testing.assert_array_equal(np.asarray(pv), np.asarray(xv))
    np.testing.assert_allclose(
        np.asarray(pb[0])[np.asarray(pv[0])],
        np.asarray(xb[0])[np.asarray(xv[0])], rtol=1e-6)


def test_pallas_nms_larger_grid():
    """N=196 (a 14x14 grid) — the kernel must scale beyond S=7."""
    boxes = jnp.asarray(_random_batch(11, b=2, n=196, num_classes=20))
    pb, pv = pallas_batched_non_max_suppression(boxes, interpret=True)
    xb, xv = batched_non_max_suppression(boxes)
    np.testing.assert_array_equal(np.asarray(pv), np.asarray(xv))
    for i in range(2):
        np.testing.assert_allclose(
            np.asarray(pb[i])[np.asarray(pv[i])],
            np.asarray(xb[i])[np.asarray(xv[i])], rtol=1e-5, atol=1e-6)


def test_map_large_padded_inputs():
    """64 images x 49 padded detections/GTs through the vectorized mAP."""
    from keras_object_detection_tpu.ops.map import mean_average_precision

    rng = np.random.RandomState(3)
    gt = rng.uniform(0, 1, size=(64, 49, 6)).astype(np.float32)
    gt[..., 0] = rng.randint(0, 20, size=(64, 49))
    det = rng.uniform(0, 1, size=(64, 49, 6)).astype(np.float32)
    det[..., 0] = rng.randint(0, 20, size=(64, 49))
    gt_v = rng.uniform(size=(64, 49)) < 0.1
    det_v = rng.uniform(size=(64, 49)) < 0.2
    val = float(mean_average_precision(
        jnp.asarray(gt), jnp.asarray(gt_v), jnp.asarray(det),
        jnp.asarray(det_v), num_classes=20))
    assert 0.0 <= val <= 1.0


def test_pallas_nms_fuzz_sizes():
    """Interpret-mode fuzz across box-count sizes and class counts."""
    for seed, n, c in [(21, 8, 2), (22, 16, 5), (23, 33, 3), (24, 56, 10),
                       (25, 49, 1)]:
        boxes = jnp.asarray(_random_batch(seed, b=3, n=n, num_classes=c))
        pb, pv = pallas_batched_non_max_suppression(boxes, interpret=True)
        xb, xv = batched_non_max_suppression(boxes)
        np.testing.assert_array_equal(np.asarray(pv), np.asarray(xv))
        for i in range(3):
            np.testing.assert_allclose(
                np.asarray(pb[i])[np.asarray(pv[i])],
                np.asarray(xb[i])[np.asarray(xv[i])], rtol=1e-5, atol=1e-6)
