"""NMS parity vs the executed reference (ref utils.py:79-114): the
fixed-shape masked greedy NMS must produce the same kept set, in the same
confidence-descending order."""

import numpy as np
import jax
import jax.numpy as jnp

from keras_object_detection_tpu.ops.nms import (
    batched_non_max_suppression,
    non_max_suppression,
)


def _kept(boxes, valid):
    return np.asarray(boxes)[np.asarray(valid)]


def test_nms_matches_reference_goldens(goldens):
    for case in goldens["nms"]:
        boxes = jnp.asarray(case["boxes"], dtype=jnp.float32)
        expected = np.asarray(case["kept"], dtype=np.float32).reshape(-1, 6)
        out, valid = non_max_suppression(boxes)
        got = _kept(out, valid)
        assert got.shape == expected.shape, (
            f"kept {got.shape[0]} boxes, reference kept {expected.shape[0]}")
        np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-6)


def test_nms_confidence_filter_strict():
    # conf == threshold must be dropped (strict >, ref utils.py:95)
    boxes = jnp.asarray(
        [[0.0, 0.4, 0.5, 0.5, 0.1, 0.1], [0.0, 0.41, 0.2, 0.2, 0.1, 0.1]],
        dtype=jnp.float32)
    out, valid = non_max_suppression(boxes)
    kept = _kept(out, valid)
    assert kept.shape[0] == 1
    assert np.isclose(kept[0, 1], 0.41)


def test_nms_class_aware():
    # identical boxes, different classes: both survive (ref utils.py:108)
    boxes = jnp.asarray(
        [[0.0, 0.9, 0.5, 0.5, 0.2, 0.2], [1.0, 0.8, 0.5, 0.5, 0.2, 0.2]],
        dtype=jnp.float32)
    out, valid = non_max_suppression(boxes)
    assert _kept(out, valid).shape[0] == 2


def test_nms_suppression_chain():
    # A suppresses B; C overlaps B but not A -> C survives (greedy semantics).
    # quirky-IoU values (reference formula): IoU(A,B)=0.667, IoU(B,C)=0.29,
    # IoU(A,C)=0.143 — with threshold 0.25, A kills B, and C survives only
    # because B (which would kill it) is already dead. Greedy semantics.
    boxes = jnp.asarray(
        [
            [0.0, 0.9, 0.30, 0.50, 0.20, 0.20],  # A
            [0.0, 0.8, 0.38, 0.50, 0.20, 0.20],  # B
            [0.0, 0.7, 0.60, 0.50, 0.20, 0.20],  # C
        ],
        dtype=jnp.float32)
    out, valid = non_max_suppression(boxes, iou_threshold=0.25)
    kept = _kept(out, valid)
    assert [round(float(c), 1) for c in kept[:, 1]] == [0.9, 0.7]


def test_batched_nms_matches_single():
    rng = np.random.RandomState(5)
    batch = rng.uniform(0, 1, size=(4, 49, 6)).astype(np.float32)
    batch[..., 0] = rng.randint(0, 3, size=(4, 49))
    out_b, valid_b = batched_non_max_suppression(jnp.asarray(batch))
    for i in range(4):
        out_s, valid_s = non_max_suppression(jnp.asarray(batch[i]))
        np.testing.assert_allclose(
            _kept(out_b[i], valid_b[i]), _kept(out_s, valid_s), rtol=1e-6)


def test_nms_jit_fixed_shape():
    fn = jax.jit(non_max_suppression)
    boxes = jnp.zeros((49, 6), dtype=jnp.float32)
    out, valid = fn(boxes)
    assert out.shape == (49, 6) and valid.shape == (49,)
    assert not bool(valid.any())  # all conf 0 <= 0.4 threshold
