"""mAP parity vs the executed reference accumulator (ref utils.py:459-496),
including the smoke case from ref utils.py:765-769, plus semantics tests for
the loop-free TP assignment."""

import numpy as np
import jax.numpy as jnp

from keras_object_detection_tpu.ops.map import MeanAveragePrecision, mean_average_precision


def test_map_matches_reference_goldens(goldens):
    for case in goldens["map"]:
        metric = MeanAveragePrecision(case["num_classes"], case["num_boxes"])
        for yt, yp in zip(case["y_true"], case["y_pred"]):
            metric.update_state(np.asarray(yt, np.float32),
                                np.asarray(yp, np.float32))
        got = metric.result()
        assert np.isclose(got, case["map"], rtol=1e-4, atol=1e-5), (
            f"mAP mismatch: got {got}, want {case['map']}")


def _pad(rows, n):
    rows = np.asarray(rows, np.float32).reshape(-1, 6)
    out = np.zeros((n, 6), np.float32)
    out[: len(rows)] = rows
    valid = np.zeros(n, bool)
    valid[: len(rows)] = True
    return out, valid


def test_map_perfect_detection_is_one():
    gt, gt_v = _pad([[0.0, 1.0, 0.5, 0.5, 0.2, 0.2]], 4)
    det, det_v = _pad([[0.0, 0.9, 0.5, 0.5, 0.2, 0.2]], 4)
    val = float(mean_average_precision(
        jnp.asarray(gt)[None], jnp.asarray(gt_v)[None],
        jnp.asarray(det)[None], jnp.asarray(det_v)[None], num_classes=1))
    assert np.isclose(val, 1.0, atol=1e-4)


def test_map_absent_class_counts_zero():
    # class 1 has no GT anywhere -> AP 0, mean over 2 classes = 0.5
    gt, gt_v = _pad([[0.0, 1.0, 0.5, 0.5, 0.2, 0.2]], 4)
    det, det_v = _pad([[0.0, 0.9, 0.5, 0.5, 0.2, 0.2]], 4)
    val = float(mean_average_precision(
        jnp.asarray(gt)[None], jnp.asarray(gt_v)[None],
        jnp.asarray(det)[None], jnp.asarray(det_v)[None], num_classes=2))
    assert np.isclose(val, 0.5, atol=1e-4)


def test_map_duplicate_detection_is_fp():
    # Two detections claiming the same GT: first (higher conf) TP, second FP.
    gt, gt_v = _pad([[0.0, 1.0, 0.5, 0.5, 0.2, 0.2]], 4)
    det, det_v = _pad(
        [[0.0, 0.9, 0.5, 0.5, 0.2, 0.2], [0.0, 0.8, 0.5, 0.5, 0.2, 0.2]], 4)
    val = float(mean_average_precision(
        jnp.asarray(gt)[None], jnp.asarray(gt_v)[None],
        jnp.asarray(det)[None], jnp.asarray(det_v)[None], num_classes=1))
    # PR points: (r0=0,p=1) -> (r=1,p=1) -> (r=1,p=0.5): trapz = 1.0
    assert np.isclose(val, 1.0, atol=1e-3)


def test_map_wrong_image_no_match():
    # Detection in image 1 cannot match GT in image 0.
    gt, gt_v = _pad([[0.0, 1.0, 0.5, 0.5, 0.2, 0.2]], 4)
    empty_gt, empty_v = _pad([], 4)
    det0, det0_v = _pad([], 4)
    det1, det1_v = _pad([[0.0, 0.9, 0.5, 0.5, 0.2, 0.2]], 4)
    val = float(mean_average_precision(
        jnp.asarray([gt, empty_gt]), jnp.asarray([gt_v, empty_v]),
        jnp.asarray([det0, det1]), jnp.asarray([det0_v, det1_v]), num_classes=1))
    assert np.isclose(val, 0.0, atol=1e-4)


def test_map_low_iou_is_fp():
    gt, gt_v = _pad([[0.0, 1.0, 0.2, 0.2, 0.1, 0.1]], 4)
    det, det_v = _pad([[0.0, 0.9, 0.8, 0.8, 0.1, 0.1]], 4)
    val = float(mean_average_precision(
        jnp.asarray(gt)[None], jnp.asarray(gt_v)[None],
        jnp.asarray(det)[None], jnp.asarray(det_v)[None], num_classes=1))
    assert np.isclose(val, 0.0, atol=1e-4)
