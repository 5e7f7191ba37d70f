"""mAP parity vs the executed reference accumulator (ref utils.py:459-496),
including the smoke case from ref utils.py:765-769, plus semantics tests for
the loop-free TP assignment."""

import numpy as np
import jax.numpy as jnp

from keras_object_detection_tpu.ops.map import (
    COCO_IOU_THRESHOLDS,
    MeanAveragePrecision,
    average_precision_per_class,
    mean_average_precision,
    mean_average_precision_multi,
)


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


def test_map_multi_matches_per_threshold_singles():
    # The COCO sweep must be EXACTLY the single-threshold matcher run at each
    # threshold (per-threshold independent greedy matching, pycocotools-style).
    rng = np.random.RandomState(7)
    gts, gvs, dets, dvs = [], [], [], []
    for _ in range(6):
        g, gv = _pad(
            [[float(rng.randint(3)), 1.0, *rng.uniform(0.2, 0.8, 2),
              *rng.uniform(0.05, 0.3, 2)] for _ in range(rng.randint(1, 4))], 5)
        # detections: jittered copies of the GTs + one random box
        rows = [r.copy() for r in g[gv]]
        for r in rows:
            r[1] = rng.uniform(0.3, 1.0)
            r[2:6] += rng.uniform(-0.05, 0.05, 4)
        rows.append([float(rng.randint(3)), rng.uniform(0.3, 1.0),
                     *rng.uniform(0.2, 0.8, 2), *rng.uniform(0.05, 0.3, 2)])
        d, dv = _pad(rows, 5)
        gts.append(g), gvs.append(gv), dets.append(d), dvs.append(dv)
    gt, gv = jnp.asarray(np.stack(gts)), jnp.asarray(np.stack(gvs))
    dt, dv = jnp.asarray(np.stack(dets)), jnp.asarray(np.stack(dvs))

    sweep = np.asarray(mean_average_precision_multi(gt, gv, dt, dv, 3))
    assert sweep.shape == (len(COCO_IOU_THRESHOLDS),)
    for t, got in zip(COCO_IOU_THRESHOLDS, sweep):
        want = float(mean_average_precision(gt, gv, dt, dv, 3, t))
        assert np.isclose(got, want, atol=1e-6), (t, got, want)
    # mAP is non-increasing in the IoU threshold
    assert np.all(np.diff(sweep) <= 1e-6)


def test_accumulator_result_multi():
    rng = np.random.RandomState(0)
    metric = MeanAveragePrecision(3, 2)
    yt = np.zeros((2, 7, 7, 13), np.float32)
    for b in range(2):
        for _ in range(3):
            i, j = rng.randint(7), rng.randint(7)
            yt[b, i, j, rng.randint(3)] = 1
            yt[b, i, j, 3] = 1
            yt[b, i, j, 4:8] = rng.uniform([0, 0, 0.05, 0.05], [1, 1, 0.5, 0.5])
    yp = (0.8 * yt + 0.3 * rng.uniform(-0.2, 1, yt.shape)).astype(np.float32)
    metric.update_state(yt, yp)
    multi = metric.result_multi()
    assert np.isclose(multi["mAP@0.50"], metric.result(), atol=1e-6)
    assert np.isclose(
        multi["mAP@[.50:.95]"],
        np.mean([multi[f"mAP@{t:.2f}"] for t in COCO_IOU_THRESHOLDS]),
        atol=1e-6)


def test_per_class_ap_breakdown():
    # class 0 perfectly detected, class 1 absent -> AP [1, 0]; the mean is
    # exactly mean_average_precision's scalar.
    gt, gt_v = _pad([[0.0, 1.0, 0.5, 0.5, 0.2, 0.2]], 4)
    det, det_v = _pad([[0.0, 0.9, 0.5, 0.5, 0.2, 0.2]], 4)
    args = (jnp.asarray(gt)[None], jnp.asarray(gt_v)[None],
            jnp.asarray(det)[None], jnp.asarray(det_v)[None])
    aps = np.asarray(average_precision_per_class(*args, num_classes=2))
    assert aps.shape == (2,)
    assert np.allclose(aps, [1.0, 0.0], atol=1e-4)
    assert np.isclose(aps.mean(),
                      float(mean_average_precision(*args, num_classes=2)),
                      atol=1e-6)


def test_accumulator_result_per_class():
    rng = np.random.RandomState(3)
    metric = MeanAveragePrecision(3, 2)
    yt = np.zeros((2, 7, 7, 13), np.float32)
    for b in range(2):
        for _ in range(3):
            i, j = rng.randint(7), rng.randint(7)
            yt[b, i, j, rng.randint(3)] = 1
            yt[b, i, j, 3] = 1
            yt[b, i, j, 4:8] = rng.uniform([0, 0, 0.05, 0.05], [1, 1, 0.5, 0.5])
    yp = (0.8 * yt + 0.3 * rng.uniform(-0.2, 1, yt.shape)).astype(np.float32)
    metric.update_state(yt, yp)
    aps = metric.result_per_class()
    assert aps.shape == (3,)
    assert np.isclose(aps.mean(), metric.result(), atol=1e-6)
