"""TIDE-style error analysis (ops/error_analysis.py — beyond parity, the
reference only emits the mAP scalar, ref utils.py:280-456): hand-computed
category oracle + fuzz TP-count consistency with the device matcher
(result_pr_curves' final recall point)."""

import jax.numpy as jnp
import numpy as np

from keras_object_detection_tpu.ops.error_analysis import (
    CATEGORIES, error_analysis, format_error_table)
from keras_object_detection_tpu.ops.map import MeanAveragePrecision


def _pad(sets, width=6):
    n = max([len(s) for s in sets] + [1])
    boxes = np.zeros((len(sets), n, width), np.float32)
    valid = np.zeros((len(sets), n), bool)
    for i, s in enumerate(sets):
        for j, row in enumerate(s):
            boxes[i, j] = row
            valid[i, j] = True
    return boxes, valid


def test_hand_oracle_every_category():
    """One image exercising all six detection categories + a missed GT.

    GTs: class 0 at (.2,.2), class 0 at (.7,.7), class 1 at (.5,.1),
    class 1 at (.9,.9) (never matched -> missed).
    Detections (conf desc):
      .95 cls0 exact on GT0                              -> tp
      .90 cls0 exact on GT0 again                        -> duplicate
      .85 cls1 exact on GT1's box (cls0 GT)              -> classification
      .80 cls0 slight offset from GT1 (IoU ~ .32)        -> localization
      .75 cls0 slight offset from GT2 (a cls1 GT)        -> both
      .70 cls1 in empty space                            -> background
    """
    gts = [[0, 1.0, 0.2, 0.2, 0.1, 0.1],
           [0, 1.0, 0.7, 0.7, 0.1, 0.1],
           [1, 1.0, 0.5, 0.1, 0.1, 0.1],
           [1, 1.0, 0.9, 0.9, 0.1, 0.1]]
    dets = [[0, 0.95, 0.2, 0.2, 0.1, 0.1],
            [0, 0.90, 0.2, 0.2, 0.1, 0.1],
            [1, 0.85, 0.7, 0.7, 0.1, 0.1],
            [0, 0.80, 0.75, 0.75, 0.1, 0.1],
            [0, 0.75, 0.55, 0.15, 0.1, 0.1],
            [1, 0.70, 0.9, 0.4, 0.1, 0.1]]
    tb, tv = _pad([gts])
    pb, pv = _pad([dets])
    rep = error_analysis(tb, tv, pb, pv, num_classes=2)
    assert rep["counts"] == {"tp": 1, "duplicate": 1, "classification": 1,
                             "localization": 1, "both": 1, "background": 1}
    assert rep["num_detections"] == 6
    assert rep["num_gt"] == 4
    assert rep["missed_gt"] == 3  # GT1, GT2, GT3 unclaimed
    # detection-class buckets: cls0 made tp+dup+loc+both, cls1 cls+bkg
    assert rep["per_class"][0]["tp"] == 1
    assert rep["per_class"][0]["duplicate"] == 1
    assert rep["per_class"][0]["localization"] == 1
    assert rep["per_class"][0]["both"] == 1
    assert rep["per_class"][1]["classification"] == 1
    assert rep["per_class"][1]["background"] == 1
    # miss buckets follow the GT's class
    assert rep["per_class"][0]["missed_gt"] == 1
    assert rep["per_class"][1]["missed_gt"] == 2
    table = format_error_table(rep, names=["cat", "dog"])
    assert "cat" in table and "background" in table


def test_first_claimant_wins_rank_order():
    """Two candidates on one GT: the higher-confidence one is the tp even
    when it appears later in the array (matcher rank semantics)."""
    gts = [[0, 1.0, 0.5, 0.5, 0.2, 0.2]]
    dets = [[0, 0.6, 0.5, 0.5, 0.2, 0.2],
            [0, 0.9, 0.5, 0.5, 0.2, 0.2]]
    tb, tv = _pad([gts])
    pb, pv = _pad([dets])
    rep = error_analysis(tb, tv, pb, pv, num_classes=1)
    assert rep["counts"]["tp"] == 1 and rep["counts"]["duplicate"] == 1
    # swap confidences: same totals (order-independence of the counts)
    pb2 = pb.copy()
    pb2[0, :, 1] = [0.9, 0.6]
    rep2 = error_analysis(tb, tv, pb2, pv, num_classes=1)
    assert rep2["counts"] == rep["counts"]


def test_fuzz_tp_count_matches_device_matcher():
    """Random box soup: per-class TP count equals the device matcher's final
    recall point (recall * num_gt) from result_pr_curves — same claims."""
    rng = np.random.RandomState(7)
    n_img, n_gt, n_det, n_cls = 12, 6, 10, 4
    tb = np.zeros((n_img, n_gt, 6), np.float32)
    tb[..., 0] = rng.randint(0, n_cls, (n_img, n_gt))
    tb[..., 1] = 1.0
    tb[..., 2:6] = rng.uniform(0.05, 0.6, (n_img, n_gt, 4))
    tv = rng.rand(n_img, n_gt) < 0.8
    pb = np.zeros((n_img, n_det, 6), np.float32)
    pb[..., 0] = rng.randint(0, n_cls, (n_img, n_det))
    pb[..., 1] = rng.uniform(0.01, 1.0, (n_img, n_det))
    # half the detections perturb a random GT's box, half are random
    for i in range(n_img):
        for j in range(n_det // 2):
            g = rng.randint(n_gt)
            pb[i, j, 2:6] = tb[i, g, 2:6] + rng.normal(0, 0.02, 4)
            pb[i, j, 0] = tb[i, g, 0]
    pb[:, n_det // 2:, 2:6] = rng.uniform(0.05, 0.6,
                                          (n_img, n_det - n_det // 2, 4))
    pv = rng.rand(n_img, n_det) < 0.9

    rep = error_analysis(tb, tv, pb, pv, num_classes=n_cls, chunk=5)
    assert sum(rep["counts"].values()) == int(pv.sum())
    assert rep["num_gt"] == int(tv.sum())

    m = MeanAveragePrecision(num_classes=n_cls)
    m._true.append(jnp.asarray(tb))
    m._tvalid.append(jnp.asarray(tv))
    m._pred.append(jnp.asarray(pb))
    m._pvalid.append(jnp.asarray(pv))
    curves = m.result_pr_curves()
    for c in range(n_cls):
        row = rep["per_class"].get(c, {})
        want = (round(curves[c]["recall"][-1] * curves[c]["num_gt"])
                if c in curves else 0)
        assert row.get("tp", 0) == want, f"class {c}"
        # tp + missed covers every GT of the class exactly once
        if row:
            assert row["tp"] + row["missed_gt"] == row["num_gt"]


def test_empty_inputs():
    rep = MeanAveragePrecision(num_classes=3).result_error_analysis()
    assert rep["num_detections"] == 0 and rep["missed_gt"] == 0
    assert rep["per_class"] == {}
