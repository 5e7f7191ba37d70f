"""Per-class PR-curve export (MeanAveragePrecision.result_pr_curves /
evaluate.py --pr-json — beyond parity: the reference computes the curves
internally and discards them, ref utils.py:430-444): hand-computed curve
oracle and consistency with result()/result_per_class()."""

import jax.numpy as jnp
import numpy as np

from keras_object_detection_tpu.ops.map import MeanAveragePrecision


def _metric():
    return MeanAveragePrecision(num_classes=2, num_boxes=2, grid=7,
                                conf_threshold=0.0)


def _inject(metric, true_sets, pred_sets):
    """Bypass the grid decode: stuff decoded box sets directly into the
    accumulator's device-side lists (the documented [cls, conf, cx, cy,
    w, h] layout)."""
    def pad(sets):
        n = max(len(s) for s in sets)
        boxes = np.zeros((len(sets), n, 6), np.float32)
        valid = np.zeros((len(sets), n), bool)
        for i, s in enumerate(sets):
            for j, row in enumerate(s):
                boxes[i, j] = row
                valid[i, j] = True
        return jnp.asarray(boxes), jnp.asarray(valid)

    tb, tv = pad(true_sets)
    pb, pv = pad(pred_sets)
    metric._true.append(tb)
    metric._tvalid.append(tv)
    metric._pred.append(pb)
    metric._pvalid.append(pv)


def test_pr_curve_hand_oracle():
    """One image, class 0: 2 GTs; detections TP(conf .9), FP(conf .8),
    TP(conf .7). Curve: (0,1) -> (.5,1) -> (.5,.5) -> (1,2/3);
    AP = .5*1 + .5*(.5+2/3)/2 = 0.7916...; class 1 has no GTs -> omitted."""
    m = _metric()
    gt = [[0, 1.0, 0.2, 0.2, 0.1, 0.1], [0, 1.0, 0.7, 0.7, 0.1, 0.1]]
    preds = [[0, 0.9, 0.2, 0.2, 0.1, 0.1],    # TP on GT 1
             [0, 0.8, 0.45, 0.45, 0.1, 0.1],  # FP (no overlap)
             [0, 0.7, 0.7, 0.7, 0.1, 0.1]]    # TP on GT 2
    _inject(m, [gt], [preds])
    curves = m.result_pr_curves()
    assert set(curves) == {0}
    c = curves[0]
    np.testing.assert_allclose(c["recall"], [0.0, 0.5, 0.5, 1.0], atol=1e-5)
    np.testing.assert_allclose(c["precision"], [1.0, 1.0, 0.5, 2.0 / 3.0],
                               atol=1e-5)
    assert c["num_gt"] == 2
    expected_ap = 0.5 * 1.0 + 0.5 * (0.5 + 2.0 / 3.0) / 2.0
    np.testing.assert_allclose(c["ap"], expected_ap, atol=1e-4)

    # consistency with the scalar surfaces over the same accumulation
    per_class = m.result_per_class()
    np.testing.assert_allclose(per_class[0], expected_ap, atol=1e-4)
    assert per_class[1] == 0.0  # absent class -> AP 0 (ref utils.py:334)


def test_pr_curves_empty_accumulator():
    assert _metric().result_pr_curves() == {}
