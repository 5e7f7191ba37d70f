"""Confidence-ranked candidate compaction (ops/nms.py top_k_candidates).

The compaction bound is what makes the FPN family viable at paper scale:
the 416² 3-scale decode emits 13²·3 + 26²·3 + 52²·3 = 10,647 candidates
per image (core/fpn.py), which uncompacted would need O(N²) NMS matrices
(~0.9 GB/image) and an O(I·D·G) mAP matcher volume (~90 TB for a 200-image
val set). Compaction to the top-K by confidence is EXACT w.r.t. the
conf-thresholded (>0.4, ref utils.py:95) NMS + matching whenever the
above-threshold survivors fit in K — these tests pin both the exactness
claim and the at-scale viability.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from keras_object_detection_tpu.config import YOLOV3_ANCHORS_416
from keras_object_detection_tpu.core.fpn import (
    decode_fpn_grids,
    encode_fpn_grids,
    fpn_grid_sizes,
)
from keras_object_detection_tpu.ops.map import MeanAveragePrecision
from keras_object_detection_tpu.ops.nms import (
    batched_non_max_suppression as xla_nms,
    top_k_candidates,
)
from keras_object_detection_tpu.ops.pallas_nms import (
    auto_batched_non_max_suppression as auto_nms,
)

NUM_CLASSES = 20
FPN_CANDIDATES = sum(g * g * 3 for g in fpn_grid_sizes(13, 3))  # 10,647


def _kept(boxes, valid):
    return np.asarray(boxes)[np.asarray(valid)]


def test_top_k_keeps_highest_confidence_in_stable_order():
    rng = np.random.RandomState(0)
    boxes = rng.uniform(0, 1, size=(3, 100, 6)).astype(np.float32)
    out = top_k_candidates(jnp.asarray(boxes), 10)
    assert out.shape == (3, 10, 6)
    for i in range(3):
        # same rows a stable confidence-descending sort would put first
        order = np.argsort(-boxes[i, :, 1], kind="stable")[:10]
        np.testing.assert_array_equal(np.asarray(out[i]), boxes[i, order])


def test_top_k_noop_when_already_small():
    boxes = jnp.zeros((2, 49, 6), jnp.float32)
    assert top_k_candidates(boxes, 512) is boxes  # static no-op, not a copy


def test_compacted_nms_exact_when_survivors_fit():
    # 1,000 candidates, only ~25 above the 0.4 confidence threshold ->
    # compaction to K=64 must be invisible to the greedy NMS result.
    rng = np.random.RandomState(7)
    boxes = rng.uniform(0, 1, size=(2, 1000, 6)).astype(np.float32)
    boxes[..., 0] = rng.randint(0, NUM_CLASSES, size=(2, 1000))
    boxes[..., 1] = rng.uniform(0.0, 0.39, size=(2, 1000))
    for b in range(2):
        hot = rng.choice(1000, size=25, replace=False)
        boxes[b, hot, 1] = rng.uniform(0.41, 1.0, size=25)
    full_out, full_valid = xla_nms(jnp.asarray(boxes))
    comp_out, comp_valid = auto_nms(jnp.asarray(boxes), max_candidates=64)
    for b in range(2):
        np.testing.assert_allclose(
            _kept(comp_out[b], comp_valid[b]),
            _kept(full_out[b], full_valid[b]), rtol=1e-6)


def test_compaction_disabled_with_zero():
    rng = np.random.RandomState(3)
    boxes = jnp.asarray(rng.uniform(0, 1, (1, 200, 6)).astype(np.float32))
    out0, _ = auto_nms(boxes, max_candidates=0)
    assert out0.shape == (1, 200, 6)  # untouched
    outk, _ = auto_nms(boxes, max_candidates=50)
    assert outk.shape == (1, 50, 6)


def test_fpn_416_serving_nms_runs_at_paper_scale():
    # The real thing: a 416² 3-scale decode (10,647 candidates) through the
    # serving NMS with the default compaction bound. Uncompacted this would
    # materialize a 10,647² suppression matrix per image.
    rng = np.random.RandomState(1)
    preds = tuple(
        jnp.asarray(rng.normal(0, 1, (2, g, g, 3 * (5 + NUM_CLASSES)))
                    .astype(np.float32))
        for g in fpn_grid_sizes(13, 3))
    cands = decode_fpn_grids(preds, NUM_CLASSES, YOLOV3_ANCHORS_416, 13, 3)
    assert cands.shape == (2, FPN_CANDIDATES, 6)
    out, valid = jax.jit(
        lambda b: auto_nms(b, max_candidates=512))(cands)
    assert out.shape == (2, 512, 6) and valid.shape == (2, 512)


def test_fpn_416_map_accumulator_at_paper_scale():
    # End-to-end mAP at the paper scale: the accumulator's per-batch state
    # and the matcher volume must stay O(K), not O(10,647).
    rng = np.random.RandomState(2)
    gt = np.array([[0.3, 0.3, 0.2, 0.25, 3], [0.7, 0.6, 0.45, 0.5, 11]],
                  np.float32)
    valid = np.array([True, True])
    targets = encode_fpn_grids(
        jnp.asarray(gt), jnp.asarray(valid), NUM_CLASSES,
        YOLOV3_ANCHORS_416, 13, 3)
    y_true = tuple(t[None] for t in targets)
    y_pred = tuple(
        jnp.asarray(rng.normal(-2, 1, (1, g, g, 3 * (5 + NUM_CLASSES)))
                    .astype(np.float32))
        for g in fpn_grid_sizes(13, 3))
    m = MeanAveragePrecision(
        NUM_CLASSES, grid=13, anchors=YOLOV3_ANCHORS_416, fpn_scales=3,
        max_candidates=512)
    m.update_state(y_true, y_pred)
    # accumulated per-image sets are bounded by K
    assert m._pred[0].shape == (1, 512, 6)
    assert m._true[0].shape == (1, 512, 6)
    assert 0.0 <= m.result() <= 1.0


@pytest.mark.parametrize("nms_on_targets", [True, False])
def test_map_value_invariant_under_compaction(nms_on_targets):
    # v1-head grids with sparse high-confidence cells: mAP with the
    # compaction bound == mAP with compaction disabled (exactness at the
    # metric level, both GT modes).
    rng = np.random.RandomState(11)
    C, S, B = 3, 7, 2
    y_true = np.zeros((4, S, S, 5 * B + C), np.float32)
    y_pred = rng.normal(0, 0.05, (4, S, S, 5 * B + C)).astype(np.float32)
    for b in range(4):
        for _ in range(3):
            r, c = rng.randint(0, S, 2)
            cls = rng.randint(0, C)
            y_true[b, r, c, :5] = [1, 0.5, 0.5, 0.2, 0.3]
            y_true[b, r, c, 5 * B + cls] = 1
            y_pred[b, r, c, :5] = [0.9, 0.5, 0.5, 0.22, 0.28]
            y_pred[b, r, c, 5 * B + cls] = 0.95
    vals = []
    for k in (0, 16):
        m = MeanAveragePrecision(C, num_boxes=B, grid=S,
                                 nms_on_targets=nms_on_targets,
                                 max_candidates=k)
        m.update_state(jnp.asarray(y_true), jnp.asarray(y_pred))
        vals.append(m.result())
    assert vals[0] == pytest.approx(vals[1], abs=1e-7)
