"""Darknet ignore-mask tests (``TrainConfig.ignore_threshold``, beyond
parity — the reference's v1 loss has no unassigned-confidence exemption;
the knob implements darknet v2/v3's no-object ignore for the anchor/fpn
families, losses/yolov2.py)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from keras_object_detection_tpu.core.anchors import encode_anchor_grid
from keras_object_detection_tpu.losses.yolov2 import yolo_v2_loss_terms

ANCHORS = ((0.2, 0.2), (0.5, 0.5))
C = 3
DEPTH = 5 + C


def _setup():
    """One GT at cell (3,3); predictions are all-zero logits EXCEPT one
    unassigned slot crafted to decode onto the GT box exactly."""
    gt = jnp.asarray([[0.5, 0.5, 0.5, 0.5, 1.0]])
    valid = jnp.asarray([True])
    y_true = encode_anchor_grid(gt, valid, C, ANCHORS, grid=7)[None]

    p = np.zeros((1, 7, 7, len(ANCHORS) * DEPTH), np.float32)
    # GT sits at cell (row 3, col 3) and matches anchor 1 (0.5, 0.5) by
    # shape-IoU. Craft anchor-0's slot AT THE SAME CELL to decode to the GT
    # box: sigmoid(tx)=0.5 -> tx=0; w = 0.2*exp(tw) = 0.5 -> tw=ln(2.5).
    tw = float(np.log(0.5 / 0.2))
    p[0, 3, 3, 0:DEPTH] = [0.0, 0.0, 0.0, tw, tw] + [0.0] * C
    return y_true, jnp.asarray(p), gt[None], valid[None]


def test_ignore_exempts_overlapping_unassigned_slot():
    y_true, y_pred, gt, valid = _setup()
    base = yolo_v2_loss_terms(y_true, y_pred, C, ANCHORS)
    # threshold 0.6: ONLY the crafted slot (IoU ~1.0) exceeds it — the
    # zero-logit anchor-1 slots in adjacent cells decode to IoU ~0.556
    masked = yolo_v2_loss_terms(y_true, y_pred, C, ANCHORS,
                                ignore_threshold=0.6, gt_boxes=gt,
                                gt_valid=valid)
    # only the no-object term changes, by exactly lambda_noobj * sigmoid(0)^2
    # (the crafted slot decodes to IoU 1.0 with the GT and is exempted)
    drop = float(base["no_object_loss"] - masked["no_object_loss"])
    assert drop == pytest.approx(0.5 * 0.5 ** 2, rel=1e-5)
    for k in ("box_loss", "object_loss", "class_loss"):
        assert float(base[k]) == pytest.approx(float(masked[k]), rel=1e-6)


def test_ignore_threshold_boundary():
    """IoU exactly at the threshold is still penalized (strict >)."""
    y_true, y_pred, gt, valid = _setup()
    base = yolo_v2_loss_terms(y_true, y_pred, C, ANCHORS)
    at_one = yolo_v2_loss_terms(y_true, y_pred, C, ANCHORS,
                                ignore_threshold=1.0, gt_boxes=gt,
                                gt_valid=valid)
    assert float(at_one["no_object_loss"]) == pytest.approx(
        float(base["no_object_loss"]), rel=1e-6)


def test_ignore_respects_gt_validity():
    """A padded (invalid) GT row must not create exemptions."""
    y_true, y_pred, gt, valid = _setup()
    none_valid = jnp.zeros_like(valid)
    # encode with no valid GTs -> all slots unassigned
    y_true0 = encode_anchor_grid(gt[0], none_valid[0], C, ANCHORS, 7)[None]
    base = yolo_v2_loss_terms(y_true0, y_pred, C, ANCHORS)
    masked = yolo_v2_loss_terms(y_true0, y_pred, C, ANCHORS,
                                ignore_threshold=0.5, gt_boxes=gt,
                                gt_valid=none_valid)
    assert float(masked["no_object_loss"]) == pytest.approx(
        float(base["no_object_loss"]), rel=1e-6)


def test_ignore_requires_gt():
    y_true, y_pred, _, _ = _setup()
    with pytest.raises(ValueError, match="gt_boxes"):
        yolo_v2_loss_terms(y_true, y_pred, C, ANCHORS, ignore_threshold=0.5)


def test_v1_head_rejects_ignore_threshold():
    from keras_object_detection_tpu.config import (Config, GridConfig,
                                                   ModelConfig, TrainConfig)
    from keras_object_detection_tpu.train.loop import make_train_step

    cfg = Config(grid=GridConfig(num_classes=C),
                 model=ModelConfig(backbone="darknet_micro", head="conv",
                                   image_size=56, compute_dtype="float32"),
                 train=TrainConfig(ignore_threshold=0.5))
    with pytest.raises(ValueError, match="anchor/fpn-family"):
        make_train_step(cfg)


def test_fpn_loss_with_ignore_finite_and_monotone():
    from keras_object_detection_tpu.core.fpn import encode_fpn_grids
    from keras_object_detection_tpu.losses.yolov3 import yolo_v3_loss_terms

    anchors6 = ((0.8, 0.7), (0.5, 0.6), (0.35, 0.3),
                (0.2, 0.25), (0.12, 0.1), (0.05, 0.06))
    gt = jnp.asarray([[[0.5, 0.5, 0.6, 0.5, 1.0],
                       [0.25, 0.3, 0.08, 0.1, 0.0]]])
    valid = jnp.asarray([[True, True]])
    enc = encode_fpn_grids(gt[0], valid[0], C, anchors6, 7, 2)
    y_true = tuple(e[None] for e in enc)
    rng = np.random.RandomState(0)
    y_pred = tuple(jnp.asarray(rng.randn(*t.shape) * 0.5, jnp.float32)
                   for t in y_true)
    base = yolo_v3_loss_terms(y_true, y_pred, C, anchors6, 2)
    masked = yolo_v3_loss_terms(y_true, y_pred, C, anchors6, 2,
                                ignore_threshold=0.3, gt_boxes=gt,
                                gt_valid=valid)
    assert all(bool(jnp.isfinite(v)) for v in masked.values())
    # exemptions can only REMOVE no-object penalty
    assert float(masked["no_object_loss"]) <= float(base["no_object_loss"])


def test_obj_target_iou_semantics():
    """obj_target='iou': the assigned-slot confidence target is the live
    exact IoU of the decoded prediction vs its GT, stop-gradient."""
    gt = jnp.asarray([[0.5, 0.5, 0.5, 0.5, 1.0]])
    valid = jnp.asarray([True])
    y_true = encode_anchor_grid(gt, valid, C, ANCHORS, grid=7)[None]

    # assigned slot = cell (3,3), anchor 1. Predict a HALF-WIDTH box there:
    # w = 0.5*exp(tw) = 0.25 -> tw = ln(0.5); cx/cy on target (tx=logit(0.5)=0)
    p = np.zeros((1, 7, 7, len(ANCHORS) * DEPTH), np.float32)
    tw = float(np.log(0.5))
    p[0, 3, 3, DEPTH + 3] = tw  # anchor-1 slot's tw
    y_pred = jnp.asarray(p)

    one = yolo_v2_loss_terms(y_true, y_pred, C, ANCHORS, obj_target="one")
    iou = yolo_v2_loss_terms(y_true, y_pred, C, ANCHORS, obj_target="iou")
    # decoded pred: (0.5, 0.5, 0.25, 0.5) vs GT (0.5, 0.5, 0.5, 0.5):
    # inter = 0.25*0.5, union = 0.25 -> IoU 0.5. pobj = sigmoid(0) = 0.5.
    # object_loss: one -> (0.5-1)^2 = 0.25; iou -> (0.5-0.5)^2 = 0.
    assert float(one["object_loss"]) == pytest.approx(0.25, rel=1e-5)
    assert float(iou["object_loss"]) == pytest.approx(0.0, abs=1e-9)
    # every other term identical
    for k in ("box_loss", "no_object_loss", "class_loss"):
        assert float(one[k]) == pytest.approx(float(iou[k]), rel=1e-6)
    with pytest.raises(ValueError, match="obj_target"):
        yolo_v2_loss_terms(y_true, y_pred, C, ANCHORS, obj_target="bogus")


def test_obj_target_iou_stops_gradient():
    """The IoU target must not leak gradient into the box logits."""
    gt = jnp.asarray([[0.5, 0.5, 0.5, 0.5, 1.0]])
    valid = jnp.asarray([True])
    y_true = encode_anchor_grid(gt, valid, C, ANCHORS, grid=7)[None]

    def obj_loss_of_tw(tw):
        p = jnp.zeros((1, 7, 7, len(ANCHORS) * DEPTH))
        p = p.at[0, 3, 3, DEPTH + 3].set(tw)
        return yolo_v2_loss_terms(y_true, p, C, ANCHORS,
                                  obj_target="iou")["object_loss"]

    g = jax.grad(obj_loss_of_tw)(jnp.float32(np.log(0.5)))
    assert float(g) == 0.0


def test_v1_head_rejects_obj_target():
    from keras_object_detection_tpu.config import (Config, GridConfig,
                                                   ModelConfig, TrainConfig)
    from keras_object_detection_tpu.train.loop import make_train_step

    cfg = Config(grid=GridConfig(num_classes=C),
                 model=ModelConfig(backbone="darknet_micro", head="conv",
                                   image_size=56, compute_dtype="float32"),
                 train=TrainConfig(obj_target="iou"))
    with pytest.raises(ValueError, match="anchor/fpn-family"):
        make_train_step(cfg)


def test_anchor_train_step_with_ignore(tmp_path):
    from keras_object_detection_tpu.config import (Config, DataConfig,
                                                   GridConfig, ModelConfig,
                                                   ScheduleConfig,
                                                   TrainConfig)
    from keras_object_detection_tpu.train.loop import (create_train_state,
                                                       make_train_step)

    cfg = Config(
        grid=GridConfig(grid=7, num_classes=C, anchors=ANCHORS),
        model=ModelConfig(backbone="darknet_micro", head="anchor",
                          image_size=56, compute_dtype="float32"),
        data=DataConfig(batch_size=2, max_boxes_per_image=8,
                        hflip_prob=0.0, color_jitter=(0, 0, 0, 0),
                        crop_scale=(1.0, 1.0), crop_ratio=(1.0, 1.0)),
        train=TrainConfig(optimizer="adam", ignore_threshold=0.5,
                          schedule=ScheduleConfig(kind="constant",
                                                  base_lr=1e-3)),
    )
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(cfg))
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randint(0, 255, (2, 56, 56, 3)), jnp.uint8)
    boxes = np.zeros((2, 8, 5), np.float32)
    boxes[:, 0] = [0.5, 0.5, 0.5, 0.5, 1.0]
    valid = np.zeros((2, 8), bool)
    valid[:, 0] = True
    key = jax.random.PRNGKey(1)
    losses = []
    for _ in range(6):
        state, metrics = step(state, images, jnp.asarray(boxes),
                              jnp.asarray(valid), key)
        losses.append(float(metrics["total"]))
    assert np.isfinite(losses).all() and losses[-1] < losses[0]
