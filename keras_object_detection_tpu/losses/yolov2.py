"""Anchor-family (YOLOv2-style) detection loss — beyond parity (the
reference implements only the YOLOv1 loss, ref loss.py:100-215); the
anchor parameterization follows arXiv:1612.08242 §2.

Targets come from ``core.anchors.encode_anchor_grid``
(slot layout ``[obj, tx*, ty*, tw*, th*, class one-hot]``); predictions
are the raw head output with the same layout before activations. Terms:

- box:     MSE over assigned slots of (sigmoid(tx), sigmoid(ty)) vs
           (tx*, ty*) and RAW (tw, th) vs (tw*, th*) — comparing the
           log-space size directly keeps the gradient linear in the
           mismatch (darknet compares post-exp sizes; log-space is the
           numerically tame equivalent), scaled by lambda_coord.
- object:  MSE of sigmoid(obj) against 1 on assigned slots
           (``obj_target="one"``, the YOLOv1-parity convention this
           framework's v1 loss already documents, kept as the default for
           family consistency). ``obj_target="iou"`` restores darknet v2/
           v3's semantics: the target is the LIVE exact IoU between the
           decoded prediction and its assigned GT box (stop-gradient, so
           the confidence chases localization quality without warping the
           box gradients).
- noobj:   MSE of sigmoid(obj) against 0 on unassigned slots, scaled by
           lambda_noobj. With ``ignore_threshold`` set (darknet v2 uses
           0.6, v3 0.5), unassigned slots whose DECODED prediction already
           overlaps any ground-truth box above the threshold are exempted
           — the standard anchor-family fix for penalizing near-duplicate
           localizations of the same object. Opt-in (None = off).
- class:   softmax cross-entropy on assigned slots (darknet v2 uses
           squared error on probabilities; CE is the standard modern
           choice and converges faster — documented deviation).

All terms SUM-reduce over batch and slots (the framework-wide reduction
convention, so gradient accumulation stays exact — see
TrainConfig.grad_accum_steps).
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp


def yolo_v2_loss_terms(
    y_true: jnp.ndarray,
    y_pred: jnp.ndarray,
    num_classes: int,
    anchors: Sequence[Tuple[float, float]],
    lambda_coord: float = 5.0,
    lambda_noobj: float = 0.5,
    sample_weight: jnp.ndarray = None,
    ignore_threshold: float = None,
    gt_boxes: jnp.ndarray = None,
    gt_valid: jnp.ndarray = None,
    obj_target: str = "one",
) -> Dict[str, jnp.ndarray]:
    """Sum-reduced anchor-loss terms for ``(batch, S, S, B*(5+C))`` grids.

    ``sample_weight``: optional ``(batch,)`` 0/1 per-image weights (the
    padded-image masking contract shared with losses/yolo.py).
    ``ignore_threshold`` (+ the padded ``gt_boxes (batch, N, 5)`` /
    ``gt_valid (batch, N)`` that fed the encoder): exempt unassigned slots
    whose decoded prediction has best-IoU > threshold with any GT from the
    no-object term (darknet's ignore mask; opt-in)."""
    nb = len(anchors)
    depth = 5 + num_classes
    b = y_true.shape[0]
    t = y_true.reshape(b, -1, nb, depth).astype(jnp.float32)
    p = y_pred.reshape(b, -1, nb, depth).astype(jnp.float32)

    obj = t[..., 0]  # (b, S*S, B) 0/1 assignment mask
    noobj = 1.0 - obj

    grid = int(round(t.shape[1] ** 0.5))  # S*S cells
    pred_xy_wh = None  # decoded slot boxes, shared by ignore mask / IoU target

    def decoded_preds():
        # flat (cell, anchor) order — the SAME order as t/p's reshape above
        # (decode_anchor_grid reshapes row-major too)
        from keras_object_detection_tpu.core.anchors import decode_anchor_grid
        return decode_anchor_grid(
            y_pred.reshape(b, grid, grid, nb * depth).astype(jnp.float32),
            num_classes, anchors, grid)[..., 2:6]  # (b, S*S*B, 4)

    if ignore_threshold is not None:
        if gt_boxes is None or gt_valid is None:
            raise ValueError("ignore_threshold needs gt_boxes/gt_valid (the "
                             "padded box list the targets were encoded from)")
        from keras_object_detection_tpu.core.boxes import (
            pairwise_iou_cxcywh_exact)

        # EXACT IoU: the parity-quirk corners would inflate offset overlaps
        # (see core/boxes.py iou_cxcywh_exact).
        pred_xy_wh = decoded_preds()
        ious = pairwise_iou_cxcywh_exact(
            pred_xy_wh, gt_boxes[..., :4].astype(jnp.float32))  # (b,S*S*B,N)
        ious = jnp.where(gt_valid[:, None, :].astype(bool), ious, 0.0)
        best = jnp.max(ious, axis=-1).reshape(obj.shape)
        noobj = noobj * (best <= ignore_threshold).astype(noobj.dtype)

    def persum(x):  # sum everything but the batch axis -> (b,)
        return jnp.sum(x.reshape(b, -1), axis=-1)

    pxy = jax.nn.sigmoid(p[..., 1:3])
    box_xy = persum(obj[..., None] * jnp.square(pxy - t[..., 1:3]))
    box_wh = persum(obj[..., None] * jnp.square(p[..., 3:5] - t[..., 3:5]))
    box_loss = lambda_coord * (box_xy + box_wh)

    pobj = jax.nn.sigmoid(p[..., 0])
    if obj_target == "one":
        tgt = 1.0
    elif obj_target == "iou":
        # darknet v2/v3: confidence chases the LIVE localization quality.
        # Target slot boxes decode from the (inverse-transform) targets;
        # stop_gradient so the box terms keep their own clean gradients.
        from keras_object_detection_tpu.core.anchors import (
            decode_anchor_targets)
        from keras_object_detection_tpu.core.boxes import iou_cxcywh_exact

        if pred_xy_wh is None:
            pred_xy_wh = decoded_preds()
        true_xy_wh = decode_anchor_targets(
            y_true.reshape(b, grid, grid, nb * depth).astype(jnp.float32),
            num_classes, anchors, grid)[..., 2:6]
        live = iou_cxcywh_exact(pred_xy_wh, true_xy_wh).reshape(obj.shape)
        tgt = jax.lax.stop_gradient(live)
    else:
        raise ValueError(f"unknown obj_target {obj_target!r} "
                         "(expected 'one' or 'iou')")
    object_loss = persum(obj * jnp.square(pobj - tgt))
    no_object_loss = lambda_noobj * persum(noobj * jnp.square(pobj))

    logp = jax.nn.log_softmax(p[..., 5:], axis=-1)
    class_loss = -persum(obj[..., None] * t[..., 5:] * logp)

    w = (jnp.ones((b,), jnp.float32) if sample_weight is None
         else sample_weight.astype(jnp.float32))
    box_loss = jnp.sum(w * box_loss)
    object_loss = jnp.sum(w * object_loss)
    no_object_loss = jnp.sum(w * no_object_loss)
    class_loss = jnp.sum(w * class_loss)

    total = box_loss + object_loss + no_object_loss + class_loss
    return {
        "box_loss": box_loss,
        "object_loss": object_loss,
        "no_object_loss": no_object_loss,
        "class_loss": class_loss,
        "total": total,
    }
