"""The four-term YOLOv1 loss (parity target: ref yolo_v1/loss.py:100-215).

TPU-native formulation: the reference's ``tf.TensorArray`` loops over the B
box slots (ref loss.py:126-155) become a single reshape to ``(..., B, 5)``
plus an argmax/one-hot select — everything is one fused elementwise XLA
computation over ``(batch, S, S, ...)``, no loops, no dynamic shapes.

Reproduced parity quirks (SURVEY.md §7 "hard parts"):
- responsible box = argmax IoU vs truth, ties to slot 0 (ref loss.py:136),
- wh term uses ``sign(p) * sqrt(|p| + 1e-6)`` (ref loss.py:176-178),
- the object-loss target is the *predicted box's IoU*, not 1
  (``(pred_iou - pred_conf)^2``, ref loss.py:189),
- the no-object term penalizes only the selected slot's confidence
  (ref loss.py:197), not both slots,
- reduction is a raw ``sum`` over the whole batch (no mean),
- lambda_coord = 5, lambda_noobj = 0.5 (ref loss.py:115-116).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from keras_object_detection_tpu.core.boxes import iou_cxcywh


def _iou_geometry(true_box: jnp.ndarray, pred_box: jnp.ndarray):
    """Shared per-cell box geometry for the IoU-family regression losses:
    returns ``(iou, center_d2/diag2, aspect_v)``, each ``(..., 1)``, with
    standard (non-quirky) geometric IoU and |w|,|h| on predictions."""
    tx, ty, tw, th = (true_box[..., k : k + 1] for k in range(4))
    px, py, pw, ph = (pred_box[..., k : k + 1] for k in range(4))
    pw = jnp.abs(pw)
    ph = jnp.abs(ph)
    tx1, ty1, tx2, ty2 = tx - tw / 2, ty - th / 2, tx + tw / 2, ty + th / 2
    px1, py1, px2, py2 = px - pw / 2, py - ph / 2, px + pw / 2, py + ph / 2
    iw = jnp.maximum(jnp.minimum(tx2, px2) - jnp.maximum(tx1, px1), 0.0)
    ih = jnp.maximum(jnp.minimum(ty2, py2) - jnp.maximum(ty1, py1), 0.0)
    inter = iw * ih
    union = tw * th + pw * ph - inter + 1e-9
    iou = inter / union
    center_d2 = (tx - px) ** 2 + (ty - py) ** 2
    cw = jnp.maximum(tx2, px2) - jnp.minimum(tx1, px1)
    ch = jnp.maximum(ty2, py2) - jnp.minimum(ty1, py1)
    diag2 = cw ** 2 + ch ** 2 + 1e-9
    # CIoU aspect-ratio consistency term (Zheng et al. 2019 eq. 9)
    v = (4.0 / jnp.pi ** 2) * jnp.square(
        jnp.arctan(tw / (th + 1e-9)) - jnp.arctan(pw / (ph + 1e-9)))
    return iou, center_d2 / diag2, v


def _diou_loss(true_box: jnp.ndarray, pred_box: jnp.ndarray) -> jnp.ndarray:
    """Per-cell DIoU regression loss (..., 1); standard geometric IoU."""
    iou, norm_d2, _ = _iou_geometry(true_box, pred_box)
    return 1.0 - iou + norm_d2


def _ciou_loss(true_box: jnp.ndarray, pred_box: jnp.ndarray) -> jnp.ndarray:
    """Per-cell Complete-IoU loss: DIoU + aspect-ratio consistency
    (Zheng et al. 2019, arXiv:1911.08287 eq. 10). The trade-off weight
    alpha = v / (1 - IoU + v) is treated as a constant per the paper's
    gradient derivation (stop_gradient)."""
    iou, norm_d2, v = _iou_geometry(true_box, pred_box)
    alpha = jax.lax.stop_gradient(v / (1.0 - iou + v + 1e-9))
    return 1.0 - iou + norm_d2 + alpha * v


def _alpha_iou_loss(true_box: jnp.ndarray, pred_box: jnp.ndarray,
                    alpha: float = 3.0) -> jnp.ndarray:
    """Per-cell alpha-DIoU loss (He et al. 2021, arXiv:2110.13675, see
    PAPERS.md): power-transform both the IoU and penalty terms —
    ``1 - IoU^alpha + (d2/diag2)^alpha`` — which up-weights high-IoU
    examples for more accurate localization; alpha=3 is the paper's
    recommendation."""
    iou, norm_d2, _ = _iou_geometry(true_box, pred_box)
    return 1.0 - iou ** alpha + norm_d2 ** alpha


def yolo_v1_loss_terms(
    y_true: jnp.ndarray,
    y_pred: jnp.ndarray,
    num_classes: int,
    num_boxes: int = 2,
    lambda_coord: float = 5.0,
    lambda_noobj: float = 0.5,
    noobj_mode: str = "selected",
    box_loss_mode: str = "mse",
    sample_weight: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    """Per-term scalars; ``total`` matches the reference loss exactly
    (with the default ``box_loss_mode="mse"``; ``"diou"`` / ``"ciou"`` /
    ``"alpha_iou"`` swap the xy/wh MSE terms for the corresponding
    IoU-family regression loss, see PAPERS.md).

    Args:
      y_true: ``(batch, S, S, C + 5B)`` grid targets (only box slot 0 used).
      y_pred: same shape, raw model output.
      noobj_mode: ``"selected"`` (reference parity, ref loss.py:197 — only the
        responsible slot's confidence is penalized in empty cells, which
        leaves the other slot's confidence completely untrained at object
        cells and lets it win decode's argmax with a junk box) or ``"all"``
        (the YOLOv1 paper's formulation, penalizing every slot — also what
        the reference's older commented variant did, ref loss.py:81-82).
      sample_weight: optional ``(batch,)`` per-image weights. ``None`` keeps
        reference parity (every image contributes full weight — including
        zero-padded partial-batch images, whose all-zero targets otherwise
        add phantom no-object terms). Weights of 0/1 drop padded images
        exactly; the reference never pads (it shrinks the last batch
        instead, ref dataset.py:38-47).
    """
    c = num_classes
    true_box = y_true[..., c + 1 : c + 5]  # (b,S,S,4)
    obj = y_true[..., c : c + 1]  # (b,S,S,1)
    noobj = 1.0 - obj
    if sample_weight is not None:
        w = sample_weight.astype(y_true.dtype)[:, None, None, None]
        # Both masks carry the weight, so every term below inherits it.
        obj = obj * w
        noobj = noobj * w

    pred_rest = y_pred[..., c:]
    bshape = pred_rest.shape[:-1] + (num_boxes, 5)
    pred_slots = pred_rest.reshape(bshape)  # (b,S,S,B,5) [conf,x,y,w,h]
    pred_confs = pred_slots[..., 0]  # (b,S,S,B)
    pred_boxes = pred_slots[..., 1:5]  # (b,S,S,B,4)

    ious = iou_cxcywh(true_box[..., None, :], pred_boxes)[..., 0]  # (b,S,S,B)

    best = jnp.argmax(ious, axis=-1)  # (b,S,S); tf.argmax ties -> slot 0
    onehot = jax.nn.one_hot(best, num_boxes, dtype=y_pred.dtype)  # (b,S,S,B)
    pred_box = jnp.sum(onehot[..., None] * pred_boxes, axis=-2)  # (b,S,S,4)
    pred_conf = jnp.sum(onehot * pred_confs, axis=-1, keepdims=True)  # (b,S,S,1)
    # NOTE: no stop_gradient on pred_iou — the reference lets gradients flow
    # through the IoU term (ref loss.py:189 uses the live IoU tensor).
    pred_iou = jnp.sum(onehot * ious, axis=-1, keepdims=True)  # (b,S,S,1)

    if noobj_mode not in ("selected", "all"):
        raise ValueError(f"noobj_mode must be 'selected' or 'all', got {noobj_mode!r}")
    if box_loss_mode not in ("mse", "diou", "ciou", "alpha_iou"):
        raise ValueError(
            f"box_loss_mode must be 'mse', 'diou', 'ciou' or 'alpha_iou', "
            f"got {box_loss_mode!r}")

    if box_loss_mode == "mse":
        xy_loss = jnp.sum(obj * jnp.square(true_box[..., 0:2] - pred_box[..., 0:2]))
        wh_loss = jnp.sum(
            obj
            * jnp.square(
                jnp.sqrt(true_box[..., 2:4])
                - jnp.sign(pred_box[..., 2:4]) * jnp.sqrt(jnp.abs(pred_box[..., 2:4]) + 1e-6)
            )
        )
        box_loss = xy_loss + wh_loss
    else:
        # IoU-family regression losses (see PAPERS.md), all opt-in
        # improvements over the reference's MSE terms with standard
        # (non-quirky) geometric IoU: DIoU (Zheng et al. 2019,
        # arXiv:1911.08287), CIoU (same paper, + aspect consistency),
        # alpha-DIoU (He et al. 2021, arXiv:2110.13675, alpha=3).
        fn = {"diou": _diou_loss, "ciou": _ciou_loss,
              "alpha_iou": _alpha_iou_loss}[box_loss_mode]
        box_loss = jnp.sum(obj * fn(true_box, pred_box))
    object_loss = jnp.sum(obj * jnp.square(pred_iou - pred_conf))
    if noobj_mode == "selected":
        no_object_loss = jnp.sum(noobj * jnp.square(0.0 - pred_conf))
    else:  # "all": every slot's confidence pulled to 0 in empty cells
        no_object_loss = jnp.sum(noobj * jnp.square(0.0 - pred_confs))
    class_loss = jnp.sum(obj * jnp.square(y_true[..., :c] - y_pred[..., :c]))

    total = lambda_coord * box_loss + object_loss + lambda_noobj * no_object_loss + class_loss
    return {
        "box_loss": box_loss,
        "object_loss": object_loss,
        "no_object_loss": no_object_loss,
        "class_loss": class_loss,
        "total": total,
    }


def yolo_v1_loss(
    y_true: jnp.ndarray,
    y_pred: jnp.ndarray,
    num_classes: int,
    num_boxes: int = 2,
    lambda_coord: float = 5.0,
    lambda_noobj: float = 0.5,
    noobj_mode: str = "selected",
) -> jnp.ndarray:
    """Scalar YOLOv1 loss, parity twin of ``YoloV1Loss.call`` (ref loss.py:120-215)."""
    return yolo_v1_loss_terms(
        y_true, y_pred, num_classes, num_boxes, lambda_coord, lambda_noobj,
        noobj_mode,
    )["total"]


class YoloV1Loss:
    """Callable config-bound loss, mirroring the reference class surface
    (ref loss.py:100-119): ``loss = YoloV1Loss(num_classes=3); loss(y_true, y_pred)``."""

    def __init__(self, num_classes: int = 20, num_boxes: int = 2,
                 lambda_coord: float = 5.0, lambda_noobj: float = 0.5,
                 noobj_mode: str = "selected"):
        self.num_classes = num_classes
        self.num_boxes = num_boxes
        self.lambda_coord = lambda_coord
        self.lambda_noobj = lambda_noobj
        self.noobj_mode = noobj_mode

    def __call__(self, y_true: jnp.ndarray, y_pred: jnp.ndarray) -> jnp.ndarray:
        return yolo_v1_loss(
            y_true, y_pred, self.num_classes, self.num_boxes,
            self.lambda_coord, self.lambda_noobj, self.noobj_mode,
        )
