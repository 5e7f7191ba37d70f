"""FPN-family (YOLOv3-style) multi-scale detection loss — beyond parity
(the reference implements only the YOLOv1 loss, ref loss.py:100-215); the
multi-scale prediction scheme follows arXiv:1804.02767 §2.3.

Each scale is EXACTLY the anchor-family loss (losses/yolov2.py) over that
scale's grid and anchor subset; scales simply sum — consistent with the
framework-wide sum-reduction convention, so gradient accumulation and the
masked-eval weighting contract carry over unchanged. Targets come from
``core.fpn.encode_fpn_grids`` (each GT routed to the scale owning its
globally-best shape-IoU anchor).
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax.numpy as jnp

from keras_object_detection_tpu.core.fpn import partition_anchors
from keras_object_detection_tpu.losses.yolov2 import yolo_v2_loss_terms


def yolo_v3_loss_terms(
    y_true: Sequence[jnp.ndarray],
    y_pred: Sequence[jnp.ndarray],
    num_classes: int,
    anchors: Sequence[Tuple[float, float]],
    num_scales: int = 3,
    lambda_coord: float = 5.0,
    lambda_noobj: float = 0.5,
    sample_weight: jnp.ndarray = None,
    ignore_threshold: float = None,
    gt_boxes: jnp.ndarray = None,
    gt_valid: jnp.ndarray = None,
    obj_target: str = "one",
) -> Dict[str, jnp.ndarray]:
    """Sum-reduced loss terms over per-scale ``(batch, S_s, S_s, B_s*(5+C))``
    grid tuples (coarse -> fine, the ``FPNHead`` output order).

    ``sample_weight``: optional ``(batch,)`` 0/1 per-image weights (the
    padded-image masking contract shared with losses/yolo.py).
    ``ignore_threshold``/``gt_boxes``/``gt_valid``: darknet's no-object
    ignore mask, applied PER SCALE against the full GT list (v3 uses 0.5;
    see losses/yolov2.py)."""
    parts = partition_anchors(anchors, num_scales)
    if len(y_true) != num_scales or len(y_pred) != num_scales:
        raise ValueError(
            f"expected {num_scales} per-scale grids, got "
            f"{len(y_true)} targets / {len(y_pred)} predictions")
    total: Dict[str, jnp.ndarray] = {}
    for s in range(num_scales):
        terms = yolo_v2_loss_terms(
            y_true[s], y_pred[s], num_classes, parts[s],
            lambda_coord, lambda_noobj, sample_weight=sample_weight,
            ignore_threshold=ignore_threshold, gt_boxes=gt_boxes,
            gt_valid=gt_valid, obj_target=obj_target)
        for k, v in terms.items():
            total[k] = total.get(k, 0.0) + v
    return total
