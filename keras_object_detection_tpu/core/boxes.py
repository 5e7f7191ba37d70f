"""Box geometry primitives (parity target: ref yolo_v1/utils.py:9-76).

Pure ``jnp`` functions over ``[cx, cy, w, h]`` boxes; broadcast over any
leading dims and compose with ``vmap``/``jit``. The arithmetic reproduces the
reference exactly — including its quirks — so downstream loss/NMS/mAP are
bit-comparable:

- intersection side lengths are clamped to ``[0, 1]`` (not just ``>= 0``),
- areas go through ``abs`` (negative w/h predictions yield positive area),
- the union denominator carries a ``1e-6`` epsilon.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-6


def cxcywh_to_corners(boxes: jnp.ndarray) -> jnp.ndarray:
    """``[cx, cy, w, h] -> [xmin, ymin, xmax, ymax]`` along the last axis.

    Matches the reference conversion (ref utils.py:24-32): ``xmin = (cx-w)/2``
    is what the reference literally computes — note this equals
    ``cx/2 - w/2``, i.e. the reference halves the center too. We reproduce the
    same expression for bit-parity of IoU values.
    """
    cx, cy, w, h = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate(
        [(cx - w) / 2.0, (cy - h) / 2.0, (cx + w) / 2.0, (cy + h) / 2.0], axis=-1
    )


def iou_cxcywh(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Elementwise (broadcasting) IoU of ``[cx, cy, w, h]`` boxes.

    Parity twin of ref utils.py:9-43 / utils.py:46-76 (numpy). Shapes
    ``(..., 4)`` broadcast against each other; returns ``(..., 1)``.
    """
    b1 = cxcywh_to_corners(boxes1)
    b2 = cxcywh_to_corners(boxes2)

    inter_w = jnp.clip(
        jnp.minimum(b1[..., 2:3], b2[..., 2:3]) - jnp.maximum(b1[..., 0:1], b2[..., 0:1]),
        0.0,
        1.0,
    )
    inter_h = jnp.clip(
        jnp.minimum(b1[..., 3:4], b2[..., 3:4]) - jnp.maximum(b1[..., 1:2], b2[..., 1:2]),
        0.0,
        1.0,
    )
    inter = inter_w * inter_h
    area1 = jnp.abs((b1[..., 2:3] - b1[..., 0:1]) * (b1[..., 3:4] - b1[..., 1:2]))
    area2 = jnp.abs((b2[..., 2:3] - b2[..., 0:1]) * (b2[..., 3:4] - b2[..., 1:2]))
    return inter / (area1 + area2 - inter + _EPS)


def pairwise_iou_cxcywh(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """All-pairs IoU: ``(N, 4) x (M, 4) -> (N, M)``.

    The TPU-native replacement for the reference's O(N^2) scalar IoU loops
    inside NMS/mAP (ref utils.py:106-110, 386-393): one vectorized VPU-friendly
    matrix instead of a ``tf.while_loop``.
    """
    return iou_cxcywh(boxes1[..., :, None, :], boxes2[..., None, :, :])[..., 0]


def iou_cxcywh_exact(b1: jnp.ndarray, b2: jnp.ndarray) -> jnp.ndarray:
    """Geometrically-correct elementwise (broadcasting) IoU
    (``(..., 4) x (..., 4) -> (...)``) — true corners ``cx - w/2``, no clip
    quirk.

    The reference expression ``(cx - w)/2`` (reproduced by
    ``cxcywh_to_corners`` for bit-parity) halves centers but NOT sizes, so
    offset boxes score INFLATED IoU. Parity surfaces (loss/NMS/mAP) keep the
    quirk; beyond-parity consumers that need real geometry — the darknet
    ignore mask and IoU objectness target (losses/yolov2.py) — use this one.
    """
    x1 = jnp.maximum(b1[..., 0] - b1[..., 2] / 2, b2[..., 0] - b2[..., 2] / 2)
    y1 = jnp.maximum(b1[..., 1] - b1[..., 3] / 2, b2[..., 1] - b2[..., 3] / 2)
    x2 = jnp.minimum(b1[..., 0] + b1[..., 2] / 2, b2[..., 0] + b2[..., 2] / 2)
    y2 = jnp.minimum(b1[..., 1] + b1[..., 3] / 2, b2[..., 1] + b2[..., 3] / 2)
    inter = jnp.maximum(x2 - x1, 0.0) * jnp.maximum(y2 - y1, 0.0)
    union = (jnp.abs(b1[..., 2] * b1[..., 3])
             + jnp.abs(b2[..., 2] * b2[..., 3]) - inter)
    return inter / jnp.maximum(union, _EPS)


def pairwise_iou_cxcywh_exact(boxes1: jnp.ndarray,
                              boxes2: jnp.ndarray) -> jnp.ndarray:
    """Exact-geometry all-pairs IoU: ``(..., N, 4) x (..., M, 4) ->
    (..., N, M)`` (see ``iou_cxcywh_exact``)."""
    return iou_cxcywh_exact(boxes1[..., :, None, :], boxes2[..., None, :, :])
