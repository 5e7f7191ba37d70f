"""Anchor-based grid encoding/decoding — the YOLOv2 detection family
(Redmon & Farhadi 2016, arXiv:1612.08242 §2 "Dimension Clusters" /
"Direct location prediction"). Beyond parity: the reference implements
anchor-free YOLOv1 only; this adds the anchor family as an opt-in head
(`ModelConfig.head="anchor"` + `GridConfig.anchors`) reusing the same
backbone, pipeline, NMS, and mAP machinery.

Cell layout along the last axis, per anchor slot (depth ``B * (5 + C)``):
``[obj, tx, ty, tw, th, class logits (C)]`` where, at decode time,
``cx = (sigmoid(tx) + col) / S``, ``w = anchor_w * exp(tw)`` — the
YOLOv2 parameterization. Targets store the INVERSE transform
(``tx* = S*cx - col`` in [0, 1), ``tw* = log(w / anchor_w)``), so the loss
compares ``sigmoid(tx)`` against ``tx*`` and raw ``tw`` against ``tw*``.

All fixed-shape, loop-free jnp (same design rules as core/grid.py): GT →
(cell, best-anchor-by-shape-IoU) assignment is a single ``segment_min``
scatter over flat (cell, anchor) slot ids.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def _shape_iou(wh: jnp.ndarray, anchors: jnp.ndarray) -> jnp.ndarray:
    """IoU of boxes against anchor priors with centers aligned (the YOLOv2
    dimension-cluster metric): (N, 2) x (B, 2) -> (N, B)."""
    inter = (jnp.minimum(wh[:, None, 0], anchors[None, :, 0])
             * jnp.minimum(wh[:, None, 1], anchors[None, :, 1]))
    union = (wh[:, 0] * wh[:, 1])[:, None] \
        + (anchors[:, 0] * anchors[:, 1])[None, :] - inter
    return inter / jnp.maximum(union, 1e-12)


def encode_anchor_grid(
    boxes: jnp.ndarray,
    valid: jnp.ndarray,
    num_classes: int,
    anchors: Sequence[Tuple[float, float]],
    grid: int = 7,
) -> jnp.ndarray:
    """Encode padded YOLO boxes into an ``(S, S, B*(5+C))`` anchor target.

    Each GT is assigned to its center cell and the anchor with the highest
    shape-IoU (arXiv:1612.08242 §2); collisions on a (cell, anchor) slot
    resolve first-box-wins (same convention as core/grid.encode_grid).
    Slot layout ``[obj, tx*, ty*, tw*, th*, class one-hot]``.
    """
    a = jnp.asarray(anchors, jnp.float32)
    nb = a.shape[0]
    n = boxes.shape[0]
    depth = 5 + num_classes
    valid = valid.astype(bool)

    cx, cy, w, h = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    col = jnp.clip(jnp.floor(grid * cx).astype(jnp.int32), 0, grid - 1)
    row = jnp.clip(jnp.floor(grid * cy).astype(jnp.int32), 0, grid - 1)
    best_anchor = jnp.argmax(
        _shape_iou(boxes[:, 2:4], a), axis=-1).astype(jnp.int32)  # (N,)
    slot = (row * grid + col) * nb + best_anchor  # flat (cell, anchor) id

    box_idx = jnp.arange(n, dtype=jnp.int32)
    nslots = grid * grid * nb
    seg_ids = jnp.where(valid, slot, nslots)
    winner = jax.ops.segment_min(
        box_idx, seg_ids, num_segments=nslots + 1)[:nslots]
    has_box = winner < n
    winner = jnp.where(has_box, winner, 0)

    wb = boxes[winner]  # (nslots, 5)
    scol = (jnp.arange(nslots, dtype=jnp.int32) // nb) % grid
    srow = jnp.arange(nslots, dtype=jnp.int32) // (nb * grid)
    aw = a[jnp.arange(nslots) % nb]  # (nslots, 2) anchor prior per slot

    tx = grid * wb[:, 0] - scol.astype(wb.dtype)
    ty = grid * wb[:, 1] - srow.astype(wb.dtype)
    tw = jnp.log(jnp.maximum(wb[:, 2], 1e-9) / aw[:, 0])
    th = jnp.log(jnp.maximum(wb[:, 3], 1e-9) / aw[:, 1])
    onehot = jax.nn.one_hot(wb[:, 4].astype(jnp.int32), num_classes,
                            dtype=boxes.dtype)

    fmask = has_box.astype(boxes.dtype)[:, None]
    out = jnp.concatenate(
        [jnp.ones((nslots, 1), boxes.dtype),
         jnp.stack([tx, ty, tw, th], axis=-1), onehot], axis=-1) * fmask
    return out.reshape(grid, grid, nb * depth)


def decode_anchor_grid(
    predictions: jnp.ndarray,
    num_classes: int,
    anchors: Sequence[Tuple[float, float]],
    grid: int = 7,
) -> jnp.ndarray:
    """Decode ``(batch, S, S, B*(5+C))`` raw model output to
    ``(batch, S*S*B, 6)`` boxes ``[class_idx, confidence, cx, cy, w, h]``.

    YOLOv2 activations: ``cx = (sigmoid(tx)+col)/S``,
    ``w = anchor_w * exp(tw)``, confidence = ``sigmoid(obj) * max softmax
    class probability`` (the v2 class-conditional score), class = argmax.
    Every anchor slot emits a candidate; NMS prunes downstream (the v1
    decode's best-of-B selection has no analogue — anchors specialize).
    """
    a = jnp.asarray(anchors, predictions.dtype)
    nb = a.shape[0]
    b = predictions.shape[0]
    p = predictions.reshape(b, grid, grid, nb, 5 + num_classes)

    obj = jax.nn.sigmoid(p[..., 0])
    cols = jnp.arange(grid, dtype=p.dtype)[None, None, :, None]
    rows = jnp.arange(grid, dtype=p.dtype)[None, :, None, None]
    cx = (jax.nn.sigmoid(p[..., 1]) + cols) / grid
    cy = (jax.nn.sigmoid(p[..., 2]) + rows) / grid
    # exp clipped so an untrained net can't overflow to inf
    w = a[None, None, None, :, 0] * jnp.exp(jnp.clip(p[..., 3], -9.0, 9.0))
    h = a[None, None, None, :, 1] * jnp.exp(jnp.clip(p[..., 4], -9.0, 9.0))
    probs = jax.nn.softmax(p[..., 5:], axis=-1)
    cls = jnp.argmax(probs, axis=-1).astype(p.dtype)
    conf = obj * jnp.max(probs, axis=-1)

    out = jnp.stack([cls, conf, cx, cy, w, h], axis=-1)
    return out.reshape(b, grid * grid * nb, 6)


def decode_anchor_targets(
    targets: jnp.ndarray,
    num_classes: int,
    anchors: Sequence[Tuple[float, float]],
    grid: int = 7,
) -> jnp.ndarray:
    """Decode ENCODED targets (``encode_anchor_grid`` output) back to
    ``(batch, S*S*B, 6)`` GT boxes — targets hold the inverse transform
    (no sigmoid on offsets, obj is already 0/1), so this is the exact
    round-trip twin used by the mAP accumulator's GT side."""
    a = jnp.asarray(anchors, targets.dtype)
    nb = a.shape[0]
    b = targets.shape[0]
    t = targets.reshape(b, grid, grid, nb, 5 + num_classes)

    obj = t[..., 0]
    cols = jnp.arange(grid, dtype=t.dtype)[None, None, :, None]
    rows = jnp.arange(grid, dtype=t.dtype)[None, :, None, None]
    cx = (t[..., 1] + cols) / grid
    cy = (t[..., 2] + rows) / grid
    w = a[None, None, None, :, 0] * jnp.exp(t[..., 3])
    h = a[None, None, None, :, 1] * jnp.exp(t[..., 4])
    cls = jnp.argmax(t[..., 5:], axis=-1).astype(t.dtype)

    out = jnp.stack([cls, obj, cx, cy, w, h], axis=-1)
    # empty slots decode to w=anchor_w*exp(0): zero them via the obj mask
    return jnp.where(obj[..., None] > 0, out, 0.0).reshape(
        b, grid * grid * nb, 6)
