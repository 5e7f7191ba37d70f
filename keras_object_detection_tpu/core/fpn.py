"""Multi-scale FPN anchor grids — the YOLOv3 detection family
(Redmon & Farhadi 2018, arXiv:1804.02767 §2.3 "Predictions Across Scales").
Beyond parity: the reference implements anchor-free YOLOv1 only; this is the
framework's third model family (after the v1 heads and the single-scale
YOLOv2 anchor head, core/anchors.py), opt-in via ``ModelConfig.head="fpn"``.

Geometry convention: ``GridConfig.grid`` is the COARSEST grid (the stride-32
feature map, e.g. 13 for 416² input); scale ``s`` detects on an
``S·2^s`` grid, so 3 scales give (S, 2S, 4S) — YOLOv3's 13/26/52. Anchors
are partitioned by area, largest third on the coarsest grid (big objects on
low-resolution features, arXiv:1804.02767 Table: the 416-model's
(116,90),(156,198),(373,326) live on the 13-grid).

Per scale the slot layout, targets, and activation decode are EXACTLY the
YOLOv2 anchor parameterization (core/anchors.py) — the family shares one
shape-IoU assignment rule, just resolved across scales first: each GT goes
to the scale that owns its globally-best anchor, then to that (cell, anchor)
slot within the scale. Everything is fixed-shape, loop-free jnp; the
downstream matcher/NMS/mAP machinery is layout-agnostic after decode.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp

from keras_object_detection_tpu.core.anchors import (
    _shape_iou,
    decode_anchor_grid,
    decode_anchor_targets,
    encode_anchor_grid,
)


def fpn_grid_sizes(grid: int, num_scales: int = 3) -> Tuple[int, ...]:
    """Grid side per scale, coarse -> fine: (S, 2S, 4S, ...)."""
    return tuple(grid * (2 ** s) for s in range(num_scales))


def partition_anchors(
    anchors: Sequence[Tuple[float, float]], num_scales: int = 3,
) -> Tuple[Tuple[Tuple[float, float], ...], ...]:
    """Split anchors into per-scale groups, coarse scale first.

    Sorted by area DESCENDING and chunked: the largest ``B/num_scales``
    priors detect on the coarsest grid (the YOLOv3 convention). The sort is
    stable, so equal-area anchors keep their given order. Raises unless the
    anchor count divides evenly.
    """
    anchors = tuple(tuple(a) for a in anchors)
    if not anchors or len(anchors) % num_scales:
        raise ValueError(
            f"FPN needs len(anchors) divisible by num_scales={num_scales}, "
            f"got {len(anchors)} (fit 3*num_scales with "
            "tools/kmeans_anchors.py)")
    per = len(anchors) // num_scales
    by_area = sorted(anchors, key=lambda a: -(a[0] * a[1]))
    return tuple(tuple(by_area[s * per:(s + 1) * per])
                 for s in range(num_scales))


def encode_fpn_grids(
    boxes: jnp.ndarray,
    valid: jnp.ndarray,
    num_classes: int,
    anchors: Sequence[Tuple[float, float]],
    grid: int = 13,
    num_scales: int = 3,
) -> Tuple[jnp.ndarray, ...]:
    """Encode padded YOLO boxes into per-scale anchor targets.

    Returns a tuple of ``(S_s, S_s, B_s*(5+C))`` arrays, coarse -> fine.
    Each GT is routed to the scale owning its globally-best shape-IoU anchor;
    within the scale the encode is ``core.anchors.encode_anchor_grid``
    verbatim. The within-scale argmax re-derives the SAME anchor: the
    global best is a member of its scale's subset and (being the first
    global maximizer) also the first within-scale maximizer.
    """
    parts = partition_anchors(anchors, num_scales)
    flat = jnp.asarray([a for p in parts for a in p], jnp.float32)
    per = flat.shape[0] // num_scales
    best = jnp.argmax(_shape_iou(boxes[:, 2:4], flat), axis=-1)
    scale_of = best // per  # (N,) owning scale per box
    valid = valid.astype(bool)
    grids = fpn_grid_sizes(grid, num_scales)
    return tuple(
        encode_anchor_grid(boxes, valid & (scale_of == s), num_classes,
                           parts[s], grids[s])
        for s in range(num_scales))


def decode_fpn_grids(
    predictions: Sequence[jnp.ndarray],
    num_classes: int,
    anchors: Sequence[Tuple[float, float]],
    grid: int = 13,
    num_scales: int = 3,
) -> jnp.ndarray:
    """Decode per-scale raw head outputs to one concatenated candidate set
    ``(batch, sum_s S_s²·B_s, 6)`` of ``[class, conf, cx, cy, w, h]`` —
    every downstream consumer (NMS, mAP, serving) is already
    candidate-count-agnostic."""
    parts = partition_anchors(anchors, num_scales)
    grids = fpn_grid_sizes(grid, num_scales)
    return jnp.concatenate(
        [decode_anchor_grid(p, num_classes, parts[s], grids[s])
         for s, p in enumerate(predictions)], axis=1)


def decode_fpn_targets(
    targets: Sequence[jnp.ndarray],
    num_classes: int,
    anchors: Sequence[Tuple[float, float]],
    grid: int = 13,
    num_scales: int = 3,
) -> jnp.ndarray:
    """GT-side twin of ``decode_fpn_grids`` over ENCODED targets
    (``encode_fpn_grids`` output) — used by the mAP accumulator."""
    parts = partition_anchors(anchors, num_scales)
    grids = fpn_grid_sizes(grid, num_scales)
    return jnp.concatenate(
        [decode_anchor_targets(t, num_classes, parts[s], grids[s])
         for s, t in enumerate(targets)], axis=1)
