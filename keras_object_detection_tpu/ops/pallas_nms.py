"""Single-kernel Pallas NMS for TPU (the p50-NMS-latency headline target,
BASELINE.json "metric").

The XLA formulation in ``ops.nms`` lowers to a sort + a 49-iteration
``fori_loop`` of small vector ops — dozens of kernel launches per image. This
kernel keeps the whole computation resident in VMEM: one program per image
does

1. a stable confidence-descending *rank sort* computed as an O(N^2) pairwise
   comparison matrix (N = S*S = 49 — the matrix pads to one (56, 128)-ish
   vreg tile), materialized as a one-hot permutation matrix and applied with
   a single MXU matmul,
2. the pairwise-IoU suppression matrix (same reference-quirk IoU arithmetic
   as ``core.boxes``: corners at (c±s)/2, intersection clipped to [0,1],
   |area|, eps 1e-6),
3. the greedy alive-mask loop (``fori_loop`` over N, pure VPU ops on a
   (N, 1) mask — no HBM traffic),
4. compaction of survivors to the front via a second rank/permutation matmul.

Semantics are bit-identical to ``ops.nms.non_max_suppression`` (itself
golden-tested against the executed reference, ref utils.py:79-114).

Off-TPU the kernel runs in interpreter mode (tests), selected automatically.
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _rank_descending_stable(keys: jnp.ndarray) -> jnp.ndarray:
    """(N, 1) keys -> (N, 1) int ranks of a stable descending sort:
    rank_i = #{j : key_j > key_i} + #{j < i : key_j == key_i}."""
    n = keys.shape[0]
    row = jnp.broadcast_to(keys, (n, n))  # row[i, j] = key_i
    col = row.T  # col[i, j] = key_j
    idx_i = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    idx_j = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    greater = (col > row).astype(jnp.int32)
    tie_before = ((col == row) & (idx_j < idx_i)).astype(jnp.int32)
    return jnp.sum(greater + tie_before, axis=1, keepdims=True)


def _perm_from_rank(rank: jnp.ndarray) -> jnp.ndarray:
    """(N, 1) ranks -> (N, N) one-hot permutation P with P[k, i] = [rank_i == k],
    so sorted = P @ values."""
    n = rank.shape[0]
    k = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    return (rank.reshape(1, n) == k).astype(jnp.float32)


def _pairwise_iou(boxes: jnp.ndarray) -> jnp.ndarray:
    """(N, 4) cxcywh -> (N, N) IoU with the reference's exact arithmetic."""
    n = boxes.shape[0]
    cx, cy, w, h = boxes[:, 0:1], boxes[:, 1:2], boxes[:, 2:3], boxes[:, 3:4]
    xmin = (cx - w) / 2.0
    ymin = (cy - h) / 2.0
    xmax = (cx + w) / 2.0
    ymax = (cy + h) / 2.0

    def row(v):  # (N,1) -> (N,N) with value broadcast along columns
        return jnp.broadcast_to(v, (n, n))

    ix1 = jnp.maximum(row(xmin), row(xmin).T)
    iy1 = jnp.maximum(row(ymin), row(ymin).T)
    ix2 = jnp.minimum(row(xmax), row(xmax).T)
    iy2 = jnp.minimum(row(ymax), row(ymax).T)
    inter = jnp.clip(ix2 - ix1, 0.0, 1.0) * jnp.clip(iy2 - iy1, 0.0, 1.0)
    area = jnp.abs((xmax - xmin) * (ymax - ymin))  # (N,1)
    union = row(area) + row(area).T - inter + 1e-6
    return inter / union


def _nms_kernel(boxes_ref, out_boxes_ref, out_valid_ref, *, iou_threshold,
                conf_threshold):
    boxes = boxes_ref[0]  # (N, 6) [cls, conf, cx, cy, w, h]
    n = boxes.shape[0]

    # 1. stable conf-descending sort via permutation matmul (MXU)
    rank = _rank_descending_stable(boxes[:, 1:2])
    perm = _perm_from_rank(rank)
    sb = jnp.dot(perm, boxes, preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST)  # sorted

    # 2. suppression matrix on sorted boxes
    iou = _pairwise_iou(sb[:, 2:6])
    cls = sb[:, 0:1]
    same_class = jnp.broadcast_to(cls, (n, n)) == jnp.broadcast_to(cls, (n, n)).T
    idx_i = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    idx_j = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    suppresses = ((idx_i < idx_j) & same_class & (iou >= iou_threshold)).astype(
        jnp.float32)  # [i, j]: i (if alive) removes j

    # 3. greedy alive loop (sequential in sorted order). Mosaic has no
    # dynamic_slice on values, so row i is extracted with a one-hot masked
    # reduction; suppresses is pre-transposed once so the extraction reduces
    # along lanes without a per-step transpose.
    alive0 = (sb[:, 1:2] > conf_threshold).astype(jnp.float32)  # (N, 1)
    suppresses_t = suppresses.T  # [j, i]: i removes j
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)

    def body(i, alive):
        alive_i = jnp.sum(alive * (row_ids == i).astype(jnp.float32))
        sup_col = jnp.sum(
            suppresses_t * (lane_ids == i).astype(jnp.float32),
            axis=1, keepdims=True)  # (N, 1) = suppresses[i, :]
        return alive * (1.0 - alive_i * sup_col)

    alive = jax.lax.fori_loop(0, n, body, alive0)

    # 4. compact survivors to the front (stable on the sorted order)
    rank2 = _rank_descending_stable(alive)
    perm2 = _perm_from_rank(rank2)
    out_boxes_ref[0] = jnp.dot(perm2, sb, preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)
    out_valid_ref[0] = jnp.dot(perm2, alive,
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)


@functools.partial(
    jax.jit, static_argnames=("iou_threshold", "conf_threshold", "interpret"))
def pallas_batched_non_max_suppression(
    boxes: jnp.ndarray,
    iou_threshold: float = 0.5,
    conf_threshold: float = 0.4,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched fused NMS: ``(B, N, 6) -> ((B, N, 6), (B, N) bool)``.

    Drop-in replacement for ``ops.nms.batched_non_max_suppression`` — same
    outputs, one kernel launch for the whole batch (grid over images).
    """
    b, n, d = boxes.shape
    kernel = functools.partial(
        _nms_kernel, iou_threshold=iou_threshold, conf_threshold=conf_threshold)
    out_boxes, out_valid = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, n, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, n, d), jnp.float32),
            jax.ShapeDtypeStruct((b, n, 1), jnp.float32),
        ),
        interpret=interpret,
    )(boxes.astype(jnp.float32))
    return out_boxes, out_valid[..., 0] > 0.5


# Largest candidate count the single-block kernel fits in scoped VMEM: the
# working set is ~6 (N, N) f32 matrices (perm, iou, same-class, suppresses +
# its transpose, perm2), so N=512 uses ~6 MB of the 16 MB limit while N=735
# (the 2-scale fpn head's 49*3 + 196*3) measured 23.06 MB and failed to
# compile. Above the cap the XLA formulation takes over — same outputs.
PALLAS_NMS_MAX_N = 512


def auto_batched_non_max_suppression(boxes, iou_threshold=0.5,
                                     conf_threshold=0.4,
                                     max_candidates=0):
    """Measured-best NMS for the current backend and size — identical
    outputs on every path.

    Default: the XLA fori_loop formulation (ops/nms.py). A round-4
    same-harness sweep (batch ∈ {1, 8, 32}, N ∈ {49, 98, 245, 512},
    async-pipelined per-call time on v5e) measured it faster than the
    Pallas kernel at EVERY point — 1.2-1.9 ms vs the kernel's 3-10.8 ms at
    batch 32, and a profiler trace pins the kernel's device time at 9.78 ms
    for 32x512 (benchmarks/serving_device_time.json): the kernel serializes
    the whole greedy scan in ONE core's VMEM, while XLA pipelines the
    per-iteration vector work across the batch. Earlier rounds' "RTT-bound,
    device time microsecond-scale" claim was a serial-dispatch measurement
    that the relay's ~25 ms RTT masked. The kernel stays available
    (``KOT_NMS_IMPL=pallas``, candidate sets <= PALLAS_NMS_MAX_N) as a
    bit-parity-tested alternate for future hardware, mirroring the BN-stats
    convention (ROADMAP.md).

    ``max_candidates > 0`` first compacts oversized candidate sets to the
    top-K by confidence (ops/nms.py top_k_candidates — exact whenever the
    above-threshold survivors fit in K). This is how the multi-scale FPN
    family's 10,647-candidate decode at 416² stays O(K²) instead of
    O(N²)."""
    if max_candidates and boxes.shape[1] > max_candidates:
        from keras_object_detection_tpu.ops.nms import top_k_candidates

        boxes = top_k_candidates(boxes, int(max_candidates))
    on_tpu = jax.default_backend() not in ("cpu", "gpu")
    if (os.environ.get("KOT_NMS_IMPL", "xla") == "pallas" and on_tpu
            and boxes.shape[1] <= PALLAS_NMS_MAX_N):
        return pallas_batched_non_max_suppression(
            boxes, iou_threshold, conf_threshold)
    from keras_object_detection_tpu.ops.nms import batched_non_max_suppression

    return batched_non_max_suppression(boxes, iou_threshold, conf_threshold)
