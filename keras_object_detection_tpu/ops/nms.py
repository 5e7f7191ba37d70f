"""Fixed-shape, class-aware greedy NMS (parity target: ref yolo_v1/utils.py:79-149).

The reference implements NMS as an O(N^2) ``tf.while_loop`` over a shrinking
``TensorArray`` — data-dependent shapes that cannot compile for TPU. Here the
same greedy algorithm is a static-shape program:

1. one (N, N) pairwise-IoU matrix (VPU-friendly, N = S*S = 49),
2. a stable confidence-descending sort,
3. a ``fori_loop`` over the N sorted slots that suppresses later same-class
   boxes with IoU >= threshold — only vector ops per step, and the surviving
   set is exactly the reference's greedy keep set.

Outputs are padded to N with a validity mask; kept boxes are compacted to the
front in chosen (confidence-descending) order, matching the reference's output
ordering.

Suppression rule parity (ref utils.py:108): a box is dropped iff it has the
same class as a kept higher-confidence box AND IoU >= iou_threshold (the
reference keeps when ``class differs OR iou < threshold``). The confidence
filter is strict ``conf > conf_threshold`` (ref utils.py:95).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from keras_object_detection_tpu.core.boxes import pairwise_iou_cxcywh


def non_max_suppression(
    boxes: jnp.ndarray,
    iou_threshold: float = 0.5,
    conf_threshold: float = 0.4,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy class-aware NMS over one image's decoded boxes.

    Args:
      boxes: ``(N, 6)`` rows of ``[class_idx, confidence, cx, cy, w, h]``
        (the output of ``core.grid.decode_grid`` for one image).

    Returns:
      ``(kept_boxes, valid)``: ``(N, 6)`` with surviving boxes compacted to the
      front in confidence-descending order, and an ``(N,)`` bool mask of real
      rows. ``kept_boxes[valid]`` equals the reference's NMS output.
    """
    n = boxes.shape[0]
    conf = boxes[:, 1]

    # Stable conf-descending sort; ties keep original (grid-scan) order like
    # np.argsort(-conf, kind='stable') in the reference's numpy twin.
    order = jnp.argsort(-conf, stable=True)
    sb = boxes[order]  # (N, 6) sorted
    alive = sb[:, 1] > conf_threshold  # strict

    iou = pairwise_iou_cxcywh(sb[:, 2:6], sb[:, 2:6])  # (N, N)
    same_class = sb[:, 0][:, None] == sb[:, 0][None, :]
    later = jnp.arange(n)[:, None] < jnp.arange(n)[None, :]  # j strictly after i
    # suppresses[i, j]: if i survives, it removes j.
    suppresses = later & same_class & (iou >= iou_threshold)

    def body(i, alive):
        return alive & ~(alive[i] & suppresses[i])

    alive = jax.lax.fori_loop(0, n, body, alive)

    # Compact kept rows to the front, preserving sorted order.
    compact = jnp.argsort(~alive, stable=True)
    return sb[compact], alive[compact]


def soft_non_max_suppression(
    boxes: jnp.ndarray,
    iou_threshold: float = 0.5,
    conf_threshold: float = 0.4,
    sigma: float = 0.5,
    method: str = "gaussian",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Class-aware Soft-NMS (Bodla et al. 2017) — opt-in, beyond parity.

    Instead of discarding overlapping same-class boxes outright (the
    reference's greedy rule, ref utils.py:108), each selection DECAYS the
    confidence of its same-class overlaps; boxes whose decayed confidence
    stays above ``conf_threshold`` can still be selected later. Recovers
    detections in crowded scenes that hard NMS deletes.

    Static-shape formulation: ``fori_loop`` over N selection slots; each step
    arg-maxes the surviving decayed confidences, records the pick, and decays
    via one row of the precomputed (N, N) IoU matrix. Once the running max
    falls to ``conf_threshold`` or below, remaining iterations are no-ops.

    Args:
      boxes: ``(N, 6)`` rows of ``[class_idx, confidence, cx, cy, w, h]``.
      method: ``"gaussian"`` — ``conf *= exp(-iou**2 / sigma)`` (every
        same-class overlap decays); ``"linear"`` — ``conf *= (1 - iou)`` only
        where ``iou >= iou_threshold`` (hard-NMS-like locality, soft penalty).

    Returns:
      ``(kept_boxes, valid)`` like :func:`non_max_suppression`; kept rows are
      in selection order (descending decayed confidence) and carry their
      decayed confidence in column 1.
    """
    if method not in ("gaussian", "linear"):
        raise ValueError(f"unknown soft-NMS method {method!r}")
    n = boxes.shape[0]
    iou = pairwise_iou_cxcywh(boxes[:, 2:6], boxes[:, 2:6])  # (N, N)
    same_class = boxes[:, 0][:, None] == boxes[:, 0][None, :]
    idx = jnp.arange(n)

    def body(i, state):
        conf, selected, slots, slot_conf = state
        cand = jnp.where(selected, -jnp.inf, conf)
        j = jnp.argmax(cand)
        take = cand[j] > conf_threshold  # strict, like ref utils.py:95
        picked = (idx == j) & take
        selected = selected | picked
        slots = slots.at[i].set(jnp.where(take, j, n))
        slot_conf = slot_conf.at[i].set(jnp.where(take, conf[j], 0.0))
        iou_j = iou[j]
        if method == "gaussian":
            decay = jnp.exp(-(iou_j * iou_j) / sigma)
        else:
            decay = jnp.where(iou_j >= iou_threshold, 1.0 - iou_j, 1.0)
        decay = jnp.where(same_class[j] & ~picked & take, decay, 1.0)
        return conf * decay, selected, slots, slot_conf

    conf0 = boxes[:, 1].astype(jnp.float32)
    slots0 = jnp.full((n,), n, dtype=jnp.int32)
    _, _, slots, slot_conf = jax.lax.fori_loop(
        0, n, body, (conf0, jnp.zeros((n,), bool), slots0, jnp.zeros((n,))))

    valid = slots < n
    rows = boxes[jnp.clip(slots, 0, n - 1)]
    rows = rows.at[:, 1].set(slot_conf.astype(rows.dtype))
    return jnp.where(valid[:, None], rows, 0.0), valid


def batched_soft_non_max_suppression(
    boxes: jnp.ndarray,
    iou_threshold: float = 0.5,
    conf_threshold: float = 0.4,
    sigma: float = 0.5,
    method: str = "gaussian",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Vmapped Soft-NMS: ``(B, N, 6) -> ((B, N, 6), (B, N))``."""
    return jax.vmap(
        lambda b: soft_non_max_suppression(b, iou_threshold, conf_threshold,
                                           sigma, method)
    )(boxes)


def fast_non_max_suppression(
    boxes: jnp.ndarray,
    iou_threshold: float = 0.5,
    conf_threshold: float = 0.4,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One-shot matrix NMS (YOLACT's "Fast NMS", arXiv:1904.02689 §3.5) —
    opt-in, beyond parity (``EvalConfig.nms_mode="fast"``).

    Greedy NMS is inherently sequential: whether box j survives depends on
    whether its suppressors themselves survived, so the exact algorithm
    needs the N-iteration loop (:func:`non_max_suppression`) — measured at
    9.8 ms on-device for 32x512 candidates (benchmarks/
    serving_device_time.json), pure loop latency. Fast NMS drops the
    dependency: a box is suppressed by ANY higher-confidence same-class
    box with IoU >= threshold, already-suppressed or not. That collapses
    the whole decision to one (N, N) matrix reduction with no sequential
    chain, trading a small over-suppression (a box can be killed by a box
    that itself was killed) for parallel-friendliness.

    Same I/O contract as :func:`non_max_suppression`; the kept set is
    always a SUBSET of greedy's (identical whenever no survivor was
    suppressed transitively — e.g. any image whose overlaps are pairwise
    isolated clusters).
    """
    conf = boxes[:, 1]
    order = jnp.argsort(-conf, stable=True)
    sb = boxes[order]
    alive = sb[:, 1] > conf_threshold  # strict, ref utils.py:95
    iou = pairwise_iou_cxcywh(sb[:, 2:6], sb[:, 2:6])
    same_class = sb[:, 0][:, None] == sb[:, 0][None, :]
    n = boxes.shape[0]
    later = jnp.arange(n)[:, None] < jnp.arange(n)[None, :]
    # suppressed_by[i, j]: higher-ranked i kills j (i need only pass the
    # confidence filter, not survive itself — the Fast NMS relaxation)
    suppressed_by = later & same_class & (iou >= iou_threshold) \
        & alive[:, None]
    keep = alive & ~jnp.any(suppressed_by, axis=0)
    compact = jnp.argsort(~keep, stable=True)
    return sb[compact], keep[compact]


def batched_fast_non_max_suppression(
    boxes: jnp.ndarray,
    iou_threshold: float = 0.5,
    conf_threshold: float = 0.4,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Vmapped Fast NMS: ``(B, N, 6) -> ((B, N, 6), (B, N))``."""
    return jax.vmap(
        lambda b: fast_non_max_suppression(b, iou_threshold, conf_threshold)
    )(boxes)


def top_k_candidates(boxes: jnp.ndarray, k: int) -> jnp.ndarray:
    """Confidence-ranked candidate compaction: ``(B, N, 6) -> (B, K, 6)``.

    Keeps the K highest-confidence candidates per image (``lax.top_k``
    breaks ties toward the lower index — the same order a stable
    confidence-descending sort of the full set produces, so downstream NMS
    sees the boxes in the order the uncompacted path would have visited
    them first).

    EXACT with respect to conf-thresholded NMS/matching whenever the number
    of above-threshold candidates is <= K: every dropped candidate ranks
    below K by confidence and would have been filtered or never reached by
    the greedy scan before any kept one. This is what makes the multi-scale
    FPN family (core/fpn.py: 13²+26²+52² cells x 3 anchors = 10,647
    candidates at 416²) viable at paper scale — it bounds the (N, N) NMS
    matrices AND the mAP matcher's (I, D, G) IoU volume, and routes the
    compacted set back through the single-block Pallas NMS kernel
    (ops/pallas_nms.py PALLAS_NMS_MAX_N). The reference never faces this
    (single 7x7 grid, 49 candidates, ref utils.py:79-149); parity surfaces
    (N <= K) are bit-identical because compaction is a no-op there.
    """
    if boxes.shape[-2] <= k:
        return boxes
    _, idx = jax.lax.top_k(boxes[..., 1], k)  # (B, K) descending conf
    return jnp.take_along_axis(boxes, idx[..., None], axis=-2)


def batched_non_max_suppression(
    boxes: jnp.ndarray,
    iou_threshold: float = 0.5,
    conf_threshold: float = 0.4,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Vmapped NMS over a batch: ``(B, N, 6) -> ((B, N, 6), (B, N))``.

    The reference loops Python-side over the batch calling graph NMS per image
    (ref utils.py:474-480); here the whole batch is one compiled program.
    """
    return jax.vmap(
        lambda b: non_max_suppression(b, iou_threshold, conf_threshold)
    )(boxes)
