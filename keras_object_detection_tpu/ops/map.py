"""VOC-style mAP@0.5, fully vectorized for TPU (parity target:
ref yolo_v1/utils.py:280-496 ``mean_average_precision`` / ``MeanAveragePrecision``).

The reference evaluates mAP with nested graph loops — per class, per
detection, per ground truth — plus a ``DenseHashTable`` and a host
``tf.py_function(np.trapz)`` escape; it takes minutes ("It takes sometime",
ref train.py:203). This module replaces all of it with a loop-free formulation
built on one observation about the reference's greedy matcher:

  Each detection's best ground-truth (argmax IoU within its image, ref
  utils.py:386-393) does NOT depend on which GTs were already matched. A
  detection is a true positive iff (a) its best IoU > threshold, and (b) it is
  the highest-confidence detection whose best-GT is that ground truth (ref
  utils.py:395-418: later claimants of a matched GT become false positives).

So TP assignment is a ``segment_min`` over detection ranks keyed by (image,
ground truth), and per-class AP is a cumulative sum + trapezoid — everything a
single compiled XLA program over padded, fixed-shape inputs. This is the
">=10x faster on-device eval" path from BASELINE.json.

Reproduced parity details:
- absent classes contribute AP = 0 to the mean (ref utils.py:334-336),
- PR curve is prepended with (precision=1, recall=0) (ref utils.py:438-439),
- AP is the continuous trapezoid integral, not 11-point (ref utils.py:444),
- epsilon 1e-6 in both recall and precision denominators,
- detection ordering: image-major accumulation then stable conf-descending
  sort, same tie behavior as the reference's accumulate-then-sort.
"""

from __future__ import annotations

from functools import partial
import jax
import jax.numpy as jnp
import numpy as np

from keras_object_detection_tpu.core.boxes import iou_cxcywh
from keras_object_detection_tpu.core.grid import decode_grid
from keras_object_detection_tpu.ops.pallas_nms import (
    auto_batched_non_max_suppression as batched_non_max_suppression,
)


#: COCO-style IoU threshold sweep 0.50:0.05:0.95 (10 points). Net-new
#: capability beyond the reference (which only evaluates VOC mAP@0.5).
COCO_IOU_THRESHOLDS = tuple(round(0.50 + 0.05 * i, 2) for i in range(10))


def _map_at_thresholds(
    true_boxes: jnp.ndarray,
    true_valid: jnp.ndarray,
    pred_boxes: jnp.ndarray,
    pred_valid: jnp.ndarray,
    num_classes: int,
    thresholds: tuple,
    return_curves: bool = False,
) -> jnp.ndarray:
    """(T, C) per-class AP values, one row per IoU threshold, sharing one
    matcher pass (mean over the class axis is the mAP at that threshold).
    ``return_curves=True`` (single threshold) additionally returns the
    per-class PR curves: ``(aps, recalls, precisions, total_true)`` with
    curves shaped ``(C, N+1)`` over the globally confidence-sorted
    detection stream (point 0 is the prepended (r=0, p=1) start).

    The IoU matrix, per-detection best-GT, and the global confidence ranking
    do not depend on the threshold — only the TP candidacy test does — so the
    sweep re-runs just the segment_min claim + PR integration per threshold
    (each one cumsum-sized, negligible next to the (I, D, G) IoU).
    """
    num_images, max_gt, _ = true_boxes.shape
    _, max_det, _ = pred_boxes.shape
    eps = 1e-6

    det_cls = pred_boxes[..., 0]  # (I, D)
    det_conf = jnp.where(pred_valid, pred_boxes[..., 1], -jnp.inf)
    gt_cls = true_boxes[..., 0]  # (I, G)

    # --- Per-detection best ground truth within its image & class ----------
    # (I, D, G) IoU of every detection against every GT of the same image.
    iou = iou_cxcywh(pred_boxes[:, :, None, 2:6], true_boxes[:, None, :, 2:6])[..., 0]
    match_ok = true_valid[:, None, :] & (gt_cls[:, None, :] == det_cls[:, :, None])
    iou = jnp.where(match_ok, iou, -1.0)
    best_iou = jnp.max(iou, axis=-1)  # (I, D)
    best_gt = jnp.argmax(iou, axis=-1)  # (I, D); first-max = ref strict-greater scan

    # --- Global confidence rank (image-major stable sort = ref accumulate order)
    flat_conf = det_conf.reshape(-1)  # (I*D,)
    order = jnp.argsort(-flat_conf, stable=True)
    rank_of = jnp.argsort(order, stable=True)  # rank per flat det index
    rank = rank_of.reshape(num_images, max_det)

    # --- Shared per-class machinery -----------------------------------------
    cls_sorted = det_cls.reshape(-1)[order]
    valid_sorted = pred_valid.reshape(-1)[order]
    class_ids = jnp.arange(num_classes, dtype=det_cls.dtype)

    gt_cls_flat = jnp.where(true_valid, gt_cls, -1.0).reshape(-1)
    total_true = jnp.sum(
        gt_cls_flat[None, :] == class_ids[:, None], axis=-1
    ).astype(jnp.float32)  # (C,)

    in_class = (cls_sorted[None, :] == class_ids[:, None]) & valid_sorted[None, :]  # (C, N)

    seg_base = jnp.arange(num_images)[:, None] * max_gt + best_gt  # (I, D)

    aps = []
    for iou_threshold in thresholds:
        # --- First-claimant-wins TP assignment via segment_min -------------
        cand = pred_valid & (best_iou > iou_threshold)
        seg = jnp.where(
            cand, seg_base,
            num_images * max_gt,  # park non-candidates in a spare segment
        ).reshape(-1)
        first_rank = jax.ops.segment_min(
            rank.reshape(-1), seg, num_segments=num_images * max_gt + 1
        )
        tp = cand & (rank == first_rank[seg.reshape(num_images, max_det)].reshape(
            num_images, max_det))
        fp = pred_valid & ~tp

        # --- Per-class PR curves over the globally sorted detection stream -
        tp_sorted = tp.reshape(-1)[order].astype(jnp.float32)  # (N,)
        fp_sorted = fp.reshape(-1)[order].astype(jnp.float32)

        tp_cum = jnp.cumsum(tp_sorted[None, :] * in_class, axis=-1)  # (C, N)
        fp_cum = jnp.cumsum(fp_sorted[None, :] * in_class, axis=-1)

        recalls = tp_cum / (total_true[:, None] + eps)  # (C, N)
        # Rows where a detection is not in the class repeat the previous
        # cumsums, so they repeat the previous PR point and contribute zero
        # area — no compaction needed. The one exception is the prefix before
        # a class's first detection (cumsums still 0): there the point must
        # equal the prepended (r=0, p=1) start (ref utils.py:438-439), so
        # clamp zero-denominator rows to precision 1.
        precisions = jnp.where(
            tp_cum + fp_cum > 0, tp_cum / (tp_cum + fp_cum + eps), 1.0)
        recalls = jnp.concatenate([jnp.zeros((num_classes, 1)), recalls], axis=-1)
        precisions = jnp.concatenate(
            [jnp.ones((num_classes, 1)), precisions], axis=-1)

        ap = jnp.sum(
            (recalls[:, 1:] - recalls[:, :-1])
            * (precisions[:, 1:] + precisions[:, :-1])
            / 2.0,
            axis=-1,
        )
        ap = jnp.where(total_true > 0, ap, 0.0)  # absent class -> AP 0 (ref utils.py:334)
        aps.append(ap)
        if return_curves:
            return jnp.stack(aps), recalls, precisions, total_true
    return jnp.stack(aps)


@partial(jax.jit, static_argnames=("num_classes", "iou_threshold"))
def mean_average_precision(
    true_boxes: jnp.ndarray,
    true_valid: jnp.ndarray,
    pred_boxes: jnp.ndarray,
    pred_valid: jnp.ndarray,
    num_classes: int,
    iou_threshold: float = 0.5,
) -> jnp.ndarray:
    """mAP@iou_threshold over padded per-image box sets.

    Args:
      true_boxes: ``(I, G, 6)`` ground truths per image,
        ``[class_idx, confidence, cx, cy, w, h]`` (decode_grid/NMS layout).
      true_valid: ``(I, G)`` bool mask of real GT rows.
      pred_boxes: ``(I, D, 6)`` detections per image (NMS-compacted).
      pred_valid: ``(I, D)`` bool mask of real detections.
      num_classes: C; classes are ``0..C-1`` float ids in column 0.

    Returns:
      Scalar mAP, the mean of per-class APs (absent classes count as 0).
    """
    return jnp.mean(_map_at_thresholds(
        true_boxes, true_valid, pred_boxes, pred_valid, num_classes,
        (iou_threshold,))[0])


@partial(jax.jit, static_argnames=("num_classes", "thresholds"))
def mean_average_precision_multi(
    true_boxes: jnp.ndarray,
    true_valid: jnp.ndarray,
    pred_boxes: jnp.ndarray,
    pred_valid: jnp.ndarray,
    num_classes: int,
    thresholds: tuple = COCO_IOU_THRESHOLDS,
) -> jnp.ndarray:
    """(T,) mAP at each IoU threshold in ONE compiled program.

    ``jnp.mean`` of the default sweep is the COCO-style mAP@[.50:.95]
    headline number — a beyond-parity capability (the reference computes
    only VOC mAP@0.5); per-threshold matching is independent greedy
    matching, exactly as pycocotools does it.
    """
    return jnp.mean(_map_at_thresholds(
        true_boxes, true_valid, pred_boxes, pred_valid, num_classes,
        tuple(thresholds)), axis=-1)


@partial(jax.jit, static_argnames=("num_classes", "iou_threshold"))
def average_precision_per_class(
    true_boxes: jnp.ndarray,
    true_valid: jnp.ndarray,
    pred_boxes: jnp.ndarray,
    pred_valid: jnp.ndarray,
    num_classes: int,
    iou_threshold: float = 0.5,
) -> jnp.ndarray:
    """(C,) per-class AP@iou_threshold — the vector ``mean_average_precision``
    averages (absent classes report AP 0, ref utils.py:334). Net-new surface:
    the reference throws the per-class breakdown away (ref utils.py:455-456
    reduces to the mean immediately); exposing it costs nothing extra."""
    return _map_at_thresholds(
        true_boxes, true_valid, pred_boxes, pred_valid, num_classes,
        (iou_threshold,))[0]


class MeanAveragePrecision:
    """Streaming mAP accumulator (parity target: ref utils.py:459-496).

    Mirrors the reference surface — ``update_state(y_true, y_pred)`` /
    ``result()`` / ``reset_states()`` — but the per-batch work (grid decode +
    NMS on predictions AND ground truths, the reference's quirk at ref
    utils.py:480) is one compiled on-device program; only the padded box sets
    are staged out and accumulated host-side.
    """

    def __init__(self, num_classes: int, num_boxes: int = 2, grid: int = 7,
                 iou_threshold: float = 0.5, conf_threshold: float = 0.4,
                 map_iou_threshold: float = 0.5, nms_on_targets: bool = True,
                 anchors: tuple = (), fpn_scales: int = 0,
                 max_candidates: int = 512):
        self._num_classes = num_classes
        self._num_boxes = num_boxes
        self._grid = grid
        self._iou_threshold = iou_threshold
        self._conf_threshold = conf_threshold
        self._map_iou_threshold = map_iou_threshold
        # True = current reference behavior (GT boxes also pass through NMS,
        # ref utils.py:480). False = the older MeanAveragePrecision2 variant
        # (ref metric.py:81): GTs only confidence-filtered (> conf_threshold).
        self._nms_on_targets = nms_on_targets
        # Anchor-family support (core/anchors.py): when anchor priors are
        # given, y_true/y_pred are the B*(5+C) per-anchor layout and the
        # accumulator decodes with the YOLOv2 transforms; the matcher and
        # every result view are layout-agnostic downstream of decode.
        self._anchors = tuple(tuple(a) for a in anchors or ())
        # FPN-family support (core/fpn.py): when fpn_scales > 0 (with anchor
        # priors), y_true/y_pred are per-scale grid TUPLES (coarse -> fine,
        # ``grid`` the coarsest) and decode concatenates the scales into one
        # candidate set — everything downstream is candidate-count-agnostic.
        self._fpn_scales = fpn_scales
        # Candidate-compaction bound (EvalConfig.max_candidates, ops/nms.py
        # top_k_candidates): keeps the accumulated per-image box sets — and
        # with them the matcher's (I, D, G) IoU volume — at O(K) instead of
        # O(grid cells x anchors). A no-op for the reference-parity heads
        # (<= 245 candidates); REQUIRED for the FPN family at paper scale
        # (10,647 candidates at 416² would need ~90 TB for a 200-image val
        # set uncompacted). Exact whenever above-threshold survivors <= K.
        self._max_candidates = max_candidates
        self._update = jax.jit(self._make_update())
        self.reset_states()

    def _make_update(self):
        def update(y_true, y_pred, image_valid):
            if self._fpn_scales:
                from keras_object_detection_tpu.core.fpn import (
                    decode_fpn_grids, decode_fpn_targets)
                tb = decode_fpn_targets(
                    y_true, self._num_classes, self._anchors, self._grid,
                    self._fpn_scales)
                pb = decode_fpn_grids(
                    y_pred, self._num_classes, self._anchors, self._grid,
                    self._fpn_scales)
            elif self._anchors:
                from keras_object_detection_tpu.core.anchors import (
                    decode_anchor_grid, decode_anchor_targets)
                tb = decode_anchor_targets(
                    y_true, self._num_classes, self._anchors, self._grid)
                pb = decode_anchor_grid(
                    y_pred, self._num_classes, self._anchors, self._grid)
            else:
                tb = decode_grid(y_true, self._num_classes, self._num_boxes,
                                 self._grid)
                pb = decode_grid(y_pred, self._num_classes, self._num_boxes,
                                 self._grid)
            if self._nms_on_targets:
                tboxes, tvalid = batched_non_max_suppression(
                    tb, self._iou_threshold, self._conf_threshold,
                    self._max_candidates)
            else:
                if (self._max_candidates
                        and tb.shape[1] > self._max_candidates):
                    from keras_object_detection_tpu.ops.nms import (
                        top_k_candidates)
                    tb = top_k_candidates(tb, self._max_candidates)
                tboxes, tvalid = tb, tb[..., 1] > self._conf_threshold
            pboxes, pvalid = batched_non_max_suppression(
                pb, self._iou_threshold, self._conf_threshold,
                self._max_candidates)
            if image_valid is not None:
                # Drop padded images of a partial final batch entirely: no
                # ground truths AND no (spurious) detections from zero pixels.
                tvalid = tvalid & image_valid[:, None]
                pvalid = pvalid & image_valid[:, None]
            return tboxes, tvalid, pboxes, pvalid

        return update

    def reset_states(self) -> None:
        self._true: list = []
        self._tvalid: list = []
        self._pred: list = []
        self._pvalid: list = []

    def update_state(self, y_true, y_pred, image_valid=None) -> None:
        """Accumulate one batch of grid-shaped targets and predictions.

        The per-batch decode+NMS output STAYS on device (a host round-trip
        per batch costs ~30 ms through this environment's dispatch relay);
        the single device->host readback happens inside ``result()``'s
        compiled mAP reduction.

        ``image_valid``: optional ``(batch,)`` bool mask excluding padded
        images (EvalConfig.mask_padded_images path).
        """
        if self._fpn_scales:  # per-scale grid tuples (pytree jit inputs)
            y_true = tuple(jnp.asarray(t) for t in y_true)
            y_pred = tuple(jnp.asarray(p) for p in y_pred)
        else:
            y_true, y_pred = jnp.asarray(y_true), jnp.asarray(y_pred)
        tboxes, tvalid, pboxes, pvalid = self._update(
            y_true, y_pred,
            None if image_valid is None else jnp.asarray(image_valid))
        self._true.append(tboxes)
        self._tvalid.append(tvalid)
        self._pred.append(pboxes)
        self._pvalid.append(pvalid)

    def result(self) -> float:
        if not self._true:
            return 0.0
        return float(
            mean_average_precision(
                jnp.concatenate(self._true),
                jnp.concatenate(self._tvalid),
                jnp.concatenate(self._pred),
                jnp.concatenate(self._pvalid),
                self._num_classes,
                self._map_iou_threshold,
            )
        )

    def result_multi(self, thresholds: tuple = COCO_IOU_THRESHOLDS) -> dict:
        """Per-threshold mAPs + their mean, in one compiled sweep.

        Returns ``{"mAP@0.50": ..., ..., "mAP@[.50:.95]": mean}`` — the
        COCO-style headline metric (net-new vs the reference, which only
        evaluates VOC mAP@0.5). The accumulated decode+NMS box sets are
        threshold-independent, so this reuses them as-is.
        """
        thresholds = tuple(thresholds)
        if not self._true:
            out = {f"mAP@{t:.2f}": 0.0 for t in thresholds}
            out["mAP@[.50:.95]" if thresholds == COCO_IOU_THRESHOLDS
                else "mAP@mean"] = 0.0
            return out
        vals = mean_average_precision_multi(
            jnp.concatenate(self._true),
            jnp.concatenate(self._tvalid),
            jnp.concatenate(self._pred),
            jnp.concatenate(self._pvalid),
            self._num_classes,
            thresholds,
        )
        vals = np.asarray(vals)
        out = {f"mAP@{t:.2f}": float(v) for t, v in zip(thresholds, vals)}
        out["mAP@[.50:.95]" if thresholds == COCO_IOU_THRESHOLDS
            else "mAP@mean"] = float(vals.mean())
        return out

    def result_pr_curves(self, iou_threshold: float = None) -> dict:
        """Per-class precision/recall curves at ``iou_threshold`` (default:
        the accumulator's mAP threshold) — the curves ``result()``'s
        trapezoid integrates, exposed for threshold tuning/plotting (the
        reference computes them internally and discards them, ref
        utils.py:430-444). Returns ``{class_idx: {"recall": [...],
        "precision": [...], "ap": float, "num_gt": int}}`` with repeated PR
        points compacted host-side (classes with no GTs are omitted)."""
        if not self._true:
            return {}
        thr = (self._map_iou_threshold if iou_threshold is None
               else iou_threshold)
        aps, recalls, precisions, total_true = _map_at_thresholds(
            jnp.concatenate(self._true), jnp.concatenate(self._tvalid),
            jnp.concatenate(self._pred), jnp.concatenate(self._pvalid),
            self._num_classes, (thr,), return_curves=True)
        aps, recalls, precisions, total_true = map(
            np.asarray, (aps[0], recalls, precisions, total_true))
        out = {}
        for c in range(self._num_classes):
            if total_true[c] <= 0:
                continue
            r, p = recalls[c], precisions[c]
            # drop repeated points (off-class rows repeat the previous one)
            keep = np.concatenate(
                [[True], (np.diff(r) != 0) | (np.diff(p) != 0)])
            out[c] = {"recall": [round(float(v), 6) for v in r[keep]],
                      "precision": [round(float(v), 6) for v in p[keep]],
                      "ap": round(float(aps[c]), 6),
                      "num_gt": int(total_true[c])}
        return out

    def result_error_analysis(self, iou_threshold: float = None,
                              bg_threshold: float = 0.1) -> dict:
        """TIDE-style error breakdown of the accumulated box sets
        (ops/error_analysis.py): every detection categorized as
        tp / duplicate / classification / localization / both / background,
        plus missed-GT counts, globally and per class. TP semantics are
        bit-consistent with ``result()``'s matcher."""
        from keras_object_detection_tpu.ops.error_analysis import (
            error_analysis)
        if not self._true:
            return error_analysis(
                np.zeros((0, 1, 6)), np.zeros((0, 1), bool),
                np.zeros((0, 1, 6)), np.zeros((0, 1), bool),
                self._num_classes)
        thr = (self._map_iou_threshold if iou_threshold is None
               else iou_threshold)
        return error_analysis(
            jnp.concatenate(self._true), jnp.concatenate(self._tvalid),
            jnp.concatenate(self._pred), jnp.concatenate(self._pvalid),
            self._num_classes, thr, bg_threshold)

    def result_per_class(self, iou_threshold: float = None) -> np.ndarray:
        """(C,) per-class AP at ``iou_threshold`` (default: the accumulator's
        mAP threshold) over the accumulated box sets. ``result()`` is this
        vector's mean; the reference never exposes it (ref utils.py:455-456)."""
        if not self._true:
            return np.zeros(self._num_classes, np.float32)
        return np.asarray(
            average_precision_per_class(
                jnp.concatenate(self._true),
                jnp.concatenate(self._tvalid),
                jnp.concatenate(self._pred),
                jnp.concatenate(self._pvalid),
                self._num_classes,
                self._map_iou_threshold if iou_threshold is None
                else iou_threshold,
            )
        )
