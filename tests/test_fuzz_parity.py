"""Fuzz parity: the vectorized mAP and static-shape NMS vs independent,
straightforward numpy oracles (written from the reference's algorithm
description, not its code) across many random cases. These go beyond the two
executed-reference golden cases and pin the trickiest logic: the segment_min
first-claimant matching and the cumsum/trapezoid PR construction."""

import numpy as np
import jax.numpy as jnp

from keras_object_detection_tpu.core.boxes import iou_cxcywh
from keras_object_detection_tpu.ops.map import mean_average_precision
from keras_object_detection_tpu.ops.nms import non_max_suppression


def _oracle_iou(a, b):
    """Reference-quirk IoU for the oracle (corners at (c±s)/2, clip, abs)."""
    ax1, ay1, ax2, ay2 = (a[0]-a[2])/2, (a[1]-a[3])/2, (a[0]+a[2])/2, (a[1]+a[3])/2
    bx1, by1, bx2, by2 = (b[0]-b[2])/2, (b[1]-b[3])/2, (b[0]+b[2])/2, (b[1]+b[3])/2
    iw = np.clip(min(ax2, bx2) - max(ax1, bx1), 0, 1)
    ih = np.clip(min(ay2, by2) - max(ay1, by1), 0, 1)
    inter = iw * ih
    ua = abs((ax2-ax1)*(ay2-ay1)) + abs((bx2-bx1)*(by2-by1)) - inter + 1e-6
    return inter / ua


def _oracle_nms(boxes, iou_th=0.5, conf_th=0.4):
    """Plain greedy NMS: conf filter, stable sort desc, keep-top suppress
    same-class overlaps."""
    boxes = [b for b in boxes if b[1] > conf_th]
    boxes.sort(key=lambda b: -b[1])
    kept = []
    while boxes:
        top = boxes.pop(0)
        kept.append(top)
        boxes = [b for b in boxes
                 if b[0] != top[0] or _oracle_iou(top[2:], b[2:]) < iou_th]
    return np.array(kept).reshape(-1, 6)


def _oracle_map(gts, dets, num_classes, iou_th=0.5):
    """Plain per-class greedy VOC mAP: gts/dets are lists per image of
    [cls, conf, cx, cy, w, h] rows."""
    eps = 1e-6
    aps = []
    for c in range(num_classes):
        class_gts = {i: [g for g in img if int(g[0]) == c]
                     for i, img in enumerate(gts)}
        total_true = sum(len(v) for v in class_gts.values())
        if total_true == 0:
            aps.append(0.0)
            continue
        class_dets = [(i, d) for i, img in enumerate(dets)
                      for d in img if int(d[0]) == c]
        class_dets.sort(key=lambda t: -t[1][1])
        matched = {i: [False] * len(v) for i, v in class_gts.items()}
        tp, fp = [], []
        for i, d in class_dets:
            best, best_j = 0.0, -1
            for j, g in enumerate(class_gts.get(i, [])):
                iou = _oracle_iou(d[2:], g[2:])
                if iou > best:
                    best, best_j = iou, j
            if best > iou_th and not matched[i][best_j]:
                matched[i][best_j] = True
                tp.append(1.0); fp.append(0.0)
            else:
                tp.append(0.0); fp.append(1.0)
        tpc, fpc = np.cumsum(tp), np.cumsum(fp)
        rec = np.concatenate([[0.0], tpc / (total_true + eps)])
        prec = np.concatenate([[1.0], tpc / (tpc + fpc + eps)])
        trapz = getattr(np, "trapezoid", None) or np.trapz  # numpy<2 compat
        aps.append(float(trapz(prec, rec)))
    return float(np.mean(aps))


def _random_boxes(rng, n, num_classes, clustered=True):
    base = rng.uniform(0.15, 0.85, size=(6, 2))
    cls = rng.randint(0, num_classes, size=(n,)).astype(np.float32)
    conf = rng.uniform(0, 1, size=(n,)).astype(np.float32)
    if clustered:
        centers = base[rng.randint(0, 6, size=(n,))] + rng.normal(0, 0.04, (n, 2))
    else:
        centers = rng.uniform(0.1, 0.9, size=(n, 2))
    wh = rng.uniform(0.05, 0.3, size=(n, 2))
    return np.concatenate(
        [cls[:, None], conf[:, None], centers, wh], axis=1).astype(np.float32)


def test_fuzz_nms_vs_oracle():
    for seed in range(15):
        rng = np.random.RandomState(seed)
        boxes = _random_boxes(rng, rng.randint(5, 49), num_classes=4)
        out, valid = non_max_suppression(jnp.asarray(boxes))
        got = np.asarray(out)[np.asarray(valid)]
        want = _oracle_nms([list(b) for b in boxes])
        assert got.shape == want.shape, (seed, got.shape, want.shape)
        if len(want):
            np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_fuzz_map_vs_oracle():
    for seed in range(10):
        rng = np.random.RandomState(100 + seed)
        num_classes = rng.randint(2, 6)
        num_images = rng.randint(1, 5)
        gts, dets = [], []
        G, D = 6, 10
        gt_arr = np.zeros((num_images, G, 6), np.float32)
        gt_val = np.zeros((num_images, G), bool)
        det_arr = np.zeros((num_images, D, 6), np.float32)
        det_val = np.zeros((num_images, D), bool)
        for i in range(num_images):
            ng = rng.randint(0, G + 1)
            nd = rng.randint(0, D + 1)
            g = _random_boxes(rng, ng, num_classes)
            g[:, 1] = 1.0
            # some detections perturb GTs (TPs), the rest are random (FPs)
            d = _random_boxes(rng, nd, num_classes, clustered=False)
            for k in range(min(ng, nd) // 2):
                d[k] = g[k]
                d[k, 1] = rng.uniform(0.5, 1.0)
                d[k, 2:4] += rng.normal(0, 0.01, 2)
            gts.append([list(x) for x in g])
            dets.append([list(x) for x in d])
            gt_arr[i, :ng], gt_val[i, :ng] = g, True
            det_arr[i, :nd], det_val[i, :nd] = d, True
        got = float(mean_average_precision(
            jnp.asarray(gt_arr), jnp.asarray(gt_val),
            jnp.asarray(det_arr), jnp.asarray(det_val), int(num_classes)))
        want = _oracle_map(gts, dets, int(num_classes))
        assert np.isclose(got, want, rtol=1e-4, atol=1e-5), (seed, got, want)
