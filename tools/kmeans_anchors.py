#!/usr/bin/env python
"""Fit anchor priors to a labeled dataset with IoU k-means — YOLOv2's
"Dimension Clusters" (arXiv:1612.08242 §2; beyond parity, the reference is
anchor-free). Distance = 1 - IoU(box, centroid) with centers aligned, so
clusters optimize exactly what the anchor assignment uses
(core/anchors.py _shape_iou).

Usage:
  python tools/kmeans_anchors.py --data train/ --k 5
Prints one JSON line with the anchors (sorted by area), the mean best-IoU
("avg_iou", the metric the paper reports), and the train.py flag to paste:
  --head anchor --anchors "0.08,0.11;..."
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json

import numpy as np


def shape_iou(wh: np.ndarray, centroids: np.ndarray) -> np.ndarray:
    """(N, 2) x (K, 2) -> (N, K) IoU with centers aligned."""
    inter = (np.minimum(wh[:, None, 0], centroids[None, :, 0])
             * np.minimum(wh[:, None, 1], centroids[None, :, 1]))
    union = (wh[:, 0] * wh[:, 1])[:, None] \
        + (centroids[:, 0] * centroids[:, 1])[None, :] - inter
    return inter / np.maximum(union, 1e-12)


def kmeans_iou(wh: np.ndarray, k: int, iters: int = 100, seed: int = 0):
    """Standard k-means under the 1-IoU metric with median centroids (the
    darknet convention — medians are robust to the heavy wh tails)."""
    rng = np.random.RandomState(seed)
    # k-means++-style greedy farthest init under the IoU metric: a random
    # first centroid, then repeatedly the box LEAST similar to its nearest
    # centroid — a uniform random init can land all k seeds in one cluster
    # and the median update never splits them.
    centroids = wh[rng.choice(len(wh), 1)]
    while len(centroids) < k:
        best = np.max(shape_iou(wh, centroids), axis=1)
        centroids = np.concatenate([centroids, wh[[np.argmin(best)]]])
    assign = None
    for _ in range(iters):
        new_assign = np.argmax(shape_iou(wh, centroids), axis=1)
        if assign is not None and (new_assign == assign).all():
            break
        assign = new_assign
        for j in range(k):
            members = wh[assign == j]
            if len(members):
                centroids[j] = np.median(members, axis=0)
    avg_iou = float(np.max(shape_iou(wh, centroids), axis=1).mean())
    order = np.argsort(centroids[:, 0] * centroids[:, 1])
    return centroids[order], avg_iou


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data", required=True, help="YOLO-format labeled dir")
    p.add_argument("--k", type=int, default=5,
                   help="number of anchors (YOLOv2 uses 5)")
    p.add_argument("--iters", type=int, default=100)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    from keras_object_detection_tpu.data.reader import (
        list_examples, read_yolo_labels)

    whs = []
    for path in list_examples(args.data):
        rows = read_yolo_labels(os.path.splitext(path)[0] + ".txt")
        if len(rows):
            whs.append(rows[:, 2:4])
    if not whs:
        raise SystemExit(f"error: no labeled boxes under {args.data}")
    wh = np.concatenate(whs)
    if len(wh) < args.k:
        raise SystemExit(f"error: {len(wh)} boxes < k={args.k}")

    anchors, avg_iou = kmeans_iou(wh, args.k, args.iters, args.seed)
    flag = ";".join(f"{w:.4f},{h:.4f}" for w, h in anchors)
    print(json.dumps({
        "anchors": [[round(float(w), 4), round(float(h), 4)]
                    for w, h in anchors],
        "avg_iou": round(avg_iou, 4),
        "boxes": int(len(wh)),
        "k": args.k,
        "train_flag": f'--head anchor --anchors "{flag}"',
    }))


if __name__ == "__main__":
    main()
