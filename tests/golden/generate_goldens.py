"""Generate golden parity fixtures by EXECUTING the reference implementation.

Run manually (requires TensorFlow, which the reference uses):

    python tests/golden/generate_goldens.py

This imports the reference modules from /root/reference/yolo_v1 (read-only)
and records their numeric outputs as JSON. No reference code is copied into
the framework — the goldens are pure data, used by tests to prove that the
TPU-native reimplementation is bit-comparable (SURVEY.md §4: the reference's
NumPy twins and smoke tensors serve as oracles).

Covered oracles:
- intersection_over_union        (ref utils.py:9-43)
- decode_predictions             (ref utils.py:152-218)
- non_max_suppression            (ref utils.py:79-114)
- YoloV1Loss                     (ref loss.py:100-215)
- MeanAveragePrecision           (ref utils.py:459-496)
"""

import json
import os
import pathlib
import sys

import numpy as np

sys.path.insert(0, "/root/reference/yolo_v1")
os.environ.setdefault("CUDA_VISIBLE_DEVICES", "-1")

import tensorflow as tf  # noqa: E402

from loss import YoloV1Loss  # noqa: E402
from utils import (  # noqa: E402
    MeanAveragePrecision,
    decode_predictions,
    intersection_over_union,
    non_max_suppression,
)

OUT = pathlib.Path(__file__).parent / "reference_goldens.json"


def smoke_grids(num_classes=3, num_boxes=2):
    """The exact smoke tensors from ref utils.py:716-754 __main__."""
    c = num_classes
    y_true = np.zeros((1, 7, 7, c + 5 * num_boxes), np.float32)
    for (i, j, cls) in [(0, 0, 0), (3, 3, 1), (6, 6, 2)]:
        y_true[:, i, j, cls] = 1
        y_true[:, i, j, c] = 1
        y_true[:, i, j, c + 1 : c + 5] = [0.5, 0.5, 0.1, 0.1]

    y_pred = np.zeros((1, 7, 7, c + 5 * num_boxes), np.float32)
    y_pred[:, 0, 0, :c] = [0.8, 0.5, 0.1]
    y_pred[:, 0, 0, c] = 0.6
    y_pred[:, 0, 0, c + 1 : c + 5] = [0.49, 0.49, 0.1, 0.1]
    y_pred[:, 0, 0, c + 5] = 0.2
    y_pred[:, 0, 0, c + 6 : c + 10] = [0.45, 0.45, 0.1, 0.1]
    y_pred[:, 3, 3, :c] = [0.2, 0.8, 0.1]
    y_pred[:, 3, 3, c] = 0.1
    y_pred[:, 3, 3, c + 1 : c + 5] = [0.45, 0.45, 0.1, 0.1]
    y_pred[:, 3, 3, c + 5] = 0.9
    y_pred[:, 3, 3, c + 6 : c + 10] = [0.49, 0.49, 0.1, 0.1]
    y_pred[:, 6, 6, :c] = [0.1, 0.5, 0.8]
    y_pred[:, 6, 6, c] = 0.6
    y_pred[:, 6, 6, c + 1 : c + 5] = [0.49, 0.49, 0.1, 0.1]
    y_pred[:, 6, 6, c + 5] = 0.2
    y_pred[:, 6, 6, c + 6 : c + 10] = [0.45, 0.45, 0.1, 0.1]
    return y_true, y_pred


def random_grid(rng, batch, num_classes, num_boxes, obj_prob=0.25):
    """A random-but-plausible prediction grid (small coords, mixed confs)."""
    depth = num_classes + 5 * num_boxes
    g = rng.uniform(-0.2, 1.0, size=(batch, 7, 7, depth)).astype(np.float32)
    return g


def random_target(rng, batch, num_classes, num_boxes, obj_prob=0.3):
    depth = num_classes + 5 * num_boxes
    t = np.zeros((batch, 7, 7, depth), np.float32)
    for b in range(batch):
        for i in range(7):
            for j in range(7):
                if rng.uniform() < obj_prob:
                    cls = rng.randint(num_classes)
                    t[b, i, j, cls] = 1
                    t[b, i, j, num_classes] = 1
                    t[b, i, j, num_classes + 1 : num_classes + 5] = rng.uniform(
                        [0, 0, 0.02, 0.02], [1, 1, 0.6, 0.6]
                    )
    return t


def main():
    rng = np.random.RandomState(0)
    goldens = {}

    # ---- IoU ----------------------------------------------------------------
    iou_cases = []
    for shape in [(6, 4), (2, 7, 7, 4), (5, 1, 4)]:
        b1 = rng.uniform(-0.1, 1.0, size=shape).astype(np.float32)
        b2 = rng.uniform(-0.1, 1.0, size=shape).astype(np.float32)
        out = intersection_over_union(tf.constant(b1), tf.constant(b2)).numpy()
        iou_cases.append({"boxes1": b1.tolist(), "boxes2": b2.tolist(),
                          "iou": out.tolist()})
    goldens["iou"] = iou_cases

    # ---- decode -------------------------------------------------------------
    y_true_s, y_pred_s = smoke_grids()
    decode_cases = []
    for grid_in, c, b in [
        (y_pred_s, 3, 2),
        (y_true_s, 3, 2),
        (random_grid(rng, 2, 3, 2), 3, 2),
        (random_grid(rng, 1, 20, 2), 20, 2),
        (random_grid(rng, 1, 5, 3), 5, 3),
    ]:
        out = decode_predictions(tf.constant(grid_in), c, b).numpy()
        decode_cases.append({"pred": grid_in.tolist(), "num_classes": c,
                             "num_boxes": b, "decoded": out.tolist()})
    goldens["decode"] = decode_cases

    # ---- NMS ----------------------------------------------------------------
    nms_cases = []
    decoded_smoke = decode_predictions(tf.constant(y_pred_s), 3, 2).numpy()
    inputs = [decoded_smoke[0]]
    for _ in range(3):
        # random decoded-box sets with clustered overlaps to exercise suppression
        n = 49
        base = rng.uniform(0.1, 0.9, size=(8, 2))
        cls = rng.randint(0, 3, size=(n,)).astype(np.float32)
        conf = rng.uniform(0, 1, size=(n,)).astype(np.float32)
        centers = base[rng.randint(0, 8, size=(n,))] + rng.normal(0, 0.03, size=(n, 2))
        wh = rng.uniform(0.05, 0.35, size=(n, 2))
        boxes = np.concatenate(
            [cls[:, None], conf[:, None], centers, wh], axis=1
        ).astype(np.float32)
        inputs.append(boxes)
    for boxes in inputs:
        out = non_max_suppression(tf.constant(boxes)).numpy()
        nms_cases.append({"boxes": boxes.tolist(), "kept": out.tolist()})
    goldens["nms"] = nms_cases

    # ---- loss ---------------------------------------------------------------
    loss_cases = []
    # exact smoke tensors from ref loss.py:218-237
    lt = np.zeros((1, 7, 7, 13), np.float32)
    lt[:, 0, 0, 2] = 1
    lt[:, 0, 0, 3] = 1
    lt[:, 0, 0, 4:8] = (0.5, 0.5, 0.1, 0.1)
    lp = np.zeros((1, 7, 7, 13), np.float32)
    lp[:, 0, 0, 2] = 0.6
    lp[:, 0, 0, 3] = 0.7
    lp[:, 0, 0, 4:8] = (0.49, 0.49, 0.09, 0.09)
    lp[:, 0, 0, 9] = 0.4
    lp[:, 0, 0, 9:13] = (0.45, 0.45, 0.09, 0.09)
    cases = [(lt, lp, 3, 2)]
    for c, b, batch in [(3, 2, 2), (20, 2, 4), (5, 3, 1)]:
        cases.append(
            (random_target(rng, batch, c, b), random_grid(rng, batch, c, b), c, b)
        )
    for y_true, y_pred, c, b in cases:
        loss = YoloV1Loss(num_classes=c, num_boxes=b)
        val = float(loss(tf.constant(y_true), tf.constant(y_pred)).numpy())
        loss_cases.append({"y_true": y_true.tolist(), "y_pred": y_pred.tolist(),
                           "num_classes": c, "num_boxes": b, "loss": val})
    goldens["loss"] = loss_cases

    # ---- mAP ----------------------------------------------------------------
    map_cases = []
    # smoke-tensor case from ref utils.py:765-769
    m = MeanAveragePrecision(3, 2)
    m.update_state(tf.constant(y_true_s), tf.constant(y_pred_s))
    map_cases.append({"y_true": [y_true_s.tolist()], "y_pred": [y_pred_s.tolist()],
                      "num_classes": 3, "num_boxes": 2,
                      "map": float(m.result().numpy())})
    # multi-batch random case
    m2 = MeanAveragePrecision(3, 2)
    batches = []
    for _ in range(2):
        yt = random_target(rng, 2, 3, 2)
        # predictions = noisy truth + random grid mix, so some TPs exist
        yp = 0.7 * yt + 0.45 * random_grid(rng, 2, 3, 2)
        yp = yp.astype(np.float32)
        m2.update_state(tf.constant(yt), tf.constant(yp))
        batches.append((yt, yp))
    map_cases.append({
        "y_true": [b[0].tolist() for b in batches],
        "y_pred": [b[1].tolist() for b in batches],
        "num_classes": 3, "num_boxes": 2,
        "map": float(m2.result().numpy()),
    })
    goldens["map"] = map_cases

    with open(OUT, "w") as f:
        json.dump(goldens, f)
    print(f"wrote {OUT} ({OUT.stat().st_size} bytes)")


if __name__ == "__main__":
    main()
