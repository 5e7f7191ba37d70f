#!/usr/bin/env python
"""Measure mAP of the SERVING path end-to-end on a labeled directory.

The in-training/Evaluator mAP path reproduces the reference metric
(parity semantics, hard NMS, GT-NMS quirk). This tool instead scores what
``evaluate.py`` actually SERVES — InferenceModel.predict with any serving
configuration: ``--tta hflip``, ``--nms-mode soft_*``, ``--avg-ckpts K``,
``--use-ema``, ``--conf-threshold`` — so serving-quality features get a
measured mAP instead of an assumed one. GTs are matched as-is
(no GT-NMS; the ``MeanAveragePrecision(nms_on_targets=False)`` convention).

Usage:
  python tools/serving_map.py --checkpoint-dir ckpt --data val/ \
      --tta hflip --avg-ckpts 3
Prints one JSON line with mAP + the serving configuration.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import dataclasses
import json


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint-dir", required=True)
    p.add_argument("--data", required=True, help="YOLO-format labeled dir")
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--max-boxes", type=int, default=32)
    p.add_argument("--tta", choices=("none", "hflip"), default=None)
    p.add_argument("--nms-mode",
                   choices=("hard", "soft_gaussian", "soft_linear"),
                   default=None)
    p.add_argument("--conf-threshold", type=float, default=None)
    p.add_argument("--map-iou", type=float, default=0.5)
    p.add_argument("--avg-ckpts", type=int, default=0)
    p.add_argument("--use-ema", action="store_true")
    args = p.parse_args()

    from keras_object_detection_tpu.utils.jax_cache import (
        enable_persistent_cache)

    enable_persistent_cache()
    import jax
    import numpy as np

    from keras_object_detection_tpu.config import Config
    from keras_object_detection_tpu.data.pipeline import YoloDataset
    from keras_object_detection_tpu.eval.evaluator import (
        InferenceModel, load_serving_state)
    from keras_object_detection_tpu.ops.map import mean_average_precision

    cfg = Config.from_json(
        open(os.path.join(args.checkpoint_dir, "config.json")).read())
    ev = cfg.eval
    if args.tta:
        ev = dataclasses.replace(ev, tta=args.tta)
    if args.nms_mode:
        ev = dataclasses.replace(ev, nms_mode=args.nms_mode)
    if args.conf_threshold is not None:
        ev = dataclasses.replace(ev, conf_threshold=args.conf_threshold)
    cfg = dataclasses.replace(cfg, eval=ev)

    state, params, _ = load_serving_state(
        cfg, args.checkpoint_dir, avg_ckpts=args.avg_ckpts,
        use_ema=args.use_ema)
    model = InferenceModel(cfg, params, state.batch_stats)

    ds = YoloDataset(args.data, cfg.model.image_size, args.batch_size,
                     max_boxes=args.max_boxes, shuffle=False,
                     drop_remainder=False, letterbox=cfg.data.letterbox)
    tb, tv, pb, pv = [], [], [], []
    seen = 0
    for images, boxes, valid in ds.epoch():
        dets, det_valid = model.predict(images)
        real = min(ds.num_examples - seen, images.shape[0])
        seen += real
        # GT layout [cls, conf, cx, cy, w, h] from the dataset's
        # [cx, cy, w, h, cls]; padded trailing images masked out entirely
        gt = np.concatenate(
            [boxes[..., 4:5], np.ones_like(boxes[..., :1]), boxes[..., :4]],
            axis=-1)
        row_ok = np.arange(images.shape[0]) < real
        tb.append(gt)
        tv.append(valid & row_ok[:, None])
        pb.append(dets)
        pv.append(det_valid & row_ok[:, None])

    value = float(mean_average_precision(
        np.concatenate(tb), np.concatenate(tv),
        np.concatenate(pb), np.concatenate(pv),
        cfg.grid.num_classes, args.map_iou))
    print(json.dumps({
        "serving_mAP": round(value, 4),
        "images": ds.num_examples,
        "map_iou": args.map_iou,
        "tta": cfg.eval.tta,
        "nms_mode": cfg.eval.nms_mode,
        "conf_threshold": cfg.eval.conf_threshold,
        "avg_ckpts": args.avg_ckpts,
        "use_ema": bool(args.use_ema),
    }))


if __name__ == "__main__":
    main()
