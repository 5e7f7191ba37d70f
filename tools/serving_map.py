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
                   choices=("hard", "soft_gaussian", "soft_linear", "fast"),
                   default=None)
    p.add_argument("--conf-threshold", type=float, default=None)
    p.add_argument("--map-iou", type=float, default=0.5)
    p.add_argument("--avg-ckpts", type=int, default=0)
    p.add_argument("--use-ema", action="store_true")
    p.add_argument("--serving", choices=("float", "int8"), default="float",
                   help="score the float InferenceModel (default) or the "
                        "true-int8 serving path (export/int8_serving.py)")
    p.add_argument("--calib-images", type=int, default=0, metavar="N",
                   help="for --serving int8: static activation scales "
                        "MSE-calibrated on N images from --data")
    p.add_argument("--bias-correct", action="store_true",
                   help="for --serving int8 with --calib-images: also fold "
                        "the mean per-channel quantization error into biases")
    p.add_argument("--qat-steps", type=int, default=0,
                   help="for --serving int8 with --calib-images: QAT "
                        "fake-quant distillation steps before freezing")
    p.add_argument("--latency", nargs="?", const="", default=None,
                   metavar="BATCHES",
                   help="also measure fused serving p50 + pipelined device "
                        "time on the same model; bare flag = batch 1 and "
                        "--batch-size, or a comma list (e.g. --latency 32) "
                        "to skip compiles for sizes you don't need")
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

    ds = YoloDataset(args.data, cfg.model.image_size, args.batch_size,
                     max_boxes=args.max_boxes, shuffle=False,
                     drop_remainder=False, letterbox=cfg.data.letterbox)
    if args.serving == "int8":
        from keras_object_detection_tpu.export.int8_serving import (
            Int8InferenceModel)

        calib = None
        if args.calib_images:
            calib = []
            for bi, (images, _, _) in enumerate(ds.epoch()):
                real = min(len(images), ds.num_examples - bi * ds.batch_size)
                calib.extend(images[:real])
                if len(calib) >= args.calib_images:
                    break
            calib = np.stack(calib[:args.calib_images])
        elif args.bias_correct or args.qat_steps:
            raise SystemExit("error: --bias-correct/--qat-steps need "
                             "--calib-images")
        model = Int8InferenceModel(
            cfg, jax.device_get(params),  # EMA-aware selection
            jax.device_get(state.batch_stats), calib_images=calib,
            bias_correct=args.bias_correct, qat_steps=args.qat_steps)
    else:
        model = InferenceModel(cfg, params, state.batch_stats)
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
    out = {
        "serving_mAP": round(value, 4),
        "images": ds.num_examples,
        "map_iou": args.map_iou,
        "serving": args.serving,
        "tta": cfg.eval.tta,
        "nms_mode": cfg.eval.nms_mode,
        "conf_threshold": cfg.eval.conf_threshold,
        "max_candidates": cfg.eval.max_candidates,
        "avg_ckpts": args.avg_ckpts,
        "use_ema": bool(args.use_ema),
    }
    if args.serving == "int8":
        out["calib_images"] = int(args.calib_images)
        out["bias_correct"] = bool(args.bias_correct)
        out["qat_steps"] = int(args.qat_steps)
    if args.latency is not None:
        size = cfg.model.image_size
        lat_batches = ([int(x) for x in args.latency.split(",")]
                       if args.latency else [1, args.batch_size])
        for b in lat_batches:
            probe = np.zeros((b, size, size, 3), np.uint8)
            lat = model.benchmark_latency(probe, runs=10, pipeline_k=32)
            out[f"fused_p50_ms_b{b}"] = round(lat["p50_ms"], 3)
            out[f"fused_min_ms_b{b}"] = round(lat["min_ms"], 3)
            # device-time upper bound (async pipeline, one readback) — the
            # number an NMS-mode latency verdict should be judged on, free
            # of the ~25 ms relay dispatch RTT
            out[f"fused_device_ms_b{b}"] = round(
                lat["pipelined_per_call_ms"], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
