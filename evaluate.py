#!/usr/bin/env python
"""Inference / evaluation CLI (public-surface parity with
ref yolo_v1/evaluate.py: load best checkpoint, fused forward+decode+NMS,
latency micro-benchmark, tagged-image output; plus dataset-level mAP).

Examples:
  # tag one image and benchmark serving latency
  python evaluate.py --checkpoint-dir checkpoints --image data/test.jpg \
      --names data/test.names --output tagged.jpg

  # dataset loss + mAP
  python evaluate.py --checkpoint-dir checkpoints --data-dir voc/test
"""

from __future__ import annotations

import argparse
import os


def main():
    p = argparse.ArgumentParser(description=__doc__,
                                formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument("--checkpoint-dir", required=True)
    p.add_argument("--data-dir", help="YOLO-format dir for dataset evaluation")
    p.add_argument("--image", help="single image to tag")
    p.add_argument("--image-dir",
                   help="batch inference over every *.jpg in a directory "
                        "(no labels needed): detections land in "
                        "--detections-json, tagged copies in --tag-dir")
    p.add_argument("--detections-json", default="detections.json",
                   help="output path for --image-dir per-image detections")
    p.add_argument("--tag-dir",
                   help="with --image-dir and --names: write tagged copies "
                        "of every image here")
    p.add_argument("--names", help="class-names file for tagging")
    p.add_argument("--output", default="tagged.jpg")
    p.add_argument("--grid-overlay", action="store_true",
                   help="draw the SxS lattice (ref get_grid_tagged_img)")
    p.add_argument("--latency-runs", type=int, default=5)
    p.add_argument("--cache-dir",
                   help="decode-ahead disk cache dir for --data-dir eval")
    p.add_argument("--coco-map", action="store_true",
                   help="also report COCO-style mAP@[.50:.95] (per-threshold "
                        "sweep; the reference only evaluates VOC mAP@0.5)")
    p.add_argument("--data-parallel", type=int, default=1,
                   help="evaluate the dataset data-parallel over this many "
                        "chips (-1 = all; batches land sharded over the mesh "
                        "data axis, parameters replicate)")
    p.add_argument("--pr-json", metavar="PATH",
                   help="with --data-dir: dump per-class precision/recall "
                        "curves (threshold-tuning data the reference "
                        "discards) to this JSON file")
    p.add_argument("--error-analysis", action="store_true",
                   help="with --data-dir: TIDE-style breakdown of every "
                        "detection (tp/duplicate/classification/localization/"
                        "both/background + missed GTs, per class)")
    p.add_argument("--per-class-ap", action="store_true",
                   help="also print the per-class AP breakdown (labels from "
                        "--names when given; the reference reduces straight "
                        "to the mean, ref utils.py:455-456)")
    p.add_argument("--use-ema", action="store_true",
                   help="serve the EMA parameters when the checkpoint has them")
    p.add_argument("--nms-mode", choices=("hard", "soft_gaussian", "soft_linear", "fast"),
                   default=None,
                   help="override EvalConfig.nms_mode for serving: hard = "
                        "the reference's greedy NMS; soft_* = Soft-NMS "
                        "(confidence decay instead of deletion); fast = "
                        "one-shot matrix NMS (YOLACT), no sequential loop")
    p.add_argument("--soft-nms-sigma", type=float, default=None,
                   help="gaussian Soft-NMS decay scale (EvalConfig.soft_nms_sigma)")
    p.add_argument("--avg-ckpts", type=int, metavar="K", default=0,
                   help="serve the uniform average of the newest K retained "
                        "checkpoints (SWA-style) instead of the single best")
    p.add_argument("--tta", choices=("none", "hflip"), default=None,
                   help="test-time augmentation for serving: hflip forwards "
                        "the mirror too and NMS merges the union "
                        "(EvalConfig.tta)")
    p.add_argument("--serving", choices=("float", "int8", "auto"),
                   default="float",
                   help="single-image serving path: float (default), true-"
                        "int8 (BN-fold + s8 convs), or auto (measure both "
                        "at batch 1 and serve the faster)")
    p.add_argument("--calib-images", type=int, default=0, metavar="N",
                   help="for --serving int8/auto with --data-dir: calibrate "
                        "static activation scales on N dataset images "
                        "(export/int8_serving.py)")
    p.add_argument("--qat-steps", type=int, default=0, metavar="STEPS",
                   help="with --calib-images: QAT fake-quant distillation "
                        "fine-tune before freezing to int8 (export/qat.py)")
    args = p.parse_args()

    import jax

    from keras_object_detection_tpu.utils.jax_cache import enable_persistent_cache

    enable_persistent_cache()
    import numpy as np

    from keras_object_detection_tpu.config import Config
    from keras_object_detection_tpu.data.reader import load_example
    from keras_object_detection_tpu.data.pipeline import YoloDataset
    from keras_object_detection_tpu.eval.evaluator import Evaluator, InferenceModel
    from keras_object_detection_tpu.utils.viz import get_grid_tagged_img, get_tagged_img

    cfg_path = os.path.join(args.checkpoint_dir, "config.json")
    if not os.path.exists(cfg_path):
        raise SystemExit(f"error: {cfg_path} not found (written by train.py)")
    cfg = Config.from_json(open(cfg_path).read())
    if args.nms_mode or args.soft_nms_sigma is not None or args.tta:
        import dataclasses

        ev = cfg.eval
        if args.nms_mode:
            ev = dataclasses.replace(ev, nms_mode=args.nms_mode)
        if args.soft_nms_sigma is not None:
            ev = dataclasses.replace(ev, soft_nms_sigma=args.soft_nms_sigma)
        if args.tta:
            ev = dataclasses.replace(ev, tta=args.tta)
        cfg = dataclasses.replace(cfg, eval=ev)

    from keras_object_detection_tpu.eval.evaluator import load_serving_state

    try:  # best checkpoint / newest-K average / EMA (ref evaluate.py:21)
        state, params, info = load_serving_state(
            cfg, args.checkpoint_dir, avg_ckpts=args.avg_ckpts,
            use_ema=args.use_ema)
    except ValueError as exc:
        raise SystemExit(f"error: {exc}")
    print(f"restored checkpoint: {info}")
    if args.serving == "float":
        if args.calib_images or args.qat_steps:
            raise SystemExit("error: --calib-images/--qat-steps configure "
                             "int8 serving; add --serving int8 (or auto)")
        model = InferenceModel(cfg, params, state.batch_stats)
    else:
        from keras_object_detection_tpu.export.int8_serving import (
            select_serving_model)

        calib = None
        if args.calib_images:
            if not args.data_dir:
                raise SystemExit("error: --calib-images needs --data-dir")
            cal_ds = YoloDataset(args.data_dir, cfg.model.image_size,
                                 batch_size=min(args.calib_images, 32),
                                 max_boxes=cfg.data.max_boxes_per_image,
                                 letterbox=cfg.data.letterbox)
            stack = []
            for bi, (images, _, _) in enumerate(cal_ds.epoch()):
                # drop the zero-padded tail rows of the final short batch —
                # black frames would skew the calibration distribution
                real = min(len(images),
                           cal_ds.num_examples - bi * cal_ds.batch_size)
                stack.extend(images[:real])
                if len(stack) >= args.calib_images:
                    break
            calib = np.stack(stack[:args.calib_images])
            print(f"int8 calibration set: {len(calib)} images")
        elif args.qat_steps:
            raise SystemExit("error: --qat-steps needs --calib-images")
        model, info = select_serving_model(cfg, params, state.batch_stats,
                                           mode=args.serving,
                                           calib_images=calib,
                                           qat_steps=args.qat_steps)
        print(f"serving path: {info}")

    if args.image:
        img, _, _ = load_example(args.image, cfg.model.image_size,
                                 cfg.data.max_boxes_per_image,
                                 letterbox=cfg.data.letterbox)
        lat = model.benchmark_latency(img[None], runs=args.latency_runs)
        print(f"fused forward+decode+NMS: p50 {lat['p50_ms']:.2f} ms "
              f"(min {lat['min_ms']:.2f}, mean {lat['mean_ms']:.2f}, batch 1)")
        staged = model.benchmark_latency(img[None], runs=args.latency_runs,
                                         staged=True)
        print(f"staged model->decode->NMS:  p50 {staged['p50_ms']:.2f} ms "
              f"(the reference's two-variant comparison, ref evaluate.py:37-47)")
        kept = model.predict_single(img)
        printed = kept
        if cfg.data.letterbox and len(kept):
            # report in ratios of the ORIGINAL photo (the tagged image below
            # stays in the letterboxed frame it is drawn on)
            from PIL import Image

            from keras_object_detection_tpu.data.reader import (
                unletterbox_detections)

            w0, h0 = Image.open(args.image).size
            printed = unletterbox_detections(kept, h0, w0,
                                             cfg.model.image_size)
        print(f"detections ({len(kept)}):")
        for b in printed:
            print(f"  class={int(b[0])} conf={b[1]:.3f} "
                  f"box=({b[2]:.3f}, {b[3]:.3f}, {b[4]:.3f}, {b[5]:.3f})")
        if args.names:
            draw = get_grid_tagged_img if args.grid_overlay else get_tagged_img
            tagged = draw(img.copy(), kept, args.names)
            try:
                import cv2

                cv2.imwrite(args.output, cv2.cvtColor(tagged, cv2.COLOR_RGB2BGR))
            except ImportError:
                from PIL import Image

                Image.fromarray(tagged).save(args.output)
            print(f"wrote {args.output}")

    if args.image_dir:
        import glob
        import json

        paths = sorted(glob.glob(os.path.join(args.image_dir, "*.jpg")))
        if not paths:
            raise SystemExit(f"error: no *.jpg under {args.image_dir}")
        if args.tag_dir:
            os.makedirs(args.tag_dir, exist_ok=True)
        bs = cfg.data.batch_size
        detections = {}
        for start in range(0, len(paths), bs):
            chunk = paths[start:start + bs]
            imgs = np.stack([load_example(p, cfg.model.image_size,
                                          cfg.data.max_boxes_per_image,
                                          letterbox=cfg.data.letterbox)[0]
                             for p in chunk])
            # pad the final partial batch so the jitted program keeps ONE
            # static shape (a second compile costs more than the padded rows)
            if len(chunk) < bs:
                imgs = np.concatenate(
                    [imgs, np.zeros((bs - len(chunk),) + imgs.shape[1:],
                                    imgs.dtype)])
            boxes, valid = model.predict(imgs)
            for i, path in enumerate(chunk):
                kept = boxes[i][valid[i]]
                # box_cxcywh is ALWAYS in ratios of the ORIGINAL photo: the
                # square resize preserves ratios as-is; the letterbox path
                # inverts the pad/scale placement per image
                report = kept
                if cfg.data.letterbox and len(kept):
                    from PIL import Image

                    from keras_object_detection_tpu.data.reader import (
                        unletterbox_detections)

                    w0, h0 = Image.open(path).size  # header-only read
                    report = unletterbox_detections(
                        kept, h0, w0, cfg.model.image_size)
                detections[os.path.basename(path)] = [
                    {"class": int(b[0]), "confidence": round(float(b[1]), 4),
                     "box_cxcywh": [round(float(v), 5) for v in b[2:6]]}
                    for b in report]
                if args.tag_dir and args.names:
                    draw = (get_grid_tagged_img if args.grid_overlay
                            else get_tagged_img)
                    tagged = draw(imgs[i].copy(), kept, args.names)
                    out_path = os.path.join(args.tag_dir,
                                            os.path.basename(path))
                    try:
                        import cv2

                        cv2.imwrite(out_path,
                                    cv2.cvtColor(tagged, cv2.COLOR_RGB2BGR))
                    except ImportError:
                        from PIL import Image

                        Image.fromarray(tagged).save(out_path)
        with open(args.detections_json, "w") as f:
            json.dump(detections, f, indent=1)
        n_det = sum(len(v) for v in detections.values())
        print(f"wrote {args.detections_json}: {n_det} detections over "
              f"{len(paths)} images"
              + (f", tagged copies in {args.tag_dir}" if args.tag_dir else ""))

    if args.data_dir:
        ds = YoloDataset(args.data_dir, cfg.model.image_size,
                         cfg.data.batch_size,
                         max_boxes=cfg.data.max_boxes_per_image,
                         cache_dir=args.cache_dir,
                         letterbox=cfg.data.letterbox)
        # --use-ema is the single source of truth here, matching the
        # single-image path above (config eval_with_ema only governs
        # in-training validation).
        mesh = None
        if args.data_parallel != 1:
            from keras_object_detection_tpu.parallel.mesh import create_mesh

            # N > 0 takes the first N chips; -1 takes them all.
            devs = (jax.devices() if args.data_parallel == -1
                    else jax.devices()[:args.data_parallel])
            mesh = create_mesh(data_parallel=len(devs), devices=devs)
        evaluator = Evaluator(cfg, use_ema=args.use_ema, mesh=mesh)
        results = evaluator.evaluate(state, ds, coco_map=args.coco_map)
        print("evaluation:", {k: round(float(v), 5) for k, v in results.items()})
        if args.per_class_ap:
            names = ([x.strip() for x in open(args.names)]
                     if args.names else None)
            aps = evaluator.map_metric.result_per_class()
            print("per-class AP@%.2f:" % cfg.eval.map_iou_threshold)
            for c, ap in enumerate(aps):
                label = names[c] if names and c < len(names) else str(c)
                print(f"  {label:>16s}  {ap:.4f}")
        if args.error_analysis:
            from keras_object_detection_tpu.ops.error_analysis import (
                format_error_table)

            names = ([x.strip() for x in open(args.names)]
                     if args.names else None)
            report = evaluator.map_metric.result_error_analysis()
            print(format_error_table(report, names))
        if args.pr_json:
            import json

            curves = evaluator.map_metric.result_pr_curves()
            if args.names:
                labels = [x.strip() for x in open(args.names)]
                curves = {labels[c] if c < len(labels) else str(c): v
                          for c, v in curves.items()}
            with open(args.pr_json, "w") as f:
                json.dump(curves, f, indent=1)
            print(f"wrote per-class PR curves to {args.pr_json}")


if __name__ == "__main__":
    main()
