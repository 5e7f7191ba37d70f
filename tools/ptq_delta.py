#!/usr/bin/env python
"""Measure the int8 post-training-quantization mAP delta on a trained
checkpoint — the validation the reference never ran on its own commented-out
int8 recipe (ref convert_to_tflite.py:17-30).

Two quantization paths are measured against the float baseline on the same
validation set:
- JAX-native int8 weight quantization (export/quantize.py): per-channel
  symmetric int8 weights dequantized inside the jitted forward,
- LiteRT full-int8 PTQ (export/litert.py): activations AND weights int8,
  uint8 I/O, calibrated on real validation images.

Usage (after tools/run_synth_benchmark.py):
  python tools/ptq_delta.py --workdir /tmp/synth_run --data /tmp/synth/val

Writes ``<workdir>/ptq_delta.json``.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--workdir", required=True,
                   help="run dir containing ckpt/ (with config.json)")
    p.add_argument("--data", required=True, help="validation YOLO-format dir")
    p.add_argument("--skip-litert", action="store_true")
    p.add_argument("--int8-serving", action="store_true",
                   help="also evaluate the true int8 serving path "
                        "(BN-fold + s8xs8->s32 convs, export/int8_serving.py)")
    p.add_argument("--int8-float-tail", type=int, default=0,
                   help="keep the LAST N folded convs in f32 (mixed-"
                        "precision sensitivity knob for --int8-serving)")
    p.add_argument("--calibrate", type=int, default=0,
                   help="for --int8-serving: ALSO evaluate with static "
                        "activation scales MSE-calibrated on this many "
                        "validation images (export/int8_serving.py "
                        "calibrate_activation_scales — the reference's "
                        "commented representative_dataset recipe, ref "
                        "convert_to_tflite.py:9-13, made measurable)")
    p.add_argument("--qat", type=int, default=0, metavar="STEPS",
                   help="with --calibrate: ALSO evaluate after a QAT "
                        "fake-quant distillation fine-tune of this many "
                        "steps (export/qat.py)")
    p.add_argument("--qat-lr", type=float, default=1e-5)
    args = p.parse_args()
    if args.qat and not args.calibrate:
        p.error("--qat needs --calibrate N (the QAT arm fine-tunes on the "
                "calibration images)")

    from keras_object_detection_tpu.utils.jax_cache import (
        enable_persistent_cache)

    enable_persistent_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from keras_object_detection_tpu.config import Config
    from keras_object_detection_tpu.data.pipeline import YoloDataset
    from keras_object_detection_tpu.core.grid import encode_grid
    from keras_object_detection_tpu.eval.evaluator import Evaluator
    from keras_object_detection_tpu.export.quantize import (
        dequantize_params, quantize_params, quantized_size_bytes)
    from keras_object_detection_tpu.ops.map import MeanAveragePrecision
    from keras_object_detection_tpu.train.checkpoint import CheckpointManager
    from keras_object_detection_tpu.train.loop import create_train_state

    ckpt_dir = os.path.join(args.workdir, "ckpt")
    cfg = Config.from_json(open(os.path.join(ckpt_dir, "config.json")).read())
    template = jax.device_get(create_train_state(cfg, jax.random.PRNGKey(0)))
    mgr = CheckpointManager(ckpt_dir)
    state = mgr.restore(template)
    print(f"restored best checkpoint (epoch {mgr.best_step})")

    # Quantize what would actually be served: with EMA eval enabled, that is
    # ema_params — fold them into params and disable the evaluator's own EMA
    # swap, so float and int8 paths compare the SAME weights.
    if (cfg.train.ema_decay is not None and cfg.train.eval_with_ema
            and getattr(state, "ema_params", None) is not None):
        print("serving params: EMA")
        state = state.replace(params=state.ema_params)

    ds = YoloDataset(args.data, cfg.model.image_size, cfg.data.batch_size,
                     max_boxes=cfg.data.max_boxes_per_image)

    # --- float baseline ------------------------------------------------------
    float_eval = Evaluator(cfg, use_ema=False).evaluate(state, ds)
    print(f"float:     mAP {float_eval['mAP']:.4f}")

    # --- JAX int8 weight quantization ---------------------------------------
    qparams = quantize_params(state.params)
    qbytes, fbytes = quantized_size_bytes(qparams)
    deq_state = state.replace(params=jax.device_get(dequantize_params(qparams)))
    int8_eval = Evaluator(cfg, use_ema=False).evaluate(deq_state, ds)
    print(f"jax int8:  mAP {int8_eval['mAP']:.4f} "
          f"(weights {qbytes/1e6:.1f} MB vs {fbytes/1e6:.1f} MB f32)")

    # --- true int8 serving (BN-fold + s8xs8->s32 convs) ---------------------
    int8_serving_results = {}
    if args.int8_serving:
        from keras_object_detection_tpu.export.int8_serving import (
            Int8InferenceModel)

        def eval_int8(calib_images=None, **int8_kw):
            im = Int8InferenceModel(cfg, jax.device_get(state.params),
                                    jax.device_get(state.batch_stats),
                                    float_tail=args.int8_float_tail,
                                    calib_images=calib_images, **int8_kw)
            metric = MeanAveragePrecision(
                cfg.grid.num_classes, cfg.grid.num_boxes, cfg.grid.grid,
                iou_threshold=cfg.eval.iou_threshold,
                conf_threshold=cfg.eval.conf_threshold,
                map_iou_threshold=cfg.eval.map_iou_threshold)
            for bi, (images, boxes, valid) in enumerate(ds.epoch()):
                real = min(len(images), ds.num_examples - bi * ds.batch_size)
                images, boxes, valid = (images[:real], boxes[:real],
                                        valid[:real])
                y_true = jax.vmap(
                    lambda b, v: encode_grid(b, v, cfg.grid.num_classes,
                                             cfg.grid.num_boxes,
                                             cfg.grid.grid)
                )(jnp.asarray(boxes), jnp.asarray(valid))
                metric.update_state(np.asarray(y_true),
                                    np.asarray(im.predict_raw(images)))
            return metric.result(), im.memory_footprint()

        serving_map, fp = eval_int8()
        print(f"int8 serving: mAP {serving_map:.4f} "
              f"(weights {fp['quantized_bytes']/1e6:.1f} MB vs "
              f"{fp['float_bytes']/1e6:.1f} MB f32)")
        int8_serving_results = {
            "int8_serving_mAP": float(serving_map),
            "int8_serving_delta": float(serving_map - float_eval["mAP"]),
            "int8_serving_weight_mb": fp["quantized_bytes"] / 1e6,
            "int8_serving_float_tail": args.int8_float_tail,
        }
        if args.calibrate:
            calib = []
            for bi, (images, _, _) in enumerate(ds.epoch()):
                # exclude the zero-padded tail rows of the final short batch
                real = min(len(images), ds.num_examples - bi * ds.batch_size)
                calib.extend(images[:real])
                if len(calib) >= args.calibrate:
                    break
            calib = np.stack(calib[:args.calibrate])
            cal_map, _ = eval_int8(calib_images=calib)
            print(f"int8 serving (static calib on {len(calib)}): "
                  f"mAP {cal_map:.4f}")
            bc_dyn_map, _ = eval_int8(calib_images=calib, bias_correct=True,
                                      act_quant="dynamic")
            print(f"int8 serving (dynamic + bias-correct): "
                  f"mAP {bc_dyn_map:.4f}")
            bc_map, _ = eval_int8(calib_images=calib, bias_correct=True)
            print(f"int8 serving (static calib + bias-correct): "
                  f"mAP {bc_map:.4f}")
            int8_serving_results.update(
                int8_calibrated_mAP=float(cal_map),
                int8_calibrated_delta=float(cal_map - float_eval["mAP"]),
                int8_bias_corrected_dynamic_mAP=float(bc_dyn_map),
                int8_bias_corrected_dynamic_delta=float(
                    bc_dyn_map - float_eval["mAP"]),
                int8_bias_corrected_mAP=float(bc_map),
                int8_bias_corrected_delta=float(bc_map - float_eval["mAP"]),
                int8_calibration_images=int(len(calib)),
            )
            if args.qat:
                qat_map, _ = eval_int8(calib_images=calib,
                                       qat_steps=args.qat,
                                       qat_lr=args.qat_lr)
                print(f"int8 serving (static calib + QAT {args.qat} steps): "
                      f"mAP {qat_map:.4f}")
                int8_serving_results.update(
                    int8_qat_mAP=float(qat_map),
                    int8_qat_delta=float(qat_map - float_eval["mAP"]),
                    int8_qat_steps=int(args.qat),
                )

    results = {
        "float_mAP": float(float_eval["mAP"]),
        **int8_serving_results,
        "float_loss": float(float_eval["loss"]),
        "jax_int8_mAP": float(int8_eval["mAP"]),
        "jax_int8_delta": float(int8_eval["mAP"] - float_eval["mAP"]),
        "jax_int8_weight_mb": qbytes / 1e6,
        "float_weight_mb": fbytes / 1e6,
        "val_images": ds.num_examples,
    }

    # --- LiteRT full-int8 PTQ ------------------------------------------------
    if not args.skip_litert:
        from keras_object_detection_tpu.export.litert import export_tflite

        size = cfg.model.image_size

        def rep_dataset():
            # calibrate on real validation images (stronger than the
            # reference's random-uniform recipe, ref convert_to_tflite.py:9-13)
            n = 0
            for images, _, _ in ds.epoch():
                for img in images:
                    yield [img[None].astype(np.float32) / 255.0]
                    n += 1
                    if n >= 100:
                        return

        path = os.path.join(args.workdir, "model_int8.tflite")
        export_tflite(cfg, jax.device_get(state.params),
                      jax.device_get(state.batch_stats), path,
                      quantize_int8=True, representative_dataset=rep_dataset)

        import tensorflow as tf

        interp = tf.lite.Interpreter(model_path=path)
        interp.allocate_tensors()
        inp = interp.get_input_details()[0]
        out = interp.get_output_details()[0]
        oscale, ozero = out["quantization"]
        iscale, izero = inp["quantization"]

        metric = MeanAveragePrecision(
            cfg.grid.num_classes, cfg.grid.num_boxes, cfg.grid.grid,
            iou_threshold=cfg.eval.iou_threshold,
            conf_threshold=cfg.eval.conf_threshold,
            map_iou_threshold=cfg.eval.map_iou_threshold)
        n_done = 0
        for bi, (images, boxes, valid) in enumerate(ds.epoch()):
            # trim zero-padded trailing images of the final partial batch so
            # the int8 metric sees exactly the images the float baseline saw
            real = min(len(images), ds.num_examples - bi * ds.batch_size)
            images, boxes, valid = images[:real], boxes[:real], valid[:real]
            y_true = jax.vmap(
                lambda b, v: encode_grid(b, v, cfg.grid.num_classes,
                                         cfg.grid.num_boxes, cfg.grid.grid)
            )(jnp.asarray(boxes), jnp.asarray(valid))
            preds = []
            for img in images:
                if inp["dtype"] == np.uint8:
                    # uint8 input: q = round(float/iscale) + izero with
                    # float = u8/255
                    q = np.clip(np.round((img.astype(np.float32) / 255.0)
                                         / iscale + izero), 0, 255
                                ).astype(np.uint8)
                else:
                    q = img[None].astype(np.float32) / 255.0
                interp.set_tensor(inp["index"], q[None] if q.ndim == 3 else q)
                interp.invoke()
                y = interp.get_tensor(out["index"]).astype(np.float32)
                if out["dtype"] == np.uint8:
                    y = (y - ozero) * oscale
                preds.append(y[0])
            metric.update_state(np.asarray(y_true), np.stack(preds))
            n_done += len(images)
        litert_map = metric.result()
        print(f"litert int8: mAP {litert_map:.4f} ({n_done} images)")
        results.update(
            litert_int8_mAP=float(litert_map),
            litert_int8_delta=float(litert_map - float_eval["mAP"]),
            litert_model_mb=os.path.getsize(path) / 1e6,
        )

    mgr.close()
    with open(os.path.join(args.workdir, "ptq_delta.json"), "w") as f:
        json.dump(results, f, indent=2)
    print("RESULTS", json.dumps(results))


if __name__ == "__main__":
    main()
