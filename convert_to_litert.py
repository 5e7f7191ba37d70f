#!/usr/bin/env python
"""Export CLI (public-surface parity with ref yolo_v1/convert_to_tflite.py):
checkpoint -> LiteRT (.tflite) flatbuffer, with the full-int8 PTQ recipe the
reference left commented out, plus a TF-free StableHLO path.

Examples:
  python convert_to_litert.py --checkpoint-dir checkpoints --output model.tflite
  python convert_to_litert.py --checkpoint-dir checkpoints --output model.tflite --int8
  python convert_to_litert.py --checkpoint-dir checkpoints --output model.stablehlo --format stablehlo
"""

from __future__ import annotations

import argparse
import os


def main():
    p = argparse.ArgumentParser(description=__doc__,
                                formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument("--checkpoint-dir", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--format", choices=["tflite", "stablehlo"], default="tflite")
    p.add_argument("--int8", action="store_true",
                   help="full-int8 PTQ with a representative dataset")
    p.add_argument("--calib-dir",
                   help="YOLO-format dir for int8 calibration images "
                        "(default: random data, ref convert_to_tflite.py:9-13)")
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--bench", action="store_true",
                   help="time the exported LiteRT model (inference latency "
                        "bench, BASELINE config 5)")
    p.add_argument("--bench-runs", type=int, default=20)
    args = p.parse_args()

    import jax

    from keras_object_detection_tpu.utils.jax_cache import enable_persistent_cache

    enable_persistent_cache()

    from keras_object_detection_tpu.config import Config
    from keras_object_detection_tpu.export.litert import (
        export_stablehlo, export_tflite)
    from keras_object_detection_tpu.train.checkpoint import CheckpointManager
    from keras_object_detection_tpu.train.loop import create_train_state

    cfg = Config.from_json(
        open(os.path.join(args.checkpoint_dir, "config.json")).read())
    template = jax.device_get(create_train_state(cfg, jax.random.PRNGKey(0)))
    ckpt = CheckpointManager(args.checkpoint_dir)
    state = ckpt.restore(template)
    print(f"restored checkpoint step={int(state.step)}")

    if args.format == "stablehlo":
        blob = export_stablehlo(cfg, state.params, state.batch_stats,
                                args.output, batch_size=args.batch_size)
    else:
        rep = None
        if args.calib_dir:
            from keras_object_detection_tpu.data.pipeline import YoloDataset

            ds = YoloDataset(args.calib_dir, cfg.model.image_size, 1)

            def rep():
                import numpy as np

                for images, _, _ in ds.epoch():
                    yield [images[:1].astype(np.float32) / 255.0]

        blob = export_tflite(cfg, state.params, state.batch_stats, args.output,
                             quantize_int8=args.int8,
                             representative_dataset=rep,
                             batch_size=args.batch_size)
    print(f"wrote {args.output} ({len(blob)} bytes)")

    if args.bench and args.format == "tflite":
        import time

        import numpy as np
        import tensorflow as tf

        interp = tf.lite.Interpreter(model_content=blob)
        interp.allocate_tensors()
        inp = interp.get_input_details()[0]
        rng = np.random.RandomState(0)
        if inp["dtype"] == np.uint8:
            x = rng.randint(0, 255, size=inp["shape"], dtype=np.uint8)
        else:
            x = rng.rand(*inp["shape"]).astype(np.float32)
        interp.set_tensor(inp["index"], x)
        interp.invoke()  # warmup
        times = []
        for _ in range(args.bench_runs):
            t0 = time.perf_counter()
            interp.set_tensor(inp["index"], x)
            interp.invoke()
            times.append((time.perf_counter() - t0) * 1000)
        times.sort()
        kind = "int8" if args.int8 else "float"
        print(f"LiteRT {kind} inference: p50 {times[len(times)//2]:.2f} ms "
              f"(min {times[0]:.2f}, batch {inp['shape'][0]}, CPU)")
    ckpt.close()


if __name__ == "__main__":
    main()
