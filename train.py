#!/usr/bin/env python
"""Training CLI (public-surface parity with ref yolo_v1/train.py and the
ref yolo_v1.py __main__ working pipeline, as a real config-driven entry point
instead of module-level constants).

Examples:
  # BASELINE config 1: CPU-runnable tiny model on a small YOLO-format dir
  python train.py --data-dir data/ --preset tiny --epochs 5

  # BASELINE config 2: full 448 Darknet-24 on VOC
  python train.py --train-dir voc/train --val-dir voc/val --test-dir voc/test \
      --preset voc --batch-size 64 --epochs 1000
"""

from __future__ import annotations

import argparse
import dataclasses
import os


def parse_args():
    p = argparse.ArgumentParser(description=__doc__,
                                formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument("--data-dir", help="single dir used for train/val/test")
    p.add_argument("--train-dir")
    p.add_argument("--val-dir")
    p.add_argument("--test-dir")
    p.add_argument("--preset", choices=["tiny", "voc", "yolov3"],
                   default="voc",
                   help="base config: tiny (CPU-runnable), voc (448 "
                        "Darknet-24 v1 flagship), yolov3 (416 Darknet-53 "
                        "3-scale FPN, paper anchors)")
    p.add_argument("--backbone",
                   choices=["darknet24", "darknet19", "darknet53",
                            "darknet_tiny", "darknet_micro", "vgg16",
                            "mobilenetv2"])
    p.add_argument("--head",
                   choices=["conv", "gap_dense", "flatten_dense", "anchor",
                            "fpn"])
    p.add_argument("--anchors", metavar="W,H;W,H;...",
                   help="anchor priors in image ratios for --head anchor/fpn "
                        "(fit with tools/kmeans_anchors.py; fpn needs a "
                        "multiple of its scale count, split by area)")
    p.add_argument("--image-size", type=int)
    p.add_argument("--num-classes", type=int)
    p.add_argument("--batch-size", type=int)
    p.add_argument("--epochs", type=int)
    p.add_argument("--optimizer",
                   choices=["adam", "nadam", "sgd", "adamw", "sgdw"])
    p.add_argument("--weight-decay", type=float,
                   help="decoupled weight decay for adamw/sgdw")
    p.add_argument("--schedule",
                   choices=["constant", "piecewise_warmup", "cosine_restarts"])
    p.add_argument("--lr", type=float)
    p.add_argument("--checkpoint-dir", default="checkpoints")
    p.add_argument("--log-dir", default="logs")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--compute-dtype", choices=["bfloat16", "float32"])
    p.add_argument("--pretrained-backbone", metavar="PATH",
                   help="pretrained backbone weights, converted at init: "
                        "Keras .h5 (vgg16/mobilenetv2) or original darknet "
                        ".weights/.conv.NN (darknet backbones)")
    p.add_argument("--freeze-backbone", action="store_true",
                   help="train with the backbone frozen")
    p.add_argument("--data-parallel", type=int, default=-1,
                   help="-1 = all devices on the data mesh axis")
    p.add_argument("--early-stop-patience", type=int)
    p.add_argument("--cache-in-memory", action="store_true",
                   help="cache decoded uint8 images in host RAM across epochs")
    p.add_argument("--cache-dir",
                   help="decode-ahead disk cache dir (raw uint8 memmap; for "
                        "datasets too big for --cache-in-memory)")
    p.add_argument("--device-cache", action="store_true",
                   help="keep the whole dataset resident in device HBM and "
                        "gather batches on-device (replicated per device on "
                        "multi-device meshes)")
    p.add_argument("--device-cache-layout",
                   choices=["replicated", "sharded"],
                   help="HBM layout of --device-cache on a multi-device "
                        "mesh; 'sharded' = rows sharded over the data axis "
                        "(per-device memory = dataset/dp)")
    p.add_argument("--train-decode-size", type=int,
                   help="decode train images at this resolution (above "
                        "--image-size) so the random crop samples at or "
                        "above target resolution, e.g. 501 for 448")
    p.add_argument("--resume", action="store_true",
                   help="resume from the latest checkpoint in --checkpoint-dir")
    p.add_argument("--profile-dir",
                   help="capture a jax.profiler trace of the first epoch")
    p.add_argument("--multiscale", metavar="S1,S2,...",
                   help="multi-scale training: comma-separated input sizes "
                        "drawn per epoch (e.g. 384,448,512; each a multiple "
                        "of the backbone stride). Eval stays at --image-size")
    p.add_argument("--multiscale-every", type=int,
                   help="re-draw the multiscale size every N epochs")
    p.add_argument("--letterbox", action="store_true",
                   help="aspect-preserving resize with gray padding instead "
                        "of the reference's distorting square resize")
    p.add_argument("--mosaic", type=float, metavar="PROB",
                   help="mosaic augmentation probability per image "
                        "(YOLOv4-style 4-image quadrant compose, on-device; "
                        "0 disables)")
    p.add_argument("--mixup", type=float, metavar="PROB",
                   help="detection mixup probability per image (blend with a "
                        "partner, keep the box union; 0 disables)")
    p.add_argument("--grad-accum", type=int, metavar="N",
                   help="split each batch into N microbatches inside the "
                        "jitted step (summed gradients, one update): ~N-fold "
                        "lower activation memory, so --batch-size can grow")
    p.add_argument("--ignore-threshold", type=float, metavar="IOU",
                   help="anchor/fpn heads: exempt unassigned slots whose "
                        "decoded prediction overlaps any GT above this IoU "
                        "from the no-object loss (darknet uses 0.6/0.5)")
    p.add_argument("--obj-target", choices=["one", "iou"],
                   help="anchor/fpn heads: assigned-slot confidence target "
                        "(iou = darknet's live-IoU objectness)")
    return p.parse_args()


def build_config(args):
    from keras_object_detection_tpu import config as cfglib

    cfg = {"tiny": cfglib.tiny_cpu_config,
           "voc": cfglib.voc_full_config,
           "yolov3": cfglib.yolov3_config}[args.preset]()

    def over(obj, **kw):
        kw = {k: v for k, v in kw.items() if v is not None}
        return dataclasses.replace(obj, **kw) if kw else obj

    train_dir = args.train_dir or args.data_dir
    if not train_dir:
        raise SystemExit("error: --data-dir or --train-dir is required")
    val_dir = args.val_dir or args.data_dir or train_dir
    test_dir = args.test_dir or ""

    sched = over(cfg.train.schedule, kind=args.schedule, base_lr=args.lr)
    return dataclasses.replace(
        cfg,
        grid=over(cfg.grid, num_classes=args.num_classes,
                  anchors=(tuple(tuple(float(v) for v in a.split(","))
                                 for a in args.anchors.split(";"))
                           if args.anchors else None)),
        model=over(cfg.model, backbone=args.backbone, head=args.head,
                   image_size=args.image_size, compute_dtype=args.compute_dtype,
                   pretrained_backbone=args.pretrained_backbone,
                   freeze_backbone=args.freeze_backbone or None),
        data=over(cfg.data, train_dir=train_dir, val_dir=val_dir,
                  test_dir=test_dir, batch_size=args.batch_size,
                  cache_in_memory=args.cache_in_memory or None,
                  cache_dir=args.cache_dir,
                  device_cache=args.device_cache or None,
                  device_cache_layout=args.device_cache_layout,
                  train_decode_size=args.train_decode_size,
                  letterbox=args.letterbox or None,
                  mosaic_prob=args.mosaic, mixup_prob=args.mixup),
        train=over(cfg.train, epochs=args.epochs, optimizer=args.optimizer,
                   schedule=sched, checkpoint_dir=args.checkpoint_dir,
                   log_dir=args.log_dir, seed=args.seed,
                   multiscale_sizes=(tuple(int(s) for s in
                                           args.multiscale.split(","))
                                     if args.multiscale else None),
                   multiscale_every=args.multiscale_every,
                   grad_accum_steps=args.grad_accum,
                   weight_decay=args.weight_decay,
                   ignore_threshold=args.ignore_threshold,
                   obj_target=args.obj_target),
        mesh=over(cfg.mesh, data_parallel=args.data_parallel),
    )


def main():
    args = parse_args()
    cfg = build_config(args)

    from keras_object_detection_tpu.utils.jax_cache import enable_persistent_cache

    enable_persistent_cache()
    from keras_object_detection_tpu.data.pipeline import YoloDataset
    from keras_object_detection_tpu.train.loop import Trainer

    os.makedirs(cfg.train.checkpoint_dir, exist_ok=True)
    with open(os.path.join(cfg.train.checkpoint_dir, "config.json"), "w") as f:
        f.write(cfg.to_json())

    cache_sub = (lambda split: os.path.join(cfg.data.cache_dir, split)
                 if cfg.data.cache_dir else None)
    # multiscale trains some epochs above image_size: decode the host/cache
    # images at the LARGEST training resolution so no epoch upsamples
    ms_max = max(cfg.train.multiscale_sizes or (0,))
    train_ds = YoloDataset(
        cfg.data.train_dir,
        # crop-fidelity: train images may decode above model resolution
        cfg.data.train_input_size(max(cfg.model.image_size, ms_max)),
        cfg.data.batch_size,
        max_boxes=cfg.data.max_boxes_per_image, shuffle=cfg.data.shuffle,
        drop_remainder=cfg.data.drop_remainder,
        num_workers=cfg.data.num_workers, seed=cfg.train.seed,
        cache_in_memory=cfg.data.cache_in_memory,
        cache_dir=cache_sub("train"), letterbox=cfg.data.letterbox)
    val_ds = YoloDataset(
        cfg.data.val_dir, cfg.model.image_size, cfg.data.batch_size,
        max_boxes=cfg.data.max_boxes_per_image,
        num_workers=cfg.data.num_workers, cache_dir=cache_sub("val"),
        letterbox=cfg.data.letterbox)

    trainer = Trainer(cfg)

    state = None
    start_epoch = None
    if args.resume:
        import jax

        template = jax.device_get(trainer.init_state())
        try:
            state = trainer.ckpt.restore(template,
                                         step=trainer.ckpt.latest_step)
            # The checkpoint axis is the epoch; resume the LR schedule from
            # the next epoch regardless of batch/dataset size changes.
            start_epoch = trainer.ckpt.latest_epoch + 1
            print(f"resumed from epoch {start_epoch} "
                  f"(optimizer step {int(state.step)})")
        except FileNotFoundError:
            print("no checkpoint to resume from; starting fresh")

    if args.profile_dir:
        from keras_object_detection_tpu.utils.profiling import trace

        with trace(args.profile_dir):
            state = trainer.fit(train_ds, val_ds, epochs=1, state=state,
                                start_epoch=start_epoch)
        remaining = cfg.train.epochs - 1
        if remaining > 0:
            # continue the epoch axis explicitly — re-inferring it from the
            # optimizer step count breaks when batch/dataset size changed
            state = trainer.fit(train_ds, val_ds, epochs=remaining, state=state,
                                early_stop_patience=args.early_stop_patience,
                                start_epoch=(start_epoch or 0) + 1)
    else:
        state = trainer.fit(train_ds, val_ds, state=state,
                            early_stop_patience=args.early_stop_patience,
                            start_epoch=start_epoch)

    if cfg.data.test_dir:
        # post-fit: reload best checkpoint and evaluate on test
        # (ref train.py:244-259)
        best = trainer.ckpt.restore(__import__("jax").device_get(state))
        test_ds = YoloDataset(
            cfg.data.test_dir, cfg.model.image_size, cfg.data.batch_size,
            max_boxes=cfg.data.max_boxes_per_image,
            letterbox=cfg.data.letterbox)
        results = trainer.evaluate(best, test_ds)
        print("test results:", results)
    trainer.ckpt.close()


if __name__ == "__main__":
    main()
