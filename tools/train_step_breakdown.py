#!/usr/bin/env python
"""Device-op time breakdown of one jitted train step.

Turns the ad-hoc round-2 flagship breakdown ("conv fusions 20.3 ms,
convert+reduce 15.1 ms, ...", ROADMAP.md) into a reusable measurement:
jit the train step for a config, warm it up, trace N steps with
``jax.profiler``, and aggregate the device "XLA Ops" lane into
per-HLO-category busy time (utils/profiling.py ``op_breakdown``).

The reference has no counterpart (its only tracing is wall-clock prints,
ref train.py:159 ``profile_batch=0``); this is the TPU-native profiling
subsystem SURVEY.md §5 calls for, applied to the training hot path.

Usage:
  python tools/train_step_breakdown.py --checkpoint /tmp/run/ckpt \
      --steps 8 --out benchmarks/train_step_breakdown_fpn416.json
  python tools/train_step_breakdown.py --preset voc_full --batch 32
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import dataclasses
import json
import tempfile
import time


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", default=None,
                   help="checkpoint dir with config.json — reproduces that "
                        "run's exact step shape (weights are re-initialized; "
                        "timing is weight-value independent)")
    p.add_argument("--preset", default="voc_full",
                   help="config preset from keras_object_detection_tpu."
                        "config (<preset>_config) when no --checkpoint")
    p.add_argument("--batch", type=int, default=None,
                   help="override batch size (default: the config's)")
    p.add_argument("--steps", type=int, default=8,
                   help="traced steps (after 3 warmup steps)")
    p.add_argument("--timed-steps", type=int, default=20,
                   help="untraced steps for the wall-clock p50")
    p.add_argument("--scan", type=int, default=0, metavar="K",
                   help="ALSO profile the scan-dispatch program (K steps per "
                        "dispatch via lax.scan over batch-index rows, the "
                        "TrainConfig.steps_per_dispatch structure) and report "
                        "its per-step device time next to the bare step's — "
                        "decomposes scan overhead from per-step config cost")
    p.add_argument("--out", default=None,
                   help="output JSON (default: print only)")
    args = p.parse_args()

    from keras_object_detection_tpu.utils.jax_cache import (
        enable_persistent_cache)

    enable_persistent_cache()
    import jax
    import numpy as np

    import keras_object_detection_tpu.config as config_mod
    from keras_object_detection_tpu.config import Config
    from keras_object_detection_tpu.train.loop import (
        create_train_state, make_train_step)
    from keras_object_detection_tpu.utils.profiling import (
        device_lane_ms, op_breakdown, trace, traced_events)

    if args.checkpoint:
        with open(os.path.join(args.checkpoint, "config.json")) as f:
            cfg = Config.from_json(f.read())
        src = f"checkpoint config {args.checkpoint}"
    else:
        cfg = getattr(config_mod, f"{args.preset}_config")()
        src = f"preset {args.preset}"
    if args.batch:
        cfg = dataclasses.replace(
            cfg, data=dataclasses.replace(cfg.data, batch_size=args.batch))

    batch = cfg.data.batch_size
    size = cfg.model.image_size
    rng = np.random.RandomState(0)
    images = jax.device_put(
        rng.randint(0, 255, (batch, size, size, 3), np.uint8))
    boxes = np.zeros((batch, cfg.data.max_boxes_per_image, 5), np.float32)
    boxes[:, 0] = [0.5, 0.5, 0.3, 0.3, 1.0]
    boxes[:, 1] = [0.2, 0.25, 0.2, 0.3, 2.0]
    valid = np.zeros((batch, cfg.data.max_boxes_per_image), bool)
    valid[:, :2] = True
    boxes, valid = jax.device_put(boxes), jax.device_put(valid)

    state = create_train_state(cfg, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(cfg), donate_argnums=(0,))
    key = jax.random.PRNGKey(1)

    for _ in range(3):  # compile + warmup
        state, metrics = step(state, images, boxes, valid, key)
    float(metrics["total"])  # value readback = trusted sync (bench.py)

    # wall-clock p50 over untraced steps
    times = []
    for _ in range(args.timed_steps):
        t0 = time.perf_counter()
        state, metrics = step(state, images, boxes, valid, key)
        float(metrics["total"])
        times.append((time.perf_counter() - t0) * 1000)
    times.sort()
    wall_p50 = times[len(times) // 2]

    with tempfile.TemporaryDirectory() as td:
        with trace(td):
            for _ in range(args.steps):
                state, metrics = step(state, images, boxes, valid, key)
                float(metrics["total"])
        events = traced_events(td)

    lanes = device_lane_ms(events)
    modules_ms = max(
        (v for k, v in lanes.items() if "xla modules" in k.lower()),
        default=0.0)
    bd = op_breakdown(events)
    n = args.steps
    result = {
        "description": (
            "Per-step device-op breakdown of the jitted train step: XLA Ops "
            "lane busy time aggregated by HLO category over a jax.profiler "
            "trace. wall_p50_ms includes dispatch/RTT; device_ms is the XLA "
            "Modules lane (true device busy time)."),
        "model": {"backbone": cfg.model.backbone, "head": cfg.model.head,
                  "image_size": size, "batch": batch, "source": src,
                  "platform": str(jax.devices()[0])},
        "wall_p50_ms": round(wall_p50, 3),
        "device_ms_per_step": round(modules_ms / n, 3),
        "images_per_s_device": round(batch / (modules_ms / n) * 1000, 1),
        "traced_steps": n,
        "categories_ms_per_step": {
            k: round(v / n, 3) for k, v in bd["categories"].items()},
        "top_ops_ms_per_step": [
            {"name": o["name"], "ms": round(o["ms"] / n, 4),
             "count_per_step": o["count"] // n} for o in bd["top_ops"]],
    }
    if args.scan:
        # Scan-dispatch twin: the Trainer's steps_per_dispatch structure
        # (train/loop.py _train_scan) — K (gather -> step) iterations per
        # jitted call via lax.scan over batch-index rows, metrics summed.
        # Same step fn, same batch content each iteration (identity gather
        # from a device-resident pool), so per-step device time differences
        # vs the bare step above are the scan program's own cost.
        import jax.numpy as jnp

        K = args.scan
        fn = make_train_step(cfg)

        def scan_fn(st, imgs, bxs, vld, idx_mat, k):
            def body(s, idx):
                return fn(s, imgs[idx], bxs[idx], vld[idx], k)

            st, ms = jax.lax.scan(body, st, idx_mat)
            return st, jax.tree_util.tree_map(lambda a: jnp.sum(a, axis=0),
                                              ms)

        scan_jit = jax.jit(scan_fn, donate_argnums=(0,))
        idx_mat = jnp.asarray(
            np.tile(np.arange(batch, dtype=np.int32), (K, 1)))
        sstate = create_train_state(cfg, jax.random.PRNGKey(0))
        for _ in range(2):
            sstate, sm = scan_jit(sstate, images, boxes, valid, idx_mat, key)
        float(sm["total"])
        stimes = []
        for _ in range(max(args.timed_steps // K, 3)):
            t0 = time.perf_counter()
            sstate, sm = scan_jit(sstate, images, boxes, valid, idx_mat, key)
            float(sm["total"])
            stimes.append((time.perf_counter() - t0) * 1000)
        stimes.sort()
        n_disp = max(args.steps // K, 2)
        with tempfile.TemporaryDirectory() as td:
            with trace(td):
                for _ in range(n_disp):
                    sstate, sm = scan_jit(sstate, images, boxes, valid,
                                          idx_mat, key)
                    float(sm["total"])
            sevents = traced_events(td)
        slanes = device_lane_ms(sevents)
        smod = max((v for k, v in slanes.items()
                    if "xla modules" in k.lower()), default=0.0)
        sbd = op_breakdown(sevents)
        nsteps = n_disp * K
        result["scan_dispatch"] = {
            "steps_per_dispatch": K,
            "wall_p50_ms_per_step": round(
                stimes[len(stimes) // 2] / K, 3),
            "device_ms_per_step": round(smod / nsteps, 3),
            "vs_bare_step_device": round(
                (smod / nsteps) / max(modules_ms / n, 1e-9), 3),
            "categories_ms_per_step": {
                k: round(v / nsteps, 3)
                for k, v in sbd["categories"].items()},
        }

    print(json.dumps({k: result[k] for k in (
        "wall_p50_ms", "device_ms_per_step", "images_per_s_device",
        "categories_ms_per_step") if k in result}
        | ({"scan_dispatch": result["scan_dispatch"]}
           if args.scan else {}), indent=2))
    if args.out:
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(result, f, indent=2)
        print("wrote", args.out)


if __name__ == "__main__":
    main()
