#!/usr/bin/env python
"""Decompose serving latency into on-device compute time vs dispatch/RTT
overhead (VERDICT r3 ask #7: turn the "~5 ms on direct-attached TPU" claim
into a measured decomposition instead of an inference).

Three independent measurements per batch size, fused forward+decode+NMS
(eval/evaluator.py InferenceModel; ref evaluate.py:37-47 is the reference's
wall-clock-only counterpart):

1. ``serial_p50_ms`` — one dispatch at a time with a value-readback sync:
   what a naive client sees; on the relay-attached bench chip this is
   dominated by the ~25 ms per-dispatch round trip.
2. ``pipelined_per_call_ms`` — K dispatches issued back-to-back with ONE
   readback at the end: async dispatch overlaps the device work, so the
   per-call cost converges to max(device_time, per-dispatch submit cost) —
   an upper bound on device time that a throughput-oriented client actually
   achieves.
3. ``trace_device_ms`` — jax.profiler trace parsed via xprof's trace_viewer
   converter (utils/profiling.py): the "XLA Modules" device lane (one
   non-overlapping event per executed program) divided by the number of
   traced calls — the ground-truth on-device busy time. Recorded as null
   if the xplane tooling is unavailable.

Also times the Pallas NMS kernel standalone (ops/pallas_nms.py) the same
three ways, and records ``cost_analysis`` FLOPs for the fused program.

Usage:
  python tools/serving_device_time.py --checkpoint /tmp/run/ckpt \
      --batches 1,32 --out benchmarks/serving_device_time.json
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import tempfile
import time


def _trace_device_ms(run, n_calls: int) -> dict:
    """Run ``run()`` ``n_calls`` times under a jax.profiler trace and return
    per-call device busy time (utils/profiling.py parses the xplane protos
    via xprof's trace_viewer converter)."""
    from keras_object_detection_tpu.utils.profiling import (
        device_lane_ms, trace, traced_events)

    out = {"trace_device_ms": None, "trace_note": None}
    with tempfile.TemporaryDirectory() as td:
        with trace(td):
            for _ in range(n_calls):
                run()
        try:
            events = traced_events(td)
        except RuntimeError as e:  # xprof absent -> decomposition 1+2 only
            out["trace_note"] = str(e)
            return out
        lanes = device_lane_ms(events)
        if not lanes:
            out["trace_note"] = "no device lane events in trace"
            return out
        # Prefer the "XLA Modules" lane: one non-overlapping event per
        # executed program, so its sum IS device busy time. Other lanes
        # (e.g. "Framework Name Scope") stack nested events and summing
        # them double-counts — observed 44.8 ms/call on a program whose
        # wall p50 was 33 ms.
        mod = [k for k in lanes if "xla modules" in k.lower()]
        key = max(mod, key=lanes.get) if mod else max(lanes, key=lanes.get)
        out["trace_device_ms"] = round(lanes[key] / n_calls, 4)
        out["trace_note"] = (
            f"device lane {key!r} over {n_calls} calls; "
            f"all lanes ms/call: "
            + json.dumps({
                k: round(v / n_calls, 4)
                for k, v in sorted(lanes.items(),
                                   key=lambda kv: -kv[1])[:6]}))
    return out


def _measure(run_async, readback, runs: int, pipeline_k: int) -> dict:
    """Serial p50 (sync per call) + pipelined per-call time (sync once)."""
    # warmup / compile
    readback(run_async())
    times = []
    for _ in range(runs):
        t0 = time.perf_counter()
        readback(run_async())
        times.append((time.perf_counter() - t0) * 1000)
    times.sort()
    t0 = time.perf_counter()
    last = None
    for _ in range(pipeline_k):
        last = run_async()
    readback(last)
    pipelined = (time.perf_counter() - t0) * 1000 / pipeline_k
    return {
        "serial_p50_ms": round(times[len(times) // 2], 3),
        "serial_min_ms": round(times[0], 3),
        "pipelined_per_call_ms": round(pipelined, 3),
        "pipeline_depth": pipeline_k,
        "runs": runs,
    }


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", default=None,
                   help="checkpoint dir with config.json (tools/"
                        "run_synth_benchmark.py layout); default: random "
                        "flagship-shaped weights (timing is weight-value "
                        "independent)")
    p.add_argument("--batches", default="1,32")
    p.add_argument("--runs", type=int, default=15)
    p.add_argument("--pipeline-k", type=int, default=32)
    p.add_argument("--trace-calls", type=int, default=8)
    p.add_argument("--out", default="benchmarks/serving_device_time.json")
    args = p.parse_args()

    from keras_object_detection_tpu.utils.jax_cache import (
        enable_persistent_cache)

    enable_persistent_cache()
    import jax
    import numpy as np

    from keras_object_detection_tpu.config import Config, voc_full_config
    from keras_object_detection_tpu.eval.evaluator import InferenceModel

    if args.checkpoint:
        with open(os.path.join(args.checkpoint, "config.json")) as f:
            cfg = Config.from_json(f.read())
        from keras_object_detection_tpu.eval.evaluator import (
            load_serving_state)
        state, params, info = load_serving_state(cfg, args.checkpoint)
        batch_stats = state.batch_stats
        src = f"checkpoint {args.checkpoint} ({info})"
    else:
        from keras_object_detection_tpu.train.loop import create_train_state
        cfg = voc_full_config()
        state = jax.device_get(
            create_train_state(cfg, jax.random.PRNGKey(0)))
        params, batch_stats = state.params, state.batch_stats
        src = "random flagship-shaped weights (voc_full_config)"

    model = InferenceModel(cfg, params, batch_stats)
    size = cfg.model.image_size
    results = {
        "description": (
            "Serving latency decomposition: serial (sync per call, what a "
            "naive client sees incl. relay RTT), pipelined (async dispatch "
            "overlap -> upper bound on device time), and profiler-trace "
            "device busy time. Fused forward+decode+NMS program."),
        "model": {"backbone": cfg.model.backbone, "head": cfg.model.head,
                  "image_size": size, "source": src,
                  "platform": str(jax.devices()[0])},
        "fused_serving": [],
    }

    rng = np.random.RandomState(0)
    for b in [int(x) for x in args.batches.split(",")]:
        imgs = jax.device_put(
            rng.randint(0, 255, (b, size, size, 3), np.uint8))

        def run_async():
            return model._forward_decode_nms(model._variables, imgs)

        def readback(out):
            np.asarray(out[-1])  # value readback = trusted sync (bench.py)

        row = {"batch": b}
        row.update(_measure(run_async, readback, args.runs, args.pipeline_k))
        row.update(_trace_device_ms(lambda: readback(run_async()),
                                    args.trace_calls))
        try:
            compiled = jax.jit(
                lambda v, x: model._forward_decode_nms(v, x)
            ).lower(model._variables, imgs).compile()
            an = compiled.cost_analysis()
            an = an[0] if isinstance(an, (list, tuple)) else an
            row["cost_analysis_gflops"] = round(
                float(an.get("flops", 0.0)) / 1e9, 2)
        except Exception as e:
            row["cost_analysis_gflops"] = None
            row["cost_note"] = repr(e)
        results["fused_serving"].append(row)
        print("fused", row)

    # Pallas NMS standalone (the post-processing stage in isolation)
    from keras_object_detection_tpu.ops.pallas_nms import (
        auto_batched_non_max_suppression)

    boxes = jax.device_put(np.concatenate([
        rng.randint(0, cfg.grid.num_classes, (32, 512, 1)).astype(np.float32),
        rng.uniform(0, 1, (32, 512, 5)).astype(np.float32)], axis=-1))
    nms = jax.jit(lambda bx: auto_batched_non_max_suppression(bx, 0.5, 0.25))

    def nms_async():
        return nms(boxes)

    def nms_readback(out):
        np.asarray(out[-1])

    row = {"batch": 32, "candidates": 512}
    row.update(_measure(nms_async, nms_readback, args.runs, args.pipeline_k))
    row.update(_trace_device_ms(lambda: nms_readback(nms_async()),
                                args.trace_calls))
    results["pallas_nms"] = row
    print("nms", row)

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
