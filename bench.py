#!/usr/bin/env python
"""Benchmark: flagship train-step throughput + fused eval latency on the
attached TPU chip. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

vs_baseline compares against the reference implementation measured on this
container's CPU (see bench_baseline.json — the TF2/Keras reference has no TPU
path, so its own best-available hardware here is the CPU).

Env knobs: KOT_BENCH_BATCH (default 32), KOT_BENCH_STEPS (default 20).
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from keras_object_detection_tpu.utils.jax_cache import enable_persistent_cache

enable_persistent_cache()


def _pipelined_ms(run_async, readback, k: int = 32) -> float:
    """Per-call time with K async dispatches and ONE value-readback sync:
    dispatch overlaps device work, so this converges to
    max(device_time, per-dispatch submit cost) — an upper bound on on-device
    time that a throughput client actually achieves, free of the ~25 ms
    relay RTT that dominates serial p50 in this environment (the same
    decomposition tools/serving_device_time.py records; its profiler-trace
    lane independently confirms the pipelined number)."""
    readback(run_async())  # warmup (already compiled by callers)
    t0 = time.perf_counter()
    last = None
    for _ in range(k):
        last = run_async()
    readback(last)
    return (time.perf_counter() - t0) * 1000 / k


def main():
    import dataclasses

    from keras_object_detection_tpu.config import voc_full_config
    from keras_object_detection_tpu.eval.evaluator import InferenceModel
    from keras_object_detection_tpu.train.loop import (
        create_train_state, make_train_step)

    batch = int(os.environ.get("KOT_BENCH_BATCH", "32"))
    steps = int(os.environ.get("KOT_BENCH_STEPS", "20"))
    n_chips = jax.device_count()

    cfg = voc_full_config()
    cfg = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, batch_size=batch))
    size = cfg.model.image_size

    rng = np.random.RandomState(0)
    images = jnp.asarray(
        rng.randint(0, 255, size=(batch, size, size, 3), dtype=np.uint8))
    boxes = np.zeros((batch, cfg.data.max_boxes_per_image, 5), np.float32)
    boxes[:, 0] = [0.5, 0.5, 0.3, 0.3, 1.0]
    boxes[:, 1] = [0.2, 0.25, 0.2, 0.3, 7.0]
    valid = np.zeros((batch, cfg.data.max_boxes_per_image), bool)
    valid[:, :2] = True
    boxes, valid = jnp.asarray(boxes), jnp.asarray(valid)

    state = create_train_state(cfg, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(cfg), donate_argnums=(0,))
    key = jax.random.PRNGKey(1)

    # --- train throughput ---------------------------------------------------
    # Sync via an actual value readback: on the axon relay platform,
    # block_until_ready alone has been observed to return before execution
    # finishes, producing phantom throughput.
    for _ in range(3):  # warmup + compile
        state, metrics = step(state, images, boxes, valid, key)
    float(metrics["total"])
    t0 = time.perf_counter()
    for _ in range(steps):
        state, metrics = step(state, images, boxes, valid, key)
    float(metrics["total"])
    train_time = time.perf_counter() - t0
    train_ips = steps * batch / train_time / n_chips

    # --- fused eval (forward + decode + NMS) --------------------------------
    infer = InferenceModel(cfg, state.params, state.batch_stats)
    lat1 = infer.benchmark_latency(np.asarray(images[:1]), runs=10)
    latb = infer.benchmark_latency(np.asarray(images), runs=10)
    eval_ips = batch / (latb["p50_ms"] / 1000.0) / n_chips

    # device-time lanes (round-4 verdict: wall p50 here is the ~25 ms relay
    # RTT floor, not the machine — record the pipelined per-call time, which
    # tracks benchmarks/serving_device_time.json's trace-verified numbers)
    x1, xb = jnp.asarray(images[:1]), images
    rb = lambda out: np.asarray(out[-1])
    dev1 = _pipelined_ms(
        lambda: infer._forward_decode_nms(infer._variables, x1), rb)
    devb = _pipelined_ms(
        lambda: infer._forward_decode_nms(infer._variables, xb), rb)

    # --- NMS p50 (the BASELINE "p50 NMS latency" metric): the measured-best
    # auto path — round 4's sweep found the XLA fori_loop formulation beats
    # the Pallas kernel at every (batch, N) point on this chip, so auto now
    # routes there (ops/pallas_nms.py auto_batched_non_max_suppression;
    # KOT_NMS_IMPL=pallas re-measures the kernel) ----------------------------
    from keras_object_detection_tpu.ops.pallas_nms import (
        auto_batched_non_max_suppression)

    nms_jit = jax.jit(
        lambda b: auto_batched_non_max_suppression(b, 0.5, 0.4))
    dec = infer.predict_decoded(np.asarray(images))
    jax.block_until_ready(nms_jit(dec))
    nms_times = []
    for _ in range(20):
        t0 = time.perf_counter()
        jax.block_until_ready(nms_jit(dec))
        nms_times.append((time.perf_counter() - t0) * 1000)
    nms_times.sort()
    nms_p50 = nms_times[len(nms_times) // 2]
    nms_dev = _pipelined_ms(lambda: nms_jit(dec),
                            lambda out: np.asarray(out[-1]))

    # --- FPN lane (darknet53 3-scale FPN @416, the quality-champion family:
    # round-4 val mAP 0.993) — train-step throughput + fused serving with
    # the top-K candidate compaction (10,647 -> 512), KOT_BENCH_FPN=0 skips.
    fpn_extras = {}
    if os.environ.get("KOT_BENCH_FPN", "1") == "1":
        from keras_object_detection_tpu.config import yolov3_config

        fcfg = yolov3_config()
        fcfg = dataclasses.replace(
            fcfg,
            data=dataclasses.replace(fcfg.data, batch_size=batch),
            eval=dataclasses.replace(fcfg.eval, conf_threshold=0.25,
                                     max_candidates=512))
        fsize = fcfg.model.image_size
        fimages = jnp.asarray(rng.randint(
            0, 255, size=(batch, fsize, fsize, 3), dtype=np.uint8))
        fstate = create_train_state(fcfg, jax.random.PRNGKey(0))
        fstep = jax.jit(make_train_step(fcfg), donate_argnums=(0,))
        for _ in range(2):
            fstate, fmetrics = fstep(fstate, fimages, boxes, valid, key)
        float(fmetrics["total"])
        fsteps = max(steps // 2, 5)
        t0 = time.perf_counter()
        for _ in range(fsteps):
            fstate, fmetrics = fstep(fstate, fimages, boxes, valid, key)
        float(fmetrics["total"])
        fpn_train_ips = fsteps * batch / (time.perf_counter() - t0) / n_chips

        finfer = InferenceModel(fcfg, fstate.params, fstate.batch_stats)
        fx1, fxb = fimages[:1], fimages
        flat1 = finfer.benchmark_latency(np.asarray(fx1), runs=10)
        fdev1 = _pipelined_ms(
            lambda: finfer._forward_decode_nms(finfer._variables, fx1), rb)
        fdevb = _pipelined_ms(
            lambda: finfer._forward_decode_nms(finfer._variables, fxb), rb)
        fpn_extras = {
            "fpn416_train_ips": round(fpn_train_ips, 2),
            "fpn416_serve_p50_ms_batch1": round(flat1["p50_ms"], 3),
            "fpn416_serve_device_ms_batch1": round(fdev1, 3),
            "fpn416_serve_device_ms_batch": round(fdevb, 3),
            "fpn416_serve_ips_device": round(batch / (fdevb / 1000.0), 1),
        }

    # --- mAP metric micro-bench (8 synthetic images, C=20 — identical
    # workload to the recorded reference measurement) ------------------------
    from keras_object_detection_tpu.ops.map import MeanAveragePrecision

    mrng = np.random.RandomState(0)
    yt = np.zeros((8, 7, 7, 30), np.float32)
    for b in range(8):
        for i in range(7):
            for j in range(7):
                if mrng.uniform() < 0.2:
                    cls = mrng.randint(20)
                    yt[b, i, j, cls] = 1
                    yt[b, i, j, 20] = 1
                    yt[b, i, j, 21:25] = mrng.uniform(
                        [0, 0, 0.05, 0.05], [1, 1, 0.5, 0.5])
    yp = (0.7 * yt + 0.45 * mrng.uniform(-0.2, 1, size=yt.shape)).astype(
        np.float32)
    metric = MeanAveragePrecision(20, 2)
    metric.update_state(yt, yp)
    metric.result()  # compile
    metric.reset_states()
    t0 = time.perf_counter()
    metric.update_state(yt, yp)
    map_val = metric.result()
    map_ms = (time.perf_counter() - t0) * 1000

    # --- optional: int8 serving latency (KOT_BENCH_INT8=1) ------------------
    # True int8 path: BN-fold + s8xs8->s32 convs (export/int8_serving.py),
    # compared at batch 1 and full batch against the float InferenceModel.
    int8_extras = {}
    if os.environ.get("KOT_BENCH_INT8") == "1":
        from keras_object_detection_tpu.export.int8_serving import (
            Int8InferenceModel)

        qim = Int8InferenceModel(cfg, state.params, state.batch_stats)
        qlat1 = qim.benchmark_latency(np.asarray(images[:1]), runs=10)
        qlatb = qim.benchmark_latency(np.asarray(images), runs=10)
        int8_extras["int8_serve_p50_ms_batch1"] = round(qlat1["p50_ms"], 3)
        int8_extras["int8_serve_p50_ms_batch"] = round(qlatb["p50_ms"], 3)
        int8_extras["int8_vs_float_batch1"] = round(
            lat1["p50_ms"] / qlat1["p50_ms"], 2)

    baseline_path = os.path.join(os.path.dirname(__file__), "bench_baseline.json")
    baseline = json.load(open(baseline_path))

    result = {
        "metric": "train_images_per_sec_per_chip",
        "value": round(train_ips, 2),
        "unit": "images/sec/chip (448x448 darknet24 bf16 train step)",
        "vs_baseline": round(train_ips / baseline["train_images_per_sec"], 1),
        "extras": {
            "batch": batch,
            "chips": n_chips,
            "loss_finite": bool(np.isfinite(float(metrics["total"]))),
            "eval_images_per_sec_per_chip": round(eval_ips, 2),
            "eval_p50_ms_batch1": round(lat1["p50_ms"], 3),
            "eval_p50_ms_batch": round(latb["p50_ms"], 3),
            "eval_device_ms_batch1": round(dev1, 3),
            "eval_device_ms_batch": round(devb, 3),
            "eval_ips_device": round(batch / (devb / 1000.0), 1),
            "eval_vs_baseline": round(
                baseline["eval_p50_ms_batch1"] / lat1["p50_ms"], 1),
            "nms_p50_ms_batch": round(nms_p50, 4),
            "nms_device_ms_batch": round(nms_dev, 4),
            "map_metric_ms": round(map_ms, 2),
            "map_metric_value": round(float(map_val), 4),
            "map_metric_vs_baseline": round(
                baseline["map_metric_ms_8imgs_c20"] / max(map_ms, 1e-6), 1),
            "baseline": baseline["description"][:80],
            **fpn_extras,
            **int8_extras,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
