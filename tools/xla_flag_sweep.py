"""XLA compiler-flag sweep on the flagship train step (VERDICT r2 #2).

ROADMAP.md named "conv layout tuning via XLA flags" as the one unexplored
throughput lever after the round-2 BN-stats campaign measured everything else
at or below stock. This tool closes that lever with numbers either way:

  1. PROBE: each candidate option is first attached to a trivial jit compile —
     options the backend rejects are recorded as "rejected" without paying a
     flagship compile for them.
  2. SWEEP: every accepted option set gets a fresh AOT compile of the FULL
     flagship train step (Darknet-24 448^2 bf16, batch 32 — identical to
     bench.py) via ``lowered.compile(compiler_options=...)``, then a timed
     20-step run synced by value readback (block_until_ready alone produces
     phantom timings on this relay-attached chip, see bench.py).

Results append to benchmarks/xla_flag_sweep.json after EVERY config so a
killed run keeps its partial table. NOTE each non-baseline config is a fresh
compile through the relay (the persistent cache keys on compile options) —
expect many minutes per config; run in the background and keep other JAX
compiles off the machine meanwhile (CLAUDE.md: a relay compile in flight
blocks every other process's compiles).

Run:  python tools/xla_flag_sweep.py [--steps 20] [--batch 32]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from keras_object_detection_tpu.utils.jax_cache import enable_persistent_cache

enable_persistent_cache()

# Candidate option sets. Names must match XLA DebugOptions flags; anything the
# backend refuses is recorded as rejected (that IS a result — it closes the
# lever for this stack). Values are strings per the compiler_options API.
CANDIDATES = [
    ("baseline", {}),
    # Scoped-VMEM budget: bounds how much VMEM a fusion may claim; larger
    # budgets let the fusion emitter build deeper conv+elementwise fusions
    # (v5e has 128 MB VMEM; the default scoped limit is ~16 MB).
    ("scoped_vmem_32m", {"xla_tpu_scoped_vmem_limit_kib": "32768"}),
    ("scoped_vmem_64m", {"xla_tpu_scoped_vmem_limit_kib": "65536"}),
    ("scoped_vmem_96m", {"xla_tpu_scoped_vmem_limit_kib": "98304"}),
    # Overlap scheduler (built for collectives, but also reorders DMA prefetch)
    ("latency_hiding_sched", {"xla_tpu_enable_latency_hiding_scheduler": "true"}),
    # Fusion aggressiveness / cost-model variants
    ("aggressive_fusion", {"xla_tpu_enable_aggressive_loop_fusion": "true"}),
    ("no_rwb_fusion", {"xla_tpu_rwb_fusion": "false"}),
    # Async weight/activation prefetch depth between HBM and VMEM
    ("prefetch_depth8", {"xla_tpu_prefetch_depth": "8"}),
]


def probe(name: str, opts: dict) -> str:
    """Compile a trivial graph with the options; '' = accepted, else error."""
    try:
        fn = jax.jit(lambda x: (x @ x).sum())
        fn.lower(jnp.ones((128, 128), jnp.bfloat16)).compile(
            compiler_options=opts)
        return ""
    except Exception as e:  # rejected option names raise at compile
        return f"{type(e).__name__}: {str(e)[:300]}"


def build_step(batch: int):
    from keras_object_detection_tpu.config import voc_full_config
    from keras_object_detection_tpu.train.loop import (
        create_train_state, make_train_step)

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
    # no donation: the same state feeds every config's compiled executable
    step = jax.jit(make_train_step(cfg))
    lowered = step.lower(state, images, boxes, valid, jax.random.PRNGKey(1))
    return lowered, (state, images, boxes, valid, jax.random.PRNGKey(1))


def time_config(compiled, args, steps: int) -> dict:
    state = args[0]
    for _ in range(3):
        new_state, metrics = compiled(state, *args[1:])
    float(metrics["total"])  # value readback = real sync on this platform
    t0 = time.perf_counter()
    for _ in range(steps):
        new_state, metrics = compiled(state, *args[1:])
    float(metrics["total"])
    dt = time.perf_counter() - t0
    batch = args[1].shape[0]
    return {
        "step_ms": round(dt / steps * 1000, 2),
        "images_per_s": round(steps * batch / dt, 1),
        "loss_finite": bool(np.isfinite(float(metrics["total"]))),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--only", default="",
                    help="comma-separated config names to run (default: all)")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "benchmarks", "xla_flag_sweep.json"))
    args = ap.parse_args()

    only = set(args.only.split(",")) if args.only else None
    doc = {"what": f"flagship train step (448^2 darknet24 bf16, batch "
                   f"{args.batch}) timed over {args.steps} steps per "
                   "compiler_options set; fresh relay compile per config",
           "device": str(jax.devices()[0]),
           "configs": {}}
    if os.path.exists(args.out):
        try:
            doc = json.load(open(args.out))
        except Exception:
            pass

    def save():
        with open(args.out, "w") as f:
            json.dump(doc, f, indent=1)
            f.write("\n")

    # Phase 1: probe every candidate on a tiny graph
    accepted = []
    for name, opts in CANDIDATES:
        if only is not None and name not in only:
            continue
        if name in doc["configs"] and doc["configs"][name].get("images_per_s"):
            print(f"[skip] {name}: already measured", flush=True)
            continue
        err = probe(name, opts)
        if err:
            print(f"[rejected] {name}: {err}", flush=True)
            doc["configs"][name] = {"options": opts, "rejected": err}
            save()
        else:
            accepted.append((name, opts))
    print(f"accepted: {[n for n, _ in accepted]}", flush=True)
    if not accepted:
        save()
        return

    # Phase 2: flagship compiles + timing
    lowered, call_args = build_step(args.batch)
    for name, opts in accepted:
        print(f"[compile] {name} {opts} ...", flush=True)
        t0 = time.perf_counter()
        try:
            compiled = lowered.compile(compiler_options=opts) if opts \
                else lowered.compile()
        except Exception as e:
            doc["configs"][name] = {
                "options": opts,
                "rejected": f"{type(e).__name__}: {str(e)[:300]}"}
            save()
            print(f"[rejected at full compile] {name}: {e}", flush=True)
            continue
        compile_s = round(time.perf_counter() - t0, 1)
        r = time_config(compiled, call_args, args.steps)
        r.update({"options": opts, "compile_s": compile_s})
        doc["configs"][name] = r
        save()
        print(f"[done] {name}: {r}", flush=True)

    base = doc["configs"].get("baseline", {}).get("images_per_s")
    if base:
        for name, r in doc["configs"].items():
            if r.get("images_per_s"):
                r["vs_baseline"] = round(r["images_per_s"] / base, 3)
    save()
    print(json.dumps(doc["configs"], indent=1))


if __name__ == "__main__":
    main()
