"""Static communication-cost analysis for tensor parallelism (VERDICT r2 #8).

Only one real TPU chip is attached in this environment, so a wall-clock A/B of
dp8 vs dp4xtp2 is impossible. What CAN be measured honestly is the collective
traffic each sharding choice compiles to: this tool AOT-compiles the FULL
flagship train step (Darknet-24, 448x448, bf16, conv head — the
``voc_full_config`` model) over a fake 8-device CPU mesh under

  - pure data parallelism            mesh (data=8, model=1)
  - data x tensor parallelism        mesh (data=4, model=2)

and parses the optimized (post-SPMD-partitioner) HLO for every collective op,
summing per-device payload bytes by kind. The delta between the two configs is
exactly what the ``parallel.mesh.state_sharding`` >=1M-element column-sharding
rule buys/costs in communication for this 45M-param model.

Output: one JSON document (written to benchmarks/tp_comm_analysis.json by
default) with per-config op tables and the derived verdict numbers quoted in
PARITY.md / parallel/mesh.py.

Run:  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
      XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python tools/tp_comm_analysis.py
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# The axon sitecustomize boots the TPU platform regardless of env vars;
# switch to CPU before any client exists (see CLAUDE.md).
if getattr(jax.config, "jax_platforms", None) != "cpu":
    jax.config.update("jax_platforms", "cpu")

import numpy as np

DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "f16": 2, "bf16": 2,
    "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8, "f64": 8,
}

# result shapes of a collective: `bf16[4,14,14,2048]{3,2,1,0}` or tuples
_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")
_COLLECTIVES = ("all-reduce", "all-gather", "reduce-scatter",
                "collective-permute", "all-to-all")


def _shape_bytes(text: str) -> int:
    """Sum byte sizes of every typed shape literal in ``text``."""
    total = 0
    for dt, dims in _SHAPE_RE.findall(text):
        if dt not in DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * DTYPE_BYTES[dt]
    return total


def collect_collectives(hlo_text: str) -> dict:
    """Per-kind {count, bytes} for every collective op in optimized HLO.

    Bytes = per-device RESULT payload of the op (the tensor each participant
    ends up holding) — a like-for-like basis across kinds and configs.
    """
    stats: dict = {}
    for line in hlo_text.splitlines():
        # long result tuples carry `/*index=5*/` comments whose `=` breaks
        # naive [^=] matching — strip comments first
        line = re.sub(r"/\*.*?\*/", "", line.strip())
        # `%all-gather.5 = bf16[...]{...} all-gather(...)` — match the op
        # name after `= shape `, not the SSA value name.
        m = re.match(r"(?:ROOT\s+)?%?[\w.\-]+\s*=\s*(\(?.*?)\s*(" +
                     "|".join(_COLLECTIVES) + r")(?:-start|-done)?\(", line)
        if not m:
            continue
        shapes, kind = m.group(1), m.group(2)
        if "-done(" in line:
            continue  # paired with -start; count once
        b = _shape_bytes(shapes)
        s = stats.setdefault(kind, {"count": 0, "bytes": 0})
        s["count"] += 1
        s["bytes"] += b
    return stats


def compile_step(dp: int, tp: int, batch: int, image_size: int) -> dict:
    from keras_object_detection_tpu.config import voc_full_config
    from keras_object_detection_tpu.parallel.mesh import (
        batch_sharding, create_mesh, replicated_sharding, state_sharding)
    from keras_object_detection_tpu.train.loop import (
        create_train_state, make_train_step)

    devices = jax.devices()[: dp * tp]
    mesh = create_mesh(data_parallel=dp, model_parallel=tp, devices=devices)

    cfg = voc_full_config()
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(cfg.model, image_size=image_size),
        data=dataclasses.replace(cfg.data, batch_size=batch))

    rng = jax.random.PRNGKey(0)
    state_shape = jax.eval_shape(lambda r: create_train_state(cfg, r), rng)
    shardings = state_sharding(mesh, state_shape)
    n_sharded = sum(
        1 for s in jax.tree_util.tree_leaves(
            shardings, is_leaf=lambda x: hasattr(x, "spec"))
        if any(p is not None for p in s.spec))

    def sds(shape, dtype, sharding):
        return jax.ShapeDtypeStruct(shape, dtype, sharding=sharding)

    bsh = batch_sharding(mesh)
    state_in = jax.tree_util.tree_map(
        lambda l, s: sds(l.shape, l.dtype, s), state_shape, shardings,
        is_leaf=lambda x: isinstance(x, jax.ShapeDtypeStruct))
    images = sds((batch, image_size, image_size, 3), np.uint8, bsh)
    boxes = sds((batch, cfg.data.max_boxes_per_image, 5), np.float32, bsh)
    valid = sds((batch, cfg.data.max_boxes_per_image), np.bool_, bsh)
    rng_in = sds((2,), np.uint32, replicated_sharding(mesh))

    step = jax.jit(make_train_step(cfg), donate_argnums=(0,),
                   out_shardings=(shardings, replicated_sharding(mesh)))
    compiled = step.lower(state_in, images, boxes, valid, rng_in).compile()
    stats = collect_collectives(compiled.as_text())
    return {
        "mesh": {"data": dp, "model": tp},
        "tp_sharded_leaves": n_sharded,
        "collectives": stats,
        "total_collective_bytes_per_device": sum(
            v["bytes"] for v in stats.values()),
        "total_collective_ops": sum(v["count"] for v in stats.values()),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32,
                    help="global batch (flagship bench uses 32)")
    ap.add_argument("--image-size", type=int, default=448)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "benchmarks", "tp_comm_analysis.json"))
    args = ap.parse_args()

    assert len(jax.devices()) >= 8, (
        f"need 8 fake CPU devices, have {len(jax.devices())} — run with "
        "XLA_FLAGS=--xla_force_host_platform_device_count=8")

    results = {}
    for name, (dp, tp) in (("dp8", (8, 1)), ("dp4_tp2", (4, 2))):
        print(f"compiling {name} (data={dp}, model={tp}) ...", flush=True)
        results[name] = compile_step(dp, tp, args.batch, args.image_size)
        print(json.dumps(results[name], indent=2), flush=True)

    dp8 = results["dp8"]["total_collective_bytes_per_device"]
    tp2 = results["dp4_tp2"]["total_collective_bytes_per_device"]
    doc = {
        "what": "per-device collective payload bytes per train step, from "
                "optimized HLO of the flagship train step (Darknet-24 "
                f"{args.image_size}^2 bf16, global batch {args.batch}) "
                "AOT-compiled over a fake 8-device CPU mesh",
        "why": "one attached chip -> no wall-clock TP A/B is possible; this "
               "is the honest static measure of what state_sharding's "
               "column-parallel rule adds in communication (VERDICT r2 #8)",
        "configs": results,
        "delta": {
            "extra_bytes_per_device_per_step": tp2 - dp8,
            "ratio_tp_over_dp": (tp2 / dp8) if dp8 else None,
        },
    }
    with open(args.out, "w") as f:
        json.dump(doc, f, indent=2)
        f.write("\n")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
