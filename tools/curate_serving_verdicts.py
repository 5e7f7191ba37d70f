#!/usr/bin/env python
"""Assemble the round-5 serving-verdict artifacts from the JSON lines that
tools/run_serving_verdicts.sh leaves in /tmp/serve_*.log.

Produces (committed under benchmarks/):
  - nms_mode_verdict.json     (hard|fast|soft_gaussian x hard/easy val:
                               serving mAP + fused device latency per mode)
  - int8_latency_verdict.json (dynamic vs static activation scales x
                               flagship/fpn: device latency + mAP columns)

Pure file munging — no JAX."""

from __future__ import annotations

import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "benchmarks")


def last_json_line(path: str):
    if not os.path.exists(path):
        return None
    out = None
    for line in open(path):
        line = line.strip()
        if line.startswith("{"):
            try:
                out = json.loads(line)
            except ValueError:
                pass
    return out


def main():
    # --- NMS-mode matrix ----------------------------------------------------
    rows = []
    for mode in ("hard", "fast", "soft_gaussian"):
        for split in ("hard", "easy"):
            r = last_json_line(f"/tmp/serve_nms_{mode}_{split}.log")
            if r is None:
                print(f"skip nms {mode}/{split}: no JSON line")
                continue
            rows.append({
                "nms_mode": mode,
                "val_split": split,
                "serving_mAP": r["serving_mAP"],
                "images": r["images"],
                "fused_p50_ms_b1": r.get("fused_p50_ms_b1"),
                "fused_device_ms_b1": r.get("fused_device_ms_b1"),
                "fused_p50_ms_b32": r.get("fused_p50_ms_b32"),
                "fused_device_ms_b32": r.get("fused_device_ms_b32"),
            })
    if rows:
        with open(os.path.join(BENCH, "nms_mode_verdict.json"), "w") as f:
            json.dump({
                "description": (
                    "NMS-mode quality+latency verdict on the hard-trained "
                    "fpn416 champion (EMA serving params, batch 32, top-512 "
                    "candidate compaction). 'hard' val = crowded small-object "
                    "split (soft-NMS's claimed win case); 'easy' val = the "
                    "round-4 5000-image benchmark's split. Latency is the "
                    "fused forward+decode+NMS program: wall p50 (relay-RTT "
                    "bound here) and the pipelined device-time lane "
                    "(the deployable number). Measured by "
                    "tools/run_serving_verdicts.sh -> tools/serving_map.py."),
                "rows": rows,
            }, f, indent=1)
        print("wrote nms_mode_verdict.json", f"({len(rows)} rows)")

    # --- int8 static-vs-dynamic ---------------------------------------------
    irows = []
    for fam, ck in (("fpn416", "fpn"), ("flagship448", "flag")):
        for scales, name in (("float", f"float_{ck}"),
                             ("dynamic", f"int8_{ck}_dynamic"),
                             ("static_mse64", f"int8_{ck}_static")):
            r = last_json_line(f"/tmp/serve_{name}.log")
            if r is None:
                print(f"skip int8 {fam}/{scales}: no JSON line")
                continue
            irows.append({
                "family": fam,
                "scales": scales,
                "serving_mAP_hard_val": r["serving_mAP"],
                "fused_p50_ms_b1": r.get("fused_p50_ms_b1"),
                "fused_device_ms_b1": r.get("fused_device_ms_b1"),
                "fused_p50_ms_b32": r.get("fused_p50_ms_b32"),
                "fused_device_ms_b32": r.get("fused_device_ms_b32"),
            })
    if irows:
        with open(os.path.join(BENCH, "int8_latency_verdict.json"), "w") as f:
            json.dump({
                "description": (
                    "Static-vs-dynamic int8 activation-scale latency verdict "
                    "(round-4 weak #5): true int8 serving (BN-fold, "
                    "s8xs8->s32) with per-image dynamic scales vs static "
                    "MSE-calibrated (64 images) compile-time-constant "
                    "scales, on the hard-trained flagship448 and fpn416 "
                    "checkpoints; float rows anchor quality+latency. The "
                    "verdict column is fused_device_ms_b32: static scales "
                    "only earn their quality cost if they beat dynamic "
                    "there. mAP on the hard val split, EMA params. Measured "
                    "by tools/run_serving_verdicts.sh."),
                "rows": irows,
            }, f, indent=1)
        print("wrote int8_latency_verdict.json", f"({len(irows)} rows)")


if __name__ == "__main__":
    main()
