#!/usr/bin/env python
"""Assemble the round-5 hard-campaign benchmark artifacts from the raw
workdirs that tools/run_hard_campaign.sh leaves in /tmp.

Produces (committed under benchmarks/):
  - synth_training_fpn416_hard.json      (champion recipe on hard448)
  - synth_training_flagship448_hard.json (conv-head flagship on hard448)
  - quality_ab_campaign_hard.json        (one-knob-per-arm table on hard224)

Pure file munging — no JAX, safe to run while the TPU is busy."""

from __future__ import annotations

import argparse
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "benchmarks")

DATASETS = {
    "hard448": ("python tools/make_synthetic_dataset.py --out /tmp/synth448h "
                "--train 5000 --val 500 --image-size 448 --hard --seed 5"),
    "hard224": ("python tools/make_synthetic_dataset.py --out /tmp/synth224h "
                "--train 2000 --val 200 --hard --seed 1"),
}


def load_results(workdir: str) -> dict:
    with open(os.path.join(workdir, "results.json")) as f:
        return json.load(f)


def curve_from_log(workdir: str) -> dict:
    """Sparse val_mAP curve {epoch: mAP} from the train JSONL log."""
    path = os.path.join(workdir, "logs", "train.jsonl")
    curve = {}
    if os.path.exists(path):
        for line in open(path):
            try:
                rec = json.loads(line)
            except ValueError:
                continue
            if "val_mAP" in rec:
                curve[str(rec["step"])] = round(rec["val_mAP"], 5)
    return curve


def stage_command(name: str) -> str:
    """Recover the exact harness invocation from the campaign script."""
    # the committed campaign script is the source of truth; cite it
    return (f"bash tools/run_hard_campaign.sh (stage {name}; see the script "
            f"for the exact run_synth_benchmark.py flags)")


def big_run(workdir: str, stage: str, dataset_key: str, extra: dict) -> dict:
    r = load_results(workdir)
    r["val_mAP_curve"] = curve_from_log(workdir)
    r["dataset"] = DATASETS[dataset_key]
    r["command"] = stage_command(stage)
    r.update(extra)
    return r


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--champion", default="/tmp/r5_fpn_hard")
    p.add_argument("--flagship", default="/tmp/r5_flag_hard")
    p.add_argument("--arms-glob", default="/tmp/abh_")
    p.add_argument("--skip-missing", action="store_true")
    args = p.parse_args()

    wrote = []
    for workdir, stage, out_name, key in (
            (args.champion, "champion", "synth_training_fpn416_hard.json",
             "hard448"),
            (args.flagship, "flagship", "synth_training_flagship448_hard.json",
             "hard448")):
        try:
            r = big_run(workdir, stage, key, {})
        except FileNotFoundError:
            if args.skip_missing:
                print(f"skip {stage}: no results.json in {workdir}")
                continue
            raise
        out = os.path.join(BENCH, out_name)
        with open(out, "w") as f:
            json.dump(r, f, indent=1)
        wrote.append(out)

    # --- A/B arm table ------------------------------------------------------
    arm_names = ["base", "mixup", "mscale", "anchor", "passthru", "anchmos",
                 "anchmosign", "fpnpilot"]
    knobs = {
        "base": "shared baseline recipe (darknet_tiny conv head)",
        "mixup": "DataConfig.mixup_prob=0.15",
        "mscale": "TrainConfig.multiscale_sizes=(192,224,256)",
        "anchor": "head=anchor, 5 IoU-k-means priors",
        "passthru": "head=anchor + ModelConfig.passthrough=True",
        "anchmos": "head=anchor + mosaic_prob=0.5",
        "anchmosign": "head=anchor + mosaic 0.5 + ignore_threshold 0.6",
        "fpnpilot": ("head=fpn 2-scale, 6 anchors, leaky_relu, mosaic 0.5, "
                     "ignore 0.5, obj_target=iou (champion structure at tiny "
                     "scale)"),
    }
    base = None
    arms = []
    for name in arm_names:
        wd = f"{args.arms_glob}{name}"
        try:
            r = load_results(wd)
        except FileNotFoundError:
            print(f"skip arm {name}: no results.json in {wd}")
            continue
        row = {
            "arm": name,
            "knob": knobs[name],
            "final_val_mAP": round(r.get("val_mAP", float("nan")), 4),
            "peak_val_mAP": round(r.get("val_mAP_peak",
                                        r.get("val_mAP", float("nan"))), 4),
            "best_ckpt_val_mAP": round(r["best_ckpt_val_mAP"], 4)
            if "best_ckpt_val_mAP" in r else None,
            "train_wall_s": r.get("train_wall_s"),
            "images_per_s_train": r.get("images_per_s_train"),
        }
        if name == "base":
            base = row
        else:
            arms.append(row)
    for row in arms:
        if base and row["final_val_mAP"] == row["final_val_mAP"]:
            row["delta_final_vs_base"] = round(
                row["final_val_mAP"] - base["final_val_mAP"], 4)
    if base or arms:
        table = {
            "description": (
                "Round-5 quality A/B campaign on the HARD synthetic benchmark "
                "(small objects 0.04-0.28, up to 10/image, 6 unlabeled "
                "distractors, occlusion; 2000 train / 200 val at 224x224, "
                "data seed 1). Same structure as the round-3 easy campaign "
                "(benchmarks/quality_ab_campaign.json): darknet_tiny, batch "
                "16, 300 epochs, Adam constant 1e-3 + plateau 0.5/15/1e-4, "
                "EMA 0.999, device_cache, train seed 0, --max-boxes 16. "
                "All arms on the real TPU v5e chip, strictly sequential. "
                "mAP is VOC-style mAP@0.5, EMA serving params, conf 0.25."),
            "dataset": DATASETS["hard224"],
            "command": "bash tools/run_hard_campaign.sh (arm stages)",
            "baseline": base,
            "arms": arms,
        }
        out = os.path.join(BENCH, "quality_ab_campaign_hard.json")
        with open(out, "w") as f:
            json.dump(table, f, indent=1)
        wrote.append(out)
    print("wrote:", *wrote, sep="\n  ")


if __name__ == "__main__":
    main()
