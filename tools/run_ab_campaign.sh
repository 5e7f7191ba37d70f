#!/bin/bash
# Round-3 quality A/B campaign on the tiny synthetic benchmark
# (results: benchmarks/quality_ab_campaign.json).
#
# Each arm flips exactly ONE knob against the shared baseline recipe; arms
# run strictly sequentially (one TPU process at a time — see CLAUDE.md).
# Dataset: python tools/make_synthetic_dataset.py --out /tmp/synth_big \
#            --train 2000 --val 200 --seed 1
set -u
cd "$(dirname "$0")/.."
COMMON="--data /tmp/synth_big --epochs 300 --plateau 0.5,15,1e-4 --ema 0.999 --map-start 150 --map-every 25 --device-cache --seed 0"

run_arm() {
  name=$1; shift
  echo "=== ARM $name: $* ==="
  start=$(date +%s)
  timeout 3600 python tools/run_synth_benchmark.py $COMMON \
    --workdir "/tmp/ab_$name" "$@" > "/tmp/ab_$name.log" 2>&1
  echo "=== ARM $name done rc=$? in $(( $(date +%s) - start ))s ==="
}

run_arm base
run_arm mosaic   --mosaic 0.5
run_arm mixup    --mixup 0.15
run_arm moxmix   --mosaic 0.5 --mixup 0.15
run_arm mscale   --multiscale 192,224,256
run_arm anchor   --head anchor --anchors kmeans:5
# round-3 follow-ups: YOLOv2 passthrough tap, and stacking the two winners
run_arm passthru --head anchor --anchors kmeans:5 --passthrough
run_arm anchmos  --head anchor --anchors kmeans:5 --mosaic 0.5
# stack ALL the measured positives (mosaic +0.072, anchor +0.025,
# ignore_threshold +0.065-over-anchor) into one best-recipe arm
run_arm anchmosign --head anchor --anchors kmeans:5 --mosaic 0.5 \
  --ignore-threshold 0.6
echo ALL_ARMS_DONE
