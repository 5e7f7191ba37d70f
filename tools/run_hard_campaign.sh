#!/bin/bash
# Round-5 hard-benchmark campaign (results: benchmarks/synth_training_fpn416_hard.json,
# benchmarks/synth_training_flagship448_hard.json, benchmarks/quality_ab_campaign_hard.json).
#
# The round-4 champion saturated the easy 5000-image benchmark (val mAP 0.993),
# so every quality A/B there is noise-bound at the ceiling. This campaign moves
# the quality signal to the --hard dataset variant (small objects 0.04-0.28,
# up to 10 per image, 6 unlabeled distractors, occlusion on — see
# tools/make_synthetic_dataset.py --hard):
#   1. the fpn416 champion recipe on hard448 (plus mAP@0.75 / COCO scoring,
#      which stay discriminative even if mAP@0.5 re-saturates),
#   2. the conv-head flagship on the same data (family ranking on hard),
#   3. one-knob-per-arm re-verdicts at hard224/darknet_tiny for the knobs the
#      round-3 campaign measured NEGATIVE on easy data (mixup, multiscale,
#      passthrough, ignore-stacking) — crowding/small-objects is exactly the
#      regime those knobs claim to help.
#
# Datasets:
#   python tools/make_synthetic_dataset.py --out /tmp/synth448h --train 5000 \
#       --val 500 --image-size 448 --hard --seed 5
#   python tools/make_synthetic_dataset.py --out /tmp/synth224h --train 2000 \
#       --val 200 --hard --seed 1
#
# Ops rules (CLAUDE.md): one TPU process at a time, stages strictly
# sequential, every stage gated on the /tmp/queue_abort flag file, stdbuf
# line-buffering so logs never look like stalls, and NO side processes while
# a stage runs.
set -u
cd "$(dirname "$0")/.."
ABORT=/tmp/queue_abort
rm -f "$ABORT"
echo "campaign pid $$"

stage() {
  name=$1; tmo=$2; shift 2
  if [ -e "$ABORT" ]; then echo "ABORTED before $name"; exit 1; fi
  echo "=== STAGE $name start $(date +%T) ==="
  start=$(date +%s)
  stdbuf -oL -eL timeout "$tmo" \
    python tools/run_synth_benchmark.py "$@" > "/tmp/hard_$name.log" 2>&1
  echo "=== STAGE $name done rc=$? in $(( $(date +%s) - start ))s ==="
}

# 1) champion: the round-4 fpn416 recipe, unchanged except --max-boxes 16
# (hard images carry up to 10 labeled objects; the easy default of 8 would
# truncate single images, not just mosaic composites) and whole-epoch scan
# dispatch (round-5 steps_per_dispatch, host overhead ~0.5 s/epoch).
stage champion 12600 \
  --data /tmp/synth448h --workdir /tmp/r5_fpn_hard --epochs 350 \
  --batch-size 32 --image-size 416 --grid 13 --num-classes 20 \
  --backbone darknet53 --head fpn --fpn-scales 3 --anchors kmeans:9 \
  --activation leaky_relu --lr 1e-3 --schedule cosine_restarts --t-max 50 \
  --t-mult 2 --decay 0.5 --eta-min 1e-5 --plateau '' --ema 0.999 \
  --mosaic 0.5 --ignore-threshold 0.5 --obj-target iou \
  --map-start 100 --map-every 50 --device-cache --save-cooldown 15 \
  --max-boxes 16 --steps-per-dispatch -1

# 2) flagship conv-head on the same hard data (350 = a cosine cycle
# boundary, so the final epoch is comparable across runs — round-4 verdict
# weak #7; the round-3 easy run used 400 and ended mid-warm-phase).
stage flagship 7200 \
  --data /tmp/synth448h --workdir /tmp/r5_flag_hard --epochs 350 \
  --batch-size 32 --image-size 448 --backbone darknet24 --lr 1e-3 \
  --schedule cosine_restarts --t-max 50 --t-mult 2 --decay 0.5 \
  --eta-min 1e-5 --plateau '' --ema 0.999 --map-start 100 --map-every 50 \
  --device-cache --save-cooldown 15 --max-boxes 16 --steps-per-dispatch -1

# 3) A/B arms: identical structure to the round-3 easy campaign
# (tools/run_ab_campaign.sh) so deltas are read the same way — darknet_tiny,
# batch 16, 300 epochs, constant lr + plateau, EMA, data seed 1 (hard) /
# train seed 0. Only --max-boxes differs (16, same reason as above).
COMMON="--data /tmp/synth224h --epochs 300 --plateau 0.5,15,1e-4 --ema 0.999 --map-start 150 --map-every 25 --device-cache --seed 0 --max-boxes 16"

arm() { name=$1; shift; stage "$name" 2700 $COMMON --workdir "/tmp/abh_$name" "$@"; }

arm base
arm mixup      --mixup 0.15
arm mscale     --multiscale 192,224,256
arm anchor     --head anchor --anchors kmeans:5
arm passthru   --head anchor --anchors kmeans:5 --passthrough
arm anchmos    --head anchor --anchors kmeans:5 --mosaic 0.5
arm anchmosign --head anchor --anchors kmeans:5 --mosaic 0.5 --ignore-threshold 0.6
# tiny-fpn pilot: the champion structure at darknet_tiny/224 scale — the
# scale where round 3 measured fpn NEGATIVE on easy data
arm fpnpilot   --head fpn --fpn-scales 2 --anchors kmeans:6 \
  --activation leaky_relu --mosaic 0.5 --ignore-threshold 0.5 --obj-target iou

echo ALL_STAGES_DONE
