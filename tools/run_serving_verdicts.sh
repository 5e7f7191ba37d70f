#!/bin/bash
# Round-5 serving verdicts (results: benchmarks/nms_mode_verdict.json,
# benchmarks/int8_latency_verdict.json — curated from the per-run JSON lines
# these stages print).
#
# Two measurement debts from the round-4 verdict:
#   #4  Fast-NMS and Soft-NMS ship without a measured quality+latency verdict.
#       -> tools/serving_map.py on the hard-trained fpn416 champion with
#          --nms-mode hard|fast|soft_gaussian, each with --latency (fused p50
#          AND pipelined device-time), on the HARD val split (crowding =
#          soft-NMS's claimed win case) and the EASY val split.
#   #5  Static-scale int8 has no demonstrated latency payoff over dynamic.
#       -> --serving int8 with dynamic scales (no calib) vs static MSE scales
#          (--calib-images 64) on the flagship AND fpn champion checkpoints,
#          each with --latency: the verdict is the batch-32 device-time column.
#
# Usage: bash tools/run_serving_verdicts.sh [fpn_ckpt_dir] [flag_ckpt_dir]
# Ops rules as in run_hard_campaign.sh: sequential, abort-flag gated, one TPU
# process at a time.
set -u
cd "$(dirname "$0")/.."
FPN_CKPT=${1:-/tmp/r5_fpn_hard/ckpt}
FLAG_CKPT=${2:-/tmp/r5_flag_hard/ckpt}
ABORT=/tmp/queue_abort
rm -f "$ABORT"
echo "serving-verdicts pid $$"

run_stage() {
  name=$1; script=$2; shift 2
  if [ -e "$ABORT" ]; then echo "ABORTED before $name"; exit 1; fi
  echo "=== STAGE $name start $(date +%T) ==="
  start=$(date +%s)
  stdbuf -oL -eL timeout 2400 \
    python "$script" "$@" > "/tmp/serve_$name.log" 2>&1
  echo "=== STAGE $name done rc=$? in $(( $(date +%s) - start ))s ==="
}
stage() { name=$1; shift; run_stage "$name" tools/serving_map.py "$@"; }

# --- champion quality on non-saturating metrics ----------------------------
# mAP@0.5 saturates even on hard data for this family (round-5 pilot); the
# discriminative lanes are localization precision: mAP@0.75 and COCO
# mAP@[.50:.95], plus TIDE error decomposition + per-class AP.
stage champ_map75 --checkpoint-dir "$FPN_CKPT" --data /tmp/synth448h/val \
  --batch-size 32 --max-boxes 16 --use-ema --map-iou 0.75
run_stage champ_coco evaluate.py --checkpoint-dir "$FPN_CKPT" \
  --data-dir /tmp/synth448h/val --coco-map --use-ema
run_stage champ_tide evaluate.py --checkpoint-dir "$FPN_CKPT" \
  --data-dir /tmp/synth448h/val --error-analysis --per-class-ap --use-ema \
  --names /tmp/synth448h/synth.names

# --- NMS-mode verdict: fpn416 hard champion, batch 32, EMA params ----------
NMSCOMMON="--checkpoint-dir $FPN_CKPT --batch-size 32 --max-boxes 16 --use-ema --latency"
for mode in hard fast soft_gaussian; do
  stage "nms_${mode}_hard" $NMSCOMMON --data /tmp/synth448h/val --nms-mode "$mode"
  stage "nms_${mode}_easy" $NMSCOMMON --data /tmp/synth448c/val --nms-mode "$mode"
done

# --- int8 static-vs-dynamic latency verdict --------------------------------
# dynamic scales = per-image activation ranges computed on device;
# static  scales = MSE-calibrated compile-time constants (the only reason to
# want them is latency — measure whether they actually buy any).
I8FPN="--checkpoint-dir $FPN_CKPT --data /tmp/synth448h/val --batch-size 32 --max-boxes 16 --use-ema --serving int8 --latency 32"
stage int8_fpn_dynamic $I8FPN
stage int8_fpn_static  $I8FPN --calib-images 64
I8FLAG="--checkpoint-dir $FLAG_CKPT --data /tmp/synth448h/val --batch-size 32 --max-boxes 16 --use-ema --serving int8 --latency 32"
stage int8_flag_dynamic $I8FLAG
stage int8_flag_static  $I8FLAG --calib-images 64
# float reference rows for the same checkpoints/data (latency + mAP anchor)
stage float_fpn  --checkpoint-dir "$FPN_CKPT" --data /tmp/synth448h/val \
  --batch-size 32 --max-boxes 16 --use-ema --latency
stage float_flag --checkpoint-dir "$FLAG_CKPT" --data /tmp/synth448h/val \
  --batch-size 32 --max-boxes 16 --use-ema --latency

# --- per-step device breakdowns for the EXACT trained configs --------------
# (max-boxes 16 + hard mosaic make the step costlier than the round-4
# breakdowns measured at max-boxes 8 — these pin the device-step rate that
# the epoch-wall decomposition is judged against, r4 verdict weak #2)
run_stage bkdn_fpn tools/train_step_breakdown.py --checkpoint "$FPN_CKPT" --scan 16 \
  --out benchmarks/train_step_breakdown_fpn416_hard.json
run_stage bkdn_flag tools/train_step_breakdown.py --checkpoint "$FLAG_CKPT" --scan 16 \
  --out benchmarks/train_step_breakdown_flagship448_hard.json

echo ALL_SERVING_STAGES_DONE
