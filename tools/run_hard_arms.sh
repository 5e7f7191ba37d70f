#!/bin/bash
# The A/B-arm tail of tools/run_hard_campaign.sh as a standalone queue, so the
# arms can be (re)started independently of the two big hard448 runs — e.g.
# after the serving-verdict stages when the champion/flagship checkpoints are
# already on disk. Arms are independently reportable; run as many as the
# session clock allows (tools/curate_hard_results.py --skip-missing copes
# with absent arms). Same ops rules as the parent script.
#
# Usage: bash tools/run_hard_arms.sh [arm ...]   (default: all 8)
set -u
cd "$(dirname "$0")/.."
ABORT=/tmp/queue_abort
rm -f "$ABORT"
echo "arms pid $$"

stage() {
  name=$1; tmo=$2; shift 2
  if [ -e "$ABORT" ]; then echo "ABORTED before $name"; exit 1; fi
  echo "=== STAGE $name start $(date +%T) ==="
  start=$(date +%s)
  stdbuf -oL -eL timeout "$tmo" \
    python tools/run_synth_benchmark.py "$@" > "/tmp/hard_$name.log" 2>&1
  echo "=== STAGE $name done rc=$? in $(( $(date +%s) - start ))s ==="
}

COMMON="--data /tmp/synth224h --epochs 300 --plateau 0.5,15,1e-4 --ema 0.999 --map-start 150 --map-every 25 --device-cache --seed 0 --max-boxes 16"

arm() { name=$1; shift; stage "$name" 2700 $COMMON --workdir "/tmp/abh_$name" "$@"; }

run_one() {
  case $1 in
    base)       arm base ;;
    mixup)      arm mixup      --mixup 0.15 ;;
    mscale)     arm mscale     --multiscale 192,224,256 ;;
    anchor)     arm anchor     --head anchor --anchors kmeans:5 ;;
    passthru)   arm passthru   --head anchor --anchors kmeans:5 --passthrough ;;
    anchmos)    arm anchmos    --head anchor --anchors kmeans:5 --mosaic 0.5 ;;
    anchmosign) arm anchmosign --head anchor --anchors kmeans:5 --mosaic 0.5 --ignore-threshold 0.6 ;;
    fpnpilot)   arm fpnpilot   --head fpn --fpn-scales 2 --anchors kmeans:6 \
                  --activation leaky_relu --mosaic 0.5 --ignore-threshold 0.5 \
                  --obj-target iou ;;
    *) echo "unknown arm $1"; exit 2 ;;
  esac
}

if [ $# -gt 0 ]; then
  for a in "$@"; do run_one "$a"; done
else
  for a in base mixup mscale anchor passthru anchmos anchmosign fpnpilot; do
    run_one "$a"
  done
fi
echo ALL_ARMS_DONE
