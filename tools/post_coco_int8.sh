#!/bin/bash
# int8 deploy parity on the mini-COCO checkpoint: export the trained
# resnet320 COCO model (80-class label space) with per-input-channel
# folded weights and re-run the held-out test eval, extending the
# zero-deployment-penalty evidence (docs/PERFORMANCE.md, post_v512 /
# post_families) to the second dataset format. Mirrors
# tools/post_families.sh; same tunnel-session pacing.
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
LOG=runs/post_coco
mkdir -p "$LOG"

run() { # name, then the command
  name=$1; shift
  echo "$(date -u +%H:%M:%S) start $name" >> "$LOG/progress"
  timeout 2700 "$@" > "$LOG/$name.log" 2>&1
  rc=$?  # capture before $(date) clobbers it
  echo "$(date -u +%H:%M:%S) done  $name (exit $rc)" >> "$LOG/progress"
  sleep 150  # exclusive tunnel session release
}

CALIB64=$(ls runs/minicoco1500/train/*.jpg | head -64)
CKPT=runs/coco_r320/final.ckpt.npz

run export_int8_coco python export_model.py --checkpoint-file "$CKPT" \
  --output-file runs/coco_r320_int8.npz --quantize \
  --calibration-images $CALIB64

run test_int8_coco python infer.py --bundle runs/coco_r320_int8.npz \
  --training-data runs/minicoco1500/training-data.json \
  --data-source coco --data-dir runs/minicoco1500 \
  --sample test --compute-stats True --threshold 0.01 \
  --batch-size 32 --output-dir runs/coco-test-int8

touch "$LOG/INT8_DONE"
echo "$(date -u +%H:%M:%S) int8 post done" >> "$LOG/progress"
