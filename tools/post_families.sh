#!/bin/bash
# Post-training deploy/eval/bench sequence for the resnet320 and
# mobilenet320 miniVOC-1500 runs (the family analog of
# tools/post_v512.sh). Run after tools/train_families_segmented.sh
# touches runs/families.DONE:
#   1. int8 deploy bundle export per family (per-channel folded scales,
#      models/quantized.quantize_weights_folded), calibrated on 64 real
#      train JPEGs
#   2. held-out test eval of each int8 bundle (float evals were already
#      written by the segmented driver) — the family int8 parity evidence
#   3. bench.py int8 + float for both presets on the real chip
# Logs land in runs/post_families/; the file DONE marks completion.
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
LOG=runs/post_families
mkdir -p "$LOG"

run() { # name, then the command
  name=$1; shift
  echo "$(date -u +%H:%M:%S) start $name" >> "$LOG/progress"
  timeout 2700 "$@" > "$LOG/$name.log" 2>&1
  rc=$?  # capture before $(date) clobbers it
  echo "$(date -u +%H:%M:%S) done  $name (exit $rc)" >> "$LOG/progress"
  sleep 150  # exclusive tunnel session release
}

echo "$(date -u +%H:%M:%S) begin" > "$LOG/progress"

CALIB64=$(ls runs/minivoc1500_512/trainval/VOCdevkit/VOC2007/JPEGImages/*.jpg | head -64)

family() { # run_name data_dir preset
  local NAME=$1 DATA=$2 PRESET=$3
  local CKPT=runs/$NAME/final.ckpt.npz
  [ -f "$CKPT" ] || CKPT=$(ls runs/$NAME/e*.ckpt.npz | sort -V | tail -1)
  run export_int8_$NAME python export_model.py --checkpoint-file "$CKPT" \
    --output-file runs/${NAME}_int8.npz --quantize \
    --calibration-images $CALIB64
  run test_int8_$NAME python infer.py --bundle runs/${NAME}_int8.npz \
    --training-data "$DATA/training-data.json" \
    --data-source pascal_voc --data-dir "$DATA" \
    --sample test --compute-stats True --threshold 0.01 \
    --batch-size 32 --output-dir runs/$NAME-test-int8
  run bench_int8_$NAME python bench.py --preset $PRESET \
    --bundle runs/${NAME}_int8.npz
  run bench_float_$NAME python bench.py --preset $PRESET --float
}

family resnet320 runs/minivoc1500_r320 resnet320
family mn320 runs/minivoc1500_mn320 mobilenet320

touch "$LOG/DONE"
echo "$(date -u +%H:%M:%S) all done" >> "$LOG/progress"
