#!/bin/bash
# Round-5 mini-COCO accuracy run (VERDICT r4 item 7): train resnet320
# on the COCO-format re-expression of miniVOC-1500
# (tools/make_minicoco.py -> runs/minicoco1500, 80-class label space,
# annotations/instances_*.json + split dirs) so the second annotation
# format has end-to-end *training-scale* evidence, not just the
# mechanical CLI-chain test (tests/test_coco_e2e.py).
#
# Same restart-resume leak mitigation as the other drivers (the tunnel
# client retains every H2D transfer; CLAUDE.md). 100 epochs matches the
# verdict's ask; post = held-out test eval through infer.py
# --data-source coco (the plugin's load_test_data path).
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache

TARGET=${1:-100}
SEGMENT=60
DATA=runs/minicoco1500
NAME=runs/coco_r320
SEGLOG=runs/coco_segments.log
LOG=runs/coco_r320.log

reached() {
  python - "$NAME" <<'EOF'
import sys
sys.path.insert(0, "/root/repo")
from ssd_tensorflow_tpu.utils.checkpoint import find_checkpoint
path, epoch = find_checkpoint(sys.argv[1])
print(epoch if epoch is not None else 0)
EOF
}

echo "[seg] start $(date -u +%H:%M:%S)" >> "$SEGLOG"
while true; do
  E=$(reached)
  echo "[seg] reached epoch $E / $TARGET" >> "$SEGLOG"
  if [ "$E" -ge "$TARGET" ]; then break; fi
  CONT="--continue-training yes"
  if [ "$E" -eq 0 ]; then CONT=""; fi
  python train.py --name "$NAME" --data-dir "$DATA" \
    --batch-size 32 --epochs $TARGET --epochs-per-run $SEGMENT \
    --device-augment True --cache-images True --num-workers 0 \
    --checkpoint-interval 25 $CONT >> "$LOG" 2>&1 &
  echo $! > /tmp/coco.pid
  wait $!
  rc=$?
  echo "[seg] segment exited rc=$rc at $(date -u +%H:%M:%S)" >> "$SEGLOG"
  if [ "$rc" -ne 0 ]; then
    E2=$(reached)
    if [ "$E2" -le "$E" ]; then
      echo "[seg] no progress (epoch $E2); aborting" >> "$SEGLOG"
      exit 1
    fi
  fi
  sleep 150   # tunnel session release
done

# ---------------------------------------------------------------- post
OUT=runs/post_coco
mkdir -p "$OUT"
echo "$(date -u +%H:%M:%S) begin post" >> "$OUT/progress"
timeout 2700 python infer.py --name "$NAME" \
  --training-data "$DATA/training-data.json" \
  --data-source coco --data-dir "$DATA" \
  --sample test --compute-stats True --threshold 0.01 \
  --batch-size 32 --output-dir runs/coco-test \
  > "$OUT/test_float.log" 2>&1
rc=$?  # capture before $(date) clobbers it
echo "$(date -u +%H:%M:%S) done test_float (exit $rc)" >> "$OUT/progress"

grep -oE "Epoch [0-9]+: train mAP [0-9.]+, valid mAP [0-9.]+" "$LOG" \
  > runs/coco_curve.txt
touch runs/coco.DONE
echo "[seg] all done $(date -u +%H:%M:%S)" >> "$SEGLOG"
