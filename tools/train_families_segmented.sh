#!/bin/bash
# Restart-resume driver for the resnet320 + mobilenet320 miniVOC-1500
# accuracy runs (the second and third model families), one after the
# other on the tunneled TPU. Same leak mitigation as
# tools/train_v512_segmented.sh: the tunnel client retains every H2D
# transfer, so train in <=SEGMENT-epoch processes and wait ~2-3 min
# between processes for the exclusive session to release.
#
# After both runs: held-out test eval of each final checkpoint
# (the post evidence for the family accuracy claims).
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache

TARGET=250
SEGMENT=80
SEGLOG=runs/families_segments.log

reached() { # run dir
  python - "$1" <<'EOF'
import sys
sys.path.insert(0, "/root/repo")
from ssd_tensorflow_tpu.utils.checkpoint import find_checkpoint
path, epoch = find_checkpoint(sys.argv[1])
print(epoch if epoch is not None else 0)
EOF
}

train_family() { # run_name data_dir batch
  local NAME=$1 DATA=$2 BATCH=$3
  local LOG=runs/$NAME.log
  while true; do
    E=$(reached "runs/$NAME")
    echo "[seg] $NAME reached epoch $E / $TARGET" >> "$SEGLOG"
    if [ "$E" -ge "$TARGET" ]; then break; fi
    CONT="--continue-training yes"
    if [ "$E" -eq 0 ]; then CONT=""; fi
    python train.py --name "runs/$NAME" --data-dir "$DATA" \
      --batch-size "$BATCH" --epochs $TARGET --epochs-per-run $SEGMENT \
      --device-augment True --cache-images True --num-workers 0 \
      --checkpoint-interval 25 $CONT >> "$LOG" 2>&1 &
    echo $! > /tmp/families.pid
    wait $!
    rc=$?
    echo "[seg] $NAME segment exited rc=$rc at $(date -u +%H:%M:%S)" >> "$SEGLOG"
    if [ "$rc" -ne 0 ]; then
      E2=$(reached "runs/$NAME")
      if [ "$E2" -le "$E" ]; then
        echo "[seg] $NAME no progress (epoch $E2); aborting" >> "$SEGLOG"
        return 1
      fi
    fi
    sleep 150   # tunnel session release
  done
  return 0
}

post_eval() { # run_name data_dir
  local NAME=$1 DATA=$2
  local OUT=runs/post_$NAME
  mkdir -p "$OUT"
  echo "[seg] $NAME post eval at $(date -u +%H:%M:%S)" >> "$SEGLOG"
  timeout 2700 python infer.py --name "runs/$NAME" \
    --training-data "$DATA/training-data.json" \
    --data-source pascal_voc --data-dir "$DATA" \
    --sample test --compute-stats True --pascal-summary True \
    --threshold 0.01 --batch-size 32 \
    --output-dir "runs/$NAME-test" > "$OUT/test_float.log" 2>&1
  echo "[seg] $NAME post eval exit $? " >> "$SEGLOG"
  sleep 150
}

echo "[seg] start $(date -u +%H:%M:%S)" > "$SEGLOG"
train_family resnet320 runs/minivoc1500_r320 32 || true
sleep 30
train_family mn320 runs/minivoc1500_mn320 32 || true
sleep 30
post_eval resnet320 runs/minivoc1500_r320
post_eval mn320 runs/minivoc1500_mn320
touch runs/families.DONE
echo "[seg] all done $(date -u +%H:%M:%S)" >> "$SEGLOG"
