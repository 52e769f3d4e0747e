#!/bin/bash
# Restart-resume driver for the v512 miniVOC-1500 run on the tunneled TPU.
#
# The axon tunnel client retains every H2D transfer in host memory
# (~12 MB per train step at vgg512 b16 — measured by tools/leak_probe.py),
# so a 300-epoch single-process run is OOM-killed around epoch 100
# (kernel log: anon-rss 126 GB). Until the tunnel is fixed, train in
# <=SEGMENT-epoch processes: each exits 0 with a resumable final
# checkpoint (train.py --epochs-per-run), bounding the leak at
# ~SEGMENT x 1.2 GB. Between processes, wait for the exclusive tunnel
# session to release (CLAUDE.md: ~2-3 min).
#
# When the target epoch is reached, runs tools/post_v512.sh (the
# deploy/eval/bench sequence).
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache

# 200, not 240/300: the LR schedule never decays inside this run
# (boundaries 320k/400k steps ~ epoch 3400 at 93 steps/epoch), the
# round-3 run's valid mAP sat in its 0.81-0.85 plateau band from ~e150,
# and at the measured ~87 s/epoch the post-training window (float/int8
# held-out evals, calibration A/B, optional QAT finetune, bench matrix)
# plus evidence-commit time must fit inside the round. 40 extra
# constant-LR epochs buy plateau noise; the post window buys the
# committed evidence this run exists for.
TARGET=200
SEGMENT=60
LOG=runs/v512.log

reached() {
  python - <<'EOF'
import sys
sys.path.insert(0, "/root/repo")
from ssd_tensorflow_tpu.utils.checkpoint import find_checkpoint
path, epoch = find_checkpoint("runs/v512")
print(epoch if epoch is not None else 0)
EOF
}

while true; do
  E=$(reached)
  echo "[seg] reached epoch $E / $TARGET" >> runs/v512_segments.log
  if [ "$E" -ge "$TARGET" ]; then break; fi
  # fresh start (no checkpoint yet) must not pass --continue-training
  CONT="--continue-training yes"
  if [ "$E" -eq 0 ]; then CONT=""; fi
  python train.py --name runs/v512 --data-dir runs/minivoc1500_512 \
    --batch-size 16 --epochs $TARGET --epochs-per-run $SEGMENT \
    --device-augment True --cache-images True --num-workers 0 \
    --checkpoint-interval 25 --tensorboard-dir runs/tb512 \
    $CONT >> "$LOG" 2>&1 &
  echo $! > /tmp/v512.pid
  wait $!
  rc=$?
  echo "[seg] segment exited rc=$rc at $(date -u +%H:%M:%S)" >> runs/v512_segments.log
  if [ "$rc" -ne 0 ]; then
    E2=$(reached)
    # a crashed segment that made no progress would loop forever; stop
    if [ "$E2" -le "$E" ]; then
      echo "[seg] no progress (epoch $E2); aborting" >> runs/v512_segments.log
      exit 1
    fi
  fi
  sleep 150   # tunnel session release
done

echo "[seg] target reached; running post sequence" >> runs/v512_segments.log
rm -f /tmp/v512.pid runs/post_v512/DONE
bash tools/post_v512.sh
