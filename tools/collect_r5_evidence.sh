#!/bin/bash
# Copy the round-5 run artifacts (mn320 plateau + QAT three-way,
# mini-COCO training, bench matrix) from gitignored runs/ into
# committed docs/evidence/. Idempotent; run after the drivers finish.
set -eu
cd /root/repo

# mn320 plateau retrain (tools/train_mn320_plateau.sh)
if [ -f runs/mn320.log ]; then
  grep -oE "Epoch [0-9]+: train mAP [0-9.]+, valid mAP [0-9.]+" \
    runs/mn320.log > docs/evidence/mn320_curve_r5.txt || true
fi
if [ -d runs/post_mn320 ]; then
  mkdir -p docs/evidence/post_mn320
  for f in progress test_float.log test_ptq.log test_qat.log \
           qat_finetune.log export_ptq.log export_qat.log; do
    [ -f "runs/post_mn320/$f" ] && cp "runs/post_mn320/$f" \
      docs/evidence/post_mn320/
  done
  # keep only the tail of the big eval logs (tqdm noise)
  for f in docs/evidence/post_mn320/test_*.log; do
    [ -f "$f" ] && tail -40 "$f" > "$f.tail" && mv "$f.tail" "$f"
  done
  [ -f docs/evidence/post_mn320/qat_finetune.log ] && \
    grep -aE "^\[i\]" docs/evidence/post_mn320/qat_finetune.log \
      > docs/evidence/post_mn320/qat_finetune.log.clean && \
    mv docs/evidence/post_mn320/qat_finetune.log.clean \
       docs/evidence/post_mn320/qat_finetune.log
fi

# mini-COCO resnet320 run (tools/train_coco_r5.sh)
if [ -f runs/coco_r320.log ]; then
  grep -oE "Epoch [0-9]+: train mAP [0-9.]+, valid mAP [0-9.]+" \
    runs/coco_r320.log > docs/evidence/coco_r320_curve.txt || true
fi
if [ -d runs/post_coco ]; then
  mkdir -p docs/evidence/post_coco
  for f in test_float test_int8_coco export_int8_coco; do
    [ -f "runs/post_coco/$f.log" ] && \
      tail -100 "runs/post_coco/$f.log" \
        > "docs/evidence/post_coco/$f.log"
  done
  [ -f runs/post_coco/progress ] && \
    cp runs/post_coco/progress docs/evidence/post_coco/
fi

# bench matrix (bench.py --mode matrix --out ...)
[ -f runs/bench_matrix_r5.jsonl ] && \
  cp runs/bench_matrix_r5.jsonl docs/evidence/

echo "[i] evidence collected:"
ls docs/evidence/ | sed 's/^/    /'
