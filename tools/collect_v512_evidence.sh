#!/bin/bash
# Copy the load-bearing v512 run artifacts into committed evidence
# (docs/evidence/README.md convention: runs/ is gitignored and the VM is
# ephemeral). Run after tools/post_v512.sh touches runs/post_v512/DONE.
set -eu
cd /root/repo
OUT=docs/evidence/post_v512
mkdir -p "$OUT"

# per-epoch curve (train/valid mAP lines only)
grep -o "Epoch [0-9]*: train mAP [0-9.]*, valid mAP [0-9.]*" runs/v512.log \
  > docs/evidence/v512_curve.txt
cp runs/v512_segments.log docs/evidence/v512_segments.log 2>/dev/null || true

# post-sequence logs, progress-bar spam stripped
for f in runs/post_v512/*.log; do
  base=$(basename "$f")
  # tqdm progress bars are \r-separated on one line; keep the last state
  sed -e 's/\r/\n/g' "$f" | grep -v -E "^\s*$|[0-9]+%\|" > "$OUT/$base" || true
done
cp runs/post_v512/progress "$OUT/progress"

# final mAP lines, for quick reading
{
  echo "== float test eval (runs/v512-test)"
  grep -E "mAP|AP " "$OUT/test_float.log" | tail -25
  echo "== int8 bundle test eval, pct 99.9 / 16 imgs (runs/v512-test-int8)"
  grep -E "mAP|AP " "$OUT/test_int8.log" | tail -25
  echo "== int8 bundle test eval, pct 100 / 64 imgs (runs/v512-test-int8-p100)"
  grep -E "mAP|AP " "$OUT/test_int8_p100.log" | tail -25
  grep "shipping" "$OUT/progress"
  echo "== bench JSON lines"
  grep -h '"metric"' "$OUT"/bench_*.log
} > "$OUT/SUMMARY.txt" || true
echo "evidence collected under $OUT"
