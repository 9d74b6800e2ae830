#!/usr/bin/env bash
# One-command Cityscapes→Foggy DAF reproduction (BASELINE.md: mAP 32.3±0.5).
#
# Prerequisites:
#   1. Data: run tools/prepare_cityscapes_voc.py (needs the official
#      Cityscapes + Foggy downloads) so $TLLOD_DATA_DIR/cityscape/VOC2007
#      exists.
#   2. Weights: put vgg16_caffe.pth (the caffe-pretrained torchvision-layout
#      VGG16 every reference method initializes from — reference
#      lib/model/faster_rcnn/vgg16.py:26, download per reference README)
#      into $TLLOD_PRETRAINED_DIR (default ./pretrained_model).
#
# Trains the reference recipe (methods/DAF/DAF_train.sh: bs 1, lr 2e-3,
# lr_decay_step 6, 10 epochs), evaluates epochs 6..10 on test_t like
# DAF_test.sh, prints the best mAP, and exits nonzero if it misses
# 32.3±0.5 (pass ASSERT_MAP=0 to skip the assertion, e.g. for smoke runs).
set -euo pipefail
cd "$(dirname "$0")/.."

: "${TLLOD_DATA_DIR:?set TLLOD_DATA_DIR to the prepared dataset root}"
SAVE_DIR="${SAVE_DIR:-output}"
SESSION="${SESSION:-1}"
ASSERT_MAP="${ASSERT_MAP:-1}"
EXPECTED="${EXPECTED:-32.3}"
TOL="${TOL:-0.5}"

test -d "$TLLOD_DATA_DIR/cityscape/VOC2007" || {
  echo "no dataset at $TLLOD_DATA_DIR/cityscape/VOC2007 — run" >&2
  echo "  python tools/prepare_cityscapes_voc.py --cityscapes_root ..." >&2
  exit 2
}
PRET="${TLLOD_PRETRAINED_DIR:-pretrained_model}/vgg16_caffe.pth"
test -f "$PRET" || {
  echo "WARNING: $PRET missing — training from random init will NOT reach" >&2
  echo "the published mAP (see header for the weights convention)" >&2
}

python methods/DAF/DAF_train.py --dataset cityscape --net vgg16 \
  --bs 1 --lr 2e-3 --lr_decay_step 6 --epochs 10 --s "$SESSION" \
  --save_dir "$SAVE_DIR"

BEST=-1
for E in 6 7 8 9 10; do
  CKPT=$(ls -1 "$SAVE_DIR/vgg16/cityscape/daf_${SESSION}_${E}_"* 2>/dev/null \
         | head -1) || true
  [ -n "${CKPT:-}" ] || { echo "no checkpoint for epoch $E"; continue; }
  LOG=$(mktemp)
  python methods/DAF/DAF_test.py --dataset cityscape --part test_t \
    --net vgg16 --load_name "$CKPT" --output_dir "$SAVE_DIR/eval_e$E" \
    | tee "$LOG"
  MAP=$(awk '/Mean AP/ {print $NF * 100}' "$LOG" | tail -1)
  echo "epoch $E: mAP $MAP"
  BEST=$(python -c "print(max($BEST, $MAP))")
done

echo "best mAP over epochs 6-10: $BEST (expected $EXPECTED ± $TOL)"
if [ "$ASSERT_MAP" = "1" ]; then
  python - "$BEST" "$EXPECTED" "$TOL" <<'EOF'
import sys
best, exp, tol = map(float, sys.argv[1:4])
ok = best >= exp - tol
print(f"ACCEPTANCE {'PASS' if ok else 'FAIL'}: {best:.1f} vs {exp}±{tol}")
sys.exit(0 if ok else 1)
EOF
fi
