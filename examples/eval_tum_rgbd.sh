#!/usr/bin/env bash
# Evaluate TUM-RGBD sequences (the reference's Examples/eval_tum_rgbd.sh
# loop). Expects:
#   $1 = dataset root containing rgbd_dataset_freiburg{1,2,3}_* dirs
#   $2 = HF-Net weights .npz
# Each sequence dir must hold rgb.txt/depth.txt/groundtruth.txt (standard
# TUM-RGBD layout); the freiburg index picks the reference's TUM{1,2,3}.yaml.
set -euo pipefail
ROOT=${1:?dataset root}
WEIGHTS=${2:?weights .npz}
OUT=${OUT:-tumrgbd_eval}
mkdir -p "$OUT"

for SEQ in "$ROOT"/rgbd_dataset_freiburg*; do
  [ -d "$SEQ" ] || continue
  NAME=$(basename "$SEQ")
  FR=$(echo "$NAME" | sed -E 's/.*freiburg([0-9]).*/\1/')
  CFG="/root/reference/Examples/RGB-D/TUM${FR}.yaml"
  echo "=== $NAME ==="
  python examples/run_tum_rgbd.py "$SEQ" --config "$CFG" --weights "$WEIGHTS" \
      --out "$OUT/${NAME}.txt" --gt "$SEQ/groundtruth.txt" \
      | tee "$OUT/${NAME}.log"
done
grep -h "ATE RMSE" "$OUT"/*.log || true
