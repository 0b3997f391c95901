#!/usr/bin/env bash
# Evaluate TUM-VI room sequences, monocular + mono-inertial
# (the reference's Examples/eval_tum_vi.sh loop). Expects:
#   $1 = dataset root containing dataset-room1_512_16/ ... room6
#   $2 = HF-Net weights .npz
#   GT files: $ROOT/<seq>/mav0/mocap0/data_tum.txt (mocap converted to TUM)
set -euo pipefail
ROOT=${1:?dataset root}
WEIGHTS=${2:?weights .npz}
OUT=${OUT:-tumvi_eval}
mkdir -p "$OUT"

for N in 1 2 3 4 5 6; do
  SEQ="dataset-room${N}_512_16"
  GT="$ROOT/$SEQ/mav0/mocap0/data_tum.txt"
  GTARG=""; [ -f "$GT" ] && GTARG="--gt $GT"
  echo "=== $SEQ (mono) ==="
  python examples/run_tum_vi.py "$ROOT/$SEQ/mav0" --weights "$WEIGHTS" \
      --out "$OUT/room${N}_mono.txt" $GTARG | tee "$OUT/room${N}_mono.log"
  echo "=== $SEQ (mono-inertial) ==="
  python examples/run_tum_vi.py "$ROOT/$SEQ/mav0" --imu --weights "$WEIGHTS" \
      --out "$OUT/room${N}_vi.txt" $GTARG | tee "$OUT/room${N}_vi.log"
done
grep -h "ATE RMSE" "$OUT"/*.log || true
