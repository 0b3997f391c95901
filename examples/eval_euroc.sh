#!/usr/bin/env bash
# Evaluate all EuRoC machine-hall sequences, monocular + mono-inertial
# (the reference's Examples/eval_euroc.sh loop). Expects:
#   $1 = dataset root containing MH_01_easy/ ... MH_05_difficult/
#   $2 = HF-Net weights .npz (converted via tools/convert_hfnet_weights.py)
# Ground truths: the reference vendors left-cam GT at
# /root/reference/evaluation/Ground_truth/EuRoC_left_cam/.
set -euo pipefail
ROOT=${1:?dataset root}
WEIGHTS=${2:?weights .npz}
GT_DIR=/root/reference/evaluation/Ground_truth/EuRoC_left_cam
OUT=${OUT:-euroc_eval}
mkdir -p "$OUT"

for SEQ in MH_01_easy MH_02_easy MH_03_medium MH_04_difficult MH_05_difficult; do
  SHORT=$(echo "$SEQ" | cut -d_ -f1,2 | tr -d _)   # MH01 ...
  GT="$GT_DIR/${SHORT}_GT.txt"
  echo "=== $SEQ (mono) ==="
  python examples/run_euroc.py "$ROOT/$SEQ/mav0" --weights "$WEIGHTS" \
      --out "$OUT/${SHORT}_mono.txt" --gt "$GT" | tee "$OUT/${SHORT}_mono.log"
  echo "=== $SEQ (mono-inertial) ==="
  python examples/run_euroc_inertial.py "$ROOT/$SEQ/mav0" --weights "$WEIGHTS" \
      --out "$OUT/${SHORT}_vi.txt" --gt "$GT" | tee "$OUT/${SHORT}_vi.log"
done
grep -h "ATE RMSE" "$OUT"/*.log
