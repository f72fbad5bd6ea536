#!/usr/bin/env bash
# Fetch EuRoC MAV sequences into data/euroc/<name>/ (ASL format, the layout
# tpuslam.run --dataset euroc consumes; same data the reference's
# euroc_examples.sh runs on).
#
# NOTE: this build/test environment has no network egress, so the script
# cannot run here — it documents the exact acquisition path for a deployment
# with internet access. Offline, scripts/make_synth_euroc.py renders a
# synthetic sequence in the same ASL layout with reference-format ground
# truth so the full run.py --eval path is exercised end-to-end.
set -euo pipefail

BASE="http://robotics.ethz.ch/~asl-datasets/ijrr_euroc_mav_dataset"
OUT="${2:-data/euroc}"

declare -A SEQS=(
  [MH01]="machine_hall/MH_01_easy/MH_01_easy.zip"
  [MH02]="machine_hall/MH_02_easy/MH_02_easy.zip"
  [MH03]="machine_hall/MH_03_medium/MH_03_medium.zip"
  [MH04]="machine_hall/MH_04_difficult/MH_04_difficult.zip"
  [MH05]="machine_hall/MH_05_difficult/MH_05_difficult.zip"
  [V101]="vicon_room1/V1_01_easy/V1_01_easy.zip"
  [V102]="vicon_room1/V1_02_medium/V1_02_medium.zip"
  [V103]="vicon_room1/V1_03_difficult/V1_03_difficult.zip"
  [V201]="vicon_room2/V2_01_easy/V2_01_easy.zip"
  [V202]="vicon_room2/V2_02_medium/V2_02_medium.zip"
  [V203]="vicon_room2/V2_03_difficult/V2_03_difficult.zip"
)

name="${1:-MH01}"
rel="${SEQS[$name]:-}"
if [[ -z "$rel" ]]; then
  echo "unknown sequence '$name'; choose from: ${!SEQS[*]}" >&2
  exit 1
fi

mkdir -p "$OUT/$name"
zip="$OUT/$name.zip"
echo "fetching $BASE/$rel -> $zip"
wget -c -O "$zip" "$BASE/$rel"
unzip -o -q "$zip" -d "$OUT/$name"
rm -f "$zip"
echo "ready: $OUT/$name/mav0"
echo "run:   python -m tpuslam.run --dataset euroc --path $OUT/$name \\"
echo "         --settings config/eu.yaml --sensor mono --eval"
