#!/usr/bin/env bash
# TUM-VI benchmark-matrix runner: analogue of the reference's
# tum_vi_examples.sh / tum_vi_eval_examples.sh (rooms/corridors x
# {mono, stereo} +- IMU on the fisheye KB8 rig).
#
# Usage: TUMVI_ROOT=/data/tumvi scripts/tum_vi_examples.sh [TUM_512.yaml]
set -u
ROOT="${TUMVI_ROOT:?set TUMVI_ROOT to the TUM-VI dataset directory}"
SETTINGS="${1:-}"
[ -n "$SETTINGS" ] && SETTINGS_ARG="--settings $SETTINGS" || SETTINGS_ARG=""
OUT="${OUT_DIR:-results}"
mkdir -p "$OUT"

SEQS="${SEQS:-room1 room2 room3 room4 room5 room6 corridor1 corridor2}"
SENSORS="${SENSORS:-mono stereo mono_imu stereo_imu}"

for seq in $SEQS; do
  d="$ROOT/dataset-${seq}_512_16"
  [ -d "$d" ] || d="$ROOT/$seq"
  [ -d "$d" ] || { echo "skip $seq (not found)"; continue; }
  for sensor in $SENSORS; do
    echo "=== $seq $sensor ==="
    python -m tpuslam.run --dataset tum_vi --path "$d" \
      --sensor "$sensor" $SETTINGS_ARG --eval \
      --output "$OUT/f_${seq}_${sensor}.txt" \
      --kf-output "$OUT/kf_${seq}_${sensor}.txt" --timing
  done
done
