#!/bin/bash
# Full pipeline example: optimize excitation trajectory, simulate
# measurements, identify parameters (with SDP consistency), export URDF.
set -e
cd "$(dirname "$0")/.."
CFG=examples/configs/sevenlink_arm.yaml
MODEL=examples/models/sevenlink_arm.urdf
OUT=${TMPDIR:-/tmp}/flobaroid_sevenlink
mkdir -p "$OUT"

python trajectory.py --config $CFG --model $MODEL --filename "$OUT/trajectory.npz"
python simulator.py  --config $CFG --model $MODEL --trajectory "$OUT/trajectory.npz" --filename "$OUT/measurements.npz"
python identifier.py --config $CFG --model $MODEL \
    --measurements "$OUT/measurements.npz" \
    --model_real $MODEL \
    --model_output "$OUT/identified.urdf" \
    --trajectory "$OUT/trajectory.npz" --plot
echo "artifacts in $OUT"
