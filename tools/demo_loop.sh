#!/bin/bash
# Unattended retrain loop for the learning-quality demos (docs/demo).
# Interleaves BOTH shipped presets (cylinder_flow, multiphase_flow):
# spatial chunks for each case first, then alternating temporal chunks,
# with a periodic val-split rollout eval per case. Checkpoints share one
# save dir (family names embed the case name), so each chunk resumes.
#
#   nohup bash tools/demo_loop.sh & echo $! > /tmp/demo_loop.pid
#
# Pause/resume (so TPU benchmarks can interleave — exactly ONE process may
# touch the tunneled TPU at a time):
#   touch /tmp/demo_pause      # loop finishes the current chunk, then waits
#   rm /tmp/demo_pause         # resumes
#
# Generous `timeout` is a hang safety net only — chunks normally exit on
# their own. Never SIGTERM a chunk mid-dispatch by hand (wedges the tunnel).
set -u
cd "$(dirname "$0")/.."
SAVE=${SAVE_DIR:-checkpoints/demo_b}
LOG=${LOG:-/tmp/demo_loop.log}
CASES=${CASES:-"cylinder_flow multiphase_flow"}
SPATIAL_CHUNKS=${SPATIAL_CHUNKS:-4}   # ~120 epochs each (R^2 saturates ~500)
EVAL_EVERY=${EVAL_EVERY:-4}           # val-split rollout cadence (rounds)

wait_if_paused() {
  if [ -f /tmp/demo_pause ]; then
    echo "=== paused $(date -u +%H:%M:%S)" >> "$LOG"
    while [ -f /tmp/demo_pause ]; do sleep 15; done
    echo "=== resumed $(date -u +%H:%M:%S)" >> "$LOG"
  fi
}

echo "=== demo loop start $(date -u +%H:%M:%S) save=$SAVE cases=$CASES" >> "$LOG"
for case in $CASES; do
  for i in $(seq 1 "$SPATIAL_CHUNKS"); do
    wait_if_paused
    echo "=== $case spatial chunk $i $(date -u +%H:%M:%S)" >> "$LOG"
    timeout 5400 python tools/train_demo.py --case "$case" --stage spatial \
        --epochs 120 --save_dir "$SAVE" >> "$LOG" 2>&1 \
        || echo "$case spatial chunk rc=$?" >> "$LOG"
  done
done

i=0
while :; do
  i=$((i + 1))
  for case in $CASES; do
    wait_if_paused
    echo "=== $case temporal chunk $i $(date -u +%H:%M:%S)" >> "$LOG"
    timeout 5400 python tools/train_demo.py --case "$case" --stage temporal \
        --epochs 65 --save_dir "$SAVE" >> "$LOG" 2>&1 \
        || echo "$case temporal chunk rc=$?" >> "$LOG"
    if [ $((i % EVAL_EVERY)) -eq 0 ]; then
      echo "=== $case val eval after round $i $(date -u +%H:%M:%S)" >> "$LOG"
      timeout 3600 python tools/train_demo.py --case "$case" --stage eval \
          --split val --save_dir "$SAVE" >> "$LOG" 2>&1 \
          || echo "$case eval rc=$?" >> "$LOG"
    fi
  done
done
