#!/bin/bash
# Unattended retrain loop for the learning-quality demo (docs/demo).
# /tmp checkpoints do not persist between sessions, so each session that
# wants fresh demo numbers re-trains; this loop runs train_demo.py chunks
# back to back so the TPU is never idle while other (CPU) work happens.
#
#   tmux new-session -d -s demo 'bash tools/demo_loop.sh'
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
SAVE=${SAVE_DIR:-/tmp/demo_b}
LOG=${LOG:-/tmp/demo_loop.log}
SPATIAL_CHUNKS=${SPATIAL_CHUNKS:-4}   # ~120 epochs each (R^2 saturates ~500)
EVAL_EVERY=${EVAL_EVERY:-4}           # val-split rollout cadence (chunks)

wait_if_paused() {
  if [ -f /tmp/demo_pause ]; then
    echo "=== paused $(date -u +%H:%M:%S)" >> "$LOG"
    while [ -f /tmp/demo_pause ]; do sleep 15; done
    echo "=== resumed $(date -u +%H:%M:%S)" >> "$LOG"
  fi
}

echo "=== demo loop start $(date -u +%H:%M:%S) save=$SAVE" >> "$LOG"
for i in $(seq 1 "$SPATIAL_CHUNKS"); do
  wait_if_paused
  echo "=== spatial chunk $i $(date -u +%H:%M:%S)" >> "$LOG"
  timeout 5400 python tools/train_demo.py --stage spatial --epochs 120 \
      --save_dir "$SAVE" >> "$LOG" 2>&1 || echo "spatial chunk rc=$?" >> "$LOG"
done

i=0
while :; do
  wait_if_paused
  i=$((i + 1))
  echo "=== temporal chunk $i $(date -u +%H:%M:%S)" >> "$LOG"
  timeout 5400 python tools/train_demo.py --stage temporal --epochs 65 \
      --save_dir "$SAVE" >> "$LOG" 2>&1 || echo "temporal chunk rc=$?" >> "$LOG"
  if [ $((i % EVAL_EVERY)) -eq 0 ]; then
    echo "=== val eval after chunk $i $(date -u +%H:%M:%S)" >> "$LOG"
    timeout 3600 python tools/train_demo.py --stage eval --split val \
        --save_dir "$SAVE" >> "$LOG" 2>&1 || echo "eval rc=$?" >> "$LOG"
  fi
done
