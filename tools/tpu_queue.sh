#!/bin/bash
# Serial TPU measurement queue — round-3 items pending from the tunnel
# outage (docs/ROUND3.md NOTE). Run inside tmux: long compiles over the
# tunneled backend must never be SIGTERM'd mid-dispatch (that wedges the
# tunnel for ~15-20 min for all clients).
#
#   tmux new-session -d -s tpu 'bash tools/tpu_queue.sh'
#
# Exactly ONE process may touch the TPU at a time; do not run anything
# else TPU-side while this is going.
set -u
cd "$(dirname "$0")/.."
export SEA_BENCH_XLA_CACHE=/tmp/sea_tpu_xla_cache

run() {
  local tag="$1"; shift
  echo "=== [$tag] $*  ($(date -u +%H:%M:%S))" | tee -a /tmp/tpu_queue.log
  "$@" 2>&1 | tee "/tmp/q_${tag}.log" | tail -20
  local rc=${PIPESTATUS[0]}  # the benchmark's status, not tail's
  echo "=== [$tag] exit=$rc ($(date -u +%H:%M:%S))" | tee -a /tmp/tpu_queue.log
}

# 1) Shadow-policy train step vs the measured bf16_mixed 21.3 ms / 45.7%.
run shadow python tools/bench_training.py --case multiphase --batch 8 \
    --dtype bf16_shadow --mu bf16
# 2) Same with remat='dots' (activation-traffic lever at large B).
run shadow_remat python tools/bench_training.py --case multiphase --batch 8 \
    --dtype bf16_shadow --mu bf16 --remat dots
# 3) bf16_mixed + remat for comparison.
run mixed_remat python tools/bench_training.py --case multiphase --batch 8 \
    --dtype bf16_mixed --mu bf16 --remat dots
# 4) Data-path A/B: host batching vs device-resident minibatch gather.
run resident python tools/bench_resident_data.py --case multiphase \
    --batch 8 --steps 30
# 5) Full headline bench (also warms the persistent XLA cache for the
#    driver's end-of-round run).
run bench python bench.py

echo "=== queue done ($(date -u +%H:%M:%S))" | tee -a /tmp/tpu_queue.log
