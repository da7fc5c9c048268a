#!/bin/bash
# Serial TPU measurement queue — round-3 continuation session.
# Pause the demo loop first (touch /tmp/demo_pause, wait for the current
# chunk to exit), then run this; resume with rm /tmp/demo_pause.
# Exactly ONE process may touch the tunneled TPU at a time.
set -u
cd "$(dirname "$0")/.."
export SEA_BENCH_XLA_CACHE=/tmp/sea_tpu_xla_cache

run() {
  local tag="$1"; shift
  echo "=== [$tag] $*  ($(date -u +%H:%M:%S))" | tee -a /tmp/tpu_queue.log
  "$@" 2>&1 | tee "/tmp/q_${tag}.log" | tail -6
  local rc=${PIPESTATUS[0]}
  echo "=== [$tag] exit=$rc ($(date -u +%H:%M:%S))" | tee -a /tmp/tpu_queue.log
}

# Stage-1 (spatial) train-step rows — never measured before.
run spatial_cyl_f32 python tools/bench_training.py --stage spatial \
    --case cylinder
run spatial_cyl_bf16m python tools/bench_training.py --stage spatial \
    --case cylinder --dtype bf16_mixed
run spatial_mp_f32 python tools/bench_training.py --stage spatial \
    --case multiphase
run spatial_mp_bf16m python tools/bench_training.py --stage spatial \
    --case multiphase --dtype bf16_mixed

# Where does the int4 rollout step's remaining time go (post kernel+fusion)?
run prof_int4 python tools/profile_rollout.py --case multiphase --dtype int4

# Full headline bench refresh (also warms the XLA cache for the driver's
# end-of-round run).
run bench python bench.py

echo "=== queue done ($(date -u +%H:%M:%S))" | tee -a /tmp/tpu_queue.log
