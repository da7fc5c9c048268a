#!/bin/bash
# Serial TPU measurement queue — round-3d session items.
# Pause the demo loop first (touch /tmp/demo_pause, wait for "paused" in
# /tmp/demo_loop.log): exactly ONE process may touch the tunneled TPU.
#
#   nohup bash tools/tpu_queue_r3d.sh >/dev/null 2>&1 &
set -u
cd "$(dirname "$0")/.."
export SEA_BENCH_XLA_CACHE=/tmp/sea_tpu_xla_cache

run() {
  local tag="$1"; shift
  echo "=== [$tag] $*  ($(date -u +%H:%M:%S))" | tee -a /tmp/tpu_queue.log
  "$@" > "/tmp/q_${tag}.log" 2>&1
  local rc=$?
  echo "=== [$tag] exit=$rc ($(date -u +%H:%M:%S))" | tee -a /tmp/tpu_queue.log
}

# 1) Rollout profile AFTER the flash-decode kernel landed: where does the
#    int4 multiphase step's remaining non-matvec time go?
run prof_mp_int4 timeout 2400 python tools/profile_rollout.py \
    --case multiphase --dtype int4
# 2) Same for the bf16w headline (85% of weight-stream speed-of-light).
run prof_mp_bf16 timeout 2400 python tools/profile_rollout.py \
    --case multiphase --dtype bf16
# 3) Spatial-stage training throughput (never measured — BASELINE.md gap):
#    both cases at the config batch, f32 and bf16_mixed.
run sp_cyl_f32 timeout 2400 python tools/bench_training.py \
    --stage spatial --case cylinder
run sp_cyl_bf16 timeout 2400 python tools/bench_training.py \
    --stage spatial --case cylinder --dtype bf16_mixed
run sp_mp_f32 timeout 2400 python tools/bench_training.py \
    --stage spatial --case multiphase
run sp_mp_bf16 timeout 2400 python tools/bench_training.py \
    --stage spatial --case multiphase --dtype bf16_mixed

echo "=== queue done ($(date -u +%H:%M:%S))" | tee -a /tmp/tpu_queue.log
