#!/bin/bash
# Serial TPU measurement queue — this session's items (adafactor MFU +
# the cylinder large-batch recipe rows). One process on the TPU at a time.
set -u
cd "$(dirname "$0")/.."
export SEA_BENCH_XLA_CACHE=/tmp/sea_tpu_xla_cache

run() {
  local tag="$1"; shift
  echo "=== [$tag] $*  ($(date -u +%H:%M:%S))" | tee -a /tmp/tpu_queue.log
  "$@" 2>&1 | tee "/tmp/q_${tag}.log" | tail -5
  local rc=${PIPESTATUS[0]}
  echo "=== [$tag] exit=$rc ($(date -u +%H:%M:%S))" | tee -a /tmp/tpu_queue.log
}

run af_shadow   python tools/bench_training.py --case multiphase --batch 8 --dtype bf16_shadow --opt adafactor
run af_mixed    python tools/bench_training.py --case multiphase --batch 8 --dtype bf16_mixed --opt adafactor
run cyl_shadow  python tools/bench_training.py --case cylinder  --batch 8 --dtype bf16_shadow --mu bf16
run cyl_af      python tools/bench_training.py --case cylinder  --batch 8 --dtype bf16_shadow --opt adafactor
echo "=== queue done ($(date -u +%H:%M:%S))" | tee -a /tmp/tpu_queue.log
