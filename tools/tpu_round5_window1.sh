#!/bin/bash
# Round-5 TPU measurement window 1 (run while the demo loop is PAUSED):
#   1. MFU levers A/B (hash dropout + fused AdaLN) on cylinder AND
#      multiphase, interleaved repeats with spread (VERDICT items 1, 9),
#   2. scan-vs-prefix re-A/B WITH the shipped cond-table hoist
#      (VERDICT item 2) — cylinder + multiphase f32 at B=1,
#   3. cylinder half of the serving matrix: batched rollout bf16w/int4w
#      x KV-cache dtypes incl. int8 (VERDICT item 7),
#   4. int4 TP per-shard kernel no-regression (VERDICT item 5),
#   5. ring-attention memory analysis dense vs flash at long T
#      (VERDICT item 6),
#   6. bench.py (new mfu_effective fields).
#
#   touch /tmp/demo_pause    # wait for "=== paused" in /tmp/demo_loop.log
#   nohup bash tools/tpu_round5_window1.sh > /tmp/window1_r5.log 2>&1 &
#   rm /tmp/demo_pause       # after it finishes
set -u
cd "$(dirname "$0")/.."
export SEA_BENCH_XLA_CACHE=${SEA_BENCH_XLA_CACHE:-/tmp/sea_tpu_xla_cache}

echo "=== window1 r5 start $(date -u +%H:%M:%S)"
echo "--- levers A/B cylinder"
timeout 2400 python tools/bench_r5_levers.py --case cylinder_flow \
    --repeats 3 || echo "levers cyl rc=$?"
echo "--- levers A/B multiphase"
timeout 2400 python tools/bench_r5_levers.py --case multiphase_flow \
    --repeats 3 || echo "levers mp rc=$?"
echo "--- scan vs prefix (post-hoist) f32 B=1"
timeout 1200 python tools/bench_scan_vs_prefix.py --case cylinder \
    --dtype f32 --batch 1 || echo "svp cyl rc=$?"
timeout 1200 python tools/bench_scan_vs_prefix.py --case multiphase \
    --dtype f32 --batch 1 || echo "svp mp rc=$?"
timeout 1200 python tools/bench_scan_vs_prefix.py --case cylinder \
    --dtype bf16 --batch 1 || echo "svp cyl bf16 rc=$?"
echo "--- cylinder batched serving matrix (bf16w/int4w x kv)"
timeout 3000 python tools/bench_batched_rollout.py \
    --cases cylinder_flow --dtypes bf16,int4 --batches 4,8 \
    --kv auto,int8 || echo "batched cyl rc=$?"
echo "--- int4 TP per-shard kernel throughput"
timeout 1200 python tools/bench_int4_tp_shard.py || echo "int4 tp rc=$?"
echo "--- ring memory analysis (dense vs flash, T=8192)"
timeout 1800 python tools/measure_ring_memory.py --t 8192 --run \
    --check || echo "ring mem rc=$?"
echo "--- bench.py"
timeout 3600 python bench.py || echo "bench rc=$?"
echo "=== window1 r5 done $(date -u +%H:%M:%S)"
