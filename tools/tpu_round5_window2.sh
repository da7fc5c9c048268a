#!/bin/bash
# Round-5 end-of-round window (demo loop PAUSED or stopped):
#   1. multiphase demo eval on the held-out TEST split (VERDICT item 4),
#   2. reduced-precision drift table on the FINAL trained weights
#      (bf16 / int8 / int4-cal / bf16+int8KV — CPU legs),
#   3. bench.py (driver headline JSON incl. the new batched cells and
#      mfu_effective fields),
#   4. copy the MP_CAT-format artifacts into docs/demo with _r5 names.
#
#   touch /tmp/demo_pause   # wait for "=== paused" in /tmp/demo_loop.log
#   nohup bash tools/tpu_round5_window2.sh > /tmp/window2_r5.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
export SEA_BENCH_XLA_CACHE=${SEA_BENCH_XLA_CACHE:-/tmp/sea_tpu_xla_cache}
SAVE=${SAVE_DIR:-checkpoints/demo_b}

echo "=== window2 r5 start $(date -u +%H:%M:%S)"
echo "--- multiphase demo eval (test split, final weights)"
timeout 3600 python tools/train_demo.py --case multiphase_flow \
    --stage eval --split test --save_dir "$SAVE" || echo "eval rc=$?"
echo "--- copy MP_CAT-format artifacts"
for idx in 15 16 19 26 4; do
  if [ -f "$SAVE/temporal_original_data_${idx}_0.png" ]; then
    cp "$SAVE/temporal_original_data_${idx}_0.png" \
       "docs/demo/mp_test_original_step${idx}_r5.png"
    cp "$SAVE/temporal_decoded_data_${idx}_0.png" \
       "docs/demo/mp_test_decoded_step${idx}_r5.png"
  fi
done
cp "$SAVE/rollout_error_multiphase_flow_run1.csv" \
   docs/demo/rollout_error_multiphase_test_r5.csv 2>/dev/null
cp "$SAVE/rollout_error_multiphase_flow_run1.png" \
   docs/demo/rollout_error_multiphase_test_r5.png 2>/dev/null
echo "--- drift on final trained weights (CPU legs)"
for d in bf16 int8; do
  timeout 2400 python tools/measure_bf16_drift.py --case multiphase_flow \
      --save_dir "$SAVE" --dtype "$d" || echo "$d rc=$?"
done
timeout 2400 python tools/measure_bf16_drift.py --case multiphase_flow \
    --save_dir "$SAVE" --dtype int4 --int4_scaling cal || echo "int4 rc=$?"
timeout 2400 python tools/measure_bf16_drift.py --case multiphase_flow \
    --save_dir "$SAVE" --dtype bf16 --kv_cache int8 || echo "kv rc=$?"
echo "--- bench.py (final)"
timeout 3600 python bench.py || echo "bench rc=$?"
echo "=== window2 r5 done $(date -u +%H:%M:%S)"
