#!/bin/bash
# Round-4 TPU measurement window 2 (end of round, demo loop PAUSED/stopped):
#   1. batched-rollout KV-cache A/B (int8 caches vs policy — VERDICT item 6),
#   2. multiphase demo eval (test split) + reduced-precision drift table on
#      the TRAINED multiphase weights (VERDICT item 4),
#   3. bench.py (the driver's headline JSON, now incl. the cylinder train row).
#
#   touch /tmp/demo_pause   # or stop the loop
#   bash tools/tpu_round4_window2.sh > /tmp/window2.log 2>&1
set -u
cd "$(dirname "$0")/.."
export SEA_BENCH_XLA_CACHE=${SEA_BENCH_XLA_CACHE:-/tmp/sea_tpu_xla_cache}
SAVE=${SAVE_DIR:-checkpoints/demo_b}

echo "=== window2 start $(date -u +%H:%M:%S)"
echo "--- batched rollout: int8-cache A/B (multiphase int4 + bf16, B=4/8)"
timeout 3600 python tools/bench_batched_rollout.py \
    --cases multiphase_flow --dtypes int4,bf16 --batches 4,8 \
    --kv auto,int8 || echo "rc=$?"
echo "--- multiphase demo eval (test split)"
timeout 3600 python tools/train_demo.py --case multiphase_flow \
    --stage eval --split test --save_dir "$SAVE" || echo "rc=$?"
echo "--- drift on trained multiphase weights (bf16 / int8 / int4-cal)"
for d in bf16 int8; do
  timeout 1800 python tools/measure_bf16_drift.py --case multiphase_flow \
      --save_dir "$SAVE" --dtype "$d" || echo "$d rc=$?"
done
timeout 1800 python tools/measure_bf16_drift.py --case multiphase_flow \
    --save_dir "$SAVE" --dtype int4 --int4_scaling cal || echo "int4 rc=$?"
echo "--- int8 KV-cache drift on trained multiphase weights"
timeout 1800 python tools/measure_bf16_drift.py --case multiphase_flow \
    --save_dir "$SAVE" --dtype bf16 --kv_cache int8 || echo "kv rc=$?"
echo "--- cylinder serving cond-hoist A/B (AdaLN tables out of the scan)"
timeout 1800 python - << 'PYEOF' || echo "hoist A/B rc=$?"
import json
import bench
from sea_tpu.configs.cylinder_flow import get_case
cfg = get_case().temporal
out = {}
for dtype in ("f32", "bf16"):
    for hoist in (True, False):
        bench.PRECOMPUTE_COND = hoist
        sps, _ = bench.bench_rollout(cfg, 399, dtype=dtype,
                                     key_base=80 + hoist)
        out[f"cylinder_{dtype}_hoist_{hoist}"] = round(sps, 1)
bench.PRECOMPUTE_COND = True
print(json.dumps(out))
PYEOF
echo "--- bench.py (driver headline)"
timeout 5400 python bench.py || echo "bench rc=$?"
echo "=== window2 done $(date -u +%H:%M:%S)"
