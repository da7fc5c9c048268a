#!/bin/bash
# Round-4 TPU measurement window 1 (run while the demo loop is PAUSED):
#   1. profile the cylinder train step at the shipped recipe (VERDICT
#      item 5: find what bounds it at ~32% MFU),
#   2. profile the same step with the flash kernel forced off (attention
#      attribution),
#   3. mesh-of-1 shard_map kernel-overhead A/B (VERDICT item 1 done-bar),
#   4. scan-vs-prefix B sweep (refine select_engine's PREFIX_MAX_BATCH).
#
#   touch /tmp/demo_pause    # wait for "=== paused" in /tmp/demo_loop.log
#   bash tools/tpu_round4_window1.sh > /tmp/window1.log 2>&1
#   rm /tmp/demo_pause
set -u
cd "$(dirname "$0")/.."
export SEA_BENCH_XLA_CACHE=${SEA_BENCH_XLA_CACHE:-/tmp/sea_tpu_xla_cache}

echo "=== window1 start $(date -u +%H:%M:%S)"
echo "--- cylinder train profile (recipe: shadow B=8 bf16mu, kernels auto)"
timeout 1200 python tools/profile_train_step.py --case cylinder \
    --dtype bf16_shadow --batch 8 --mu bf16 || echo "profile rc=$?"
echo "--- cylinder train profile (kernels off: XLA attention)"
timeout 1200 python tools/profile_train_step.py --case cylinder \
    --dtype bf16_shadow --batch 8 --mu bf16 --impl xla || echo "rc=$?"
echo "--- mesh-of-1 shard_map kernel overhead"
timeout 1200 python tools/bench_kernel_shard.py || echo "rc=$?"
echo "--- scan vs prefix, cylinder f32, B sweep"
for b in 1 2 4; do
  timeout 1200 python tools/bench_scan_vs_prefix.py --case cylinder \
      --dtype f32 --batch "$b" || echo "B=$b rc=$?"
done
echo "=== window1 done $(date -u +%H:%M:%S)"
