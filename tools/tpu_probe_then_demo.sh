#!/bin/bash
# Probe the tunneled TPU until it answers, then run the unattended demo
# retrain loop (tools/demo_loop.sh) for the case(s) in $CASES.
#
#   CASES=multiphase_flow nohup bash tools/tpu_probe_then_demo.sh \
#       > /tmp/probe_demo.log 2>&1 & echo $! > /tmp/probe_demo.pid
#
# The probe is jax.devices()-only (never reaches a dispatch, safe to
# time out). demo_loop.sh honors /tmp/demo_pause for interleaving TPU
# benchmarks.
set -u
cd "$(dirname "$0")/.."

while true; do
  if timeout 90 python -c "import jax; d=jax.devices()[0]; assert d.platform != 'cpu', d; print('TPU_OK', d.device_kind)" 2>>/tmp/tpu_probe.log | grep -q TPU_OK; then
    echo "TPU UP $(date -u +%F' '%H:%M:%S)" >> /tmp/tpu_probe.log
    exec bash tools/demo_loop.sh
  fi
  echo "down $(date -u +%F' '%H:%M:%S)" >> /tmp/tpu_probe.log
  sleep 120
done
