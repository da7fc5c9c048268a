#!/bin/bash
# Probe the tunneled TPU backend every ~9 min; when it answers, run the
# serial measurement queue (tools/tpu_queue.sh) exactly once.
#
#   tmux new-session -d -s tpu 'bash tools/tpu_probe_then_queue.sh'
#
# The probe is a short-lived `jax.devices()` check: safe to kill on
# timeout (it never reaches a dispatch). Nothing else may use the TPU
# while the queue runs.
set -u
cd "$(dirname "$0")/.."

while true; do
  if timeout 90 python -c "import jax; d=jax.devices()[0]; assert d.platform != 'cpu', d; print('TPU_OK', d.device_kind)" 2>>/tmp/tpu_probe.log | grep -q TPU_OK; then
    echo "TPU UP $(date -u +%F' '%H:%M:%S)" >> /tmp/tpu_probe.log
    bash tools/tpu_queue.sh
    echo "QUEUE DONE $(date -u +%F' '%H:%M:%S)" >> /tmp/tpu_probe.log
    break
  fi
  echo "down $(date -u +%F' '%H:%M:%S)" >> /tmp/tpu_probe.log
  sleep 540
done
