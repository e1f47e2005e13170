#!/bin/bash
# Loop: wait for the axon worker, run the resumable queue script
# (default: the current round's), repeat on worker flaps. Stages already
# logged are skipped inside the queue script, so each pass only attempts
# what's missing.
#   usage: tpu_queue_supervisor.sh [queue_script] [supervisor_log]
QUEUE=${1:-scripts/r5_when_tpu_up.sh}
SLOG=${2:-/tmp/r5_supervisor.log}
cd "$(dirname "$0")/.."
while true; do
  rm -f /tmp/tpu_up
  until timeout 30 python -c "
import jax, jax.numpy as jnp
assert float((jnp.ones((256,256))@jnp.ones((256,256))).sum())==256**3
" 2>/dev/null; do
    echo "[sup] $(date +%H:%M:%S) worker down" >> "$SLOG"
    sleep 20
  done
  date > /tmp/tpu_up
  echo "[sup] $(date +%H:%M:%S) worker up, running queue pass" >> "$SLOG"
  bash "$QUEUE"
  echo "[sup] $(date +%H:%M:%S) queue pass ended" >> "$SLOG"
  sleep 30
done
# NOTE: run this INSTEAD of the queue script directly — the axon worker
# flaps on a minutes scale; this loop re-passes after every recovery,
# and stages already logged in the queue's $LOG are skipped inside.
# Keep the box otherwise IDLE: see PERF.md "Environment gotcha" —
# JAX_PLATFORMS=cpu alone does not keep side jobs off the worker.
