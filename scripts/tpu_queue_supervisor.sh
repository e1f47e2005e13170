#!/bin/bash
# Loop: wait for the axon worker, run the resumable round-4 queue,
# repeat on worker flaps. Stages already logged are skipped inside
# r4_when_tpu_up.sh, so each pass only attempts what's missing.
cd "$(dirname "$0")/.."
while true; do
  rm -f /tmp/tpu_up
  until timeout 120 python -c "
import jax, jax.numpy as jnp
assert float((jnp.ones((256,256))@jnp.ones((256,256))).sum())==256**3
" 2>/dev/null; do
    echo "[r4-sup] $(date +%H:%M:%S) worker down" >> /tmp/r4_supervisor.log
    sleep 90
  done
  date > /tmp/tpu_up
  echo "[r4-sup] $(date +%H:%M:%S) worker up, running queue pass" >> /tmp/r4_supervisor.log
  bash scripts/r4_when_tpu_up.sh
  echo "[r4-sup] $(date +%H:%M:%S) queue pass ended" >> /tmp/r4_supervisor.log
  sleep 60
done
# NOTE (round 4): run this INSTEAD of r4_when_tpu_up.sh directly — the
# axon worker flaps (up 03:48, down again by 04:13 on 2026-08-19), and a
# single queue pass walks its remaining stages with 2x180s probe waits
# each, then exits. This loop re-passes after every recovery; stages
# already logged in $R4_LOG are skipped inside the queue script.
# Keep the box otherwise IDLE: see PERF.md "Environment gotcha" —
# JAX_PLATFORMS=cpu alone does not keep side jobs off the worker.
