#!/bin/bash
# Round-3 TPU queue: waits for the axon worker to recover (watcher
# /tmp/tpu_watch.sh touches /tmp/tpu_up), then runs the measurement
# campaign in value order. Every stage is resumable / skip-if-done so
# the script survives worker crashes mid-queue — just relaunch it.
#
#   1. bench sweep + size ladder      (scripts/r3_tpu_campaign.sh)
#   2. Ghia Re=100/400/1000 TPU rows  (scripts/validate_ghia.py)
#   3. Taylor-Green 32^3              (main.py simulate taylor_green)
#   4. DFG 2D-2 unsteady, ~1 h        (scripts/validate_dfg2d2.py)
#   5. DFG 2D-1 accuracy campaign     (R3_LONG=1 stage, hours)
set -u
cd "$(dirname "$0")/.."
LOG=${R3_LOG:-/tmp/r3_campaign.log}
export PYTHONPATH="/root/repo:${PYTHONPATH:-}"
say() { echo "[r3-up] $(date +%H:%M:%S) $*" | tee -a "$LOG"; }

while [ ! -f /tmp/tpu_up ]; do sleep 60; done
say "TPU worker is back ($(cat /tmp/tpu_up)); starting queue"

say "stage A: bench sweep + size ladder"
bash scripts/r3_tpu_campaign.sh

if ! grep -q "GHIA_TPU_DONE" "$LOG" 2>/dev/null; then
  say "stage B: Ghia Re rows (TPU)"
  timeout 3600 python scripts/validate_ghia.py 2>&1 | tee -a "$LOG" \
    && say "GHIA_TPU_DONE"
fi

if ! grep -q "TG32_DONE" "$LOG" 2>/dev/null; then
  say "stage C: Taylor-Green 32^3"
  timeout 3600 python main.py simulate --simulation taylor_green \
    --T 0.05 --dt 0.01 --nx 32 --name tg32 --output_dir /tmp/tg32 \
    2>&1 | tail -20 | tee -a "$LOG" \
    && { cat /tmp/tg32/taylor_green/*tg32/err.txt | tee -a "$LOG"; \
         say "TG32_DONE"; }
fi

if ! grep -q "DFG2D2_DONE" "$LOG" 2>/dev/null; then
  say "stage D: DFG 2D-2 unsteady (res 0.5, T 12, ~1 h)"
  timeout 14400 python scripts/validate_dfg2d2.py 2>&1 | tail -30 \
    | tee -a "$LOG" && say "DFG2D2_DONE"
fi

say "stage E: accuracy campaign (R3_LONG)"
R3_LONG=1 bash scripts/r3_tpu_campaign.sh || true

say "queue complete"
