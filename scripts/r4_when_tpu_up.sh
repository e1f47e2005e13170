#!/bin/bash
# Round-4 TPU queue: waits for the axon worker to recover (watcher
# /tmp/tpu_watch.sh touches /tmp/tpu_up), then runs measurements in
# VERDICT round-3 priority order. Resumable: stages skip if their tag
# is already in the log — relaunch after any worker crash.
#
#   0. tuned 106k bench (BENCH_r04 target: >= 1.5 steps/s)   [item 3]
#   1. size ladder >= 500k, attempt ~1M                      [item 2]
#   2. full k-sweep + remaining ladder (r3_tpu_campaign.sh)
#   3. Ghia TPU rows / Taylor-Green / DFG 2D-2 rerun
#   4. DFG 2D-1 accuracy campaign (P2 dp + fine ring)        [item 4]
set -u
cd "$(dirname "$0")/.."
LOG=${R4_LOG:-/tmp/r4_campaign.log}
export PYTHONPATH="/root/repo:${PYTHONPATH:-}"
# persistent compile cache: big-size retries after worker flaps reload
# the executable instead of recompiling (also set in bench.py child)
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cc_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=10
say() { echo "[r4-up] $(date +%H:%M:%S) $*" | tee -a "$LOG"; }

probe() {
  timeout 120 python -c "
import jax, jax.numpy as jnp
assert float((jnp.ones((256,256))@jnp.ones((256,256))).sum())==256**3
" 2>/dev/null
}

run_bench() {  # name, env...
  name=$1; shift
  if grep -q "\"tag\": \"$name\"" "$LOG" 2>/dev/null; then
    say "skip $name (already logged)"; return 0
  fi
  if ! probe; then say "TPU unhealthy before $name; waiting 180s"; sleep 180;
    probe || { say "TPU still unhealthy, skipping $name"; return 1; }
  fi
  say "start $name: $*"
  out=$(env "$@" BENCH_TIMEOUT=1800 timeout 2000 python bench.py 2>/tmp/r4_stderr.log)
  code=$?
  line=$(echo "$out" | grep -o '{.*}' | tail -1)
  if echo "$line" | grep -q '_cpu_'; then
    # worker died mid-bench and bench.py fell back to CPU: record it
    # under a non-matching tag so the next supervisor pass retries
    echo "{\"tag\": \"${name}_cpufallback\", \"exit\": $code, \"result\": ${line:-null}}" >> "$LOG"
    say "CPU fallback on $name (worker flapped) -> will retry next pass"
    return 1
  fi
  echo "{\"tag\": \"$name\", \"exit\": $code, \"result\": ${line:-null}}" >> "$LOG"
  say "done $name -> $line (exit $code)"
}

while [ ! -f /tmp/tpu_up ]; do sleep 60; done
say "TPU worker is back ($(cat /tmp/tpu_up)); starting round-4 queue"

# -- stage 0: the BENCH_r04 target measurement first, alone -----------
# (tuned config IS bench.py's default: rasamg_sup, u=0, p=5, jac-lag,
# ras=32, pc_lag_steps=4, stats_every=4, 106k DOF)
run_bench r4_106k_tuned BENCH_STEPS=8 BENCH_SKIP_SMALL=1 BENCH_PROBE_BUDGET=120

# -- stage 1: the >= 500k ladder (VERDICT item 2) ----------------------
# bandwidth levers at the target size: bf16 PC + g=8 supernode rows
run_bench r4_106k_bf16g8 BENCH_STEPS=8 BENCH_SKIP_SMALL=1 BENCH_PROBE_BUDGET=120 BENCH_PC_DTYPE=bf16 BENCH_SUPERNODE_G=8
run_bench r4_500k BENCH_SKIP_SMALL=1 BENCH_PROBE_BUDGET=120  BENCH_RES_SCALE=0.14 BENCH_STEPS=4
run_bench r4_950k BENCH_SKIP_SMALL=1 BENCH_PROBE_BUDGET=120  BENCH_RES_SCALE=0.10 BENCH_STEPS=4
# bf16 PC + g=8 supernodes: the bandwidth levers matter most at scale
run_bench r4_500k_bf16g8 BENCH_SKIP_SMALL=1 BENCH_PROBE_BUDGET=120 BENCH_RES_SCALE=0.14 BENCH_PC_DTYPE=bf16 BENCH_SUPERNODE_G=8
# developed-regime arms: warmup past the impulsive-start transient
run_bench r4_106k_warm BENCH_STEPS=8 BENCH_WARMUP=6 BENCH_SKIP_SMALL=1 BENCH_PROBE_BUDGET=120
run_bench r4_500k_warm BENCH_WARMUP=4 BENCH_SKIP_SMALL=1 BENCH_PROBE_BUDGET=120 BENCH_RES_SCALE=0.14
run_bench r4_950k_bf16g8 BENCH_SKIP_SMALL=1 BENCH_PROBE_BUDGET=120 BENCH_RES_SCALE=0.10 BENCH_PC_DTYPE=bf16 BENCH_SUPERNODE_G=8

# -- stage 2: the r3 sweep (tuning data; resumable, shares its own log)
R3_LOG=${R3_LOG:-/tmp/r3_campaign.log} bash scripts/r3_tpu_campaign.sh

# -- stage 3: validation rows ------------------------------------------
if ! grep -q "GHIA_TPU_DONE" "$LOG" 2>/dev/null; then
  say "stage 3a: Ghia Re rows (TPU)"
  timeout 3600 python scripts/validate_ghia.py 2>&1 | tee -a "$LOG" \
    && say "GHIA_TPU_DONE"
fi
if ! grep -q "TG32_DONE" "$LOG" 2>/dev/null; then
  say "stage 3b: Taylor-Green 32^3"
  timeout 3600 python main.py simulate --simulation taylor_green \
    --T 0.05 --dt 0.01 --nx 32 --name tg32 --output_dir /tmp/tg32 \
    2>&1 | tail -20 | tee -a "$LOG" \
    && { cat /tmp/tg32/taylor_green/*tg32/err.txt | tee -a "$LOG"; \
         say "TG32_DONE"; }
fi
if ! grep -q "DFG2D2_DONE" "$LOG" 2>/dev/null; then
  say "stage 3c: DFG 2D-2 unsteady (res 0.35, VERDICT item 5 rerun)"
  timeout 14400 python scripts/validate_dfg2d2.py 0.35 12 0.0025 \
    2>&1 | tail -30 | tee -a "$LOG" && say "DFG2D2_DONE"
fi

# -- stage 4: DFG 2D-1 accuracy (item 4; hours) -------------------------
R3_LOG=${R3_LOG:-/tmp/r3_campaign.log} R3_LONG=1 bash scripts/r3_tpu_campaign.sh || true

say "round-4 queue complete"
