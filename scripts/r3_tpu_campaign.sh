#!/bin/bash
# Round-3 TPU measurement campaign. Run when the axon TPU worker is
# healthy (see /tmp/tpu_watch.sh). Each stage logs one JSON line; the
# whole campaign is resumable — stages skip if their log already has a
# non-error result line.
#
# Stages:
#   1. bench tuned-config sweep at 106k DOF: pc_lag_steps x pc_dtype
#   2. size ladder 330k / 500k (const-args default on)
#   3. (long) DFG 2D-1 accuracy: P2 dp campaign + fine-ring c_L
# Stage 3 is started only with R3_LONG=1 (hours).
set -u
cd "$(dirname "$0")/.."
LOG=${R3_LOG:-/tmp/r3_campaign.log}
say() { echo "[r3] $(date +%H:%M:%S) $*" | tee -a "$LOG"; }

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
  out=$(env "$@" BENCH_TIMEOUT=1800 timeout 2000 python bench.py 2>/tmp/r3_stderr.log)
  code=$?
  line=$(echo "$out" | grep -o '{.*}' | tail -1)
  echo "{\"tag\": \"$name\", \"exit\": $code, \"result\": ${line:-null}}" >> "$LOG"
  say "done $name -> $line (exit $code)"
}

# -- stage 1: 106k-DOF tuned sweep ------------------------------------
run_bench k1        BENCH_PC_LAG_STEPS=1
run_bench k2        BENCH_PC_LAG_STEPS=2 BENCH_STEPS=6
run_bench k4        BENCH_PC_LAG_STEPS=4
run_bench k8        BENCH_PC_LAG_STEPS=8 BENCH_STEPS=8
run_bench k4_bf16   BENCH_PC_LAG_STEPS=4 BENCH_PC_DTYPE=bf16
run_bench k8_bf16   BENCH_PC_LAG_STEPS=8 BENCH_STEPS=8 BENCH_PC_DTYPE=bf16
run_bench k4_kc     BENCH_PC_LAG_STEPS=4 BENCH_AMG_KCYCLE=1

# -- stage 2: size ladder ---------------------------------------------
run_bench k4_330k   BENCH_PC_LAG_STEPS=4 BENCH_RES_SCALE=0.17
run_bench k4_500k   BENCH_PC_LAG_STEPS=4 BENCH_RES_SCALE=0.14
run_bench k4_950k   BENCH_PC_LAG_STEPS=4 BENCH_RES_SCALE=0.10
# kcycle at scale: h-robustness is where GCR(2) coarse acceleration pays
run_bench kc_330k   BENCH_PC_LAG_STEPS=4 BENCH_AMG_KCYCLE=1 BENCH_RES_SCALE=0.17
run_bench kc_500k   BENCH_PC_LAG_STEPS=4 BENCH_AMG_KCYCLE=1 BENCH_RES_SCALE=0.14

say "campaign stages 1-2 complete; see $LOG"
