#!/bin/bash
# Round-4 TPU queue: one PASS over the remaining measurements, in
# VERDICT round-3 priority order. Run under
# scripts/tpu_queue_supervisor.sh, which re-runs a pass after every
# worker recovery. Resumable at every level:
#   - stages skip if their tag is already in $LOG,
#   - any worker-down detection EXITS the pass immediately (the next
#     recovery restarts from the top priority, instead of walking the
#     remaining stages against a dead worker),
#   - long marches (DFG 2D-1 accuracy, DFG 2D-2 shedding) checkpoint +
#     auto-resume, so each up-window advances them by a bounded leg,
#   - jit executables persist in JAX_COMPILATION_CACHE_DIR, so a retry
#     leg skips the multi-minute remote compile its first leg paid.
#
#   0. tuned 106k bench (BENCH_r04 target)                    [item 3]
#   1. size ladder >= 500k, attempt ~1M; developed-regime arms [item 2]
#   2. DFG 2D-1 accuracy arms (P2 dp / fine ring / both)       [item 4]
#   3. DFG 2D-2 rerun at res 0.35                              [item 5]
#   4. r3 tuning sweep + Ghia TPU rows + Taylor-Green 32^3
set -u
cd "$(dirname "$0")/.."
LOG=${R4_LOG:-/tmp/r4_campaign.log}
export PYTHONPATH="/root/repo:${PYTHONPATH:-}"
# persistent compile cache: big-size retries after worker flaps reload
# the executable instead of recompiling (also set in bench.py child)
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cc_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=10
say() { echo "[r4-up] $(date +%H:%M:%S) $*" | tee -a "$LOG"; }
bail() { say "$* — ending pass (supervisor re-passes on recovery)"; exit 1; }

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
  if ! probe; then say "TPU unhealthy before $name; waiting 120s"; sleep 120;
    probe || bail "TPU still unhealthy before $name"
  fi
  say "start $name: $*"
  out=$(env "$@" BENCH_TIMEOUT=1800 timeout 2000 python bench.py 2>/tmp/r4_stderr.log)
  code=$?
  line=$(echo "$out" | grep -o '{.*}' | tail -1)
  if echo "$line" | grep -q '_cpu_'; then
    # worker died mid-bench and bench.py fell back to CPU: record it
    # under a non-matching tag so a later pass retries
    echo "{\"tag\": \"${name}_cpufallback\", \"exit\": $code, \"result\": ${line:-null}}" >> "$LOG"
    bail "worker flapped during $name (CPU fallback)"
  fi
  echo "{\"tag\": \"$name\", \"exit\": $code, \"result\": ${line:-null}}" >> "$LOG"
  say "done $name -> $line (exit $code)"
}

run_leg() {  # marker max_legs timeout cmd...
  # one bounded leg of a resumable march; marker_DONE on completion
  marker=$1; max_legs=$2; tmo=$3; shift 3
  if grep -q "${marker}_DONE" "$LOG" 2>/dev/null; then
    say "skip $marker (done)"; return 0
  fi
  legs=$(grep -c "${marker}_LEG" "$LOG" 2>/dev/null || true)
  if [ "${legs:-0}" -ge "$max_legs" ]; then
    say "skip $marker (leg budget ${max_legs} exhausted)"; return 0
  fi
  probe || bail "TPU unhealthy before $marker leg"
  say "start $marker leg $((legs + 1)): $*"
  echo "${marker}_LEG $(date +%H:%M:%S)" >> "$LOG"
  out=$(timeout "$tmo" "$@" 2>/tmp/r4_acc_err.log)
  code=$?
  { echo "LEG $marker exit=$code"; echo "$out" | tail -15; } >> "$LOG"
  if [ $code -eq 0 ]; then
    echo "${marker}_DONE" >> "$LOG"; say "done $marker"
  else
    say "$marker leg ended (exit $code; resumes next pass)"
    probe || bail "worker down after $marker leg"
  fi
}

while [ ! -f /tmp/tpu_up ]; do sleep 60; done
say "TPU worker is back ($(cat /tmp/tpu_up)); starting round-4 queue"

# -- stage 0: the BENCH_r04 target measurement first, alone -----------
# (tuned config IS bench.py's default: rasamg_sup, u=0, p=5, jac-lag,
# ras=32, pc_lag_steps=4, stats_every=4, 106k DOF)
run_bench r4_106k_tuned BENCH_STEPS=8 BENCH_SKIP_SMALL=1 BENCH_PROBE_BUDGET=120
# bandwidth levers at the target size: bf16 PC + g=8 supernode rows
run_bench r4_106k_bf16g8 BENCH_STEPS=8 BENCH_SKIP_SMALL=1 BENCH_PROBE_BUDGET=120 BENCH_PC_DTYPE=bf16 BENCH_SUPERNODE_G=8

# -- stage 1: the >= 500k ladder (VERDICT item 2) ----------------------
run_bench r4_500k BENCH_SKIP_SMALL=1 BENCH_PROBE_BUDGET=120  BENCH_RES_SCALE=0.14 BENCH_STEPS=4
run_bench r4_950k BENCH_SKIP_SMALL=1 BENCH_PROBE_BUDGET=120  BENCH_RES_SCALE=0.10 BENCH_STEPS=4
run_bench r4_950k_bf16g8 BENCH_SKIP_SMALL=1 BENCH_PROBE_BUDGET=120 BENCH_RES_SCALE=0.10 BENCH_PC_DTYPE=bf16 BENCH_SUPERNODE_G=8
# developed-regime arms: warmup past the impulsive-start transient
run_bench r4_106k_warm BENCH_STEPS=8 BENCH_WARMUP=6 BENCH_SKIP_SMALL=1 BENCH_PROBE_BUDGET=120
run_bench r4_500k_warm BENCH_WARMUP=4 BENCH_SKIP_SMALL=1 BENCH_PROBE_BUDGET=120 BENCH_RES_SCALE=0.14

# -- stage 2: DFG 2D-1 accuracy (VERDICT item 4) ------------------------
# March regime: dt=0.05, T=10, BC ramped over the first 10 steps (the
# dt=0.2 impulsive start is Newton-hostile for P2). Resumable legs.
TUNED='"solver":"stabilized_schur_ramping","pc_inner_method":"rasamg_sup","pc_inner_u":0,"pc_inner_p":5,"pc_ras_size":32'
TUNED_P2="$TUNED,\"pc_inner_u\":3"
run_leg ACC_p2_dp   8 1500 python scripts/validate_dfg2d1.py 0.5 0.05 2e-6 10 "{\"tag\":\"p2dp\",\"p_grade\":2,$TUNED_P2}"
run_leg ACC_ring_cl 8 1500 python scripts/validate_dfg2d1.py 0.25 0.05 2e-6 10 "{\"tag\":\"ringcl\",\"res_min\":0.004,$TUNED}"
run_leg ACC_p2_ring 8 1500 python scripts/validate_dfg2d1.py 0.5 0.05 2e-6 10 "{\"tag\":\"p2ring\",\"p_grade\":2,\"res_min\":0.004,$TUNED_P2}"

# -- stage 3: DFG 2D-2 rerun at res 0.35 (VERDICT item 5) --------------
run_leg DFG2D2 12 1500 python scripts/validate_dfg2d2.py 0.35 12 0.0025

# -- stage 4: tuning sweep + remaining validation rows ------------------
R3_LOG=${R3_LOG:-/tmp/r3_campaign.log} bash scripts/r3_tpu_campaign.sh || bail "r3 sweep pass ended"
if ! grep -q "GHIA_TPU_DONE" "$LOG" 2>/dev/null; then
  probe || bail "TPU unhealthy before ghia"
  say "stage 4a: Ghia Re rows (TPU)"
  timeout 3600 python scripts/validate_ghia.py 2>&1 | tee -a "$LOG" \
    && say "GHIA_TPU_DONE"
fi
if ! grep -q "TG32_DONE" "$LOG" 2>/dev/null; then
  probe || bail "TPU unhealthy before tg32"
  say "stage 4b: Taylor-Green 32^3"
  timeout 3600 python main.py simulate --simulation taylor_green \
    --T 0.05 --dt 0.01 --nx 32 --name tg32 --output_dir /tmp/tg32 \
    2>&1 | tail -20 | tee -a "$LOG" \
    && { cat /tmp/tg32/taylor_green/*tg32/err.txt | tee -a "$LOG"; \
         say "TG32_DONE"; }
fi

say "round-4 queue complete"
