#!/bin/bash
# Round-5 session-2 TPU queue: the REMAINING round-5 stages, reordered
# by value-per-worker-minute after the 2026-08-20 host reset wiped /tmp
# (compile cache, symcache, and the gitignored p2dp checkpoint).
# Run under scripts/tpu_queue_supervisor.sh:
#   bash scripts/tpu_queue_supervisor.sh scripts/r5b_when_tpu_up.sh
# Shares the round-5 log, so stages completed before the reset skip.
#
#   1. ACC_p2_dp      — the dp close-out (VERDICT item 4, open since r2):
#                       P2 pressure order is the dp limiter; restarts
#                       from t=0 (checkpoint lost with the host).
#   2. r5_950k_dev    — developed-regime throughput at 949,929 DOF (the
#                       r5_950k landing measured the impulsive start).
#   3. ACC_p2_ring    — P2 + fine obstacle ring (c_L+dp combined arm).
#   4. quick 106k arms (r20nc, oc8) + 500k W-cycle.
#   5. Ghia TPU rows, Taylor-Green 32^3, PROFILE_REUSE.
set -u
cd "$(dirname "$0")/.."
LOG=${R5_LOG:-/root/repo/validation_runs/r5_campaign.log}
export PYTHONPATH="/root/repo:${PYTHONPATH:-}"
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cc_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=10
say() { echo "[r5b-up] $(date +%H:%M:%S) $*" | tee -a "$LOG"; }
bail() { say "$* — ending pass (supervisor re-passes on recovery)"; exit 1; }

probe() {
  timeout 30 python -c "
import jax, jax.numpy as jnp
assert float((jnp.ones((256,256))@jnp.ones((256,256))).sum())==256**3
" 2>/dev/null
}

run_bench() {  # name, env...
  name=$1; shift
  if grep -q "\"tag\": \"$name\"" "$LOG" 2>/dev/null; then
    say "skip $name (already logged)"; return 0
  fi
  budget_var="R5_RETRY_${name}"
  budget=${!budget_var:-6}
  tries=$(grep -c "\"tag\": \"${name}_retry\"" "$LOG" 2>/dev/null || true)
  if [ "${tries:-0}" -ge "$budget" ]; then
    say "skip $name (retry budget $budget exhausted)"; return 0
  fi
  noprobe_var="R5_NOPROBE_${name}"
  if [ "${!noprobe_var:-0}" != "1" ]; then
    if ! probe; then say "TPU unhealthy before $name; waiting 120s"; sleep 120;
      probe || bail "TPU still unhealthy before $name"
    fi
  fi
  say "start $name: $*"
  tmo_var="R5_TMO_${name}"
  out=$(env BENCH_TIMEOUT=1800 BENCH_NO_CPU_FALLBACK=1 "$@" \
        timeout "${!tmo_var:-3100}" python bench.py 2>/tmp/r5_stderr.log)
  code=$?
  line=$(echo "$out" | grep -o '{.*}' | tail -1)
  if [ -z "$line" ] || echo "$line" | grep -Eq '_cpu_|"skipped"|"error"|"value": 0\.0[,}]'; then
    echo "{\"tag\": \"${name}_retry\", \"exit\": $code, \"result\": ${line:-null}}" >> "$LOG"
    bail "worker flapped / no TPU result during $name"
  fi
  echo "{\"tag\": \"$name\", \"exit\": $code, \"result\": ${line:-null}}" >> "$LOG"
  say "done $name -> $line (exit $code)"
}

run_leg() {  # marker max_legs timeout cmd...
  marker=$1; max_legs=$2; tmo=$3; shift 3
  if grep -q "${marker}_DONE" "$LOG" 2>/dev/null; then
    say "skip $marker (done)"; return 0
  fi
  legs=$(grep -c "${marker}_LEG" "$LOG" 2>/dev/null || true)
  if [ "${legs:-0}" -ge "$max_legs" ]; then
    say "skip $marker (leg budget ${max_legs} exhausted)"; return 0
  fi
  say "start $marker leg $((legs + 1)): $*"
  echo "${marker}_LEG $(date +%H:%M:%S)" >> "$LOG"
  out=$(timeout "$tmo" "$@" 2>/tmp/r5_acc_err.log)
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
say "TPU worker is up ($(cat /tmp/tpu_up)); starting round-5b queue"

TUNED='"checkpoint_every":10,"solver":"stabilized_schur_ramping","pc_inner_method":"rasamg_sup","pc_inner_u":0,"pc_inner_p":5,"pc_ras_size":32'
# P2 arms: legs 5-7 (03:09-03:35) crashed the worker DETERMINISTICALLY
# at ramp step 9 of the dt=0.2 march (alpha 0.9: the highest-CFL solve;
# pc_lag is already 1 by solver default, so this is NOT the stale-PC
# mechanism — it is an unbounded diverging solve: snes_max_it 100 x
# ksp_max_it 1000 is a ~1e5-iteration op chain the worker dies under).
# Mitigation: dt 0.1 (halves the ramp-end CFL; the old dt=0.05 legs
# marched past the ramp fine) + iteration caps that bound any one
# solve to ~6k iterations. Steady state is the fixed point of the step
# map — dt-independent.
TUNED_P2="$TUNED,\"pc_inner_u\":3,\"snes_max_it\":20,\"ksp_max_it\":300"

# -- 1: dp close-out (P2 pressure order is the dp limiter) -------------
run_leg ACC_p2_dp 16 1800 python scripts/validate_dfg2d1.py 0.5 0.1 2e-6 10 "{\"tag\":\"p2dp\",\"p_grade\":2,$TUNED_P2}"

# -- 2: 950k developed regime (first landing was impulsive-start) ------
# PC_LAG=1 like the landed r5_950k arm: the 03:15 attempt with the
# default lag-4 reuse executable died RESOURCE_EXHAUSTED — the reuse
# step's live set (stale PC + fresh operator + Krylov buffers) does
# not fit HBM at 949,929 DOF; the build-every-step executable does.
export R5_NOPROBE_r5_950k_dev=1 R5_TMO_r5_950k_dev=5700
export R5_RETRY_r5_950k_dev=8
run_bench r5_950k_dev BENCH_SKIP_SMALL=1 BENCH_RIDE=1 \
  BENCH_RES_SCALE=0.10 BENCH_WARMUP=4 BENCH_STEPS=2 \
  BENCH_SNES_MAX_IT=8 BENCH_KSP_MAX_IT=150 BENCH_PC_LAG_STEPS=1 \
  BENCH_STEP_FENCE=1 BENCH_STATS_EVERY=1 BENCH_TIMEOUT=5400

# -- 3: P2 + fine ring combined accuracy arm ---------------------------
run_leg ACC_p2_ring 16 1800 python scripts/validate_dfg2d1.py 0.5 0.1 2e-6 10 "{\"tag\":\"p2ring\",\"p_grade\":2,\"res_min\":0.004,$TUNED_P2}"

# -- 4: quick tuning arms ----------------------------------------------
run_bench r5_106k_r20nc BENCH_STEPS=8 BENCH_SKIP_SMALL=1 \
  BENCH_PROBE_BUDGET=120 BENCH_KSP_RESTART=20 CFDTPU_CONST_ARGS=0
run_bench r5_106k_oc8 BENCH_STEPS=8 BENCH_SKIP_SMALL=1 \
  BENCH_PROBE_BUDGET=120 BENCH_KSP_RESTART=60 BENCH_KSP_ORTHO_CHUNK=8
run_bench r5_500k_wcycle BENCH_SKIP_SMALL=1 BENCH_PROBE_BUDGET=120 \
  BENCH_RES_SCALE=0.14 BENCH_WARMUP=4 BENCH_STEPS=4 \
  BENCH_STEP_FENCE=1 BENCH_AMG_WCYCLE=1 BENCH_TIMEOUT=2400

# -- 5: remaining validation rows --------------------------------------
if ! grep -q "GHIA_TPU_DONE" "$LOG" 2>/dev/null; then
  probe || bail "TPU unhealthy before ghia"
  say "stage 5a: Ghia Re rows (TPU)"
  timeout 3600 python scripts/validate_ghia.py 2>&1 | tee -a "$LOG" \
    && say "GHIA_TPU_DONE" | tee -a "$LOG"
fi
if ! grep -q "TG32_DONE" "$LOG" 2>/dev/null; then
  probe || bail "TPU unhealthy before tg32"
  say "stage 5b: Taylor-Green 32^3"
  timeout 3600 python main.py simulate --simulation taylor_green \
    --T 0.05 --dt 0.01 --nx 32 --name tg32 --output_dir /tmp/tg32 \
    2>&1 | tail -20 | tee -a "$LOG" \
    && { cat /tmp/tg32/taylor_green/*tg32/err.txt | tee -a "$LOG"; \
         echo "TG32_DONE" >> "$LOG"; say "TG32 done"; }
fi

run_leg PROFILE_REUSE 3 1500 python scripts/profile_reuse.py 0.3 6

say "round-5b queue complete"
