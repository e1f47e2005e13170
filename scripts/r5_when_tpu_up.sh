#!/bin/bash
# Round-5 TPU queue: one PASS over the remaining measurements, in
# VERDICT round-4 priority order. Run under
# scripts/tpu_queue_supervisor.sh, which re-runs a pass after every
# worker recovery. Resumable at every level:
#   - stages skip if their tag is already in $LOG,
#   - any worker-down detection EXITS the pass immediately,
#   - the 950k compile is a COMPILE-ONLY warm stage (BENCH_COMPILE_ONLY):
#     the build and reuse executables cache independently in
#     JAX_COMPILATION_CACHE_DIR, so even a flap-killed attempt leaves
#     the next attempt less to compile (round 4 lost 17 monolithic
#     compile+measure attempts to 3-6 min up-windows),
#   - long marches (DFG accuracy) checkpoint + auto-resume per leg.
#
#   0. developed-regime 106k bench (BENCH_r05 target: > 0.4943, aim 1.0+)
#   1. 106k tuning arms (pc_lag 8, bf16+g8)
#   2. 950k compile warm, then 500k developed re-measure, then 950k step
#   3. DFG 2D-1 accuracy arms (P2 dp / fine ring / both)
#   4. DFG 2D-2 rerun at res 0.35
#   5. Ghia TPU rows + Taylor-Green 32^3
set -u
cd "$(dirname "$0")/.."
LOG=${R5_LOG:-/root/repo/validation_runs/r5_campaign.log}
export PYTHONPATH="/root/repo:${PYTHONPATH:-}"
# persistent compile cache: big-size retries after worker flaps reload
# the executable instead of recompiling (also set in bench.py child)
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cc_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=10
say() { echo "[r5-up] $(date +%H:%M:%S) $*" | tee -a "$LOG"; }
bail() { say "$* — ending pass (supervisor re-passes on recovery)"; exit 1; }

# Single-core host: CPU side jobs (e.g. the P2 accuracy insurance march)
# starve big-mesh setup during precious worker up-windows — the 950k
# setup measured 90 s idle vs 472-638 s contended. Jobs register their
# PID in $PAUSE_FILE; every pass suspends them for its duration and
# resumes them however the pass ends (they keep marching while the
# worker is down, which is most of the time).
PAUSE_FILE=/tmp/bench_pause.pids
_with_kids() {  # pid -> pid + descendants (wrappers respawn legs)
  local p=$1; echo "$p"
  for c in $(ps -o pid= --ppid "$p" 2>/dev/null); do _with_kids "$c"; done
}
_signal_cpu_jobs() {  # sig
  [ -f "$PAUSE_FILE" ] || return 0
  while read -r p; do
    for q in $(_with_kids "$p"); do kill "-$1" "$q" 2>/dev/null || true; done
  done < "$PAUSE_FILE"
}
trap '_signal_cpu_jobs CONT' EXIT
_signal_cpu_jobs STOP

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
  # retry budget: round 4's 950k stage failed 17 straight passes and
  # starved every stage behind it — after the budget, later passes skip
  # this stage so up-windows flow to the remaining queue (RETRY_BUDGET
  # env per stage via R5_RETRY_<name>; default 6, compile warm higher
  # because each retry makes incremental cache progress)
  budget_var="R5_RETRY_${name}"
  budget=${!budget_var:-6}
  tries=$(grep -c "\"tag\": \"${name}_retry\"" "$LOG" 2>/dev/null || true)
  if [ "${tries:-0}" -ge "$budget" ]; then
    say "skip $name (retry budget $budget exhausted)"; return 0
  fi
  # per-stage probe opt-out (R5_NOPROBE_<name>=1): ride-mode stages
  # submit unconditionally — measured r5: fresh 30 s probes fail while
  # queued ops are still served, so the gate skips viable attempts
  noprobe_var="R5_NOPROBE_${name}"
  if [ "${!noprobe_var:-0}" != "1" ]; then
    if ! probe; then say "TPU unhealthy before $name; waiting 120s"; sleep 120;
      probe || bail "TPU still unhealthy before $name"
    fi
  fi
  say "start $name: $*"
  tmo_var="R5_TMO_${name}"
  # stage env comes AFTER the defaults so stages can raise BENCH_TIMEOUT
  out=$(env BENCH_TIMEOUT=1800 BENCH_NO_CPU_FALLBACK=1 "$@" \
        timeout "${!tmo_var:-3100}" python bench.py 2>/tmp/r5_stderr.log)
  code=$?
  line=$(echo "$out" | grep -o '{.*}' | tail -1)
  # retry (not complete) on: CPU-fallback lines, explicit skip lines,
  # error lines, and zero-value lines — a stage only completes on a
  # real TPU measurement (ADVICE r4: the error line contains no '_cpu_'
  # and used to complete the stage, contradicting the invariant)
  if [ -z "$line" ] || echo "$line" | grep -Eq '_cpu_|"skipped"|"error"|"value": 0\.0[,}]'; then
    echo "{\"tag\": \"${name}_retry\", \"exit\": $code, \"result\": ${line:-null}}" >> "$LOG"
    bail "worker flapped / no TPU result during $name"
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
  # no pre-leg probe: legs RIDE like the bench stages (fresh probes fail
  # while queued ops are served — PERF.md round-5 flap mechanics); a
  # checkpointed march uses whatever service the window provides, and a
  # fully-dead window is caught by the post-leg probe below
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

export R5_RETRY_r5_950k_compile=24   # incremental cache progress per try
export R5_RETRY_r5_950k=48  # cheap retries: mesh+exec cached, and the
                            # bench flap watchdog exits a hung attempt in
                            # ~4 min instead of burning the 45-min budget

while [ ! -f /tmp/tpu_up ]; do sleep 60; done
say "TPU worker is back ($(cat /tmp/tpu_up)); starting round-5 queue"

# -- stage 0: the BENCH_r05 target measurement first, alone -----------
# (exactly what the driver runs: default env = developed regime now)
run_bench r5_106k_dev BENCH_STEPS=8 BENCH_SKIP_SMALL=1 BENCH_PROBE_BUDGET=120
# -- stage 1: 106k tuning arms (quick; executables mostly cached) ------
run_bench r5_106k_lag8 BENCH_STEPS=8 BENCH_SKIP_SMALL=1 BENCH_PROBE_BUDGET=120 \
  BENCH_PC_LAG_STEPS=8 BENCH_STATS_EVERY=8
run_bench r5_106k_bf16g8_lag8 BENCH_STEPS=8 BENCH_SKIP_SMALL=1 BENCH_PROBE_BUDGET=120 \
  BENCH_PC_DTYPE=bf16 BENCH_SUPERNODE_G=8 BENCH_PC_LAG_STEPS=8 BENCH_STATS_EVERY=8

# -- stage 1b: component profile at the bench size (readback-fenced,
#    tuned config, developed regime) — names where the 1.7 s/step goes
run_leg PROFILE106 3 1500 python scripts/profile_step.py 0.3 6

# -- stage 1c: closure-const jit arm — PROFILE106 accounted only ~190 of
#    793 ms/step with closure-const piece timings; production passes all
#    index maps as jit ARGS (const-args). If XLA's constant
#    specialization is the gap, this arm shows it directly in steps/s.
#    106k closure-const compiles fit the relay (round-1/2 ran <=311k so).
run_bench r5_106k_noconsts BENCH_STEPS=8 BENCH_SKIP_SMALL=1 \
  BENCH_PROBE_BUDGET=120 CFDTPU_CONST_ARGS=0

# -- stage 1d: Krylov-buffer arm — the CPU profile_reuse validation
#    measured 10 identical gmres its 12x slower at restart 60 than 10;
#    the developed regime runs ~9.5 its/solve, so restart 20 loses
#    nothing to truncation (round-2: 60->150 changed steady counts <10%)
run_bench r5_106k_restart20 BENCH_STEPS=8 BENCH_SKIP_SMALL=1 \
  BENCH_PROBE_BUDGET=120 BENCH_KSP_RESTART=20

# -- stage 2: the ~1M-DOF story (VERDICT items 2 + 3) -------------------
# 2a: compile-only warm pass at 950k — populates the persistent cache;
#     incremental across flaps (build lands one window, reuse the next)
run_bench r5_950k_compile BENCH_COMPILE_ONLY=1 BENCH_SKIP_SMALL=1 \
  BENCH_PROBE_BUDGET=120 BENCH_RES_SCALE=0.10 BENCH_TIMEOUT=2700
# 2b: 500k developed-regime re-measure (adjudicates whether the r4
#     95 ksp/step was the impulsive transient or real PC degradation)
run_bench r5_500k_warm BENCH_SKIP_SMALL=1 BENCH_PROBE_BUDGET=120 \
  BENCH_RES_SCALE=0.14 BENCH_WARMUP=4 BENCH_STEPS=4 BENCH_TIMEOUT=2400
# 2c: the 950k measurement itself — executables reload from the cache,
#     so the up-window only pays setup (~2 min) + steps. STEP_FENCE: a
#     flap after any fenced measured step still lands that step's
#     steps/s as the stage result (three attempts died between warmup
#     and the 2-step window's end).
#     INTERLEAVE: every failed attempt ends the pass, so a flap-heavy
#     day burns every up-window here and starves stages 3-5 (11 of 24
#     retries by 17:50 with zero DFG2D2/PROFILE legs run). Defer this
#     stage on odd retry counts so alternate windows flow downstream.
#     BUGFIX: parity-on-retry-count deadlocked (deferring doesn't change
#     the count, so an odd count deferred every subsequent pass — stuck
#     at retry 11 from 17:59 on). Alternate on the LAST 950k event
#     instead: a failed attempt yields the next pass downstream, a defer
#     yields the next pass to the attempt.
#     RIDE (no health gates, watchdog banks partials / bounds outages):
#     fresh probes fail while queued ops are served, so gated attempts
#     were being skipped in windows that could have landed a step.
export R5_NOPROBE_r5_950k=1 R5_TMO_r5_950k=5700
last950=$(grep -oE '"tag": "r5_950k_retry"|defer r5_950k' "$LOG" 2>/dev/null | tail -1)
if [ "$last950" = '"tag": "r5_950k_retry"' ]; then
  say "defer r5_950k this pass (last attempt flapped; interleaving)"
else
#     PC_LAG=1: five attempts died ~60 s into measured step 2 — warmup
#     (build + FRESH PC) always completes, then the first lag-8 reuse
#     step at the impulsive start runs a stale-PC chord-Newton solve
#     whose iteration count explodes inside ONE jit call (106k: lag-8
#     tripled iterations even developed), and the worker kernel-faults
#     under the multi-minute op. Rebuilding every step keeps each call
#     bounded; the build executable is cached, its execution is seconds.
run_bench r5_950k BENCH_SKIP_SMALL=1 BENCH_RIDE=1 \
  BENCH_RES_SCALE=0.10 BENCH_WARMUP=1 BENCH_STEPS=2 \
  BENCH_STEP_FENCE=1 BENCH_SNES_MAX_IT=8 BENCH_KSP_MAX_IT=150 \
  BENCH_PC_LAG_STEPS=1 BENCH_STATS_EVERY=1 BENCH_TIMEOUT=5400
fi

# -- stage 4 (promoted): DFG 2D-2 rerun at res 0.35 (VERDICT item 7) ---
#    ahead of the TPU DFG2D1 arms: the CPU f64 insurance campaign
#    (acc_cpu_seq) already marches p2dp/ringcl, DFG2D2 is TPU-only
run_leg DFG2D2 12 1500 python scripts/validate_dfg2d2.py 0.35 12 0.0025

# -- stage 3: DFG 2D-1 accuracy (VERDICT item 4, open since round 2) ---
TUNED='"checkpoint_every":10,"solver":"stabilized_schur_ramping","pc_inner_method":"rasamg_sup","pc_inner_u":0,"pc_inner_p":5,"pc_ras_size":32'
TUNED_P2="$TUNED,\"pc_inner_u\":3"
# dt 0.2 (the campaign default that landed c_D inside in round 1): the
# steady state is the fixed point of the step map, dt-independent; the
# 0.05 marches were Newton-insurance the ramping solver already
# provides. p2dp RESUMES its t=2.5 checkpoint with 37 steps left
# instead of 150 — worker-served minutes are the scarce resource.
run_leg ACC_p2_dp   16 1500 python scripts/validate_dfg2d1.py 0.5 0.2 2e-6 10 "{\"tag\":\"p2dp\",\"p_grade\":2,$TUNED_P2}"
run_leg ACC_ring_cl 16 1500 python scripts/validate_dfg2d1.py 0.25 0.2 2e-6 10 "{\"tag\":\"ringcl\",\"res_min\":0.004,$TUNED}"

# 2c': reuse-step cost breakdown at the bench size — PROFILE106 left
#      ~600 of 793 ms unaccounted; this A/Bs const-args vs closure-const
#      jits (H2: XLA gather specialization) + dispatch + newton overhead
run_leg PROFILE_REUSE 3 1500 python scripts/profile_reuse.py 0.3 6

# 2d: W-cycle arm at 500k — the 486k frozen-Jacobian diag measured
#     18 its/Newton with wcycle vs 23-26 base (PERF.md r5): the best
#     candidate for the at-scale default
run_bench r5_500k_wcycle BENCH_SKIP_SMALL=1 BENCH_PROBE_BUDGET=120 \
  BENCH_RES_SCALE=0.14 BENCH_WARMUP=4 BENCH_STEPS=4 \
  BENCH_STEP_FENCE=1 BENCH_AMG_WCYCLE=1 BENCH_TIMEOUT=2400

# -- stage 2e: combined winners arm — restart20 (+5%) and noconsts
#    (+4.5%) each beat dev independently with identical iteration
#    counts; if they compose, this is the new official default config.
run_bench r5_106k_r20nc BENCH_STEPS=8 BENCH_SKIP_SMALL=1 \
  BENCH_PROBE_BUDGET=120 BENCH_KSP_RESTART=20 CFDTPU_CONST_ARGS=0

# -- stage 2f: chunked-CGS2 arm at the production restart 60 — per-
#    iteration Krylov traffic tracks the ACTIVE basis (~j rounded to 8)
#    instead of the full 61-row buffer (la/gmres.py::_chunked_cgs); the
#    H4 CPU note measured the full-buffer sweep 12x slower at restart 60
#    than 10 for identical its. If this beats restart20, it becomes the
#    default everywhere (incl. 500k/950k where restart must stay 60).
run_bench r5_106k_oc8 BENCH_STEPS=8 BENCH_SKIP_SMALL=1 \
  BENCH_PROBE_BUDGET=120 BENCH_KSP_RESTART=60 BENCH_KSP_ORTHO_CHUNK=8

# -- stage 2g: 950k developed-regime arm — the first r5_950k landing is
#    WARMUP=1 (impulsive transient, the same regime that undersold 486k
#    in round 4 by 4.5x). Once any 950k step has landed, spend later
#    windows measuring what the framework sustains. Gated so it never
#    contends with the first landing.
if grep -q '"tag": "r5_950k"' "$LOG" 2>/dev/null; then
  export R5_NOPROBE_r5_950k_dev=1 R5_TMO_r5_950k_dev=5700
  run_bench r5_950k_dev BENCH_SKIP_SMALL=1 BENCH_RIDE=1 \
    BENCH_RES_SCALE=0.10 BENCH_WARMUP=4 BENCH_STEPS=2 \
    BENCH_SNES_MAX_IT=8 BENCH_KSP_MAX_IT=150 \
    BENCH_STEP_FENCE=1 BENCH_STATS_EVERY=1 BENCH_TIMEOUT=5400
fi

# -- stage 3b: P2 + fine ring (after the tuning arms: p2dp + ringcl
#    adjudicate Δp and c_L separately first; this is the combined arm)
run_leg ACC_p2_ring 16 1500 python scripts/validate_dfg2d1.py 0.5 0.2 2e-6 10 "{\"tag\":\"p2ring\",\"p_grade\":2,\"res_min\":0.004,$TUNED_P2}"

# -- stage 5: remaining validation rows ---------------------------------
if ! grep -q "GHIA_TPU_DONE" "$LOG" 2>/dev/null; then
  probe || bail "TPU unhealthy before ghia"
  say "stage 5a: Ghia Re rows (TPU)"
  timeout 3600 python scripts/validate_ghia.py 2>&1 | tee -a "$LOG" \
    && say "GHIA_TPU_DONE"
fi
if ! grep -q "TG32_DONE" "$LOG" 2>/dev/null; then
  probe || bail "TPU unhealthy before tg32"
  say "stage 5b: Taylor-Green 32^3"
  timeout 3600 python main.py simulate --simulation taylor_green \
    --T 0.05 --dt 0.01 --nx 32 --name tg32 --output_dir /tmp/tg32 \
    2>&1 | tail -20 | tee -a "$LOG" \
    && { cat /tmp/tg32/taylor_green/*tg32/err.txt | tee -a "$LOG"; \
         say "TG32_DONE"; }
fi

say "round-5 queue complete"
