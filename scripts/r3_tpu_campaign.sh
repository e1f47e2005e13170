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
  if ! probe; then say "TPU unhealthy before $name; waiting 120s"; sleep 120;
    # exit the whole pass: the supervisor restarts from the priority
    # top on recovery instead of walking dead stages
    probe || { say "TPU still unhealthy at $name; ending pass"; exit 1; }
  fi
  say "start $name: $*"
  out=$(env "$@" BENCH_TIMEOUT=1800 timeout 2000 python bench.py 2>/tmp/r3_stderr.log)
  code=$?
  line=$(echo "$out" | grep -o '{.*}' | tail -1)
  if echo "$line" | grep -q '_cpu_'; then
    echo "{\"tag\": \"${name}_cpufallback\", \"exit\": $code, \"result\": ${line:-null}}" >> "$LOG"
    say "CPU fallback on $name (worker flapped); ending pass"
    exit 1
  fi
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
# S-stage sweep count is the outer-iteration lever (CPU 40k probe:
# p=5 cuts ksp/step 42 -> 27 and nets faster); find the TPU optimum
run_bench k4_p4     BENCH_PC_LAG_STEPS=4 BENCH_PC_INNER_P=4
run_bench k4_p5     BENCH_PC_LAG_STEPS=4 BENCH_PC_INNER_P=5
run_bench k4_p6     BENCH_PC_LAG_STEPS=4 BENCH_PC_INNER_P=6
# Chebyshev AMG smoothing (degree 2/3): stronger cycles, fewer sweeps
run_bench k4_ch2    BENCH_PC_LAG_STEPS=4 BENCH_AMG_CHEBY=2
run_bench k4_ch3    BENCH_PC_LAG_STEPS=4 BENCH_AMG_CHEBY=3
run_bench k4_ch2p2  BENCH_PC_LAG_STEPS=4 BENCH_AMG_CHEBY=2 BENCH_PC_INNER_P=2
# lower-triangular Schur factorization: one u-solve per apply vs two
run_bench k4_low    BENCH_PC_LAG_STEPS=4 BENCH_SCHUR_FACT=lower
# g=8 supernodes: half the gathers, ~1.8x the value bytes (PERF lever b)
run_bench k4_g8     BENCH_PC_LAG_STEPS=4 BENCH_SUPERNODE_G=8
# Eisenstat-Walker adaptive Krylov tolerances
run_bench k4_ew     BENCH_PC_LAG_STEPS=4 BENCH_EW=1
# combined-lever candidates (CPU evidence: p=5 cuts outer its ~35%;
# lower-fact halves u-solves per apply; bf16 halves PC bytes)
run_bench k4_p5_low      BENCH_PC_LAG_STEPS=4 BENCH_PC_INNER_P=5 BENCH_SCHUR_FACT=lower
run_bench k4_p5_bf16     BENCH_PC_LAG_STEPS=4 BENCH_PC_INNER_P=5 BENCH_PC_DTYPE=bf16
run_bench k4_p5_low_bf16 BENCH_PC_LAG_STEPS=4 BENCH_PC_INNER_P=5 BENCH_SCHUR_FACT=lower BENCH_PC_DTYPE=bf16
run_bench k8_p5_low_bf16 BENCH_PC_LAG_STEPS=8 BENCH_STEPS=8 BENCH_PC_INNER_P=5 BENCH_SCHUR_FACT=lower BENCH_PC_DTYPE=bf16

# -- stage 2: size ladder ---------------------------------------------
run_bench k4_330k   BENCH_PC_LAG_STEPS=4 BENCH_RES_SCALE=0.17
run_bench k4_500k   BENCH_PC_LAG_STEPS=4 BENCH_RES_SCALE=0.14
run_bench k4_950k   BENCH_PC_LAG_STEPS=4 BENCH_RES_SCALE=0.10
# kcycle at scale: h-robustness is where GCR(2) coarse acceleration pays
run_bench kc_330k   BENCH_PC_LAG_STEPS=4 BENCH_AMG_KCYCLE=1 BENCH_RES_SCALE=0.17
run_bench kc_500k   BENCH_PC_LAG_STEPS=4 BENCH_AMG_KCYCLE=1 BENCH_RES_SCALE=0.14

say "campaign stages 1-2 complete; see $LOG"

# -- stage 3 (R3_LONG=1): DFG 2D-1 accuracy ---------------------------
# VERDICT round-3 item 5: dp needs P2 pressure (P1 entry projected at
# ~1M DOF); c_L needs a finer obstacle ring (res_min; geom default is
# r/6 = 0.0083).
# March regime: dt=0.05, T=10, BC ramped over the first 10 steps. The
# dt=0.2 impulsive start of the round-2 campaign is Newton-hostile for
# P2 (measured: ~100 slow Newton its/step, CPU smokes never finished);
# with the round-3 PC a 200-step dt=0.05 march is both Newton-safe and
# cheaper wall-clock. No pc_lag_steps / snes_lag_jacobian for the same
# reason (chord on a stale Jacobian stalls in marches).
TUNED='"solver":"stabilized_schur_ramping","pc_inner_method":"rasamg_sup","pc_inner_u":0,"pc_inner_p":5,"pc_ras_size":32'
# P2 momentum needs u-block Krylov sweeps over the p-multigrid AMG
# (diag_pc: m_u=3 cuts the frozen-Jacobian solve 40 -> 17 its; preonly
# u is only adequate for P1) — override after $TUNED (later key wins).
TUNED_P2="$TUNED,\"pc_inner_u\":3"
if [ "${R3_LONG:-0}" = "1" ]; then
  run_acc() {  # name res_scale extra_json
    name=$1; res=$2; extra=$3
    if grep -q "ACC_DONE $name" "$LOG" 2>/dev/null; then
      say "skip acc $name (already logged)"; return 0
    fi
    probe || { say "TPU unhealthy at acc $name; ending pass"; exit 1; }
    say "start acc $name: res=$res extra=$extra"
    out=$(PYTHONPATH=/root/repo timeout 14400 python \
      scripts/validate_dfg2d1.py "$res" 0.05 2e-6 10 "$extra" \
      2>/tmp/r3_acc_err.log)
    code=$?
    { echo "ACC $name exit=$code"; echo "$out"; } >> "$LOG"
    [ $code -eq 0 ] && echo "ACC_DONE $name" >> "$LOG"
    say "done acc $name (exit $code)"
  }
  # P2 pressure at ~140k DOF: dp converges ~O(h^2) in P2
  run_acc p2_dp    0.5  "{\"p_grade\":2,$TUNED_P2}"
  # fine obstacle ring (half the default r/6) for c_L at ~110k DOF
  run_acc ring_cl  0.25 "{\"res_min\":0.004,$TUNED}"
  # combined, if both individually land
  run_acc p2_ring  0.5  "{\"p_grade\":2,\"res_min\":0.004,$TUNED_P2}"
  say "stage 3 complete"
fi
