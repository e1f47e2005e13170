"""Benchmark: time-steps/sec of stabilized_schur on the DFG 2D-1 config.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
BASELINE.json north star: DFG 2D-1 at ~1M DOF >= 5 time-steps/sec/chip.

Env knobs:
    BENCH_SCENARIO   dfg (default) | lid
    BENCH_RES_SCALE  DFG mesh scale; dofs ~ 9.8k / scale^2 (default 0.35)
    BENCH_NX         lid mesh size (default 64)
    BENCH_STEPS      timed steps (default 10)
"""

import json
import os
import sys
import time

import numpy as np


def _bench_dfg(steps: int):
    from cfdtpu.scenarios.dfg_1 import DFG1Benchmark

    res_scale = float(os.environ.get("BENCH_RES_SCALE", "0.35"))
    sc = DFG1Benchmark(
        "stabilized_schur", dt=0.05, T=1e9, res_scale=res_scale,
        dtype="auto",
    )
    s = sc.solver
    s.solveStep()  # compile + warmup
    s.u_prev, s.p_prev = s.u_sol, s.p_sol

    t0 = time.perf_counter()
    for _ in range(steps):
        s.solveStep()
        s.u_prev, s.p_prev = s.u_sol, s.p_sol
    s.u_sol.block_until_ready()
    elapsed = time.perf_counter() - t0
    ndofs = s.V.num_global_dofs + s.Q.num_global_dofs
    return f"dfg_2d1_{ndofs}dof", steps / elapsed


def _bench_lid(steps: int):
    from __graft_entry__ import _build

    nx = int(os.environ.get("BENCH_NX", "64"))
    solver, args = _build(nx=nx, dtype=np.float32)
    u_prev, p_prev, aux, bc_u, bc_p, prm = args
    u, p, *_ = solver._step(u_prev, p_prev, aux, bc_u, bc_p, prm)
    u.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(steps):
        u, p, *_ = solver._step(u, p, (u,), bc_u, bc_p, prm)
    u.block_until_ready()
    elapsed = time.perf_counter() - t0
    ndofs = solver.V.num_global_dofs + solver.Q.num_global_dofs
    return f"lid_driven2D_{ndofs}dof", steps / elapsed


def main():
    steps = int(os.environ.get("BENCH_STEPS", "10"))
    scenario = os.environ.get("BENCH_SCENARIO", "dfg")
    name, sps = (
        _bench_dfg(steps) if scenario == "dfg" else _bench_lid(steps)
    )
    result = {
        "metric": f"{name}_steps_per_sec",
        "value": round(sps, 3),
        "unit": "steps/sec/chip",
        "vs_baseline": round(sps / 5.0, 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main() or 0)
