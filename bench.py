"""Benchmark: time-steps/sec of the stabilized_schur lid-driven cavity.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
The BASELINE.json north star is DFG 2D-1 at ~1M DOF >= 5 steps/sec/chip;
until the dfg_1 scenario lands, this measures the PR1 baseline config
(lid-driven cavity) at a configurable size in float32 on the real chip.
"""

import json
import os
import sys
import time

import numpy as np


def main():
    nx = int(os.environ.get("BENCH_NX", "64"))
    steps = int(os.environ.get("BENCH_STEPS", "10"))

    from __graft_entry__ import _build

    solver, args = _build(nx=nx, dtype=np.float32)
    u_prev, p_prev, bc_u, bc_p, prm = args

    # warmup / compile
    u, p, ru, rp, stats = solver._step(u_prev, p_prev, bc_u, bc_p, prm)
    u.block_until_ready()

    t0 = time.perf_counter()
    for _ in range(steps):
        u, p, ru, rp, stats = solver._step(u, p, bc_u, bc_p, prm)
    u.block_until_ready()
    elapsed = time.perf_counter() - t0

    sps = steps / elapsed
    ndofs = solver.V.num_global_dofs + solver.Q.num_global_dofs
    result = {
        "metric": f"lid_driven2D_{ndofs}dof_steps_per_sec",
        "value": round(sps, 3),
        "unit": "steps/sec/chip",
        "vs_baseline": round(sps / 5.0, 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main() or 0)
