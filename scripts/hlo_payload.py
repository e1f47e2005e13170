"""Measure the serialized-HLO payload of the DFG step jits at a given size.

The axon relay's remote_compile endpoint rejects bodies over a fixed
limit (HTTP 413) — this is what capped round 3 at ~330k DOF before the
const-args work (PERF.md round-3/4 notes). This script builds the bench
configuration at an arbitrary res_scale on the CPU backend and LOWERS
(without compiling/executing) the build-op-state and reuse-step jits,
printing the serialized HLO module proto sizes. A payload in the
single-digit-MB range means the 413 ceiling is gone at that size.

Usage: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
           python scripts/hlo_payload.py [res_scale]
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _closure_cells(fn):
    return {
        v: c.cell_contents
        for v, c in zip(fn.__code__.co_freevars, fn.__closure__ or ())
    }


def main():
    res_scale = float(sys.argv[1]) if len(sys.argv) > 1 else 0.10
    from cfdtpu.scenarios.dfg_1 import DFG1Benchmark

    t0 = time.time()
    sc = DFG1Benchmark(
        "stabilized_schur", dt=0.05, T=1e9, res_scale=res_scale,
        dtype="float32",
        pc_inner_method="rasamg_sup", pc_inner_u=0, pc_inner_p=5,
        snes_lag_jacobian=True, pc_ras_size=32,
        pc_lag_steps=4, stats_every=4,
    )
    s = sc.solver
    ndofs = s.V.num_global_dofs + s.Q.num_global_dofs
    print(f"[hlo] setup {time.time() - t0:.0f}s, {ndofs} dofs", flush=True)

    bc_u, bc_p = s._bc_values()
    prm = s.params()
    cells_b = _closure_cells(s._build_op_state)
    cells_r = _closure_cells(s._reuse_step)
    jit_b, consts = cells_b["jit_b"], s._reuse_consts

    t0 = time.time()
    low_b = jit_b.lower(s.u_prev, s.p_prev, s._aux(), prm, consts)
    proto_b = low_b.compiler_ir("hlo").as_serialized_hlo_module_proto()
    print(f"[hlo] build_op_state lowered {time.time() - t0:.0f}s",
          flush=True)

    t0 = time.time()
    # reuse-step needs an op_state pytree: get its structure without
    # running the (expensive) build by abstract evaluation
    import jax

    op_state = jax.eval_shape(
        lambda *a: jit_b(*a), s.u_prev, s.p_prev, s._aux(), prm, consts
    )
    jit_r = cells_r["jit_r"]
    low_r = jit_r.lower(
        s.u_prev, s.p_prev, s._aux(), bc_u, bc_p, prm, op_state, consts
    )
    proto_r = low_r.compiler_ir("hlo").as_serialized_hlo_module_proto()
    print(f"[hlo] reuse_step lowered {time.time() - t0:.0f}s", flush=True)

    print(json.dumps({
        "res_scale": res_scale, "dofs": ndofs,
        "build_hlo_mb": round(len(proto_b) / 1e6, 2),
        "reuse_hlo_mb": round(len(proto_r) / 1e6, 2),
    }))


if __name__ == "__main__":
    main()
