"""Frozen-Jacobian PC diagnostic (linear-solve A/B at fixed state).

The campaign-level symptom (P2/P2 at 153k DOF needs ~300 KSP
iterations per Newton step vs ~17 for P1 at the same DOF count) is a
LINEAR preconditioner property, so A/B-ing PC hierarchies on one
frozen Jacobian isolates it at a fraction of the cost of full
Newton-step sweeps: the scenario is built once, marched a few steps to
a physical state, the node-BSR operator is assembled once, and each
config only rebuilds the (host-side) AMG hierarchies + jits one FGMRES
closure.

Usage:
  python scripts/diag_pc.py <res_scale> <p_grade> [nsteps] [configs_json]

Each config is kwargs for the hierarchy build:
  {"pairwise": bool, "n_smooth": int, "cheby": int, "wcycle": bool,
   "inner_method": "rasamg_sup"|"amg_p"|..., "m_p": int, "m_u": int}
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    res = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    pg = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    nsteps = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    cfgs = (
        json.loads(sys.argv[4])
        if len(sys.argv) > 4
        else [
            {},
            {"cheby": 3},
            {"wcycle": True},
            {"pairwise": True},
            {"n_smooth": 2},
            {"inner_method": "amg_p"},
            {"m_p": 10},
        ]
    )

    import jax
    import jax.numpy as jnp

    from cfdtpu.la.gmres import fgmres
    from cfdtpu.la.schur import make_schur_precond
    from cfdtpu.scenarios.dfg_1 import DFG1Benchmark

    t0 = time.time()
    sc = DFG1Benchmark(
        "stabilized_schur", dt=0.05, T=1e9, res_scale=res,
        dtype="auto", p_grade=pg, pc_inner_method="rasamg_sup",
        pc_inner_u=0, pc_inner_p=5, pc_ras_size=32,
    )
    s = sc.solver
    for _ in range(nsteps):
        s.solveStep()
        s.u_prev, s.p_prev = s.u_sol, s.p_sol
        s.step_count += 1
    print(f"[diag] state ready in {time.time() - t0:.0f}s", flush=True)

    form, nb = s.form, s._nodebsr
    assert nb is not None, "diagnostic requires the node-BSR path"
    dim = s.mesh.gdim
    n_u_flat = form.n_u_flat
    n_p = s.Q.num_dofs
    bc_mask_np = np.zeros(n_u_flat + n_p, dtype=bool)
    for d0 in range(dim):
        bc_mask_np[np.asarray(s.bc_dofs_u, dtype=np.int64) * dim + d0] = True
    has_bc_p = len(np.asarray(s.bc_dofs_p)) > 0
    if has_bc_p:
        bc_mask_np[n_u_flat + np.asarray(s.bc_dofs_p, dtype=np.int64)] = True
    bc_mask = jnp.asarray(bc_mask_np)
    bc_mask_u = jnp.asarray(bc_mask_np[:n_u_flat])
    bc_mask_p = jnp.asarray(bc_mask_np[n_u_flat:]) if has_bc_p else None

    u, p = s.u_sol, s.p_sol
    aux, prm = s._aux(), s.params()
    A_cells, A_blocks = form.element_jacobians(u, p, aux, prm)
    A = nb.assemble(A_cells, A_blocks)
    ru, rp = form.residual(u, p, aux, prm)
    b = -jnp.concatenate([ru.ravel(), rp])
    b = jnp.where(bc_mask, 0.0, b)
    jax.block_until_ready(A)
    print(f"[diag] operator assembled ({n_u_flat + n_p} dofs)", flush=True)

    def matvec(v):
        y = nb.apply_element_matrices(A, (), v)
        return jnp.where(bc_mask, v, y)

    for cfg in cfgs:
        cfg = dict(cfg)
        inner = cfg.pop("inner_method", "rasamg_sup")
        plevel = cfg.pop("plevel", True)
        # control arm: suppress the weighted p-multigrid first level so
        # the degree>1 momentum hierarchy falls back to pure aggregation
        nb.linear_parents = (
            (lambda: None) if not plevel
            else type(nb).linear_parents.__get__(nb)
        )
        m_p = cfg.pop("m_p", 5)
        m_u = cfg.pop("m_u", 0)
        ras_size = cfg.pop("ras_size", 32)
        amg_kw = {
            "pairwise": cfg.pop("pairwise", False),
            "n_smooth": cfg.pop("n_smooth", 1),
            "kcycle": cfg.pop("kcycle", False),
            "cheby": cfg.pop("cheby", 0),
            "wcycle": cfg.pop("wcycle", False),
        }
        assert not cfg, f"unknown diag keys: {cfg}"
        t1 = time.time()
        nb._sp_amg_h = None
        nb._uu_amg_h = None
        nb.sp_amg(**amg_kw)
        if inner.startswith("rasamg") or inner in ("amg_up", "amg_sup"):
            ras = (
                nb.uu_ras(ras_size, 4)
                if inner.startswith("rasamg") else None
            )
            nb.uu_amg(fine_smoother=ras, kcycle=amg_kw["kcycle"],
                      cheby=amg_kw["cheby"], wcycle=amg_kw["wcycle"])
        precond = make_schur_precond(
            nb, A, (), bc_mask_u, False, m_u=m_u, m_p=m_p,
            bc_mask_p=bc_mask_p, full=True, inner_method=inner,
            ras_opts=(ras_size, 4),
        )
        build_s = time.time() - t1
        t2 = time.time()
        x, info = jax.jit(
            lambda bb: fgmres(matvec, bb, precond=precond,
                              restart=200, maxiter=600, rtol=1e-5)
        )(b)
        iters = int(info["iters"])
        ok = bool(info["converged"])
        wall = time.time() - t2
        label = {"inner_method": inner, "m_p": m_p, "m_u": m_u, **amg_kw}
        print(
            f"DIAG {json.dumps(label)}: iters={iters} converged={ok} "
            f"build={build_s:.0f}s solve+jit={wall:.0f}s",
            flush=True,
        )


if __name__ == "__main__":
    main()
