"""Component-level timing of one stabilized_schur DFG step on the current
backend. Times each hot-path piece in isolation (jitted, warm) to find
where the 9 s/step at 78k DOF actually goes.

Usage: python scripts/profile_step.py [res_scale]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def bench(fn, *args, reps=10):
    y = fn(*args)
    jax.block_until_ready(y)
    t0 = time.perf_counter()
    for _ in range(reps):
        y = fn(*args)
    jax.block_until_ready(y)
    return (time.perf_counter() - t0) / reps


def main():
    res_scale = float(sys.argv[1]) if len(sys.argv) > 1 else 0.35
    from cfdtpu.scenarios.dfg_1 import DFG1Benchmark
    from cfdtpu.la.nodebsr import NodeBSR
    from cfdtpu.la.schur import make_schur_precond
    from cfdtpu.la.gmres import gmres_fixed, fgmres

    sc = DFG1Benchmark(
        "stabilized_schur", dt=0.05, T=1e9, res_scale=res_scale,
        dtype="auto",
    )
    s = sc.solver
    form = s.form
    prm = s.params()
    u, p = s.u_prev, s.p_prev
    aux = s._aux()
    bc_u_vals, bc_p_vals = s._bc_values()

    t = bench(jax.jit(lambda u, p: form.residual(u, p, aux, prm)), u, p)
    print(f"residual:            {t*1e3:9.2f} ms")

    jac = jax.jit(lambda u, p: form.element_jacobians(u, p, aux, prm))
    A_cells, A_blocks = jac(u, p)
    t = bench(jac, u, p)
    print(f"element_jacobians:   {t*1e3:9.2f} ms")

    bsr = s._nodebsr if s._nodebsr is not None else NodeBSR(form)
    asm = jax.jit(bsr.assemble)
    vals = asm(A_cells, A_blocks)
    t = bench(asm, A_cells, A_blocks)
    print(f"bsr.assemble:        {t*1e3:9.2f} ms")

    v = jnp.ones((form.n_flat,), form.dtype)
    mv = jax.jit(lambda v: bsr.apply_element_matrices(vals, (), v))
    t = bench(mv, v, reps=30)
    print(f"matvec (full):       {t*1e3:9.2f} ms")

    vu = v[: form.n_u_flat]
    vp = v[form.n_u_flat:]
    t = bench(jax.jit(lambda v: bsr.apply_sub_block(vals, (), v, "uu")),
              vu, reps=30)
    print(f"matvec (uu):         {t*1e3:9.2f} ms")
    t = bench(jax.jit(lambda v: bsr.apply_p_coupled(vals, v)), vp, reps=30)
    print(f"matvec (p coupled):  {t*1e3:9.2f} ms")

    # SELFP explicit matrix + AMG build
    n_u = form.n_u_flat
    bc_mask_u = jnp.zeros((n_u,), bool)
    spv = jax.jit(lambda vals: bsr.sp_vals(vals))
    sp = spv(vals)
    t = bench(spv, vals)
    print(f"sp_vals:             {t*1e3:9.2f} ms")
    amg = bsr.sp_amg()
    bld = jax.jit(amg.build)
    built = bld(sp)
    t = bench(bld, sp)
    print(f"amg.build:           {t*1e3:9.2f} ms")
    vc = jax.jit(lambda b: amg.v_cycle(built, b))
    t = bench(vc, vp, reps=30)
    print(f"amg.v_cycle:         {t*1e3:9.2f} ms")

    # inner sweeps
    Mu = bsr.uu_block_jacobi(vals, bc_mask_u)
    Auu = jax.jit(lambda r: gmres_fixed(
        lambda w: bsr.apply_sub_block(vals, (), w, "uu"), r,
        precond=Mu, m=s.pc_inner_u, reorth=False))
    t = bench(Auu, vu, reps=10)
    print(f"Auu sweep (m={s.pc_inner_u}):    {t*1e3:9.2f} ms")

    # full PC apply
    pc = make_schur_precond(
        bsr, vals, (), bc_mask_u, True,
        m_u=s.pc_inner_u, m_p=10, inner_method="amg_p",
    )
    pc_j = jax.jit(pc)
    t = bench(pc_j, v, reps=10)
    print(f"full PC apply:       {t*1e3:9.2f} ms")

    # one outer fgmres cycle (restart m) with this PC
    def outer(b):
        x, info = fgmres(mv, b, precond=pc, restart=10, maxiter=10,
                         rtol=1e-10)
        return x
    t = bench(jax.jit(outer), v, reps=3)
    print(f"10 outer fgmres its: {t*1e3:9.2f} ms")

    # one full newton step for reference
    t = bench(s._step, u, p, aux, bc_u_vals, bc_p_vals, prm, reps=2)
    print(f"full step:           {t*1e3:9.2f} ms "
          f"(stats: {s.last_stats})")


if __name__ == "__main__":
    main()
