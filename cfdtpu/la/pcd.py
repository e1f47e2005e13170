"""PCD (pressure convection-diffusion) Schur preconditioner.

Native implementation of the functionality the reference pulls from the
external fenicsx-pctools package (WrappedPC + PCDPC_vY,
/root/reference/src/solvers/stabilized_pcd.py:206-278 and SURVEY.md 2.4):
the Schur complement inverse is approximated by

    S^{-1} ~ Mp^{-1} Fp Ap^{-1}

with Ap the pressure Laplacian, Mp the pressure mass matrix, and
Fp = nu Ap + N(u_prev) the pressure-space convection-diffusion operator.
The reference's PCDPC_vY applies pressure Dirichlet conditions on the
OUTLET dofs of Ap (bcs_pcd); pass them via bc_mask_p. Inner solves are
fixed-iteration GMRES sweeps (the analogue of Mp Jacobi and Ap CG+hypre).
"""

from __future__ import annotations

import jax.numpy as jnp

from .gmres import gmres_fixed


def make_pcd_precond(
    form,
    A_cells,
    A_blocks,
    Ap_e,
    Mp_e,
    Fp_e,
    bc_mask_u,
    pin_pressure: bool,
    m_u: int = 8,
    m_p: int = 8,
    bc_mask_p=None,
):
    n_u_flat = form.n_u_flat

    def Auu(v):
        y = form.apply_sub_block(A_cells, A_blocks, v, "uu")
        return jnp.where(bc_mask_u, v, y)

    def Apu(v_u):
        return form.apply_sub_block(A_cells, A_blocks, v_u, "pu")

    d_full = form.jacobian_diagonal(A_cells, A_blocks)
    d_u = d_full[:n_u_flat]

    def _safe(d):
        scale = jnp.max(jnp.abs(d))
        floor = 1e-12 * scale
        return jnp.where(
            jnp.abs(d) < floor, jnp.where(d < 0, -floor, floor), d
        )

    d_u = _safe(jnp.where(bc_mask_u, 1.0, d_u))
    d_Ap = _safe(form.p_matrix_diagonal(Ap_e))
    d_Mp = _safe(form.p_matrix_diagonal(Mp_e))

    def Ap(v):
        y = form.apply_p_matrix(Ap_e, v)
        if bc_mask_p is not None:
            y = jnp.where(bc_mask_p, v, y)
        if pin_pressure:
            y = y - jnp.mean(y)
        return y

    def Mp(v):
        return form.apply_p_matrix(Mp_e, v)

    def Fp(v):
        return form.apply_p_matrix(Fp_e, v)

    def S_inv(r_p):
        if pin_pressure:
            r_p = r_p - jnp.mean(r_p)
        z = gmres_fixed(Ap, r_p, precond=lambda v: v / d_Ap, m=m_p)
        z = Fp(z)
        z = gmres_fixed(Mp, z, precond=lambda v: v / d_Mp, m=4)
        if pin_pressure:
            z = z - jnp.mean(z)
        return z

    def solve_Auu(r):
        return gmres_fixed(Auu, r, precond=lambda v: v / d_u, m=m_u)

    def precond(v):
        # upper-triangular Schur application (reference: Schur upper,
        # stabilized_pcd.py:246)
        r_u, r_p = v[:n_u_flat], v[n_u_flat:]
        z_p = S_inv(r_p)
        z_u = solve_Auu(
            r_u - jnp.where(
                bc_mask_u, 0.0,
                form.apply_sub_block(A_cells, A_blocks, z_p, "up"),
            )
        )
        return jnp.concatenate([z_u, z_p])

    return precond
