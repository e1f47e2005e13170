"""LSC (Least-Squares Commutator) Schur preconditioner.

Replaces the PETSc `fieldsplit_p_pc_type=lsc` configuration of the
reference's stabilized_lsc solvers
(/root/reference/src/solvers/stabilized_lsc.py:220-266: Schur LOWER,
SchurPreType.SELF with LSC on the pressure block, LU sub-solves).

Scaled LSC approximation of the Schur complement inverse:
    S^{-1} ~ (B D^{-1} B^T)^{-1} (B D^{-1} F D^{-1} B^T) (B D^{-1} B^T)^{-1}
with B = A_pu, B^T ~ A_up, F = A_uu and D = diag(A_uu). The two
Poisson-like solves with B D^{-1} B^T run as fixed-iteration GMRES sweeps
(the analogue of the reference's inner LU, flexible-outer-safe).
"""

from __future__ import annotations

import jax.numpy as jnp

from .gmres import gmres_fixed


def make_lsc_precond(
    form,
    A_cells,
    A_blocks,
    bc_mask_u,
    pin_pressure: bool,
    m_u: int = 8,
    m_p: int = 10,
    bc_mask_p=None,
):
    n_u_flat = form.n_u_flat

    def Auu(v):
        y = form.apply_sub_block(A_cells, A_blocks, v, "uu")
        return jnp.where(bc_mask_u, v, y)

    def Aup(v_p):
        y = form.apply_sub_block(A_cells, A_blocks, v_p, "up")
        return jnp.where(bc_mask_u, 0.0, y)

    def Apu(v_u):
        return form.apply_sub_block(A_cells, A_blocks, v_u, "pu")

    d_full = form.jacobian_diagonal(A_cells, A_blocks)
    d_u = jnp.where(bc_mask_u, 1.0, d_full[:n_u_flat])
    d_p = d_full[n_u_flat:]

    def _safe(d):
        scale = jnp.max(jnp.abs(d))
        floor = 1e-12 * scale
        return jnp.where(
            jnp.abs(d) < floor, jnp.where(d < 0, -floor, floor), d
        )

    d_u = _safe(d_u)
    d_p = _safe(d_p)
    # LSC commutator scaling: the velocity MASS diagonal (Elman et al.),
    # not diag(A_uu)
    q_u = _safe(jnp.where(bc_mask_u, 1.0, form.velocity_mass_diagonal()))
    inv_d_u = 1.0 / q_u

    def BBt(v_p):
        y = Apu(inv_d_u * Aup(v_p))
        if bc_mask_p is not None:
            y = jnp.where(bc_mask_p, v_p, y)
        if pin_pressure:
            y = y - jnp.mean(y)
        return y

    def solve_BBt(r):
        if pin_pressure:
            r = r - jnp.mean(r)
        z = gmres_fixed(BBt, r, precond=lambda v: v / d_p, m=m_p)
        if pin_pressure:
            z = z - jnp.mean(z)
        return z

    def S_inv(r_p):
        z1 = solve_BBt(r_p)
        w = inv_d_u * Aup(z1)
        w = form.apply_sub_block(A_cells, A_blocks, w, "uu")
        w = jnp.where(bc_mask_u, 0.0, w)
        z2 = Apu(inv_d_u * w)
        return solve_BBt(z2)

    def solve_Auu(r):
        return gmres_fixed(Auu, r, precond=lambda v: v / d_u, m=m_u)

    def precond(v):
        # lower-triangular Schur application (reference uses Schur LOWER)
        r_u, r_p = v[:n_u_flat], v[n_u_flat:]
        z_u = solve_Auu(r_u)
        r_s = r_p - Apu(z_u)
        z_p = S_inv(r_s)
        return jnp.concatenate([z_u, z_p])

    return precond
