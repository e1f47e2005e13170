"""Taylor-Hood Stokes solve for Newton initialization.

Rebuild of /root/reference/src/solvers_aux/stokes.py: a stationary Stokes
solve on Taylor-Hood P3/P2 spaces (:52-75) used to initialize the Newton
iteration of the stabilized solvers (reference
stabilized_schur_stokes.py:177-208). The reference uses nest matrices with
MINRES + additive fieldsplit (u: GAMG, p: mass-matrix Jacobi, rtol 1e-9);
here the saddle-point system is solved with flexible GMRES over element
Jacobian blocks and a SELFP-style Schur preconditioner.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..forms.navier_stokes import StabilizedNSForm
from ..la.gmres import fgmres
from ..la.schur import make_schur_precond
from ..mesh import Mesh
from ..spaces import FunctionSpace
from ..spaces.dirichlet import combine_bcs, gather_values


def solve_stokes(
    mesh: Mesh,
    mu: float,
    bcu,
    f=None,
    degree_u: int = 3,
    degree_p: int = 2,
    rtol: float = 1e-9,
    maxiter: int = 2000,
):
    """Solve stationary Stokes with Dirichlet velocity BCs.

    bcu: list of BoundaryCondition. Returns (u (n_u, d), p (n_p,), V, Q).
    Runs true P3/P2 in 3D too (tet face-interior dofs landed in round 4;
    parity with /root/reference/src/solvers_aux/stokes.py:52-75).
    """
    V = FunctionSpace(mesh, degree_u, mesh.gdim)
    Q = FunctionSpace(mesh, degree_p, 1)
    dtype = mesh.points.dtype

    # Stokes = the stabilized NS form at rho -> 0 (no time term, no
    # convection, no stabilization): use a dedicated tiny kernel instead.
    form = StabilizedNSForm(V, Q, boundary_correction=False)

    # steady Stokes element residual: 2 mu eps(u):eps(v) - p div v; q div u
    from ..utils import det_and_inv

    phi_u, dphi_u = form.phi_u, form.dphi_u
    phi_p, dphi_p = form.phi_p, form.dphi_p
    gdphi, qw = form.gdphi, form.qw
    dim = form.dim
    eye = jnp.eye(dim, dtype=dtype)
    mu_j = jnp.asarray(mu, dtype)
    f_j = jnp.asarray(
        np.zeros(dim) if f is None else np.asarray(f), dtype
    )

    def kernel(u_e, p_e, aux_e, coords_e, h_e, prm):
        J = jnp.einsum("vg,qvd->qgd", coords_e, gdphi)
        detJ, invJ = det_and_inv(J)
        wdet = jnp.abs(detJ) * qw
        gu = jnp.einsum("qbd,qdg->qbg", dphi_u, invJ)
        gp = jnp.einsum("qbd,qdg->qbg", dphi_p, invJ)
        grad_u = jnp.einsum("bi,qbg->qig", u_e, gu)
        p_q = phi_p @ p_e
        sig = mu_j * (grad_u + jnp.swapaxes(grad_u, 1, 2)) \
            - p_q[:, None, None] * eye
        ru = jnp.einsum("q,qij,qbj->bi", wdet, sig, gu)
        ru -= jnp.einsum("q,qb,i->bi", wdet, phi_u, f_j)
        div_u = jnp.trace(grad_u, axis1=1, axis2=2)
        rp = jnp.einsum("q,qb->b", wdet * div_u, phi_p)
        # tiny pressure mass regularization keeps diag(App) nonzero for
        # the Jacobi-smoothed Schur PC (Taylor-Hood has App = 0)
        rp = rp + 1e-8 * jnp.einsum("q,qb,qc,c->b", wdet, phi_p, phi_p, p_e)
        return ru, rp

    form._kernel = kernel
    form._facet_blocks = []

    bcu_d = [bc.getBC(V) for bc in bcu]
    bc_dofs, keep = combine_bcs(bcu_d, mesh.gdim)
    bc_vals = jnp.asarray(gather_values(bcu_d, keep), dtype)
    n_u, n_p = V.num_dofs, Q.num_dofs

    bc_mask_np = np.zeros(n_u * dim + n_p, dtype=bool)
    for d0 in range(dim):
        bc_mask_np[bc_dofs.astype(np.int64) * dim + d0] = True
    bc_mask = jnp.asarray(bc_mask_np)
    bc_mask_u = jnp.asarray(bc_mask_np[: n_u * dim])

    prm = {
        "dt": jnp.asarray(1.0, dtype), "rho": jnp.asarray(1.0, dtype),
        "mu": mu_j, "f": f_j,
    }
    u0 = jnp.zeros((n_u, dim), dtype)
    p0 = jnp.zeros((n_p,), dtype)
    aux = (u0,)

    @jax.jit
    def solve():
        ru, rp = form.residual(u0, p0, aux, prm)
        ru = ru.at[jnp.asarray(bc_dofs)].set(-bc_vals)  # residual at x=0
        rp = rp - jnp.mean(rp)
        b = -jnp.concatenate([ru.reshape(-1), rp])

        A_cells, A_blocks = form.element_jacobians(u0, p0, aux, prm)

        def matvec(v):
            y = form.apply_element_matrices(A_cells, A_blocks, v)
            y = jnp.where(bc_mask, v, y)
            du, dp = y[: n_u * dim], y[n_u * dim:]
            return jnp.concatenate([du, dp - jnp.mean(dp)])

        # Silvester-Wathen block-diagonal PC: the Schur complement of
        # Stokes is spectrally equivalent to the scaled pressure mass
        # matrix, S ~ Mp/mu — the same approximation behind the
        # reference's MINRES + mass-matrix-Jacobi p-block
        # (/root/reference/src/solvers_aux/stokes.py:52-75). The
        # SELFP-diag Schur used by the NS solvers is NOT valid here:
        # Taylor-Hood has App = 0, so Sp degenerates to the tiny
        # regularization and the outer iteration stalls.
        mp_lumped = form.p_mass_lumped()

        def Auu(v):
            y = form.apply_sub_block(A_cells, A_blocks, v, "uu")
            return jnp.where(bc_mask_u, v, y)

        d_full = form.jacobian_diagonal(A_cells, A_blocks)
        d_u = jnp.where(bc_mask_u, 1.0, d_full[: n_u * dim])

        from ..la.gmres import gmres_fixed

        def precond(v):
            r_u, r_p = v[: n_u * dim], v[n_u * dim:]
            z_u = gmres_fixed(
                Auu, r_u, precond=lambda w: w / d_u, m=12, reorth=False
            )
            z_p = mu_j * r_p / mp_lumped
            return jnp.concatenate([z_u, z_p - jnp.mean(z_p)])

        x, info = fgmres(
            matvec, b, precond=precond, restart=60, maxiter=maxiter,
            rtol=rtol,
        )
        return (
            x[: n_u * dim].reshape(n_u, dim),
            x[n_u * dim:] - jnp.mean(x[n_u * dim:]),
            info["converged"], info["resnorm"],
        )

    u, p, ok, res = solve()
    if not bool(ok):
        raise RuntimeError(f"Stokes solve did not converge (res={res})")
    return u, p, V, Q
