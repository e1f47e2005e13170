"""Pressure recovery from a given velocity field.

Rebuild of /root/reference/src/solvers_aux/pressure.py: given u, find the
pressure that best satisfies the stationary momentum equation (the
reference solves the overdetermined system with LSQR, nullspace-fixed,
:24-97). Here: the momentum residual is affine in p,
r(p) = r0 + G p with G = A_up (the pressure-gradient block of the element
Jacobians); the least-squares problem min ||r0 + G p|| is solved via the
normal equations G^T G p = -G^T r0 with mean-pinned CG/GMRES.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..forms.navier_stokes import StabilizedNSForm
from ..la.gmres import fgmres
from ..spaces import FunctionSpace


def recover_pressure(
    V: FunctionSpace,
    Q: FunctionSpace,
    u,
    rho: float,
    mu: float,
    f=None,
    rtol: float = 1e-8,
    maxiter: int = 2000,
):
    """Return p (n_p,) minimizing the stationary momentum residual."""
    mesh = V.mesh
    dtype = mesh.points.dtype
    dim = mesh.gdim
    # The boundary terms matter: the reference form includes
    # `inner(p, dot(n, v))*ds` and `dot(mu*nabla_grad(u)*n, v)*ds`
    # (pressure.py:46-52); without them boundary test rows see an
    # inconsistent natural BC and the least-squares fit is polluted
    # domain-wide (measured: ||r_u(p_exact)|| > ||r_u(0)|| on plane
    # Poiseuille). Here the FULL traction 2 mu eps(u) n is used instead
    # of the reference's partial nabla_grad(u)^T n — the partial form
    # leaves tangential wall junk in the rows that drags the fitted
    # pressure gradient ~35% low (see facet_terms.py). Plain Galerkin
    # (stabilization=False), as the reference (P3/P2, no SUPG/PSPG).
    form = StabilizedNSForm(
        V, Q, boundary_correction=False, stabilization=False
    )
    from ..forms.facet_terms import natural_correction_full_stress

    form.add_facet_term(
        "natural_full_stress",
        np.arange(len(mesh.facets), dtype=np.int32),
        natural_correction_full_stress(),
    )
    prm = {
        # huge dt removes the time term; aux = (u,) makes du/dt = 0 anyway
        "dt": jnp.asarray(1e30, dtype),
        "rho": jnp.asarray(rho, dtype),
        "mu": jnp.asarray(mu, dtype),
        "f": jnp.asarray(
            np.zeros(dim) if f is None else np.asarray(f), dtype
        ),
    }
    u = jnp.asarray(u, dtype)
    aux = (u,)
    n_u_flat = form.n_u_flat

    @jax.jit
    def solve():
        p0 = jnp.zeros((Q.num_dofs,), dtype)
        ru0, _ = form.residual(u, p0, aux, prm)
        r0 = ru0.reshape(-1)
        A_cells, A_blocks = form.element_jacobians(u, p0, aux, prm)

        def G(v_p):
            return form.apply_sub_block(A_cells, A_blocks, v_p, "up")

        def Gt(v_u):
            # transpose apply via the same element blocks
            nud = V.element.ndofs * dim
            rs = slice(0, nud)
            cs = slice(nud, form.nloc)
            dm_u = form.dofmap_flat[:, rs]
            dm_p = form.dofmap_flat[:, cs] - n_u_flat
            ve = v_u[dm_u]
            ye = jnp.einsum("cab,ca->cb", A_cells[:, rs, cs], ve)
            y = jnp.zeros((Q.num_dofs,), dtype).at[dm_p].add(ye)
            for dmf, A_f in A_blocks:
                vf = v_u[dmf[:, rs]]
                yf = jnp.einsum("fab,fa->fb", A_f[:, rs, cs], vf)
                y = y.at[dmf[:, cs] - n_u_flat].add(yf)
            return y

        def normal_op(v_p):
            y = Gt(G(v_p))
            return y - jnp.mean(y)

        b = -Gt(r0)
        b = b - jnp.mean(b)
        p, info = fgmres(
            normal_op, b, restart=50, maxiter=maxiter, rtol=rtol
        )
        return p - jnp.mean(p), info["converged"]

    p, ok = solve()
    if not bool(ok):
        print("[pressure recovery] warning: normal equations not fully "
              "converged")
    return p
