"""Drag/lift and boundary-force functionals.

Replaces the reference's UFL boundary functionals for the DFG benchmark
(/root/reference/src/scenarios/dfg_1.py:183-211): with n the facet normal
flipped to point from the obstacle into the fluid and t = (n_y, -n_x),

    F_D = int_obs ( mu d(u·t)/dn n_y - p n_x ) ds
    F_L = -int_obs ( mu d(u·t)/dn n_x + p n_y ) ds

and the full traction-based force F_i = int (-sigma(u, p) n)_i ds used by
the dfg_2d_1 solver (/root/reference/src/solvers/dfg_2d_1.py:166-182).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..assembly import FacetQuadrature
from ..elements import LagrangeElement
from ..spaces import FunctionSpace
from ..utils import det_and_inv


class BoundaryForce:
    """Precomputed facet data for force functionals over a tagged facet
    subset (the obstacle boundary)."""

    def __init__(self, V: FunctionSpace, Q: FunctionSpace, facet_indices):
        mesh = V.mesh
        self.V, self.Q = V, Q
        fq = FacetQuadrature(mesh, facet_indices, 2 * V.degree + 1)
        phi_u, dphi_u = fq.tabulate(V.element)
        phi_p, _ = fq.tabulate(Q.element)
        geom = LagrangeElement.create(mesh.cell_type, 1)
        _, gdphi = fq.tabulate(geom)
        _, normal, dS = fq.geometry()

        dt = mesh.points.dtype
        j = jnp.asarray
        g = fq.group
        self.cells = fq.cells
        self.phi_u = j(phi_u, dtype=dt)[g]
        self.dphi_u = j(dphi_u, dtype=dt)[g]
        self.phi_p = j(phi_p, dtype=dt)[g]
        self.gdphi = j(gdphi, dtype=dt)[g]
        self.normal = j(normal, dtype=dt)
        self.dS = j(dS, dtype=dt)
        self.dofmap_u = j(np.asarray(V.dofmap)[fq.cells])
        self.dofmap_p = j(np.asarray(Q.dofmap)[fq.cells])
        self.coords = j(
            mesh.points[mesh.cells][fq.cells], dtype=dt
        )

    def _fields(self, u, p):
        u_e = u[self.dofmap_u]
        p_e = p[self.dofmap_p]
        J = jnp.einsum("fvg,fqvd->fqgd", self.coords, self.gdphi)
        _, invJ = det_and_inv(J)
        gu = jnp.einsum("fqbd,fqdg->fqbg", self.dphi_u, invJ)
        grad_u = jnp.einsum("fbi,fqbg->fqig", u_e, gu)  # (f, q, i, g)
        u_q = jnp.einsum("fqb,fbi->fqi", self.phi_u, u_e)
        p_q = jnp.einsum("fqb,fb->fq", self.phi_p, p_e)
        return u_q, grad_u, p_q

    def drag_lift(self, u, p, mu: float):
        """DFG drag/lift line integrals (dfg_1.py:191-202). The facet
        normal stored here points out of the fluid; the formula uses the
        flipped normal (into the fluid from the obstacle)."""
        _, grad_u, p_q = self._fields(u, p)
        n = -self.normal  # (f, q, 2)
        t = jnp.stack([n[..., 1], -n[..., 0]], axis=-1)
        # u_t = t·u; grad(u_t)·n = t_i (grad u)_{ig} n_g (t is constant
        # per facet quadrature point to leading order)
        dut_dn = jnp.einsum("fqi,fqig,fqg->fq", t, grad_u, n)
        fd = jnp.sum(
            (mu * dut_dn * n[..., 1] - p_q * n[..., 0]) * self.dS
        )
        fl = -jnp.sum(
            (mu * dut_dn * n[..., 0] + p_q * n[..., 1]) * self.dS
        )
        return fd, fl

    def traction_force(self, u, p, mu: float):
        """F_i = int (-sigma(u, p) n)_i ds with the outward fluid normal
        (dfg_2d_1 solver forces, dfg_2d_1.py:166-182)."""
        _, grad_u, p_q = self._fields(u, p)
        n = self.normal
        eps_u = 0.5 * (grad_u + jnp.swapaxes(grad_u, 2, 3))
        sig_n = (
            2.0 * mu * jnp.einsum("fqig,fqg->fqi", eps_u, n)
            - p_q[..., None] * n
        )
        return -jnp.einsum("fqi,fq->i", sig_n, self.dS)
