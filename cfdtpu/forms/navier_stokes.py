"""SUPG/PSPG/LSIC-stabilized incompressible Navier-Stokes residual.

This is the TPU-native equivalent of the reference's UFL weak form in
/root/reference/src/solvers/stabilized_schur.py:67-123: equal-order Pk-Pk
velocity/pressure, Crank-Nicolson midpoint convection/stress, SUPG + PSPG +
LSIC stabilization with the tau definitions of :100-119, and the natural
boundary correction `p n·v - mu (nabla_grad u_mid)^T n·v` over exterior
facets (:79). Instead of ffcx-generated C kernels + PETSc assembly, the
residual is a vmapped per-element JAX kernel scattered with jnp scatter-add;
the Jacobian never exists as a matrix — Newton consumes jax.jvp of this
function (exact linearization, the analogue of UFL `derivative` at :187).

Conventions: velocity u is (n_u, d); grad_u[i, j] = du_i/dx_j.
UFL's nabla_grad(u)[i, j] = du_j/dx_i is the transpose; the boundary term
dot(nabla_grad(u)*n, v) therefore reads sum_j grad_u[j, i] n_j here.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..assembly import FacetQuadrature
from ..elements import LagrangeElement, quadrature
from ..spaces import FunctionSpace
from ..utils import det_and_inv


def _eps_for(dtype) -> float:
    """Division guard matching PETSc ScalarType resolution semantics
    (reference stabilized_schur.py:100)."""
    return float(np.finfo(np.dtype(dtype)).resolution)


class StabilizedNSForm:
    """Residual of the stabilized NS equations with CN-midpoint stepping.

    params dict keys (all jnp scalars/arrays, so changing them never
    recompiles — the analogue of PETSc Constants):
        dt, rho, mu: scalars
        f: body force (d,)
    """

    def __init__(
        self,
        V: FunctionSpace,
        Q: FunctionSpace,
        quad_degree: int | None = None,
        include_boundary_terms: bool = True,
    ):
        assert V.mesh is Q.mesh
        mesh = V.mesh
        self.V, self.Q = V, Q
        self.mesh = mesh
        self.dim = mesh.dim
        dt = mesh.points.dtype
        self.dtype = dt
        self.eps = _eps_for(dt)

        qd = quad_degree if quad_degree is not None else 2 * V.degree + 1
        xi, w = quadrature(mesh.cell_type, qd)

        nderiv = 2 if V.degree > 1 else 1
        tabs_u = V.element.tabulate(xi, nderiv=nderiv)
        tabs_p = Q.element.tabulate(xi, nderiv=1)
        geom = LagrangeElement.create(mesh.cell_type, 1)
        _, gdphi = geom.tabulate(xi, nderiv=1)

        j = jnp.asarray
        self.qw = j(w, dtype=dt)
        self.phi_u = j(tabs_u[0], dtype=dt)
        self.dphi_u = j(tabs_u[1], dtype=dt)
        self.d2phi_u = j(tabs_u[2], dtype=dt) if nderiv == 2 else None
        self.phi_p = j(tabs_p[0], dtype=dt)
        self.dphi_p = j(tabs_p[1], dtype=dt)
        self.gdphi = j(gdphi, dtype=dt)

        self.dofmap_u = j(V.dofmap)
        self.dofmap_p = j(Q.dofmap)
        self.cell_coords = j(mesh.points[mesh.cells], dtype=dt)
        self.cell_h = j(mesh.h(), dtype=dt)

        # flat per-element dof layout [u(b=0,i=0..d), u(b=1,..), ..., p(b)]
        # matching the solver's ravel convention (u.reshape(-1) ++ p)
        nbu, nbp = V.element.ndofs, Q.element.ndofs
        dim = self.dim
        dmf = (
            np.asarray(V.dofmap)[:, :, None] * dim
            + np.arange(dim)[None, None, :]
        ).reshape(-1, nbu * dim)
        dmf = np.concatenate(
            [dmf, V.num_dofs * dim + np.asarray(Q.dofmap)], axis=1
        )
        self.dofmap_flat = j(dmf.astype(np.int32))
        self.nloc = nbu * dim + nbp
        self.n_flat = V.num_dofs * dim + Q.num_dofs

        self._kernel = self._make_cell_kernel()

        self._boundary = None
        if include_boundary_terms and len(mesh.facets):
            self._boundary = self._make_boundary_data(qd)
            self.facet_dofmap_flat = j(
                np.asarray(dmf)[np.asarray(self._boundary["cells"])]
            )

    # ------------------------------------------------------------------
    def _make_cell_kernel(self):
        dim = self.dim
        phi_u, dphi_u = self.phi_u, self.dphi_u
        phi_p, dphi_p = self.phi_p, self.dphi_p
        d2phi_u = self.d2phi_u
        gdphi, qw = self.gdphi, self.qw
        eps_default = self.eps
        eye = jnp.eye(dim, dtype=self.dtype)

        def kernel(u_e, p_e, uprev_e, coords_e, h_e, prm):
            rho, mu, dt = prm["rho"], prm["mu"], prm["dt"]
            f = prm["f"]
            nu = mu / rho

            # geometry (general isoparametric-P1/Q1; affine for simplices)
            J = jnp.einsum("vg,qvd->qgd", coords_e, gdphi)
            detJ, invJ = det_and_inv(J)  # invJ (q, d, g): dxi_d/dx_g
            detJ = jnp.abs(detJ)
            wdet = qw * detJ

            gu = jnp.einsum("qbd,qdg->qbg", dphi_u, invJ)
            gp = jnp.einsum("qbd,qdg->qbg", dphi_p, invJ)

            u_q = phi_u @ u_e  # (q, i)
            up_q = phi_u @ uprev_e
            um_q = 0.5 * (u_q + up_q)
            grad_u = jnp.einsum("bi,qbg->qig", u_e, gu)
            grad_up = jnp.einsum("bi,qbg->qig", uprev_e, gu)
            grad_um = 0.5 * (grad_u + grad_up)
            p_q = phi_p @ p_e
            grad_p = jnp.einsum("b,qbg->qg", p_e, gp)

            div_um = jnp.trace(grad_um, axis1=1, axis2=2)
            conv = jnp.einsum("qig,qg->qi", grad_um, um_q)
            sig = (
                mu * (grad_um + jnp.swapaxes(grad_um, 1, 2))
                - p_q[:, None, None] * eye
            )

            # strong residual R = rho(du/dt + conv) - div sigma - rho f
            # (stabilized_schur.py:95-97); div(2 mu eps(u)) = mu(lap u +
            # grad div u) vanishes for degree-1 elements.
            R = rho * ((u_q - up_q) / dt + conv) + grad_p - rho * f
            if d2phi_u is not None:
                Hb = jnp.einsum(
                    "qbde,qdg,qeh->qbgh", d2phi_u, invJ, invJ
                )
                hess = jnp.einsum(
                    "bi,qbgh->qigh", 0.5 * (u_e + uprev_e), Hb
                )
                lap = jnp.einsum("qigg->qi", hess)
                graddiv = jnp.einsum("qjij->qi", hess)
                R = R - mu * (lap + graddiv)

            # tau_SUPG = (tau1^-2 + tau2^-2 + tau3^-2)^{-1/2}
            # (stabilized_schur.py:100-108); vnorm uses u_prev to keep tau
            # constant through the Newton linearization (:91-93).
            vn = jnp.sqrt(jnp.sum(up_q * up_q, axis=-1))
            eps = jnp.asarray(eps_default, wdet.dtype)
            t1 = h_e / jnp.maximum(2.0 * vn, eps)
            t2 = dt / 2.0
            t3 = (h_e * h_e) / (4.0 * nu)
            tau = (t1 ** -2.0 + t2 ** -2.0 + t3 ** -2.0) ** -0.5
            Re_h = vn * h_e / (2.0 * nu)
            z = jnp.minimum(Re_h / 3.0, 1.0)
            tau_lsic = vn * h_e * z / 2.0

            # Galerkin momentum
            mass = rho * ((u_q - up_q) / dt + conv - f)
            ru = jnp.einsum("q,qb,qi->bi", wdet, phi_u, mass)
            ru += jnp.einsum("q,qij,qbj->bi", wdet, sig, gu)
            # SUPG: tau R · (u_mid·grad) v
            adv_v = jnp.einsum("qbg,qg->qb", gu, um_q)
            ru += jnp.einsum("q,qi,qb->bi", wdet * tau, R, adv_v)
            # LSIC: tau_lsic div(u_mid) rho div(v)
            ru += jnp.einsum("q,qbi->bi", wdet * tau_lsic * rho * div_um, gu)

            # continuity + PSPG
            rp = jnp.einsum("q,qb->b", wdet * div_um, phi_p)
            rp += jnp.einsum("q,qi,qbi->b", wdet * tau / rho, R, gp)
            return ru, rp

        return kernel

    # ------------------------------------------------------------------
    def _make_boundary_data(self, quad_degree: int):
        mesh = self.mesh
        all_facets = np.arange(len(mesh.facets), dtype=np.int32)
        fq = FacetQuadrature(mesh, all_facets, quad_degree)
        phi_u_f, dphi_u_f = fq.tabulate(self.V.element)
        phi_p_f, _ = fq.tabulate(self.Q.element)
        geom = LagrangeElement.create(mesh.cell_type, 1)
        _, gdphi_f = fq.tabulate(geom)
        _, normal, dS = fq.geometry()

        dt = self.dtype
        j = jnp.asarray
        return {
            "cells": j(fq.cells),
            "group": j(fq.group),
            "phi_u": j(phi_u_f, dtype=dt),
            "dphi_u": j(dphi_u_f, dtype=dt),
            "phi_p": j(phi_p_f, dtype=dt),
            "gdphi": j(gdphi_f, dtype=dt),
            "normal": j(normal, dtype=dt),
            "dS": j(dS, dtype=dt),
        }

    def _facet_kernel(
        self, u_e, p_e, up_e, coords_e, phi_u, dphi_u, phi_p, gdphi,
        normal, dS, prm,
    ):
        """Per-facet contribution of the natural boundary correction
        `p n·v - mu (nabla_grad u_mid)^T n·v` (stabilized_schur.py:79).
        Returns r_u (nbu, dim)."""
        mu = prm["mu"]
        J = jnp.einsum("vg,qvd->qgd", coords_e, gdphi)
        _, invJ = det_and_inv(J)
        gu = jnp.einsum("qbd,qdg->qbg", dphi_u, invJ)
        um_e = 0.5 * (u_e + up_e)
        grad_um = jnp.einsum("bi,qbg->qig", um_e, gu)
        p_q = phi_p @ p_e
        gtn = jnp.einsum("qjg,qj->qg", grad_um, normal)
        term = p_q[:, None] * normal - mu * gtn  # (nq, d)
        return jnp.einsum("q,qb,qi->bi", dS, phi_u, term)

    def _facet_args(self):
        """Per-facet vmap operands (tables gathered by group)."""
        b = self._boundary
        g = b["group"]
        cells = b["cells"]
        return (
            self.cell_coords[cells],
            b["phi_u"][g], b["dphi_u"][g], b["phi_p"][g], b["gdphi"][g],
            b["normal"], b["dS"],
        )

    def _boundary_residual(self, u, p, u_prev, prm):
        b = self._boundary
        cells = b["cells"]
        dm_u = self.dofmap_u[cells]
        dm_p = self.dofmap_p[cells]
        ru_f = jax.vmap(
            self._facet_kernel,
            in_axes=(0, 0, 0, 0, 0, 0, 0, 0, 0, 0, None),
        )(u[dm_u], p[dm_p], u_prev[dm_u], *self._facet_args(), prm)
        ru = jnp.zeros((self.V.num_dofs, self.dim), self.dtype)
        ru = ru.at[dm_u].add(ru_f)
        return ru

    # ------------------------------------------------------------------
    def residual(self, u, p, u_prev, prm):
        """Assembled residual (r_u (n_u, d), r_p (n_p,)) — jittable."""
        kernel = jax.vmap(self._kernel, in_axes=(0, 0, 0, 0, 0, None))
        u_e = u[self.dofmap_u]
        p_e = p[self.dofmap_p]
        up_e = u_prev[self.dofmap_u]
        ru_e, rp_e = kernel(
            u_e, p_e, up_e, self.cell_coords, self.cell_h, prm
        )
        ru = jnp.zeros((self.V.num_dofs, self.dim), self.dtype)
        rp = jnp.zeros((self.Q.num_dofs,), self.dtype)
        ru = ru.at[self.dofmap_u].add(ru_e)
        rp = rp.at[self.dofmap_p].add(rp_e)
        if self._boundary is not None:
            ru = ru + self._boundary_residual(u, p, u_prev, prm)
        return ru, rp

    # ------------------------------------------------------------------
    # Element Jacobians: the TPU-native replacement for the reference's
    # assembled PETSc block matrix (stabilized_schur.py:191, :154). The
    # exact per-element Jacobian blocks come from jacfwd of the element
    # kernel (the analogue of UFL `derivative` at :187); the global
    # operator is applied as gather -> batched (nloc x nloc) matmul ->
    # scatter, which keeps the Krylov hot loop on dense batched matmuls.
    # ------------------------------------------------------------------
    def _flat_cell_kernel(self):
        nbu = self.V.element.ndofs
        dim = self.dim

        def fk(xe, up_e, coords_e, h_e, prm):
            u_e = xe[: nbu * dim].reshape(nbu, dim)
            p_e = xe[nbu * dim:]
            ru, rp = self._kernel(u_e, p_e, up_e, coords_e, h_e, prm)
            return jnp.concatenate([ru.reshape(-1), rp])

        return fk

    def _flat_facet_kernel(self):
        nbu = self.V.element.ndofs
        nbp = self.Q.element.ndofs
        dim = self.dim

        def fk(xe, up_e, coords_e, phi_u, dphi_u, phi_p, gdphi, normal,
               dS, prm):
            u_e = xe[: nbu * dim].reshape(nbu, dim)
            p_e = xe[nbu * dim:]
            ru = self._facet_kernel(
                u_e, p_e, up_e, coords_e, phi_u, dphi_u, phi_p, gdphi,
                normal, dS, prm,
            )
            return jnp.concatenate(
                [ru.reshape(-1), jnp.zeros((nbp,), ru.dtype)]
            )

        return fk

    def element_jacobians(self, u, p, u_prev, prm):
        """Exact element Jacobian blocks (A_cells (nc, nloc, nloc),
        A_facets (nf, nloc, nloc) | None) at state (u, p)."""
        xe = jnp.concatenate(
            [
                u[self.dofmap_u].reshape(self.mesh.num_cells, -1),
                p[self.dofmap_p],
            ],
            axis=1,
        )
        up_e = u_prev[self.dofmap_u]
        fk = self._flat_cell_kernel()
        A_cells = jax.vmap(
            jax.jacfwd(fk), in_axes=(0, 0, 0, 0, None)
        )(xe, up_e, self.cell_coords, self.cell_h, prm)

        A_facets = None
        if self._boundary is not None:
            b = self._boundary
            cells = b["cells"]
            xef = jnp.concatenate(
                [
                    u[self.dofmap_u[cells]].reshape(len(cells), -1),
                    p[self.dofmap_p[cells]],
                ],
                axis=1,
            )
            ffk = self._flat_facet_kernel()
            A_facets = jax.vmap(
                jax.jacfwd(ffk),
                in_axes=(0, 0, 0, 0, 0, 0, 0, 0, 0, None),
            )(xef, u_prev[self.dofmap_u[cells]], *self._facet_args(), prm)
        return A_cells, A_facets

    def apply_element_matrices(self, A_cells, A_facets, v_flat):
        """y = A v with A given as element blocks; flat dof layout."""
        ve = v_flat[self.dofmap_flat]  # (nc, nloc)
        ye = jnp.einsum("cab,cb->ca", A_cells, ve)
        y = jnp.zeros((self.n_flat,), self.dtype).at[
            self.dofmap_flat
        ].add(ye)
        if A_facets is not None:
            vf = v_flat[self.facet_dofmap_flat]
            yf = jnp.einsum("fab,fb->fa", A_facets, vf)
            y = y.at[self.facet_dofmap_flat].add(yf)
        return y

    def jacobian_diagonal(self, A_cells, A_facets):
        """Assembled diagonal of the element-block operator (flat layout) —
        the Jacobi PC (stand-in for the reference's ASM sub-PCs)."""
        idx = jnp.arange(self.nloc)
        d = jnp.zeros((self.n_flat,), self.dtype).at[
            self.dofmap_flat
        ].add(A_cells[:, idx, idx])
        if A_facets is not None:
            d = d.at[self.facet_dofmap_flat].add(A_facets[:, idx, idx])
        return d

    # ------------------------------------------------------------------
    def l2_norm_sq(self, fn, num_components: int | None = None):
        """Integral of |fn|^2 over the domain (for norms.txt / error logs,
        reference /root/reference/src/scenario.py:315-323)."""
        if fn.ndim == 1:
            phi = self.phi_p if fn.shape[0] == self.Q.num_dofs else self.phi_u
            dm = (
                self.dofmap_p
                if fn.shape[0] == self.Q.num_dofs
                else self.dofmap_u
            )
            f_e = fn[dm]
            vals = jnp.einsum("qb,cb->cq", phi, f_e) ** 2
        else:
            f_e = fn[self.dofmap_u]
            v = jnp.einsum("qb,cbi->cqi", self.phi_u, f_e)
            vals = jnp.sum(v * v, axis=-1)
        J = jnp.einsum("cvg,qvd->cqgd", self.cell_coords, self.gdphi)
        detJ, _ = det_and_inv(J)
        detJ = jnp.abs(detJ)
        return jnp.sum(vals * detJ * self.qw[None, :])
