"""Solver base class.

Mirrors the reference SolverBase contract
(/root/reference/src/solverBase.py:25-195): holds dt/rho/mu/f constants,
velocity/pressure spaces V/Q, the state functions u_sol/p_sol/u_prev/p_prev
and residual functions, and the wall-shear-stress output
(`assemble_wss`, reference :144-195). State lives as JAX device arrays;
solvers expose `setup(bcu, bcp, facet_tags, tags)` and `solveStep()` exactly
like the reference so the Scenario time loop is interchangeable.
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from typing import Callable

import numpy as np
import jax.numpy as jnp

from ..assembly import FacetQuadrature
from ..elements import LagrangeElement
from ..mesh import Mesh
from ..spaces import FunctionSpace
from ..utils import det_and_inv


class SolverBase(ABC):
    def __init__(
        self,
        mesh: Mesh,
        dt: float,
        rho: float,
        mu: float,
        f,
        initial_velocity: Callable | None = None,
    ):
        self.mesh = mesh
        self.dtype = mesh.points.dtype
        self.dt = float(dt)
        self.rho = float(rho)
        self.mu = float(mu)
        self.f = np.asarray(f, dtype=self.dtype).reshape(mesh.gdim)
        self._V = None
        self._Q = None
        self.u_sol = None
        self.p_sol = None
        self.u_prev = None
        self.p_prev = None
        self.u_residual = None
        self.p_residual = None
        self.shear_stress = None
        self._wss = None

    # -- spaces ---------------------------------------------------------
    @property
    def V(self) -> FunctionSpace:
        assert self._V is not None, "call initVelocitySpace() first"
        return self._V

    @property
    def Q(self) -> FunctionSpace:
        assert self._Q is not None, "call initPressureSpace() first"
        return self._Q

    def initVelocitySpace(self, degree: int) -> None:
        self._V = FunctionSpace(self.mesh, degree, self.mesh.gdim)
        z = jnp.zeros((self._V.num_dofs, self.mesh.gdim), self.dtype)
        self.u_sol = z
        self.u_prev = z
        self.u_residual = z

    def initPressureSpace(self, degree: int) -> None:
        self._Q = FunctionSpace(self.mesh, degree, 1)
        z = jnp.zeros((self._Q.num_dofs,), self.dtype)
        self.p_sol = z
        self.p_prev = z
        self.p_residual = z

    # -- abstract interface (same as reference) --------------------------
    @abstractmethod
    def setup(self, bcu, bcp, facet_tags=None, tags=None) -> None:
        ...

    @abstractmethod
    def solveStep(self) -> None:
        ...

    def l2_norm_sq(self, fn):
        """Integral of |fn|^2 (delegates to the solver's form)."""
        return self.form.l2_norm_sq(fn)

    # -- params pytree ----------------------------------------------------
    def base_params(self) -> dict:
        dt = self.dtype
        return {
            "dt": jnp.asarray(self.dt, dt),
            "rho": jnp.asarray(self.rho, dt),
            "mu": jnp.asarray(self.mu, dt),
            "f": jnp.asarray(self.f, dt),
        }

    # -- wall shear stress ------------------------------------------------
    def initStressForm(self) -> None:
        """Prepare the WSS boundary kernel: the tangential traction
        Lt = (1/FacetArea) (T - (T·n) n)·w ds with T = -sigma(u, p) n,
        assembled into a CG1 vector function (reference
        /root/reference/src/solverBase.py:144-172)."""
        mesh = self.mesh
        self._wss_space = FunctionSpace(mesh, 1, mesh.gdim)
        self.shear_stress = jnp.zeros(
            (self._wss_space.num_dofs, mesh.gdim), self.dtype
        )
        all_facets = np.arange(len(mesh.facets), dtype=np.int32)
        fq = FacetQuadrature(mesh, all_facets, 2 * self.V.degree + 1)
        phi_u, dphi_u = fq.tabulate(self.V.element)
        phi_p, _ = fq.tabulate(self.Q.element)
        phi_w, _ = fq.tabulate(self._wss_space.element)
        geom = LagrangeElement.create(mesh.cell_type, 1)
        _, gdphi = fq.tabulate(geom)
        _, normal, dS = fq.geometry()
        area = fq.facet_measure()

        dt = self.dtype
        j = jnp.asarray
        self._wss = {
            "cells": j(fq.cells),
            "group": j(fq.group),
            "phi_u": j(phi_u, dtype=dt),
            "dphi_u": j(dphi_u, dtype=dt),
            "phi_p": j(phi_p, dtype=dt),
            "phi_w": j(phi_w, dtype=dt),
            "gdphi": j(gdphi, dtype=dt),
            "normal": j(normal, dtype=dt),
            "dS": j(dS, dtype=dt),
            "inv_area": j(1.0 / area, dtype=dt),
            "dofmap_u": j(self.V.dofmap[fq.cells]),
            "dofmap_p": j(self.Q.dofmap[fq.cells]),
            "dofmap_w": j(self._wss_space.dofmap[fq.cells]),
            "coords": j(
                mesh.points[mesh.cells][fq.cells], dtype=dt
            ),
        }

    def assemble_wss(self) -> None:
        if self._wss is None:
            return
        w = self._wss
        mu = jnp.asarray(self.mu, self.dtype)
        u_e = self.u_sol[w["dofmap_u"]]
        p_e = self.p_sol[w["dofmap_p"]]

        dphi_u = w["dphi_u"][w["group"]]
        phi_p = w["phi_p"][w["group"]]
        phi_w = w["phi_w"][w["group"]]
        gdphi = w["gdphi"][w["group"]]
        n, dS = w["normal"], w["dS"]

        J = jnp.einsum("fvg,fqvd->fqgd", w["coords"], gdphi)
        _, invJ = det_and_inv(J)
        gu = jnp.einsum("fqbd,fqdg->fqbg", dphi_u, invJ)
        grad_u = jnp.einsum("fbi,fqbg->fqig", u_e, gu)
        p_q = jnp.einsum("fqb,fb->fq", phi_p, p_e)

        # sigma = mu (grad u + grad u^T) - p I; T = -sigma n
        sig_n = (
            mu * (jnp.einsum("fqig,fqg->fqi", grad_u, n)
                  + jnp.einsum("fqgi,fqg->fqi", grad_u, n))
            - p_q[..., None] * n
        )
        T = -sig_n
        Tn = jnp.einsum("fqi,fqi->fq", T, n)
        Tt = T - Tn[..., None] * n

        vals = jnp.einsum(
            "f,fq,fqb,fqi->fbi", w["inv_area"], dS, phi_w, Tt
        )
        out = jnp.zeros(
            (self._wss_space.num_dofs, self.mesh.gdim), self.dtype
        )
        self.shear_stress = out.at[w["dofmap_w"]].add(vals)
