"""3D Taylor-Green (Ethier-Steinman Beltrami) scenario with exact solution.

Rebuild of /root/reference/src/scenarios/taylor_green.py: unit cube,
time-dependent Dirichlet velocity AND pressure on all boundary facets taken
from the analytic solution (a = pi/4, d = pi/2, decay e^{-d^2 t},
:74-134), per-step L2 error logged to err.txt by the base loop. As in the
reference, the boundary values are refreshed through the after-step
callback, so the BC used for step n+1 is the exact field at t_n.

The mesh resolution is parametrized (reference hardcodes 32^3 at :34);
the decay matches the Navier-Stokes solution exactly when nu = mu/rho = 1.
"""

from __future__ import annotations

import numpy as np

from ..mesh import create_unit_cube
from ..spaces import BoundaryCondition
from .base import Scenario


class TaylorGreenSimulation(Scenario):
    def __init__(
        self,
        solver_name,
        dt,
        T,
        f=(0, 0, 0),
        *,
        rho=1,
        mu=1 / 50,
        nx=32,
        dtype="auto",
        **solver_kwargs,
    ):
        self._mesh = None
        self._bcu = None
        self._bcp = None
        self.nx = int(nx)
        from ..utils import resolve_dtype
        self._dtype = resolve_dtype(dtype)
        self._t_bc = 0.0
        super().__init__(
            solver_name, "taylor_green", rho, mu, dt, T, f, **solver_kwargs
        )
        self.setup()

    @property
    def mesh(self):
        if self._mesh is None:
            self._mesh = create_unit_cube(self.nx, dtype=self._dtype)
        return self._mesh

    @property
    def bcu(self):
        if self._bcu is None:
            facets = np.arange(len(self.mesh.facets), dtype=np.int64)
            bc = BoundaryCondition(lambda x: self.exact_velocity(self._t_bc)(x))
            bc.initTopological(self.mesh.dim - 1, facets)
            self._bcu = [bc]
        return self._bcu

    @property
    def bcp(self):
        if self._bcp is None:
            facets = np.arange(len(self.mesh.facets), dtype=np.int64)
            bc = BoundaryCondition(lambda x: self.exact_pressure(self._t_bc)(x))
            bc.initTopological(self.mesh.dim - 1, facets)
            self._bcp = [bc]
        return self._bcp

    def initial_velocity(self, x):
        return self.exact_velocity(0)(x)

    def solve(self, output_folder, afterStepCallback=None):
        def update_boundary_conditions(t):
            self._t_bc = t
            if afterStepCallback:
                afterStepCallback(t)

        return super().solve(output_folder, update_boundary_conditions)

    def exact_velocity(self, t):
        def velocity(x):
            xx, yy, zz = x[0], x[1], x[2]
            a = np.pi / 4
            d = np.pi / 2
            decay = np.exp(-(d ** 2) * t)
            return np.vstack(
                (
                    -a * (np.exp(a * xx) * np.sin(a * yy + d * zz)
                          + np.exp(a * zz) * np.cos(a * xx + d * yy)) * decay,
                    -a * (np.exp(a * yy) * np.sin(a * zz + d * xx)
                          + np.exp(a * xx) * np.cos(a * yy + d * zz)) * decay,
                    -a * (np.exp(a * zz) * np.sin(a * xx + d * yy)
                          + np.exp(a * yy) * np.cos(a * zz + d * xx)) * decay,
                )
            )

        return velocity

    def exact_pressure(self, t):
        def pressure(x):
            xx, yy, zz = x[0], x[1], x[2]
            a = np.pi / 4
            d = np.pi / 2
            return (
                -0.5 * a * a
                * (
                    np.exp(2 * a * xx) + np.exp(2 * a * yy)
                    + np.exp(2 * a * zz)
                    + 2 * np.sin(a * xx + d * yy)
                    * np.cos(a * zz + d * xx) * np.exp(a * (yy + zz))
                    + 2 * np.sin(a * yy + d * zz)
                    * np.cos(a * xx + d * yy) * np.exp(a * (zz + xx))
                    + 2 * np.sin(a * zz + d * xx)
                    * np.cos(a * yy + d * zz) * np.exp(a * (xx + yy))
                )
                * np.exp(-2 * d * d * t)
            )

        return pressure
