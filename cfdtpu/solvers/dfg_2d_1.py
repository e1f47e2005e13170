"""Steady DFG 2D-1 benchmark solver with per-step drag/lift.

Rebuild of /root/reference/src/solvers/dfg_2d_1.py: sigma-form stabilized
momentum (Dirichlet parabolic inlet from the scenario, U_max = 0.3,
U_mean = 0.2, L = 0.1, rho = 1 — header :3), do-nothing outlet with
symmetric viscous traction correction `-(2 mu eps(u_mid) n)·v ds_out`
(:144-145) plus backflow stabilization (:147-151), tight Newton tolerances
rtol=1e-10 / atol=1e-12 / stol=1e-12 / max_it=50 (:188), and per-step
traction-based drag/lift coefficients c_D = 500 F_x, c_L = 500 F_y
(:166-182, :238-246), printed each step.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..forms.facet_terms import backflow, viscous_traction
from .stabilized_schur import Solver as BaseSolver


class Solver(BaseSolver):
    BOUNDARY_CORRECTION = False

    def __init__(
        self,
        *args,
        beta_backflow: float = 0.2,
        snes_rtol=None,
        snes_atol=None,
        snes_stol=None,
        snes_max_it=50,
        **kwargs,
    ):
        self.beta_backflow = float(beta_backflow)
        super().__init__(
            *args,
            snes_rtol=1e-10 if snes_rtol is None else snes_rtol,
            snes_atol=1e-12 if snes_atol is None else snes_atol,
            snes_stol=1e-12 if snes_stol is None else snes_stol,
            snes_max_it=snes_max_it,
            **kwargs,
        )
        self.cd = self.cl = float("nan")

    def _setup_boundary_terms(self, facet_tags, tags) -> None:
        if tags is None or tags.get("obstacle") is None:
            raise ValueError(
                "The 'obstacle' tag is required in DFG solver for "
                "drag/lift calculation."
            )
        outlet = self.mesh.tagged_facets(tags["outlet"])
        self.form.add_facet_term("viscous_out", outlet, viscous_traction())
        self.form.add_facet_term("backflow_out", outlet, backflow())
        from ..postprocess.forces import BoundaryForce

        self._force = BoundaryForce(
            self.V, self.Q, self.mesh.tagged_facets(tags["obstacle"])
        )

    def extra_params(self):
        return {
            "beta_backflow": jnp.asarray(self.beta_backflow, self.dtype),
        }

    def _post_step(self) -> None:
        fd, fl = self._force.traction_force(
            self.u_sol, self.p_sol, self.mu
        )
        fd, fl = float(fd), float(fl)
        self.cd, self.cl = 500.0 * fd, 500.0 * fl
        print(
            f"    DFG Metrics: Fd={fd:.6e}, Fl={fl:.6e} | "
            f"Cd={self.cd:.6f}, Cl={self.cl:.6f}"
        )
        super()._post_step()
