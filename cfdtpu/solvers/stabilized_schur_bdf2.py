"""Stabilized solver with BDF2 time integration.

Rebuild of /root/reference/src/solvers/stabilized_schur_bdf2.py: time term
rho (a0 u + a1 u_prev + a2 u_prev2)/dt with updatable coefficients — BDF1
(1, -1, 0) on the first step, BDF2 (1.5, -2, 0.5) afterwards (:300-309) —
and convection/stress fully implicit at u_sol (:86-91). The coefficients
live in the params dict, so switching schemes between steps never
recompiles (the analogue of the reference's updatable Constants :69-72).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..forms import StabilizedNSFormBDF2
from ..forms.facet_terms import implicit_velocity, natural_correction
from .stabilized_schur import Solver as BaseSolver


class Solver(BaseSolver):
    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.u_prev2 = jnp.zeros_like(self.u_prev)
        self._bdf = (1.0, -1.0, 0.0)

    def _make_form(self, quad_degree):
        form = StabilizedNSFormBDF2(
            self.V, self.Q, quad_degree=quad_degree,
            boundary_correction=False,
        )
        # boundary correction uses u_sol (fully implicit), matching
        # stabilized_schur_bdf2.py:90
        import numpy as np

        if len(self.mesh.facets):
            form.add_facet_term(
                "natural_correction",
                np.arange(len(self.mesh.facets), dtype=np.int32),
                natural_correction(vel=implicit_velocity),
            )
        return form

    def _aux(self):
        return (self.u_prev, self.u_prev2)

    def extra_params(self):
        a0, a1, a2 = self._bdf
        dt = self.dtype
        return {
            "bdf_a0": jnp.asarray(a0, dt),
            "bdf_a1": jnp.asarray(a1, dt),
            "bdf_a2": jnp.asarray(a2, dt),
            # BDF2 convection is fully implicit at u_sol, so the PCD
            # commutator mirrors it with theta = 1 (CN uses 1/2)
            "pcd_theta": jnp.asarray(1.0, dt),
        }

    def solveStep(self) -> None:
        # BDF1 for the first step, BDF2 thereafter (reference :300-309).
        # Also BDF1 for the first step after a resume from a checkpoint
        # that predates history saving (_resume_lost_history set by
        # Scenario.load_checkpoint): u_prev2 is zeros there, and full
        # BDF2 coefficients would inject 0.5*u_prev2/dt of spurious
        # transient; one BDF1 step re-seeds the history instead.
        bdf1 = self.step_count == 0 or getattr(
            self, "_resume_lost_history", False
        )
        self._bdf = (1.0, -1.0, 0.0) if bdf1 else (1.5, -2.0, 0.5)
        super().solveStep()
        self._resume_lost_history = False

    def _post_step(self) -> None:
        # u_prev (= u^n) becomes u^{n-1} for the next step; the Scenario
        # loop then copies u_sol -> u_prev (reference :325-327)
        self.u_prev2 = self.u_prev
        super()._post_step()
