"""Stabilized solver with Dirichlet BC ramping.

Rebuild of /root/reference/src/solvers/stabilized_schur_ramping.py
(:279-327): for the first RAMP_STEPS steps, all Dirichlet velocity values
are scaled by alpha = step/RAMP_STEPS before the solve (and the unscaled
values are restored afterwards — here the scaling is applied to the value
arrays fed into the jitted step, so nothing needs restoring).
"""

from __future__ import annotations

from .stabilized_schur import Solver as BaseSolver


class Solver(BaseSolver):
    RAMP_STEPS = 10

    def _bc_values(self):
        bc_u_vals, bc_p_vals = super()._bc_values()
        step = self.step_count + 1
        if step <= self.RAMP_STEPS:
            alpha = step / self.RAMP_STEPS
            bc_u_vals = bc_u_vals * alpha
            print(f"[ramping] step {step}: scaling Dirichlet u by {alpha:.2f}")
        return bc_u_vals, bc_p_vals
