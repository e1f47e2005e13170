"""Sigma-form solver: strong velocity inlet + damped resistance outlet +
backflow stabilization.

Rebuild of
/root/reference/src/solvers/stabilized_schur_velocity_vascular_backflow.py:
Laplacian (sigma) momentum form, strong Dirichlet parabolic inlet (scenario
supplies the profile sized by the required v_max), and the outlet traction
sigma·n = -p_c n - rho theta (u·n)_- u: weak pressure `0.5 p_c (v·n)`
(:192), viscous traction correction `-(2 mu eps(u_mid) n)·v` (:193), and
backflow stabilization (:198-206); p_c = R |Q| with Q from u_prev, damped
fixed point `p_c <- alpha p_new + (1-alpha) p_old` between steps.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..forms.facet_terms import backflow, viscous_traction, weak_pressure
from .stabilized_schur import Solver as BaseSolver


class Solver(BaseSolver):
    BOUNDARY_CORRECTION = False

    def __init__(
        self,
        *args,
        v_max=None,
        R_resistance=None,
        beta_backflow: float = 0.2,
        alpha_damping: float = 0.75,
        **kwargs,
    ):
        if v_max is None:
            raise ValueError(
                "v_max is required for "
                "stabilized_schur_velocity_vascular_backflow. "
                "Pass it via CLI: --v_max <value>"
            )
        if R_resistance is None:
            raise ValueError(
                "R_resistance is required for "
                "stabilized_schur_velocity_vascular_backflow. "
                "Pass it via CLI: --R_resistance <value>"
            )
        self.v_max = float(v_max)
        self.R_resistance = float(R_resistance)
        self.beta_backflow = float(beta_backflow)
        self.alpha_damping = float(alpha_damping)
        self.p_c = 0.0
        super().__init__(*args, **kwargs)
        print(
            f"[Solver] p_grade={self.V.degree}, v_max={self.v_max:.4f}, "
            f"R_resistance={self.R_resistance:.4e}, "
            f"beta_backflow={self.beta_backflow:.2f}, "
            f"alpha_damping={self.alpha_damping:.2f}",
            flush=True,
        )

    def _setup_boundary_terms(self, facet_tags, tags) -> None:
        if tags is None or tags.get("outlet") is None:
            raise ValueError(
                "stabilized_schur_velocity_vascular_backflow needs an "
                "'outlet' facet tag"
            )
        outlet = self.mesh.tagged_facets(tags["outlet"])
        self.form.add_facet_term(
            "resistance_out", outlet, weak_pressure("p_c", scale=0.5)
        )
        self.form.add_facet_term("viscous_out", outlet, viscous_traction())
        self.form.add_facet_term("backflow_out", outlet, backflow())
        Q0 = float(self.form.facet_flux(self.u_prev, "resistance_out"))
        self.p_c = self.R_resistance * abs(Q0)

    def extra_params(self):
        dt = self.dtype
        return {
            "p_c": jnp.asarray(self.p_c, dt),
            "beta_backflow": jnp.asarray(self.beta_backflow, dt),
        }

    def _post_step(self) -> None:
        Q = float(self.form.facet_flux(self.u_prev, "resistance_out"))
        p_new = self.R_resistance * abs(Q)
        self.p_c = (
            self.alpha_damping * p_new
            + (1 - self.alpha_damping) * self.p_c
        )
        print(
            f"  Resistance BC: Q={Q:.6e}, p_new={p_new:.4f}, "
            f"p_damped={self.p_c:.4f} (alpha={self.alpha_damping:.2f})"
        )
