"""Weak-pressure inlet + Nitsche tangential + resistance outlet + backflow.

Rebuild of /root/reference/src/solvers/stabilized_schur_pressure_backflow.py:

- Inlet: weak pressure traction `p_inlet (v·n)` (:193) + symmetric Nitsche
  enforcement of zero tangential velocity with penalty `beta_nitsche mu/h`
  (:195-201).
- Outlet: resistance pressure `0.5 p_c (v·n)` (:208) with
  `p_c = R_resistance |Q|`, Q the outlet flux of u_prev, updated by a
  damped fixed point between steps:
  `p_c <- alpha p_new + (1-alpha) p_old` (:387-396); plus the viscous
  traction correction `-(2 mu eps(u_mid) n)·v` (:209) and the backflow
  stabilization (:213-217).
- Only wall no-slip is strong (:231-233); the sigma-form momentum is used
  (Laplacian form), no global natural correction.

p_c enters the params dict, so the per-step fixed-point update never
recompiles.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..forms.facet_terms import (
    backflow,
    nitsche_tangential,
    viscous_traction,
    weak_pressure,
)
from .stabilized_schur import Solver as BaseSolver


class Solver(BaseSolver):
    BOUNDARY_CORRECTION = False

    def __init__(
        self,
        *args,
        p_inlet=None,
        beta_nitsche: float = 100.0,
        beta_backflow: float = 0.2,
        R_resistance=None,
        alpha_damping: float = 0.75,
        **kwargs,
    ):
        if p_inlet is None:
            raise ValueError(
                "p_inlet is required for stabilized_schur_pressure_backflow."
                " Pass it via CLI: --p_inlet <value> (physical units)"
            )
        if R_resistance is None:
            raise ValueError(
                "R_resistance is required for "
                "stabilized_schur_pressure_backflow. "
                "Pass it via CLI: --R_resistance <value>"
            )
        self.p_inlet = float(p_inlet)
        self.beta_nitsche = float(beta_nitsche)
        self.beta_backflow = float(beta_backflow)
        self.R_resistance = float(R_resistance)
        self.alpha_damping = float(alpha_damping)
        self.p_c = 0.0
        super().__init__(*args, **kwargs)
        print(
            f"[Solver] p_grade={self.V.degree}, p_inlet={self.p_inlet:.4f}, "
            f"beta_nitsche={self.beta_nitsche:.2f}, "
            f"beta_backflow={self.beta_backflow:.2f}, "
            f"R_resistance={self.R_resistance:.4e}, "
            f"alpha_damping={self.alpha_damping:.2f}",
            flush=True,
        )

    def _setup_boundary_terms(self, facet_tags, tags) -> None:
        if tags is None or tags.get("inlet") is None or (
            tags.get("outlet") is None
        ):
            raise ValueError(
                "stabilized_schur_pressure_backflow needs 'inlet' and "
                "'outlet' facet tags"
            )
        inlet = self.mesh.tagged_facets(tags["inlet"])
        outlet = self.mesh.tagged_facets(tags["outlet"])

        self.form.add_facet_term(
            "weak_pressure_in", inlet, weak_pressure("p_inlet")
        )
        self.form.add_facet_term(
            "nitsche_in", inlet, nitsche_tangential("beta_nitsche")
        )
        self.form.add_facet_term(
            "resistance_out", outlet, weak_pressure("p_c", scale=0.5)
        )
        self.form.add_facet_term(
            "viscous_out", outlet, viscous_traction()
        )
        self.form.add_facet_term("backflow_out", outlet, backflow())

        # initialize p_c = R |Q(u_prev)| (reference :203-207)
        Q0 = float(self.form.facet_flux(self.u_prev, "resistance_out"))
        self.p_c = self.R_resistance * abs(Q0)

    def extra_params(self):
        dt = self.dtype
        return {
            "p_inlet": jnp.asarray(self.p_inlet, dt),
            "p_c": jnp.asarray(self.p_c, dt),
            "beta_nitsche": jnp.asarray(self.beta_nitsche, dt),
            "beta_backflow": jnp.asarray(self.beta_backflow, dt),
        }

    def _post_step(self) -> None:
        # damped fixed point p_c <- alpha R|Q| + (1-alpha) p_c, with Q
        # computed from u_prev (the state the reference evaluates its
        # _Q_form on at :383-392, before the scenario copies u_sol->u_prev)
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
        super()._post_step()
