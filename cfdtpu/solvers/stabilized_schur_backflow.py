"""Stabilized solver with do-nothing outlet + backflow stabilization.

Rebuild of /root/reference/src/solvers/stabilized_schur_backflow.py:
strong Dirichlet parabolic inlet (imposed by the scenario, sized by the
required v_max kwarg), zero-traction (do-nothing) outlet — the natural
boundary correction of the base solver is NOT imposed (:107) — plus the
Moghadam et al. 2011 Eq. 10 backflow stabilization on the tagged outlet
(:159-176): `- beta rho (u_prev·n)_- (u_mid·v) ds_out`.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..forms.facet_terms import backflow
from .stabilized_schur import Solver as BaseSolver


class Solver(BaseSolver):
    BOUNDARY_CORRECTION = False

    def __init__(self, *args, v_max=None, beta_backflow: float = 0.2,
                 **kwargs):
        if v_max is None:
            raise ValueError(
                "v_max is required for stabilized_schur_backflow. "
                "Pass it via CLI: --v_max <value>"
            )
        self.v_max = float(v_max)
        self.beta_backflow = float(beta_backflow)
        super().__init__(*args, **kwargs)
        print(
            f"[Solver] p_grade={self.V.degree}, v_max={self.v_max:.4f}, "
            f"beta_backflow={self.beta_backflow:.2f}",
            flush=True,
        )

    def _setup_boundary_terms(self, facet_tags, tags) -> None:
        if tags is None or tags.get("outlet") is None:
            raise ValueError(
                "stabilized_schur_backflow needs an 'outlet' facet tag"
            )
        outlet = self.mesh.tagged_facets(tags["outlet"])
        self.form.add_facet_term("backflow_out", outlet, backflow())

    def extra_params(self):
        return {
            "beta_backflow": jnp.asarray(self.beta_backflow, self.dtype),
        }
