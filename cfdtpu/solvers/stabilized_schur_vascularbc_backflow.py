"""Curl-curl solver: weak pressure both ends (outlet from FFR), Nitsche
both ends, backflow stabilization at the outlet.

Rebuild of
/root/reference/src/solvers/stabilized_schur_vascularbc_backflow.py:
rotational form; weak pressure p_inlet/2 at the inlet and a FIXED
p_outlet = initial_ffr * p_inlet / 2 at the outlet (:86-88 — no fixed
point here), curl-form Nitsche u_T = 0 on both ends, plus the Moghadam
backflow stabilization `- beta rho (u_prev·n)_- (u_mid·v) ds_out`.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..forms.facet_terms import (
    backflow,
    nitsche_tangential_curl,
    weak_pressure,
)
from .stabilized_schur_pressurebc import Solver as PressureBCSolver


class Solver(PressureBCSolver):
    REQUIRED = ("p_inlet",)

    def __init__(
        self,
        *args,
        p_inlet=None,
        initial_ffr: float = 0.8,
        beta_backflow: float = 0.2,
        v_max=None,
        **kwargs,
    ):
        self.initial_ffr = float(initial_ffr)
        self.beta_backflow = float(beta_backflow)
        self.v_max = v_max
        p_outlet0 = self.initial_ffr * float(p_inlet)
        super().__init__(
            *args, p_inlet=p_inlet, p_outlet=p_outlet0, **kwargs
        )

    def _setup_boundary_terms(self, facet_tags, tags) -> None:
        super()._setup_boundary_terms(facet_tags, tags)
        outlet = self.mesh.tagged_facets(tags["outlet"])
        self.form.add_facet_term("backflow_out", outlet, backflow())

    def extra_params(self):
        prm = super().extra_params()
        prm["beta_backflow"] = jnp.asarray(self.beta_backflow, self.dtype)
        return prm
