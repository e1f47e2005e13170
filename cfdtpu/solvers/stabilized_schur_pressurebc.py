"""Curl-curl (rotational) solver with weak pressure BCs + Nitsche.

Rebuild of /root/reference/src/solvers/stabilized_schur_pressurebc.py:
rotational viscous/convective form (see StabilizedNSFormCurlCurl), natural
(weak) pressure p_inlet/2 and p_outlet/2 on the tagged inlet/outlet
(:192-201 — the reference halves the prescribed values at construction,
:64-66), and curl-form symmetric Nitsche tangential enforcement u_T = 0 on
BOTH ends (:202-205). Only wall no-slip is strong.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..forms.navier_stokes import StabilizedNSFormCurlCurl
from ..forms.facet_terms import nitsche_tangential_curl, weak_pressure
from .stabilized_schur import Solver as BaseSolver


class Solver(BaseSolver):
    BOUNDARY_CORRECTION = False
    REQUIRED = ("p_inlet", "p_outlet")

    def __init__(
        self,
        *args,
        p_inlet=None,
        p_outlet=None,
        beta_nitsche: float = 100.0,
        **kwargs,
    ):
        for name, val in (("p_inlet", p_inlet), ("p_outlet", p_outlet)):
            if name in self.REQUIRED and val is None:
                raise ValueError(
                    f"{name} is required for this solver. "
                    f"Pass it via CLI: --{name} <value>"
                )
        # the weak-form constants carry the 1/2 factor, like the reference
        self.p_inlet_w = float(p_inlet) / 2 if p_inlet is not None else 0.0
        self.p_outlet_w = (
            float(p_outlet) / 2 if p_outlet is not None else 0.0
        )
        self.beta_nitsche = float(beta_nitsche)
        super().__init__(*args, **kwargs)
        print(
            f"[Solver] p_grade={self.V.degree}, "
            f"beta_nitsche={self.beta_nitsche}",
            flush=True,
        )

    def _make_form(self, quad_degree):
        return StabilizedNSFormCurlCurl(
            self.V, self.Q, quad_degree=quad_degree,
            boundary_correction=False,
        )

    def _require_tags(self, tags, *names):
        if tags is None or any(tags.get(n) is None for n in names):
            raise ValueError(
                f"{type(self).__module__} needs facet tags: {names}"
            )

    def _setup_boundary_terms(self, facet_tags, tags) -> None:
        self._require_tags(tags, "inlet", "outlet")
        inlet = self.mesh.tagged_facets(tags["inlet"])
        outlet = self.mesh.tagged_facets(tags["outlet"])
        self.form.add_facet_term(
            "weak_pressure_in", inlet, weak_pressure("p_in_w")
        )
        self.form.add_facet_term(
            "weak_pressure_out", outlet, weak_pressure("p_out_w")
        )
        self.form.add_facet_term(
            "nitsche_in", inlet, nitsche_tangential_curl("beta_nitsche")
        )
        self.form.add_facet_term(
            "nitsche_out", outlet, nitsche_tangential_curl("beta_nitsche")
        )

    def extra_params(self):
        dt = self.dtype
        return {
            "p_in_w": jnp.asarray(self.p_inlet_w, dt),
            "p_out_w": jnp.asarray(self.p_outlet_w, dt),
            "beta_nitsche": jnp.asarray(self.beta_nitsche, dt),
        }
