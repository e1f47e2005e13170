"""Curl-curl solver with Dirichlet velocity inlet + CBC outlet.

Rebuild of /root/reference/src/solvers/stabilized_schur_vascularbc_cbc.py:
rotational form; the inlet velocity is a strong Dirichlet parabolic
profile supplied by the scenario (which requires v_max); the outlet stress
is replaced by the convective boundary condition
sigma·n = 1/2 (u·n) u (Simon & Notsu 2021), giving the residual term
`- 1/2 (u_prev·n)(u_mid·v) ds_out` (:185).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..forms.navier_stokes import StabilizedNSFormCurlCurl
from ..forms.facet_terms import cbc
from .stabilized_schur import Solver as BaseSolver


class Solver(BaseSolver):
    BOUNDARY_CORRECTION = False

    def __init__(self, *args, v_max=None, **kwargs):
        if v_max is None:
            raise ValueError(
                "v_max is required for stabilized_schur_vascularbc_cbc. "
                "Pass it via CLI: --v_max <value>"
            )
        self.v_max = float(v_max)
        super().__init__(*args, **kwargs)

    def _make_form(self, quad_degree):
        return StabilizedNSFormCurlCurl(
            self.V, self.Q, quad_degree=quad_degree,
            boundary_correction=False,
        )

    def _setup_boundary_terms(self, facet_tags, tags) -> None:
        if tags is None or tags.get("outlet") is None:
            raise ValueError(
                "stabilized_schur_vascularbc_cbc needs an 'outlet' tag"
            )
        outlet = self.mesh.tagged_facets(tags["outlet"])
        self.form.add_facet_term("cbc_out", outlet, cbc())
