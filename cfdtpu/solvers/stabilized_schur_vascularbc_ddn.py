"""Curl-curl solver with a directional do-nothing outlet.

Rebuild of /root/reference/src/solvers/stabilized_schur_vascularbc_ddn.py:
rotational form; outlet stress replaced by the directional do-nothing
condition sigma·n = 1/2 (u·n)_- u (Braack & Mucha 2014), i.e. the
standard do-nothing during outflow plus a reverse-flow penalty
`- 1/2 min(u_prev·n, 0)(u_mid·v) ds_out` (:185-188). The inlet is driven
by the scenario (Dirichlet velocity when v_max is given).
"""

from __future__ import annotations

from ..forms.navier_stokes import StabilizedNSFormCurlCurl
from ..forms.facet_terms import directional_do_nothing
from .stabilized_schur import Solver as BaseSolver


class Solver(BaseSolver):
    BOUNDARY_CORRECTION = False

    def __init__(self, *args, v_max=None, **kwargs):
        # v_max is consumed by the scenario's inlet profile; accepted here
        # for signature parity with the reference
        self.v_max = v_max
        super().__init__(*args, **kwargs)

    def _make_form(self, quad_degree):
        return StabilizedNSFormCurlCurl(
            self.V, self.Q, quad_degree=quad_degree,
            boundary_correction=False,
        )

    def _setup_boundary_terms(self, facet_tags, tags) -> None:
        if tags is None or tags.get("outlet") is None:
            raise ValueError(
                "stabilized_schur_vascularbc_ddn needs an 'outlet' tag"
            )
        outlet = self.mesh.tagged_facets(tags["outlet"])
        self.form.add_facet_term(
            "ddn_out", outlet, directional_do_nothing()
        )
