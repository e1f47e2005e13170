"""vascularbc with the outlet pressure imposed as a strong Dirichlet BC.

Rebuild of /root/reference/src/solvers/stabilized_schur_vascularbc_strong.py:
curl-curl form, weak pressure + Nitsche at the INLET only (:209-228);
outlet pressure is a strong Dirichlet condition on Q dofs (:229-253),
initialized to initial_ffr * p_inlet / 2 (:83, mirroring the reference's
value verbatim) and updated by the fixed point p = R |Q| between steps.
"""

from __future__ import annotations

import numpy as np

from ..forms.facet_terms import nitsche_tangential_curl, weak_pressure
from ..spaces import BoundaryCondition
from .stabilized_schur_vascularbc import Solver as VascularBCSolver


class Solver(VascularBCSolver):
    OUTLET_NITSCHE = False

    def _setup_boundary_terms(self, facet_tags, tags) -> None:
        self._require_tags(tags, "inlet", "outlet")
        inlet = self.mesh.tagged_facets(tags["inlet"])
        outlet = self.mesh.tagged_facets(tags["outlet"])
        self.form.add_facet_term(
            "weak_pressure_in", inlet, weak_pressure("p_in_w")
        )
        self.form.add_facet_term(
            "nitsche_in", inlet, nitsche_tangential_curl("beta_nitsche")
        )
        # a zero-valued weak term is NOT added at the outlet; instead the
        # flux measurement block (for Q) and the strong p BC:
        self.form.add_facet_term(
            "outlet_flux", outlet, _zero_term
        )
        self._outlet_facets = outlet
        self._p_outlet_strong = self.p_outlet_w

    def setup(self, bcu, bcp, facet_tags=None, tags=None) -> None:
        # append the dynamic outlet pressure Dirichlet BC
        self._setup_boundary_terms_called = True
        bc_out = BoundaryCondition(lambda x: np.full(
            x.shape[1], self._p_outlet_strong
        ))
        outlet = self.mesh.tagged_facets(tags["outlet"]) if tags else None
        bc_out.initTopological(self.mesh.dim - 1, outlet)
        super().setup(bcu, list(bcp) + [bc_out], facet_tags, tags)

    def outlet_flux(self) -> float:
        return float(self.form.facet_flux(self.u_sol, "outlet_flux"))

    def _post_step(self) -> None:
        Q = self.outlet_flux()
        p_outlet_phys = self.R_resistance * abs(Q)
        self._p_outlet_strong = p_outlet_phys / 2
        print(f"  Resistance BC (strong): Q={Q:.6e}, "
              f"p_outlet={p_outlet_phys:.4f}")

    def extra_params(self):
        prm = super().extra_params()
        # no outlet weak term; p_out_w unused but harmless
        return prm


def _zero_term(u_e, p_e, aux_e, coords_e, tabs, prm):
    import jax.numpy as jnp

    return jnp.zeros(
        (tabs["phi_u"].shape[1], tabs["normal"].shape[-1]),
        tabs["normal"].dtype,
    )
