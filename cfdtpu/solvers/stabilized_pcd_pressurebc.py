"""Curl-curl weak-pressure solver with PCD preconditioning.

Rebuild of /root/reference/src/solvers/stabilized_pcd_pressurebc.py:
the stabilized_schur_pressurebc rotational form + weak pressure + Nitsche
with the native PCD Schur preconditioner (header :1-2).

Round-3: the native PCD is delivered (cfdtpu/la/pcd.py — the Fp
reaction term fixed the near-Stokes mismodel, AMG on the assembled Ap
made it h-robust, and the formula preconditions fixed GMRES sweeps on
the SELFP Schur action); these solvers now default to pc_type="pcd"
per the reference semantics. pc_type="schur" remains an override.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .stabilized_schur_pressurebc import Solver as PressureBCSolver


class Solver(PressureBCSolver):
    def __init__(self, *args, pc_type="pcd", **kwargs):
        super().__init__(*args, pc_type=pc_type, **kwargs)

    def _setup_boundary_terms(self, facet_tags, tags) -> None:
        super()._setup_boundary_terms(facet_tags, tags)
        outlet = self.mesh.tagged_facets(tags["outlet"])
        if len(outlet):
            dofs = self.Q.facet_closure_dofs(outlet)
            mask = np.zeros(self.Q.num_dofs, dtype=bool)
            mask[dofs] = True
            self._pcd_bc_mask = jnp.asarray(mask)
