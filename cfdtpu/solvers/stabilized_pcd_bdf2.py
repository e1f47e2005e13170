"""BDF2 + PCD preconditioning.

Rebuild of /root/reference/src/solvers/stabilized_pcd_bdf2.py: the
stabilized_schur_bdf2 scheme with the native PCD Schur preconditioner
(reference :71-73 adds the BDF constants to the PCD variant).

Round-3: the native PCD is delivered (cfdtpu/la/pcd.py — the Fp
reaction term fixed the near-Stokes mismodel, AMG on the assembled Ap
made it h-robust, and the formula preconditions fixed GMRES sweeps on
the SELFP Schur action); these solvers now default to pc_type="pcd"
per the reference semantics. pc_type="schur" remains an override.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .stabilized_schur_bdf2 import Solver as BDF2Solver


class Solver(BDF2Solver):
    def __init__(self, *args, pc_type="pcd", **kwargs):
        super().__init__(*args, pc_type=pc_type, **kwargs)

    def _setup_boundary_terms(self, facet_tags, tags) -> None:
        super()._setup_boundary_terms(facet_tags, tags)
        if tags is not None and tags.get("outlet") is not None:
            outlet = self.mesh.tagged_facets(tags["outlet"])
            if len(outlet):
                dofs = self.Q.facet_closure_dofs(outlet)
                mask = np.zeros(self.Q.num_dofs, dtype=bool)
                mask[dofs] = True
                self._pcd_bc_mask = jnp.asarray(mask)
