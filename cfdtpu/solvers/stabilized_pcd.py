"""Stabilized solver with PCD (pressure convection-diffusion) Schur PC.

Rebuild of /root/reference/src/solvers/stabilized_pcd.py: the same CN
stabilized form, Schur-upper fieldsplit with the PCD preconditioner
S^{-1} ~ Mp^{-1} Fp Ap^{-1} (the reference delegates to
fenicsx-pctools' WrappedPC/PCDPC_vY, :206-278; here the operators are
native — see cfdtpu/la/pcd.py). PCDPC_vY applies pressure Dirichlet
conditions on the OUTLET dofs of Ap (bcs_pcd in the appctx, :217-224);
when the scenario provides an outlet tag, the same masking is applied.

Round-3: the native PCD is delivered (cfdtpu/la/pcd.py — the Fp
reaction term fixed the near-Stokes mismodel, AMG on the assembled Ap
made it h-robust, and the formula preconditions fixed GMRES sweeps on
the SELFP Schur action); these solvers now default to pc_type="pcd"
per the reference semantics. pc_type="schur" remains an override.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .stabilized_schur import Solver as BaseSolver


class Solver(BaseSolver):
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
