"""Stabilized solver with a Stokes initial guess.

Rebuild of /root/reference/src/solvers/stabilized_schur_stokes.py: when
the previous velocity is (near) zero at the first step, a stationary
Taylor-Hood Stokes problem is solved first and interpolated into the
P1/P1 spaces as the Newton initial guess (:177-208), falling back to the
zero guess if the Stokes solve fails (:203-208). Schur LOWER in the
reference (:259); the SELFP Schur PC is used here.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .stabilized_schur import Solver as BaseSolver


class Solver(BaseSolver):
    def setup(self, bcu, bcp, facet_tags=None, tags=None) -> None:
        self._stokes_bcu = list(bcu)
        super().setup(bcu, bcp, facet_tags=facet_tags, tags=tags)

    def _run_step(self, bc_u_vals, bc_p_vals):
        unorm = float(jnp.abs(self.u_prev).max())
        if self.step_count == 0 and unorm < 1e-12:
            try:
                from ..solvers_aux.stokes import solve_stokes

                u_s, p_s, Vs, Qs = solve_stokes(
                    self.mesh, self.mu, self._stokes_bcu, f=self.f
                )
                # interpolate Taylor-Hood -> P1/P1: the P1 dofs are the
                # mesh vertices = the leading block of the higher-order
                # entity-ordered dofmaps
                nvtx = self.mesh.num_points
                u0 = jnp.asarray(np.asarray(u_s)[:nvtx], self.dtype)
                p0 = jnp.asarray(np.asarray(p_s)[:nvtx], self.dtype)
                print("[stokes-init] Stokes initial guess applied")
                return self._step(
                    u0, p0, self._aux(), bc_u_vals, bc_p_vals,
                    self.params(),
                )
            except RuntimeError as e:
                print(f"[stokes-init] Stokes solve failed ({e}); "
                      f"falling back to zero initial guess")
        return super()._run_step(bc_u_vals, bc_p_vals)
