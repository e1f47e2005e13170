"""Hand-rolled staggered (segregated) Newton solver.

Rebuild of /root/reference/src/solvers/stabilized_staggered.py: instead of
a monolithic Newton solve, each nonlinear iteration approximates
K^{-1} ~ ((1+alpha) diag K)^{-1} with alpha = 3 (:49-50) and solves

    pressure:  (C + G^T K~ G) dp = -Rp - G^T K~ Ru       (:220-249)
    velocity:  K du = -(Ru + G dp)                        (:251-276)

iterating until ||dx|| < 1e-8 or MAX_ITER = 20 (:283-306). The reference's
`solveStep(bcu, bcp)` signature diverges from SolverBase (legacy — not
callable from Scenario.solve, SURVEY.md 2.5); this rebuild keeps the
algorithm but exposes the standard solveStep() so the scenario loop can
drive it. The extra beta*K_tau velocity regularization of the reference
(:49) is folded into the Jacobi-preconditioned inner solves.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..la.gmres import gmres_fixed
from .stabilized_schur import Solver as BaseSolver

ALPHA = 3.0
MAX_ITER = 20
STAG_TOL = 1e-8


class Solver(BaseSolver):
    # This segregated loop runs on the form API (residual /
    # element_jacobians / apply_sub_block), which ShardedNSForm
    # implements — so n_shards distributes via cell sharding, not the
    # node-BSR halo step (whose PC machinery this solver never builds).
    HALO_DISTRIBUTION = False

    def _build_step(self) -> None:
        form = self.form
        n_u = self.V.num_dofs
        n_p = self.Q.num_dofs
        dim = self.mesh.gdim
        bc_dofs_u = jnp.asarray(self.bc_dofs_u)
        bc_dofs_p = jnp.asarray(self.bc_dofs_p)
        has_bc_u = len(self.bc_dofs_u) > 0
        has_bc_p = len(self.bc_dofs_p) > 0
        pin_pressure = self.pin_pressure

        bc_mask_np = np.zeros(n_u * dim + n_p, dtype=bool)
        for d0 in range(dim):
            bc_mask_np[self.bc_dofs_u.astype(np.int64) * dim + d0] = True
        bc_mask_np[n_u * dim + self.bc_dofs_p.astype(np.int64)] = True
        bc_mask_u = jnp.asarray(bc_mask_np[: n_u * dim])
        bc_mask_p = jnp.asarray(bc_mask_np[n_u * dim:])

        def ravel(u, p):
            return jnp.concatenate([u.reshape(-1), p])

        def unravel(x):
            return x[: n_u * dim].reshape(n_u, dim), x[n_u * dim:]

        self._ravel, self._unravel = ravel, unravel
        tol = STAG_TOL if self.dtype == np.float64 else 1e-5

        def step(u_guess, p_guess, aux, bc_u_vals, bc_p_vals, prm):
            def residual(u, p):
                ru, rp = form.residual(u, p, aux, prm)
                if has_bc_u:
                    ru = ru.at[bc_dofs_u].set(u[bc_dofs_u] - bc_u_vals)
                if has_bc_p:
                    rp = rp.at[bc_dofs_p].set(p[bc_dofs_p] - bc_p_vals)
                if pin_pressure:
                    rp = rp - jnp.mean(rp)
                return ru.reshape(-1), rp

            def body(state):
                u, p, dx_norm, it = state
                Ru, Rp = residual(u, p)
                A_cells, A_blocks = form.element_jacobians(u, p, aux, prm)
                d_full = form.jacobian_diagonal(A_cells, A_blocks)
                d_u = jnp.where(bc_mask_u, 1.0, d_full[: n_u * dim])
                K_tilde = 1.0 / ((1.0 + ALPHA) * d_u)

                def G(v_p):
                    y = form.apply_sub_block(A_cells, A_blocks, v_p, "up")
                    return jnp.where(bc_mask_u, 0.0, y)

                def Gt(v_u):
                    return form.apply_sub_block(
                        A_cells, A_blocks, v_u, "pu"
                    )

                def C(v_p):
                    return form.apply_sub_block(
                        A_cells, A_blocks, v_p, "pp"
                    )

                def K(v_u):
                    y = form.apply_sub_block(A_cells, A_blocks, v_u, "uu")
                    return jnp.where(bc_mask_u, v_u, y)

                # pressure update
                def Sp(v_p):
                    y = C(v_p) + Gt(K_tilde * G(v_p))
                    if has_bc_p:
                        y = jnp.where(bc_mask_p, v_p, y)
                    if pin_pressure:
                        y = y - jnp.mean(y)
                    return y

                rhs_p = -(Rp + Gt(K_tilde * Ru))
                if pin_pressure:
                    rhs_p = rhs_p - jnp.mean(rhs_p)
                d_p = jnp.where(
                    bc_mask_p, 1.0, d_full[n_u * dim:]
                )
                dp = gmres_fixed(
                    Sp, rhs_p, precond=lambda v: v / d_p, m=20
                )

                # velocity update
                rhs_u = -(Ru + G(dp))
                du = gmres_fixed(
                    K, rhs_u, precond=lambda v: v / d_u, m=20
                )

                u = u + du.reshape(n_u, dim)
                p = p + dp
                if pin_pressure:
                    p = p - jnp.mean(p)
                dx_norm = jnp.sqrt(
                    jnp.sum(du ** 2) + jnp.sum(dp ** 2)
                )
                return (u, p, dx_norm, it + 1)

            def cond(state):
                _, _, dx_norm, it = state
                return jnp.logical_and(dx_norm > tol, it < MAX_ITER)

            u, p, dx_norm, iters = jax.lax.while_loop(
                cond, body, (u_guess, p_guess, jnp.asarray(jnp.inf,
                             u_guess.dtype), 0)
            )
            Ru, Rp = residual(u, p)
            fnorm = jnp.sqrt(jnp.sum(Ru ** 2) + jnp.sum(Rp ** 2))
            stats = {
                "newton_iters": iters,
                "ksp_iters": iters * 40,
                "fnorm": fnorm,
                "f0norm": fnorm,
                "converged": jnp.logical_or(dx_norm <= tol,
                                            fnorm < 1e-6),
                "ls_failures": jnp.array(0, jnp.int32),
            }
            return u, p, Ru.reshape(n_u, dim), Rp, stats

        self._step_fn = step
        self._step = jax.jit(step)
