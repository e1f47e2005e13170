"""Stabilized solver with LSC (Least-Squares Commutator) preconditioning.

Rebuild of /root/reference/src/solvers/stabilized_lsc.py: the same
Crank-Nicolson stabilized form as stabilized_schur, with the Schur
complement preconditioned by LSC instead of SELFP (:220-266 — Schur LOWER,
`fieldsplit_p_pc_type=lsc`, MUMPS LU inner solves) and a relaxed Newton
tolerance snes_rtol = 1e-4 with Eisenstat-Walker-style inexactness
(:251-266). Here the relaxed outer tolerance is kept; the inner sweeps are
fixed-iteration (flexible-outer-safe).

Round-3: the native LSC is delivered (cfdtpu/la/lsc.py, a
stabilized scaled-LSC commutator preconditioning fixed GMRES sweeps on
the SELFP Schur action — the round-2 stall was a sign error plus the
missing PSPG stabilization term); these solvers now default to
pc_type="lsc" per the reference semantics. pc_type="schur" remains
available as an override.
"""

from __future__ import annotations

from .stabilized_schur import Solver as BaseSolver


class Solver(BaseSolver):
    def __init__(self, *args, snes_rtol=None, pc_type="lsc",
                 snes_ksp_ew=True, **kwargs):
        super().__init__(
            *args,
            snes_rtol=1e-4 if snes_rtol is None else snes_rtol,
            pc_type=pc_type,
            snes_ksp_ew=snes_ksp_ew,
            **kwargs,
        )
