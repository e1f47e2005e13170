"""Curl-curl weak-pressure solver with LSC preconditioning.

Rebuild of /root/reference/src/solvers/stabilized_lsc_pressurebc.py:
the stabilized_schur_pressurebc rotational form + weak pressure + Nitsche
with the LSC Schur preconditioner (header :1-2).

Round-3: the native LSC is delivered (cfdtpu/la/lsc.py, a
stabilized scaled-LSC commutator preconditioning fixed GMRES sweeps on
the SELFP Schur action — the round-2 stall was a sign error plus the
missing PSPG stabilization term); these solvers now default to
pc_type="lsc" per the reference semantics. pc_type="schur" remains
available as an override.
"""

from __future__ import annotations

from .stabilized_schur_pressurebc import Solver as PressureBCSolver


class Solver(PressureBCSolver):
    def __init__(self, *args, snes_rtol=None, pc_type="lsc", **kwargs):
        super().__init__(
            *args,
            snes_rtol=1e-4 if snes_rtol is None else snes_rtol,
            pc_type=pc_type,
            **kwargs,
        )
