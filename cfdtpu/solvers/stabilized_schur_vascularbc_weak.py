"""vascularbc minus the outlet Nitsche term.

Rebuild of /root/reference/src/solvers/stabilized_schur_vascularbc_weak.py:
curl-curl form, weak pressure + Nitsche at the inlet, weak resistance
pressure at the outlet WITHOUT Nitsche (header :1-4).
"""

from __future__ import annotations

from .stabilized_schur_vascularbc import Solver as VascularBCSolver


class Solver(VascularBCSolver):
    OUTLET_NITSCHE = False
