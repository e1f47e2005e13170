"""ASPIN-flavoured stabilized solver.

The reference variant (/root/reference/src/solvers/stabilized_schur_aspin.py)
is identical to stabilized_schur except `snes.setType("aspin")` (:196) —
Additive Schwarz Preconditioned Inexact Newton, a parallel-scalability
device that nonlinearly preconditions Newton with per-subdomain solves.

In the TPU build the globalization role is filled by the line-searched
Newton with an element-block preconditioned FGMRES, which is already a
single-program whole-mesh method; a nonlinear-Schwarz acceleration over
shard_map partitions is the planned analogue once dof-partitioned halos
land. Until then this solver intentionally shares the base implementation
(same form, same kwargs) so reference invocations keep working.
"""

from __future__ import annotations

from .stabilized_schur import Solver as BaseSolver


class Solver(BaseSolver):
    pass
