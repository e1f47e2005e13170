"""Steady DFG 2D-1 scenario (paired with the dfg_2d_1 solver).

Rebuild of /root/reference/src/scenarios/dfg_2d_1.py: the same channel +
cylinder geometry with parametric resolution (reference default
res = 0.005, :59-125), parabolic inlet U_max = 0.3, no pressure BC — the
outlet do-nothing + backflow handling and the per-step drag/lift
computation live in the dfg_2d_1 solver (:150-158).
"""

from __future__ import annotations

import numpy as np

from ..geom.dfg import generate_dfg_mesh
from ..spaces import BoundaryCondition
from ..utils import resolve_dtype
from .base import Scenario


class DFG2D1Steady(Scenario):
    fluid_marker = 1
    inlet_marker = 2
    outlet_marker = 3
    wall_marker = 4
    obstacle_marker = 5

    def __init__(
        self,
        solver_name,
        dt,
        T,
        f=(0, 0),
        *,
        rho=1,
        mu=1 / 1000,
        res=0.005,
        dtype="auto",
        **solver_kwargs,
    ):
        self._mesh = None
        self._bcu = None
        self._bcp = None
        self.res = float(res)
        self._dtype = resolve_dtype(dtype)
        super().__init__(
            solver_name, "dfg_2d_1", rho, mu, dt, T, f, **solver_kwargs
        )
        self.setup()

    @property
    def mesh(self):
        if self._mesh is None:
            # reference meshes uniformly at `res` with obstacle refinement;
            # map res onto the graded generator (res_min = res near the
            # obstacle growing to 3x away)
            self._mesh = generate_dfg_mesh(
                res_min=self.res,
                res_max=3 * self.res,
                dtype=self._dtype,
                inlet_marker=self.inlet_marker,
                outlet_marker=self.outlet_marker,
                wall_marker=self.wall_marker,
                obstacle_marker=self.obstacle_marker,
            )
        return self._mesh

    @property
    def bcu(self):
        if self._bcu is None:
            bcu_inflow = BoundaryCondition(self.inlet_velocity)
            bcu_inflow.initTopological(
                1, self.mesh.tagged_facets(self.inlet_marker)
            )
            bcu_walls = BoundaryCondition(np.zeros(2, dtype=self._dtype))
            bcu_walls.initTopological(
                1, self.mesh.tagged_facets(self.wall_marker)
            )
            bcu_obstacle = BoundaryCondition(np.zeros(2, dtype=self._dtype))
            bcu_obstacle.initTopological(
                1, self.mesh.tagged_facets(self.obstacle_marker)
            )
            self._bcu = [bcu_inflow, bcu_obstacle, bcu_walls]
        return self._bcu

    @property
    def bcp(self):
        if self._bcp is None:
            self._bcp = []  # outlet handled weakly by the dfg_2d_1 solver
        return self._bcp

    def initial_velocity(self, x):
        return np.zeros((2, x.shape[1]), dtype=self._dtype)

    @staticmethod
    def inlet_velocity(x):
        values = np.zeros((2, x.shape[1]))
        values[0] = 4 * 0.3 * x[1] * (0.41 - x[1]) / (0.41 ** 2)
        return values
