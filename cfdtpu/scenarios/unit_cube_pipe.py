"""3-D pressure-driven duct flow on a hexahedral box mesh.

Rebuild of /root/reference/src/scenarios/unit_cube_pipe.py: the 3-D
analogue of unit_square_pipe — a rectangular duct with Dirichlet pressure
at the x=0/x=L faces and no-slip side walls, hexahedral cells, blood
parameters in the mm-g-s system.
"""

from __future__ import annotations

import numpy as np

from ..mesh import create_box
from ..spaces import BoundaryCondition
from ..utils import resolve_dtype
from .base import Scenario

_L = 20.0
_H = 1.5
_NX = 80
_NY = 6
_NZ = 6


class UnitCubePipeSimulation(Scenario):
    inlet_marker = 1
    outlet_marker = 2
    wall_marker = 3

    def __init__(
        self,
        solver_name: str,
        dt: float,
        T: float,
        f=(0.0, 0.0, 0.0),
        *,
        rho: float = 1.06e-3,
        mu: float = 3.5e-3,
        p_inlet: float,
        p_outlet: float,
        nx: int = _NX,
        ny: int = _NY,
        nz: int = _NZ,
        early_stop_tolerance: float = 1e-5,
        dtype="auto",
        **solver_kwargs,
    ):
        self.p_inlet = float(p_inlet)
        self.p_outlet = float(p_outlet)
        self.nx, self.ny, self.nz = int(nx), int(ny), int(nz)
        self._dtype = resolve_dtype(dtype)
        self._mesh = None
        self._bcu = None
        self._bcp = None
        super().__init__(
            solver_name,
            "unit_cube_pipe",
            rho,
            mu,
            dt,
            T,
            list(f),
            early_stop_tolerance=early_stop_tolerance,
            p_inlet=self.p_inlet,
            p_outlet=self.p_outlet,
            **solver_kwargs,
        )
        self.setup()

    @property
    def mesh(self):
        if self._mesh is None:
            m = create_box(
                (0.0, 0.0, 0.0), (_L, _H, _H),
                (self.nx, self.ny, self.nz),
                cell_type="hexahedron", dtype=self._dtype,
            )
            m.mark_boundary_facets(
                lambda x: np.isclose(x[0], 0.0), self.inlet_marker
            )
            m.mark_boundary_facets(
                lambda x: np.isclose(x[0], _L), self.outlet_marker
            )
            m.mark_boundary_facets(
                lambda x: (
                    np.isclose(x[1], 0.0) | np.isclose(x[1], _H)
                    | np.isclose(x[2], 0.0) | np.isclose(x[2], _H)
                ),
                self.wall_marker,
            )
            self._mesh = m
        return self._mesh

    @property
    def bcu(self):
        if self._bcu is None:
            bc_walls = BoundaryCondition(np.zeros(3, dtype=self._dtype))
            bc_walls.initTopological(
                2, self.mesh.tagged_facets(self.wall_marker)
            )
            self._bcu = [bc_walls]
        return self._bcu

    @property
    def bcp(self):
        if self._bcp is None:
            bc_in = BoundaryCondition(float(self.p_inlet))
            bc_in.initTopological(
                2, self.mesh.tagged_facets(self.inlet_marker)
            )
            bc_out = BoundaryCondition(float(self.p_outlet))
            bc_out.initTopological(
                2, self.mesh.tagged_facets(self.outlet_marker)
            )
            self._bcp = [bc_in, bc_out]
        return self._bcp

    def initial_velocity(self, x):
        return np.zeros((3, x.shape[1]), dtype=self._dtype)
