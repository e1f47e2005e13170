"""Dynamic experiment scenario class.

Rebuild of /root/reference/src/experiments/scenario_factory.py: builds a
Scenario subclass closed over (mesh_path, experiment params) with the
bc_type matrix — inlet in {velocity_parabolic, velocity_constant,
pressure}, outlet in {pressure, none, velocity_zero} (:11-22) — the
hyperemia q_in/q_in_hyper switch and parabolic v_max = 2 Q / (pi r^2)
(:25-202). Experiment meshes use inlet=1 / outlet=2 / wall=3 tags
(src/geom/stenosis/stenosis.py:12-15).

Meshes are read from .msh (native reader) or the .npz the native 2D
meshing stage writes.
"""

from __future__ import annotations

import os

import numpy as np

from ..mesh import Mesh
from ..scenarios.base import Scenario
from ..spaces import BoundaryCondition

INLET_TAG = 1
OUTLET_TAG = 2
WALL_TAG = 3


def _parse_bc_type(bc_type_raw) -> tuple[str, str]:
    if not isinstance(bc_type_raw, dict):
        return "velocity_parabolic", "pressure"
    return (
        bc_type_raw.get("inlet", "velocity_parabolic"),
        bc_type_raw.get("outlet", "pressure"),
    )


def load_experiment_mesh(mesh_path) -> Mesh:
    mesh_path = str(mesh_path)
    if mesh_path.endswith(".npz"):
        data = np.load(mesh_path, allow_pickle=True)
        return Mesh(
            points=data["points"],
            cells=data["cells"],
            cell_type=str(data["cell_type"]),
            facets=data["facets"],
            facet_cells=data["facet_cells"],
            facet_local_index=data["facet_local_index"],
            facet_tags=data["facet_tags"],
            dtype=data["points"].dtype,
        )
    from ..mesh.msh import read_msh

    return read_msh(mesh_path)


def create_experiment_scenario_class(mesh_path, experiment_params,
                                     base_params):
    class LADExperimentScenario(Scenario):
        inlet_marker = INLET_TAG
        outlet_marker = OUTLET_TAG
        wall_marker = WALL_TAG

        def __init__(
            self,
            solver_name,
            T,
            dt,
            rho=1.06e-3,
            mu=3.5e-3,
            f=None,
            **kwargs,
        ):
            self._mesh_path = mesh_path
            self.experiment_params = experiment_params
            self.base_params = base_params
            self._mesh = load_experiment_mesh(mesh_path)
            self._bcu = None
            self._bcp = None
            if f is None:
                f = [0.0] * self._mesh.gdim
            kwargs.pop("bc_type", None)  # consumed here, not by solvers
            super().__init__(
                solver_name=solver_name,
                scenario_name="LAD_Experiment",
                rho=rho,
                mu=mu,
                dt=dt,
                T=T,
                f=f,
                **kwargs,
            )
            self.setup()

        @property
        def mesh(self):
            return self._mesh

        def _bc_types(self):
            raw = self.experiment_params.get(
                "bc_type", self.base_params.get("bc_type", {})
            )
            return _parse_bc_type(raw)

        def _inlet_vmax(self):
            is_hyper = self.experiment_params.get(
                "hyperemia", self.base_params.get("hyperemia", False)
            )
            q_val = (
                self.base_params["q_in_hyper"]
                if is_hyper
                else self.base_params["q_in"]
            )
            r_in = self.base_params["radius_in"]
            area = np.pi * r_in ** 2
            return 2.0 * q_val / area, r_in  # Poiseuille v_max, radius

        @property
        def bcu(self):
            if self._bcu is not None:
                return self._bcu
            bc_inlet, bc_outlet = self._bc_types()
            gdim = self.mesh.gdim
            fdim = self.mesh.dim - 1

            bcs = []
            walls = BoundaryCondition(np.zeros(gdim))
            walls.initTopological(
                fdim, self.mesh.tagged_facets(self.wall_marker)
            )
            bcs.append(walls)

            inlet_facets = self.mesh.tagged_facets(self.inlet_marker)
            if bc_inlet in ("velocity_parabolic", "default"):
                v_max, r_in = self._inlet_vmax()
                center = self.mesh.midpoints_of_facets(
                    inlet_facets
                ).mean(axis=0)

                def parabolic(x, _v=v_max, _r=r_in, _c=center):
                    if x.shape[0] == 3:
                        r_sq = (x[1] - _c[1]) ** 2 + (x[2] - _c[2]) ** 2
                    else:
                        r_sq = (x[1] - _c[1]) ** 2
                    val = np.maximum(_v * (1.0 - r_sq / _r ** 2), 0.0)
                    rest = [np.zeros_like(val)] * (x.shape[0] - 1)
                    return np.stack([val] + rest)

                bc_in = BoundaryCondition(parabolic)
                bc_in.initTopological(fdim, inlet_facets)
                bcs.append(bc_in)
            elif bc_inlet == "velocity_constant":
                v_max, r_in = self._inlet_vmax()
                v_avg = v_max / 2.0

                def plug(x, _v=v_avg):
                    rest = [np.zeros_like(x[0])] * (x.shape[0] - 1)
                    return np.stack([np.full_like(x[0], _v)] + rest)

                bc_in = BoundaryCondition(plug)
                bc_in.initTopological(fdim, inlet_facets)
                bcs.append(bc_in)
            elif bc_inlet == "pressure":
                pass  # weak/Dirichlet pressure drives the inlet

            if bc_outlet == "velocity_zero":
                bc_out = BoundaryCondition(np.zeros(gdim))
                bc_out.initTopological(
                    fdim, self.mesh.tagged_facets(self.outlet_marker)
                )
                bcs.append(bc_out)

            self._bcu = bcs
            return bcs

        @property
        def bcp(self):
            if self._bcp is not None:
                return self._bcp
            bc_inlet, bc_outlet = self._bc_types()
            fdim = self.mesh.dim - 1
            bcs = []
            if bc_outlet in ("pressure", "default"):
                p_val = float(self.base_params.get("p_terminal", 0.0))
                bc_out = BoundaryCondition(p_val)
                bc_out.initTopological(
                    fdim, self.mesh.tagged_facets(self.outlet_marker)
                )
                bcs.append(bc_out)
            if bc_inlet == "pressure":
                p_in = float(
                    self.experiment_params.get(
                        "p_inlet",
                        self.base_params.get("p_inlet", 13332.2),
                    )
                )
                bc_in = BoundaryCondition(p_in)
                bc_in.initTopological(
                    fdim, self.mesh.tagged_facets(self.inlet_marker)
                )
                bcs.append(bc_in)
            self._bcp = bcs
            return bcs

        def initial_velocity(self, x):
            return np.zeros((self.mesh.gdim, x.shape[1]))

    return LADExperimentScenario
