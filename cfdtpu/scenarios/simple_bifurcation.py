"""Simple microvascular bifurcation: one inlet, two outlets.

Rebuild of /root/reference/src/scenarios/simple_bifurcation.py: the same
nondimensionalization as vascular_tree (rho_real = 1055, U_c = 0.01,
L_c from the mesh inlet radius; rho = 1, mu = 1/Re, pressures scaled by
p_c = rho_real U_c^2, :28-62). The reference builds the 3D geometry
inline with gmsh; without gmsh the mesh comes from a tagged .msh
(mesh_path). Dirichlet inlet velocity v_inlet; Dirichlet outlet pressures
p_outlet1/p_outlet2 (scaled) on outlet tags 2 and 4 when present, else
one shared outlet tag.
"""

from __future__ import annotations

import numpy as np

from ..mesh.msh import read_msh
from ..spaces import BoundaryCondition
from ..utils import resolve_dtype
from .base import Scenario


class SimpleBifurcationSimulation(Scenario):
    inlet_marker = 1
    outlet_marker = 2
    outlet2_marker = 4
    wall_marker = 3

    rho_real = 1055.0
    mu_real = 3.5e-3
    r_mesh_in = 0.003918604
    L_c = (100 / 0.003918604) / 1e6
    U_c = 0.01

    def __init__(
        self,
        solver_name,
        dt,
        T,
        f=(0, 0, 0),
        v_inlet=1.5,
        p_outlet1=0,
        p_outlet2=0,
        *,
        rho=None,
        mu=None,
        mesh_path=None,
        mesh_h=0.35,
        dtype="auto",
        **kwargs,
    ):
        self._mesh = None
        self._bcu = None
        self._bcp = None
        self.mesh_path = mesh_path
        self.mesh_h = float(mesh_h)
        self._dtype = resolve_dtype(dtype)

        Re = self.rho_real * self.U_c * self.L_c / self.mu_real
        p_c = self.rho_real * self.U_c ** 2
        self.v_inlet = float(v_inlet)
        self.p_outlet1_adim = float(p_outlet1) / p_c
        self.p_outlet2_adim = float(p_outlet2) / p_c
        print(
            f"MicrovasculatureSimulation (Simple Bifurcation): "
            f"Reynolds = {Re}"
        )
        super().__init__(
            solver_name, "simple_bifurcation", 1.0, 1.0 / Re, dt, T, f,
            **kwargs,
        )
        self.setup()

    @property
    def mesh(self):
        if self._mesh is None:
            if self.mesh_path:
                self._mesh = read_msh(self.mesh_path)
            else:
                # native implicit-union Y-bifurcation (the reference
                # reads a pre-built tagged simple_bifurcation.msh; this
                # build generates the geometry in-framework,
                # geom/implicit3d.py). Radii in r_mesh_in units.
                from ..geom.implicit3d import bifurcation_mesh

                r = self.r_mesh_in
                self._mesh = bifurcation_mesh(
                    r_in=r, r_out1=0.6 * r,
                    r_out2=self.r_mesh_out2 / self.r_mesh_in * r
                    if hasattr(self, "r_mesh_out2") else 0.35 * r,
                    length=8 * r, branch_length=7 * r,
                    h=self.mesh_h * r, dtype=self._dtype,
                )
        return self._mesh

    @property
    def bcu(self):
        if self._bcu is None:
            fdim = self.mesh.dim - 1
            walls = BoundaryCondition(
                np.zeros(self.mesh.gdim, dtype=self._dtype)
            )
            walls.initTopological(
                fdim, self.mesh.tagged_facets(self.wall_marker)
            )
            inlet_facets = self.mesh.tagged_facets(self.inlet_marker)
            center = self.mesh.midpoints_of_facets(inlet_facets).mean(
                axis=0
            )
            v_in, r_in = self.v_inlet, self.r_mesh_in

            def profile(x):
                rel = x.T - center
                r_sq = np.sum(rel[:, 1:] ** 2, axis=1) if x.shape[0] == 3 \
                    else rel[:, 1] ** 2
                mag = np.maximum(v_in * (1.0 - r_sq / r_in ** 2), 0.0)
                rest = [np.zeros_like(mag)] * (x.shape[0] - 1)
                return np.stack([mag] + rest)

            bc_in = BoundaryCondition(profile)
            bc_in.initTopological(fdim, inlet_facets)
            self._bcu = [walls, bc_in]
        return self._bcu

    @property
    def bcp(self):
        if self._bcp is None:
            fdim = self.mesh.dim - 1
            bcs = []
            out1 = self.mesh.tagged_facets(self.outlet_marker)
            if len(out1):
                bc1 = BoundaryCondition(self.p_outlet1_adim)
                bc1.initTopological(fdim, out1)
                bcs.append(bc1)
            out2 = self.mesh.tagged_facets(self.outlet2_marker)
            if len(out2):
                bc2 = BoundaryCondition(self.p_outlet2_adim)
                bc2.initTopological(fdim, out2)
                bcs.append(bc2)
            self._bcp = bcs
        return self._bcp

    def initial_velocity(self, x):
        return np.zeros((x.shape[0], x.shape[1]), dtype=self._dtype)
