"""Solver-variant integration tests: BDF2, adaptive, ramping, backflow,
weak-pressure + Nitsche + resistance outlet, Taylor-Green 3D validation."""

import numpy as np
import jax.numpy as jnp
import pytest

from cfdtpu.mesh import create_rectangle
from cfdtpu.scenarios.base import Scenario
from cfdtpu.scenarios.lid_driven2D import LidDriven2DSimulation
from cfdtpu.spaces import BoundaryCondition


class ChannelScenario(Scenario):
    """Small triangulated channel with inlet/outlet/wall tags, for the
    hemodynamic BC solver variants."""

    inlet_marker = 1
    outlet_marker = 2
    wall_marker = 3

    def __init__(self, solver_name, dt, T, *, rho=1.0, mu=0.05,
                 inlet_velocity=None, **solver_kwargs):
        self._mesh = None
        self._bcu = None
        self._bcp = None
        self._inlet_velocity = inlet_velocity
        super().__init__(
            solver_name, "test_channel", rho, mu, dt, T, (0.0, 0.0),
            **solver_kwargs,
        )
        self.setup()

    @property
    def mesh(self):
        if self._mesh is None:
            m = create_rectangle((0, 0), (2.0, 0.5), (24, 6))
            m.mark_boundary_facets(
                lambda x: np.isclose(x[0], 0.0), self.inlet_marker
            )
            m.mark_boundary_facets(
                lambda x: np.isclose(x[0], 2.0), self.outlet_marker
            )
            m.mark_boundary_facets(
                lambda x: np.isclose(x[1], 0.0) | np.isclose(x[1], 0.5),
                self.wall_marker,
            )
            self._mesh = m
        return self._mesh

    @property
    def bcu(self):
        if self._bcu is None:
            walls = BoundaryCondition(np.zeros(2))
            walls.initTopological(
                1, self.mesh.tagged_facets(self.wall_marker)
            )
            self._bcu = [walls]
            if self._inlet_velocity is not None:
                bc_in = BoundaryCondition(self._inlet_velocity)
                bc_in.initTopological(
                    1, self.mesh.tagged_facets(self.inlet_marker)
                )
                self._bcu.append(bc_in)
        return self._bcu

    @property
    def bcp(self):
        if self._bcp is None:
            self._bcp = []
        return self._bcp

    def initial_velocity(self, x):
        return np.zeros((2, x.shape[1]))


def _parabolic(x):
    y = x[1]
    return np.vstack([4.0 * y * (0.5 - y) / 0.25, np.zeros(x.shape[1])])


def test_bdf2_lid(tmp_path):
    sc = LidDriven2DSimulation(
        "stabilized_schur_bdf2", dt=0.01, T=0.03, mu=0.01, nx=10
    )
    sc.solve(str(tmp_path))
    assert sc.solver.last_stats["converged"]
    u = np.asarray(sc.solver.u_sol)
    assert abs(u).max() <= 1.0 + 1e-8
    assert abs(u).max() > 0.5


def test_adaptive_runs(tmp_path):
    sc = LidDriven2DSimulation(
        "stabilized_schur_adaptive", dt=0.01, T=0.02, mu=0.01, nx=8
    )
    sc.solve(str(tmp_path))
    assert sc.solver.last_stats["converged"]


def test_ramping_scales_bc(tmp_path):
    sc = LidDriven2DSimulation(
        "stabilized_schur_ramping", dt=0.01, T=0.02, mu=0.01, nx=8
    )
    solver = sc.solver
    solver.solveStep()
    u = np.asarray(solver.u_sol)
    # after step 1, lid velocity ramped to 1/10
    lid_dofs = solver.V.locate_dofs_geometrical(sc.lid)
    assert np.allclose(u[lid_dofs, 0], 0.1, atol=1e-8)


def test_aspin_matches_base(tmp_path):
    """The ASPIN rebuild (nonlinear additive-Schwarz pre-sweeps + ASM
    linear PC, solvers/stabilized_schur_aspin.py) must converge to the
    same solution as the base Schur solver."""
    sc = LidDriven2DSimulation(
        "stabilized_schur_aspin", dt=0.01, T=0.02, mu=0.1, nx=8
    )
    sc.solve(str(tmp_path))
    assert sc.solver.last_stats["converged"]
    sc0 = LidDriven2DSimulation(
        "stabilized_schur", dt=0.01, T=0.02, mu=0.1, nx=8
    )
    sc0.solve(str(tmp_path) + "_base")
    assert np.allclose(
        np.asarray(sc.solver.u_sol), np.asarray(sc0.solver.u_sol),
        atol=5e-6,
    )


def test_backflow_channel(tmp_path):
    sc = ChannelScenario(
        "stabilized_schur_backflow", dt=0.05, T=0.15,
        inlet_velocity=_parabolic, v_max=1.0,
    )
    sc.solve(str(tmp_path))
    u = np.asarray(sc.solver.u_sol)
    assert sc.solver.last_stats["converged"]
    # flow moves through the channel
    assert u[:, 0].max() > 0.5
    # outflow positive at the outlet
    q = float(sc.solver.form.facet_flux(sc.solver.u_sol, "backflow_out"))
    assert q > 0.05


def test_pressure_backflow_channel(tmp_path):
    sc = ChannelScenario(
        "stabilized_schur_pressure_backflow", dt=0.05, T=0.2,
        p_inlet=1.0, R_resistance=0.5, beta_nitsche=100.0,
    )
    sc.solve(str(tmp_path))
    solver = sc.solver
    assert solver.last_stats["converged"]
    u = np.asarray(solver.u_sol)
    assert u[:, 0].max() > 0.1  # pressure gradient drives flow
    # resistance fixed point produced a positive outlet pressure
    assert solver.p_c > 0
    # Nitsche keeps the inlet tangential velocity small
    inlet_dofs = solver.V.locate_dofs_geometrical(
        lambda x: np.isclose(x[0], 0.0)
    )
    assert abs(u[inlet_dofs, 1]).max() < 0.1 * abs(u[:, 0]).max()


def test_taylor_green_error():
    from cfdtpu.scenarios.taylor_green import TaylorGreenSimulation

    sc = TaylorGreenSimulation(
        "stabilized_schur", dt=0.01, T=0.02, mu=1.0, nx=4
    )
    solver = sc.solver
    sc._t_bc = 0.0
    for i in range(2):
        solver.solveStep()
        sc._t_bc = (i + 1) * 0.01
        solver.u_prev = solver.u_sol
        solver.p_prev = solver.p_sol
    err = sc.compute_error_at(0.02)
    assert err < 0.1  # coarse-mesh Beltrami flow stays within 10%
