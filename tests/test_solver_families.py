"""Convergence tests for the solver families untested in round 1:
LSC x3, PCD x3, staggered, schur_stokes, vascularbc_strong, and the
solvers_aux stokes/pressure modules (VERDICT.md round-1 weak #6).

Each test steps the solver on a small lid/channel fixture (the pattern of
tests/test_variants.py) and asserts convergence plus a physical sanity
check — the same role the reference's smoke-matrix configs play
(/root/reference/src/experiments/config/test_stenosis.yaml sweeps solver
families over bc_type combinations)."""

import jax.numpy as jnp
import numpy as np
import pytest

from cfdtpu.mesh import create_rectangle, create_unit_square
from cfdtpu.scenarios.lid_driven2D import LidDriven2DSimulation
from cfdtpu.spaces import BoundaryCondition

from test_variants import ChannelScenario, _parabolic


# -- LSC family ---------------------------------------------------------

def test_lsc_lid(tmp_path):
    sc = LidDriven2DSimulation(
        "stabilized_lsc", dt=0.01, T=0.03, mu=0.01, nx=10
    )
    sc.solve(str(tmp_path))
    assert sc.solver.last_stats["converged"]
    u = np.asarray(sc.solver.u_sol)
    assert 0.5 < abs(u).max() <= 1.0 + 1e-8


def test_lsc_bdf2_lid(tmp_path):
    sc = LidDriven2DSimulation(
        "stabilized_lsc_bdf2", dt=0.01, T=0.03, mu=0.01, nx=10
    )
    sc.solve(str(tmp_path))
    assert sc.solver.last_stats["converged"]
    u = np.asarray(sc.solver.u_sol)
    assert 0.5 < abs(u).max() <= 1.0 + 1e-8


def test_lsc_pressurebc_channel(tmp_path):
    # T covers ~ one startup time constant tau = rho H^2/(mu pi^2) ~ 0.5
    # so the pressure-driven flow is clearly developed
    sc = ChannelScenario(
        "stabilized_lsc_pressurebc", dt=0.1, T=0.5,
        p_inlet=1.0, p_outlet=0.0, beta_nitsche=100.0,
    )
    sc.solve(str(tmp_path))
    assert sc.solver.last_stats["converged"]
    u = np.asarray(sc.solver.u_sol)
    assert u[:, 0].max() > 0.1  # pressure gradient drives flow


# -- PCD family ---------------------------------------------------------

def test_pcd_lid(tmp_path):
    sc = LidDriven2DSimulation(
        "stabilized_pcd", dt=0.01, T=0.03, mu=0.01, nx=10
    )
    sc.solve(str(tmp_path))
    assert sc.solver.last_stats["converged"]
    u = np.asarray(sc.solver.u_sol)
    assert 0.5 < abs(u).max() <= 1.0 + 1e-8


def test_pcd_bdf2_lid(tmp_path):
    sc = LidDriven2DSimulation(
        "stabilized_pcd_bdf2", dt=0.01, T=0.03, mu=0.01, nx=10
    )
    sc.solve(str(tmp_path))
    assert sc.solver.last_stats["converged"]
    u = np.asarray(sc.solver.u_sol)
    assert 0.5 < abs(u).max() <= 1.0 + 1e-8


def test_pcd_pressurebc_channel(tmp_path):
    sc = ChannelScenario(
        "stabilized_pcd_pressurebc", dt=0.1, T=0.5,
        p_inlet=1.0, p_outlet=0.0, beta_nitsche=100.0,
    )
    sc.solve(str(tmp_path))
    assert sc.solver.last_stats["converged"]
    u = np.asarray(sc.solver.u_sol)
    assert u[:, 0].max() > 0.1


# -- staggered ----------------------------------------------------------

def test_staggered_lid(tmp_path):
    sc = LidDriven2DSimulation(
        "stabilized_staggered", dt=0.01, T=0.03, mu=0.01, nx=10
    )
    sc.solve(str(tmp_path))
    assert sc.solver.last_stats["converged"]
    u = np.asarray(sc.solver.u_sol)
    assert 0.5 < abs(u).max() <= 1.0 + 1e-8


# -- schur_stokes (Stokes initial guess) --------------------------------

def test_schur_stokes_channel(tmp_path):
    """From a zero initial velocity the Stokes init must fire and the
    first step converge to channel flow."""
    sc = ChannelScenario(
        "stabilized_schur_stokes", dt=0.05, T=0.1,
        inlet_velocity=_parabolic,
    )
    sc.solve(str(tmp_path))
    assert sc.solver.last_stats["converged"]
    u = np.asarray(sc.solver.u_sol)
    assert u[:, 0].max() > 0.3


# -- vascularbc_strong ---------------------------------------------------

def test_vascularbc_strong_channel(tmp_path):
    sc = ChannelScenario(
        "stabilized_schur_vascularbc_strong", dt=0.05, T=0.2,
        p_inlet=1.0, R_resistance=0.5,
    )
    sc.solve(str(tmp_path))
    solver = sc.solver
    assert solver.last_stats["converged"]
    u = np.asarray(solver.u_sol)
    assert u[:, 0].max() > 0.05
    # the fixed point drove the strong outlet pressure to R * |Q| > 0
    assert solver._p_outlet_strong > 0
    # the strong Dirichlet rows actually hold a constant outlet pressure
    p = np.asarray(solver.p_sol)
    out_dofs = solver.Q.facet_closure_dofs(
        sc.mesh.tagged_facets(sc.outlet_marker)
    )
    assert np.allclose(p[out_dofs], p[out_dofs][0], atol=1e-6)
    assert p[out_dofs][0] > 0


# -- solvers_aux ---------------------------------------------------------

def test_aux_stokes_lid():
    """Taylor-Hood Stokes solve on the lid cavity: converged, velocity
    bounded by the lid speed, zero on the walls."""
    from cfdtpu.solvers_aux.stokes import solve_stokes

    mesh = create_unit_square(8, 8)
    lid = BoundaryCondition(
        lambda x: np.vstack([np.ones(x.shape[1]), np.zeros(x.shape[1])])
    )
    lid.initGeometrical(lambda x: np.isclose(x[1], 1.0))
    walls = BoundaryCondition(np.zeros(2))
    walls.initGeometrical(
        lambda x: np.isclose(x[0], 0) | np.isclose(x[0], 1)
        | np.isclose(x[1], 0)
    )
    u, p, V, Q = solve_stokes(mesh, mu=1.0, bcu=[walls, lid])
    u = np.asarray(u)
    assert abs(u).max() <= 1.0 + 1e-6
    assert abs(u).max() > 0.3
    wall_dofs = V.locate_dofs_geometrical(
        lambda x: np.isclose(x[1], 0.0)
    )
    assert abs(u[wall_dofs]).max() < 1e-6


def test_aux_pressure_recovery():
    """Recover the linear Poiseuille pressure from the parabolic velocity
    (the reference validates pressure.py the same way: stationary momentum
    residual minimization, /root/reference/src/solvers_aux/pressure.py)."""
    from cfdtpu.solvers_aux.pressure import recover_pressure
    from cfdtpu.spaces import FunctionSpace

    L, H, mu, G = 2.0, 1.0, 0.5, 1.0  # dp/dx = -G
    mesh = create_rectangle((0, 0), (L, H), (16, 8))
    # P2/P1 (the reference recovers on P3/P2, pressure.py:35-36): the
    # quadratic Poiseuille profile is then exactly representable and the
    # momentum least squares is consistent; P1 velocity carries mu lap u
    # only in inter-element jumps and cannot pin the pressure gradient.
    V = FunctionSpace(mesh, degree=2, num_components=2)
    Q = FunctionSpace(mesh, degree=1)
    x = np.asarray(V.dof_coords)
    u = np.zeros((V.num_dofs, 2))
    u[:, 0] = G / (2 * mu) * x[:, 1] * (H - x[:, 1])
    p = np.asarray(recover_pressure(V, Q, u, rho=1.0, mu=mu))
    xq = np.asarray(Q.dof_coords)
    p_exact = G * (L / 2 - xq[:, 0])  # mean-zero linear profile
    # Judge the interior: the reference form's do-nothing convention
    # (mu nabla_grad(u)^T n, pressure.py:52) leaves an O(1) tangential
    # traction mismatch in the wall rows of the least squares that no
    # pressure can cancel; the interior gradient is the physical signal.
    inner = (xq[:, 0] > 0.3) & (xq[:, 0] < L - 0.3)
    pi = p[inner] - p[inner].mean()
    pe = p_exact[inner] - p_exact[inner].mean()
    assert np.corrcoef(pi, pe)[0, 1] > 0.99
    slope = np.polyfit(xq[inner, 0], pi, 1)[0]
    assert abs(slope - (-G)) < 0.25 * G


# -- PC option coverage (round-2 weak #3 tail: the chebyshev/jacobi and
# -- amg/RAS inner methods had no test exercising them) -----------------

@pytest.mark.parametrize("kw", [
    {"pc_type": "jacobi"},
    {"pc_inner_method": "chebyshev"},
    {"pc_inner_method": "rasamg_up"},
    {"pc_inner_method": "amg_sup"},
    {"pc_inner_method": "rasamg_sup"},
    # preonly stages (m == 0 -> one V-cycle, no Krylov wrap)
    {"pc_inner_method": "rasamg_sup", "pc_inner_u": 0, "pc_inner_p": 4},
    {"pc_inner_method": "rasamg_sup", "pc_inner_u": 1, "pc_inner_p": 0},
    # K-cycle (GCR(2)-accelerated coarse corrections, la/amg.py _gcr2)
    {"pc_inner_method": "rasamg_sup", "pc_inner_u": 0,
     "pc_amg_kcycle": True},
    # Chebyshev polynomial AMG smoothing (la/amg.py cheby_degree)
    {"pc_inner_method": "rasamg_sup", "pc_inner_u": 0,
     "pc_amg_cheby": 2},
])
def test_pc_options_converge(tmp_path, kw):
    sc = LidDriven2DSimulation(
        "stabilized_schur", dt=0.01, T=0.02, mu=0.01, nx=10, **kw
    )
    sc.solve(str(tmp_path))
    assert sc.solver.last_stats["converged"]
    # point-Jacobi is legitimately slow; the AMG-family methods must
    # stay within a small factor of the amg_p default (~4/step here)
    cap = 150 if kw.get("pc_type") == "jacobi" else 25
    assert sc.solver.last_stats["ksp_iters"] <= cap


def test_pc_lag_self_heal(tmp_path):
    """A reuse step that fails to converge must trigger one rebuild-and-
    retry at the current guess (stabilized_schur.solveStep) instead of
    raising — only a fresh-state failure is a real divergence."""
    sc = LidDriven2DSimulation(
        "stabilized_schur", dt=0.01, T=0.05, mu=0.01, nx=10,
        pc_inner_method="rasamg_sup", pc_inner_u=0, pc_inner_p=3,
        pc_lag_steps=3,
    )
    s = sc.solver
    s.solveStep()  # step 0: builds the carried state
    orig = s._reuse_step
    calls = {"n": 0}

    def flaky(*a):
        u, p, ru, rp, stats = orig(*a)
        calls["n"] += 1
        if calls["n"] == 1:  # poison the first reuse step's verdict
            stats = dict(stats)
            stats["converged"] = jnp.asarray(False)
        return u, p, ru, rp, stats

    s._reuse_step = flaky
    s.u_prev, s.p_prev = s.u_sol, s.p_sol
    s.solveStep()  # reuse step: flaky "failure" -> rebuild -> retry
    assert calls["n"] == 2  # retried exactly once
    assert s.last_stats["converged"]
    assert s._op_state_fresh  # the retry rebuilt the carried state


def test_pc_lag_spike_rebuild(tmp_path):
    """Convergence-aware lag: a Newton-iteration spike (> 2x the rolling
    median of checked steps) must request an early operator/PC rebuild
    at the NEXT step, instead of waiting out the fixed pc_lag_steps
    period or relying on the self-heal retry after a failure."""
    sc = LidDriven2DSimulation(
        "stabilized_schur", dt=0.01, T=0.02, mu=0.01, nx=10,
        pc_inner_method="rasamg_sup", pc_inner_u=0, pc_inner_p=3,
        pc_lag_steps=5,
    )
    s = sc.solver
    s.solveStep()  # step 0: builds the carried state
    # calm history: no rebuild requested
    s._newton_hist = [2, 2, 2, 3]
    s._note_newton_iters(2)
    assert not getattr(s, "_rebuild_hint", False)
    # spike: 8 > max(2 * median=2, median + 2) = 4
    s._note_newton_iters(8)
    assert s._rebuild_hint
    assert s._newton_hist == []  # spike must not poison the window
    # the hint is consumed by the next step, which rebuilds early
    # (step_count=1, pc_lag_steps=5 — the fixed period alone would not)
    s.u_prev, s.p_prev = s.u_sol, s.p_sol
    s.solveStep()
    assert s._op_state_fresh
    assert not s._rebuild_hint


def test_pc_lag_steps_matches_default(tmp_path):
    """Cross-step operator/PC reuse (pc_lag_steps): the carried-state
    path must converge each step on the fresh residual and land on the
    same trajectory as the per-step-rebuild default — Newton tolerance
    governs the solution, the lag only shifts iteration counts."""
    def march(**kw):
        sc = LidDriven2DSimulation(
            "stabilized_schur", dt=0.01, T=0.05, mu=0.01, nx=10,
            pc_inner_method="rasamg_sup", pc_inner_u=0, pc_inner_p=3,
            **kw,
        )
        sc.solve(str(tmp_path / str(len(kw))))
        assert sc.solver.last_stats["converged"]
        return np.asarray(sc.solver.u_sol), np.asarray(sc.solver.p_sol)

    u_ref, p_ref = march()
    u_lag, p_lag = march(pc_lag_steps=3, snes_lag_jacobian=True)
    rel_u = np.linalg.norm(u_lag - u_ref) / np.linalg.norm(u_ref)
    assert rel_u < 5e-4
    rel_p = np.linalg.norm(p_lag - p_ref) / max(
        np.linalg.norm(p_ref), 1e-30
    )
    assert rel_p < 5e-3


def test_aux_stokes_3d_p3p2_exact():
    """True P3/P2 Taylor-Hood in 3D (reference parity:
    src/solvers_aux/stokes.py:52-75 — previously fell back to P2/P1).
    u = (y^2, 0, 0), p = 2 mu x is an exact Stokes solution the P3/P2
    pair represents exactly, so the discrete solve must reproduce it to
    solver tolerance."""
    from cfdtpu.mesh import create_unit_cube
    from cfdtpu.solvers_aux.stokes import solve_stokes

    mesh = create_unit_cube(2, 2, 2)
    bc = BoundaryCondition(
        lambda x: np.vstack(
            [x[1] ** 2, np.zeros(x.shape[1]), np.zeros(x.shape[1])]
        )
    )
    bc.initGeometrical(
        lambda x: np.isclose(x[0], 0) | np.isclose(x[0], 1)
        | np.isclose(x[1], 0) | np.isclose(x[1], 1)
        | np.isclose(x[2], 0) | np.isclose(x[2], 1)
    )
    u, p, V, Q = solve_stokes(mesh, mu=1.0, bcu=[bc], rtol=1e-10)
    assert V.degree == 3 and Q.degree == 2
    u = np.asarray(u)
    u_exact = np.stack(
        [V.dof_coords[:, 1] ** 2, np.zeros(V.num_dofs),
         np.zeros(V.num_dofs)], axis=1,
    )
    assert np.abs(u - u_exact).max() < 1e-6
    # pressure: linear in x up to its arbitrary constant
    p = np.asarray(p)
    p_exact = 2.0 * np.asarray(Q.dof_coords[:, 0])
    p_exact -= p_exact.mean()
    assert np.abs(p - (p - p_exact).mean() - p_exact).max() < 1e-5
