"""Aux-subsystem tests: checkpoint/resume, stats log, validation data,
tree components, stenosis+tree meshing."""

import numpy as np
import pytest


def test_checkpoint_resume(tmp_path):
    from cfdtpu.scenarios.lid_driven2D import LidDriven2DSimulation

    sc = LidDriven2DSimulation(
        "stabilized_schur", dt=0.01, T=0.03, mu=0.05, nx=8,
        checkpoint_every=2,
    )
    sc.solve(str(tmp_path / "a"))
    ck = tmp_path / "a" / "checkpoint.npz"
    assert ck.exists()
    assert (tmp_path / "a" / "solver_stats.txt").exists()

    sc2 = LidDriven2DSimulation(
        "stabilized_schur", dt=0.01, T=0.05, mu=0.05, nx=8,
        resume_from=str(ck),
    )
    t, step = sc2.load_checkpoint(str(ck))
    assert step == 3
    assert abs(t - 0.03) < 1e-12
    u_resumed = np.asarray(sc2.solver.u_sol)
    assert np.allclose(u_resumed, np.asarray(sc.solver.u_sol))


def test_checkpoint_restores_bdf2_history(tmp_path):
    """Checkpoints carry BDF2's u_prev2; a legacy checkpoint without it
    makes the solver self-heal with one BDF1 step instead of applying
    full BDF2 coefficients against a zero history field."""
    from cfdtpu.scenarios.lid_driven2D import LidDriven2DSimulation

    sc = LidDriven2DSimulation(
        "stabilized_schur_bdf2", dt=0.01, T=0.03, mu=0.05, nx=8,
        checkpoint_every=2,
    )
    sc.solve(str(tmp_path / "a"))
    ck = str(tmp_path / "a" / "checkpoint.npz")
    data = np.load(ck)
    assert "u_prev2" in data.files

    sc2 = LidDriven2DSimulation(
        "stabilized_schur_bdf2", dt=0.01, T=0.05, mu=0.05, nx=8,
        resume_from=ck,
    )
    sc2.load_checkpoint(ck)
    assert np.allclose(
        np.asarray(sc2.solver.u_prev2), np.asarray(sc.solver.u_prev2)
    )
    assert not getattr(sc2.solver, "_resume_lost_history", False)
    sc2.solver.solveStep()
    assert sc2.solver._bdf == (1.5, -2.0, 0.5)  # history intact -> BDF2

    # legacy checkpoint (pre-history format): strip u_prev2
    legacy = str(tmp_path / "legacy.npz")
    np.savez(legacy, **{k: data[k] for k in data.files if k != "u_prev2"})
    sc3 = LidDriven2DSimulation(
        "stabilized_schur_bdf2", dt=0.01, T=0.05, mu=0.05, nx=8,
        resume_from=legacy,
    )
    sc3.load_checkpoint(legacy)
    assert sc3.solver._resume_lost_history
    sc3.solver.solveStep()
    assert sc3.solver._bdf == (1.0, -1.0, 0.0)  # BDF1 re-seed step
    sc3.solver.u_prev = sc3.solver.u_sol
    sc3.solver.p_prev = sc3.solver.p_sol
    sc3.solver.solveStep()
    assert sc3.solver._bdf == (1.5, -2.0, 0.5)  # back to BDF2


def test_dfg_interval_checker():
    from cfdtpu.validation import check_dfg_2d1

    res = check_dfg_2d1(5.58, 0.0106, 0.1174)
    assert all(v["inside"] for v in res.values())
    res2 = check_dfg_2d1(6.0, 0.0106, 0.1174)
    assert not res2["cd"]["inside"]
    assert res2["cd"]["rel_err"] > 0.05


def test_tree_2d_murray():
    from cfdtpu.geom.tree.tree_2d import VascularTree2D

    t = VascularTree2D(r_root=1.0, n_generations=3, asymmetry=0.5)
    t.generate((0.0, 0.0), 0.0)
    assert len(t.terminals) == 8
    # Murray's law: r_p^3 = r_l^3 + r_r^3
    for e in t.edges:
        children = [c for c in t.edges if c["from"] == e["to"]]
        if len(children) == 2:
            rp3 = e["radius"] ** 3
            rc3 = sum(c["radius"] ** 3 for c in children)
            assert abs(rp3 - rc3) < 1e-12
    assert t.poiseuille_resistance(mu=3.5e-3) > 0


def test_gxl_parser(tmp_path):
    from cfdtpu.geom.tree.gxl import parse_gxl

    gxl = """<?xml version="1.0"?>
<gxl><graph id="t">
<node id="n0"><attr name=" position"><tup><float>1</float>
<float>2</float><float>3</float></tup></attr></node>
<node id="n1"><attr name=" position"><tup><float>4</float>
<float>5</float><float>6</float></tup></attr></node>
<edge from="n0" to="n1"><attr name=" radius"><float>0.05</float>
</attr></edge>
</graph></gxl>"""
    p = tmp_path / "t.gxl"
    p.write_text(gxl)
    nodes, edges = parse_gxl(str(p), voxel_width=2.0)
    assert np.allclose(nodes["n0"], [2, 4, 6])  # x voxel_width
    assert abs(edges[0]["radius"] - 0.5) < 1e-12  # cm -> mm


def test_tree_model_prune(tmp_path):
    from cfdtpu.geom.tree.tree_model import VascularTree

    nodes = {f"n{i}": np.array([float(i), 0, 0]) for i in range(7)}
    edges = [
        {"from": "n0", "to": "n1", "radius": 1.0},
        {"from": "n1", "to": "n2", "radius": 0.8},
        {"from": "n1", "to": "n3", "radius": 0.8},
        {"from": "n2", "to": "n4", "radius": 0.6},
        {"from": "n2", "to": "n5", "radius": 0.6},
        {"from": "n3", "to": "n6", "radius": 0.6},
    ]
    t = VascularTree(nodes=nodes, edges=edges, root="n0")
    t._assign_levels()
    assert sorted(t.terminals) == ["n4", "n5", "n6"]
    t.apply_modifications(vessel_loss_factor=0.4)
    assert len(t.terminals) < 3 or len(t.edges) < 6
    t.apply_modifications(hyperemia_factor=2.0)
    assert max(e["radius"] for e in t.edges) <= 2.0


def test_stenosis_tree_mesh_quality():
    from cfdtpu.geom.tree.tree_2d import VascularTree2D
    from cfdtpu.geom.tree_mesh2d import generate_stenosis_tree_mesh_2d

    tree = VascularTree2D(r_root=1.2, n_generations=2).generate(
        (138.0, 1.57), 0.0
    )
    m = generate_stenosis_tree_mesh_2d(res=0.5, tree=tree)
    assert len(m.tagged_facets(3)) >= 4  # terminal-cap outlets
    P = m.points[m.cells]
    a = P[:, 1] - P[:, 0]
    b = P[:, 2] - P[:, 0]
    area = 0.5 * np.abs(a[:, 0] * b[:, 1] - a[:, 1] * b[:, 0])
    la = np.linalg.norm(a, axis=1)
    lb = np.linalg.norm(b, axis=1)
    lc = np.linalg.norm(P[:, 2] - P[:, 1], axis=1)
    q = 4 * np.sqrt(3) * area / (la ** 2 + lb ** 2 + lc ** 2)
    assert q.min() > 0.2


def test_native_matches_numpy():
    import cfdtpu.native as nat
    from cfdtpu.mesh import create_unit_cube

    if nat._load() is None:
        pytest.skip("native toolchain unavailable")
    m = create_unit_cube(4)
    nat._lib, nat._tried = None, True
    m2 = create_unit_cube(4)
    import importlib

    importlib.reload(nat)
    assert np.array_equal(np.sort(m.facets, axis=None),
                          np.sort(m2.facets, axis=None))
    assert np.array_equal(m.facet_cells.sum(), m2.facet_cells.sum())


def test_tree_to_mesh_3d_native(tmp_path):
    """The native 3D implicit-union tree mesher (scripts/tree_to_mesh.py
    --mode 3d + geom/implicit3d.py): a tiny Y-tree GXL becomes a tagged
    tet mesh with one inlet and two outlets — the in-framework
    counterpart of the reference's CadQuery+gmsh nearest-surface
    pipeline (/root/reference/src/geom/tree/graph_to_mesh.py:264-401)."""
    import subprocess
    import sys

    import numpy as np

    gxl = """<?xml version="1.0"?>
<gxl><graph id="t">
<node id="n0"><attr name=" position"><tup><float>0</float>
<float>0</float><float>0</float></tup></attr></node>
<node id="n1"><attr name=" position"><tup><float>4</float>
<float>0</float><float>0</float></tup></attr></node>
<node id="n2"><attr name=" position"><tup><float>7</float>
<float>2</float><float>0</float></tup></attr></node>
<node id="n3"><attr name=" position"><tup><float>7</float>
<float>-2</float><float>1</float></tup></attr></node>
<edge from="n0" to="n1"><attr name=" radius"><float>0.08</float>
</attr></edge>
<edge from="n1" to="n2"><attr name=" radius"><float>0.06</float>
</attr></edge>
<edge from="n1" to="n3"><attr name=" radius"><float>0.05</float>
</attr></edge>
</graph></gxl>"""
    gxl_path = tmp_path / "tree.gxl"
    gxl_path.write_text(gxl)
    out = tmp_path / "tree3d.npz"
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, "scripts/tree_to_mesh.py", str(gxl_path),
         str(out), "--mode", "3d", "--res", "0.35"],
        cwd=repo, capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    d = np.load(out, allow_pickle=True)
    assert str(d["cell_type"]) == "tetrahedron"
    tags = d["facet_tags"]
    assert (tags == 1).sum() > 0   # inlet
    assert (tags == 2).sum() > 0   # outlets
    assert (tags == 3).sum() > 0   # walls


def test_simple_bifurcation_native_mesh(tmp_path):
    """simple_bifurcation without a mesh_path builds the Y-geometry
    natively (geom/implicit3d.bifurcation_mesh) and a 3D step converges
    (reference reads a pre-built simple_bifurcation.msh,
    /root/reference/src/scenarios/simple_bifurcation.py:70-73)."""
    import numpy as np

    from cfdtpu.scenarios.simple_bifurcation import (
        SimpleBifurcationSimulation,
    )

    # mesh_h resolves the thinnest branch (0.35 r_in) by ~1.6 cells
    sc = SimpleBifurcationSimulation(
        "stabilized_schur", dt=0.01, T=0.01, mesh_h=0.22
    )
    sc.solver.solveStep()
    assert sc.solver.last_stats["converged"]
    assert np.isfinite(np.asarray(sc.solver.u_sol)).all()
    tags = sc.mesh.facet_tags
    assert (tags == sc.inlet_marker).sum() > 0
    assert (tags == sc.outlet_marker).sum() > 0
    assert (tags == sc.outlet2_marker).sum() > 0


def test_native_stenosis3d_mesh():
    """Native 3D stenosed-vessel meshing (geom/stenosis3d.py
    native_stenosis_mesh): tagged tets, constriction resolved near the
    radius law (the reference needs CadQuery+gmsh offline for this,
    /root/reference/src/geom/stenosis/stenosis.py)."""
    import numpy as np

    from cfdtpu.geom.stenosis3d import native_stenosis_mesh

    m = native_stenosis_mesh(severity=0.5, h=0.18)
    assert m.cells.shape[1] == 4
    tags = m.facet_tags
    assert (tags == 1).sum() > 0 and (tags == 2).sum() > 0
    bd = np.unique(m.facets)
    pts = m.points[bd]
    near = np.abs(pts[:, 0] - 5.0) < 0.3
    rr = np.sqrt(pts[near, 1] ** 2 + pts[near, 2] ** 2)
    # throat wall within O(h) of the law's 0.45
    assert rr.max() < 0.45 + 2 * 0.18
    far = np.abs(pts[:, 0] - 1.0) < 0.3
    rfar = np.sqrt(pts[far, 1] ** 2 + pts[far, 2] ** 2)
    assert rfar.max() > 0.8  # un-constricted section stays wide


def test_quadratic_probe_recovery():
    """eval_at_points_quadratic recovers a smooth field to higher order
    than the P1 interpolant at the probe (the DFG dp accuracy knob)."""
    import numpy as np

    from cfdtpu.mesh import create_unit_square
    from cfdtpu.postprocess.probes import (
        eval_at_points, eval_at_points_quadratic,
    )
    from cfdtpu.spaces import FunctionSpace

    mesh = create_unit_square(16, 16)
    Q = FunctionSpace(mesh, degree=1)
    x = np.asarray(Q.dof_coords)
    f = np.sin(2.3 * x[:, 0]) * np.cos(1.7 * x[:, 1])
    pts = np.array([[0.37, 0.53], [0.61, 0.29]])
    exact = np.sin(2.3 * pts[:, 0]) * np.cos(1.7 * pts[:, 1])
    e1 = np.abs(eval_at_points(Q, f, pts) - exact).max()
    e2 = np.abs(eval_at_points_quadratic(Q, f, pts) - exact).max()
    assert e2 < e1
    assert e2 < 2e-4


def test_eval_at_points_tensor_cells():
    """Point probes on quad/hex meshes (round-2 weak #8: tensor-cell
    scenarios couldn't use point evaluation): Newton inversion of the
    multilinear map must reproduce linear fields exactly, including at
    mesh corners and on cell boundaries."""
    from cfdtpu.mesh import create_unit_square, create_unit_cube
    from cfdtpu.spaces import FunctionSpace
    from cfdtpu.postprocess import eval_at_points

    m = create_unit_square(7, 5, cell_type="quadrilateral")
    V = FunctionSpace(m, 1)
    f = np.asarray(m.points[:, 0] * 2 + m.points[:, 1])
    pts = np.array([[0.3, 0.7], [0.0, 0.0], [1.0, 1.0], [0.514, 0.0]])
    got = eval_at_points(V, f, pts)
    assert np.abs(got - (pts[:, 0] * 2 + pts[:, 1])).max() < 1e-10

    m3 = create_unit_cube(4, 3, 5, cell_type="hexahedron")
    V3 = FunctionSpace(m3, 1)
    c = np.array([1.0, -2.0, 0.5])
    f3 = np.asarray(m3.points @ c + 3)
    pts3 = np.array([[0.2, 0.9, 0.5], [1.0, 0.0, 1.0]])
    got3 = eval_at_points(V3, f3, pts3)
    assert np.abs(got3 - (pts3 @ c + 3)).max() < 1e-10

    # vector space on quads
    V2 = FunctionSpace(m, 1, 2)
    fv = np.stack([m.points[:, 0], 1 - m.points[:, 1]], axis=1)
    gv = eval_at_points(V2, fv, np.array([[0.25, 0.6]]))
    assert np.allclose(gv, [[0.25, 0.4]], atol=1e-10)
