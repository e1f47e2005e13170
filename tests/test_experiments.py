"""Experiment-matrix layer tests: config schema, matrix product,
mesh+solve pipeline, scenario factory BC modes."""

import numpy as np
import pytest

from cfdtpu.experiments.meshing import (
    experiment_name,
    generate_experiment_matrix,
    run_meshing,
)
from cfdtpu.utils.config import load_config

CONFIG = """
simulation_params:
  solver: stabilized_schur
  geometry_type: stenosis2d
  T: 0.005
  dt: 0.0025
  mu: 3.5e-3
  rho: 1.06e-3
  q_in: 40.0
  q_in_hyper: 120.0
  p_terminal: 0.0

artery_params:
  radius_in: 1.57
  radius_out: 1.2
  length: 138.0
  artery_mesh_size_from_curvature: 0.8

matrix:
  stenosis_severity: [0.25, 0.5]
  hyperemia: [false, true]
"""


@pytest.fixture()
def config_file(tmp_path):
    p = tmp_path / "cfg.yaml"
    p.write_text(CONFIG)
    return str(p)


def test_load_config_merges_sections(config_file):
    cfg = load_config(config_file)
    assert "artery_params" not in cfg
    assert cfg["base_params"]["radius_in"] == 1.57
    assert cfg["simulation_params"]["solver"] == "stabilized_schur"


def test_load_config_rejects_unknown(tmp_path):
    p = tmp_path / "bad.yaml"
    p.write_text("bogus_section:\n  x: 1\n")
    with pytest.raises(ValueError, match="unknown top-level"):
        load_config(str(p))
    p2 = tmp_path / "bad2.yaml"
    p2.write_text("base_params:\n  not_a_param: 1\n")
    with pytest.raises(ValueError, match="unknown parameter"):
        load_config(str(p2))


def test_fallback_parser(tmp_path):
    from cfdtpu.utils.config import _fallback_parse

    p = tmp_path / "cfg.yaml"
    p.write_text(
        "matrix:\n  stenosis_severity: [0.25, 0.5]\n"
        "base_params:\n  radius_in: 1.57\n  bc_type:\n"
        "    inlet: pressure\n    outlet: pressure\n"
    )
    cfg = _fallback_parse(str(p))
    assert cfg["matrix"]["stenosis_severity"] == [0.25, 0.5]
    assert cfg["base_params"]["bc_type"]["inlet"] == "pressure"


def test_matrix_product(config_file):
    cfg = load_config(config_file)
    combos = generate_experiment_matrix(cfg)
    assert len(combos) == 4
    assert combos[0] == {"stenosis_severity": 0.25, "hyperemia": False}
    assert experiment_name(2, combos[2]).startswith(
        "exp_002_stenosis_severity_0p5"
    )


def test_mesh_and_solve_pipeline(config_file, tmp_path):
    out = tmp_path / "exp"
    assert run_meshing(config_file, str(out), job_idx=0) == 0
    mesh_file = out / "exp_000_stenosis_severity_0p25_hyperemia_False" \
        / "mesh.npz"
    assert mesh_file.exists()

    from cfdtpu.experiments.solving import run_solving

    assert run_solving(config_file, str(out), job_idx=0) == 0
    sol = mesh_file.parent / "solution"
    assert (sol / "norms.txt").exists()
    assert (sol / "simulation_params.txt").exists()


def test_factory_bc_modes(tmp_path, config_file):
    from cfdtpu.experiments.scenario_factory import (
        create_experiment_scenario_class,
        load_experiment_mesh,
    )

    out = tmp_path / "m"
    run_meshing(config_file, str(out), job_idx=0)
    mesh_path = (
        out / "exp_000_stenosis_severity_0p25_hyperemia_False"
        / "mesh.npz"
    )
    base = {
        "radius_in": 1.57, "q_in": 40.0, "q_in_hyper": 120.0,
        "p_terminal": 0.0, "p_inlet": 100.0,
    }
    # pressure-inlet mode produces pressure BCs and no inlet velocity BC
    cls = create_experiment_scenario_class(
        mesh_path,
        {"bc_type": {"inlet": "pressure", "outlet": "pressure"}},
        base,
    )
    sc = cls("stabilized_schur", T=0.005, dt=0.0025)
    assert len(sc.bcp) == 2
    assert len(sc.bcu) == 1  # walls only
    # velocity_constant inlet
    cls2 = create_experiment_scenario_class(
        mesh_path,
        {"bc_type": {"inlet": "velocity_constant",
                     "outlet": "velocity_zero"}},
        base,
    )
    sc2 = cls2("stabilized_schur", T=0.005, dt=0.0025)
    assert len(sc2.bcu) == 3  # walls + inlet + outlet-zero
    assert len(sc2.bcp) == 0


def test_tree2d_modifications():
    from cfdtpu.geom.tree.tree_2d import VascularTree2D

    t = VascularTree2D(r_root=1.0, n_generations=3)
    t.generate((0.0, 0.0))
    n_term = len(t.terminals)
    n_edges = len(t.edges)
    radii0 = {id(e): e["radius"] for e in t.edges}

    # pruning removes terminals; parents losing all children become
    # terminals, so the tree stays well-formed
    t.apply_modifications(vessel_loss_factor=0.5)
    assert len(t.edges) < n_edges
    assert all(
        any(e["to"] == term for e in t.edges) for term in t.terminals
    )

    # dilation scales every radius
    before = [e["radius"] for e in t.edges]
    t.apply_modifications(hyperemia_factor=1.2)
    assert np.allclose(
        [e["radius"] for e in t.edges], np.asarray(before) * 1.2
    )

    # thickening shrinks only the deep generations
    t2 = VascularTree2D(r_root=1.0, n_generations=3).generate((0.0, 0.0))
    r_root_edge = [e for e in t2.edges if e["generation"] == 0][0]
    r_deep = [e for e in t2.edges if e["generation"] >= 2]
    r_deep_before = [e["radius"] for e in r_deep]
    t2.apply_modifications(
        wall_severity=0.4, wall_level_threshold=2
    )
    assert r_root_edge["radius"] == 1.0
    assert np.allclose(
        [e["radius"] for e in r_deep],
        np.asarray(r_deep_before) * 0.6,
    )


TREE_CONFIG = """
simulation_params:
  solver: stabilized_schur
  geometry_type: tree2d
  T: 0.005
  dt: 0.0025
  mu: 3.5e-3
  rho: 1.06e-3
  p_inlet: 100.0
  p_terminal: 0.0

artery_params:
  radius_in: 1.5
  radius_out: 0.65
  length: 20.0
  artery_mesh_size_from_curvature: 0.35

tree_params:
  n_terminal: 4

matrix:
  geometry_type: [tree2d, full2d]
"""


def test_tree2d_meshing_stage(tmp_path):
    cfg = tmp_path / "tree.yaml"
    cfg.write_text(TREE_CONFIG)
    out = tmp_path / "out"
    assert run_meshing(str(cfg), str(out)) == 0
    npz = sorted(out.glob("exp_*/mesh.npz"))
    assert len(npz) == 2
    for f in npz:
        d = np.load(f, allow_pickle=True)
        tags = d["facet_tags"]
        # inlet=1 present, >= n_terminal outlet(2) facets, walls(3)
        assert (tags == 1).sum() >= 2
        assert (tags == 2).sum() >= 4
        assert (tags == 3).sum() > 10
