"""Experiment-matrix mesh generation.

Rebuild of /root/reference/src/experiments/meshing.py: the experiment
matrix is the cartesian product of the `matrix:` YAML lists
(generate_experiment_matrix, :21-27); per combination, meshes are built in
stages (tree via VascuSynth, geometry via CadQuery/gmsh in the reference)
into per-experiment directories exp_NNN_key_value...

Native capability: 2D stenosis geometries mesh natively (Delaunay or
structured); the 3D VascuSynth/CadQuery stages remain offline
preprocessing — when their tools are missing the stage reports exactly
what is needed and which experiments were skipped.
"""

from __future__ import annotations

import itertools
import os
from pathlib import Path

from ..utils.config import load_config


def generate_experiment_matrix(config: dict) -> list[dict]:
    """All combinations of the matrix axes (reference :21-27)."""
    matrix = config.get("matrix", {})
    keys = list(matrix.keys())
    values = [v if isinstance(v, list) else [v] for v in matrix.values()]
    return [dict(zip(keys, v)) for v in itertools.product(*values)]


def experiment_name(i: int, experiment: dict) -> str:
    name = f"exp_{i:03d}"
    for k, v in experiment.items():
        name += f"_{k}_{str(v).replace('.', 'p')}"
    return name


def run_meshing(config_path, output_base, job_idx=None, mode="all") -> int:
    config = load_config(config_path)
    base = config.get("base_params", {})
    sim = config.get("simulation_params", {})
    combinations = generate_experiment_matrix(config)
    output_base = Path(output_base)
    print(f"[INFO] Total experiments: {len(combinations)}")

    if job_idx is not None:
        if not 0 <= job_idx < len(combinations):
            print(
                f"[ERROR] job_idx {job_idx} out of range "
                f"(0-{len(combinations) - 1})"
            )
            return 1
        todo = [(job_idx, combinations[job_idx])]
    else:
        todo = list(enumerate(combinations))

    geometry_type = sim.get("geometry_type", "stenosis2d")
    n_done = n_skipped = 0
    for i, experiment in todo:
        params = {**base, **sim, **experiment}
        gtype = params.get("geometry_type", geometry_type)
        exp_dir = output_base / experiment_name(i, experiment)
        exp_dir.mkdir(parents=True, exist_ok=True)
        mesh_path = exp_dir / "mesh.msh"

        if gtype in ("stenosis2d", "stenosis_2d"):
            _mesh_stenosis2d(params, exp_dir)
            n_done += 1
        elif gtype in ("tree2d", "full2d"):
            _mesh_tree2d(params, exp_dir, with_stenosis=gtype == "full2d")
            n_done += 1
        elif gtype in ("stenosis", "tree", "full"):
            _mesh_native3d(params, exp_dir, gtype)
            n_done += 1
        else:
            print(f"[ERROR] unknown geometry_type '{gtype}'")
            return 1
    print(f"[INFO] meshing done: {n_done} generated, {n_skipped} skipped")
    return 0


def _mesh_stenosis2d(params: dict, exp_dir: Path) -> None:
    """Native 2D stenosis meshing stage; writes mesh.npz (points/cells/
    facet tags) consumed by the solving stage."""
    import numpy as np

    from ..geom.stenosis2d import generate_stenosis_mesh_2d

    mesh = generate_stenosis_mesh_2d(
        L=params.get("length", 138.0),
        R_in=params.get("radius_in", 1.57),
        R_out=params.get("radius_out", 1.2),
        res=params.get("artery_mesh_size_from_curvature", 0.5) or 0.5,
        x_position_stenosis=params.get("stenosis_position", 30.0),
        severity=params.get("stenosis_severity", 0.5),
        slope=params.get("stenosis_slope", 0.4),
        # experiment meshes use the geom/stenosis convention inlet=1,
        # outlet=2, wall=3 (reference stenosis.py:12-15)
        inlet_marker=1,
        outlet_marker=2,
        wall_marker=3,
    )
    _save_mesh(mesh, exp_dir)


def _mesh_native3d(params: dict, exp_dir: Path, gtype: str) -> None:
    """Native 3D meshing stage for geometry_type stenosis/tree/full —
    the in-framework counterpart of the reference's offline
    VascuSynth+CadQuery+gmsh pipeline (reference experiments/meshing.py:
    244-298 tree, :300-436 merged build, :443-552 tagging): implicit
    SDF-union tet meshing (geom/implicit3d.py) of the stenosis radius
    law, a procedural 3D Murray tree (geom/merged3d.procedural_tree3d —
    a cached VascuSynth GXL at <exp_dir>/tree_structure.xml takes
    precedence), or the stenosis ∪ coupling-cone ∪ tree union."""
    import math

    from ..geom.merged3d import (
        mesh_full_geometry, procedural_tree3d,
    )
    from ..geom.stenosis3d import native_stenosis_mesh
    from ..geom.tree_mesh3d import tree_to_mesh3d

    def _load_tree():
        gxl = exp_dir / "tree_structure.xml"
        if gxl.exists():
            from ..geom.tree.tree_model import VascularTree
            from ..geom.tree.vascusynth import voxel_width_mm

            tree = VascularTree.from_xml(
                str(gxl),
                voxel_width_mm(float(params.get("volume_mL", 100.0))),
            )
        else:
            n_terminal = int(params.get("n_terminal", 8))
            n_gen = max(1, int(round(math.log2(max(n_terminal, 2)))))
            tree = procedural_tree3d(
                r_root=0.9 * float(params.get("radius_out", 1.2)),
                n_generations=n_gen,
                gamma=float(params.get("murray_exponent", 3.0)),
            )
        hyper = bool(params.get("hyperemia", False))
        tree.apply_modifications(
            vessel_loss_factor=float(
                params.get("vessel_loss_factor", 0.0)
            ),
            hyperemia_factor=(
                float(params.get("hyperemia_dilation_factor", 1.0))
                if hyper else 1.0
            ),
            wall_severity=float(
                params.get("wall_thickening_severity", 0.0)
            ),
            wall_level_threshold=int(
                params.get("thickening_level_threshold", 1)
            ),
        )
        return tree

    res = float(params.get("mesh_resolution", 0.35))
    if gtype == "stenosis":
        mesh = native_stenosis_mesh(
            length=float(params.get("length", 50.0)),
            radius_in=float(params.get("radius_in", 1.5)),
            radius_out=float(params.get("radius_out", 0.65)),
            severity=float(params.get("stenosis_severity", 0.5)),
            slope=float(params.get("stenosis_slope", 0.3)),
            position=float(
                params.get("stenosis_position",
                           0.5 * float(params.get("length", 50.0)))
            ),
        )
    elif gtype == "tree":
        mesh = tree_to_mesh3d(_load_tree(), res=res)
    else:  # full
        mesh = mesh_full_geometry(params, tree=_load_tree())
    _save_mesh(mesh, exp_dir)


def _mesh_tree2d(params: dict, exp_dir: Path, with_stenosis: bool) -> None:
    """Native 2D artery+tree union meshing stage — the in-framework
    counterpart of the reference's 3-stage VascuSynth -> CadQuery -> gmsh
    pipeline (reference experiments/meshing.py, stages at :86-200): the
    procedural VascularTree2D replaces VascuSynth, tree modifications
    (vessel loss / hyperemia dilation / wall thickening, reference
    tree_model.py:26-42) are applied to it, and the capsule-union Delaunay
    mesher replaces the OCC boolean fusion. geometry_type "full2d" keeps
    the stenosis bump; "tree2d" meshes a plain tapered artery + tree."""
    import math

    from ..geom.tree.tree_2d import VascularTree2D
    from ..geom.tree_mesh2d import generate_stenosis_tree_mesh_2d

    n_terminal = int(params.get("n_terminal", 8))
    n_gen = max(1, int(round(math.log2(max(n_terminal, 2)))))
    tree = VascularTree2D(
        r_root=0.9 * float(params.get("radius_out", 1.2)),
        n_generations=n_gen,
        gamma=float(params.get("murray_exponent", 3.0)),
    )
    L = float(params.get("length", 138.0))
    R_in = float(params.get("radius_in", 1.57))
    tree.generate((L, R_in), direction=0.0)
    hyper = bool(params.get("hyperemia", False))
    tree.apply_modifications(
        vessel_loss_factor=float(params.get("vessel_loss_factor", 0.0)),
        hyperemia_factor=(
            float(params.get("hyperemia_dilation_factor", 1.0))
            if hyper else 1.0
        ),
        wall_severity=float(params.get("wall_thickening_severity", 0.0)),
        wall_level_threshold=int(
            params.get("thickening_level_threshold", 1)
        ),
    )
    mesh = generate_stenosis_tree_mesh_2d(
        L=L,
        R_in=R_in,
        R_out=float(params.get("radius_out", 1.2)),
        res=params.get("artery_mesh_size_from_curvature", 0.5) or 0.5,
        x_position_stenosis=float(params.get("stenosis_position", 30.0)),
        severity=(
            float(params.get("stenosis_severity", 0.5))
            if with_stenosis else 0.0
        ),
        slope=float(params.get("stenosis_slope", 0.4)),
        tree=tree,
        inlet_marker=1,
        outlet_marker=2,
        wall_marker=3,
    )
    _save_mesh(mesh, exp_dir)


def _save_mesh(mesh, exp_dir: Path) -> None:
    import numpy as np

    np.savez(
        exp_dir / "mesh.npz",
        points=mesh.points,
        cells=mesh.cells,
        cell_type=str(mesh.cell_type),
        facet_tags=mesh.facet_tags,
        facets=mesh.facets,
        facet_cells=mesh.facet_cells,
        facet_local_index=mesh.facet_local_index,
    )
    print(f"[MESH] {exp_dir.name}: {mesh.num_cells} cells -> mesh.npz")
