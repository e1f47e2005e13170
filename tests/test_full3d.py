"""Native 3D 'full' merged-geometry pipeline end-to-end.

The reference meshes geometry_type "full" by OCC-unioning a CadQuery
stenosis loft, coupling cone, and VascuSynth tree solid
(/root/reference/src/experiments/meshing.py:300-552) — all offline C++
tools. These tests assert the native implicit-union replacement meshes
and solves in-framework: stenosis ∪ coupling ∪ procedural 3D tree tet
mesh with inlet/outlet/wall tags, driven through the real experiment
mesh+solve stages.
"""

import numpy as np
import pytest


CONFIG = """\
artery_params:
  radius_in: 1.2
  radius_out: 0.8
  length: 8.0
  stenosis_slope: 0.3
  stenosis_position: 4.0
  stenosis_severity: 0.3
  n_axial: 16
  mesh_resolution: 0.75

tree_params:
  n_terminal: 2

simulation_params:
  solver: stabilized_schur
  T: 0.004
  dt: 0.002
  mu: 3.5e-3
  rho: 1.06e-3
  q_in: 2.0
  q_in_hyper: 7.0
  p_terminal: 0.0
  geometry_type: full
  hyperemia: false

matrix:
  bc_type:
    - {inlet: velocity_parabolic, outlet: pressure}
"""


@pytest.fixture(scope="module")
def exp_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("full3d")
    cfg = root / "full3d.yaml"
    cfg.write_text(CONFIG)
    return root, cfg


def test_full3d_meshes_natively(exp_root):
    from cfdtpu.experiments.meshing import run_meshing

    root, cfg = exp_root
    assert run_meshing(str(cfg), str(root / "meshes")) == 0
    npz = list((root / "meshes").glob("exp_*/mesh.npz"))
    assert len(npz) == 1
    data = np.load(npz[0], allow_pickle=True)
    assert str(data["cell_type"]) == "tetrahedron"
    tags = data["facet_tags"]
    assert (tags == 1).sum() > 0   # inlet
    assert (tags == 2).sum() > 0   # terminal outlets
    assert (tags == 3).sum() > 0   # walls


def test_full3d_solves(exp_root):
    from cfdtpu.experiments.meshing import run_meshing
    from cfdtpu.experiments.solving import run_solving

    root, cfg = exp_root
    run_meshing(str(cfg), str(root / "meshes"))
    rc = run_solving(str(cfg), str(root / "meshes"))
    assert rc == 0
    # the scenario writes its outputs under the experiment dir
    stats = list((root / "meshes").glob("exp_*/**/solver_stats.txt"))
    assert stats, "no solver_stats.txt produced"
    lines = stats[0].read_text().strip().splitlines()
    assert len(lines) >= 2  # header + at least one converged step


def test_native3d_stenosis_and_tree_types(tmp_path):
    from cfdtpu.experiments.meshing import run_meshing

    for gtype in ("stenosis", "tree"):
        cfg = tmp_path / f"{gtype}.yaml"
        cfg.write_text(CONFIG.replace(
            "geometry_type: full", f"geometry_type: {gtype}"
        ))
        out = tmp_path / f"meshes_{gtype}"
        assert run_meshing(str(cfg), str(out)) == 0
        assert list(out.glob("exp_*/mesh.npz"))


def test_junction_blend_adds_fillet_material():
    """Smooth-min junction blending (the lofted-bifurcation/fillet
    fidelity knob, ref graph_to_mesh.py lofts): blended union strictly
    contains the hard union at the branch point, end tags intact."""
    import numpy as np

    from cfdtpu.geom.implicit3d import bifurcation_mesh

    def vol(m):
        p = m.points[m.cells]
        a = p[:, 1] - p[:, 0]
        b = p[:, 2] - p[:, 0]
        c = p[:, 3] - p[:, 0]
        return float(
            np.abs(np.einsum("ij,ij->i", np.cross(a, b), c)).sum() / 6
        )

    m_hard = bifurcation_mesh(h=0.35, blend=0.0)
    m_soft = bifurcation_mesh(h=0.35)  # default blend = r_in / 2
    assert vol(m_soft) > vol(m_hard)
    tags = set(np.asarray(m_soft.facet_tags).tolist())
    assert {1, 2, 4}.issubset(tags)  # inlet + both outlet markers


def test_native_coupling_cone_mesh():
    """mesh_coupling now meshes the truncated coupling cone natively
    (implicit tapered capsule + end-plane clips; the reference meshes an
    OCC loft with gmsh, src/geom/coupling.py:102-183)."""
    import numpy as np

    from cfdtpu.geom.coupling import generate_coupling_geometry, mesh_coupling

    geo = generate_coupling_geometry([0, 0, 0], [1, 0, 0], 1.5, 1.0,
                                     length_ratio=3.0)
    assert np.isclose(geo["length"], 1.5)  # |1.5-1.0| * 3
    m = mesh_coupling([0, 0, 0], [1, 0.3, 0], 1.5, 1.0, length_ratio=3.0)
    assert m.num_cells > 100
    tags = set(np.asarray(m.facet_tags).tolist())
    assert {1, 2, 3}.issubset(tags)  # inlet, outlet, wall


def test_stenosis3d_reference_api_native(tmp_path):
    """generate_stenosis_geometry + mesh_and_export (the reference's
    CadQuery/gmsh pipeline, src/geom/stenosis/stenosis.py:81,337) run
    fully natively: parameter validation matches the reference, the
    mesh carries the INLET/OUTLET/WALL tags, and the exported .msh
    round-trips through cfdtpu.mesh.read_msh."""
    import collections

    import numpy as np
    import pytest

    from cfdtpu.geom.stenosis3d import (
        generate_stenosis_geometry, mesh_and_export,
    )
    from cfdtpu.mesh.msh import read_msh

    g = generate_stenosis_geometry(
        (0, 0, 0), (8, 0, 0), 1.0, 0.9, 0.5, 0.3, 0.5
    )
    # min_radius = (1 - severity) * taper(position)
    assert np.isclose((1 - g.severity) * 0.95, 0.5)
    brep = tmp_path / "s.json"
    msh = tmp_path / "s.msh"
    m = mesh_and_export(g, str(brep), str(msh),
                        artery_mesh_size_from_curvature=12)
    assert m.num_cells > 1000
    tags = collections.Counter(np.asarray(m.facet_tags).tolist())
    assert set(tags) >= {1, 2, 3}  # inlet, outlet, wall
    assert tags[3] > tags[1] > 0 and tags[2] > 0
    assert read_msh(str(msh)).num_cells == m.num_cells
    with pytest.raises(ValueError):
        generate_stenosis_geometry((0, 0, 0), (8, 0, 0), 1.0, 1.2, 0.5, 0.3)
    with pytest.raises(ValueError):
        generate_stenosis_geometry((0, 0, 0), (8, 0, 0), 1.0, 0.9, 0.5, 0.9)
    with pytest.raises(ValueError):
        generate_stenosis_geometry(
            (0, 0, 0), (8, 0, 0), 1.0, 0.9, 0.5, 0.3, 1.5
        )
