"""Native `main.py tree` pipeline: GXL -> implicit 3D mesh -> .msh.

The reference's tree command requires the VascuSynth binary plus
CadQuery/gmsh (src/geom/tree/main.py:11-57, graph_to_mesh.py:186-401);
here the cached-GXL path plus the implicit capsule-union mesher produce
a tagged vessels.msh entirely in-framework, and write_msh/read_msh
round-trip it.
"""

import os
import types

import numpy as np
import pytest


GXL = """<gxl><graph id="t">
<node id="n0"><attr name=" position"><tup>
  <float>0</float><float>0</float><float>0</float></tup></attr></node>
<node id="n1"><attr name=" position"><tup>
  <float>6</float><float>0</float><float>0</float></tup></attr></node>
<node id="n2"><attr name=" position"><tup>
  <float>10</float><float>3</float><float>0</float></tup></attr></node>
<node id="n3"><attr name=" position"><tup>
  <float>10</float><float>-3</float><float>1</float></tup></attr></node>
<edge from="n0" to="n1"><attr name=" radius">
  <float>0.1</float></attr></edge>
<edge from="n1" to="n2"><attr name=" radius">
  <float>0.08</float></attr></edge>
<edge from="n1" to="n3"><attr name=" radius">
  <float>0.08</float></attr></edge>
</graph></gxl>
"""


@pytest.fixture
def workdir(tmp_path):
    (tmp_path / "tree_structure.xml").write_text(GXL)
    return tmp_path


def test_tree_cli_meshes_natively(workdir, tmp_path, capsys):
    from cfdtpu.geom.tree.main import run

    cfg = tmp_path / "tree.yaml"
    cfg.write_text(
        f"workdir: {workdir}\n"
        "tree_params:\n"
        "  n_terminal: 2\n"
        "  volume_mL: 100.0\n"
        "  mesh_resolution: 0.45\n"
    )
    out = tmp_path / "vessels.msh"
    args = types.SimpleNamespace(config=str(cfg), output=str(out))
    rc = run(args)
    assert rc == 0, capsys.readouterr().out
    assert out.exists()

    from cfdtpu.mesh.msh import read_msh

    mesh = read_msh(str(out))
    assert str(mesh.cell_type) == "tetrahedron"
    assert mesh.num_cells > 100
    # inlet=1, two terminal outlets=2, walls=3
    assert (mesh.facet_tags == 1).sum() > 0
    assert (mesh.facet_tags == 2).sum() > 0
    assert (mesh.facet_tags == 3).sum() > 0


def test_write_msh_roundtrip_2d(tmp_path):
    from cfdtpu.mesh.structured import create_unit_square
    from cfdtpu.mesh.msh import read_msh, write_msh

    m = create_unit_square(4)
    m.facet_tags[:] = 0
    m.mark_boundary_facets(lambda x: x[0] < 1e-12, 2)
    path = tmp_path / "sq.msh"
    write_msh(m, str(path))
    m2 = read_msh(str(path), gdim=2)
    assert m2.num_cells == m.num_cells
    np.testing.assert_allclose(
        np.sort(m2.points, axis=0), np.sort(m.points, axis=0),
        atol=1e-12,
    )
    assert (m2.facet_tags == 2).sum() == (m.facet_tags == 2).sum()
    assert (m2.cell_tags == 4).all()
