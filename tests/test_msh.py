"""Gmsh .msh reader tests (handwritten v2.2 and v4.1 files)."""

import numpy as np
import pytest

from cfdtpu.mesh.msh import read_msh

MSH22 = """$MeshFormat
2.2 0 8
$EndMeshFormat
$Nodes
4
1 0 0 0
2 1 0 0
3 1 1 0
4 0 1 0
$EndNodes
$Elements
6
1 1 2 10 1 1 2
2 1 2 20 2 2 3
3 1 2 30 3 3 4
4 1 2 40 4 4 1
5 2 2 1 1 1 2 3
6 2 2 1 1 1 3 4
$EndElements
"""

MSH41 = """$MeshFormat
4.1 0 8
$EndMeshFormat
$Entities
0 4 1 0
1 0 0 0 1 0 0 1 10 0
2 1 0 0 1 1 0 1 20 0
3 1 1 0 0 1 0 1 30 0
4 0 1 0 0 0 0 1 40 0
1 0 0 0 1 1 0 1 1 4 1 2 3 4
$EndEntities
$Nodes
1 4 1 4
1 1 0 4
1
2
3
4
0 0 0
1 0 0
1 1 0
0 1 0
$EndNodes
$Elements
5 6 1 6
1 1 1 1
1 1 2
1 2 1 1
2 2 3
1 3 1 1
3 3 4
1 4 1 1
4 4 1
2 1 2 2
5 1 2 3
6 1 3 4
$EndElements
"""


@pytest.mark.parametrize("content,name", [(MSH22, "v22"), (MSH41, "v41")])
def test_read_square(tmp_path, content, name):
    p = tmp_path / f"square_{name}.msh"
    p.write_text(content)
    m = read_msh(str(p))
    assert m.num_points == 4
    assert m.num_cells == 2
    assert str(m.cell_type) == "triangle"
    assert m.gdim == 2
    assert len(m.facets) == 4
    # tags: v2.2 uses per-element physical tags; v4.1 per-entity
    tags = sorted(m.facet_tags.tolist())
    assert tags == [10, 20, 30, 40]
    # tagged facet lookup matches geometry
    bottom = m.tagged_facets(10)
    assert len(bottom) == 1
    mid = m.midpoints_of_facets(bottom)[0]
    assert np.allclose(mid, [0.5, 0.0])


def test_read_msh_quad(tmp_path):
    content = """$MeshFormat
2.2 0 8
$EndMeshFormat
$Nodes
4
1 0 0 0
2 1 0 0
3 1 1 0
4 0 1 0
$EndNodes
$Elements
1
1 3 2 1 1 1 2 3 4
$EndElements
"""
    p = tmp_path / "quad.msh"
    p.write_text(content)
    m = read_msh(str(p))
    assert str(m.cell_type) == "quadrilateral"
    # gmsh CCW (1,2,3,4) -> tensor ordering: cells = [0, 1, 3, 2]
    assert m.cells.tolist() == [[0, 1, 3, 2]]
