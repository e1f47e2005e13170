"""Mesh topology + function-space dofmap tests."""

import numpy as np
import pytest

from cfdtpu.assembly import FacetQuadrature
from cfdtpu.mesh import (
    create_box,
    create_rectangle,
    create_unit_cube,
    create_unit_square,
)
from cfdtpu.spaces import FunctionSpace


def test_unit_square_counts():
    m = create_unit_square(4, 4)
    assert m.num_points == 25
    assert m.num_cells == 32
    assert len(m.facets) == 16


def test_unit_cube_counts():
    m = create_unit_cube(3)
    assert m.num_points == 4 ** 3
    assert m.num_cells == 6 * 27
    assert len(m.facets) == 2 * 9 * 6


def test_outward_normals_2d():
    m = create_unit_square(5, 3)
    pts = m.points[m.facets]
    t = pts[:, 1] - pts[:, 0]
    n = np.stack([t[:, 1], -t[:, 0]], -1)
    cc = m.points[m.cells[m.facet_cells]].mean(1)
    fc = pts.mean(1)
    assert ((n * (fc - cc)).sum(1) > 0).all()


def test_outward_normals_3d():
    m = create_unit_cube(2)
    pts = m.points[m.facets]
    n = np.cross(pts[:, 1] - pts[:, 0], pts[:, 2] - pts[:, 0])
    cc = m.points[m.cells[m.facet_cells]].mean(1)
    fc = pts.mean(1)
    assert ((n * (fc - cc)).sum(1) > 0).all()


def test_facet_tags():
    m = create_unit_square(4, 4)
    m.mark_boundary_facets(lambda x: np.isclose(x[0], 0.0), 2)
    m.mark_boundary_facets(lambda x: np.isclose(x[0], 1.0), 3)
    assert len(m.tagged_facets(2)) == 4
    assert len(m.tagged_facets(3)) == 4
    assert len(m.tagged_facets([2, 3])) == 8


@pytest.mark.parametrize("deg,expected", [(1, 25), (2, 25 + 56), (3, 25 + 2 * 56 + 32)])
def test_p123_dof_counts(deg, expected):
    # 4x4 triangulated unit square: 25 vertices, 56 edges, 32 cells
    m = create_unit_square(4, 4)
    V = FunctionSpace(m, deg)
    assert V.num_dofs == expected


def test_dof_coords_shared_edges():
    """P2 edge dofs must agree across neighbouring cells: every scalar dof
    has exactly one coordinate."""
    m = create_unit_square(3, 3)
    V = FunctionSpace(m, 2)
    # rebuild coords cell-by-cell and check consistency
    from cfdtpu.elements import LagrangeElement

    geom = LagrangeElement.create(m.cell_type, 1)
    (N,) = geom.tabulate(V.element.nodes, nderiv=0)
    coords = np.einsum("bv,cvg->cbg", N, m.points[m.cells])
    seen = {}
    for c in range(m.num_cells):
        for b in range(V.element.ndofs):
            d = V.dofmap[c, b]
            xy = tuple(np.round(coords[c, b], 12))
            assert seen.setdefault(d, xy) == xy


def test_facet_closure_dofs():
    m = create_unit_square(4, 4)
    V = FunctionSpace(m, 2)
    left = m.locate_boundary_facets(lambda x: np.isclose(x[0], 0.0))
    dofs = V.facet_closure_dofs(left)
    # 5 vertices + 4 edge midpoints on the left edge
    assert len(dofs) == 9
    assert np.allclose(V.dof_coords[dofs][:, 0], 0.0)


def test_interpolate_vector():
    m = create_unit_square(4, 4)
    V = FunctionSpace(m, 1, 2)
    g = V.interpolate(lambda x: np.vstack([x[0] + x[1], 2 * x[1]]))
    assert np.allclose(g[:, 0], V.dof_coords.sum(1))
    assert np.allclose(g[:, 1], 2 * V.dof_coords[:, 1])


def test_facet_quadrature_measures():
    m = create_unit_square(6, 6)
    fq = FacetQuadrature(m, np.arange(len(m.facets)), 3)
    assert np.isclose(fq.facet_measure().sum(), 4.0)
    m3 = create_unit_cube(3)
    fq3 = FacetQuadrature(m3, np.arange(len(m3.facets)), 3)
    assert np.isclose(fq3.facet_measure().sum(), 6.0)
    x, n, dS = fq3.geometry()
    # normals are unit
    assert np.allclose(np.linalg.norm(n, axis=-1), 1.0)


def test_quad_mesh():
    m = create_rectangle((0, 0), (2, 1), (8, 4), cell_type="quadrilateral")
    assert m.num_cells == 32
    fq = FacetQuadrature(m, np.arange(len(m.facets)), 3)
    assert np.isclose(fq.facet_measure().sum(), 6.0)


def test_hex_mesh():
    m = create_box((0, 0, 0), (1, 1, 2), (2, 2, 4), cell_type="hexahedron")
    assert m.num_cells == 16
    fq = FacetQuadrature(m, np.arange(len(m.facets)), 3)
    assert np.isclose(fq.facet_measure().sum(), 2 * 1 + 4 * 2)


@pytest.mark.parametrize("deg", [3, 4])
def test_3d_high_degree_dof_counts(deg):
    """Tet face-interior dofs (k >= 3): the entity sum must close, and
    on a structured cube the total must equal the tensor lattice count
    ((n*deg+1)^3) — a strong global check of the shared-face numbering."""
    n = 3 if deg == 3 else 2
    m = create_unit_cube(n, n, n)
    V = FunctionSpace(m, deg)
    n_e = deg - 1
    n_f = (deg - 1) * (deg - 2) // 2
    n_i = max(0, (deg - 1) * (deg - 2) * (deg - 3) // 6)
    assert V.num_dofs == (
        m.num_points + n_e * V.num_edges + n_f * V.num_faces
        + n_i * m.num_cells
    )
    assert V.num_dofs == (n * deg + 1) ** 3


@pytest.mark.parametrize("deg", [3, 4])
def test_3d_high_degree_interpolation_exact(deg):
    """Degree-k interpolation must be exact for degree-k polynomials —
    this fails if two cells disagree on a shared face dof's identity or
    lattice position (the orientation permutation)."""
    m = create_unit_cube(2, 2, 2)
    V = FunctionSpace(m, deg)
    f = lambda x: x[0] ** deg + 2 * x[1] ** (deg - 1) * x[2] - x[0] * x[1]
    vals = V.interpolate(f)
    pts = np.array([[0.3, 0.2, 0.1], [0.1, 0.55, 0.2]])
    (phi,) = V.element.tabulate(pts, nderiv=0)
    for c in range(m.num_cells):
        verts = m.points[m.cells[c]]
        for pi, p in enumerate(pts):
            x = verts[0] + (verts[1:4] - verts[0]).T @ p
            uh = phi[pi] @ vals[V.dofmap[c]]
            assert abs(uh - f(x)) < 1e-9


def _rotated_hex_box(n, seed=0):
    """Structured hex box with each cell's reference frame replaced by a
    random cube rotation (the 24 orientation-preserving symmetries in
    the tensor vertex numbering v = x + 2y + 4z). Geometry is unchanged,
    but neighbouring cells now see shared quad faces under nontrivial
    symmetries — the case the face-interior orientation permutation
    must get right (a plain structured box only exercises the identity)."""
    import itertools

    from cfdtpu.mesh.mesh import Mesh

    m = create_box((0, 0, 0), (1, 1, 1), (n, n, n),
                   cell_type="hexahedron")
    coords = np.array([[v & 1, (v >> 1) & 1, (v >> 2) & 1]
                       for v in range(8)])
    rots = []
    for axes in itertools.permutations(range(3)):
        for signs in itertools.product((1, -1), repeat=3):
            R = np.zeros((3, 3))
            for i, (a, s) in enumerate(zip(axes, signs)):
                R[i, a] = s
            if np.linalg.det(R) < 0:
                continue
            # local index l sits at reference coord c_l; the same
            # physical point in the OLD frame is R^{-1}(c_l) (with
            # sign flips as x -> 1 - x)
            perm = []
            for c in coords:
                old = R.T @ (c - 0.5) + 0.5
                old = np.round(old).astype(int)
                perm.append(old[0] + 2 * old[1] + 4 * old[2])
            rots.append(np.array(perm))
    assert len(rots) == 24
    rng = np.random.default_rng(seed)
    new_cells = np.stack([
        m.cells[c][rots[rng.integers(24)]] for c in range(m.num_cells)
    ])
    return Mesh(points=m.points.copy(), cells=new_cells,
                cell_type="hexahedron")


@pytest.mark.parametrize("deg", [2, 3, 4])
def test_hex_high_degree_dof_counts(deg):
    """Hex face-interior dofs (k >= 2 on quad faces: Q2's face centers
    land here too): entity sum must close, and on a structured box the
    total must equal the tensor lattice count ((n*deg+1)^3) — a strong
    global check of the shared-face numbering, under randomly rotated
    per-cell reference frames."""
    n = 2
    m = _rotated_hex_box(n, seed=deg)
    V = FunctionSpace(m, deg)
    n_e = deg - 1
    n_f = (deg - 1) ** 2
    n_i = (deg - 1) ** 3
    assert V.num_dofs == (
        m.num_points + n_e * V.num_edges + n_f * V.num_faces
        + n_i * m.num_cells
    )
    assert V.num_dofs == (n * deg + 1) ** 3


@pytest.mark.parametrize("deg", [2, 3, 4])
def test_hex_high_degree_interpolation_exact(deg):
    """Degree-k interpolation on hexes must be exact for degree-k
    polynomials — fails if two cells disagree on a shared quad-face
    dof's identity or lattice position under any of the 8 face
    symmetries."""
    from cfdtpu.elements import LagrangeElement

    m = _rotated_hex_box(2, seed=10 + deg)
    V = FunctionSpace(m, deg)
    f = lambda x: x[0] ** deg + 2 * x[1] ** (deg - 1) * x[2] - x[0] * x[1]
    vals = V.interpolate(f)
    pts = np.array([[0.3, 0.2, 0.1], [0.1, 0.55, 0.2], [0.7, 0.7, 0.9]])
    (phi,) = V.element.tabulate(pts, nderiv=0)
    geom = LagrangeElement.create(m.cell_type, 1)
    (N,) = geom.tabulate(pts, nderiv=0)
    for c in range(m.num_cells):
        verts = m.points[m.cells[c]]
        for pi, p in enumerate(pts):
            x = N[pi] @ verts
            uh = phi[pi] @ vals[V.dofmap[c]]
            assert abs(uh - f(x)) < 1e-9


def test_hex_face_dof_coords_consistent():
    """Every hex k=3 face dof gets one coordinate regardless of which
    neighbour wrote it (tensor-face symmetry of the numbering)."""
    from cfdtpu.elements import LagrangeElement

    m = _rotated_hex_box(3, seed=7)
    V = FunctionSpace(m, 3)
    geom = LagrangeElement.create(m.cell_type, 1)
    (N,) = geom.tabulate(V.element.nodes, nderiv=0)
    coords = np.einsum("bv,cvg->cbg", N, m.points[m.cells])
    err = np.abs(
        V.dof_coords[V.dofmap.reshape(-1)] - coords.reshape(-1, 3)
    ).max()
    assert err < 1e-12


def test_3d_face_dof_coords_consistent():
    """Every P3 face dof gets one coordinate regardless of which
    neighbour wrote it (barycentric symmetry of the numbering)."""
    from cfdtpu.elements import LagrangeElement

    m = create_unit_cube(3, 3, 3)
    V = FunctionSpace(m, 3)
    geom = LagrangeElement.create(m.cell_type, 1)
    (N,) = geom.tabulate(V.element.nodes, nderiv=0)
    coords = np.einsum("bv,cvg->cbg", N, m.points[m.cells])
    err = np.abs(
        V.dof_coords[V.dofmap.reshape(-1)] - coords.reshape(-1, 3)
    ).max()
    assert err < 1e-12
