"""Element and quadrature unit tests (the reference has no test suite —
SURVEY.md §4 — these lock in the FEM core the reference gets from basix)."""

import numpy as np
import pytest

from cfdtpu.elements import LagrangeElement, quadrature

CASES = [
    ("triangle", 1), ("triangle", 2), ("triangle", 3),
    ("tetrahedron", 1), ("tetrahedron", 2),
    ("quadrilateral", 1), ("quadrilateral", 2),
    ("hexahedron", 1), ("hexahedron", 2),
]

VOLUMES = {
    "triangle": 0.5, "tetrahedron": 1 / 6,
    "quadrilateral": 1.0, "hexahedron": 1.0,
}


@pytest.mark.parametrize("cell,deg", CASES)
def test_partition_of_unity(cell, deg):
    el = LagrangeElement.create(cell, deg)
    xi, _ = quadrature(cell, 4)
    phi, dphi = el.tabulate(xi)
    assert np.allclose(phi.sum(1), 1.0, atol=1e-12)
    assert np.allclose(dphi.sum(1), 0.0, atol=1e-11)


@pytest.mark.parametrize("cell,deg", CASES)
def test_nodal_property(cell, deg):
    el = LagrangeElement.create(cell, deg)
    (phi,) = el.tabulate(el.nodes, nderiv=0)
    assert np.allclose(phi, np.eye(el.ndofs), atol=1e-9)


@pytest.mark.parametrize("cell", list(VOLUMES))
@pytest.mark.parametrize("deg", [1, 2, 3, 4, 5])
def test_quadrature_volume(cell, deg):
    _, w = quadrature(cell, deg)
    assert np.isclose(w.sum(), VOLUMES[cell], rtol=1e-12)


@pytest.mark.parametrize("cell", ["triangle", "quadrilateral"])
def test_quadrature_exactness(cell):
    # integrate x^a y^b exactly for a+b <= deg
    for deg in range(1, 5):
        xi, w = quadrature(cell, deg)
        for a in range(deg + 1):
            for b in range(deg + 1 - a):
                val = (w * xi[:, 0] ** a * xi[:, 1] ** b).sum()
                if cell == "quadrilateral":
                    exact = 1.0 / ((a + 1) * (b + 1))
                else:
                    # int over unit triangle = a! b! / (a+b+2)!
                    from math import factorial

                    exact = (
                        factorial(a) * factorial(b) / factorial(a + b + 2)
                    )
                assert np.isclose(val, exact, rtol=1e-10), (cell, deg, a, b)


@pytest.mark.parametrize("cell,deg", [("triangle", 2), ("triangle", 3)])
def test_second_derivatives(cell, deg):
    el = LagrangeElement.create(cell, deg)
    pts = np.array([[0.25, 0.3], [0.1, 0.6]])
    phi, dphi, d2phi = el.tabulate(pts, nderiv=2)
    # d2 of a quadratic interpolant of x^2: coefficient check via
    # interpolation of f(x, y) = x^2 + x*y
    f = el.nodes[:, 0] ** 2 + el.nodes[:, 0] * el.nodes[:, 1]
    hess = np.einsum("b,pbde->pde", f, d2phi)
    expected = np.array([[2.0, 1.0], [1.0, 0.0]])
    assert np.allclose(hess, expected[None], atol=1e-9)
