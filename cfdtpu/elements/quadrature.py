"""Quadrature rules on reference cells.

Replaces the quadrature machinery ffcx generates for the reference's UFL
forms. Simplex rules are standard symmetric Gauss rules; tensor cells use
tensor-product Gauss-Legendre. All tables are built in float64 numpy at
setup time (never traced).
"""

from __future__ import annotations

import numpy as np

from .cells import CellType, as_cell_type


def _gauss_legendre_01(n: int) -> tuple[np.ndarray, np.ndarray]:
    """Gauss-Legendre points/weights on [0, 1]."""
    x, w = np.polynomial.legendre.leggauss(n)
    return 0.5 * (x + 1.0), 0.5 * w


def _interval(degree: int):
    n = max(1, (degree + 2) // 2)
    x, w = _gauss_legendre_01(n)
    return x.reshape(-1, 1), w


def _triangle(degree: int):
    # Collapsed tensor-product (Duffy) rule: exact for any degree, symmetric
    # rules would use fewer points but these tables are tiny and built once.
    if degree <= 1:
        return np.array([[1 / 3, 1 / 3]]), np.array([0.5])
    if degree == 2:
        a, b = 1 / 6, 2 / 3
        pts = np.array([[a, a], [b, a], [a, b]])
        return pts, np.full(3, 1 / 6)
    if degree == 3:
        # 6-point degree-4 rule (covers degree 3 as well)
        return _triangle(4)
    if degree == 4:
        a1, b1 = 0.445948490915965, 0.108103018168070
        a2, b2 = 0.091576213509771, 0.816847572980459
        w1, w2 = 0.223381589678011, 0.109951743655322
        pts = np.array(
            [
                [a1, a1], [a1, b1], [b1, a1],
                [a2, a2], [a2, b2], [b2, a2],
            ]
        )
        w = np.array([w1, w1, w1, w2, w2, w2]) * 0.5
        return pts, w
    if degree <= 6:
        # 12-point degree-6 symmetric rule
        a1 = 0.063089014491502
        a2 = 0.249286745170910
        a3, b3 = 0.310352451033785, 0.053145049844816
        w1 = 0.025422453185103
        w2 = 0.058393137863189
        w3 = 0.041425537809187
        pts = np.array(
            [
                [a1, a1], [1 - 2 * a1, a1], [a1, 1 - 2 * a1],
                [a2, a2], [1 - 2 * a2, a2], [a2, 1 - 2 * a2],
                [a3, b3], [b3, a3],
                [1 - a3 - b3, a3], [1 - a3 - b3, b3],
                [a3, 1 - a3 - b3], [b3, 1 - a3 - b3],
            ]
        )
        w = np.array([w1] * 3 + [w2] * 3 + [w3] * 6)
        return pts, w
    # Fallback: Duffy-collapsed Gauss rule, exact for arbitrary degree.
    n = (degree + 2) // 2 + 1
    x, wx = _gauss_legendre_01(n)
    # Gauss-Jacobi weight (1-y) absorbed by plain Gauss with extra points.
    pts = []
    wts = []
    for yi, wyi in zip(x, wx):
        for xi, wxi in zip(x, wx):
            pts.append([xi * (1 - yi), yi])
            wts.append(wxi * wyi * (1 - yi))
    return np.array(pts), np.array(wts)


def _tetrahedron(degree: int):
    if degree <= 1:
        return np.array([[0.25, 0.25, 0.25]]), np.array([1 / 6])
    if degree == 2:
        a = 0.585410196624969
        b = 0.138196601125011
        pts = np.array(
            [[a, b, b], [b, a, b], [b, b, a], [b, b, b]]
        )
        return pts, np.full(4, 1 / 24)
    if degree == 3:
        pts = np.array(
            [
                [0.25, 0.25, 0.25],
                [0.5, 1 / 6, 1 / 6],
                [1 / 6, 0.5, 1 / 6],
                [1 / 6, 1 / 6, 0.5],
                [1 / 6, 1 / 6, 1 / 6],
            ]
        )
        w = np.array([-0.8, 0.45, 0.45, 0.45, 0.45]) / 6.0
        return pts, w
    if degree <= 4:
        # Keast degree-4, 14 points
        a1 = 0.0673422422100983
        b1 = 0.3108859192633005
        a2 = 0.7217942490673264
        b2 = 0.0927352503108912
        a3 = 0.4544962958743506
        b3 = 0.0455037041256494
        w1 = 0.1126879257180162 / 6
        w2 = 0.0734930431163619 / 6
        w3 = 0.0425460207770812 / 6
        pts = []
        wts = []
        for (a, b, w) in [(a1, b1, w1), (a2, b2, w2)]:
            pts += [[a, b, b], [b, a, b], [b, b, a], [b, b, b]]
            wts += [w] * 4
        pts += [
            [a3, a3, b3], [a3, b3, a3], [b3, a3, a3],
            [a3, b3, b3], [b3, a3, b3], [b3, b3, a3],
        ]
        wts += [w3] * 6
        return np.array(pts), np.array(wts)
    # Duffy-collapsed fallback for high degree.
    n = (degree + 2) // 2 + 1
    x, wx = _gauss_legendre_01(n)
    pts = []
    wts = []
    for zi, wzi in zip(x, wx):
        for yi, wyi in zip(x, wx):
            for xi, wxi in zip(x, wx):
                u = xi * (1 - yi) * (1 - zi)
                v = yi * (1 - zi)
                pts.append([u, v, zi])
                wts.append(wxi * wyi * wzi * (1 - yi) * (1 - zi) ** 2)
    return np.array(pts), np.array(wts)


def _tensor(degree: int, dim: int):
    n = max(1, (degree + 2) // 2)
    x, w = _gauss_legendre_01(n)
    grids = np.meshgrid(*([x] * dim), indexing="ij")
    pts = np.stack([g.ravel() for g in grids], axis=-1)
    wgrids = np.meshgrid(*([w] * dim), indexing="ij")
    wts = np.ones(pts.shape[0])
    for g in wgrids:
        wts = wts * g.ravel()
    return pts, wts


def quadrature(cell, degree: int) -> tuple[np.ndarray, np.ndarray]:
    """Return (points (nq, dim), weights (nq,)) integrating polynomials of
    the given total degree exactly on the reference cell."""
    cell = as_cell_type(cell)
    if cell == CellType.interval:
        return _interval(degree)
    if cell == CellType.triangle:
        return _triangle(degree)
    if cell == CellType.tetrahedron:
        return _tetrahedron(degree)
    if cell == CellType.quadrilateral:
        return _tensor(degree, 2)
    if cell == CellType.hexahedron:
        return _tensor(degree, 3)
    raise ValueError(f"unsupported cell {cell}")
