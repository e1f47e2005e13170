"""Reference cell topology.

Replaces the role of basix cell definitions (reference:
/root/reference/src/solverBase.py:5-7 uses basix CellType/element). We define
our own reference cells with a fixed local numbering; mesh importers convert
external orderings (e.g. gmsh) into this one.

Conventions:
- simplex vertices: unit right simplex, vertex 0 at origin.
- tensor cells use lexicographic ("tensor") vertex ordering like basix,
  NOT the counterclockwise gmsh ordering.
- facet i of a simplex is the facet opposite vertex i.
"""

from __future__ import annotations

import enum

import numpy as np


class CellType(enum.Enum):
    interval = "interval"
    triangle = "triangle"
    quadrilateral = "quadrilateral"
    tetrahedron = "tetrahedron"
    hexahedron = "hexahedron"

    def __str__(self) -> str:  # so f"{cell}" gives the plain name
        return self.value


def as_cell_type(cell) -> CellType:
    if isinstance(cell, CellType):
        return cell
    return CellType(str(cell))


_VERTICES = {
    CellType.interval: np.array([[0.0], [1.0]]),
    CellType.triangle: np.array([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]]),
    CellType.quadrilateral: np.array(
        [[0.0, 0.0], [1.0, 0.0], [0.0, 1.0], [1.0, 1.0]]
    ),
    CellType.tetrahedron: np.array(
        [[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]
    ),
    CellType.hexahedron: np.array(
        [
            [0.0, 0.0, 0.0],
            [1.0, 0.0, 0.0],
            [0.0, 1.0, 0.0],
            [1.0, 1.0, 0.0],
            [0.0, 0.0, 1.0],
            [1.0, 0.0, 1.0],
            [0.0, 1.0, 1.0],
            [1.0, 1.0, 1.0],
        ]
    ),
}

# Edges as (v0, v1) local vertex pairs.
_EDGES = {
    CellType.interval: [],
    CellType.triangle: [(1, 2), (0, 2), (0, 1)],
    CellType.quadrilateral: [(0, 1), (0, 2), (1, 3), (2, 3)],
    CellType.tetrahedron: [(2, 3), (1, 3), (1, 2), (0, 3), (0, 2), (0, 1)],
    CellType.hexahedron: [
        (0, 1), (0, 2), (0, 4), (1, 3), (1, 5), (2, 3),
        (2, 6), (3, 7), (4, 5), (4, 6), (5, 7), (6, 7),
    ],
}

# Facets as tuples of local vertices. For simplices facet i is opposite
# vertex i; tensor-cell facets follow basix ordering.
_FACETS = {
    CellType.interval: [(0,), (1,)],
    CellType.triangle: [(1, 2), (0, 2), (0, 1)],
    CellType.quadrilateral: [(0, 1), (0, 2), (1, 3), (2, 3)],
    CellType.tetrahedron: [(1, 2, 3), (0, 2, 3), (0, 1, 3), (0, 1, 2)],
    CellType.hexahedron: [
        (0, 1, 2, 3),
        (0, 1, 4, 5),
        (0, 2, 4, 6),
        (1, 3, 5, 7),
        (2, 3, 6, 7),
        (4, 5, 6, 7),
    ],
}

_FACET_CELL = {
    CellType.interval: None,
    CellType.triangle: CellType.interval,
    CellType.quadrilateral: CellType.interval,
    CellType.tetrahedron: CellType.triangle,
    CellType.hexahedron: CellType.quadrilateral,
}

_DIM = {
    CellType.interval: 1,
    CellType.triangle: 2,
    CellType.quadrilateral: 2,
    CellType.tetrahedron: 3,
    CellType.hexahedron: 3,
}

_SIMPLEX = {
    CellType.interval: True,
    CellType.triangle: True,
    CellType.tetrahedron: True,
    CellType.quadrilateral: False,
    CellType.hexahedron: False,
}


def cell_dim(cell: CellType) -> int:
    return _DIM[as_cell_type(cell)]


def cell_vertices(cell: CellType) -> np.ndarray:
    """Reference vertex coordinates, shape (n_vertices, dim)."""
    return _VERTICES[as_cell_type(cell)].copy()


def cell_edges(cell: CellType) -> list[tuple[int, ...]]:
    return list(_EDGES[as_cell_type(cell)])


def cell_facets(cell: CellType) -> list[tuple[int, ...]]:
    return list(_FACETS[as_cell_type(cell)])


def facet_cell_type(cell: CellType) -> CellType:
    return _FACET_CELL[as_cell_type(cell)]


def is_simplex(cell: CellType) -> bool:
    return _SIMPLEX[as_cell_type(cell)]


def num_cell_vertices(cell: CellType) -> int:
    return len(_VERTICES[as_cell_type(cell)])
