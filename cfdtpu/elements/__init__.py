from .cells import CellType, cell_dim, cell_facets, cell_edges, cell_vertices
from .quadrature import quadrature
from .lagrange import LagrangeElement

__all__ = [
    "CellType",
    "cell_dim",
    "cell_facets",
    "cell_edges",
    "cell_vertices",
    "quadrature",
    "LagrangeElement",
]
