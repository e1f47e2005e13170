"""Lagrange reference elements with entity-ordered nodes.

Replaces basix tabulation (reference: /root/reference/src/solverBase.py:104-142
builds "Lagrange" elements of arbitrary degree). We build the nodal basis
numerically: choose a polynomial (monomial) basis, evaluate its Vandermonde
matrix at the lattice nodes, invert it once in float64 numpy, and tabulate
values / gradients / second derivatives at arbitrary points as small dense
matmuls. Tables are tiny static constants baked into jitted kernels.

Node ordering is entity-blocked (vertices, then edge interiors following
`cell_edges`, then face interiors, then cell interior) so dofmap
construction and boundary-dof location can work entity-wise.
"""

from __future__ import annotations

import itertools
from dataclasses import dataclass, field

import numpy as np

from .cells import (
    CellType,
    as_cell_type,
    cell_dim,
    cell_edges,
    cell_facets,
    cell_vertices,
    is_simplex,
)


def _simplex_monomials(dim: int, degree: int) -> list[tuple[int, ...]]:
    return [
        e
        for e in itertools.product(range(degree + 1), repeat=dim)
        if sum(e) <= degree
    ]


def _tensor_monomials(dim: int, degree: int) -> list[tuple[int, ...]]:
    return list(itertools.product(range(degree + 1), repeat=dim))


def _eval_monomials(exps: list[tuple[int, ...]], pts: np.ndarray) -> np.ndarray:
    """(npts, nmono) monomial values."""
    out = np.ones((pts.shape[0], len(exps)))
    for j, e in enumerate(exps):
        for d, p in enumerate(e):
            if p:
                out[:, j] *= pts[:, d] ** p
    return out


def _eval_monomial_derivs(
    exps: list[tuple[int, ...]], pts: np.ndarray, order: int
) -> np.ndarray:
    """First (order=1) or second (order=2) derivatives of monomials.

    order=1 -> (npts, nmono, dim); order=2 -> (npts, nmono, dim, dim).
    """
    dim = pts.shape[1]
    if order == 1:
        out = np.zeros((pts.shape[0], len(exps), dim))
        for j, e in enumerate(exps):
            for d in range(dim):
                if e[d] == 0:
                    continue
                val = np.full(pts.shape[0], float(e[d]))
                for dd, p in enumerate(e):
                    q = p - (1 if dd == d else 0)
                    if q:
                        val *= pts[:, dd] ** q
                out[:, j, d] = val
        return out
    assert order == 2
    out = np.zeros((pts.shape[0], len(exps), dim, dim))
    for j, e in enumerate(exps):
        for d1 in range(dim):
            for d2 in range(dim):
                c = e[d1] * (e[d2] - (1 if d1 == d2 else 0))
                if c == 0:
                    continue
                val = np.full(pts.shape[0], float(c))
                for dd, p in enumerate(e):
                    q = p - (1 if dd == d1 else 0) - (1 if dd == d2 else 0)
                    if q:
                        val *= pts[:, dd] ** q
                out[:, j, d1, d2] = val
    return out


def _lattice_nodes(cell: CellType, degree: int):
    """Entity-ordered lattice nodes.

    Returns (nodes (nb, dim), entity_dofs) where entity_dofs[d] is a list
    (one entry per entity of dimension d) of local dof index lists.
    """
    cell = as_cell_type(cell)
    dim = cell_dim(cell)
    verts = cell_vertices(cell)
    edges = cell_edges(cell)
    facets = cell_facets(cell)

    nodes: list[np.ndarray] = []
    entity_dofs: dict[int, list[list[int]]] = {
        d: [] for d in range(dim + 1)
    }

    # vertices
    for v in verts:
        entity_dofs[0].append([len(nodes)])
        nodes.append(v)

    if degree >= 2 and dim >= 1:
        # edge interiors, parametrized from edge vertex 0 to vertex 1
        for (a, b) in edges:
            dofs = []
            for i in range(1, degree):
                t = i / degree
                dofs.append(len(nodes))
                nodes.append((1 - t) * verts[a] + t * verts[b])
            if dim == 1:
                entity_dofs[1].append(dofs)  # interval interior
            else:
                entity_dofs[1].append(dofs)
    elif dim >= 2:
        for _ in edges:
            entity_dofs[1].append([])

    if dim >= 2:
        # 2D: cell interior; 3D: facet (face) interiors then cell interior
        def _face_interior(face_verts: np.ndarray, simplex_face: bool):
            pts = []
            if simplex_face:
                # barycentric lattice strictly inside the triangle face
                for i in range(1, degree):
                    for j in range(1, degree - i):
                        l1, l2 = i / degree, j / degree
                        l0 = 1 - l1 - l2
                        pts.append(
                            l0 * face_verts[0]
                            + l1 * face_verts[1]
                            + l2 * face_verts[2]
                        )
            else:
                # tensor face: vertices ordered (00, 10, 01, 11)
                for j in range(1, degree):
                    for i in range(1, degree):
                        s, t = i / degree, j / degree
                        pts.append(
                            (1 - s) * (1 - t) * face_verts[0]
                            + s * (1 - t) * face_verts[1]
                            + (1 - s) * t * face_verts[2]
                            + (s * t) * face_verts[3]
                            if len(face_verts) == 4
                            else None
                        )
            return pts

        if dim == 2:
            simplex = is_simplex(cell)
            if simplex:
                face_pts = _face_interior(verts, True)
            else:
                face_pts = []
                for j in range(1, degree):
                    for i in range(1, degree):
                        face_pts.append(
                            np.array([i / degree, j / degree], dtype=float)
                        )
            dofs = []
            for p in face_pts:
                dofs.append(len(nodes))
                nodes.append(np.asarray(p, dtype=float))
            entity_dofs[2].append(dofs)
        else:
            for f in facets:
                fv = verts[list(f)]
                simplex_face = len(f) == 3
                if simplex_face:
                    pts = _face_interior(fv, True)
                else:
                    pts = []
                    for j in range(1, degree):
                        for i in range(1, degree):
                            s, t = i / degree, j / degree
                            pts.append(
                                (1 - s) * (1 - t) * fv[0]
                                + s * (1 - t) * fv[1]
                                + (1 - s) * t * fv[2]
                                + s * t * fv[3]
                            )
                dofs = []
                for p in pts:
                    dofs.append(len(nodes))
                    nodes.append(np.asarray(p, dtype=float))
                entity_dofs[2].append(dofs)
            # cell interior (3D)
            interior = []
            if is_simplex(cell):
                for i in range(1, degree):
                    for j in range(1, degree - i):
                        for k in range(1, degree - i - j):
                            interior.append(
                                np.array(
                                    [i / degree, j / degree, k / degree]
                                )
                            )
            else:
                for k in range(1, degree):
                    for j in range(1, degree):
                        for i in range(1, degree):
                            interior.append(
                                np.array(
                                    [i / degree, j / degree, k / degree]
                                )
                            )
            dofs = []
            for p in interior:
                dofs.append(len(nodes))
                nodes.append(p)
            entity_dofs[3].append(dofs)

    return np.array(nodes, dtype=float), entity_dofs


@dataclass(frozen=True)
class LagrangeElement:
    """Scalar Lagrange element on a reference cell.

    Attributes:
        cell: reference cell type
        degree: polynomial degree (>= 1)
        nodes: (nb, dim) nodal points, entity-ordered
        entity_dofs: entity dim -> per-entity local dof lists
    """

    cell: CellType
    degree: int
    nodes: np.ndarray = field(repr=False)
    entity_dofs: dict = field(repr=False)
    _coeffs: np.ndarray = field(repr=False)
    _exps: tuple = field(repr=False)

    @staticmethod
    def create(cell, degree: int) -> "LagrangeElement":
        cell = as_cell_type(cell)
        if degree < 1:
            raise ValueError("degree must be >= 1")
        dim = cell_dim(cell)
        exps = (
            _simplex_monomials(dim, degree)
            if is_simplex(cell)
            else _tensor_monomials(dim, degree)
        )
        nodes, entity_dofs = _lattice_nodes(cell, degree)
        if len(nodes) != len(exps):
            raise RuntimeError(
                f"node/monomial count mismatch for {cell} degree {degree}: "
                f"{len(nodes)} vs {len(exps)}"
            )
        V = _eval_monomials(exps, nodes)
        coeffs = np.linalg.inv(V)  # (nmono, nb): phi_j = sum_m C[m, j] x^m
        return LagrangeElement(
            cell=cell,
            degree=degree,
            nodes=nodes,
            entity_dofs=entity_dofs,
            _coeffs=coeffs,
            _exps=tuple(exps),
        )

    @property
    def ndofs(self) -> int:
        return self.nodes.shape[0]

    @property
    def dim(self) -> int:
        return cell_dim(self.cell)

    def tabulate(self, points: np.ndarray, nderiv: int = 1):
        """Tabulate basis at points (npts, dim).

        Returns (phi (npts, nb), dphi (npts, nb, dim)[, d2phi (npts, nb,
        dim, dim)]) as float64 numpy arrays.
        """
        points = np.atleast_2d(np.asarray(points, dtype=float))
        exps = list(self._exps)
        phi = _eval_monomials(exps, points) @ self._coeffs
        out = [phi]
        if nderiv >= 1:
            dm = _eval_monomial_derivs(exps, points, 1)  # (npts, nm, dim)
            dphi = np.einsum("pmd,mb->pbd", dm, self._coeffs)
            out.append(dphi)
        if nderiv >= 2:
            d2m = _eval_monomial_derivs(exps, points, 2)
            d2phi = np.einsum("pmde,mb->pbde", d2m, self._coeffs)
            out.append(d2phi)
        return tuple(out)

    def facet_dofs(self, facet_index: int) -> list[int]:
        """Local dofs whose nodes lie on the given local facet (closure)."""
        facets = cell_facets(self.cell)
        edges = cell_edges(self.cell)
        fverts = set(facets[facet_index])
        dofs: list[int] = []
        for v in facets[facet_index]:
            dofs.extend(self.entity_dofs[0][v])
        if self.dim >= 2:
            for ei, (a, b) in enumerate(edges):
                if {a, b} <= fverts:
                    dofs.extend(self.entity_dofs[1][ei])
        if self.dim == 3:
            dofs.extend(self.entity_dofs[2][facet_index])
        elif self.dim == 2:
            pass  # cell-interior dofs are never on a facet
        return dofs
