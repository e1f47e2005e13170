"""Function spaces: dofmaps, dof coordinates, boundary dof location.

Replaces dolfinx functionspace + dofmap (reference:
/root/reference/src/solverBase.py:104-142). Scalar Lagrange dofmaps are
entity-numbered (vertices, then edge blocks, then face blocks, then cell
interiors). Vector-valued spaces share the scalar dofmap; a vector Function
is an array of shape (num_dofs, num_components), which keeps JAX kernels
free of interleaving arithmetic.
"""

from __future__ import annotations

import numpy as np

from ..elements import LagrangeElement
from ..elements.cells import cell_edges, cell_facets
from ..mesh import Mesh


class FunctionSpace:
    """Lagrange function space of a given degree on a mesh.

    Attributes:
        mesh: the Mesh
        element: scalar LagrangeElement
        num_components: 1 for scalar spaces, d for vector spaces
        dofmap: (num_cells, ndofs_per_cell) int32 scalar dof indices
        num_dofs: number of scalar dofs
        dof_coords: (num_dofs, gdim) coordinates of the nodal points
    """

    def __init__(self, mesh: Mesh, degree: int, num_components: int = 1):
        self.mesh = mesh
        self.element = LagrangeElement.create(mesh.cell_type, degree)
        self.num_components = int(num_components)
        self._build_dofmap()
        self._build_dof_coords()

    @property
    def degree(self) -> int:
        return self.element.degree

    @property
    def num_global_dofs(self) -> int:
        """Total dofs counting components (reference counts this way in
        /root/reference/src/scenario.py:151-160)."""
        return self.num_dofs * self.num_components

    def _build_dofmap(self) -> None:
        mesh, el = self.mesh, self.element
        k = el.degree
        cells = mesh.cells
        nc = cells.shape[0]
        nb = el.ndofs
        dofmap = np.empty((nc, nb), dtype=np.int64)

        # vertex dofs
        nv = len(el.entity_dofs[0])
        for v in range(nv):
            dofmap[:, el.entity_dofs[0][v][0]] = cells[:, v]
        offset = mesh.num_points

        # edge dofs
        if k >= 2 and mesh.dim >= 2:
            edges_local = cell_edges(mesh.cell_type)
            # global edge numbering from unique sorted vertex pairs
            from ..native import edge_numbering as native_en

            native = native_en(cells, np.asarray(edges_local))
            if native is not None:
                edge_ids, n_uniq = native
            else:
                cell_edge_verts = np.stack(
                    [cells[:, [a, b]] for (a, b) in edges_local], axis=1
                )  # (nc, n_edges_local, 2)
                keys = np.sort(cell_edge_verts.reshape(-1, 2), axis=1)
                uniq, inv = np.unique(keys, axis=0, return_inverse=True)
                edge_ids = inv.reshape(nc, len(edges_local))
                n_uniq = len(uniq)
            n_edge_dofs = k - 1
            for ei, (a, b) in enumerate(edges_local):
                local = el.entity_dofs[1][ei]
                base = offset + edge_ids[:, ei] * n_edge_dofs
                # orientation: local edge runs a->b; the global edge is
                # canonically ordered by ascending vertex id. Flip the
                # within-edge dof order when the local direction descends.
                flip = cells[:, a] > cells[:, b]
                for j, ld in enumerate(local):
                    jj = np.where(flip, n_edge_dofs - 1 - j, j)
                    dofmap[:, ld] = base + jj
            offset += n_uniq * n_edge_dofs
            self.num_edges = n_uniq
        else:
            self.num_edges = 0

        # face-interior dofs (3D, k >= 3). Two cells sharing a face must
        # hand out the same global dof for the same physical lattice
        # point even though their local vertex orders differ — so the
        # global within-face ordering is defined canonically wrt the
        # face's ASCENDING vertex ids, and each cell maps its local
        # lattice index through the exact integer-barycentric
        # permutation (no floating-point coordinate matching).
        has_face_dofs = False
        if mesh.dim == 3 and k >= 2:
            facets_local = cell_facets(mesh.cell_type)
            simplex_face = all(len(f) == 3 for f in facets_local)
            # triangular faces carry interior dofs from k=3 on
            # ((k-1)(k-2)/2); quad faces already from k=2 ((k-1)^2) —
            # Q2's face centers fall in this block too
            has_face_dofs = k >= 3 if simplex_face else k >= 2
        if has_face_dofs:
            nfv = 3 if simplex_face else 4
            nf = len(facets_local)
            cell_face_verts = np.stack(
                [cells[:, list(f)] for f in facets_local], axis=1
            )  # (nc, nf, nfv) global vertex ids in LOCAL face order
            keys = np.sort(cell_face_verts.reshape(-1, nfv), axis=1)
            uniq, inv = np.unique(keys, axis=0, return_inverse=True)
            face_ids = inv.reshape(nc, nf)
            if simplex_face:
                # local lattice enumeration (matches
                # elements._face_interior): i in [1, k), j in [1, k-i)
                # -> integer barycentrics (k-i-j, i, j) wrt the face's
                # vertex triple
                bary = np.array(
                    [(k - i - j, i, j)
                     for i in range(1, k) for j in range(1, k - i)],
                    dtype=np.int64,
                )
                n_face_dofs = len(bary)
                canon_lut = np.full((k, k), -1, dtype=np.int64)
                for idx, (_, b1, b2) in enumerate(bary):
                    canon_lut[b1, b2] = idx
                for fi in range(nf):
                    local = el.entity_dofs[2][fi]
                    # order[c, m] = which LOCAL vertex is the m-th
                    # smallest global id: canonical bary = local
                    # bary[order]
                    order = np.argsort(cell_face_verts[:, fi, :], axis=1)
                    base = offset + face_ids[:, fi] * n_face_dofs
                    for j, ld in enumerate(local):
                        c = bary[j][order]  # (nc, 3) canonical bary
                        jj = canon_lut[c[:, 1], c[:, 2]]
                        dofmap[:, ld] = base + jj
            else:
                # Tensor (quad) faces — hexahedra, the reference's
                # basix-arbitrary-degree parity gap. Local face corners
                # are ordered (00, 10, 01, 11) in the face's (s, t)
                # parametrization (elements/cells.py _FACETS, basix
                # convention); the element enumerates interior lattice
                # points j-major: idx = (j-1)*(k-1) + (i-1) at
                # (s, t) = (i/k, j/k). The canonical frame of a shared
                # face is defined purely from GLOBAL vertex ids: origin
                # = corner with the smallest id, alpha-axis toward the
                # smaller-id adjacent corner — both cells agree on it,
                # so they hand out identical global dofs for identical
                # physical points under any of the 8 quad symmetries.
                m = k - 1
                n_face_dofs = m * m
                # corner adjacency and (s, t) coords in the
                # (00, 10, 01, 11) numbering; diagonals 0-3 / 1-2 are
                # not adjacent
                adj = {0: (1, 2), 1: (0, 3), 2: (0, 3), 3: (1, 2)}
                corner_st = {0: (0, 0), 1: (1, 0), 2: (0, 1), 3: (1, 1)}
                # perm[case, local_idx] = canonical within-face index,
                # case = origin*2 + (0 if alpha-axis is the first
                # adjacent corner else 1)
                perm = np.zeros((8, n_face_dofs), dtype=np.int64)
                for o in range(4):
                    os_, ot = corner_st[o]
                    for ai in range(2):
                        a = adj[o][ai]
                        b = adj[o][1 - ai]

                        def steps_toward(cnr, i, j):
                            # lattice steps from the origin corner to
                            # the (i, j) point, measured along the edge
                            # origin->cnr (adjacent: differs in exactly
                            # one of s/t)
                            cs, ct = corner_st[cnr]
                            if cs != os_:
                                return i if os_ == 0 else k - i
                            return j if ot == 0 else k - j

                        for j in range(1, k):
                            for i in range(1, k):
                                lidx = (j - 1) * m + (i - 1)
                                al = steps_toward(a, i, j)
                                be = steps_toward(b, i, j)
                                perm[o * 2 + ai, lidx] = (
                                    (be - 1) * m + (al - 1)
                                )
                first_adj = np.array([adj[o][0] for o in range(4)])
                second_adj = np.array([adj[o][1] for o in range(4)])
                rows = np.arange(nc)
                for fi in range(nf):
                    local = el.entity_dofs[2][fi]
                    g = cell_face_verts[:, fi, :]  # (nc, 4)
                    o = np.argmin(g, axis=1)
                    a_first = (
                        g[rows, first_adj[o]] < g[rows, second_adj[o]]
                    )
                    case = o * 2 + np.where(a_first, 0, 1)
                    base = offset + face_ids[:, fi] * n_face_dofs
                    for lidx, ld in enumerate(local):
                        dofmap[:, ld] = base + perm[case, lidx]
            offset += len(uniq) * n_face_dofs
            self.num_faces = len(uniq)
        else:
            self.num_faces = 0

        # cell-interior dofs
        interior = el.entity_dofs[mesh.dim][0] if mesh.dim >= 2 else []
        n_int = len(interior)
        if n_int:
            base = offset + np.arange(nc, dtype=np.int64) * n_int
            for j, ld in enumerate(interior):
                dofmap[:, ld] = base + j
            offset += nc * n_int

        self.num_dofs = int(offset)
        self.dofmap = dofmap.astype(np.int32)

    def _build_dof_coords(self) -> None:
        mesh, el = self.mesh, self.element
        geom = LagrangeElement.create(mesh.cell_type, 1)
        (N,) = geom.tabulate(el.nodes, nderiv=0)  # (nb, n_verts)
        cell_pts = mesh.points[mesh.cells]  # (nc, nv, gdim)
        coords = np.einsum("bv,cvg->cbg", N, cell_pts)  # (nc, nb, gdim)
        out = np.zeros((self.num_dofs, mesh.gdim), dtype=mesh.points.dtype)
        out[self.dofmap.reshape(-1)] = coords.reshape(-1, mesh.gdim)
        self.dof_coords = out

    # ------------------------------------------------------------------
    def linear_parents(self):
        """(parents, weights, n_vertices): the degree-1 embedding of each
        scalar dof — for the p-multigrid transfer level (la/amg.PLevel).

        parents[i, :] are mesh vertex ids and weights[i, :] the degree-1
        basis evaluated at dof i's reference node (zero-padded), so
        sum_a w[i, a] * f(vertex[par[i, a]]) reproduces any piecewise-
        linear f exactly at every nodal point. Vertex dofs get themselves
        with weight 1 (the dofmap numbers vertices first, by mesh vertex
        id). Cells sharing a dof agree on the weights (same barycentric
        position), so a plain last-writer scatter is well-defined."""
        el = self.element
        geom = LagrangeElement.create(self.mesh.cell_type, 1)
        (N,) = geom.tabulate(el.nodes, nderiv=0)  # (nb, n_verts)
        N = np.where(np.abs(N) < 1e-12, 0.0, N)
        nb, nv = N.shape
        # compact each local dof's vertex weights to the max valence
        width = max(1, int((N != 0.0).sum(axis=1).max()))
        loc_par = np.zeros((nb, width), dtype=np.int64)
        loc_w = np.zeros((nb, width), dtype=np.float64)
        for b in range(nb):
            nz = np.nonzero(N[b])[0][:width]
            loc_par[b, : len(nz)] = nz
            loc_w[b, : len(nz)] = N[b, nz]
        cells = self.mesh.cells
        nc = cells.shape[0]
        parents = np.zeros((self.num_dofs, width), dtype=np.int64)
        weights = np.zeros((self.num_dofs, width), dtype=np.float64)
        flat = self.dofmap.reshape(-1).astype(np.int64)
        parents[flat] = cells[:, loc_par].reshape(nc * nb, width)
        weights[flat] = np.broadcast_to(
            loc_w[None], (nc, nb, width)
        ).reshape(nc * nb, width)
        return parents, weights, int(self.mesh.num_points)

    # ------------------------------------------------------------------
    def facet_closure_dofs(self, facet_indices: np.ndarray) -> np.ndarray:
        """Unique scalar dofs on the closure of the given boundary facets.

        Equivalent of dolfinx locate_dofs_topological (reference:
        /root/reference/src/boundaryCondition.py:36)."""
        mesh = self.mesh
        facet_indices = np.asarray(facet_indices, dtype=np.int64)
        if facet_indices.size == 0:
            return np.empty(0, dtype=np.int32)
        cells_of = mesh.facet_cells[facet_indices]
        lf_of = mesh.facet_local_index[facet_indices]
        # per-local-facet local dof lists (within one element all facets
        # have equal dof counts, so this stacks into a rectangular table)
        lf_tables = np.array(
            [self.element.facet_dofs(i)
             for i in range(len(cell_facets(mesh.cell_type)))],
            dtype=np.int64,
        )
        dofs = self.dofmap[cells_of[:, None], lf_tables[lf_of]]
        return np.unique(dofs).astype(np.int32)

    def locate_dofs_geometrical(self, marker) -> np.ndarray:
        """Dofs whose nodal coordinate satisfies marker(x) with x (gdim, n).

        Equivalent of dolfinx locate_dofs_geometrical (reference:
        /root/reference/src/boundaryCondition.py:39)."""
        on = np.asarray(marker(self.dof_coords.T))
        return np.where(on)[0].astype(np.int32)

    # ------------------------------------------------------------------
    def interpolate(self, f, t: float | None = None) -> np.ndarray:
        """Evaluate a callable at the dof coordinates.

        `f` takes x of shape (gdim, n) and returns (num_components, n) (or
        (n,) for scalar spaces) — the dolfinx interpolation convention the
        reference scenarios use (/root/reference/src/scenarios/lid_driven2D.py:46).
        Passing t forwards it as second argument for time-dependent values.
        """
        x = self.dof_coords.T
        vals = np.asarray(f(x) if t is None else f(x, t))
        if self.num_components == 1:
            return vals.reshape(self.num_dofs).astype(self.mesh.points.dtype)
        return np.ascontiguousarray(vals.T).astype(self.mesh.points.dtype)

    def zero_function(self) -> np.ndarray:
        shape = (
            (self.num_dofs,)
            if self.num_components == 1
            else (self.num_dofs, self.num_components)
        )
        return np.zeros(shape, dtype=self.mesh.points.dtype)
