"""Point evaluation of FEM fields.

Replaces the dolfinx bb_tree / compute_colliding_cells point probes the
reference uses for pressure-drop and benchmark sampling
(/root/reference/src/scenarios/dfg_1.py:214-227,
src/scenarios/lid_driven2D.py:100-111): locate the containing cell by
barycentric search (simplices) and evaluate the nodal basis there.
Probe counts are tiny (a handful of points), so an exhaustive
vectorized candidate search in numpy is simpler and fast enough.
"""

from __future__ import annotations

import numpy as np

from ..elements.cells import CellType
from ..spaces import FunctionSpace


def _locate_simplex(mesh, points, tol=1e-6):
    """(cells, bary) containing each point; falls back to the cell with
    the least barycentric violation (handles float32 meshes where boundary
    points sit epsilon outside every cell)."""
    pts = mesh.points.astype(np.float64)
    verts = pts[mesh.cells]  # (nc, nv, d)
    d = mesh.dim
    npnt = points.shape[0]
    found = np.full(npnt, -1, dtype=np.int64)
    bary_out = np.zeros((npnt, d + 1))

    v0 = verts[:, 0]  # (nc, d)
    T = np.stack([verts[:, i + 1] - v0 for i in range(d)], axis=-1)  # (nc, d, d)
    Tinv = np.linalg.inv(T)  # (nc, d, d)

    for i, p in enumerate(points):
        lam = np.einsum("cij,cj->ci", Tinv, p[None, :] - v0)  # (nc, d)
        lam0 = 1.0 - lam.sum(axis=1)
        bary = np.concatenate([lam0[:, None], lam], axis=1)
        violation = -bary.min(axis=1)
        best = int(np.argmin(violation))
        if violation[best] <= tol:
            found[i] = best
            bary_out[i] = bary[best]
    return found, bary_out


def eval_at_points(space: FunctionSpace, fn, points) -> np.ndarray:
    """Evaluate a Function array at physical points (n, gdim).

    Returns (n,) for scalar or (n, ncomp) for vector spaces. Raises if a
    point lies outside the mesh.
    """
    mesh = space.mesh
    points = np.atleast_2d(np.asarray(points, dtype=np.float64))
    fn = np.asarray(fn)

    if mesh.cell_type in (CellType.triangle, CellType.tetrahedron):
        cells, bary = _locate_simplex(mesh, points)
        if (cells < 0).any():
            bad = points[cells < 0]
            raise ValueError(f"points outside mesh: {bad}")
        # reference coords: for our simplex ordering, xi = bary[1:]
        xi = bary[:, 1:]
    else:
        raise NotImplementedError(
            "point evaluation on tensor cells not yet implemented"
        )

    el = space.element
    vals = np.empty(
        (len(points),) + (() if space.num_components == 1
                          else (space.num_components,))
    )
    for i, (c, x) in enumerate(zip(cells, xi)):
        (phi,) = el.tabulate(x[None, :], nderiv=0)  # (1, nb)
        dofs = space.dofmap[c]
        vals[i] = phi[0] @ fn[dofs]
    return vals
