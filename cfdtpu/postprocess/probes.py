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


def eval_at_points_quadratic(space: FunctionSpace, fn, points,
                             radius_cells: float = 2.5) -> np.ndarray:
    """Superconvergent point evaluation for scalar P1 fields: local
    least-squares quadratic recovery around each probe.

    The P1 interpolant is only O(h^2) pointwise and systematically
    clips extrema in high-gradient regions — measured on the DFG dp
    probes it biases the pressure difference low. Fitting the complete
    quadratic (6 terms in 2D) to the nodal values within
    radius_cells * h_local of the probe recovers the smooth field to
    O(h^3) (Zienkiewicz-Zhu-style patch recovery at a point). The
    reference evaluates p with dolfinx's cell-local interpolation
    (/root/reference/src/scenarios/dfg_1.py:214 bb_tree point eval);
    this is the accuracy upgrade knob on top of that parity.
    """
    mesh = space.mesh
    assert space.num_components == 1 and mesh.gdim == 2
    pts = np.atleast_2d(np.asarray(points, dtype=np.float64))
    fn = np.asarray(fn, dtype=np.float64)
    coords = np.asarray(space.dof_coords, dtype=np.float64)
    h = float(np.median(np.asarray(mesh.h())))
    out = np.empty(len(pts))
    for i, x0 in enumerate(pts):
        r = radius_cells * h
        for _ in range(6):  # widen until enough nodes for the fit
            d2 = np.sum((coords - x0) ** 2, axis=1)
            sel = d2 < r * r
            if sel.sum() >= 12:
                break
            r *= 1.4
        xs = (coords[sel] - x0) / r
        w = (1.0 - np.sqrt(d2[sel]) / r) ** 2  # cosine-ish weights
        A = np.stack([
            np.ones(sel.sum()), xs[:, 0], xs[:, 1],
            xs[:, 0] ** 2, xs[:, 0] * xs[:, 1], xs[:, 1] ** 2,
        ], axis=1)
        Aw = A * w[:, None]
        coef, *_ = np.linalg.lstsq(Aw, fn[sel] * w, rcond=None)
        out[i] = coef[0]  # value at the probe (xs = 0)
    return out
