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


def _locate_tensor(mesh, points, tol=1e-6):
    """(cells, xi) for quad/hex meshes: candidate cells by bounding box,
    then Newton inversion of the multilinear vertex map per candidate
    (reference domain [0,1]^d, vertices bit-ordered: x-bit 1, y-bit 2,
    z-bit 4 — elements/cells.py _VERTICES). Falls back to the candidate
    with the least reference-coordinate violation (float32 meshes put
    boundary points epsilon outside every cell)."""
    pts = mesh.points.astype(np.float64)
    d = mesh.dim
    nv = 2 ** d
    verts = pts[mesh.cells[:, :nv]]  # (nc, nv, d)
    lo = verts.min(axis=1)
    hi = verts.max(axis=1)
    pad = tol * max(1.0, float(np.max(hi - lo)))
    bits = (np.arange(nv)[:, None] >> np.arange(d)[None, :]) & 1  # (nv,d)

    def shape(xi):  # (d,) -> N (nv,), dN (nv, d)
        fac = np.where(bits == 1, xi[None, :], 1.0 - xi[None, :])
        N = fac.prod(axis=1)
        dN = np.empty((nv, d))
        dsign = np.where(bits == 1, 1.0, -1.0)
        for k in range(d):
            oth = np.delete(fac, k, axis=1).prod(axis=1)
            dN[:, k] = dsign[:, k] * oth
        return N, dN

    npnt = points.shape[0]
    found = np.full(npnt, -1, dtype=np.int64)
    xi_out = np.zeros((npnt, d))
    for i, p in enumerate(points):
        cand = np.where(
            ((lo - pad) <= p).all(axis=1) & (p <= (hi + pad)).all(axis=1)
        )[0]
        best_viol, best = np.inf, (-1, None)
        for c in cand:
            vx = verts[c]  # (nv, d)
            xi = np.full(d, 0.5)
            for _ in range(20):
                N, dN = shape(xi)
                r = N @ vx - p
                if np.abs(r).max() < 1e-13 * max(1.0, np.abs(p).max()):
                    break
                # X(xi) = N(xi) @ vx -> dX_j/dxi_k = sum_v dN[v,k] vx[v,j]
                J = np.einsum("vk,vj->jk", dN, vx)
                xi = xi - np.linalg.solve(J, r)
            viol = max(0.0, float(np.max(np.maximum(-xi, xi - 1.0))))
            if viol <= tol:
                found[i] = c
                xi_out[i] = np.clip(xi, 0.0, 1.0)
                break
            if viol < best_viol:
                best_viol, best = viol, (c, xi)
        else:
            if best[0] >= 0 and best_viol < 0.05:
                found[i] = best[0]
                xi_out[i] = np.clip(best[1], 0.0, 1.0)
    return found, xi_out


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
    elif mesh.cell_type in (CellType.quadrilateral, CellType.hexahedron):
        cells, xi = _locate_tensor(mesh, points)
        if (cells < 0).any():
            bad = points[cells < 0]
            raise ValueError(f"points outside mesh: {bad}")
    else:
        raise NotImplementedError(
            f"point evaluation on {mesh.cell_type} cells"
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
