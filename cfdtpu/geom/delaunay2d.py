"""In-framework 2D unstructured mesh generation.

Replaces the reference's gmsh OCC meshing for the built-in 2D scenarios
(e.g. the DFG channel-with-cylinder at
/root/reference/src/scenarios/dfg_1.py:97-171, which uses a distance-field
Threshold for refinement near the obstacle). gmsh is not available in this
environment, so meshing is done natively:

1. boundary loops are sampled at the local target size,
2. interior points are placed on octree-style graded levels (a point at
   level k survives if the sizing function at it falls in the level's
   band), jittered deterministically,
3. scipy.spatial.Delaunay triangulates the point cloud,
4. triangles outside the domain (or inside holes) are dropped by centroid
   point-in-polygon tests,
5. a few Lloyd-style smoothing passes (move interior points to the mean of
   their neighbours, retriangulate) improve element quality.

The result is a cfdtpu Mesh; facet tags are applied by the caller with
geometric markers.
"""

from __future__ import annotations

import numpy as np
from scipy.spatial import Delaunay, cKDTree

from ..mesh import Mesh


def sample_loop(points_fn, t0, t1, size_fn, closed=True, max_pts=100000):
    """Sample a parametric loop x(t) so that consecutive points are ~local
    size apart. points_fn: t -> (2,) position."""
    ts = [t0]
    t = t0
    # estimate parameter step by local speed (finite differences)
    while t < t1:
        x = np.asarray(points_fn(t))
        h = 1e-6 * (t1 - t0)
        dx = (np.asarray(points_fn(min(t + h, t1))) - x) / h
        speed = max(np.linalg.norm(dx), 1e-12)
        dt = float(size_fn(x)) / speed
        t = t + dt
        if t < t1 - 0.3 * dt:
            ts.append(t)
        if len(ts) > max_pts:
            raise RuntimeError("loop sampling diverged")
    pts = np.array([points_fn(tt) for tt in ts])
    return pts


def polyline_loop(vertices, size_fn):
    """Sample a closed polygon's edges at the local size; returns (n, 2)."""
    vertices = np.asarray(vertices, dtype=float)
    pts = []
    nv = len(vertices)
    for i in range(nv):
        a, b = vertices[i], vertices[(i + 1) % nv]
        length = np.linalg.norm(b - a)
        # local size at midpoint decides the subdivision
        n = max(1, int(round(length / float(size_fn(0.5 * (a + b))))))
        for k in range(n):
            pts.append(a + (b - a) * (k / n))
    return np.array(pts)


def _point_in_polygon(pts, poly):
    """Vectorized even-odd rule. pts (n,2), poly (m,2) closed implicitly."""
    x, y = pts[:, 0], pts[:, 1]
    inside = np.zeros(len(pts), dtype=bool)
    x0, y0 = poly[:, 0], poly[:, 1]
    x1, y1 = np.roll(x0, -1), np.roll(y0, -1)
    for i in range(len(poly)):
        cond = ((y0[i] > y) != (y1[i] > y))
        xs = (x1[i] - x0[i]) * (y - y0[i]) / (y1[i] - y0[i] + 1e-300) + x0[i]
        inside ^= cond & (x < xs)
    return inside


def generate_mesh_2d(
    outer_loop: np.ndarray,
    hole_loops: list[np.ndarray] | None = None,
    size_fn=None,
    smooth_iters: int = 6,
    dtype=np.float64,
    seed: int = 0,
    inside_fn=None,
    hole_fns=None,
) -> Mesh:
    """Triangulate the region inside outer_loop minus the holes.

    outer_loop / hole_loops: (n, 2) boundary point loops, already sampled
    at the desired local spacing (their points are preserved exactly).
    size_fn: x (2,) -> target edge length (defaults to the median boundary
    spacing); batched callables (points in the LAST axis, x[..., 0]) are
    detected and used directly — scalar-only callables fall back to a
    Python loop.
    inside_fn / hole_fns: optional EXACT membership predicates,
    (n, 2) -> bool, replacing the O(n_pts * n_poly_edges) even-odd
    polygon tests (the host-setup hotspot at large meshes: callers like
    the DFG channel know their geometry analytically — a bounds check
    and a radius check).
    """
    hole_loops = hole_loops or []
    boundary = np.concatenate([outer_loop] + hole_loops, axis=0)
    n_bnd = len(boundary)

    spacings = np.linalg.norm(
        outer_loop - np.roll(outer_loop, -1, axis=0), axis=1
    )
    default_size = float(np.median(spacings))
    if size_fn is None:
        size_fn = lambda x: default_size

    lo = boundary.min(axis=0)
    hi = boundary.max(axis=0)
    pad = 1e-9 * np.linalg.norm(hi - lo)

    # octree-style graded interior candidates
    def sizes_at(P):
        try:  # batched sizing (points along the last axis)
            s = np.asarray(size_fn(P), dtype=float)
            if s.shape == (len(P),) and np.isfinite(s).all():
                return s
        except Exception:
            pass
        return np.array([float(size_fn(p)) for p in P])

    def region_mask(P):
        """True where P is inside the domain (outer minus holes)."""
        if inside_fn is not None:
            ok = np.asarray(inside_fn(P), dtype=bool)
        else:
            ok = _point_in_polygon(P, outer_loop)
        for i, hole in enumerate(hole_loops):
            hf = hole_fns[i] if hole_fns is not None else None
            if hf is not None:
                ok &= ~np.asarray(hf(P), dtype=bool)
            else:
                ok &= ~_point_in_polygon(P, hole)
        return ok
    smin_probe = sizes_at(boundary).min()
    smax_probe = max(
        default_size,
        float(size_fn(0.5 * (lo + hi))),
    )
    levels = max(1, int(np.ceil(np.log2(max(smax_probe / smin_probe, 1.0)))) + 1)
    s_top = smax_probe
    rng = np.random.RandomState(seed)
    interior = []
    for k in range(levels):
        s = s_top / (2 ** k)
        nx = int(np.ceil((hi[0] - lo[0]) / s)) + 1
        ny = int(np.ceil((hi[1] - lo[1]) / s)) + 1
        gx, gy = np.meshgrid(
            lo[0] + s * (np.arange(nx) + 0.5 * (k % 2)),
            lo[1] + s * (np.arange(ny) + 0.5 * (k % 2)),
            indexing="ij",
        )
        P = np.stack([gx.ravel(), gy.ravel()], axis=-1)
        P = P + rng.uniform(-0.12 * s, 0.12 * s, P.shape)
        sz = sizes_at(P)
        band = (sz <= s * 1.42) & (sz > s * 0.71) if k < levels - 1 else (
            sz <= s * 1.42
        )
        interior.append(P[band])
    interior = np.concatenate(interior, axis=0)

    # keep only points inside the domain and away from the boundary
    interior = interior[region_mask(interior)]
    tree = cKDTree(boundary)
    d, _ = tree.query(interior)
    keep = d > 0.6 * sizes_at(interior)
    interior = interior[keep]

    pts = np.concatenate([boundary, interior], axis=0)

    def triangulate(pts):
        tri = Delaunay(pts)
        cells = tri.simplices
        cent = pts[cells].mean(axis=1)
        return cells[region_mask(cent)]

    cells = triangulate(pts)

    # Lloyd-style smoothing: interior points -> mean of neighbours.
    # bincount-based accumulation (much faster than ufunc.at); at very
    # large point counts retriangulate every 2nd pass only — the qhull
    # calls dominate host setup there (e.g. the ~1M-DOF bench ladder),
    # and Lloyd averaging tolerates one-pass-stale connectivity. The
    # threshold keeps every recorded validation-campaign mesh (< 100k
    # points) byte-identical.
    retri_every = 2 if len(pts) > 100_000 else 1
    npts = len(pts)
    for it in range(smooth_iters):
        nbr_sum = np.zeros_like(pts)
        nbr_cnt = np.zeros(npts)
        for (a, b) in [(0, 1), (1, 2), (2, 0)]:
            e0, e1 = cells[:, a], cells[:, b]
            for d in range(2):
                nbr_sum[:, d] += np.bincount(
                    e0, weights=pts[e1, d], minlength=npts
                )
                nbr_sum[:, d] += np.bincount(
                    e1, weights=pts[e0, d], minlength=npts
                )
            cnt = np.bincount(e0, minlength=npts)
            cnt += np.bincount(e1, minlength=npts)
            nbr_cnt += cnt
        avg = nbr_sum / np.maximum(nbr_cnt, 1)[:, None]
        pts[n_bnd:] = avg[n_bnd:]
        if (it + 1) % retri_every == 0 or it == smooth_iters - 1:
            cells = triangulate(pts)

    # drop unused points (holes may strand candidates) and remap
    used = np.unique(cells)
    remap = -np.ones(len(pts), dtype=np.int64)
    remap[used] = np.arange(len(used))
    mesh = Mesh(
        points=pts[used].astype(dtype),
        cells=remap[cells].astype(np.int32),
        cell_type="triangle",
        dtype=np.dtype(dtype),
    )
    return mesh
