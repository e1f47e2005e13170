"""Native 3D tet meshing of tubular unions (bifurcations, vascular trees).

The reference builds its 3D vessel solids offline with CadQuery/OCC and
meshes+tags them with gmsh (graph_to_mesh.py: swept circles, lofted
bifurcations, nearest-surface tagging at :264-401). This module is the
in-framework counterpart: the vessel network is an IMPLICIT union of
tapered capsules (one per edge) clipped by end planes at the inlet and
terminal outlets; a background lattice of tets is filtered against the
signed distance and its boundary vertices are snapped onto the zero
level set. Boundary facets are tagged inlet/outlet/wall by nearest end
plane — the same convention as the reference's gmsh tagger
(inlet = 1, outlets = 2, walls = 3; tag constants at
/root/reference/src/geom/stenosis/stenosis.py:12-15).

Quality notes: lattice-cleaved tets are first-order accurate in geometry
(O(h) boundary) with bounded-but-moderate shape quality — adequate for
the P1 stabilized solvers; branch radii should be resolved by >= 2.5
cells (the mesher warns otherwise).
"""

from __future__ import annotations

import numpy as np

from ..mesh import Mesh

INLET_TAG = 1
OUTLET_TAG = 2
WALL_TAG = 3


def _capsule_sdf(x, p0, p1, r0, r1):
    """Signed distance to a tapered capsule (linearly varying radius).

    x (n, 3); exact for r0 == r1, first-order taper approximation
    otherwise (adequate: radii vary slowly along vessels)."""
    d = p1 - p0
    L2 = float(d @ d)
    t = np.clip(((x - p0) @ d) / max(L2, 1e-300), 0.0, 1.0)
    proj = p0 + t[:, None] * d
    r = r0 + (r1 - r0) * t
    return np.linalg.norm(x - proj, axis=1) - r


def _network_sdf(x, segments, end_planes, blend: float = 0.0):
    """Union field over capsules, clipped by end planes.

    blend > 0 joins capsules with the quadratic smooth-min (blending
    radius = blend), giving fillet-like junctions — the in-framework
    analogue of the reference's OCC lofted bifurcations / fillets
    (graph_to_mesh.py lofts, coupling.py fillets). blend = 0 is the
    exact hard union. The smooth min under-estimates true distance
    near junctions, which is fine for level-set meshing + snapping."""
    sd = np.full(len(x), np.inf)
    for (p0, p1, r0, r1) in segments:
        c = _capsule_sdf(x, np.asarray(p0, float), np.asarray(p1, float),
                         float(r0), float(r1))
        if blend > 0.0:
            hb = np.maximum(blend - np.abs(sd - c), 0.0) / blend
            sd = np.minimum(sd, c) - 0.25 * blend * hb * hb
        else:
            sd = np.minimum(sd, c)
    for (q, n_) in end_planes:  # end cuts stay sharp
        sd = np.maximum(sd, (x - np.asarray(q, float))
                        @ np.asarray(n_, float))
    return sd


def mesh_implicit_union(
    segments,
    h: float,
    inlet_end=None,
    outlet_ends=None,
    dtype=np.float64,
    snap_iters: int = 2,
    blend: float = 0.0,
) -> Mesh:
    """Tet-mesh the union of tapered capsules.

    Args:
        segments: list of (p0, p1, r0, r1) vessel edges (3D points).
        h: target cell size.
        inlet_end: (point, outward_normal) of the open inlet plane.
        outlet_ends: list of (point, outward_normal) open outlet planes.
        snap_iters: boundary-vertex projection sweeps onto the surface.
        blend: smooth-min blending radius at capsule junctions (0 =
            hard union; ~r/2 gives OCC-fillet-like branch joins).

    Returns a Mesh with boundary facets tagged INLET/OUTLET/WALL.
    """
    segments = [
        (np.asarray(p0, float), np.asarray(p1, float), float(r0),
         float(r1))
        for (p0, p1, r0, r1) in segments
    ]
    outlet_ends = list(outlet_ends or [])
    end_planes = [
        e[:2] for e in
        (([] if inlet_end is None else [inlet_end]) + outlet_ends)
    ]

    rmin = min(min(s[2], s[3]) for s in segments)
    if rmin < 2.5 * h:
        print(f"[implicit3d] warning: min radius {rmin:.3g} resolved by "
              f"only {rmin / h:.1f} cells (recommend h <= r/2.5)")

    pts = np.concatenate(
        [np.stack([s[0], s[1]]) for s in segments], axis=0
    )
    rmax = max(max(s[2], s[3]) for s in segments)
    lo = pts.min(axis=0) - rmax - 2 * h
    hi = pts.max(axis=0) + rmax + 2 * h
    nx, ny, nz = [max(2, int(np.ceil((hi[i] - lo[i]) / h)))
                  for i in range(3)]

    xs = np.linspace(lo[0], hi[0], nx + 1)
    ys = np.linspace(lo[1], hi[1], ny + 1)
    zs = np.linspace(lo[2], hi[2], nz + 1)
    X, Y, Z = np.meshgrid(xs, ys, zs, indexing="ij")
    verts = np.stack([X.ravel(), Y.ravel(), Z.ravel()], axis=1)

    def vid(i, j, k):
        return (i * (ny + 1) + j) * (nz + 1) + k

    I, J, K = np.meshgrid(np.arange(nx), np.arange(ny), np.arange(nz),
                          indexing="ij")
    c000 = vid(I, J, K).ravel()
    c100 = vid(I + 1, J, K).ravel()
    c010 = vid(I, J + 1, K).ravel()
    c110 = vid(I + 1, J + 1, K).ravel()
    c001 = vid(I, J, K + 1).ravel()
    c101 = vid(I + 1, J, K + 1).ravel()
    c011 = vid(I, J + 1, K + 1).ravel()
    c111 = vid(I + 1, J + 1, K + 1).ravel()
    # 6-tet Kuhn subdivision around the main diagonal c000-c111
    tets = np.concatenate([
        np.stack([c000, c100, c110, c111], axis=1),
        np.stack([c000, c110, c010, c111], axis=1),
        np.stack([c000, c010, c011, c111], axis=1),
        np.stack([c000, c011, c001, c111], axis=1),
        np.stack([c000, c001, c101, c111], axis=1),
        np.stack([c000, c101, c100, c111], axis=1),
    ], axis=0)

    sd = _network_sdf(verts, segments, end_planes, blend)
    inside = sd < 0
    keep = inside[tets].all(axis=1)
    tets = tets[keep]
    if len(tets) == 0:
        raise ValueError("implicit3d: no tets inside the network "
                         "(h too coarse for the radii?)")

    used = np.unique(tets)
    remap = -np.ones(len(verts), dtype=np.int64)
    remap[used] = np.arange(len(used))
    points = verts[used]
    tets = remap[tets]

    # boundary vertices: vertices of facets shared by exactly one tet
    faces = np.concatenate([
        tets[:, [0, 1, 2]], tets[:, [0, 1, 3]],
        tets[:, [0, 2, 3]], tets[:, [1, 2, 3]],
    ], axis=0)
    fs = np.sort(faces, axis=1)
    _, first, cnt = np.unique(
        fs, axis=0, return_index=True, return_counts=True
    )
    bfaces = faces[first[cnt == 1]]
    bverts = np.unique(bfaces)

    # snap boundary vertices onto the implicit surface (finite-diff
    # gradient of the sdf), rejecting any relaxation that inverts tets
    def volumes(P):
        a = P[tets[:, 1]] - P[tets[:, 0]]
        b = P[tets[:, 2]] - P[tets[:, 0]]
        c = P[tets[:, 3]] - P[tets[:, 0]]
        return np.einsum("ij,ij->i", np.cross(a, b), c)

    vol0 = volumes(points)
    lam = 0.8
    for _ in range(4):
        P = points.copy()
        for _ in range(snap_iters):
            x = P[bverts]
            s = _network_sdf(x, segments, end_planes, blend)
            eps = 1e-4 * h
            g = np.stack([
                (_network_sdf(x + eps * e, segments, end_planes, blend)
                 - s) / eps
                for e in np.eye(3)
            ], axis=1)
            gn = np.maximum(np.linalg.norm(g, axis=1), 1e-12)
            P[bverts] = x - lam * (s / gn)[:, None] * (g / gn[:, None])
        vol = volumes(P)
        if (np.sign(vol) == np.sign(vol0)).all() and (
            np.abs(vol) > 1e-6 * np.abs(vol0)
        ).all():
            points = P
            break
        lam *= 0.5
    # (if all relaxations failed, the unsnapped lattice mesh is kept)

    mesh = Mesh(points.astype(dtype), tets.astype(np.int32), "tetrahedron")

    # tag boundary facets by nearest open end plane
    fpts = mesh.points[mesh.facets]
    cent = fpts.mean(axis=1)
    tags = np.full(len(mesh.facets), WALL_TAG, dtype=np.int32)
    # outlet_ends entries may be (q, n) or (q, n, tag)
    ends = ([(INLET_TAG, inlet_end[:2])] if inlet_end is not None
            else [])
    ends += [
        (oe[2] if len(oe) > 2 else OUTLET_TAG, oe[:2])
        for oe in outlet_ends
    ]
    for tag, (q, n_) in ends:
        q = np.asarray(q, float)
        n_ = np.asarray(n_, float)
        n_ = n_ / np.linalg.norm(n_)
        dplane = np.abs((cent - q) @ n_)
        radial = np.linalg.norm(
            (cent - q) - ((cent - q) @ n_)[:, None] * n_, axis=1
        )
        rloc = max(r for s in segments for r in (s[2], s[3]))
        sel = (dplane < 0.75 * h) & (radial < 1.5 * rloc)
        tags[sel] = tag
    mesh.facet_tags = tags
    return mesh


def bifurcation_mesh(
    r_in: float = 1.0,
    r_out1: float = 0.75,
    r_out2: float = 0.6,
    length: float = 8.0,
    branch_length: float = 6.0,
    angle1: float = 0.6,
    angle2: float = -0.7,
    h: float = 0.35,
    dtype=np.float64,
    blend: float | None = None,
) -> Mesh:
    """A Y-bifurcation (one inlet, two outlets) — the native twin of the
    reference's simple_bifurcation.msh geometry (scenario
    /root/reference/src/scenarios/simple_bifurcation.py reads a
    pre-built tagged mesh; here the mesh is generated in-framework).
    Lengths/radii in arbitrary units; angles in radians off the axis."""
    p_in = np.array([0.0, 0.0, 0.0])
    p_junction = np.array([length, 0.0, 0.0])
    d1 = np.array([np.cos(angle1), np.sin(angle1), 0.0])
    d2 = np.array([np.cos(angle2), np.sin(angle2), 0.0])
    p_out1 = p_junction + branch_length * d1
    p_out2 = p_junction + branch_length * d2
    segments = [
        (p_in, p_junction, r_in, r_in),
        (p_junction, p_out1, r_out1 * 1.1, r_out1),
        (p_junction, p_out2, r_out2 * 1.1, r_out2),
    ]
    # outlet tags 2 and 4 match SimpleBifurcationSimulation's markers;
    # junctions blended at half the inlet radius by default (the lofted-
    # bifurcation look of the reference's OCC path)
    return mesh_implicit_union(
        segments, h,
        inlet_end=(p_in, np.array([-1.0, 0.0, 0.0])),
        outlet_ends=[(p_out1, d1, 2), (p_out2, d2, 4)],
        dtype=dtype,
        blend=0.5 * r_in if blend is None else blend,
    )
