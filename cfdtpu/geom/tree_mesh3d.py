"""Native 3D vascular-tree meshing via the implicit capsule union.

The reference builds tree solids with CadQuery sweeps/lofts and meshes
them with gmsh (/root/reference/src/geom/tree/graph_to_mesh.py:186-401);
both are offline C++ tools. This module delivers the consumed surface —
GXL tree graph in, tagged tet mesh out — with the in-framework implicit
mesher (geom/implicit3d.py): each edge becomes a tapered capsule, the
union is tet-meshed, and end planes are tagged inlet=1/outlet=2/wall=3
(reference tag convention, src/geom/stenosis/stenosis.py:12-15).
"""

from __future__ import annotations

import numpy as np


def tree_segments(tree):
    """(segments, inlet_end, outlet_ends) from a VascularTree: tapered
    capsule per edge, inlet plane at the root start, one outlet plane
    per terminal edge end."""
    nodes = {nid: np.asarray(p, float) for nid, p in tree.nodes.items()}
    segments = []
    for e in tree.edges:
        p0, p1 = nodes[e["from"]], nodes[e["to"]]
        r = float(e["radius"])
        segments.append((p0, p1, r, r))
    root = tree.edges[0]
    rdir = nodes[root["to"]] - nodes[root["from"]]
    rdir = rdir / max(np.linalg.norm(rdir), 1e-30)
    inlet_end = (nodes[root["from"]], -rdir)
    outlet_ends = []
    term_set = set(tree.terminals)
    for e in tree.edges:
        if e["to"] in term_set:
            d = nodes[e["to"]] - nodes[e["from"]]
            d = d / max(np.linalg.norm(d), 1e-30)
            outlet_ends.append((nodes[e["to"]], d))
    return segments, inlet_end, outlet_ends


def tree_to_mesh3d(tree, res: float = 0.35, blend: float | None = None):
    """Tet-mesh a VascularTree. `res` is the cell size as a fraction of
    the root radius (matches scripts/tree_to_mesh.py --res). Branch
    junctions are smooth-min blended at half the local minimum radius by
    default (the lofted-junction fidelity of the reference's OCC path);
    pass blend=0 for the hard capsule union."""
    from .implicit3d import mesh_implicit_union

    segments, inlet_end, outlet_ends = tree_segments(tree)
    r0 = float(tree.edges[0]["radius"])
    r_min = min(min(s[2], s[3]) for s in segments)
    return mesh_implicit_union(
        segments, h=res * r0, inlet_end=inlet_end,
        outlet_ends=outlet_ends,
        blend=0.5 * r_min if blend is None else blend,
    )
