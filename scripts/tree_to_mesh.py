#!/usr/bin/env python
"""Standalone GXL vascular tree -> tagged mesh tool.

Rebuild of /root/reference/src/geom/vascular_tree/treeToMesh.py (the
older standalone twin of geom/tree/graph_to_mesh.py): parse a
VascuSynth GXL graph, apply optional tree modifications (prune/dilate/
thicken, reference tree_model.py:26-42), project to 2D, and mesh the
capsule union natively (the 3D CadQuery/gmsh solid stage remains
offline preprocessing, as in the experiment pipeline).

Usage:
    python scripts/tree_to_mesh.py tree.gxl out.npz \
        [--voxel-width W] [--res R] [--vessel-loss F] [--dilate F] \
        [--thicken S --thicken-level L]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("gxl")
    ap.add_argument("out", help="output mesh .npz")
    ap.add_argument("--voxel-width", type=float, default=1.0)
    ap.add_argument("--res", type=float, default=0.3)
    ap.add_argument("--vessel-loss", type=float, default=0.0)
    ap.add_argument("--dilate", type=float, default=1.0)
    ap.add_argument("--thicken", type=float, default=0.0)
    ap.add_argument("--thicken-level", type=int, default=0)
    ap.add_argument(
        "--blend", type=float, default=None,
        help="3d junction smooth-min radius (default: half the min "
             "branch radius; 0 = hard capsule union)",
    )
    ap.add_argument(
        "--mode", choices=["2d", "3d"], default="2d",
        help="2d: project + capsule-union triangle mesh; 3d: native "
             "implicit-union tet mesh with inlet/outlet tagging (the "
             "in-framework replacement for the reference's "
             "CadQuery+gmsh graph_to_mesh nearest-surface pipeline, "
             "graph_to_mesh.py:264-401)",
    )
    args = ap.parse_args()

    import numpy as np

    from cfdtpu.geom.tree.tree_model import VascularTree
    from cfdtpu.geom.tree.tree_2d import VascularTree2D
    from cfdtpu.geom.tree_mesh2d import generate_stenosis_tree_mesh_2d

    tree = VascularTree.from_xml(args.gxl, voxel_width=args.voxel_width)
    tree.apply_modifications(
        vessel_loss_factor=args.vessel_loss,
        hyperemia_factor=args.dilate,
        wall_severity=args.thicken,
        wall_level_threshold=args.thicken_level,
    )

    if args.mode == "3d":
        from cfdtpu.geom.implicit3d import mesh_implicit_union

        nodes = {nid: np.asarray(p, float)
                 for nid, p in tree.nodes.items()}
        segments = []
        for e in tree.edges:
            p0, p1 = nodes[e["from"]], nodes[e["to"]]
            r = float(e["radius"])
            segments.append((p0, p1, r, r))
        root = tree.edges[0]
        rdir = nodes[root["to"]] - nodes[root["from"]]
        rdir = rdir / max(np.linalg.norm(rdir), 1e-30)
        outlet_ends = []
        term_set = set(tree.terminals)
        for e in tree.edges:
            if e["to"] in term_set:
                d = nodes[e["to"]] - nodes[e["from"]]
                d = d / max(np.linalg.norm(d), 1e-30)
                outlet_ends.append((nodes[e["to"]], d))
        r0 = float(root["radius"])
        r_min = min(min(s[2], s[3]) for s in segments)
        mesh = mesh_implicit_union(
            segments, h=args.res * r0,
            inlet_end=(nodes[root["from"]], -rdir),
            outlet_ends=outlet_ends,
            blend=(0.5 * r_min if args.blend is None else args.blend),
        )
        np.savez(
            args.out,
            points=mesh.points, cells=mesh.cells,
            cell_type=str(mesh.cell_type), facet_tags=mesh.facet_tags,
            facets=mesh.facets, facet_cells=mesh.facet_cells,
            facet_local_index=mesh.facet_local_index,
        )
        print(f"wrote {args.out}: {mesh.num_cells} tets, "
              f"{len(tree.edges)} branches, "
              f"{len(outlet_ends)} outlets")
        return 0

    # project to 2D (drop Z; reference treeToMesh/stenosis_with_tree
    # project the synthesized 3D graph the same way) and feed the
    # capsule-union mesher through a VascularTree2D shell
    t2 = VascularTree2D.__new__(VascularTree2D)
    t2.nodes = {
        nid: np.asarray(p, float)[:2] for nid, p in tree.nodes.items()
    }
    t2.edges = [
        {"from": e["from"], "to": e["to"],
         "radius": float(e["radius"]),
         "generation": tree.levels.get(e["to"], 0)}
        for e in tree.edges
    ]
    t2.terminals = tree.terminals

    root = tree.edges[0]
    r0 = float(root["radius"])
    # translate so the tree root sits at the feeding channel's outlet
    # center (L, R_in) of the mesher's coordinate frame
    L0 = 4 * r0
    shift = np.array([L0, r0]) - t2.nodes[root["from"]]
    t2.nodes = {nid: p + shift for nid, p in t2.nodes.items()}
    mesh = generate_stenosis_tree_mesh_2d(
        L=max(L0, 1e-9),
        R_in=r0,
        R_out=r0,
        res=args.res,
        x_position_stenosis=2 * r0,
        severity=0.0,
        slope=0.4,
        tree=t2,
        inlet_marker=1, outlet_marker=2, wall_marker=3,
    )
    np.savez(
        args.out,
        points=mesh.points, cells=mesh.cells,
        cell_type=str(mesh.cell_type), facet_tags=mesh.facet_tags,
        facets=mesh.facets, facet_cells=mesh.facet_cells,
        facet_local_index=mesh.facet_local_index,
    )
    print(f"wrote {args.out}: {mesh.num_cells} cells, "
          f"{len(tree.edges)} branches")
    return 0


if __name__ == "__main__":
    sys.exit(main())
