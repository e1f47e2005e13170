"""`tree` CLI subcommand: YAML config -> vascular tree -> tagged mesh.

Rebuild of /root/reference/src/geom/tree/main.py:11-57. The reference
pipeline is VascuSynth (C++ binary) -> GXL -> CadQuery solid -> gmsh .msh;
all three are offline preprocessing tools. This command runs whatever part
of the pipeline the environment supports and reports precisely what is
missing otherwise; GXL parsing, tree modifications and .msh ingestion are
always native.
"""

from __future__ import annotations

import os

import yaml


def run(args) -> int:
    with open(args.config) as f:
        cfg = yaml.safe_load(f) or {}

    workdir = cfg.get("workdir", os.path.dirname(args.output) or ".")
    tree_params = cfg.get("tree_params", cfg)

    from .vascusynth import generate_vascusynth_tree

    try:
        gxl = generate_vascusynth_tree(
            workdir,
            num_nodes=int(tree_params.get("n_terminal",
                                          tree_params.get("num_nodes", 32))),
            gamma=float(tree_params.get("gamma", 3.0)),
            random_seed=int(tree_params.get("seed",
                                            tree_params.get("random_seed",
                                                            0))),
            volume_mL=float(tree_params.get("volume_mL", 100.0)),
        )
    except RuntimeError as e:
        print(f"[tree] {e}")
        return 1

    print(f"[tree] GXL graph at {gxl}")

    from .tree_model import VascularTree
    from .vascusynth import voxel_width_mm

    tree = VascularTree.from_xml(
        gxl, voxel_width_mm(float(tree_params.get("volume_mL", 100.0)))
    )
    print(
        f"[tree] parsed: {len(tree.nodes)} nodes, {len(tree.edges)} "
        f"edges, {len(tree.terminals)} terminals"
    )

    # solid + mesh require CadQuery + gmsh (offline tools)
    try:
        import cadquery  # noqa: F401
        import gmsh  # noqa: F401
    except ImportError:
        print(
            "[tree] CadQuery/gmsh not available in this environment — "
            "solid construction and meshing are offline preprocessing "
            "steps; the GXL graph is ready for them. Stopping here."
        )
        return 0

    raise NotImplementedError(
        "CadQuery solid building is delegated to the offline tooling"
    )
