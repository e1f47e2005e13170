#!/usr/bin/env python
"""Convert a gmsh .msh file to ParaView .vtu.

Rebuild of /root/reference/src/geom/scripts/msh_to_paraview.py (meshio
based, :15-47) using the framework's native .msh reader and VTU writer.

Usage: python scripts/msh_to_vtu.py input.msh [output.vtu]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import numpy as np  # noqa: E402


def convert(msh_path: str, out_path: str | None = None) -> str:
    from cfdtpu.mesh.msh import read_msh
    from cfdtpu.io.vtu import VTUSeriesWriter

    mesh = read_msh(msh_path)
    out_path = out_path or os.path.splitext(msh_path)[0] + ".vtu"
    base = os.path.splitext(out_path)[0]
    w = VTUSeriesWriter(base, mesh, "facet_tag_indicator")
    # write the boundary-tag indicator sampled at vertices so tagged
    # regions are inspectable in ParaView
    indicator = np.zeros(mesh.num_points)
    for i, facet in enumerate(mesh.facets):
        indicator[facet] = np.maximum(
            indicator[facet], mesh.facet_tags[i]
        )
    w.write(0.0, indicator)
    final = f"{base}_000000.vtu"
    os.replace(final, out_path)
    os.remove(base + ".pvd")
    print(f"wrote {out_path} ({mesh.num_cells} cells)")
    return out_path


if __name__ == "__main__":
    if len(sys.argv) < 2:
        print(__doc__)
        sys.exit(1)
    convert(sys.argv[1], sys.argv[2] if len(sys.argv) > 2 else None)
