"""Coupling-cone geometry between two vessel radii (consumed surface).

Rebuild of /root/reference/src/geom/coupling.py: a lofted truncated-cone
transition between two circular cross-sections with arbitrary 3D
orientation (Rodrigues rotation, :8-99) plus a gmsh mesher that tags the
curved faces as walls (:102-183). The CadQuery/gmsh stages are offline
preprocessing; the rotation/placement math the framework owns is native.
"""

from __future__ import annotations

import numpy as np


def rodrigues_rotation_matrix(a, b) -> np.ndarray:
    """Rotation matrix taking unit vector a to unit vector b (Rodrigues'
    formula; the alignment used to attach trees/couplings to the artery
    outlet, reference coupling.py and experiments/meshing.py:30-83)."""
    a = np.asarray(a, dtype=float)
    b = np.asarray(b, dtype=float)
    a = a / np.linalg.norm(a)
    b = b / np.linalg.norm(b)
    v = np.cross(a, b)
    c = float(np.dot(a, b))
    if np.isclose(c, 1.0):
        return np.eye(3)
    if np.isclose(c, -1.0):
        # 180 degrees: rotate about any axis orthogonal to a
        axis = np.cross(a, [1.0, 0.0, 0.0])
        if np.linalg.norm(axis) < 1e-12:
            axis = np.cross(a, [0.0, 1.0, 0.0])
        axis = axis / np.linalg.norm(axis)
        K = np.array([
            [0, -axis[2], axis[1]],
            [axis[2], 0, -axis[0]],
            [-axis[1], axis[0], 0],
        ])
        return np.eye(3) + 2.0 * K @ K
    K = np.array([
        [0, -v[2], v[1]],
        [v[2], 0, -v[0]],
        [-v[1], v[0], 0],
    ])
    return np.eye(3) + K + K @ K / (1.0 + c)


def coupling_cone_profile(r_start, r_end, slope):
    """Length and radius law of the truncated coupling cone: the cone
    tapers from r_start to r_end at the given wall slope, so
    L = |r_start - r_end| / slope."""
    L = abs(float(r_start) - float(r_end)) / float(slope)

    def radius(s):
        t = np.clip(np.asarray(s, dtype=float) / max(L, 1e-30), 0.0, 1.0)
        return r_start + (r_end - r_start) * t

    return L, radius


def generate_coupling_geometry(*args, **kwargs):
    try:
        import cadquery  # noqa: F401
    except ImportError as e:
        raise RuntimeError(
            "3D coupling solids require CadQuery (offline preprocessing). "
            "Use coupling_cone_profile/rodrigues_rotation_matrix for the "
            "placement math and mesh offline; 2D couplings are handled "
            "natively by the tree union mesher (geom/tree_mesh2d.py)."
        ) from e
    raise NotImplementedError(
        "delegate to the offline CadQuery pipeline "
        "(reference src/geom/coupling.py:8-99)"
    )


def mesh_coupling(*args, **kwargs):
    generate_coupling_geometry()
