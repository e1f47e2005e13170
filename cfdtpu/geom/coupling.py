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


def generate_coupling_geometry(start_pt, direction, r_start, r_end,
                               length_ratio=1.0):
    """Native coupling-cone description (reference
    src/geom/coupling.py:8-99 builds the equivalent OCC loft): a
    truncated cone from r_start to r_end along `direction`, length
    L = |r_start - r_end| * length_ratio. Returns the (p0, p1, r0, r1)
    segment plus its two end planes — directly consumable by
    implicit3d.mesh_implicit_union / geom/merged3d."""
    p0 = np.asarray(start_pt, dtype=float)
    d = np.asarray(direction, dtype=float)
    d = d / max(np.linalg.norm(d), 1e-30)
    L = abs(float(r_start) - float(r_end)) * float(length_ratio)
    p1 = p0 + L * d
    return {
        "segment": (p0, p1, float(r_start), float(r_end)),
        "inlet_end": (p0, -d),
        "outlet_end": (p1, d),
        "length": L,
    }


def mesh_coupling(start_pt, direction, r_start, r_end,
                  length_ratio=1.0, h=None, dtype=np.float64):
    """Tet-mesh a standalone coupling cone natively (the reference's
    mesh_coupling at src/geom/coupling.py:102-183 runs gmsh on the OCC
    solid; here the cone is an implicit tapered capsule clipped by its
    two end planes). h defaults to min radius / 3."""
    from .implicit3d import mesh_implicit_union

    geo = generate_coupling_geometry(
        start_pt, direction, r_start, r_end, length_ratio
    )
    if h is None:
        h = min(float(r_start), float(r_end)) / 3.0
    return mesh_implicit_union(
        [geo["segment"]], h=h,
        inlet_end=geo["inlet_end"],
        outlet_ends=[geo["outlet_end"]],
        dtype=dtype,
    )
