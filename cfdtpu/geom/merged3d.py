"""Native 3D merged experiment geometry: stenosis ∪ coupling ∪ tree.

The reference's `geometry_type: full` stage unions a CadQuery stenosis
loft, a truncated coupling cone and a VascuSynth tree solid with OCC
booleans and tags surfaces by nearest-node matching
(/root/reference/src/experiments/meshing.py:300-436, mesh_merged_geometry
:443-552) — an offline C++ pipeline. Here the same composition is one
implicit signed-distance union: stenosis radius-law capsules + a single
tapered cone capsule + tree branch capsules, tet-meshed by
geom/implicit3d.mesh_implicit_union with inlet=1 at the artery entrance
and outlet=2 planes at every tree terminal (tag convention
src/geom/stenosis/stenosis.py:12-15).

The tree is a procedural 3D Murray-law tree (below) — the in-framework
replacement for the VascuSynth binary — or any VascularTree (e.g. parsed
from a cached GXL) aligned so its root continues the artery axis, the
analogue of the reference's Rodrigues-rotation alignment
(_rotate_tree_to_align, meshing.py:30-83).
"""

from __future__ import annotations

import math

import numpy as np

from .coupling import coupling_cone_profile, rodrigues_rotation_matrix
from .stenosis3d import stenosis_radius_law
from .tree.tree_model import VascularTree


def _rotate_about(axis, angle):
    """Rotation matrix about a unit axis (Rodrigues form)."""
    axis = np.asarray(axis, float)
    axis = axis / max(np.linalg.norm(axis), 1e-30)
    K = np.array([
        [0, -axis[2], axis[1]],
        [axis[2], 0, -axis[0]],
        [-axis[1], axis[0], 0],
    ])
    return np.eye(3) + math.sin(angle) * K + (
        1 - math.cos(angle)
    ) * (K @ K)


def procedural_tree3d(
    r_root: float,
    n_generations: int = 3,
    gamma: float = 3.0,
    asymmetry: float = 0.5,
    bifurcation_angle: float = 35.0,
    length_ratio: float = 8.0,
    origin=(0.0, 0.0, 0.0),
    direction=(1.0, 0.0, 0.0),
    plane_twist: float = 137.5,
) -> VascularTree:
    """Procedural 3D binary vascular tree with Murray's law.

    Same hemodynamic constraints as the 2D generator
    (geom/tree/tree_2d.py, reference tree_2d.py:113-172) lifted to 3D:
    each bifurcation opens in a branch plane that twists by
    `plane_twist` degrees (golden angle default) around the parent
    direction per generation, so the tree fills space instead of a
    plane. Returns a tree_model.VascularTree, so prune/dilate/thicken
    modifications and the 3D mesher apply unchanged."""
    nodes: dict = {}
    edges: list = []
    counter = [0]

    def new_id():
        counter[0] += 1
        return f"n{counter[0] - 1}"

    d0 = np.asarray(direction, float)
    d0 = d0 / max(np.linalg.norm(d0), 1e-30)
    root = new_id()
    nodes[root] = np.asarray(origin, float)
    tip = new_id()
    nodes[tip] = nodes[root] + length_ratio * r_root * d0
    edges.append({"from": root, "to": tip, "radius": float(r_root)})

    a, g = float(asymmetry), float(gamma)
    ratio = (a / (1.0 - a)) ** (1.0 / 3.0)

    # an arbitrary vector orthogonal to d0 seeds the first branch plane
    seed = np.array([0.0, 0.0, 1.0])
    if abs(seed @ d0) > 0.9:
        seed = np.array([0.0, 1.0, 0.0])
    normal0 = np.cross(d0, seed)
    normal0 /= max(np.linalg.norm(normal0), 1e-30)

    def bifurcate(parent, d_parent, normal, r_parent, gen):
        if gen > n_generations:
            return
        r_left = r_parent * (1.0 + ratio ** (-g)) ** (-1.0 / g)
        r_right = r_left / ratio
        # thinner branch deflects more (2D generator rule)
        ang_l = math.radians(bifurcation_angle * r_right / r_parent)
        ang_r = -math.radians(bifurcation_angle * r_left / r_parent)
        for r_c, ang in ((r_left, ang_l), (r_right, ang_r)):
            d_c = _rotate_about(normal, ang) @ d_parent
            child = new_id()
            nodes[child] = nodes[parent] + length_ratio * r_c * d_c
            edges.append({
                "from": parent, "to": child, "radius": float(r_c),
            })
            n_c = _rotate_about(d_c, math.radians(plane_twist)) @ normal
            n_c -= (n_c @ d_c) * d_c
            n_c /= max(np.linalg.norm(n_c), 1e-30)
            bifurcate(child, d_c, n_c, r_c, gen + 1)

    bifurcate(tip, d0, normal0, float(r_root), 1)
    tree = VascularTree(nodes=nodes, edges=edges, root=root)
    tree._assign_levels()
    return tree


def align_tree(tree: VascularTree, attach_point, direction) -> None:
    """Rigidly move a tree so its root node sits at `attach_point` and
    its root edge heads along `direction` — the native counterpart of
    the reference's _rotate_tree_to_align (meshing.py:30-83)."""
    d = np.asarray(direction, float)
    d = d / max(np.linalg.norm(d), 1e-30)
    root_edge = tree.edges[0]
    p0 = np.asarray(tree.nodes[root_edge["from"]], float)
    p1 = np.asarray(tree.nodes[root_edge["to"]], float)
    cur = p1 - p0
    cur = cur / max(np.linalg.norm(cur), 1e-30)
    R = rodrigues_rotation_matrix(cur, d)
    for nid, p in tree.nodes.items():
        tree.nodes[nid] = R @ (np.asarray(p, float) - p0) + np.asarray(
            attach_point, float
        )


def full_geometry_segments(params: dict, tree: VascularTree | None = None):
    """Compose the capsule set of the full geometry.

    Returns (segments, inlet_end, outlet_ends, tree)."""
    L = float(params.get("length", 50.0))
    R_in = float(params.get("radius_in", 1.5))
    R_out = float(params.get("radius_out", 0.65))
    severity = float(params.get("stenosis_severity", 0.5))
    slope = float(params.get("stenosis_slope", 0.3))
    position = float(params.get("stenosis_position", 0.5 * L))
    n_axial = int(params.get("n_axial", 48))

    s = np.linspace(0.0, L, n_axial + 1)
    r = stenosis_radius_law(s, L, R_in, R_out, severity, slope, position)
    segments = [
        (np.array([s[i], 0.0, 0.0]), np.array([s[i + 1], 0.0, 0.0]),
         float(r[i]), float(r[i + 1]))
        for i in range(n_axial)
    ]

    # tree (procedural unless one was provided, e.g. from a cached GXL)
    r_tree = 0.9 * R_out
    if tree is None:
        n_terminal = int(params.get("n_terminal", 8))
        n_gen = max(1, int(round(math.log2(max(n_terminal, 2)))))
        tree = procedural_tree3d(
            r_root=r_tree,
            n_generations=n_gen,
            gamma=float(params.get("murray_exponent", 3.0)),
        )
    else:
        r_tree = float(tree.edges[0]["radius"])

    # coupling cone bridges the artery outlet radius to the tree root
    # radius at the configured wall slope (geom/coupling.py)
    cone_slope = float(params.get("coupling_slope", 0.1))
    L_c, _ = coupling_cone_profile(R_out, r_tree, cone_slope)
    L_c = max(L_c, 1e-6)
    segments.append((
        np.array([L, 0.0, 0.0]), np.array([L + L_c, 0.0, 0.0]),
        R_out, r_tree,
    ))

    align_tree(tree, (L + L_c, 0.0, 0.0), (1.0, 0.0, 0.0))
    nodes = {nid: np.asarray(p, float) for nid, p in tree.nodes.items()}
    for e in tree.edges:
        r_e = float(e["radius"])
        segments.append((nodes[e["from"]], nodes[e["to"]], r_e, r_e))

    term_set = set(tree.terminals)
    outlet_ends = []
    for e in tree.edges:
        if e["to"] in term_set:
            d = nodes[e["to"]] - nodes[e["from"]]
            d = d / max(np.linalg.norm(d), 1e-30)
            outlet_ends.append((nodes[e["to"]], d))
    inlet_end = (np.array([0.0, 0.0, 0.0]), np.array([-1.0, 0.0, 0.0]))
    return segments, inlet_end, outlet_ends, tree


def mesh_full_geometry(params: dict, tree: VascularTree | None = None):
    """Tet-mesh the merged stenosis+coupling+tree domain."""
    from .implicit3d import mesh_implicit_union

    segments, inlet_end, outlet_ends, _ = full_geometry_segments(
        params, tree
    )
    res = float(params.get("mesh_resolution", 0.35))
    r_min = min(min(s[2], s[3]) for s in segments)
    return mesh_implicit_union(
        segments, h=res * r_min, inlet_end=inlet_end,
        outlet_ends=outlet_ends,
        # junction fillets (smooth-min); "blend" knob in the geometry
        # params, default half the smallest radius
        blend=float(params.get("blend", 0.5 * r_min)),
    )
