"""Gmsh .msh file reader (ASCII, formats 2.2 and 4.1).

Replaces dolfinx.io.gmshio.read_from_msh / model_to_mesh (reference usage:
/root/reference/src/experiments/scenario_factory.py:47-49,
src/scenarios/vascular_tree.py:50-60). Pure Python — the framework owns
mesh ingestion; gmsh itself remains an offline preprocessing tool.

Cells are converted from gmsh local vertex ordering to this framework's
tensor ordering (quad: gmsh CCW 0123 -> tensor 0132; hex: gmsh 01234567 ->
tensor 01324576). Physical tags on codim-1 elements become boundary facet
tags; cell-dimension physical tags are returned for completeness.
"""

from __future__ import annotations

import numpy as np

from ..elements.cells import CellType
from .mesh import Mesh

# gmsh element type -> (CellType, n_nodes, permutation gmsh->ours)
_GMSH_CELLS = {
    2: (CellType.triangle, 3, [0, 1, 2]),
    3: (CellType.quadrilateral, 4, [0, 1, 3, 2]),
    4: (CellType.tetrahedron, 4, [0, 1, 2, 3]),
    5: (CellType.hexahedron, 8, [0, 1, 3, 2, 4, 5, 7, 6]),
}
_GMSH_FACETS = {
    1: 2,   # 2-node line
    2: 3,   # 3-node triangle
    3: 4,   # 4-node quad
}
_DIM_OF = {1: 1, 2: 2, 3: 2, 4: 3, 5: 3}


def _read_sections(path):
    sections = {}
    with open(path) as f:
        lines = f.read().splitlines()
    i = 0
    while i < len(lines):
        line = lines[i].strip()
        if line.startswith("$") and not line.startswith("$End"):
            name = line[1:]
            j = i + 1
            body = []
            endtag = f"$End{name}"
            while j < len(lines) and lines[j].strip() != endtag:
                body.append(lines[j])
                j += 1
            sections[name] = body
            i = j + 1
        else:
            i += 1
    return sections


def _parse_v2(sections):
    nodes_body = sections["Nodes"]
    n_nodes = int(nodes_body[0])
    ids = np.empty(n_nodes, dtype=np.int64)
    pts = np.empty((n_nodes, 3))
    for k in range(n_nodes):
        parts = nodes_body[1 + k].split()
        ids[k] = int(parts[0])
        pts[k] = [float(x) for x in parts[1:4]]

    elems_body = sections["Elements"]
    n_el = int(elems_body[0])
    elements = []  # (etype, phys_tag, node_ids)
    for k in range(n_el):
        parts = [int(x) for x in elems_body[1 + k].split()]
        etype = parts[1]
        ntags = parts[2]
        phys = parts[3] if ntags >= 1 else 0
        nodes = parts[3 + ntags:]
        elements.append((etype, phys, nodes))
    return ids, pts, elements


def _parse_v4(sections):
    nodes_body = sections["Nodes"]
    header = [int(x) for x in nodes_body[0].split()]
    n_blocks, n_nodes = header[0], header[1]
    ids = np.empty(n_nodes, dtype=np.int64)
    pts = np.empty((n_nodes, 3))
    li = 1
    filled = 0
    for _ in range(n_blocks):
        _, _, _, n_in_block = [int(x) for x in nodes_body[li].split()]
        li += 1
        blk_ids = [int(nodes_body[li + k]) for k in range(n_in_block)]
        li += n_in_block
        for k in range(n_in_block):
            coords = [float(x) for x in nodes_body[li + k].split()[:3]]
            ids[filled] = blk_ids[k]
            pts[filled] = coords
            filled += 1
        li += n_in_block

    # entity -> physical tag map
    ent_phys = {}
    if "Entities" in sections:
        ent_body = sections["Entities"]
        np0, nc0, ns0, nv0 = [int(x) for x in ent_body[0].split()]
        li2 = 1
        # points: tag x y z numPhys phys...
        for _ in range(np0):
            parts = ent_body[li2].split()
            tag = int(parts[0])
            nphys = int(parts[4])
            phys = int(parts[5]) if nphys else 0
            ent_phys[(0, tag)] = phys
            li2 += 1
        for d, cnt in ((1, nc0), (2, ns0), (3, nv0)):
            for _ in range(cnt):
                parts = ent_body[li2].split()
                tag = int(parts[0])
                nphys = int(parts[7])
                phys = int(parts[8]) if nphys else 0
                ent_phys[(d, tag)] = phys
                li2 += 1

    elems_body = sections["Elements"]
    header = [int(x) for x in elems_body[0].split()]
    n_blocks = header[0]
    li = 1
    elements = []
    for _ in range(n_blocks):
        ent_dim, ent_tag, etype, n_in_block = [
            int(x) for x in elems_body[li].split()
        ]
        li += 1
        phys = ent_phys.get((ent_dim, ent_tag), 0)
        for k in range(n_in_block):
            parts = [int(x) for x in elems_body[li + k].split()]
            elements.append((etype, phys, parts[1:]))
        li += n_in_block
    return ids, pts, elements


_CELL_GMSH = {
    CellType.triangle: (2, [0, 1, 2]),
    CellType.quadrilateral: (3, [0, 1, 3, 2]),
    CellType.tetrahedron: (4, [0, 1, 2, 3]),
    CellType.hexahedron: (5, [0, 1, 3, 2, 4, 5, 7, 6]),
}
_FACET_GMSH = {2: 1, 3: 2, 4: 3}  # n facet vertices -> gmsh etype


def write_msh(mesh: Mesh, path, fluid_tag: int = 4) -> None:
    """Write an ASCII gmsh v2.2 mesh with physical tags.

    Tagged boundary facets become codim-1 elements carrying their
    facet_tags value as the physical group; every cell carries
    `fluid_tag` (the reference tree/stenosis convention inlet=1,
    outlet=2, wall=3, fluid=4, /root/reference/src/geom/stenosis/
    stenosis.py:12-15). Round-trips through read_msh above; this is what
    lets `main.py tree` produce a vessels.msh natively (the reference
    needs CadQuery+gmsh, graph_to_mesh.py:264-401)."""
    etype, perm = _CELL_GMSH[CellType(mesh.cell_type)]
    pts = np.asarray(mesh.points, dtype=float)
    if pts.shape[1] < 3:
        pts = np.concatenate(
            [pts, np.zeros((len(pts), 3 - pts.shape[1]))], axis=1
        )
    # ours -> gmsh vertex order = inverse of the read permutation
    inv = np.empty(len(perm), dtype=np.int64)
    inv[perm] = np.arange(len(perm))
    cells = np.asarray(mesh.cells, dtype=np.int64)[:, inv]

    tagged = np.where(np.asarray(mesh.facet_tags) > 0)[0]
    lines = ["$MeshFormat", "2.2 0 8", "$EndMeshFormat", "$Nodes",
             str(len(pts))]
    for i, p in enumerate(pts):
        lines.append(f"{i + 1} {p[0]:.16g} {p[1]:.16g} {p[2]:.16g}")
    lines += ["$EndNodes", "$Elements", str(len(tagged) + len(cells))]
    eid = 1
    for fi in tagged:
        fv = np.asarray(mesh.facets[fi], dtype=np.int64) + 1
        ft = _FACET_GMSH[len(fv)]
        tag = int(mesh.facet_tags[fi])
        lines.append(
            f"{eid} {ft} 2 {tag} {tag} " + " ".join(map(str, fv))
        )
        eid += 1
    for c in cells + 1:
        lines.append(
            f"{eid} {etype} 2 {fluid_tag} {fluid_tag} "
            + " ".join(map(str, c))
        )
        eid += 1
    lines.append("$EndElements")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def read_msh(path, gdim: int | None = None) -> Mesh:
    """Read an ASCII gmsh mesh. Keeps the highest-dimensional cells found;
    codim-1 tagged elements become boundary facet tags.

    gdim: force geometric dimension (2 drops the z coordinate); by default
    z is dropped when the mesh is 2D and flat.
    """
    sections = _read_sections(path)
    fmt = sections["MeshFormat"][0].split()
    version = float(fmt[0])
    if int(fmt[1]) != 0:
        raise ValueError("binary .msh not supported; export ASCII")

    if version >= 4.0:
        ids, pts, elements = _parse_v4(sections)
    else:
        ids, pts, elements = _parse_v2(sections)

    id_map = np.full(ids.max() + 1, -1, dtype=np.int64)
    id_map[ids] = np.arange(len(ids))

    # highest-dimensional cell type present
    all_etypes = set(et for et, _, _ in elements)
    cell_etypes = [et for et in all_etypes if et in _GMSH_CELLS]
    if not cell_etypes:
        raise ValueError("no supported cell elements in mesh")
    top_dim = max(_DIM_OF[et] for et in cell_etypes)
    cell_etypes = [et for et in cell_etypes if _DIM_OF[et] == top_dim]
    if len(cell_etypes) != 1:
        raise ValueError(f"mixed cell types not supported: {cell_etypes}")
    etype = cell_etypes[0]
    cell_type, nn, perm = _GMSH_CELLS[etype]

    cells = np.array(
        [e[2] for e in elements if e[0] == etype], dtype=np.int64
    )
    cells = id_map[cells][:, perm]
    cell_tags = np.array(
        [e[1] for e in elements if e[0] == etype], dtype=np.int32
    )

    if gdim is None:
        gdim = top_dim if np.allclose(pts[:, top_dim:], pts[0, top_dim:]) \
            else 3
    points = pts[:, :gdim]

    mesh = Mesh(points=points, cells=cells.astype(np.int32),
                cell_type=cell_type)
    mesh.cell_tags = cell_tags

    # facet tags: match codim-1 tagged elements to boundary facets
    facet_elems = [
        (e[1], e[2]) for e in elements
        if e[0] in _GMSH_FACETS and _DIM_OF.get(e[0], -1) == top_dim - 1
    ]
    if facet_elems:
        keys = {}
        for i, fv in enumerate(np.sort(mesh.facets, axis=1)):
            keys[tuple(fv)] = i
        for phys, nodes in facet_elems:
            if phys == 0:
                continue
            key = tuple(sorted(id_map[np.asarray(nodes, dtype=np.int64)]))
            idx = keys.get(key)
            if idx is not None:
                mesh.facet_tags[idx] = phys
    return mesh
