"""VTU time-series writer (ParaView-compatible).

Replaces the reference's ADIOS2 VTXWriter output (v.bp, p.bp, ... at
/root/reference/src/scenario.py:208-219) with a dependency-free XML
VTK UnstructuredGrid series: one <name>_NNNNNN.vtu per step plus a .pvd
collection file, written by process 0 only.
"""

from __future__ import annotations

import base64
import os
import struct

import numpy as np

from ..elements.cells import CellType

_VTK_TYPE = {
    CellType.triangle: 5,
    CellType.quadrilateral: 9,
    CellType.tetrahedron: 10,
    CellType.hexahedron: 12,
}

# permutation from our tensor vertex ordering to VTK's CCW ordering
_VTK_PERM = {
    CellType.triangle: [0, 1, 2],
    CellType.quadrilateral: [0, 1, 3, 2],
    CellType.tetrahedron: [0, 1, 2, 3],
    CellType.hexahedron: [0, 1, 3, 2, 4, 5, 7, 6],
}


def _b64(arr: np.ndarray) -> str:
    raw = arr.tobytes()
    header = struct.pack("<I", len(raw))
    return base64.b64encode(header + raw).decode("ascii")


class VTUSeriesWriter:
    """Writes a field as a .pvd + per-step .vtu series.

    Only the vertex-valued part of the field is written (for degree >= 2
    spaces the first num_points rows are the vertex dofs by construction).
    """

    def __init__(self, path: str, mesh, name: str):
        self.base = path  # e.g. <out>/v  -> v.pvd + v_000000.vtu
        self.dir = os.path.dirname(path)
        self.stem = os.path.basename(path)
        self.mesh = mesh
        self.name = name
        self.steps: list[tuple[float, str]] = []
        os.makedirs(self.dir, exist_ok=True)

        pts = np.asarray(mesh.points, dtype=np.float64)
        if pts.shape[1] < 3:
            pts = np.pad(pts, ((0, 0), (0, 3 - pts.shape[1])))
        self._pts_b64 = _b64(pts.astype(np.float32))
        perm = _VTK_PERM[mesh.cell_type]
        conn = np.asarray(mesh.cells)[:, perm].astype(np.int64)
        self._conn_b64 = _b64(conn)
        self._offsets_b64 = _b64(
            (np.arange(1, mesh.num_cells + 1) * conn.shape[1]).astype(
                np.int64
            )
        )
        self._types_b64 = _b64(
            np.full(mesh.num_cells, _VTK_TYPE[mesh.cell_type], np.uint8)
        )

    def write(self, t: float, field) -> None:
        data = np.asarray(field, dtype=np.float64)
        npts = self.mesh.num_points
        data = data[:npts]
        ncomp = 1 if data.ndim == 1 else data.shape[1]
        if ncomp == 2:
            data = np.pad(data, ((0, 0), (0, 1)))
            ncomp = 3
        fname = f"{self.stem}_{len(self.steps):06d}.vtu"
        self._write_vtu(os.path.join(self.dir, fname), data, ncomp)
        self.steps.append((float(t), fname))
        self._write_pvd()

    def _write_vtu(self, path: str, data: np.ndarray, ncomp: int) -> None:
        m = self.mesh
        with open(path, "w") as f:
            f.write(
                '<?xml version="1.0"?>\n'
                '<VTKFile type="UnstructuredGrid" version="0.1" '
                'byte_order="LittleEndian">\n<UnstructuredGrid>\n'
                f'<Piece NumberOfPoints="{m.num_points}" '
                f'NumberOfCells="{m.num_cells}">\n'
            )
            f.write(f'<PointData Scalars="{self.name}">\n')
            f.write(
                f'<DataArray type="Float32" Name="{self.name}" '
                f'NumberOfComponents="{ncomp}" format="binary">\n'
            )
            f.write(_b64(data.astype(np.float32)))
            f.write("\n</DataArray>\n</PointData>\n")
            f.write("<Points>\n")
            f.write(
                '<DataArray type="Float32" NumberOfComponents="3" '
                'format="binary">\n'
            )
            f.write(self._pts_b64)
            f.write("\n</DataArray>\n</Points>\n<Cells>\n")
            f.write(
                '<DataArray type="Int64" Name="connectivity" '
                'format="binary">\n' + self._conn_b64 + "\n</DataArray>\n"
            )
            f.write(
                '<DataArray type="Int64" Name="offsets" format="binary">\n'
                + self._offsets_b64 + "\n</DataArray>\n"
            )
            f.write(
                '<DataArray type="UInt8" Name="types" format="binary">\n'
                + self._types_b64 + "\n</DataArray>\n"
            )
            f.write("</Cells>\n</Piece>\n</UnstructuredGrid>\n</VTKFile>\n")

    def _write_pvd(self) -> None:
        with open(self.base + ".pvd", "w") as f:
            f.write(
                '<?xml version="1.0"?>\n'
                '<VTKFile type="Collection" version="0.1">\n<Collection>\n'
            )
            for t, fname in self.steps:
                f.write(
                    f'<DataSet timestep="{t}" part="0" file="{fname}"/>\n'
                )
            f.write("</Collection>\n</VTKFile>\n")

    def close(self) -> None:
        self._write_pvd()
