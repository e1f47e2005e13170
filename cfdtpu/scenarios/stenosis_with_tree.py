"""Stenosis + VascuSynth 3D tree projected to 2D.

Rebuild of /root/reference/src/scenarios/stenosis_with_tree.py (m units:
L = 0.03, H = 0.003): a VascuSynth tree is generated offline, its GXL
graph projected to 2D (drop Z, rescale the Y extent to the channel
height, root radius = 0.9 x throat half-width) and fused to the stenosis
via a trapezoidal coupling (:66-104, :153-250). VascuSynth and the OCC
boolean pipeline are offline tools; natively this scenario consumes
either a precomputed GXL graph (gxl_path, projected and meshed with the
implicit-union generator) or falls back to an equivalent procedural 2D
tree when no graph is given.
"""

from __future__ import annotations

import numpy as np

from ..geom.tree.tree_2d import VascularTree2D
from .stenosis_with_tree_2d import StenosisWithTree2DSimulation


class StenosisWithTreeSimulation(StenosisWithTree2DSimulation):
    def __init__(
        self,
        solver_name,
        dt,
        T,
        f=(0, 0),
        *,
        inlet_max_velocity: float = 1.5,
        gxl_path: str | None = None,
        voxel_width: float = 1.0,
        L: float = 30.0,     # mm (reference uses 0.03 m)
        R_in: float = 1.5,
        R_out: float = 1.2,
        **kwargs,
    ):
        self.gxl_path = gxl_path
        self.voxel_width = float(voxel_width)
        kwargs.setdefault("length", L)
        kwargs.setdefault("radius_in", R_in)
        kwargs.setdefault("radius_out", R_out)
        kwargs["L"] = L
        kwargs["R_in"] = R_in
        kwargs["R_out"] = R_out
        kwargs.setdefault("v_max", inlet_max_velocity)
        super().__init__(solver_name, dt, T, f, **kwargs)

    @property
    def tree(self) -> VascularTree2D:
        if self._tree is None:
            o = self.mesh_options
            if self.gxl_path:
                self._tree = self._tree_from_gxl(o)
            else:
                self._tree = VascularTree2D(
                    r_root=0.9 * o["R_out"], **self.tree_params
                ).generate((o["L"], o["R_in"]), direction=0.0)
        return self._tree

    def _tree_from_gxl(self, o) -> VascularTree2D:
        """Project a VascuSynth GXL graph to 2D: drop Z, rescale the
        Y-extent to the channel height, root radius = 0.9 x throat
        half-width (reference :153-250)."""
        from ..geom.tree.tree_model import VascularTree

        g = VascularTree.from_xml(self.gxl_path, self.voxel_width)
        xy = {nid: pos[:2].copy() for nid, pos in g.nodes.items()}
        ys = np.array([p[1] for p in xy.values()])
        yspan = max(ys.max() - ys.min(), 1e-9)
        scale = (2 * o["R_in"]) / yspan
        root = g.root
        origin = np.array([o["L"], o["R_in"]])
        root_pos = xy[root]
        t = VascularTree2D(r_root=0.9 * o["R_out"], **self.tree_params)
        t.nodes = {
            nid: origin + (p - root_pos) * scale
            for nid, p in xy.items()
        }
        radii = np.array([e["radius"] for e in g.edges])
        rscale = (0.9 * o["R_out"]) / max(radii.max(), 1e-9)
        t.edges = [
            {
                "from": e["from"], "to": e["to"],
                "radius": e["radius"] * rscale,
                "r_parent": e["radius"] * rscale,
            }
            for e in g.edges
        ]
        t.terminals = list(g.terminals)
        return t
