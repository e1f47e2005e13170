"""Vascular tree domain model: pruning, dilation, wall thickening.

Rebuild of /root/reference/src/geom/tree/tree_model.py: wraps a parsed
GXL graph and applies the experiment-matrix tree modifications —
BFS level assignment, pruning by vessel_loss_factor (remove the deepest
leaf-bifurcation pairs, reclassifying orphaned parents as terminals,
:62-179), hyperemia dilation (radius x factor, :26-42) and wall
thickening (radius x (1 - severity) below a level threshold). Solid
construction / gmsh tagging remain offline preprocessing (CadQuery/gmsh,
reference build_solid/mesh_and_tag) — the framework consumes the
resulting .msh via cfdtpu.mesh.read_msh.
"""

from __future__ import annotations

from collections import deque
from dataclasses import dataclass, field

import numpy as np

from .gxl import parse_gxl


@dataclass
class VascularTree:
    nodes: dict
    edges: list
    root: str
    levels: dict = field(default_factory=dict)

    @classmethod
    def from_xml(cls, path: str, voxel_width: float = 1.0):
        nodes, edges = parse_gxl(path, voxel_width)
        targets = {e["to"] for e in edges}
        sources = {e["from"] for e in edges}
        roots = sources - targets
        root = next(iter(roots)) if roots else next(iter(nodes))
        tree = cls(nodes=nodes, edges=edges, root=root)
        tree._assign_levels()
        return tree

    def _assign_levels(self):
        children = self.children_map()
        self.levels = {self.root: 0}
        q = deque([self.root])
        while q:
            nid = q.popleft()
            for e in children.get(nid, []):
                self.levels[e["to"]] = self.levels[nid] + 1
                q.append(e["to"])

    def children_map(self) -> dict:
        out: dict = {}
        for e in self.edges:
            out.setdefault(e["from"], []).append(e)
        return out

    @property
    def terminals(self) -> list:
        children = self.children_map()
        return [n for n in self.nodes if not children.get(n)]

    # ------------------------------------------------------------------
    def apply_modifications(
        self,
        vessel_loss_factor: float = 0.0,
        hyperemia_factor: float = 1.0,
        wall_severity: float = 0.0,
        wall_level_threshold: int = 0,
    ):
        """Reference apply_modifications (:26-42): prune, dilate, thicken."""
        if vessel_loss_factor > 0:
            self._prune_tree(vessel_loss_factor)
        if hyperemia_factor != 1.0:
            for e in self.edges:
                e["radius"] *= hyperemia_factor
        if wall_severity > 0:
            for e in self.edges:
                if self.levels.get(e["to"], 0) >= wall_level_threshold:
                    e["radius"] *= (1.0 - wall_severity)
        return self

    def _prune_tree(self, vessel_loss_factor: float):
        """Remove the deepest leaf/bifurcation pairs until the requested
        fraction of terminal vessels is gone; parents that lose all their
        children become terminals (reference :62-179)."""
        n_remove = int(round(vessel_loss_factor * len(self.terminals)))
        removed = 0
        while removed < n_remove:
            terms = self.terminals
            if len(terms) <= 1:
                break
            # deepest terminal first
            deepest = max(terms, key=lambda n: self.levels.get(n, 0))
            if self.levels.get(deepest, 0) == 0:
                break
            parent_edges = [e for e in self.edges if e["to"] == deepest]
            self.edges = [e for e in self.edges if e["to"] != deepest]
            self.nodes.pop(deepest, None)
            removed += 1
        self._assign_levels()
        return self
