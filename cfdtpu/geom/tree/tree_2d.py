"""Procedural 2D vascular tree (VascuSynth-inspired).

Rebuild of /root/reference/src/geom/tree/tree_2d.py: a binary tree built
generation by generation with the hemodynamic constraints kept — Murray's
law r_p^gamma = r_l^gamma + r_r^gamma, flow split Q_l = asymmetry * Q_p,
Poiseuille Q ~ r^3 (L ~ r) giving r_l/r_r = (a/(1-a))^{1/3} (:113-135) —
branch length = length_ratio * radius, bifurcation half-angle scaled by
the sibling radius ratio (:137-172). Exposes bifurcation_points for
fillet placement (:174-198).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np


@dataclass
class VascularTree2D:
    r_root: float = 1.2
    n_generations: int = 3
    gamma: float = 3.0
    bifurcation_angle: float = 35.0
    length_ratio: float = 8.0
    asymmetry: float = 0.5

    nodes: dict = field(default_factory=dict, repr=False)
    edges: list = field(default_factory=list, repr=False)
    terminals: list = field(default_factory=list, repr=False)
    _next_id: int = field(default=0, repr=False)

    def _new_id(self) -> int:
        nid = self._next_id
        self._next_id += 1
        return nid

    def generate(self, origin, direction: float = 0.0):
        """Build the tree from `origin` heading `direction` degrees
        (0 = +x); origin is typically the stenosis outlet center."""
        self.nodes.clear()
        self.edges.clear()
        self.terminals.clear()
        self._next_id = 0

        root_start = self._new_id()
        self.nodes[root_start] = np.asarray(origin, dtype=float)
        root_end = self._new_id()
        theta = np.radians(direction)
        self.nodes[root_end] = self.nodes[root_start] + (
            self.length_ratio * self.r_root
            * np.array([np.cos(theta), np.sin(theta)])
        )
        self.edges.append({
            "from": root_start, "to": root_end,
            "radius": self.r_root, "r_parent": self.r_root,
            "generation": 0,
        })
        self._bifurcate(root_end, self.r_root, direction, generation=1)
        return self

    def _child_radii(self, r_parent: float):
        a, g = self.asymmetry, self.gamma
        ratio = (a / (1.0 - a)) ** (1.0 / 3.0)  # r_left / r_right
        r_left = r_parent * (1.0 + ratio ** (-g)) ** (-1.0 / g)
        return r_left, r_left / ratio

    def _bifurcate(self, parent_node, r_parent, parent_angle, generation):
        if generation > self.n_generations:
            self.terminals.append(parent_node)
            return
        r_left, r_right = self._child_radii(r_parent)
        # thinner branch deflects more (momentum-ish balance)
        angle_left = parent_angle + self.bifurcation_angle * (
            r_right / r_parent
        )
        angle_right = parent_angle - self.bifurcation_angle * (
            r_left / r_parent
        )
        for r_child, angle in (
            (r_left, angle_left), (r_right, angle_right)
        ):
            theta = np.radians(angle)
            child = self._new_id()
            self.nodes[child] = self.nodes[parent_node] + (
                self.length_ratio * r_child
                * np.array([np.cos(theta), np.sin(theta)])
            )
            self.edges.append({
                "from": parent_node, "to": child,
                "radius": r_child, "r_parent": r_parent,
                "generation": generation,
            })
            self._bifurcate(child, r_child, angle, generation + 1)

    @property
    def bifurcation_points(self):
        children_of: dict = {}
        for e in self.edges:
            children_of.setdefault(e["from"], []).append(e)
        return [
            {
                "node": nid,
                "pos": self.nodes[nid],
                "r_min": min(e["radius"] for e in ch),
            }
            for nid, ch in children_of.items()
            if len(ch) >= 2
        ]

    def apply_modifications(
        self,
        vessel_loss_factor: float = 0.0,
        hyperemia_factor: float = 1.0,
        wall_severity: float = 0.0,
        wall_level_threshold: int = 0,
    ):
        """Prune / dilate / thicken the generated tree — the 2D analogue
        of VascularTree.apply_modifications (reference
        src/geom/tree/tree_model.py:26-42): vessel rarefaction removes
        the deepest terminal branches (parents losing both children
        become terminals), hyperemia dilates every lumen radius by a
        factor, wall thickening shrinks the lumen radius by (1 - s)
        for generations at or past a depth threshold."""
        if vessel_loss_factor > 0:
            n_remove = int(round(vessel_loss_factor * len(self.terminals)))
            for _ in range(n_remove):
                if len(self.terminals) <= 1:
                    break
                gen_of = {e["to"]: e["generation"] for e in self.edges}
                deepest = max(
                    self.terminals, key=lambda n: gen_of.get(n, 0)
                )
                if gen_of.get(deepest, 0) == 0:
                    break
                parent = next(
                    e["from"] for e in self.edges if e["to"] == deepest
                )
                self.edges = [e for e in self.edges if e["to"] != deepest]
                self.nodes.pop(deepest, None)
                self.terminals.remove(deepest)
                if not any(e["from"] == parent for e in self.edges):
                    self.terminals.append(parent)
        if hyperemia_factor != 1.0:
            for e in self.edges:
                e["radius"] *= hyperemia_factor
        if wall_severity > 0:
            for e in self.edges:
                if e["generation"] >= wall_level_threshold:
                    e["radius"] *= (1.0 - wall_severity)
        return self

    def poiseuille_resistance(self, mu: float) -> float:
        """Analytic 2D Poiseuille resistance of the whole tree
        (reference stenosis_with_tree_2d.py:207-223):
        R_tree = (3 mu alpha / 2 r0^2) sum_j 2^{-j/3} with alpha the
        length ratio and symmetric splitting."""
        alpha = self.length_ratio
        r0 = self.r_root
        total = sum(
            2.0 ** (-j / 3.0) for j in range(self.n_generations + 1)
        )
        return 3.0 * mu * alpha / (2.0 * r0 ** 2) * total
