"""GXL vascular-graph parser (VascuSynth output format).

Rebuild of the parser in
/root/reference/src/geom/tree/graph_to_mesh.py:144-183: VascuSynth emits a
GXL (XML) graph whose node attributes carry a ` position` tuple (in voxel
units) and whose edge attributes carry a ` radius` (in cm); positions are
scaled by voxel_width into mm and radii are converted cm -> mm (x10).
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

import numpy as np


def parse_gxl(path: str, voxel_width: float = 1.0):
    """Parse a VascuSynth GXL file.

    Returns (nodes: dict[id -> np.ndarray(3,)] in mm,
             edges: list[dict(from, to, radius_mm)]).
    """
    root = ET.parse(path).getroot()
    graph = root.find("graph")
    if graph is None:
        graph = root

    nodes: dict = {}
    for node in graph.findall("node"):
        nid = node.get("id")
        pos = None
        for attr in node.findall("attr"):
            if attr.get("name", "").strip() == "position":
                tup = attr.find("tup")
                vals = [
                    float(f.text)
                    for f in (tup if tup is not None else attr)
                    if f.text is not None
                ]
                pos = np.array(vals[:3], dtype=float) * voxel_width
        if pos is not None:
            nodes[nid] = pos

    edges = []
    for edge in graph.findall("edge"):
        e = {"from": edge.get("from"), "to": edge.get("to"),
             "radius": None}
        for attr in edge.findall("attr"):
            if attr.get("name", "").strip() == "radius":
                val = attr.find("float")
                if val is None:
                    val = attr
                e["radius"] = float(val.text) * 10.0  # cm -> mm
        if e["radius"] is not None:
            edges.append(e)
    return nodes, edges
