"""VascuSynth wrapper: input-file generation + binary invocation + cache.

Rebuild of /root/reference/src/geom/tree/vascusynth_wrapper.py: writes the
oxygenation/supply voxel maps (100^3 grid) and the parameter/config files
VascuSynth consumes (PERF_POINT/PRESSURE/FLOW, GAMMA = Murray exponent,
LAMBDA, MIN_DISTANCE, NUM_NODES, RANDOM_SEED), computes
voxel_width = (volume_mL * 1000)^(1/3) / 100 (:5-97), invokes the binary
when available (the reference runs it inside a Singularity container,
vascusynth.sh:61-64), and caches the GXL output. Without the binary the
procedural VascularTree2D generator is the native alternative.
"""

from __future__ import annotations

import os
import shutil
import subprocess

GRID = 100


def voxel_width_mm(volume_mL: float) -> float:
    return (volume_mL * 1000.0) ** (1.0 / 3.0) / GRID


def write_vascusynth_inputs(
    workdir: str,
    perf_point=(0, 49, 49),
    perf_pressure: float = 133000.0,
    term_pressure: float = 8125.0,
    perf_flow: float = 8.33,
    gamma: float = 3.0,
    lambda_exp: float = 2.0,
    mu_exp: float = 1.0,
    min_distance: float = 1.0,
    num_nodes: int = 32,
    random_seed: int = 0,
    volume_mL: float = 100.0,
):
    """Write oxygenation map, supply map and config; returns paths dict."""
    os.makedirs(workdir, exist_ok=True)
    oxy = os.path.join(workdir, "oxygenation_map.txt")
    sup = os.path.join(workdir, "supply_map.txt")
    par = os.path.join(workdir, "params.txt")
    cfg = os.path.join(workdir, "config.txt")

    with open(oxy, "w") as f:
        f.write(f"0 0 0 {GRID} {GRID} {GRID}\n1\n")
    with open(sup, "w") as f:
        f.write(f"0 0 0 {GRID} {GRID} {GRID}\n5\n0.65 0.34 0.01 7 1\n")

    with open(par, "w") as f:
        f.write(
            "SUPPLY_MAP: supply_map.txt\n"
            "OXYGENATION_MAP: oxygenation_map.txt\n"
            f"PERF_POINT: {perf_point[0]} {perf_point[1]} {perf_point[2]}\n"
            f"PERF_PRESSURE: {perf_pressure}\n"
            f"TERM_PRESSURE: {term_pressure}\n"
            f"PERF_FLOW: {perf_flow}\n"
            f"RHO: 0.036\n"
            f"GAMMA: {gamma}\n"
            f"LAMBDA: {lambda_exp}\n"
            f"MU: {mu_exp}\n"
            f"MIN_DISTANCE: {min_distance}\n"
            f"NUM_NODES: {num_nodes}\n"
            f"VOXEL_WIDTH: {voxel_width_mm(volume_mL)}\n"
            f"CLOSEST_NEIGHBOURS: 5\n"
            f"RANDOM_SEED: {random_seed}\n"
        )
    with open(cfg, "w") as f:
        f.write("params.txt\ntree_structure.xml\n")
    return {"params": par, "config": cfg, "workdir": workdir}


def generate_vascusynth_tree(
    workdir: str,
    binary: str | None = None,
    cache: bool = True,
    **params,
):
    """Run VascuSynth; returns the GXL path. Uses the cached GXL when
    present (reference :87-89). Raises with guidance when no binary is
    available in this environment."""
    gxl = os.path.join(workdir, "tree_structure.xml")
    if cache and os.path.exists(gxl):
        return gxl
    write_vascusynth_inputs(workdir, **params)

    binary = binary or shutil.which("VascuSynth") or shutil.which(
        "vascusynth"
    )
    if binary is None:
        raise RuntimeError(
            "VascuSynth binary not found. 3D synthetic trees require the "
            "external VascuSynth tool (the reference runs it inside "
            "vascusynth.sif). Use the native VascularTree2D procedural "
            "generator, or provide a precomputed GXL/.msh."
        )
    subprocess.run(
        [binary, "config.txt"], cwd=workdir, check=True,
        capture_output=True,
    )
    if not os.path.exists(gxl):
        raise RuntimeError("VascuSynth ran but produced no GXL output")
    return gxl
