"""Strict-schema experiment config loader.

Rebuild of /root/reference/src/utils/hpc.py:8-287: YAML configs with a
whitelisted schema — top-level sections matrix / base_params /
simulation_params plus the structured artery_params / tree_params /
fluid_params sections which are merged into base_params — hard errors on
any unknown section or key, and a regex fallback parser for environments
without PyYAML (login nodes in the reference's case).
"""

from __future__ import annotations

import ast
import re

KNOWN_SECTIONS = {
    "matrix",
    "base_params",
    "simulation_params",
    "artery_params",
    "tree_params",
    "fluid_params",
}
MERGE_INTO_BASE = {"artery_params", "tree_params", "fluid_params"}

VALID_BASE_PARAMS = {
    "radius_in", "radius_out", "length", "slope", "stenosis_position",
    "stenosis_severity", "stenosis_slope", "coupling_slope",
    "q_in", "q_in_hyper", "p_terminal", "p_inlet", "p_outlet",
    "tree_volume", "n_terminal", "perf_pressure", "term_pressure",
    "murray_exponent", "closest_neighbours", "random_seed",
    "wall_thickening_severity", "thickening_level_threshold",
    "vessel_loss_factor", "hyperemia_dilation_factor",
    "mu", "rho", "artery_mesh_size_from_curvature",
    "solver", "T", "dt", "early_stop_tolerance", "bc_type",
    # native implicit 3D mesher knobs (geom/merged3d.py): cell size as a
    # fraction of the minimum vessel radius, axial sampling of the
    # stenosis radius law
    "mesh_resolution", "n_axial", "volume_mL",
}

VALID_SIMULATION_PARAMS = {
    "solver", "T", "dt", "mu", "rho", "q_in", "q_in_hyper", "p_inlet",
    "p_outlet", "p_terminal", "bc_type", "geometry_type", "hyperemia",
    "early_stop_tolerance",
}

VALID_MATRIX_PARAMS = {
    "hyperemia", "vessel_loss_factor", "wall_thickening_severity",
    "thickening_level_threshold", "stenosis_severity",
    "stenosis_position", "lumen_thickening_factor",
    "hyperemia_dilation_factor", "bc_type", "geometry_type", "solver",
    "stenosis_slope", "p_inlet", "p_terminal", "q_in", "q_in_hyper",
    "p_outlet", "artery_mesh_size_from_curvature",
    "early_stop_tolerance",
}

SECTION_SCHEMA = {
    "base_params": VALID_BASE_PARAMS,
    "simulation_params": VALID_SIMULATION_PARAMS,
    "matrix": VALID_MATRIX_PARAMS,
}


def _validate(config: dict, source: str) -> None:
    unknown_sections = set(config.keys()) - KNOWN_SECTIONS
    if unknown_sections:
        raise ValueError(
            f"[CONFIG ERROR] {source}: unknown top-level section(s): "
            f"{sorted(unknown_sections)}.\n"
            f"  Allowed sections: {sorted(KNOWN_SECTIONS)}"
        )
    for section, schema in SECTION_SCHEMA.items():
        data = config.get(section)
        if not isinstance(data, dict):
            continue
        unknown = set(data.keys()) - schema
        if unknown:
            raise ValueError(
                f"[CONFIG ERROR] {source}: unknown parameter(s) in "
                f"'{section}': {sorted(unknown)}.\n"
                f"  Allowed parameters: {sorted(schema)}"
            )


def load_config(config_path) -> dict:
    try:
        import yaml

        with open(config_path) as f:
            raw = yaml.safe_load(f)
        if raw is None:
            raise ValueError(
                f"[CONFIG ERROR] {config_path}: file is empty or could "
                f"not be parsed."
            )
    except ImportError:
        raw = _fallback_parse(config_path)

    unknown_sections = set(raw.keys()) - KNOWN_SECTIONS
    if unknown_sections:
        raise ValueError(
            f"[CONFIG ERROR] {config_path}: unknown top-level "
            f"section(s): {sorted(unknown_sections)}.\n"
            f"  Allowed sections: {sorted(KNOWN_SECTIONS)}"
        )
    for section in MERGE_INTO_BASE:
        if isinstance(raw.get(section), dict):
            unknown = set(raw[section].keys()) - VALID_BASE_PARAMS
            if unknown:
                raise ValueError(
                    f"[CONFIG ERROR] {config_path}: unknown parameter(s) "
                    f"in '{section}': {sorted(unknown)}.\n"
                    f"  Allowed parameters: {sorted(VALID_BASE_PARAMS)}"
                )
    if any(k in raw for k in MERGE_INTO_BASE):
        merged = dict(raw.get("base_params", {}))
        for section in MERGE_INTO_BASE:
            merged.update(raw.pop(section, {}) or {})
        raw["base_params"] = merged

    _validate(raw, str(config_path))
    return raw


def _fallback_parse(config_path) -> dict:
    """Indentation-based parser for PyYAML-less environments (reference
    :204-287)."""
    config: dict = {
        s: {} for s in KNOWN_SECTIONS if s not in MERGE_INTO_BASE
    }
    config["base_params"] = {}
    current: dict | None = None
    stack: list = []

    with open(config_path, encoding="utf-8") as f:
        lines = f.readlines()

    for line_no, line in enumerate(lines, start=1):
        content = line.split("#")[0]
        stripped = content.strip()
        if not stripped:
            continue
        indent = len(content) - len(content.lstrip())
        m = re.match(r"^([^:]+):\s*(.*)$", stripped)
        if not m:
            continue
        key, val_str = m.group(1).strip(), m.group(2).strip()

        if indent == 0:
            if key in MERGE_INTO_BASE:
                current = config["base_params"]
            elif key in KNOWN_SECTIONS:
                current = config[key]
            else:
                raise ValueError(
                    f"[CONFIG ERROR] {config_path} line {line_no}: "
                    f"unknown section '{key}'"
                )
            stack = [(0, current)]
            continue
        if current is None:
            continue
        while stack and indent <= stack[-1][0] and stack[-1][0] != 0:
            stack.pop()
        if not stack:
            continue
        parent = stack[-1][1]
        if not val_str:
            nested: dict = {}
            parent[key] = nested
            stack.append((indent, nested))
        else:
            if val_str.lower() == "true":
                val = True
            elif val_str.lower() == "false":
                val = False
            else:
                try:
                    val = ast.literal_eval(val_str)
                except (ValueError, SyntaxError):
                    val = val_str
            parent[key] = val

    _validate(config, str(config_path))
    return config
