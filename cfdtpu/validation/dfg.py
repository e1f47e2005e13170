"""DFG flow-around-cylinder benchmark reference values.

The published DFG 2D-1 (steady, Re = 20) reference intervals from
Schaefer & Turek, "Benchmark computations of laminar flow around a
cylinder" (1996) — the quantities the reference validates against
(BASELINE.md: c_D, c_L, dp inside the published intervals):

    c_D in [5.5700, 5.5900]
    c_L in [0.0104, 0.0110]
    dp  in [0.1172, 0.1176]   (p(0.15, 0.2) - p(0.25, 0.2))

The reference repo also ships the FEATFLOW DFG 2D-3 (unsteady) reference
time series (bdforces_q2_lv{2-6}_dt{1-4} / pointvalues_*); those files use
whitespace-separated columns `timestep time bdc horiz vert` — the loader
below reads that format when such files are provided.
"""

from __future__ import annotations

import numpy as np

DFG_2D1_INTERVALS = {
    "cd": (5.5700, 5.5900),
    "cl": (0.0104, 0.0110),
    "dp": (0.1172, 0.1176),
}


def check_dfg_2d1(cd: float, cl: float, dp: float) -> dict:
    """Classify computed functionals against the published intervals;
    returns per-quantity (value, lo, hi, inside, rel_err_to_center)."""
    out = {}
    for name, val in (("cd", cd), ("cl", cl), ("dp", dp)):
        lo, hi = DFG_2D1_INTERVALS[name]
        mid = 0.5 * (lo + hi)
        out[name] = {
            "value": val,
            "interval": (lo, hi),
            "inside": lo <= val <= hi,
            "rel_err": abs(val - mid) / abs(mid),
        }
    return out


def load_featflow_series(path: str) -> np.ndarray:
    """Read a FEATFLOW bdforces/pointvalues reference file: skips '#'/non-
    numeric headers, returns the numeric columns (n, k)."""
    rows = []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if not parts:
                continue
            try:
                rows.append([float(x) for x in parts])
            except ValueError:
                continue
    return np.asarray(rows)
