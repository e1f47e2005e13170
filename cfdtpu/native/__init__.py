"""Native (C++) runtime components, loaded via ctypes.

The compute path is JAX/XLA; the runtime *around* it — mesh topology
preprocessing here — is native C++ where the reference relies on native
code (dolfinx's C++ mesh core). The library is compiled on first use with
g++ and cached next to the source; every entry point has a numpy fallback
so the framework works even without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "fastmesh.cpp")
_LIB = os.path.join(_HERE, "libfastmesh.so")

_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    try:
        if (not os.path.exists(_LIB)
                or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", _LIB],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(_LIB)
        i32p = ctypes.POINTER(ctypes.c_int32)
        lib.boundary_facets.restype = ctypes.c_int64
        lib.boundary_facets.argtypes = [
            i32p, ctypes.c_int64, ctypes.c_int32,
            i32p, ctypes.c_int32, ctypes.c_int32,
            i32p, i32p, i32p,
        ]
        lib.edge_numbering.restype = ctypes.c_int64
        lib.edge_numbering.argtypes = [
            i32p, ctypes.c_int64, ctypes.c_int32,
            i32p, ctypes.c_int32, i32p,
        ]
        _lib = lib
    except (OSError, subprocess.CalledProcessError) as e:
        print(f"[native] fastmesh unavailable ({e}); using numpy fallback")
        _lib = None
    return _lib


def _i32p(arr):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def boundary_facets(cells: np.ndarray, local_facets: np.ndarray):
    """(facets (nf, nfv) in cell-local order, cells_of (nf,), lf_of (nf,))
    or None when the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    cells = np.ascontiguousarray(cells, dtype=np.int32)
    local_facets = np.ascontiguousarray(local_facets, dtype=np.int32)
    nc, nv = cells.shape
    nlf, nfv = local_facets.shape
    cap = nc * nlf
    out_f = np.empty((cap, nfv), dtype=np.int32)
    out_c = np.empty(cap, dtype=np.int32)
    out_lf = np.empty(cap, dtype=np.int32)
    n = lib.boundary_facets(
        _i32p(cells), nc, nv, _i32p(local_facets), nlf, nfv,
        _i32p(out_f), _i32p(out_c), _i32p(out_lf),
    )
    return out_f[:n].copy(), out_c[:n].copy(), out_lf[:n].copy()


def edge_numbering(cells: np.ndarray, local_edges: np.ndarray):
    """(edge_ids (nc, nle), n_edges) or None without the native lib."""
    lib = _load()
    if lib is None:
        return None
    cells = np.ascontiguousarray(cells, dtype=np.int32)
    local_edges = np.ascontiguousarray(local_edges, dtype=np.int32)
    nc, nv = cells.shape
    nle = local_edges.shape[0]
    out = np.empty((nc, nle), dtype=np.int32)
    n_edges = lib.edge_numbering(
        _i32p(cells), nc, nv, _i32p(local_edges), nle, _i32p(out)
    )
    return out, int(n_edges)
