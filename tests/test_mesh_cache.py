"""Mesh disk cache (mesh/cache.py): the cached reload must reproduce the
generator's output bit-for-bit — cached step executables
(JAX_COMPILATION_CACHE_DIR) were compiled against the generated mesh's
shapes and index maps, so any drift invalidates them silently."""

import numpy as np

from cfdtpu.geom.dfg import generate_dfg_mesh
from cfdtpu.mesh.cache import cache_path, load_mesh, save_mesh


def test_dfg_mesh_cache_roundtrip_exact(tmp_path, monkeypatch):
    monkeypatch.setenv("CFDTPU_MESH_CACHE", str(tmp_path))
    m1 = generate_dfg_mesh(res_scale=2.0, dtype=np.float32)  # writes
    files = list(tmp_path.glob("dfg2d_*.npz"))
    assert len(files) == 1
    m2 = generate_dfg_mesh(res_scale=2.0, dtype=np.float32)  # reads
    for attr in ("points", "cells", "facets", "facet_cells",
                 "facet_local_index", "facet_tags"):
        assert np.array_equal(getattr(m1, attr), getattr(m2, attr)), attr
    assert m1.cell_type == m2.cell_type
    assert np.dtype(m1.dtype) == np.dtype(m2.dtype)
    assert m2.points.dtype == np.float32


def test_mesh_cache_key_separates_params(tmp_path, monkeypatch):
    monkeypatch.setenv("CFDTPU_MESH_CACHE", str(tmp_path))
    generate_dfg_mesh(res_scale=2.0, dtype=np.float32)
    generate_dfg_mesh(res_scale=2.0, dtype=np.float64)
    generate_dfg_mesh(res_scale=2.5, dtype=np.float32)
    assert len(list(tmp_path.glob("dfg2d_*.npz"))) == 3


def test_mesh_cache_disabled_and_corrupt(tmp_path, monkeypatch):
    monkeypatch.setenv("CFDTPU_MESH_CACHE", "")
    assert cache_path("dfg2d", (1.0,)) is None
    # corrupt entry falls through to regeneration
    monkeypatch.setenv("CFDTPU_MESH_CACHE", str(tmp_path))
    p = cache_path("dfg2d", (1.0,))
    with open(p, "wb") as f:
        f.write(b"not an npz")
    assert load_mesh(p) is None
    m = generate_dfg_mesh(res_scale=2.0, dtype=np.float32)
    save_mesh(p, m)
    m2 = load_mesh(p)
    assert np.array_equal(m.points, m2.points)
