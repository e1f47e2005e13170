"""Symbolic-setup disk cache (utils/symcache.py).

The cache must be bit-exact: the persistent-compile-cache executables
were traced against these index maps (same argument as mesh/cache.py),
so a cached load that differs from a fresh build in any element or
dtype is a correctness bug, not a staleness nit.
"""

import numpy as np
import pytest

from cfdtpu.utils.symcache import cached_arrays


@pytest.fixture()
def cache_dir(tmp_path, monkeypatch):
    monkeypatch.setenv("CFDTPU_SYM_CACHE", str(tmp_path))
    return tmp_path


def test_roundtrip_hits_and_is_bit_exact(cache_dir):
    calls = {"n": 0}
    key = (np.arange(7, dtype=np.int64), 3, "tag")

    def build():
        calls["n"] += 1
        return {
            "a": np.array([[1, 2], [3, 4]], dtype=np.int32),
            "b": np.linspace(0, 1, 5),
            "k": np.int64(42),
        }

    first = cached_arrays("t", key, build)
    second = cached_arrays("t", key, build)
    assert calls["n"] == 1  # second call served from disk
    for name in ("a", "b"):
        np.testing.assert_array_equal(first[name], second[name])
        assert first[name].dtype == second[name].dtype
    assert int(second["k"]) == 42


def test_key_includes_array_bytes_and_scalars(cache_dir):
    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return {"x": np.zeros(2)}

    a = np.arange(4)
    cached_arrays("t", (a, 1), build)
    cached_arrays("t", (a + 1, 1), build)   # different array bytes
    cached_arrays("t", (a, 2), build)       # different scalar
    assert calls["n"] == 3


def test_disabled_cache_calls_build_every_time(monkeypatch):
    monkeypatch.setenv("CFDTPU_SYM_CACHE", "")
    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return {"x": np.ones(3)}

    cached_arrays("t", (1,), build)
    cached_arrays("t", (1,), build)
    assert calls["n"] == 2


def test_sorted_scatter_cached_equals_fresh(cache_dir, monkeypatch):
    """A >=2^20-entry scatter (the cache gate) must produce identical
    maps whether built fresh or loaded — exercised through the real
    SortedScatter constructor both ways."""
    from cfdtpu.utils.geometry import SortedScatter

    rng = np.random.default_rng(0)
    n_out = 1 << 18
    flat = rng.integers(0, n_out, size=(1 << 20) + 3)

    monkeypatch.setenv("CFDTPU_SYM_CACHE", "")
    fresh = SortedScatter(flat, n_out)
    monkeypatch.setenv("CFDTPU_SYM_CACHE", str(cache_dir))
    miss = SortedScatter(flat, n_out)    # builds + writes
    hit = SortedScatter(flat, n_out)     # loads
    for s in (miss, hit):
        assert s.K == fresh.K
        if fresh.ell_idx is not None:
            np.testing.assert_array_equal(
                np.asarray(s.ell_idx), np.asarray(fresh.ell_idx)
            )
        else:
            np.testing.assert_array_equal(
                np.asarray(s.perm), np.asarray(fresh.perm)
            )
            np.testing.assert_array_equal(
                np.asarray(s.sorted_ids), np.asarray(fresh.sorted_ids)
            )
    # and the applied result agrees
    vals = rng.standard_normal(flat.size).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(hit(vals)), np.asarray(fresh(vals)), rtol=1e-6
    )
