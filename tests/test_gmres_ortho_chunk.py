"""Chunked CGS2 orthogonalization (la/gmres.py::_chunked_cgs).

The fixed-shape sweep reads the full (restart+1, n) Krylov basis every
iteration; chunked sweeps read only the active rows. Same math, so
solutions and iteration counts must agree to rounding.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from cfdtpu.la.gmres import fgmres


def _system(n=120, seed=0):
    rng = np.random.RandomState(seed)
    A = np.eye(n) * 4.0 + 0.5 * rng.randn(n, n) / np.sqrt(n)
    b = rng.randn(n)
    return jnp.asarray(A), jnp.asarray(b)


@pytest.mark.parametrize("chunk", [4, 8, 64])
def test_chunked_matches_full(chunk):
    A, b = _system()
    mv = lambda v: A @ v
    x0, i0 = fgmres(mv, b, restart=30, rtol=1e-10)
    x1, i1 = fgmres(mv, b, restart=30, rtol=1e-10, ortho_chunk=chunk)
    assert int(i0["iters"]) == int(i1["iters"])
    assert bool(i1["converged"])
    assert np.allclose(np.asarray(x0), np.asarray(x1), atol=1e-8)
    # true residual, not just the rotated-g estimate
    r = np.asarray(b - A @ x1)
    assert np.linalg.norm(r) <= 1e-9 * np.linalg.norm(np.asarray(b))


def test_chunk_larger_than_restart():
    A, b = _system(seed=3)
    mv = lambda v: A @ v
    x, info = fgmres(mv, b, restart=10, rtol=1e-10, ortho_chunk=512)
    assert bool(info["converged"])
    r = np.asarray(b - A @ np.asarray(x))
    assert np.linalg.norm(r) <= 1e-9 * np.linalg.norm(np.asarray(b))


def test_chunked_with_restart_cycles():
    # force multiple restart cycles (restart < iterations needed)
    A, b = _system(n=200, seed=7)
    mv = lambda v: A @ v
    x0, i0 = fgmres(mv, b, restart=8, rtol=1e-8)
    x1, i1 = fgmres(mv, b, restart=8, rtol=1e-8, ortho_chunk=4)
    assert bool(i1["converged"])
    assert int(i0["iters"]) == int(i1["iters"])
    assert np.allclose(np.asarray(x0), np.asarray(x1), atol=1e-6)
