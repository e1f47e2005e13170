"""Precision policy.

The reference runs PETSc in float64 everywhere. On TPU, float64 is
emulated and slow; float32 is the native fast path and is sufficient for
the engineering quantities (drag/lift, FFR, WSS) with looser Newton/Krylov
tolerances. Policy: dtype="auto" resolves to float32 on accelerator
backends and float64 on CPU; every scenario/solver accepts an explicit
dtype override.
"""

from __future__ import annotations

import numpy as np


def resolve_dtype(dtype) -> np.dtype:
    if dtype is None or dtype == "auto":
        import jax

        backend = jax.default_backend()
        return np.dtype(np.float64 if backend == "cpu" else np.float32)
    return np.dtype(dtype)


def default_tolerances(dtype) -> dict:
    """Dtype-appropriate Newton/Krylov tolerances (f64 values follow the
    reference PETSc defaults, stabilized_schur.py:269-273)."""
    if np.dtype(dtype) == np.float32:
        return {
            "snes_rtol": 1e-5,
            "snes_atol": 1e-8,
            "snes_stol": 1e-6,
            "ksp_rtol": 1e-4,
        }
    return {
        "snes_rtol": 1e-8,
        "snes_atol": 1e-10,
        "snes_stol": 1e-8,
        "ksp_rtol": 1e-5,
    }
