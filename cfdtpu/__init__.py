"""cfdtpu — TPU-native incompressible Navier-Stokes FEM framework for hemodynamics.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the reference
FEniCSx/PETSc framework (JuanJoZP/cfd-hemodynamic): stabilized equal-order
finite elements, matrix-free Newton-Krylov solvers, hemodynamic boundary
conditions (weak pressure, Nitsche, backflow, resistance outlets), vascular
geometry scenarios and an experiment matrix — all designed for TPU execution:

- element kernels are vmapped JAX functions over cells (VPU-friendly),
- global assembly is scatter-add / segment_sum (no sparse matrices needed
  on the hot path),
- Newton linearization is matrix-free via jax.jvp (exact Jacobian action),
- Krylov solvers (FGMRES/CG) run fully under jit with lax loops,
- distribution is shard_map over mesh partitions with psum collectives
  (replacing MPI ghost updates / PETSc parallel assembly).

Double precision is enabled globally; all arrays carry explicit dtypes, so
float32 execution (the TPU-native fast path) is selected per-simulation via
the `dtype` argument rather than a global flag.
"""

import jax

# Explicit-dtype discipline: enable x64 so float64 is *available*; every
# array in the framework is created with an explicit dtype, so the TPU fast
# path simply constructs the mesh/state in float32.
jax.config.update("jax_enable_x64", True)

# On TPU, float32 matmuls default to bfloat16 passes, which destroys
# Krylov orthogonalization (GMRES stagnates at its iteration cap). Full
# float32 accumulation is required for the linear algebra; the element
# kernels are VPU-bound so the cost is negligible.
jax.config.update("jax_default_matmul_precision", "highest")

__version__ = "0.1.0"
