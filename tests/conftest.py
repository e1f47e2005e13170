"""Test configuration: force CPU with 8 virtual devices.

Runs before jax is imported (conftest import precedes test modules), so
JAX_PLATFORMS/XLA_FLAGS take effect at first jax import: 8 host-platform
devices let sharding tests exercise multi-chip layouts without hardware
(the analogue of the reference testing MPI with `mpirun -n 4` locally,
README.md:58-69).

NOTE: prefer `make test`, which also clears PALLAS_AXON_POOL_IPS in the
shell env — the axon TPU plugin registers at interpreter *boot* via
sitecustomize (before this file runs) and its relay I/O slows the whole
test process ~10x even on the CPU backend. Setting it here is too late;
the lines below only make sure nothing later re-enables it.
"""

import os

os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)
