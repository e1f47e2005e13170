"""Multi-process (multi-host) launch support.

The reference launches SPMD ranks with `mpirun -n N python main.py ...`
(/root/reference/src/simulation_hpc.sh:14-19, README:58-69) and guards
all file I/O with `if rank == 0` (/root/reference/src/simulation.py:229,
src/scenario.py:151-164). TPU-native equivalent: `jax.distributed`
initialization behind the CLI `--distributed` flag — every process runs
the same program, JAX wires the global device mesh, and output is
written by process 0 only.

Launch examples (one process per host/accelerator group):
    # explicit flags
    python main.py simulate ... --distributed \
        --coordinator localhost:1234 --num_processes 2 --process_id 0
    # or rely on the environment (SLURM/TPU pods auto-detect)
    srun python main.py simulate ... --distributed
"""

from __future__ import annotations


def init_distributed(coordinator: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> None:
    """Initialize jax.distributed. With no arguments, JAX auto-detects
    the cluster environment (TPU pod metadata / SLURM variables)."""
    import jax

    kw = {}
    if coordinator:
        kw["coordinator_address"] = coordinator
    if num_processes is not None:
        kw["num_processes"] = int(num_processes)
    if process_id is not None:
        kw["process_id"] = int(process_id)
    jax.distributed.initialize(**kw)


def process_index() -> int:
    try:
        import jax

        return int(jax.process_index())
    except Exception:
        return 0


def process_count() -> int:
    try:
        import jax

        return int(jax.process_count())
    except Exception:
        return 1


def is_main_process() -> bool:
    return process_index() == 0


def barrier(name: str = "cfdtpu") -> None:
    """Block until all processes arrive (the comm.barrier() analogue,
    reference simulation.py:267). No-op single-process."""
    if process_count() <= 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)


class _NullWriter:
    """Swallows writes on non-main processes (rank-0 I/O guard)."""

    def write(self, *a, **k):
        pass

    def close(self, *a, **k):
        pass

    def flush(self, *a, **k):
        pass

    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False
