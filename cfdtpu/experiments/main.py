"""experiment subcommand dispatch.

Rebuild of /root/reference/src/experiments/main.py:21-61: routes
`experiment mesh` / `experiment solve` to the stage runners.
"""

from __future__ import annotations


def run(args) -> int:
    if args.exp_command == "mesh":
        from .meshing import run_meshing

        return run_meshing(
            args.config, args.exp_output, job_idx=args.job_idx,
            mode=getattr(args, "meshing_mode", "all"),
        )
    if args.exp_command == "solve":
        from .solving import run_solving

        if getattr(args, "monitor", False):
            # per-step stdout stats (see scenarios/base.py) — the
            # -snes_monitor/-ksp_monitor analogue
            import os

            os.environ["CFDTPU_MONITOR"] = "1"
        return run_solving(
            args.config, args.exp_output, job_idx=args.job_idx,
            early_stop_override=getattr(args, "early_stop_tolerance",
                                        None),
        )
    print("Usage: main.py experiment {mesh,solve} --config <yaml> ...")
    return 1
