"""cfdtpu unified CLI.

Same command surface as the reference CLI (/root/reference/main.py):

    python main.py simulate --simulation lid_driven2D --solver \
        stabilized_schur --T 1 --dt 0.01 --name run [--key value ...]
    python main.py experiment {mesh,solve} --config cfg.yaml [--job_idx N]
    python main.py tree --config cfg.yaml --output out.msh

Unknown --key value pairs are literal-eval'd and forwarded through
Simulation -> Scenario -> Solver constructors, each layer keeping only the
kwargs its signature declares (the reference's extensibility mechanism,
main.py:12-31).
"""

import argparse
import ast
import sys


def parse_unknown_args(unknown):
    kwargs = {}
    i = 0
    while i < len(unknown):
        arg = unknown[i]
        if arg.startswith("--"):
            key = arg[2:]
            if "=" in key:
                key, val = key.split("=", 1)
            elif i + 1 < len(unknown) and not unknown[i + 1].startswith("--"):
                val = unknown[i + 1]
                i += 1
            else:
                val = True
            if isinstance(val, str):
                try:
                    val = ast.literal_eval(val)
                except (ValueError, SyntaxError):
                    pass
            kwargs[key] = val
        i += 1
    return kwargs


def run_simulate(args, unknown):
    """Run a single CFD simulation."""
    from cfdtpu.simulation import Simulation

    kwargs = parse_unknown_args(unknown)
    if args.mu is not None:
        kwargs["mu"] = args.mu
    if args.rho is not None:
        kwargs["rho"] = args.rho
    if args.p_grade is not None:
        kwargs["p_grade"] = args.p_grade

    print(f"Running simulation with extra args: {kwargs}")

    try:
        sim = Simulation(
            name=args.name,
            simulation=args.simulation,
            solver=args.solver,
            T=args.T,
            dt=args.dt,
            output_dir=args.output_dir,
            early_stop_tolerance=args.early_stop_tolerance,
            **kwargs,
        )
    except ValueError as e:
        print(f"\n[ERROR] Invalid configuration: {e}")
        return 1
    except ImportError as e:
        print(f"\n[ERROR] Failed to load module: {e}")
        return 1
    except RuntimeError as e:
        print(f"\n[ERROR] Initialization failed: {e}")
        return 1

    try:
        sim.run()
    except Exception as e:
        print(f"\n[ERROR] Simulation failed: {type(e).__name__}: {e}")
        raise
    return 0


def main():
    parser = argparse.ArgumentParser(
        description="cfdtpu - TPU-native hemodynamic CFD - Unified CLI",
        formatter_class=argparse.RawDescriptionHelpFormatter,
    )
    hpc_parent = argparse.ArgumentParser(add_help=False)
    hpc_parent.add_argument(
        "--hpc", action="store_true",
        help="Dispatch to a SLURM cluster (sbatch job generation)",
    )
    hpc_parent.add_argument(
        "--distributed", action="store_true",
        help="Initialize jax.distributed (multi-process SPMD launch — "
             "the mpirun -n N analogue; auto-detects the cluster env "
             "unless --coordinator/--num_processes/--process_id given)",
    )
    hpc_parent.add_argument("--coordinator", default=None)
    hpc_parent.add_argument("--num_processes", type=int, default=None)
    hpc_parent.add_argument("--process_id", type=int, default=None)

    subparsers = parser.add_subparsers(dest="command", help="Command")

    # -- simulate -------------------------------------------------------
    sim_parser = subparsers.add_parser(
        "simulate", parents=[hpc_parent], help="Run a CFD simulation"
    )
    sim_parser.add_argument(
        "--simulation", required=True, help="Scenario name (e.g. dfg_1)"
    )
    sim_parser.add_argument(
        "--solver", required=True, help="Solver name (e.g. stabilized_schur)"
    )
    sim_parser.add_argument("--mu", type=float, default=None, help="Viscosity")
    sim_parser.add_argument("--rho", type=float, default=None, help="Density")
    sim_parser.add_argument("--T", type=float, required=True, help="Total time")
    sim_parser.add_argument("--dt", type=float, required=True, help="Time step")
    sim_parser.add_argument("--name", required=True, help="Name of the run")
    sim_parser.add_argument(
        "--output_dir", default="results", help="Output directory"
    )
    sim_parser.add_argument(
        "--early_stop_tolerance", type=float, default=1e-5,
        help="Tolerance for early stopping the simulation",
    )
    sim_parser.add_argument(
        "--cores", type=int, default=1,
        help="Number of chips/processes per job (for HPC solve)",
    )
    sim_parser.add_argument(
        "--p_grade", type=int, default=None,
        help="Polynomial degree for velocity and pressure spaces "
        "(p-refinement, default: 1)",
    )
    sim_parser.add_argument(
        "--time_limit", type=str, default=None,
        help="Time limit for SLURM job (e.g. 00:30:00, requires --hpc)",
    )

    # -- experiment -----------------------------------------------------
    exp_parser = subparsers.add_parser(
        "experiment", help="Experiment-matrix manager"
    )
    exp_common = argparse.ArgumentParser(add_help=False)
    exp_common.add_argument(
        "--config", type=str, required=True, help="Path to the YAML config"
    )
    exp_common.add_argument(
        "--output", type=str, default="results/experiments",
        dest="exp_output", help="Base directory for results",
    )
    exp_common.add_argument(
        "--job_idx", type=int, default=None,
        help="Index of the experiment to run (for job arrays)",
    )
    exp_subparsers = exp_parser.add_subparsers(
        dest="exp_command", help="experiment subcommands"
    )
    exp_mesh_parser = exp_subparsers.add_parser(
        "mesh", parents=[exp_common, hpc_parent],
        help="Generate meshes for the experiment matrix",
    )
    exp_mesh_parser.add_argument(
        "--mode", choices=["all", "tree", "geometry"], default="all",
        dest="meshing_mode", help="Meshing stage to run",
    )
    exp_solve_parser = exp_subparsers.add_parser(
        "solve", parents=[exp_common, hpc_parent],
        help="Solve the experiment matrix",
    )
    exp_solve_parser.add_argument(
        "--cores", type=int, default=1,
        help="Number of chips/processes per job",
    )
    exp_solve_parser.add_argument(
        "--watch", action="store_true", default=False,
        help="After submitting an HPC job, watch it",
    )
    exp_solve_parser.add_argument(
        "--time_limit", type=str, default=None,
        help="Time limit for each SLURM job",
    )
    exp_solve_parser.add_argument(
        "--early_stop_tolerance", type=float, default=None,
        help="Override early stop tolerance for all experiments",
    )
    exp_solve_parser.add_argument(
        "--monitor", action="store_true", default=False,
        help="Enable solver monitoring output",
    )

    # -- tree -----------------------------------------------------------
    tree_parser = subparsers.add_parser(
        "tree", parents=[hpc_parent], help="Generate a vascular tree"
    )
    tree_parser.add_argument(
        "--config", type=str, required=True, help="Path to the YAML config"
    )
    tree_parser.add_argument(
        "--output", type=str, required=True,
        help="Output path for the mesh (.msh)",
    )
    tree_parser.add_argument(
        "--bind", action="store_true",
        help="Bind the current directory (container compat flag)",
    )
    tree_parser.add_argument(
        "--perf_point", type=float, nargs=3,
        help="Perfusion point in mm (x y z)",
    )

    args, unknown = parser.parse_known_args()

    if getattr(args, "distributed", False):
        from cfdtpu.dist.process import init_distributed, process_index

        init_distributed(args.coordinator, args.num_processes,
                         args.process_id)
        print(f"[distributed] process {process_index()} up")

    if getattr(args, "hpc", False):
        from cfdtpu.experiments.hpc import dispatch_hpc

        sys.argv = [a for a in sys.argv if a != "--hpc"]
        dispatch_hpc(args, unknown)
        return 0

    if args.command == "simulate":
        return run_simulate(args, unknown)
    elif args.command == "experiment":
        from cfdtpu.experiments.main import run

        return run(args)
    elif args.command == "tree":
        from cfdtpu.geom.tree.main import run

        return run(args)
    else:
        parser.print_help()
        return 1


if __name__ == "__main__":
    sys.exit(main() or 0)
