"""Experiment-matrix solving.

Rebuild of /root/reference/src/experiments/solving.py:22-147: per
combination, locate the mesh (experiment dir, then the results<->meshes
sibling convention), build the frozen scenario class, and run a
Simulation with the solver passthrough params (p_inlet, p_outlet,
p_terminal, beta_nitsche).
"""

from __future__ import annotations

from pathlib import Path

from ..simulation import Simulation
from ..utils.config import load_config
from .meshing import experiment_name, generate_experiment_matrix
from .scenario_factory import create_experiment_scenario_class


def run_solving(config_path, output_base, job_idx=None,
                early_stop_override=None) -> int:
    config = load_config(config_path)
    base_params = config.get("base_params", {})
    sim_params = config.get(
        "simulation_params",
        {"solver": "stabilized_schur", "T": 1.0, "dt": 0.01,
         "mu": 3.5e-3, "rho": 1.06e-3},
    )
    effective = {**base_params, **sim_params}

    combinations = generate_experiment_matrix(config)
    output_base = Path(output_base)
    print(f"[INFO] Total experiments: {len(combinations)}")

    if job_idx is not None:
        if not 0 <= job_idx < len(combinations):
            print(
                f"[ERROR] job_idx {job_idx} out of range "
                f"(0-{len(combinations) - 1})"
            )
            return 1
        print(f"[INFO] Running ONLY experiment index {job_idx}")
        todo = [(job_idx, combinations[job_idx])]
    else:
        todo = list(enumerate(combinations))

    failures = 0
    for i, experiment in todo:
        run_params = {**effective, **experiment}
        exp_name = experiment_name(i, experiment)
        exp_dir = output_base / exp_name
        exp_dir.mkdir(parents=True, exist_ok=True)

        # mesh search: experiment dir first, then results<->meshes sibling
        search_dirs = [exp_dir]
        if "results" in str(output_base):
            alt = Path(str(output_base).replace("results", "meshes", 1))
            search_dirs.append(alt / exp_name)
        mesh_path = None
        for d in search_dirs:
            for candidate in (d / "mesh.msh", d / "mesh.npz"):
                if candidate.exists():
                    mesh_path = candidate
                    break
            if mesh_path:
                break
        if not mesh_path:
            print(f"[WARN] no mesh found for {exp_name}.")
            print(f"       searched: {[str(d) for d in search_dirs]}")
            continue

        print(f"[SOLVE] {exp_name} (mesh: {mesh_path})", flush=True)
        try:
            ScenarioClass = create_experiment_scenario_class(
                mesh_path, experiment, run_params
            )
            if early_stop_override is not None:
                run_params["early_stop_tolerance"] = early_stop_override
            solver_name = run_params.get("solver")
            if not solver_name:
                raise ValueError(
                    "Solver not specified in experiment matrix or "
                    "simulation_params"
                )
            passthrough = {
                k: run_params[k]
                for k in ("p_inlet", "p_outlet", "p_terminal",
                          "beta_nitsche")
                if k in run_params
            }
            extra = {}
            if "early_stop_tolerance" in run_params:
                extra["early_stop_tolerance"] = run_params[
                    "early_stop_tolerance"
                ]
            sim = Simulation(
                name=exp_name,
                simulation=ScenarioClass,
                solver=solver_name,
                T=run_params["T"],
                dt=run_params["dt"],
                output_dir=str(output_base),
                mu=run_params.get("mu", 3.5e-3),
                rho=run_params.get("rho", 1.06e-3),
                **extra,
                **passthrough,
                **{k: v for k, v in experiment.items()
                   if k not in ("solver",)},
            )
            sim.run(save_path=str(exp_dir / "solution"))
        except Exception as e:
            failures += 1
            print(f"[ERROR] {exp_name} failed: {type(e).__name__}: {e}")
    return 1 if failures else 0
