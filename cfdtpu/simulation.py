"""Simulation orchestrator.

Rebuild of /root/reference/src/simulation.py: validates arguments, loads the
scenario module dynamically (first Scenario subclass found by
introspection), filters constructor kwargs against the scenario signature
with helpful missing-parameter errors, builds the output directory
<output_dir>/<scenario>/<timestamp>_<name>/, writes simulation_params.txt
including the git commit, and runs the scenario.
"""

from __future__ import annotations

import inspect
import os
import subprocess
from datetime import datetime
from importlib import import_module
from pathlib import Path
from typing import Any, Optional, Type, Union

from .scenarios.base import Scenario


def resolve_scenario_class(module, scenario_name: str):
    """Pick the Scenario subclass a CLI scenario name means.

    Candidates are taken in DEFINITION order (vars(module) preserves
    it); inspect.getmembers is alphabetical, which used to pick
    PipeCylinder2D2Simulation for 'pipe_cylinder' and an IMPORTED base
    class for 'stenosis_with_tree_2d'. Classes defined in the module
    beat imported ones; a class whose normalized name matches the
    scenario name (modulo a Simulation/Benchmark/Scenario/Steady
    suffix) beats definition order. Returns None if the module defines
    no Scenario subclass."""
    members = [
        (k, v) for k, v in vars(module).items()
        if inspect.isclass(v) and issubclass(v, Scenario)
        and v is not Scenario
    ]
    own = [kv for kv in members if kv[1].__module__ == module.__name__]
    pool = own or members
    want = scenario_name.lower().replace("_", "")
    for k, v in pool:
        norm = k.lower().replace("_", "")
        if norm in (
            want, want + "simulation", want + "benchmark",
            want + "scenario", want + "steady",
        ):
            return v
    return pool[0][1] if pool else None


class Simulation:
    def __init__(
        self,
        name: str,
        simulation: Union[str, Type[Scenario]],
        solver: str,
        T: Union[float, str],
        dt: Union[float, str],
        output_dir: Union[str, Path] = "results",
        **kwargs: Any,
    ):
        if not name or not isinstance(name, str):
            raise ValueError("'name' must be a non-empty string.")
        if not simulation:
            raise ValueError(
                "'simulation' must be provided (string or Scenario class)."
            )
        if not solver or not isinstance(solver, str):
            raise ValueError(
                "'solver' must be a non-empty string specifying the solver "
                "module."
            )

        self.name = name
        self.scenario_name = (
            simulation
            if isinstance(simulation, str)
            else getattr(simulation, "__name__", "custom_scenario")
        )
        self.solver_name = solver
        self.output_dir = output_dir
        self.kwargs = kwargs

        self._scenario_class_override = None
        if inspect.isclass(simulation) and issubclass(simulation, Scenario):
            self._scenario_class_override = simulation

        try:
            self.T = float(T)
        except (TypeError, ValueError) as e:
            raise ValueError(
                f"'T' (total time) must be a valid number, got: {T!r}"
            ) from e
        try:
            self.dt = float(dt)
        except (TypeError, ValueError) as e:
            raise ValueError(
                f"'dt' (time step) must be a valid number, got: {dt!r}"
            ) from e

        if self.T <= 0:
            raise ValueError(f"'T' (total time) must be positive, got: {self.T}")
        if self.dt <= 0:
            raise ValueError(f"'dt' (time step) must be positive, got: {self.dt}")
        if self.dt > self.T:
            raise ValueError(
                f"'dt' ({self.dt}) cannot be greater than 'T' ({self.T})"
            )

        self.mu = kwargs.get("mu")
        self.rho = kwargs.get("rho")

        self.scenario_instance = self._load_scenario()

    # ------------------------------------------------------------------
    def _load_scenario(self) -> Scenario:
        scenario_class = self._scenario_class_override

        if not scenario_class:
            try:
                module = import_module(
                    f"cfdtpu.scenarios.{self.scenario_name}"
                )
            except ImportError as e:
                available = self._list_available_scenarios()
                raise ImportError(
                    f"Could not import scenario '{self.scenario_name}'. "
                    f"Ensure cfdtpu/scenarios/{self.scenario_name}.py "
                    f"exists.\nUnderlying error: {type(e).__name__}: {e}\n"
                    f"Available scenarios: {available}"
                ) from e

            scenario_class = resolve_scenario_class(
                module, self.scenario_name
            )

        if not scenario_class:
            raise ValueError(
                f"No Scenario subclass found for '{self.scenario_name}'. "
                f"Ensure the module exists and defines a class inheriting "
                f"from Scenario."
            )

        sig = inspect.signature(scenario_class.__init__)
        available_params = {
            "solver_name": self.solver_name,
            "dt": self.dt,
            "T": self.T,
        }
        available_params.update(self.kwargs)

        init_args = {}
        missing_params = []
        has_var_keyword = False
        for param_name, param in sig.parameters.items():
            if param_name == "self":
                continue
            if param.kind == inspect.Parameter.VAR_KEYWORD:
                has_var_keyword = True
                continue
            if param_name in available_params:
                init_args[param_name] = available_params[param_name]
            elif param.default == inspect.Parameter.empty:
                missing_params.append(param_name)

        if missing_params:
            raise ValueError(
                f"Missing required parameter(s) for scenario "
                f"'{self.scenario_name}': {missing_params}. Pass them via "
                f"command line arguments, e.g.: "
                + " ".join(f"--{p}=<value>" for p in missing_params)
            )

        if has_var_keyword:
            for key, value in available_params.items():
                if key not in init_args:
                    init_args[key] = value

        try:
            print(
                f"  [SIM] Instantiating scenario "
                f"'{self.scenario_name}'...", flush=True
            )
            instance = scenario_class(**init_args)
            print("  [SIM] Scenario instantiated OK.", flush=True)
            return instance
        except TypeError as e:
            raise RuntimeError(
                f"Failed to instantiate scenario '{self.scenario_name}' "
                f"with arguments {init_args}: {e}"
            ) from e

    @staticmethod
    def _list_available_scenarios() -> list[str]:
        scenarios_dir = os.path.join(
            os.path.dirname(__file__), "scenarios"
        )
        try:
            files = os.listdir(scenarios_dir)
            scenarios = [
                f[:-3]
                for f in files
                if f.endswith(".py") and not f.startswith("_")
                and f != "base.py"
            ]
            return scenarios if scenarios else ["(none found)"]
        except OSError:
            return ["(could not list)"]

    # ------------------------------------------------------------------
    def run(self, save_path: Optional[Union[str, Path]] = None) -> str:
        if save_path is None:
            timestamp = datetime.now().strftime("%Y-%m-%dT%H.%M.%S")
            folder_name = f"{timestamp}_{self.name}"
            save_path = os.path.abspath(
                os.path.join(self.output_dir, self.scenario_name, folder_name)
            )
        else:
            save_path = os.path.abspath(save_path)

        # rank-0 I/O guard + barrier before compute, mirroring the
        # reference's `if rank == 0` + comm.barrier()
        # (/root/reference/src/simulation.py:229,267)
        from .dist.process import barrier, is_main_process

        if not is_main_process():
            barrier("simulation-setup")
            self.scenario_instance.setup()
            return self.scenario_instance.solve(output_folder=save_path)

        os.makedirs(save_path, exist_ok=True)
        with open(os.path.join(save_path, "simulation_params.txt"), "w") as f:
            f.write(f"Scenario: {self.scenario_name}\n")
            f.write(f"Run Name: {self.name}\n")
            f.write(f"Solver: {self.solver_name}\n")
            f.write(
                f"mu: {self.mu if self.mu is not None else '(scenario default)'}\n"
            )
            f.write(
                f"rho: {self.rho if self.rho is not None else '(scenario default)'}\n"
            )
            f.write(f"T: {self.T}\n")
            f.write(f"dt: {self.dt}\n")
            for k, v in self.kwargs.items():
                if k not in ("mu", "rho"):
                    f.write(f"{k}: {v}\n")
            try:
                commit_id = (
                    subprocess.check_output(
                        ["git", "rev-parse", "HEAD"],
                        stderr=subprocess.DEVNULL,
                        cwd=os.path.dirname(__file__),
                    )
                    .strip()
                    .decode("utf-8")
                )
                f.write(f"Source Code Version (Git Commit): {commit_id}\n")
            except Exception:
                f.write("Source Code Version: Unknown (git not valid)\n")

        print(
            f"Initializing simulation '{self.name}' with scenario "
            f"'{self.scenario_name}'..."
        )

        barrier("simulation-setup")
        self.scenario_instance.setup()
        result_path = self.scenario_instance.solve(output_folder=save_path)
        print(f"Simulation completed. Results saved to: {result_path}")
        return result_path
