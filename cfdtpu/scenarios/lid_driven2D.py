"""Lid-driven cavity scenario.

Rebuild of /root/reference/src/scenarios/lid_driven2D.py: unit square,
no-slip on left/right/bottom walls, unit lid velocity on top excluding the
corners, no pressure BC (constant-pressure nullspace active), Re = 1/mu.
Validated against the Ghia et al. centerline profiles (see
tests/test_lid_driven.py and cfdtpu/validation/ghia.py).
"""

from __future__ import annotations

import numpy as np

from ..mesh import create_unit_square
from ..spaces import BoundaryCondition
from .base import Scenario


class LidDriven2DSimulation(Scenario):
    def __init__(
        self,
        solver_name,
        dt,
        T,
        f=(0, 0),
        *,
        rho=1,
        mu=1,
        nx=50,
        dtype="auto",
        **solver_kwargs,
    ):
        self._mesh = None
        self._bcu = None
        self._bcp = None
        self.Re = str(int(1 / mu))
        self.nx = int(nx)
        from ..utils import resolve_dtype
        self._dtype = resolve_dtype(dtype)
        super().__init__(
            solver_name, "lid_driven2D", rho, mu, dt, T, f, **solver_kwargs
        )
        self.setup()

    @property
    def mesh(self):
        if self._mesh is None:
            self._mesh = create_unit_square(
                self.nx, self.nx, dtype=self._dtype
            )
        return self._mesh

    @property
    def bcu(self):
        if self._bcu is None:
            walls_facets = self.mesh.locate_boundary_facets(self.walls)
            bc_noslip = BoundaryCondition(np.zeros(2, dtype=self._dtype))
            bc_noslip.initTopological(self.mesh.dim - 1, walls_facets)

            lid_facets = self.mesh.locate_boundary_facets(self.lid)
            bc_lid = BoundaryCondition(
                lambda x: np.vstack((np.ones(x.shape[1]), np.zeros(x.shape[1])))
            )
            bc_lid.initTopological(self.mesh.dim - 1, lid_facets)

            self._bcu = [bc_noslip, bc_lid]
        return self._bcu

    @property
    def bcp(self):
        if self._bcp is None:
            self._bcp = []
        return self._bcp

    def initial_velocity(self, x):
        return np.zeros((2, x.shape[1]), dtype=self._dtype)

    def solve(self, output_folder, afterStepCallback=None):
        out_path = super().solve(output_folder, afterStepCallback)
        from ..dist.process import is_main_process

        if is_main_process():
            self.save_benchmark_plot(out_path)
        return out_path

    def save_benchmark_plot(self, results_path):
        """Compare the centerline u(y) profile against Ghia et al. and save
        benchmark_<Re>.csv (+ png when matplotlib is available); mirrors
        /root/reference/src/scenarios/lid_driven2D.py:82-124."""
        import os

        from ..postprocess import eval_at_points
        from ..validation import GHIA_U_CENTERLINE

        re_key = int(self.Re)
        if re_key not in GHIA_U_CENTERLINE:
            print(
                f"Benchmark data for Re={self.Re} not found. Skipping plot."
            )
            return
        y, u_bench = GHIA_U_CENTERLINE[re_key]
        pts = np.stack([np.full_like(y, 0.5), y], axis=-1)
        u_sol = eval_at_points(
            self.solver.V, np.asarray(self.solver.u_sol), pts
        )[:, 0]
        csv = os.path.join(results_path, f"benchmark_{self.Re}.csv")
        with open(csv, "w") as f:
            f.write("y,u_solver,u_ghia\n")
            for yy, us, ub in zip(y, u_sol, u_bench):
                f.write(f"{yy},{us},{ub}\n")
        try:
            import matplotlib

            matplotlib.use("Agg")
            from matplotlib import pyplot as plt

            fig, ax = plt.subplots()
            ax.plot(u_sol, y, "o-", label="cfdtpu")
            ax.plot(u_bench, y, "s--", label="Ghia et al.")
            ax.set_xlabel("u at x=0.5")
            ax.set_ylabel("y")
            ax.legend()
            fig.savefig(
                os.path.join(results_path, f"benchmark_{self.Re}.png")
            )
            plt.close(fig)
        except ImportError:
            pass

    @staticmethod
    def lid(x):
        return np.isclose(x[1], 1.0) & (x[0] > 1e-10) & (x[0] < 1.0 - 1e-10)

    @staticmethod
    def walls(x):
        return np.logical_or.reduce(
            (np.isclose(x[0], 0), np.isclose(x[0], 1), np.isclose(x[1], 0))
        )
