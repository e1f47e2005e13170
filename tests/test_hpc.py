"""HPC dispatcher dry-run tests.

The reference's dispatch_hpc (/root/reference/src/utils/hpc.py:290-628)
builds sbatch command lines: mesh = tree job chained to a geometry job
with --dependency=afterok, solve = array job with --ntasks/--time and
optional --monitor/--watch, simulate = single job with a VascuSynth
pre-job for tree scenarios. These tests assert the dry-run submission
plan (sbatch absent in CI) reproduces that structure.
"""

import os
import types

import pytest

from cfdtpu.experiments import hpc


CONFIG = os.path.join(
    os.path.dirname(__file__), "..", "cfdtpu", "experiments", "config",
    "test_simple.yaml",
)


def _args(**kw):
    defaults = dict(
        command="experiment", exp_command="solve", config=CONFIG,
        exp_output="/tmp/exp_out", job_idx=None, cores=2,
        time_limit=None, monitor=False, watch=False,
        meshing_mode="all",
    )
    defaults.update(kw)
    return types.SimpleNamespace(**defaults)


@pytest.fixture(autouse=True)
def _cwd_tmp(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)  # hpc_jobs/ scripts land here
    hpc._submit.counter = 0
    yield


def _dispatch(capsys, args, unknown=()):
    rc = hpc.dispatch_hpc(args, list(unknown))
    out = capsys.readouterr().out
    assert rc == 0, out
    return out


def test_solve_array_job(capsys):
    out = _dispatch(capsys, _args())
    # one array job over the 2-combination matrix with ntasks
    assert "--array=0-1" in out
    assert "--ntasks=2" in out
    assert "hpc_solve.sh" in out


def test_solve_job_idx_single(capsys):
    out = _dispatch(capsys, _args(job_idx=1))
    assert "--array=1" in out


def test_solve_monitor_and_time(capsys):
    out = _dispatch(capsys, _args(monitor=True, time_limit="01:00:00"))
    assert "--time=01:00:00" in out
    # --monitor must reach the in-job command line
    body = open("hpc_jobs/hpc_solve.sh").read()
    assert "--monitor" in body


def test_solve_watch_prints_tmux_plan(capsys):
    out = _dispatch(capsys, _args(watch=True))
    assert "sacct" in out and "tmux" in out


def test_mesh_chain_afterok(capsys):
    out = _dispatch(capsys, _args(exp_command="mesh"))
    # tree stage then geometry stage chained with afterok on the
    # (dry-run) tree job id
    lines = [l for l in out.splitlines() if l.startswith("[HPC:dry-run] sbatch")]
    assert len(lines) == 2
    assert "hpc_tree.sh" in lines[0]
    assert "hpc_geometry.sh" in lines[1]
    assert "--dependency=afterok:DRY1" in lines[1]


def test_mesh_mode_selects_single_stage(capsys):
    out = _dispatch(capsys, _args(exp_command="mesh",
                                  meshing_mode="geometry"))
    lines = [l for l in out.splitlines() if l.startswith("[HPC:dry-run] sbatch")]
    assert len(lines) == 1
    assert "hpc_geometry.sh" in lines[0]


def test_geometry_stage_remaps_container_path(capsys, monkeypatch):
    monkeypatch.setenv("CFDTPU_HPC_DATA", "/host/data")
    args = _args(exp_command="mesh", meshing_mode="all",
                 exp_output="/host/data/meshes/test_simple")
    _dispatch(capsys, args)
    tree = open("hpc_jobs/hpc_tree.sh").read()
    geom = open("hpc_jobs/hpc_geometry.sh").read()
    # tree runs bare-metal (host path); geometry runs in-container
    assert "/host/data/meshes/test_simple" in tree
    assert "/data/meshes/test_simple" in geom
    assert "/host/data" not in geom


def test_simulate_tree_scenario_gets_pretree_dependency(capsys):
    args = _args(command="simulate", simulation="stenosis_with_tree",
                 solver="stabilized_schur", T=0.1, dt=0.01,
                 name="run", output_dir="results")
    out = _dispatch(capsys, args)
    lines = [l for l in out.splitlines() if l.startswith("[HPC:dry-run] sbatch")]
    assert len(lines) == 2
    assert "vascusynth_pretree.sh" in lines[0]
    assert "--dependency=afterok:DRY1" in lines[1]


def test_simulate_plain_no_dependency(capsys):
    args = _args(command="simulate", simulation="lid_driven2D",
                 solver="stabilized_schur", T=0.1, dt=0.01,
                 name="run", output_dir="results")
    out = _dispatch(capsys, args)
    lines = [l for l in out.splitlines() if l.startswith("[HPC:dry-run] sbatch")]
    assert len(lines) == 1
    assert "afterok" not in out


def test_remap_no_match_is_identity(monkeypatch):
    monkeypatch.setenv("CFDTPU_HPC_DATA", "/host/data")
    assert hpc.remap_to_container("/scratch/x") == "/scratch/x"


def test_submit_parsable_fallback(monkeypatch):
    """Site wrappers / SBATCH --parsable print a bare id instead of the
    'Submitted batch job N' sentence; the id must still be recovered so
    afterok chains aren't silently dropped."""
    import subprocess as sp

    monkeypatch.setattr(
        sp, "check_output", lambda cmd, text: "12345;cluster\n"
    )
    assert hpc._submit(["sbatch", "x.sh"], dry_run=False) == "12345"
    monkeypatch.setattr(
        sp, "check_output", lambda cmd, text: "Submitted batch job 99\n"
    )
    assert hpc._submit(["sbatch", "x.sh"], dry_run=False) == "99"
    monkeypatch.setattr(
        sp, "check_output", lambda cmd, text: "weird output\n"
    )
    with pytest.raises(RuntimeError, match="job id"):
        hpc._submit(["sbatch", "x.sh"], dry_run=False)


def test_tree_prejob_filters_simulate_flags(capsys):
    """Simulate-specific passthrough flags (solver kwargs) must NOT be
    forwarded to the tree pre-job — it would die at argparse time."""
    args = _args(command="simulate", simulation="stenosis_with_tree",
                 solver="stabilized_schur", T=0.1, dt=0.01,
                 name="run", output_dir="results")
    hpc.dispatch_hpc(args, [
        "--snes_rtol", "1e-6", "--config", "cfg.yaml",
        "--output", "tree.msh", "--perf_point", "1", "2", "3",
    ])
    capsys.readouterr()
    body = (
        __import__("pathlib").Path("hpc_jobs/vascusynth_pretree.sh")
        .read_text()
    )
    assert "--config cfg.yaml" in body
    assert "--output tree.msh" in body
    assert "--perf_point 1 2 3" in body
    assert "--snes_rtol" not in body
