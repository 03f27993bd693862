"""Sweep runner tests (cli/sweep.py — the Ray-farm replacement)."""

import os
import subprocess
import sys

import pytest


def test_sweep_dry_run_emits_seeded_commands(capsys):
    from metapde_tpu.cli import sweep

    sweep.main([
        "--driver=nn_pde", "--seeds=3,7", "--dry_run", "--",
        "--task.pde=poisson", "--train.expt_name=myexp",
        "--train.outer_steps=2",
    ])
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 2
    assert "--seed=3" in out[0] and "myexp_seed_3" in out[0]
    assert "--seed=7" in out[1] and "myexp_seed_7" in out[1]
    assert all("metapde_tpu.cli.nn_pde" in line for line in out)


@pytest.mark.slow
def test_sweep_runs_jobs_end_to_end(tmp_path):
    """Two tiny seeded PINN jobs through the real subprocess path."""
    cmd = [
        sys.executable, "-m", "metapde_tpu.cli.sweep",
        "--driver=nn_pde", "--seeds=0,1", "--concurrency=2", "--",
        "--task.pde=poisson", "--train.outer_steps=2", "--train.log_every=1",
        "--task.inner_points=32", "--task.outer_points=32",
        "--task.validation_points=32", "--task.n_eval=1",
        "--model.num_layers=2", "--model.layer_size=16",
        "--solver.ground_truth_resolution=4",
        f"--train.out_dir={tmp_path}", "--train.expt_name=sw",
    ]
    r = subprocess.run(cmd, capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stdout + r.stderr
    for s in (0, 1):
        d = tmp_path / f"sw_seed_{s}"
        assert (d / "metrics.jsonl").exists(), r.stdout + r.stderr
        assert os.path.getsize(d / "metrics.jsonl") > 0
