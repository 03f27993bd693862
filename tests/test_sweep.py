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


def test_finetune_median_curve(tmp_path):
    """paper_plots median deployment curve: compile time replaced by the
    steady-state dt, best-so-far monotonicity, median across seeds."""
    import json

    from metapde_tpu.cli.paper_plots import _finetune_median_curve

    # two seed runs; first record's dt is compile-dominated (10 s vs 1 s)
    for seed, errs in ((1, [0.5, 0.2, 0.3, 0.1]), (2, [0.7, 0.4, 0.2, 0.2])):
        d = tmp_path / f"run_seed_{seed}"
        d.mkdir()
        with open(d / "metrics.jsonl", "w") as f:
            for i, e in enumerate(errs):
                f.write(json.dumps({
                    "step": i * 5, "val_rel_err": e,
                    "step_time": 10.0 if i == 0 else 1.0,
                }) + "\n")
    pts = _finetune_median_curve(str(tmp_path / "run_seed_*"))
    assert len(pts) == 4
    # compile dt replaced by steady median -> cumulative times 1,2,3,4
    assert [round(t, 6) for t, _ in pts] == [1.0, 2.0, 3.0, 4.0]
    # median of per-seed best-so-far: [.5,.7]->.7? no: median of sorted pair
    # picks index len//2 = upper; best-so-far seq per seed:
    # seed1 .5 .2 .2 .1 ; seed2 .7 .4 .2 .2 -> upper-median .7 .4 .2 .2
    assert [e for _, e in pts] == [0.7, 0.4, 0.2, 0.2]
    # errors never increase along the curve
    assert all(pts[i][1] >= pts[i + 1][1] for i in range(len(pts) - 1))


def test_nn_driver_seed_varies_task():
    """Deployment sweeps must fine-tune a DIFFERENT task per run seed
    (regression: fixed_num_pdes pinned every sweep seed to the same
    PRNGKey(task.seed) task, so 8-seed sweeps measured one task 8 times)."""
    import jax
    import numpy as np

    from metapde_tpu.config import Config, parse_overrides
    from metapde_tpu.train.nn_driver import build

    def task_params(seed):
        cfg = parse_overrides(
            Config(), ["--task.pde=poisson", f"--seed={seed}"]
        )
        c = build(cfg)
        return c["pde"].sample_params(jax.random.PRNGKey(123))

    p1 = task_params(1)
    p2 = task_params(2)
    leaves1 = jax.tree_util.tree_leaves(p1)
    leaves2 = jax.tree_util.tree_leaves(p2)
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(leaves1, leaves2)
    )
    # same seed -> same task, regardless of the sampling key
    p1b = task_params(1)
    for a, b in zip(leaves1, jax.tree_util.tree_leaves(p1b)):
        assert np.allclose(np.asarray(a), np.asarray(b))


def test_sweep_summary(tmp_path):
    import json

    from metapde_tpu.train.analysis import sweep_summary

    for seed, errs in ((1, [0.5, 0.2, 0.3]), (2, [0.7, 0.1, 0.4])):
        d = tmp_path / f"run_seed_{seed}"
        d.mkdir()
        with open(d / "metrics.jsonl", "w") as f:
            for i, e in enumerate(errs):
                f.write(json.dumps({
                    "step": i, "val_rel_err": e, "val_mse": e / 10,
                }) + "\n")
    s = sweep_summary(str(tmp_path / "run_seed_*"))
    assert s["n_seeds"] == 2
    assert s["min_best"] == 0.1
    assert s["max_best"] == 0.2
    assert s["mean_final"] == (0.3 + 0.4) / 2
