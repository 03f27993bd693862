"""Classical-solver baseline sweep driver (reference: src/fenics_baseline.py
protocol — resolution grid vs a high-res reference solve)."""

import json
import os

import pytest


@pytest.mark.slow
def test_baseline_sweep_poisson(tmp_path):
    from metapde_tpu.config import Config, parse_overrides
    from metapde_tpu.train import baseline_driver

    cfg = parse_overrides(Config(), [
        "--task.pde=poisson", "--task.n_eval=2",
        "--task.validation_points=256",
        "--solver.ground_truth_resolution=8",
        f"--train.out_dir={tmp_path}", "--train.expt_name=sweep",
    ])
    results = baseline_driver.run(cfg, spatial_resolutions=(2, 4, 8))
    # res >= ref resolution is skipped
    assert set(results) == {"2", "4"}
    for r in results.values():
        assert set(r) >= {"rel_mse", "rel_mse_std", "rel_mse_median",
                          "time_per_solve"}
        assert r["time_per_solve"] > 0
    # finer resolution is more accurate, and the json artifact exists
    assert results["4"]["rel_mse"] < results["2"]["rel_mse"]
    out = [d for d in os.listdir(tmp_path) if d.startswith("sweep")]
    fname = os.path.join(tmp_path, out[0], "errors_by_resolution.json")
    with open(fname) as f:
        assert json.load(f).keys() == results.keys()


def test_gt_convergence_oracle_dispatch_requires_solve_hi():
    """--oracle=richardson must fail loudly for PDEs without a solve_hi
    (only poisson has one), not silently fall back to the P1 path."""
    import pytest

    from metapde_tpu.cli import gt_convergence
    from metapde_tpu.config import Config, parse_overrides

    cfg = parse_overrides(Config(), ["--task.pde=td_burgers"])
    with pytest.raises(SystemExit):
        gt_convergence.run(cfg, [4], 8, n_tasks=1, oracle="richardson")


def test_solver_baseline_oracle_dispatch_requires_solve_hi(tmp_path):
    import pytest

    from metapde_tpu.config import Config, parse_overrides
    from metapde_tpu.train import baseline_driver

    cfg = parse_overrides(Config(), [
        "--task.pde=td_burgers",
        f"--train.out_dir={tmp_path}", "--train.expt_name=x",
    ])
    with pytest.raises(SystemExit):
        baseline_driver.run(cfg, spatial_resolutions=(4,),
                            oracle="richardson")
