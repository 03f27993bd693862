"""Best-validation checkpoint tracking (checkpoints.save_best_checkpoint).

Motivated by a measured incident: the em5 elasticity run's deployment
error regressed 9.3e-3 -> 1.9e-2 between 200k and 270k steps on identical
eval tasks (RESULTS.md round-2 'checkpoint selection') — meta-training
quality is not monotone, and the reference's own analysis takes min-MSE
over the training curve (resultAnalysis.ipynb cells 4-24)."""

import pickle

import pytest

import jax
import numpy as np

from metapde_tpu.train import checkpoints as ckpt


def test_save_best_only_improves(tmp_path):
    p = str(tmp_path)
    state = {"params": {"w": np.ones(3)}}
    assert ckpt.save_best_checkpoint(p, 10, 0.5, state) is not None
    # worse metric: no overwrite
    assert ckpt.save_best_checkpoint(p, 20, 0.7, state) is None
    with open(ckpt.best_checkpoint(p), "rb") as f:
        d = pickle.load(f)
    assert d["step"] == 10 and d["best_metric"] == 0.5
    # better metric: overwrite
    assert ckpt.save_best_checkpoint(p, 30, 0.4, state) is not None
    with open(ckpt.best_checkpoint(p), "rb") as f:
        d = pickle.load(f)
    assert d["step"] == 30 and d["best_metric"] == 0.4


def test_nan_never_tracked(tmp_path):
    """A NaN first validation must not poison best tracking (ADVICE r2:
    `not (metric < nan)` is always True, so no finite later metric would
    ever replace a stored NaN)."""
    p = str(tmp_path)
    state = {"params": {"w": np.ones(2)}}
    assert ckpt.save_best_checkpoint(p, 1, float("nan"), state) is None
    assert ckpt.best_checkpoint(p) is None
    # a finite metric after the NaN is tracked normally
    assert ckpt.save_best_checkpoint(p, 2, 0.9, state) is not None
    assert ckpt.save_best_checkpoint(p, 3, float("inf"), state) is None
    assert ckpt.save_best_checkpoint(p, 4, 0.5, state) is not None
    with open(ckpt.best_checkpoint(p), "rb") as f:
        d = pickle.load(f)
    assert d["step"] == 4 and d["best_metric"] == 0.5


def test_stored_nan_recoverable(tmp_path):
    """Legacy best files written with a non-finite metric are treated as
    'no best yet' rather than blocking forever."""
    import os

    p = str(tmp_path)
    fname = os.path.join(p, ckpt.BEST_NAME)
    with open(fname, "wb") as f:
        pickle.dump({"step": 1, "best_metric": float("nan"),
                     "params": {"w": np.ones(2)}}, f)
    assert ckpt.save_best_checkpoint(
        p, 2, 0.3, {"params": {"w": np.ones(2)}}) is not None
    with open(fname, "rb") as f:
        assert pickle.load(f)["best_metric"] == 0.3


def test_best_checkpoint_invisible_to_latest(tmp_path):
    p = str(tmp_path)
    ckpt.save_best_checkpoint(p, 10, 0.5, {"params": {"w": np.ones(2)}})
    # resume must keep using numbered checkpoints only
    assert ckpt.latest_checkpoint(p) is None
    ckpt.save_checkpoint(p, 12, {"params": {"w": np.ones(2)}})
    assert ckpt.latest_checkpoint(p).endswith("checkpoint_step_12.pickle")
    assert ckpt.best_checkpoint(p).endswith(ckpt.BEST_NAME)


def test_driver_tracks_best(tmp_path):
    from metapde_tpu.config import (
        Config, FieldConfig, MamlConfig, SolverConfig, TaskConfig,
        TrainConfig,
    )
    from metapde_tpu.train import maml_driver

    cfg = Config(
        task=TaskConfig(pde="poisson", inner_points=64, outer_points=64,
                        validation_points=64, n_eval=2),
        model=FieldConfig(num_layers=2, layer_size=32),
        maml=MamlConfig(bsize=2, inner_steps=2),
        solver=SolverConfig(ground_truth_resolution=4),
        train=TrainConfig(outer_steps=3, log_every=1, viz_every=0,
                          checkpoint_every=0, out_dir=str(tmp_path),
                          expt_name="best_track"),
    )
    maml_driver.run(cfg)
    best = ckpt.best_checkpoint(str(tmp_path / "best_track"))
    assert best is not None
    with open(best, "rb") as f:
        d = pickle.load(f)
    assert np.isfinite(d["best_metric"])
    assert "params" in d and "inner_lrs" in d


@pytest.mark.slow
def test_driver_best_metric_median(tmp_path):
    """--train.best_metric=rel_err_median makes the driver track the
    per-task median (robust on branch-multistable families, RESULTS.md
    round-4 per-task diagnostic) instead of the reference-parity mean."""
    import dataclasses
    import json
    import os

    from metapde_tpu.config import (
        Config, FieldConfig, MamlConfig, TaskConfig, TrainConfig,
    )
    from metapde_tpu.train import maml_driver

    cfg = Config(
        task=TaskConfig(pde="poisson", inner_points=32, outer_points=32,
                        validation_points=32, n_eval=3),
        model=FieldConfig(num_layers=2, layer_size=16),
        maml=MamlConfig(bsize=2, inner_steps=2),
        solver=dataclasses.replace(Config().solver,
                                   ground_truth_resolution=4),
        train=TrainConfig(
            outer_steps=3, log_every=1, viz_every=0, checkpoint_every=2,
            steps_per_call=1, out_dir=str(tmp_path), expt_name="bm",
            best_metric="rel_err_median",
        ),
    )
    maml_driver.run(cfg)
    run_dir = os.path.join(str(tmp_path), "bm")
    with open(ckpt.best_checkpoint(run_dir), "rb") as f:
        best = pickle.load(f)
    medians = []
    with open(os.path.join(run_dir, "metrics.jsonl")) as f:
        for line in f:
            d = json.loads(line)
            if "val_rel_err_median" in d:
                medians.append(d["val_rel_err_median"])
    assert medians, "no validation rows logged"
    assert any(abs(best["best_metric"] - m) < 1e-9 for m in medians)
    assert best["best_metric"] == min(
        m for m in medians if m == m
    )
