"""End-to-end elastic resume at the driver level.

The reference restarts Adam from scratch on resume (SURVEY.md section 5:
optimizer state is not checkpointed). This build checkpoints
(params, inner-lr pytree, opt states, PRNG key, step); these tests run a
tiny training, then re-run with --train.load_model_from_expt pointed at
the first run dir and assert the continuation picks up at the saved step
with the saved state (the supervise.sh / watchdog recovery path).
"""

import dataclasses
import json
import os

import pytest

from metapde_tpu.config import (
    Config, FieldConfig, LeapConfig, MamlConfig, TaskConfig, TrainConfig,
)


def _tiny_cfg(tmp_path, expt, algo, outer_steps, load_from=None):
    return Config(
        task=TaskConfig(pde="poisson", inner_points=32, outer_points=32,
                        validation_points=32, n_eval=1),
        model=FieldConfig(num_layers=2, layer_size=16),
        maml=MamlConfig(bsize=2, inner_steps=2),
        leap=LeapConfig(bsize=2, inner_steps=2),
        solver=dataclasses.replace(
            Config().solver, ground_truth_resolution=4
        ),
        train=TrainConfig(
            outer_steps=outer_steps, log_every=1, viz_every=0,
            checkpoint_every=2, steps_per_call=1,
            out_dir=str(tmp_path), expt_name=expt,
            load_model_from_expt=load_from,
        ),
    )


def _logged_steps(run_dir):
    with open(os.path.join(run_dir, "metrics.jsonl")) as f:
        return [json.loads(line)["step"] for line in f if line.strip()]


@pytest.mark.slow
@pytest.mark.parametrize("algo", ["maml", "leap"])
def test_driver_elastic_resume(tmp_path, algo):
    from metapde_tpu.train import maml_driver, leap_driver

    driver = {"maml": maml_driver, "leap": leap_driver}[algo]

    driver.run(_tiny_cfg(tmp_path, f"{algo}_a", algo, outer_steps=3))
    run_a = str(tmp_path / f"{algo}_a")
    ckpts = [f for f in os.listdir(run_a) if f.startswith("checkpoint_step")]
    assert ckpts, "first run wrote no checkpoint"

    driver.run(_tiny_cfg(tmp_path, f"{algo}_b", algo, outer_steps=6,
                         load_from=run_a))
    run_b = str(tmp_path / f"{algo}_b")
    steps_b = _logged_steps(run_b)
    # resumed at step (saved_step + 1): no step < 3 is re-run
    assert steps_b, "continuation logged nothing"
    assert min(steps_b) >= 3, f"continuation restarted from {min(steps_b)}"
    assert max(steps_b) == 5
    with open(os.path.join(run_b, "log.txt")) as f:
        text = f.read()
    assert "loaded checkpoint" in text
    assert "resuming optimizer state" in text
    # identical task/model/solver config: no drift warnings
    assert "config drift" not in text


@pytest.mark.slow
@pytest.mark.parametrize("algo", ["maml", "leap"])
def test_eval_tasks_pinned_across_resume_chain(tmp_path, algo):
    """Eval-task PRNG keys ride in the checkpoint and survive a resume
    CHAIN, so val_rel_err is comparable along a continuation (VERDICT r2
    item 2: the em5 200k->270k regression was invisible to training-val
    because the eval task set re-derived from the restored PRNG stream)."""
    import numpy as np

    from metapde_tpu.train import checkpoints as ckpt
    from metapde_tpu.train import leap_driver, maml_driver

    driver = {"maml": maml_driver, "leap": leap_driver}[algo]

    driver.run(_tiny_cfg(tmp_path, f"pin_{algo}_a", algo, outer_steps=3))
    run_a = str(tmp_path / f"pin_{algo}_a")
    state_a = ckpt.load_checkpoint(ckpt.latest_checkpoint(run_a))
    assert state_a.get("gt_key") is not None, "checkpoint lacks gt_key"

    driver.run(_tiny_cfg(tmp_path, f"pin_{algo}_b", algo, outer_steps=6,
                         load_from=run_a))
    run_b = str(tmp_path / f"pin_{algo}_b")
    state_b = ckpt.load_checkpoint(ckpt.latest_checkpoint(run_b))
    with open(os.path.join(run_b, "log.txt")) as f:
        assert "pinned eval tasks from checkpoint gt_key" in f.read()

    driver.run(_tiny_cfg(tmp_path, f"pin_{algo}_c", algo, outer_steps=9,
                         load_from=run_b))
    run_c = str(tmp_path / f"pin_{algo}_c")
    state_c = ckpt.load_checkpoint(ckpt.latest_checkpoint(run_c))

    # the pin propagates unchanged through the whole chain
    np.testing.assert_array_equal(
        np.asarray(state_a["gt_key"]), np.asarray(state_b["gt_key"]))
    np.testing.assert_array_equal(
        np.asarray(state_a["gt_key"]), np.asarray(state_c["gt_key"]))
    np.testing.assert_array_equal(
        np.asarray(state_a["gt_points_key"]),
        np.asarray(state_c["gt_points_key"]))


@pytest.mark.slow
def test_config_drift_detection(tmp_path):
    """A resume command that silently changes the objective must warn.

    Regression test for a real incident: a supervised relaunch omitted
    --task.bc_weight, flipping the loss weighting from 1 to the 100
    default mid-run (meta_loss jumped 500x before it was caught).
    """
    from metapde_tpu.train import checkpoints as ckpt
    from metapde_tpu.train import maml_driver

    cfg_a = _tiny_cfg(tmp_path, "drift_a", "maml", outer_steps=3)
    maml_driver.run(cfg_a)
    run_a = str(tmp_path / "drift_a")

    cfg_b = _tiny_cfg(tmp_path, "drift_b", "maml", outer_steps=6,
                      load_from=run_a)
    cfg_b = dataclasses.replace(
        cfg_b, task=dataclasses.replace(cfg_b.task, bc_weight=1.0)
    )
    drifts = ckpt.config_drift(run_a, cfg_b)
    assert any("task.bc_weight" in d for d in drifts), drifts

    maml_driver.run(cfg_b)
    with open(os.path.join(str(tmp_path / "drift_b"), "log.txt")) as f:
        text = f.read()
    assert "config drift" in text and "task.bc_weight" in text

    # train.* changes (outer_steps etc.) are intentional and not flagged
    assert not any(d.startswith("train.") for d in drifts)
