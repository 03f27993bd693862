"""Branch-aware validation (train/energy.py + validation.py + driver).

VERDICT r4 item 5: the round-4 per-task diagnostic showed one
branch-multistable elasticity eval task flipping rel_err 0.03<->0.21 while
its MC domain energy sat AT/BELOW the oracle field's through the same
estimator — a different legitimate post-buckling branch, not optimization
error. These tests pin the in-stream discriminator: a task is flagged when
(model energy <= oracle * margin) AND (rel err > threshold), flagged tasks
leave the rel_err_branch mean, and the driver logs the gate per validation.
Generalizes the reference's x-mirror min-MSE special case
(src/util/trainer_util.py:525-549).
"""

import dataclasses
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metapde_tpu.train.validation import make_validation_fn


class _FakePde:
    name = "fake"


def _mk_val_fn(model_E, oracle_E, deltas, n_pts=4):
    """3-task synthetic harness: gt == 1 everywhere; the model returns
    gt + delta[task]; energy_fn returns model_E[task]."""
    deltas = jnp.asarray(deltas)
    model_E = jnp.asarray(model_E)

    def make_coef_func(key, model, task_params, coords):
        return jnp.ones((coords.shape[0], 1)) + deltas[task_params]

    def energy_fn(key, model, task_params, pts):
        return model_E[task_params]

    return make_validation_fn(
        _FakePde(), make_coef_func, n_eval=3,
        energy_fn=energy_fn,
        audit_points=jnp.zeros((3, 1, 2)),
        oracle_energy=jnp.asarray(oracle_E),
    )


def _run(val_fn):
    coords = jnp.zeros((3, 4, 2))
    gt_vals = jnp.ones((3, 4, 1))
    return val_fn(None, jnp.arange(3), coords, gt_vals)


def test_branch_divergent_task_flagged_and_gated():
    # task 0: perfect fit; task 1: high err at energy parity (the branch
    # roulette); task 2: high err, energy clearly above oracle (genuinely
    # under-optimized -> must stay in the mean)
    val = _run(_mk_val_fn(model_E=[2.0, 0.9, 2.0],
                          oracle_E=[1.0, 1.0, 1.0],
                          deltas=[0.0, 1.0, 1.0]))
    assert np.array_equal(np.asarray(val.branch_mask), [False, True, False])
    assert int(val.branch_flags) == 1
    # plain mean keeps all three tasks (0 + 1 + 1)/3
    np.testing.assert_allclose(float(val.rel_err), 2.0 / 3.0, rtol=1e-6)
    # gated mean drops the flagged task: (0 + 1)/2
    np.testing.assert_allclose(float(val.rel_err_branch), 0.5, rtol=1e-6)


def test_low_err_energy_parity_not_flagged():
    # energy parity with LOW rel err = same branch, well fit — never flagged
    val = _run(_mk_val_fn(model_E=[0.9, 0.9, 0.9],
                          oracle_E=[1.0, 1.0, 1.0],
                          deltas=[0.0, 0.0, 0.0]))
    assert int(val.branch_flags) == 0
    np.testing.assert_allclose(float(val.rel_err_branch),
                               float(val.rel_err), rtol=1e-6)


def test_all_tasks_flagged_falls_back_to_mean():
    val = _run(_mk_val_fn(model_E=[0.5, 0.5, 0.5],
                          oracle_E=[1.0, 1.0, 1.0],
                          deltas=[1.0, 1.0, 1.0]))
    assert int(val.branch_flags) == 3
    np.testing.assert_allclose(float(val.rel_err_branch),
                               float(val.rel_err), rtol=1e-6)


def test_branch_metrics_absent_when_audit_off():
    def make_coef_func(key, model, task_params, coords):
        return jnp.ones((coords.shape[0], 1))

    val_fn = make_validation_fn(_FakePde(), make_coef_func, n_eval=3)
    val = val_fn(None, jnp.arange(3), jnp.zeros((3, 4, 2)),
                 jnp.ones((3, 4, 1)))
    assert val.rel_err_branch is None and val.branch_flags is None


@pytest.mark.slow
@pytest.mark.parametrize("algo", ["maml", "leap"])
def test_driver_logs_branch_metrics(tmp_path, algo):
    """End-to-end: cfg.train.branch_aware_val wires oracle energies +
    per-validation model energies into metrics.jsonl (both drivers)."""
    from metapde_tpu.config import (
        Config, FieldConfig, LeapConfig, MamlConfig, TaskConfig,
        TrainConfig,
    )
    from metapde_tpu.train import leap_driver, maml_driver

    driver = {"maml": maml_driver, "leap": leap_driver}[algo]
    cfg = Config(
        task=TaskConfig(pde="poisson", inner_points=32, outer_points=32,
                        validation_points=32, n_eval=2),
        model=FieldConfig(num_layers=2, layer_size=16),
        maml=MamlConfig(bsize=2, inner_steps=2),
        leap=LeapConfig(bsize=2, inner_steps=2),
        solver=dataclasses.replace(
            Config().solver, ground_truth_resolution=4
        ),
        train=TrainConfig(
            outer_steps=2, log_every=1, viz_every=0, checkpoint_every=0,
            steps_per_call=1, out_dir=str(tmp_path), expt_name="bav",
            branch_aware_val=True,
        ),
    )
    driver.run(cfg)
    with open(os.path.join(str(tmp_path), "bav", "metrics.jsonl")) as f:
        rows = [json.loads(l) for l in f if l.strip()]
    assert rows, "no metrics written"
    last = rows[-1]
    assert "val_rel_err_branch" in last and "val_branch_flags" in last
    assert np.isfinite(last["val_rel_err_branch"])
    assert len(last["val_branch_mask"]) == 2
