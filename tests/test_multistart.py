"""Multi-start deployment tests (train/multistart.py).

The feature has no reference counterpart: it guards the deployment path
against optimization multi-stability (RESULTS.md hyperelasticity audit: a
fine-tune converging into a +36%-energy post-buckling basin), selecting
among K vmapped adaptations by the self-computable total task loss.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metapde_tpu.config import (
    Config, DeployConfig, FieldConfig, MamlConfig, TaskConfig, TrainConfig,
)
from metapde_tpu.train.multistart import (
    jitter_leaves,
    multistart_adapt,
    wrap_get_final_model,
)


def test_selects_argmin_of_common_score():
    # adapt: key-dependent scalar; score: distance to 3.0
    def adapt_fn(key, model, task_params):
        return {"w": model["w"] + jax.random.uniform(key, ())}

    def score_fn(key, fp, task_params):
        return (fp["w"] - 3.0) ** 2

    model = {"w": jnp.float32(2.0)}
    best, aux = multistart_adapt(
        jax.random.PRNGKey(0), model, None, adapt_fn, score_fn, n_starts=8
    )
    scores = np.asarray(aux.scores)
    assert scores.shape == (8,)
    assert int(aux.best_idx) == int(np.argmin(scores))
    assert np.isclose(float((best["w"] - 3.0) ** 2), scores.min())


def test_nan_candidates_lose_selection():
    def adapt_fn(key, model, task_params):
        u = jax.random.uniform(key, ())
        return {"w": jnp.where(u > 0.3, jnp.nan, u)}

    def score_fn(key, fp, task_params):
        return fp["w"]

    best, aux = multistart_adapt(
        jax.random.PRNGKey(1), {"w": jnp.float32(0.0)}, None,
        adapt_fn, score_fn, n_starts=16,
    )
    assert np.isfinite(float(best["w"]))
    assert np.isfinite(np.asarray(aux.scores)[int(aux.best_idx)])


def test_candidate_zero_is_exact_init_under_jitter():
    # identity adaptation + score favoring the original params: candidate 0
    # must carry ZERO jitter, so multi-start strictly dominates single-start
    model = {"w": jnp.arange(4.0), "b": jnp.ones((2, 3))}

    def adapt_fn(key, m, tp):
        return m

    def score_fn(key, fp, tp):
        return sum(
            jnp.sum((fp[k] - model[k]) ** 2) for k in model
        )

    best, aux = multistart_adapt(
        jax.random.PRNGKey(2), model, None, adapt_fn, score_fn,
        n_starts=4, jitter=10.0, jitter_fn=jitter_leaves,
    )
    assert int(aux.best_idx) == 0
    np.testing.assert_allclose(np.asarray(best["w"]), np.arange(4.0))
    # the jittered candidates really did move
    assert np.asarray(aux.scores)[1:].min() > 1e-3


def test_jitter_scale_is_relative_to_leaf_rms():
    params = {"big": 100.0 * jnp.ones((8,)), "small": 0.01 * jnp.ones((8,))}
    out = jitter_leaves(jax.random.PRNGKey(0), params, 0.1)
    d_big = np.abs(np.asarray(out["big"] - params["big"])).mean()
    d_small = np.abs(np.asarray(out["small"] - params["small"])).mean()
    # perturbations scale with each leaf's own magnitude (~1e4x apart)
    assert 1e3 < d_big / d_small < 1e5
    # zero scale is exact identity (candidate-0 guarantee)
    out0 = jitter_leaves(jax.random.PRNGKey(0), params, 0.0)
    for k in params:
        np.testing.assert_array_equal(np.asarray(out0[k]),
                                      np.asarray(params[k]))


def _tiny_cfg(tmp_path, expt, n_starts, jitter=0.0, outer_steps=4):
    return Config(
        task=TaskConfig(pde="poisson", inner_points=32, outer_points=32,
                        validation_points=32, n_eval=1),
        model=FieldConfig(num_layers=2, layer_size=16),
        maml=MamlConfig(bsize=2, inner_steps=2),
        solver=dataclasses.replace(Config().solver,
                                   ground_truth_resolution=4),
        deploy=DeployConfig(n_starts=n_starts, jitter=jitter,
                            score_points=32),
        train=TrainConfig(outer_steps=outer_steps, log_every=2, viz_every=0,
                          checkpoint_every=0, steps_per_call=1,
                          out_dir=str(tmp_path), expt_name=expt),
    )


@pytest.mark.slow
def test_maml_deploy_final_model_multistart(tmp_path):
    """driver.build wires deploy.n_starts into the deployment path; the
    multi-start final model is finite and scores no worse than the mean
    single-start candidate on the selection objective."""
    from metapde_tpu.train import maml_driver
    from metapde_tpu.train.multistart import make_score_fn

    cfg = _tiny_cfg(tmp_path, "ms_maml", n_starts=3, jitter=0.1)
    c = maml_driver.build(cfg)
    pde, field = c["pde"], c["field"]
    model = (c["init_params"], c["inner_lrs"])
    task_params = pde.sample_params(jax.random.PRNGKey(3))

    key = jax.random.PRNGKey(4)
    fp_ms = c["deploy_final_model"](key, model, task_params, 2)
    fp_single = c["get_final_model"](key, model, task_params, 2)

    # same pytree structure as a single-start adaptation (selection gathered
    # the candidate axis away), finite outputs
    jax.tree_util.tree_map(
        lambda a, b: None if a.shape == b.shape else pytest.fail("shape"),
        fp_ms, fp_single,
    )
    coords = pde.sample_points_in_domain(
        jax.random.PRNGKey(5), 16, task_params
    )
    vals = field.apply_inference(fp_ms, coords)
    assert np.all(np.isfinite(np.asarray(vals)))

    # the selected candidate beats (<=) the single-start rollout on the
    # common-draw score by construction (candidate 0 IS a rollout)
    score = make_score_fn(pde, c["loss_fn"], field, 64)
    sk = jax.random.PRNGKey(6)
    assert float(score(sk, fp_ms, task_params)) <= float(
        score(sk, fp_single, task_params)
    ) * 1.5  # same distribution; allow stochastic slack


@pytest.mark.slow
def test_multistart_on_hyperelasticity_energy(tmp_path):
    """The target family: selection scores the neo-Hookean energy + BC
    penalty (the basin-separating quantity from the RESULTS.md audit)."""
    from metapde_tpu.train import maml_driver
    from metapde_tpu.train.multistart import make_score_fn

    cfg = Config(
        task=TaskConfig(pde="hyper_elasticity", inner_points=32,
                        outer_points=32, validation_points=32, n_eval=1,
                        max_holes=2, max_hole_size=0.4,
                        vary_source=False, vary_bc=False),
        model=FieldConfig(num_layers=2, layer_size=16),
        maml=MamlConfig(bsize=2, inner_steps=2, inner_lr=1e-5),
        deploy=DeployConfig(n_starts=4, jitter=0.1, score_points=32),
        train=TrainConfig(outer_steps=1, viz_every=0, checkpoint_every=0),
    )
    c = maml_driver.build(cfg)
    pde = c["pde"]
    model = (c["init_params"], c["inner_lrs"])
    task_params = pde.sample_params(jax.random.PRNGKey(10))

    fp = c["deploy_final_model"](jax.random.PRNGKey(11), model,
                                 task_params, 2)
    score = make_score_fn(pde, c["loss_fn"], c["field"], 32)
    s = float(score(jax.random.PRNGKey(12), fp, task_params))
    assert np.isfinite(s)
    vals = c["field"].apply_inference(
        fp, pde.sample_points_in_domain(jax.random.PRNGKey(13), 8,
                                        task_params)
    )
    assert np.all(np.isfinite(np.asarray(vals)))


@pytest.mark.slow
def test_nn_driver_multistart_run(tmp_path):
    """nn fine-tune with deploy.n_starts=3: runs, logs ms_* metrics, saves a
    SINGLE selected model in the checkpoint."""
    import json
    import os

    from metapde_tpu.train import checkpoints as ckpt
    from metapde_tpu.train import nn_driver

    cfg = _tiny_cfg(tmp_path, "ms_nn", n_starts=3, jitter=0.05,
                    outer_steps=4)
    final = nn_driver.run(cfg)

    run_dir = str(tmp_path / "ms_nn")
    with open(os.path.join(run_dir, "metrics.jsonl")) as f:
        rows = [json.loads(l) for l in f if l.strip()]
    assert any("ms_best_idx" in r for r in rows)

    fname = ckpt.latest_checkpoint(run_dir)
    state = ckpt.load_checkpoint(fname)
    saved = state["params"]
    # selected params match the returned ones and are unstacked (leaf shapes
    # equal across save/return; no leading candidate axis)
    for a, b in zip(jax.tree_util.tree_leaves(saved),
                    jax.tree_util.tree_leaves(final)):
        assert np.asarray(a).shape == np.asarray(b).shape
    assert len(state["ms_scores"]) == 3
