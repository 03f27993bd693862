"""Optimizer-based deployment (cfg.deploy.optimizer, train/deploy.py): the
reference's nn_pde fine-tune-from-meta-init protocol (nn_pde.py:169-186 +
pipeline/pipeline_poisson_maml.sh) as a jit/vmap-compatible k-step scan,
selectable in deploy_bench alongside the learned-LR rollout."""

import dataclasses

import jax
import jax.numpy as jnp
import pytest

from metapde_tpu.config import (
    Config, DeployConfig, FieldConfig, LeapConfig, MamlConfig, TaskConfig,
)
from metapde_tpu.train import leap_driver, maml_driver


def _cfg(**deploy_kw):
    return Config(
        task=TaskConfig(pde="poisson", inner_points=64, outer_points=64,
                        validation_points=64, n_eval=1),
        model=FieldConfig(num_layers=2, layer_size=32),
        maml=MamlConfig(bsize=2, inner_steps=2),
        leap=LeapConfig(bsize=2, inner_steps=2),
        deploy=DeployConfig(**deploy_kw),
    )


def test_adam_deploy_reduces_task_loss_more_than_learned_lr_at_raw_init():
    # at an UNTRAINED init the learned LRs are all-ones softplus (huge,
    # useless) while Adam actually descends: the optimizer path must both
    # run and decrease the self-computable task loss
    c = maml_driver.build(_cfg(optimizer="adam", inner_lr=1e-3))
    params, lrs = c["init_params"], c["inner_lrs"]
    key = jax.random.PRNGKey(3)
    task_params = c["pde"].sample_params(jax.random.PRNGKey(5))

    from metapde_tpu.train.multistart import make_score_fn

    score = make_score_fn(c["pde"], c["loss_fn"], c["field"], 64)
    sk = jax.random.PRNGKey(11)

    fp0 = c["deploy_final_model"](key, (params, lrs), task_params, 0)
    fp20 = c["deploy_final_model"](key, (params, lrs), task_params, 20)
    s0 = float(score(sk, fp0, task_params))
    s20 = float(score(sk, fp20, task_params))
    assert jnp.isfinite(s20)
    assert s20 < s0, (s0, s20)


def test_deploy_optimizer_differs_from_learned_lr_path():
    base = maml_driver.build(_cfg())
    opt = maml_driver.build(_cfg(optimizer="adam", inner_lr=1e-3))
    params, lrs = base["init_params"], base["inner_lrs"]
    key = jax.random.PRNGKey(3)
    task_params = base["pde"].sample_params(jax.random.PRNGKey(5))

    fp_lr = base["deploy_final_model"](key, (params, lrs), task_params, 2)
    fp_ad = opt["deploy_final_model"](key, (params, lrs), task_params, 2)
    la = jax.tree_util.tree_leaves(fp_lr)
    lb = jax.tree_util.tree_leaves(fp_ad)
    assert any(not jnp.allclose(a, b) for a, b in zip(la, lb))
    # k=0 short-circuits to the raw init on both paths
    fp0a = base["deploy_final_model"](key, (params, lrs), task_params, 0)
    fp0b = opt["deploy_final_model"](key, (params, lrs), task_params, 0)
    for a, b in zip(jax.tree_util.tree_leaves(fp0a),
                    jax.tree_util.tree_leaves(fp0b)):
        assert jnp.array_equal(a, b)


def test_leap_deploy_optimizer_runs():
    c = leap_driver.build(_cfg(optimizer="adam", inner_lr=1e-3))
    params = c["init_params"]
    key = jax.random.PRNGKey(3)
    task_params = c["pde"].sample_params(jax.random.PRNGKey(5))
    fp = c["deploy_final_model"](key, params, task_params, 5)
    assert all(bool(jnp.isfinite(l).all())
               for l in jax.tree_util.tree_leaves(fp))


def test_deploy_optimizer_composes_with_multistart():
    c = maml_driver.build(
        _cfg(optimizer="adam", inner_lr=1e-3, n_starts=3, jitter=0.05))
    params, lrs = c["init_params"], c["inner_lrs"]
    key = jax.random.PRNGKey(3)
    task_params = c["pde"].sample_params(jax.random.PRNGKey(5))
    fp = c["deploy_final_model"](key, (params, lrs), task_params, 3)
    assert all(bool(jnp.isfinite(l).all())
               for l in jax.tree_util.tree_leaves(fp))


def test_unknown_deploy_optimizer_raises():
    with pytest.raises(ValueError):
        maml_driver.build(_cfg(optimizer="lion"))
