"""Deployment with a LARGER adaptation budget than meta-training unrolled:
get_final_model pads the learned per-step LR stack by repeating the final
step's LRs (k <= trained steps stays the reference truncation semantics,
maml_pde.py:163-183)."""

import jax
import jax.numpy as jnp

from metapde_tpu.config import (
    Config, FieldConfig, MamlConfig, MeshConfig, TaskConfig,
)
from metapde_tpu.train import maml_driver


def _build(inner_steps=2):
    cfg = Config(
        task=TaskConfig(pde="poisson", inner_points=64, outer_points=64,
                        validation_points=64, n_eval=1),
        model=FieldConfig(num_layers=2, layer_size=32),
        maml=MamlConfig(bsize=2, inner_steps=inner_steps),
    )
    return maml_driver.build(cfg)


def test_deploy_k_beyond_trained_steps_runs_and_differs():
    c = _build(inner_steps=2)
    params, lrs = c["init_params"], c["inner_lrs"]
    key = jax.random.PRNGKey(3)
    task_params = c["pde"].sample_params(jax.random.PRNGKey(5))

    fp2 = c["get_final_model"](key, (params, lrs), task_params, 2)
    fp6 = c["get_final_model"](key, (params, lrs), task_params, 6)
    l2 = jax.tree_util.tree_leaves(fp2)
    l6 = jax.tree_util.tree_leaves(fp6)
    assert all(jnp.all(jnp.isfinite(a)) for a in l6)
    # 6-step adaptation must actually take more steps than 2-step
    assert any(not jnp.allclose(a, b) for a, b in zip(l2, l6))


def test_deploy_k_truncation_matches_trained_prefix():
    c = _build(inner_steps=3)
    params, lrs = c["init_params"], c["inner_lrs"]
    key = jax.random.PRNGKey(3)
    task_params = c["pde"].sample_params(jax.random.PRNGKey(5))

    # k == trained steps goes through the same code path as k < and k >
    fp3a = c["get_final_model"](key, (params, lrs), task_params, 3)
    fp3b = c["get_final_model"](key, (params, lrs), task_params, 3)
    for a, b in zip(jax.tree_util.tree_leaves(fp3a),
                    jax.tree_util.tree_leaves(fp3b)):
        assert jnp.array_equal(a, b)
