"""MAML engine tests on sinusoid regression (the reference's self-test,
src/nets/maml.py:236-313, promoted to a real unit test)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from metapde_tpu.config import FieldConfig
from metapde_tpu.meta.maml import (
    MamlDef,
    multi_task_grad_and_losses,
    single_task_rollout,
)
from metapde_tpu.models import make_field


def _make_sinusoid_maml(inner_steps=5, n_tasks=8, remat=True):
    cfg = FieldConfig(num_layers=2, layer_size=32, siren=False, log_scale=False,
                      in_dim=1, out_dim=1)
    field = make_field(cfg)

    def sinusoid_loss(params, x, phase):
        y = jnp.sin(x + phase)
        yhat = field.apply(params, x)[:, None]
        return jnp.mean((y - yhat) ** 2), {"mean_phase": jnp.mean(phase)}

    def make_task_loss_fns(key):
        k1, k2, k3 = jax.random.split(key, 3)
        x_train = jax.random.uniform(k1, shape=(32, 1))
        x_test = jax.random.uniform(k2, shape=(32, 1))
        phase = jax.random.uniform(k3, shape=(1, 1), maxval=2.0 * jnp.pi)
        inner = lambda key, params: sinusoid_loss(params, x_train, phase)
        outer = lambda key, params: sinusoid_loss(params, x_test, phase)
        return inner, outer

    maml_def = MamlDef(
        inner_opt=optax.sgd(0.1),
        make_task_loss_fns=make_task_loss_fns,
        inner_steps=inner_steps,
        n_batch_tasks=n_tasks,
        softplus_lrs=True,
        outer_loss_decay=0.7,
        inner_grad_clip=100.0,
        remat=remat,
    )
    return field, maml_def


def test_rollout_shapes_and_loss_decreases():
    field, maml_def = _make_sinusoid_maml()
    params = field.init(jax.random.PRNGKey(0))
    inner_loss, outer_loss = maml_def.make_task_loss_fns(jax.random.PRNGKey(1))

    final_params, (meta_loss, losses) = single_task_rollout(
        maml_def, jax.random.PRNGKey(2), params, inner_loss,
        outer_loss_fn=outer_loss,
    )
    assert losses.shape == (maml_def.inner_steps + 1,)
    assert losses[-1] < losses[0]  # inner SGD makes progress
    assert np.isfinite(float(meta_loss))


def test_meta_training_improves():
    field, maml_def = _make_sinusoid_maml(inner_steps=5, n_tasks=8)
    params = field.init(jax.random.PRNGKey(0))
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(key, params, opt_state):
        grads, losses, meta_losses = multi_task_grad_and_losses(
            maml_def, key, params
        )
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, jnp.mean(meta_losses[0])

    key = jax.random.PRNGKey(1)
    first = None
    for i in range(60):
        key, sk = jax.random.split(key)
        params, opt_state, ml = step(sk, params, opt_state)
        if first is None:
            first = float(ml)
    assert float(ml) < first  # meta-loss decreased


def test_learned_lrs_gradients():
    field, maml_def = _make_sinusoid_maml()
    params = field.init(jax.random.PRNGKey(0))
    # per-parameter per-step lrs, stacked inner_steps deep (maml_pde.py:151-154)
    lrs = jax.tree_util.tree_map(
        lambda x: jnp.ones((maml_def.inner_steps,) + x.shape), params
    )
    grads, losses, meta_losses = multi_task_grad_and_losses(
        maml_def, jax.random.PRNGKey(3), params, lrs
    )
    model_grad, lr_grad = grads
    # lr gradients exist and are nonzero somewhere
    lr_norm = sum(float(jnp.abs(g).sum()) for g in jax.tree_util.tree_leaves(lr_grad))
    assert lr_norm > 0
    # tree structure congruence
    assert (jax.tree_util.tree_structure(model_grad)
            == jax.tree_util.tree_structure(params))


def test_remat_matches_norematerialization():
    field, maml_def_r = _make_sinusoid_maml(remat=True)
    _, maml_def_n = _make_sinusoid_maml(remat=False)
    params = field.init(jax.random.PRNGKey(0))
    g1, _, _ = multi_task_grad_and_losses(maml_def_r, jax.random.PRNGKey(5), params)
    g2, _, _ = multi_task_grad_and_losses(maml_def_n, jax.random.PRNGKey(5), params)
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        assert np.allclose(a, b, rtol=1e-4, atol=1e-6)


def test_outer_loss_decay_semantics():
    # decay=0 -> only final-step outer loss; decay=1 -> plain sum (maml.py:42-45)
    field, maml_def = _make_sinusoid_maml(inner_steps=3)
    params = field.init(jax.random.PRNGKey(0))
    inner_loss, outer_loss = maml_def.make_task_loss_fns(jax.random.PRNGKey(7))

    def run(decay):
        d = maml_def._replace(outer_loss_decay=decay)
        _, (meta_loss, _) = single_task_rollout(
            d, jax.random.PRNGKey(2), params, inner_loss, outer_loss_fn=outer_loss
        )
        return float(meta_loss)

    # deterministic outer loss (same points every call) -> decay=1 is the sum
    # of the three per-step outer losses, which must be >= decay=0 (final only)
    assert run(1.0) >= run(0.0) - 1e-6
