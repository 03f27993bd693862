"""LEAP engine tests on sinusoid regression (reference self-test,
src/nets/leap.py:231-293)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from metapde_tpu.config import FieldConfig
from metapde_tpu.meta.leap import (
    LeapDef,
    multi_task_grad_and_losses,
    single_task_rollout,
)
from metapde_tpu.models import make_field


def _make_sinusoid_leap(inner_steps=10, n_tasks=8):
    cfg = FieldConfig(num_layers=2, layer_size=32, siren=False, log_scale=False,
                      in_dim=1, out_dim=1)
    field = make_field(cfg)

    def sinusoid_loss(key, params, phase):
        x = jax.random.uniform(key, shape=(32, 1))
        y = jnp.sin(x + phase)
        yhat = field.apply(params, x)[:, None]
        return jnp.mean((y - yhat) ** 2), {"mean_phase": jnp.mean(phase)}

    def make_task_loss_fn(key):
        phase = jax.random.uniform(key, shape=(1, 1), maxval=2.0 * jnp.pi)
        return lambda key, params: sinusoid_loss(key, params, phase)

    leap_def = LeapDef(
        inner_opt=optax.sgd(0.1),
        make_task_loss_fn=make_task_loss_fn,
        inner_steps=inner_steps,
        n_batch_tasks=n_tasks,
        norm=True,
        loss_in_distance=True,
        stabilize=True,
        inner_grad_clip=100.0,
    )
    return field, leap_def


def test_rollout_shapes():
    field, leap_def = _make_sinusoid_leap()
    params = field.init(jax.random.PRNGKey(0))
    loss_fn = leap_def.make_task_loss_fn(jax.random.PRNGKey(1))
    final_params, meta_grad, losses = single_task_rollout(
        leap_def, jax.random.PRNGKey(2), params, loss_fn
    )
    assert losses.shape == (leap_def.inner_steps + 1,)
    assert losses[-1] < losses[0]
    assert (jax.tree_util.tree_structure(meta_grad)
            == jax.tree_util.tree_structure(params))
    norm = sum(float(jnp.abs(g).sum()) for g in jax.tree_util.tree_leaves(meta_grad))
    assert np.isfinite(norm) and norm > 0


def test_meta_training_improves():
    field, leap_def = _make_sinusoid_leap(inner_steps=10, n_tasks=8)
    params = field.init(jax.random.PRNGKey(0))
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(key, params, opt_state):
        grads, losses = multi_task_grad_and_losses(leap_def, key, params)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, jnp.mean(losses[:, -1])

    key = jax.random.PRNGKey(1)
    first = None
    for i in range(50):
        key, sk = jax.random.split(key)
        params, opt_state, final_loss = step(sk, params, opt_state)
        if first is None:
            first = float(final_loss)
    # final-step adaptation loss should improve as the init meta-learns
    assert float(final_loss) < first


def test_stabilizer_and_norm_options():
    field, leap_def = _make_sinusoid_leap(inner_steps=3)
    params = field.init(jax.random.PRNGKey(0))
    for norm in (True, False):
        for stab in (True, False):
            for lid in (True, False):
                d = leap_def._replace(norm=norm, stabilize=stab,
                                      loss_in_distance=lid)
                g, _ = multi_task_grad_and_losses(d, jax.random.PRNGKey(3),
                                                  params)
                total = sum(float(jnp.abs(x).sum())
                            for x in jax.tree_util.tree_leaves(g))
                assert np.isfinite(total)
