"""Multi-device sharding tests: dp-sharded == unsharded meta-gradients, and
pt-sharded second-order gradients match an unsharded rollout exactly on a
deterministic point set (SURVEY.md section 4: 1-vs-N determinism)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from metapde_tpu.config import FieldConfig
from metapde_tpu.meta.maml import MamlDef, multi_task_grad_and_losses
from metapde_tpu.models import make_field
from metapde_tpu.parallel.mesh import make_mesh, TASK_AXIS, POINT_AXIS
from metapde_tpu.parallel.sharding import (
    make_sharded_leap_grad_fn,
    make_sharded_maml_grad_fn,
)

needs_devices = pytest.mark.skipif(
    len(jax.devices()) < 4, reason="needs >=4 devices (run via ./run_tests.sh)"
)


def _sinusoid_maml(n_tasks=8):
    cfg = FieldConfig(num_layers=2, layer_size=16, siren=False, log_scale=False,
                      in_dim=1, out_dim=1)
    field = make_field(cfg)

    def make_task_loss_fns(key):
        k1, k2, k3 = jax.random.split(key, 3)
        x_train = jax.random.uniform(k1, shape=(16, 1))
        x_test = jax.random.uniform(k2, shape=(16, 1))
        phase = jax.random.uniform(k3, shape=(1, 1), maxval=2 * jnp.pi)

        def loss(params, x):
            y = jnp.sin(x + phase)
            yhat = field.apply(params, x)[:, None]
            return jnp.mean((y - yhat) ** 2), {}

        return (lambda key, p: loss(p, x_train)), (lambda key, p: loss(p, x_test))

    maml_def = MamlDef(
        inner_opt=optax.sgd(0.05),
        make_task_loss_fns=make_task_loss_fns,
        inner_steps=3,
        n_batch_tasks=n_tasks,
        softplus_lrs=True,
        outer_loss_decay=0.5,
        inner_grad_clip=100.0,
        remat=True,
    )
    return field, maml_def


@needs_devices
def test_dp_sharded_matches_unsharded():
    field, maml_def = _sinusoid_maml(n_tasks=8)
    params = field.init(jax.random.PRNGKey(0))
    lrs = jax.tree_util.tree_map(
        lambda x: jnp.ones((maml_def.inner_steps,) + x.shape), params
    )
    key = jax.random.PRNGKey(42)

    ref_grads, ref_losses, _ = multi_task_grad_and_losses(
        maml_def, key, params, lrs
    )

    mesh = make_mesh(n_task_shards=4, n_point_shards=1)
    grad_fn = make_sharded_maml_grad_fn(maml_def, mesh)
    sh_grads, sh_losses, _ = grad_fn(key, params, lrs)

    for a, b in zip(jax.tree_util.tree_leaves(ref_grads),
                    jax.tree_util.tree_leaves(sh_grads)):
        assert np.allclose(a, b, rtol=1e-4, atol=1e-6)
    assert np.allclose(ref_losses, sh_losses, rtol=1e-4, atol=1e-6)


@needs_devices
def test_pt_sharded_second_order_grads_exact():
    """Fixed point set split across pt shards: the pmean'd-loss meta-gradient
    must equal the unsharded full-set meta-gradient, including cross-device
    Hessian terms."""
    pts = jnp.linspace(0.0, 1.0, 32)
    theta0 = jnp.array(0.7)

    def loss_full(t):
        return jnp.mean((jnp.sin(3 * pts) - t * pts) ** 2)

    def rollout_full(t0):
        t = t0
        for _ in range(3):
            t = t - 0.3 * jax.grad(loss_full)(t)
        return loss_full(t)

    ref = jax.grad(rollout_full)(theta0)

    mesh = Mesh(np.array(jax.devices()[:4]).reshape(4), (POINT_AXIS,))

    def shard_fn(theta, pts_local):
        def loss_local(t):
            return jax.lax.pmean(
                jnp.mean((jnp.sin(3 * pts_local) - t * pts_local) ** 2),
                POINT_AXIS,
            )

        def rollout(t0):
            t = t0
            for _ in range(3):
                t = t - 0.3 * jax.grad(loss_local)(t)
            return loss_local(t)

        return jax.grad(rollout)(theta)

    sharded = jax.jit(jax.shard_map(
        shard_fn, mesh=mesh, in_specs=(P(), P(POINT_AXIS)), out_specs=P()
    ))
    out = sharded(theta0, pts)
    assert np.allclose(ref, out, rtol=1e-5)


@needs_devices
def test_leap_dp_sharded_matches_unsharded():
    import metapde_tpu.meta.leap as leap_mod

    cfg = FieldConfig(num_layers=2, layer_size=16, siren=False, log_scale=False,
                      in_dim=1, out_dim=1)
    field = make_field(cfg)

    def make_task_loss_fn(key):
        phase = jax.random.uniform(key, shape=(1, 1), maxval=2 * jnp.pi)

        def loss(key, params):
            x = jax.random.uniform(key, shape=(16, 1))
            y = jnp.sin(x + phase)
            yhat = field.apply(params, x)[:, None]
            return jnp.mean((y - yhat) ** 2), {}

        return loss

    leap_def = leap_mod.LeapDef(
        inner_opt=optax.sgd(0.05),
        make_task_loss_fn=make_task_loss_fn,
        inner_steps=4,
        n_batch_tasks=8,
        norm=True,
        loss_in_distance=True,
        stabilize=True,
        inner_grad_clip=100.0,
    )
    params = field.init(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(9)

    ref_grads, ref_losses = leap_mod.multi_task_grad_and_losses(
        leap_def, key, params
    )
    mesh = make_mesh(n_task_shards=4, n_point_shards=1)
    grad_fn = make_sharded_leap_grad_fn(leap_def, mesh)
    sh_grads, sh_losses = grad_fn(key, params)

    for a, b in zip(jax.tree_util.tree_leaves(ref_grads),
                    jax.tree_util.tree_leaves(sh_grads)):
        assert np.allclose(a, b, rtol=1e-4, atol=1e-6)
    assert np.allclose(ref_losses, sh_losses, rtol=1e-4, atol=1e-6)


def test_sharded_steps_per_call_scan():
    """train_step_many (lax.scan of outer steps) composes with the
    shard_map dp x pt mesh."""
    import numpy as np

    from metapde_tpu.config import (
        Config, FieldConfig, MamlConfig, MeshConfig, TaskConfig,
    )
    from metapde_tpu.train import maml_driver

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    cfg = Config(
        task=TaskConfig(pde="poisson", inner_points=64, outer_points=64),
        model=FieldConfig(num_layers=2, layer_size=32),
        maml=MamlConfig(bsize=8, inner_steps=2),
        mesh=MeshConfig(n_task_shards=4, n_point_shards=2),
    )
    c = maml_driver.build(cfg)
    params, lrs = c["init_params"], c["inner_lrs"]
    o = c["outer_opt"].init(params)
    lo = c["lr_opt"].init(lrs)
    out = c["train_step_many"](
        jax.random.PRNGKey(0), params, lrs, o, lo, n_steps=3
    )
    assert np.isfinite(np.asarray(out[7])).all()
