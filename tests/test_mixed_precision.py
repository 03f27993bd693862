"""Mixed-precision (model.compute_dtype) compute path.

The roofline study (RESULTS.md round 2) showed the flagship train step is
HBM/VMEM-traffic-bound, not MXU-bound; compute_dtype="bfloat16" stores the
inter-layer carried tensors (activations h and the Taylor-mode J/D
tangents) half-width while every matmul accumulates in f32
(preferred_element_type) and activation math stays f32. These tests pin
the numerics contract: f32-dtype outputs, ~1%-class agreement with the
pure-f32 chain, and first/second-order gradients that stay finite (the
MAML meta-gradient differentiates through the mixed chain)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metapde_tpu.config import FieldConfig
from metapde_tpu.models import siren


def _fields(**kw):
    cfg = FieldConfig(num_layers=3, layer_size=64, **kw)
    cfgb = dataclasses.replace(cfg, compute_dtype="bfloat16")
    return siren.make_field(cfg), siren.make_field(cfgb)


def _rel(a, b):
    return float(jnp.linalg.norm(a - b) / (jnp.linalg.norm(a) + 1e-30))


@pytest.fixture
def points():
    return jax.random.uniform(
        jax.random.PRNGKey(1), (256, 2), minval=-1.0, maxval=1.0
    )


def test_bf16_outputs_are_f32_and_close(points):
    f, fb = _fields()
    p = f.init(jax.random.PRNGKey(0))

    for name in ("apply", "apply_vhd", "apply_vjac"):
        out = getattr(f, name)(p, points)
        outb = getattr(fb, name)(p, points)
        out = out if isinstance(out, tuple) else (out,)
        outb = outb if isinstance(outb, tuple) else (outb,)
        for a, b in zip(out, outb):
            assert b.dtype == jnp.float32, name
            assert _rel(a, b) < 3e-2, (name, _rel(a, b))


def test_bf16_vector_field_and_fourier(points):
    # vector output + octave Fourier features exercise every branch of the
    # mixed chain (the fourier block stays f32; the first dot casts)
    f, fb = _fields(out_dim=2, squeeze_scalar=False, n_fourier=2)
    p = f.init(jax.random.PRNGKey(3))
    u, g, hd = f.apply_vhd(p, points)
    ub, gb, hdb = fb.apply_vhd(p, points)
    assert ub.shape == u.shape and gb.shape == g.shape
    assert _rel(u, ub) < 3e-2 and _rel(g, gb) < 3e-2 and _rel(hd, hdb) < 5e-2


def test_bf16_gradients_f32_and_finite(points):
    f, fb = _fields()
    p = f.init(jax.random.PRNGKey(0))

    def loss(p):
        u, g, hd = fb.apply_vhd(p, points)
        return (hd.sum(-1) ** 2).mean() + (u ** 2).mean()

    g1 = jax.grad(loss)(p)
    leaves = jax.tree_util.tree_leaves(g1)
    assert all(l.dtype == jnp.float32 for l in leaves)
    assert all(bool(jnp.isfinite(l).all()) for l in leaves)

    # grad-of-grad (second-order MAML) through the mixed chain
    def inner(p):
        g = jax.grad(loss)(p)
        return sum((l ** 2).sum() for l in jax.tree_util.tree_leaves(g))

    g2 = jax.tree_util.tree_leaves(jax.grad(inner)(p))
    assert all(bool(jnp.isfinite(l).all()) for l in g2)

    # and the gradient itself should be close to the f32 chain's gradient
    def loss_f32(p):
        u, g, hd = f.apply_vhd(p, points)
        return (hd.sum(-1) ** 2).mean() + (u ** 2).mean()

    g1_f32 = jax.grad(loss_f32)(p)
    flat = jnp.concatenate([l.ravel() for l in jax.tree_util.tree_leaves(g1)])
    flat32 = jnp.concatenate(
        [l.ravel() for l in jax.tree_util.tree_leaves(g1_f32)])
    assert _rel(flat32, flat) < 0.1


def test_bf16_maml_train_step_runs():
    # one full meta-train step on the flagship task with the mixed chain
    from metapde_tpu.config import Config, MamlConfig, TaskConfig
    from metapde_tpu.train import maml_driver

    cfg = Config(
        task=TaskConfig(pde="poisson", inner_points=64, outer_points=64,
                        validation_points=64, n_eval=2),
        model=FieldConfig(num_layers=3, layer_size=64,
                          compute_dtype="bfloat16"),
        maml=MamlConfig(bsize=2, inner_steps=2),
    )
    c = maml_driver.build(cfg)
    params, lrs = c["init_params"], c["inner_lrs"]
    opt_state = c["outer_opt"].init(params)
    lr_opt_state = c["lr_opt"].init(lrs)
    out = c["train_step"](jax.random.PRNGKey(0), params, lrs, opt_state,
                          lr_opt_state)
    meta_loss = np.asarray(out[5][0]).mean()  # (meta_losses, aux) pair
    assert np.isfinite(meta_loss)
    new_leaves = jax.tree_util.tree_leaves(out[0])
    assert all(l.dtype == jnp.float32 for l in new_leaves)
    assert all(bool(np.isfinite(np.asarray(l)).all()) for l in new_leaves)
