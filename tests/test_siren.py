"""Tests for the pure-pytree SIREN neural field."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from metapde_tpu.config import FieldConfig
from metapde_tpu.models import make_field, make_div_free_field
from metapde_tpu.ops.operators import vmap_divergence


def test_shapes_scalar_field():
    cfg = FieldConfig(out_dim=1, in_dim=2)
    field = make_field(cfg)
    params = field.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (13, 2))
    out = field.apply(params, x)
    assert out.shape == (13,)
    # single-point evaluation (used inside differential operators)
    out1 = field.apply(params, x[0])
    assert out1.shape == ()


def test_shapes_vector_field():
    cfg = FieldConfig(out_dim=2, in_dim=2)
    field = make_field(cfg)
    params = field.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (7, 2))
    assert field.apply(params, x).shape == (7, 2)
    assert field.apply(params, x[0]).shape == (2,)


def test_siren_init_ranges():
    cfg = FieldConfig(num_layers=3, layer_size=64, omega=30.0, omega0=30.0,
                      log_scale=False)
    field = make_field(cfg)
    params = field.init(jax.random.PRNGKey(0))
    layers = params["layers"]
    # hidden layers: U(-sqrt(6/fan_in)/omega, +)
    w1 = layers[1]["w"]
    bound = np.sqrt(6.0 / w1.shape[0]) / 30.0
    assert np.abs(w1).max() <= bound + 1e-6
    # first layer: (omega0/omega) * U(-1/fan_in, 1/fan_in) = U(-1/2, 1/2)
    w0 = layers[0]["w"]
    assert np.abs(w0).max() <= (30.0 / 30.0) / w0.shape[0] + 1e-6


def test_log_scale_params_exist_and_apply():
    cfg = FieldConfig(log_scale=True, io_scale_lr_factor=10.0)
    field = make_field(cfg)
    params = field.init(jax.random.PRNGKey(0))
    assert "log_in_scale" in params and "log_out_scale" in params
    assert np.allclose(params["log_in_scale"], np.log(0.1))

    # doubling the output scale doubles the output
    x = jnp.ones((4, 2))
    y1 = field.apply(params, x)
    params2 = dict(params)
    params2["log_out_scale"] = params["log_out_scale"] + jnp.log(2.0)
    y2 = field.apply(params2, x)
    assert np.allclose(y2, 2.0 * y1, rtol=1e-5)


def test_gradients_flow():
    cfg = FieldConfig()
    field = make_field(cfg)
    params = field.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 2))
    g = jax.grad(lambda p: jnp.sum(field.apply(p, x) ** 2))(params)
    norms = [float(jnp.abs(l).sum()) for l in jax.tree_util.tree_leaves(g)]
    assert all(n > 0 for n in norms)


def test_div_free_field_is_divergence_free():
    cfg = FieldConfig(num_layers=2, layer_size=32)
    field = make_div_free_field(cfg)
    params = field.init(jax.random.PRNGKey(0))
    pts = jax.random.normal(jax.random.PRNGKey(1), (9, 2))
    vel = field.apply(params, pts)
    assert vel.shape == (9, 2)
    divs = vmap_divergence(pts, lambda x: field.apply(params, x))
    assert np.allclose(divs, 0.0, atol=1e-4)


def test_fourier_features_field():
    cfg = FieldConfig(n_fourier=4, siren=False)
    field = make_field(cfg)
    params = field.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (5, 2))
    assert field.apply(params, x).shape == (5,)
