"""Fused Taylor-mode (value, grad, Hessian-diag) field pass tests.

field_apply_vhd replaces per-point forward-over-reverse AD in the PDE
residual losses with one batched matmul chain. These tests pin (a) raw
derivative agreement with generic AD, (b) loss and parameter-gradient
equality between the fused path (BoundField with .vhd) and the generic
closure path, for every PDE family that uses it.
"""

import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np
import pytest

from metapde_tpu.config import DomainConfig, FieldConfig, TaskConfig
from metapde_tpu.models import make_field
from metapde_tpu.ops.operators import hessian_diag
from metapde_tpu.pdes import get_pde


@pytest.mark.parametrize(
    "kw",
    [
        dict(),
        dict(log_scale=False),
        dict(n_fourier=3),
        dict(siren=False),
        dict(out_dim=2, squeeze_scalar=False),
    ],
)
def test_vhd_matches_generic_ad(kw):
    cfg = FieldConfig(num_layers=3, layer_size=32, in_dim=2, **kw)
    f = make_field(cfg)
    p = f.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (13, 2), minval=-1, maxval=1)
    u, g, hd = f.apply_vhd(p, x)

    u_ref = f.apply(p, x)
    if cfg.out_dim == 1 and cfg.squeeze_scalar:
        g_ref = jax.vmap(jax.grad(lambda y: f.apply(p, y)))(x)
        hd_ref = jax.vmap(
            lambda y: hessian_diag(lambda z: f.apply(p, z), y)
        )(x)
    else:
        g_ref = jax.vmap(jax.jacfwd(lambda y: f.apply(p, y)))(x)
        hd_ref = jax.vmap(
            lambda y: jnp.diagonal(
                jax.hessian(lambda z: f.apply(p, z))(y), axis1=-2, axis2=-1
            )
        )(x)
    for a, b in [(u, u_ref), (g, g_ref), (hd, hd_ref)]:
        scale = float(jnp.max(jnp.abs(b))) + 1e-8
        assert float(jnp.max(jnp.abs(a - b))) / scale < 2e-4


def _task_cfg(pde):
    if pde == "poisson":
        return TaskConfig(pde="poisson")
    if pde == "td_burgers":
        return TaskConfig(
            pde="td_burgers",
            domain=DomainConfig(xmin=0.0, xmax=1.0, tmin=0.0, tmax=1.0),
            num_tsteps=11, sample_tsteps=8,
        )
    if pde == "steady_burgers":
        return TaskConfig(
            pde="steady_burgers",
            domain=DomainConfig(xmin=-1.0, xmax=1.0, ymin=-1.0, ymax=1.0),
            max_holes=3, max_hole_size=0.3, max_reynolds=10.0,
        )
    return TaskConfig(
        pde="hyper_elasticity",
        domain=DomainConfig(xmin=0.0, xmax=1.0, ymin=0.0, ymax=1.0),
        max_holes=3, max_hole_size=0.5,
    )


def test_vjac_matches_generic_ad():
    cfg = FieldConfig(
        num_layers=3, layer_size=32, in_dim=2, out_dim=2,
        squeeze_scalar=False, n_fourier=2,
    )
    f = make_field(cfg)
    p = f.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (13, 2), minval=-1, maxval=1)
    u, g = f.apply_vjac(p, x)
    g_ref = jax.vmap(jax.jacfwd(lambda y: f.apply(p, y)))(x)
    scale = float(jnp.max(jnp.abs(g_ref))) + 1e-8
    assert float(jnp.max(jnp.abs(g - g_ref))) / scale < 2e-4
    assert np.allclose(np.asarray(u), np.asarray(f.apply(p, x)), atol=1e-6)


@pytest.mark.parametrize(
    "pde_name",
    ["poisson",
     pytest.param("td_burgers", marks=pytest.mark.slow),
     pytest.param("steady_burgers", marks=pytest.mark.slow),
     pytest.param("hyper_elasticity", marks=pytest.mark.slow)]
)
def test_fused_loss_and_grads_match_generic(pde_name):
    cfg = _task_cfg(pde_name)
    pde = get_pde(cfg)
    fcfg = FieldConfig(
        num_layers=3, layer_size=32, in_dim=pde.in_dim,
        out_dim=pde.out_dim, squeeze_scalar=pde.scalar,
    )
    field = make_field(fcfg)
    fp = field.init(jax.random.PRNGKey(0))
    task_params = pde.sample_params(jax.random.PRNGKey(1))
    pts = pde.sample_points(jax.random.PRNGKey(2), 64, task_params)

    def total(params, fused):
        fn = field.bind(params) if fused else (lambda x: field.apply(params, x))
        bl, dl = pde.loss_fn(fn, pts, task_params)
        return sum(bl.values()) + sum(dl.values())

    l_fused, g_fused = jax.value_and_grad(lambda p: total(p, True))(fp)
    l_gen, g_gen = jax.value_and_grad(lambda p: total(p, False))(fp)
    assert np.isclose(float(l_fused), float(l_gen), rtol=1e-4)
    flat_f, _ = jax.flatten_util.ravel_pytree(g_fused)
    flat_g, _ = jax.flatten_util.ravel_pytree(g_gen)
    scale = float(jnp.max(jnp.abs(flat_g))) + 1e-8
    assert float(jnp.max(jnp.abs(flat_f - flat_g))) / scale < 5e-4
