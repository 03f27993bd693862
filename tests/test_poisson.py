"""Poisson task tests: sampler statistics, loss contract, golden consistency."""

import jax
import jax.numpy as jnp
import numpy as np

from metapde_tpu.config import FieldConfig, TaskConfig
from metapde_tpu.models import make_field
from metapde_tpu.pdes import get_pde
from metapde_tpu.pdes.poisson import radius


def _pde(**kw):
    return get_pde(TaskConfig(pde="poisson", **kw))


def test_sample_params_shapes_and_ranges():
    pde = _pde()
    src, bc, geo = pde.sample_params(jax.random.PRNGKey(0))
    assert src.shape == (2, 3)
    assert bc.shape == (5,)
    assert geo.shape == (2,)
    assert np.all(np.abs(geo) <= 0.2)
    assert np.all(np.abs(bc) <= 1.0)


def test_vary_flags_freeze_factors():
    pde_frozen = _pde(vary_geometry=False)
    p1 = pde_frozen.sample_params(jax.random.PRNGKey(1))
    p2 = pde_frozen.sample_params(jax.random.PRNGKey(2))
    # geometry frozen (same across tasks), sources differ
    assert np.allclose(p1[2], p2[2])
    assert not np.allclose(p1[0], p2[0])


def test_boundary_points_on_star():
    pde = _pde()
    params = pde.sample_params(jax.random.PRNGKey(0))
    bdry, dom = pde.sample_points(jax.random.PRNGKey(1), 128, params)
    assert bdry.shape == (128, 2)
    assert dom.shape == (128, 2)
    c1, c2 = params[2]
    theta = np.arctan2(bdry[:, 1], bdry[:, 0])
    r = np.linalg.norm(bdry, axis=1)
    assert np.allclose(r, radius(theta, c1, c2), atol=1e-5)


def test_domain_points_inside_star():
    pde = _pde()
    params = pde.sample_params(jax.random.PRNGKey(0))
    pts = pde.sample_points_in_domain(jax.random.PRNGKey(1), 256, params)
    c1, c2 = params[2]
    theta = np.arctan2(pts[:, 1], pts[:, 0])
    r = np.linalg.norm(pts, axis=1)
    assert np.all(r <= radius(theta, c1, c2) + 1e-5)


def test_loss_fn_contract_and_zero_residual():
    pde = _pde()
    params = pde.sample_params(jax.random.PRNGKey(0))
    points = pde.sample_points(jax.random.PRNGKey(1), 64, params)

    cfg = FieldConfig(num_layers=2, layer_size=32)
    field = make_field(cfg)
    fp = field.init(jax.random.PRNGKey(2))
    bl, dl = pde.loss_fn(lambda x: field.apply(fp, x), points, params)
    assert set(bl) == {"boundary_loss"}
    assert set(dl) == {"domain_loss"}
    assert np.isfinite(float(bl["boundary_loss"]))
    assert np.isfinite(float(dl["domain_loss"]))


def test_loss_zero_for_exact_solution_zero_source():
    # field u = const has lap = 0; with zero sources the domain residual is 0
    pde = _pde()
    src, bc, geo = pde.sample_params(jax.random.PRNGKey(0))
    src = jnp.zeros_like(src)
    params = (src, bc, geo)
    points = pde.sample_points(jax.random.PRNGKey(1), 64, params)
    const_field = lambda x: jnp.zeros(x.shape[:-1]) + 0.5
    _, dl = pde.loss_fn(const_field, points, params)
    assert np.isclose(float(dl["domain_loss"]), 0.0, atol=1e-8)


def test_loss_is_jittable_and_differentiable():
    pde = _pde()
    params = pde.sample_params(jax.random.PRNGKey(0))
    points = pde.sample_points(jax.random.PRNGKey(1), 32, params)
    cfg = FieldConfig(num_layers=2, layer_size=32)
    field = make_field(cfg)
    fp = field.init(jax.random.PRNGKey(2))

    @jax.jit
    def total_loss(fp):
        bl, dl = pde.loss_fn(lambda x: field.apply(fp, x), points, params)
        return 100.0 * sum(bl.values()) + sum(dl.values())

    g = jax.grad(total_loss)(fp)
    assert all(np.isfinite(np.asarray(l)).all()
               for l in jax.tree_util.tree_leaves(g))
