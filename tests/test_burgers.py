"""TD-Burgers task + FV solver tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metapde_tpu.config import DomainConfig, FieldConfig, TaskConfig
from metapde_tpu.models import make_field
from metapde_tpu.pdes import get_pde
from metapde_tpu.solvers import fv_burgers
from metapde_tpu.pdes.burgers_formulations.default import ic_fn


def _cfg(**kw):
    base = dict(
        pde="td_burgers",
        domain=DomainConfig(xmin=0.0, xmax=1.0, tmin=0.0, tmax=1.0),
        max_reynolds=100.0,
        num_tsteps=11,
        sample_tsteps=8,
    )
    base.update(kw)
    return TaskConfig(**base)


def _params(re=100.0, a=0.5, b=-0.3):
    return (jnp.array([re]), jnp.array([a, b]))


def test_sample_params():
    pde = get_pde(_cfg())
    src, ic = pde.sample_params(jax.random.PRNGKey(0))
    assert src.shape == (1,)
    assert 80.0 <= float(src[0]) <= 100.0
    assert ic.shape == (2,)
    assert np.all(np.abs(ic) <= 2.0)


def test_point_sets_shapes_and_ranges():
    cfg = _cfg()
    pde = get_pde(cfg)
    params = pde.sample_params(jax.random.PRNGKey(0))
    left, right, initial, domain = pde.sample_points(
        jax.random.PRNGKey(1), 256, params
    )
    n_slices = cfg.sample_tsteps - 1
    assert left.shape == (n_slices, 2)
    assert np.allclose(left[:, 0], 0.0)
    assert right.shape == (n_slices, 2)
    assert np.allclose(right[:, 0], 1.0)
    assert np.allclose(initial[:, 1], 0.0)
    n_dom = (256 // n_slices) * n_slices
    assert domain.shape == (n_dom, 2)
    assert np.all((domain[:, 1] >= 0.0) & (domain[:, 1] <= 1.0))


def test_loss_contract():
    pde = get_pde(_cfg())
    params = pde.sample_params(jax.random.PRNGKey(0))
    points = pde.sample_points(jax.random.PRNGKey(1), 128, params)
    field = make_field(FieldConfig(num_layers=2, layer_size=32))
    fp = field.init(jax.random.PRNGKey(2))
    bl, dl = pde.loss_fn(lambda x: field.apply(fp, x), points, params)
    assert set(bl) == {"loss_initial", "loss_left", "loss_right"}
    assert set(dl) == {"loss_domain"}
    for v in list(bl.values()) + list(dl.values()):
        assert np.isfinite(float(v))


def test_residual_zero_for_manufactured_field():
    """u(x,t) independent of x and t with zero velocity: residual = 0 for
    constant field; linear-in-x field gives u_t=0, u_xx=0 -> residual = u u_x."""
    pde = get_pde(_cfg())
    params = _params()
    pts = pde.sample_points_in_domain(jax.random.PRNGKey(0), 64, params)

    const_field = lambda x: jnp.zeros(x.shape[:-1]) + 0.7
    _, dl = pde.loss_fn(
        const_field,
        (pts[:1], pts[:1], pts[:1], pts),
        params,
    )
    assert np.isclose(float(dl["loss_domain"]), 0.0, atol=1e-10)

    lin_field = lambda x: x[..., 0] * 2.0
    _, dl2 = pde.loss_fn(lin_field, (pts[:1], pts[:1], pts[:1], pts), params)
    # residual = -(0 - u u_x) = 2x * 2 = 4x ; mean(16 x^2) over U(0,1) ~ 16/3
    expected = float(np.mean((4.0 * np.asarray(pts[:, 0])) ** 2))
    assert np.isclose(float(dl2["loss_domain"]), expected, rtol=1e-4)


def test_fv_ic_and_walls():
    params = _params()
    gt = fv_burgers.solve(params, resolution=128, num_tsteps=11, ic_fn=ic_fn)
    xs = jnp.linspace(0.0, 1.0, 101)
    # t = 0 reproduces the IC
    v0 = jax.vmap(lambda x: fv_burgers.evaluate(gt, jnp.array([x, 0.0])))(xs)
    ic0 = ic_fn(xs, params)
    assert float(jnp.max(jnp.abs(v0 - ic0))) < 5e-3
    # walls stay at the BC value (0 for the default sine basis)
    for t in (0.3, 0.7, 1.0):
        for xw in (0.0, 1.0):
            v = fv_burgers.evaluate(gt, jnp.array([xw, t]))
            assert abs(float(v)) < 1e-4


def test_fv_nonunit_domain_stable():
    """The static substep count must use the PHYSICAL cell width
    (xmax-xmin)/nx; a hardcoded dx=1/nx exceeded the explicit-diffusion
    stability limit by (1/L)^2 on domains shorter than 1 (regression)."""
    params = _params(re=9.0)
    gt = fv_burgers.solve(
        params, resolution=64, num_tsteps=11, max_reynolds=10.0,
        ic_fn=ic_fn, xmin=0.0, xmax=0.5,
    )
    assert bool(jnp.all(jnp.isfinite(gt.u_grid)))
    # wall values still reproduce the BC (= IC at the wall coordinate)
    for t in (0.4, 1.0):
        for xw in (0.0, 0.5):
            v = fv_burgers.evaluate(gt, jnp.array([xw, t]))
            bc = float(ic_fn(jnp.asarray(xw), params))
            assert abs(float(v) - bc) < 1e-4


@pytest.mark.slow
def test_fv_self_convergence():
    params = _params(re=90.0, a=1.0, b=0.5)
    gt_lo = fv_burgers.solve(params, resolution=64, num_tsteps=11, ic_fn=ic_fn)
    gt_mid = fv_burgers.solve(params, resolution=128, num_tsteps=11, ic_fn=ic_fn)
    gt_hi = fv_burgers.solve(params, resolution=512, num_tsteps=11, ic_fn=ic_fn)

    key = jax.random.PRNGKey(0)
    xs = jax.random.uniform(key, (400,))
    ts = jax.random.uniform(jax.random.PRNGKey(1), (400,))
    pts = jnp.stack([xs, ts], axis=1)

    v_lo = jax.vmap(lambda p: fv_burgers.evaluate(gt_lo, p))(pts)
    v_mid = jax.vmap(lambda p: fv_burgers.evaluate(gt_mid, p))(pts)
    v_hi = jax.vmap(lambda p: fv_burgers.evaluate(gt_hi, p))(pts)

    err_lo = float(jnp.sqrt(jnp.mean((v_lo - v_hi) ** 2)))
    err_mid = float(jnp.sqrt(jnp.mean((v_mid - v_hi) ** 2)))
    scale = float(jnp.sqrt(jnp.mean(v_hi ** 2)))
    assert err_mid < err_lo
    assert err_mid / scale < 0.05


def test_solution_bounded_and_decaying():
    params = _params(re=100.0, a=2.0, b=2.0)  # worst-case IC amplitude
    gt = fv_burgers.solve(params, resolution=128, num_tsteps=11, ic_fn=ic_fn)
    u = np.asarray(gt.u_grid[:, 1:-1])  # interior cells
    assert np.isfinite(u).all()
    assert np.abs(u).max() <= 5.0  # maximum principle bound
    # viscous dissipation: final sup-norm below initial
    assert np.abs(u[-1]).max() < np.abs(u[0]).max()
