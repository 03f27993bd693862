"""Steady 2-D Burgers task + FEM solver + interpolation-utility tests.

The reference's steady-Burgers family is broken/unregistered
(src/burgers/burgers_def.py:6); these tests pin down the working replacement.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metapde_tpu.config import DomainConfig, TaskConfig
from metapde_tpu.pdes import get_pde
from metapde_tpu.solvers import fem_steady_burgers
from metapde_tpu.solvers.interpolation import (
    TaylorLookup,
    build_taylor_lookup,
    knn_interpolant,
    taylor_eval,
)


def _cfg(**kw):
    base = dict(
        pde="steady_burgers",
        domain=DomainConfig(xmin=-1.0, xmax=1.0, ymin=-1.0, ymax=1.0),
        max_holes=4,
        max_hole_size=0.3,
        max_reynolds=10.0,
        vary_source=True,
        vary_bc=True,
        vary_geometry=True,
    )
    base.update(kw)
    return TaskConfig(**base)


def test_sample_params_validity():
    pde = get_pde(_cfg())
    for seed in range(4):
        src, bc, php, nh = pde.sample_params(jax.random.PRNGKey(seed))
        assert src.shape == (1,)
        assert float(src[0]) >= 1.0
        assert bc.shape == (2, 2)
        assert php.shape == (4, 5)
        n = int(nh)
        assert 1 <= n <= 4
        # accepted holes are pairwise non-overlapping with wall clearance
        for i in range(n):
            for j in range(i + 1, n):
                d = np.linalg.norm(np.asarray(php[i, 2:4] - php[j, 2:4]))
                assert d >= float(php[i, 4] + php[j, 4]) + 0.3 - 1e-5


def test_point_sets_geometry():
    pde = get_pde(_cfg())
    params = pde.sample_params(jax.random.PRNGKey(0))
    inlet, outlet, walls, pores, domain = pde.sample_points(
        jax.random.PRNGKey(1), 96, params
    )
    assert np.allclose(inlet[:, 0], -1.0)
    assert np.allclose(outlet[:, 0], 1.0)
    assert np.all(
        np.isclose(walls[:, 1], -1.0) | np.isclose(walls[:, 1], 1.0)
    )
    assert domain.shape == (96, 2)

    # domain points avoid hole interiors
    src, bc, php, nh = params
    from metapde_tpu.solvers.fem_elasticity import _is_in_hole

    inside = jax.vmap(lambda p: _is_in_hole(p, php, nh))(domain)
    assert not bool(np.any(inside))

    # pore points lie on some valid pore ring: r(theta) matches the radius
    def ring_err(p):
        v = p[None, :2] - php[:, 2:4]
        theta = jnp.arctan2(v[:, 0], v[:, 1])
        r0 = php[:, 4] * (
            1 + php[:, 0] * jnp.cos(4 * theta) + php[:, 1] * jnp.cos(8 * theta)
        )
        errs = jnp.abs(jnp.linalg.norm(v, axis=1) - r0)
        mask = jnp.arange(php.shape[0]) < nh
        return jnp.min(jnp.where(mask, errs, jnp.inf))

    errs = jax.vmap(ring_err)(pores)
    assert float(jnp.max(errs)) < 1e-4


def test_domain_residual_analytic():
    """u = (y^2, 0): (u.grad)u = 0, lap u = (2,0) ->
    residual^2 = (2 nu)^2 in component 0."""
    pde = get_pde(_cfg(max_reynolds=10.0, vary_source=False))
    params = pde.sample_params(jax.random.PRNGKey(0))
    re = float(params[0][0])
    nu = 1.0 / re

    def field(x):
        y = x[..., 1]
        return jnp.stack([y ** 2, jnp.zeros_like(y)], axis=-1)

    points = pde.sample_points(jax.random.PRNGKey(1), 48, params)
    _, dl = pde.loss_fn(field, points, params)
    assert np.isclose(float(dl["loss_domain"]), (2 * nu) ** 2 / 2, rtol=1e-4)


def test_boundary_losses_zero_for_exact_bc():
    pde = get_pde(_cfg())
    params = pde.sample_params(jax.random.PRNGKey(2))
    _, bc, _, _ = params

    # a field that matches the inlet profile at x=-1, outlet at x=1 and is
    # zero on walls: bilinear blend in x of the two profiles
    def field(x):
        s = jnp.sin(jnp.pi * (x[..., 1] + 1.0) / 2.0)
        tx = (x[..., 0] + 1.0) / 2.0
        amp = (1 - tx)[..., None] * bc[0] + tx[..., None] * bc[1]
        return amp * s[..., None]

    points = pde.sample_points(jax.random.PRNGKey(3), 96, params)
    bl, _ = pde.loss_fn(field, points, params)
    assert float(bl["loss_inlet"]) < 1e-9
    assert float(bl["loss_outlet"]) < 1e-9
    # walls are zero by the sin profile; pore points are not (finite loss)
    assert np.isfinite(float(bl["loss_noslip"]))


def test_solver_zero_bc_gives_zero():
    params = (
        jnp.asarray([5.0]), jnp.zeros((2, 2)),
        jnp.concatenate(
            [jnp.zeros((1, 2)), jnp.zeros((1, 2)), 0.15 * jnp.ones((1, 1))],
            axis=1,
        ),
        jnp.int32(1),
    )
    gt = fem_steady_burgers.solve(params, resolution=16)
    assert float(gt.residual_norm) < 1e-5
    assert np.allclose(np.asarray(gt.u_grid), 0.0, atol=1e-5)


@pytest.mark.slow
def test_solver_resolution_consistency():
    pde = get_pde(_cfg(max_reynolds=5.0))
    params = pde.sample_params(jax.random.PRNGKey(4))
    gt_lo = pde.solve(params, resolution=16)
    gt_hi = pde.solve(params, resolution=32)
    assert np.isfinite(np.asarray(gt_hi.u_grid)).all()
    pts = pde.sample_points_in_domain(jax.random.PRNGKey(5), 128, params)
    v_lo = jax.vmap(lambda p: fem_steady_burgers.evaluate(gt_lo, p))(pts)
    v_hi = jax.vmap(lambda p: fem_steady_burgers.evaluate(gt_hi, p))(pts)
    denom = float(jnp.sqrt(jnp.mean(v_hi ** 2)))
    rel = float(jnp.sqrt(jnp.mean((v_lo - v_hi) ** 2))) / max(denom, 1e-8)
    assert rel < 0.35


def test_taylor_lookup_exact_on_quadratics():
    def f(x):
        return jnp.asarray(
            [x[0] ** 2 + 2.0 * x[0] * x[1], 3.0 * x[1] ** 2 - x[0]]
        )

    anchors = jnp.asarray([[0.0, 0.0], [1.0, 1.0], [-1.0, 0.5]])
    lut = build_taylor_lookup(f, anchors)
    assert isinstance(lut, TaylorLookup)
    for p in [[0.3, -0.2], [1.4, 0.9], [-0.8, 0.6]]:
        x = jnp.asarray(p)
        assert np.allclose(
            np.asarray(taylor_eval(lut, x)), np.asarray(f(x)), atol=1e-4
        )


def test_knn_interpolant_reproduces_smooth_field():
    key = jax.random.PRNGKey(0)
    xys = jax.random.uniform(key, (400, 2), minval=-1.0, maxval=1.0)
    vals = jnp.stack(
        [jnp.sin(xys[:, 0]), jnp.cos(xys[:, 1])], axis=1
    )
    interp = knn_interpolant(xys, vals, temp=100.0)
    x = jnp.asarray([0.1, 0.2])
    out = np.asarray(interp(x))
    expect = np.asarray([np.sin(0.1), np.cos(0.2)])
    assert np.allclose(out, expect, atol=0.05)


def test_knn_interpolant_excludes_masked_samples():
    """Masked (undefined, e.g. in-pore) samples must get zero weight even
    when they are among the k nearest: they must not occupy neighbor slots
    nor receive softmax weight e^0 (regression)."""
    key = jax.random.PRNGKey(0)
    xys = jax.random.uniform(key, (400, 2), minval=-1.0, maxval=1.0)
    vals = jnp.stack([jnp.sin(xys[:, 0]), jnp.cos(xys[:, 1])], axis=1)
    x = jnp.asarray([0.1, 0.2])
    # poison the nearest sample with garbage and mask it out
    d = jnp.sum((xys - x[None, :]) ** 2, axis=1)
    poison = int(jnp.argmin(d))
    vals = vals.at[poison].set(jnp.asarray([1e6, -1e6]))
    mask = jnp.ones(400).at[poison].set(0.0)
    interp = knn_interpolant(xys, vals, mask=mask, temp=100.0)
    out = np.asarray(interp(x))
    expect = np.asarray([np.sin(0.1), np.cos(0.2)])
    assert np.all(np.isfinite(out))
    # loose tolerance: excluding the nearest sample costs some kNN accuracy;
    # the guarded regression produces ~1e6-scale garbage, not 0.1-scale error
    assert np.allclose(out, expect, atol=0.15)
