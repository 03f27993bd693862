"""Unit tests for differential operators against analytic functions
(the test class the reference lacks entirely — SURVEY.md section 4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metapde_tpu.ops import (
    divergence,
    divergence_tensor,
    hessian_diag,
    laplacian,
    vmap_divergence,
    vmap_laplacian,
    weighted_laplacian,
)


def test_laplacian_quadratic():
    # u = x^2 + 3y^2 -> lap = 2 + 6 = 8
    u = lambda x: x[0] ** 2 + 3.0 * x[1] ** 2
    x = jnp.array([0.3, -0.7])
    assert np.isclose(laplacian(u, x), 8.0, atol=1e-5)


def test_laplacian_trig():
    # u = sin(x) cos(2y) -> lap = -sin(x)cos(2y) - 4 sin(x)cos(2y)
    u = lambda x: jnp.sin(x[0]) * jnp.cos(2.0 * x[1])
    x = jnp.array([0.5, 0.2])
    expected = -5.0 * np.sin(0.5) * np.cos(0.4)
    assert np.isclose(laplacian(u, x), expected, rtol=1e-5)


def test_weighted_laplacian_matches_product_rule():
    # div(w grad u) = w lap u + grad w . grad u
    u = lambda x: jnp.sin(x[0]) + x[1] ** 3
    w = lambda x: 1.0 + 0.1 * u(x) ** 2
    x = jnp.array([0.4, 0.6])

    gu = jax.grad(u)(x)
    gw = jax.grad(w)(x)
    expected = w(x) * laplacian(u, x) + gw @ gu
    assert np.isclose(weighted_laplacian(u, w, x), expected, rtol=1e-5)


def test_weighted_laplacian_matches_reference_formulation():
    # reference computes trace(jacfwd(x -> grad(u)(x) * w(x))) (field.py:66-72)
    u = lambda x: jnp.sin(2 * x[0]) * x[1]
    w = lambda x: 1.0 + 0.1 * u(x) ** 2
    x = jnp.array([0.3, -0.2])
    ref = jnp.trace(jax.jacfwd(lambda y: jax.jacrev(u)(y) * w(y))(x))
    assert np.isclose(weighted_laplacian(u, w, x), ref, rtol=1e-5)


def test_divergence():
    # v = (x^2, xy) -> div = 2x + x = 3x
    v = lambda x: jnp.array([x[0] ** 2, x[0] * x[1]])
    x = jnp.array([0.5, 1.5])
    assert np.isclose(divergence(v, x), 1.5, rtol=1e-5)


def test_divergence_tensor():
    # T = [[x, y], [xy, y^2]] -> row div = (1 + 1, y + 2y)
    T = lambda x: jnp.array([[x[0], x[1]], [x[0] * x[1], x[1] ** 2]])
    x = jnp.array([2.0, 3.0])
    out = divergence_tensor(T, x)
    assert np.allclose(out, [2.0, 9.0], rtol=1e-5)


def test_hessian_diag():
    u = lambda x: x[0] ** 3 + 2.0 * x[1] ** 2 + x[0] * x[1]
    x = jnp.array([1.0, 2.0])
    assert np.allclose(hessian_diag(u, x), [6.0, 4.0], rtol=1e-5)


def test_vmap_wrappers():
    u = lambda x: jnp.sum(x ** 2) if x.ndim == 1 else jnp.sum(x ** 2, axis=-1)
    pts = jax.random.normal(jax.random.PRNGKey(0), (17, 2))
    laps = vmap_laplacian(pts, lambda x: jnp.sum(x ** 2))
    assert laps.shape == (17,)
    assert np.allclose(laps, 4.0, rtol=1e-4)

    v = lambda x: 2.0 * x
    divs = vmap_divergence(pts, v)
    assert np.allclose(divs, 4.0, rtol=1e-4)
