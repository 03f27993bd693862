"""FEM reference-solver tests: manufactured solutions + self-convergence
(replicating the reference's fenics_baseline resolution-sweep protocol,
src/fenics_baseline.py:95-175, as automated tests)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metapde_tpu.solvers import fem_poisson
from metapde_tpu.solvers.fem_poisson import mesh_topology, node_coords


def test_mesh_topology():
    tris, nr, nt = mesh_topology(2)
    n_nodes = 1 + nr * nt
    assert tris.min() == 0
    assert tris.max() == n_nodes - 1
    # Euler-ish sanity: E = nt (fan) + 2*nt*(nr-1)
    assert tris.shape == (nt + 2 * nt * (nr - 1), 3)


def test_mesh_areas_positive_and_cover_disk():
    tris, nr, nt = mesh_topology(2)
    coords = node_coords(jnp.array([0.0, 0.0]), nr, nt)  # unit disk
    verts = np.asarray(coords)[tris]
    e1 = verts[:, 1] - verts[:, 0]
    e2 = verts[:, 2] - verts[:, 0]
    areas = 0.5 * (e1[:, 0] * e2[:, 1] - e1[:, 1] * e2[:, 0])
    assert np.all(areas > 0)  # consistent orientation
    # mesh covers exactly the inscribed nt-gon of the disk
    polygon_area = 0.5 * nt * np.sin(2 * np.pi / nt)
    assert np.isclose(areas.sum(), polygon_area, rtol=1e-4)


def test_linear_poisson_disk_manufactured():
    """On the unit disk with u* = 1 - (x^2+y^2)/4 the linear Poisson problem
    lap u = f has f = -1 (since 0.1 u^2 coefficient is part of the operator,
    we check with the full nonlinear operator via the residual instead).
    Here: solve with BC g = u* on boundary and source f = div((1+0.1u*^2)
    grad u*) computed analytically-ish via autodiff on the exact field."""
    from metapde_tpu.ops.operators import weighted_laplacian

    u_star = lambda x: 1.0 - 0.25 * (x[0] ** 2 + x[1] ** 2)
    w_star = lambda x: 1.0 + 0.1 * u_star(x) ** 2

    # Build "task params" whose source matches div(w* grad u*): we cannot
    # express that exactly with Gaussian bumps, so instead we verify on the
    # true task family via self-convergence below. This test only checks the
    # operator sign convention: for u* radial concave, div(w grad u) < 0.
    x = jnp.array([0.3, 0.1])
    val = weighted_laplacian(u_star, w_star, x)
    assert float(val) < 0


@pytest.mark.slow
def test_self_convergence():
    """Solutions at increasing resolution converge (Cauchy) — the FEM
    analogue of fenics_baseline's accuracy-vs-resolution sweep."""
    src = jnp.array([[0.2, -0.1, 1.0], [-0.3, 0.2, -0.5]])
    bc = jnp.array([0.1, 0.3, -0.2, 0.05, 0.1])
    geo = jnp.array([0.1, -0.05])
    params = (src, bc, geo)

    gt_lo = fem_poisson.solve(params, resolution=4)
    gt_mid = fem_poisson.solve(params, resolution=8)
    gt_hi = fem_poisson.solve(params, resolution=16)

    key = jax.random.PRNGKey(0)
    # fixed eval points well inside the domain
    theta = jax.random.uniform(key, (200,), maxval=2 * jnp.pi)
    rho = 0.8 * jnp.sqrt(jax.random.uniform(jax.random.PRNGKey(1), (200,)))
    r_t = 1.0 + geo[0] * jnp.cos(4 * theta) + geo[1] * jnp.cos(8 * theta)
    pts = jnp.stack([rho * r_t * jnp.cos(theta), rho * r_t * jnp.sin(theta)],
                    axis=1)

    v_lo = jax.vmap(lambda x: fem_poisson.evaluate(gt_lo, x))(pts)
    v_mid = jax.vmap(lambda x: fem_poisson.evaluate(gt_mid, x))(pts)
    v_hi = jax.vmap(lambda x: fem_poisson.evaluate(gt_hi, x))(pts)

    err_lo = float(jnp.sqrt(jnp.mean((v_lo - v_hi) ** 2)))
    err_mid = float(jnp.sqrt(jnp.mean((v_mid - v_hi) ** 2)))
    scale = float(jnp.sqrt(jnp.mean(v_hi ** 2)))

    assert err_mid < err_lo  # converging
    assert err_mid / max(scale, 1e-8) < 0.02  # within 2% relative at res 8
    assert np.isfinite(float(gt_hi.residual_norm))


def test_solve_is_finite_and_matches_bc():
    src = jnp.array([[0.0, 0.0, 0.5], [0.1, 0.1, -0.3]])
    bc = jnp.array([0.5, 0.1, 0.0, 0.0, 0.0])
    geo = jnp.array([0.15, 0.1])
    gt = fem_poisson.solve((src, bc, geo), resolution=4)
    assert np.isfinite(np.asarray(gt.u_grid)).all()

    # boundary values match the Dirichlet data
    from metapde_tpu.pdes.poisson import boundary_conditions

    nt = gt.u_grid.shape[1]
    thetas = np.arange(nt) * 2 * np.pi / nt
    r = 1.0 + 0.15 * np.cos(4 * thetas) + 0.1 * np.cos(8 * thetas)
    xs = np.stack([r * np.cos(thetas), r * np.sin(thetas)], axis=1)
    g = np.array([boundary_conditions(bc, x) for x in xs])
    assert np.allclose(np.asarray(gt.u_grid[-1]), g, atol=1e-5)
