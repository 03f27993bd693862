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


def test_chart_cubic_reproduces_cubics():
    """The bicubic Lagrange interpolant is exact for radial cubics away
    from the reflected center row, including the last cell (which uses the
    cubic-extrapolated top row) — the property that keeps solve_richardson
    at full order up to the boundary."""
    nr, nt = 8, 32
    p = lambda t: 0.3 - 0.2 * t + 0.05 * t ** 2 - 0.01 * t ** 3
    i = jnp.arange(nr + 1, dtype=jnp.float32)
    grid = jnp.tile(p(i)[:, None], (1, nt))
    padded = fem_poisson._pad_rows_for_cubic(grid)
    fis = jnp.array([1.25, 3.7, 6.5, nr - 0.5, nr - 0.01], jnp.float32)
    fjs = jnp.array([0.0, 5.3, 17.9, 31.2, 12.0], jnp.float32)
    vals = jax.vmap(
        lambda a, b: fem_poisson._chart_cubic(padded, nr, nt, a, b)
    )(fis, fjs)
    assert np.allclose(np.asarray(vals), np.asarray(p(fis)), atol=2e-5)


def test_evaluate_cubic_close_to_bilinear_and_exact_on_boundary():
    src = jnp.array([[0.0, 0.0, 0.5], [0.1, 0.1, -0.3]])
    bc = jnp.array([0.5, 0.1, 0.0, 0.0, 0.0])
    geo = jnp.array([0.15, 0.1])
    gt = fem_poisson.solve((src, bc, geo), resolution=4)
    pts = jnp.array([[0.3, 0.1], [-0.2, 0.4], [0.0, 0.0], [0.5, -0.5]])
    v_lin = jax.vmap(lambda x: fem_poisson.evaluate(gt, x))(pts)
    v_cub = jax.vmap(lambda x: fem_poisson.evaluate_cubic(gt, x))(pts)
    assert np.allclose(np.asarray(v_lin), np.asarray(v_cub), atol=5e-2)
    # on the lattice the interpolants agree exactly (both interpolate)
    nt = gt.u_grid.shape[1]
    theta0 = 2 * np.pi * 3 / nt
    r0 = 1.0 + 0.15 * np.cos(4 * theta0) + 0.1 * np.cos(8 * theta0)
    xb = jnp.array([r0 * np.cos(theta0), r0 * np.sin(theta0)])
    assert np.isclose(float(fem_poisson.evaluate_cubic(gt, xb)),
                      float(gt.u_grid[-1, 3]), atol=1e-5)


@pytest.mark.slow
def test_richardson_order_beats_p1():
    """solve_richardson + evaluate_cubic converges at order >~3 (vs P1's
    h^2), matching the reference's quadratic-FEM oracle order
    (src/poisson/poisson_fenics.py:58). Measured against a richardson
    solve at 4x resolution."""
    src = jnp.array([[0.2, -0.1, 1.0], [-0.3, 0.2, -0.5]])
    bc = jnp.array([0.1, 0.3, -0.2, 0.05, 0.1])
    geo = jnp.array([0.1, -0.05])
    params = (src, bc, geo)

    ref = fem_poisson.solve_richardson(params, resolution=8)
    key = jax.random.PRNGKey(0)
    theta = jax.random.uniform(key, (300,), maxval=2 * jnp.pi)
    rho = 0.95 * jnp.sqrt(jax.random.uniform(jax.random.PRNGKey(1), (300,)))
    r_t = 1.0 + geo[0] * jnp.cos(4 * theta) + geo[1] * jnp.cos(8 * theta)
    pts = jnp.stack([rho * r_t * jnp.cos(theta), rho * r_t * jnp.sin(theta)],
                    axis=1)

    with jax.enable_x64(True):
        v_ref = jax.vmap(lambda x: fem_poisson.evaluate_cubic(ref, x))(pts)
        errs = {}
        for res in (2, 4):
            g = fem_poisson.solve_richardson(params, resolution=res)
            v = jax.vmap(lambda x: fem_poisson.evaluate_cubic(g, x))(pts)
            errs[res] = float(jnp.sqrt(jnp.mean((v - v_ref) ** 2)))
        # P1 x64 on the same fine lattice as richardson res=4, bilinear eval
        gp = fem_poisson.solve_x64(params, resolution=8)
        vp = jax.vmap(lambda x: fem_poisson.evaluate(gp, x))(pts)
        err_p1 = float(jnp.sqrt(jnp.mean((vp - v_ref) ** 2)))

    # observed (2026-08-20): errs[2]=1.5e-3, errs[4]=2.2e-4 (ratio 6.9,
    # order ~2.8 and rising with res), err_p1=1.7e-3 (7.7x worse than
    # richardson at the same dominant solve cost)
    assert errs[4] < errs[2] / 4.5  # clearly better than h^2's ratio of 4
    assert errs[4] < err_p1 / 3.0
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
