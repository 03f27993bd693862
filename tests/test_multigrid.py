"""Geometric-multigrid preconditioner tests (solvers/multigrid.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from metapde_tpu.config import TaskConfig
from metapde_tpu.pdes import get_pde
from metapde_tpu.solvers import fem_poisson
from metapde_tpu.solvers.multigrid import make_polar_mg_preconditioner


def _linear_operator(geo_params, resolution):
    """The unit-coefficient stiffness operator MG targets (finest level)."""
    from metapde_tpu.solvers.fem_poisson import (
        _element_geometry, mesh_topology, node_coords,
    )

    tris_np, nr, nt = mesh_topology(resolution)
    tris = jnp.asarray(tris_np)
    n_nodes = 1 + nr * nt
    coords = node_coords(geo_params, nr, nt)
    gradphi, area, _ = _element_geometry(coords, tris)
    bdry = jnp.zeros((n_nodes,), bool).at[
        jnp.arange(1 + (nr - 1) * nt, n_nodes)
    ].set(True)

    def apply(u):
        ue = u[tris]
        grad_u = jnp.einsum("ek,ekd->ed", ue, gradphi)
        flux = jnp.einsum("e,ed,ekd->ek", area, grad_u, gradphi)
        r = jax.ops.segment_sum(
            flux.reshape(-1), tris.reshape(-1), num_segments=n_nodes
        )
        return jnp.where(bdry, u, r)

    return apply, n_nodes, bdry


def test_vcycle_contracts_residual():
    """One V-cycle must shrink ||b - A M(b)|| by a large factor."""
    geo = jnp.asarray([0.05, 0.02])
    res = 16
    M = make_polar_mg_preconditioner(geo, res)
    A, n, bdry = _linear_operator(geo, res)
    key = jax.random.PRNGKey(0)
    b = jax.random.normal(key, (n,))
    b = jnp.where(bdry, 0.0, b)
    x = M(b)
    r = b - A(x)
    # the polar chart is strongly anisotropic near the center (arc length
    # ~ rho dtheta), which caps point-smoother MG at a milder contraction
    # than textbook 0.1 — still ample for Krylov preconditioning
    ratio = float(jnp.linalg.norm(r) / jnp.linalg.norm(b))
    assert ratio < 0.4, ratio


def test_vcycle_is_linear():
    """Krylov preconditioning requires M to be a fixed linear operator."""
    geo = jnp.asarray([0.1, -0.05])
    M = make_polar_mg_preconditioner(geo, 8)
    A, n, bdry = _linear_operator(geo, 8)
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    u = jax.random.normal(k1, (n,))
    v = jax.random.normal(k2, (n,))
    lhs = M(2.0 * u - 3.0 * v)
    rhs = 2.0 * M(u) - 3.0 * M(v)
    assert np.allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-4)


def test_mg_solve_matches_jacobi_solve():
    """MG-preconditioned Poisson solve agrees with the Jacobi-preconditioned
    solve at a resolution where both converge."""
    pde = get_pde(TaskConfig(pde="poisson"))
    params = pde.sample_params(jax.random.PRNGKey(0))
    gt_j = fem_poisson.solve(params, resolution=16, precond="jacobi")
    gt_m = fem_poisson.solve(params, resolution=16, precond="mg")
    assert float(gt_m.residual_norm) < 5e-4
    d = float(jnp.max(jnp.abs(gt_j.u_grid - gt_m.u_grid)))
    assert d < 5e-3, d


def test_mg_enables_high_resolution():
    """res-32 solve (auto -> mg) converges and refines the res-16 answer."""
    pde = get_pde(TaskConfig(pde="poisson"))
    params = pde.sample_params(jax.random.PRNGKey(2))
    gt32 = fem_poisson.solve(params, resolution=32)
    assert float(gt32.residual_norm) < 1e-3
    gt16 = fem_poisson.solve(params, resolution=16)
    gt8 = fem_poisson.solve(params, resolution=8)
    pts = pde.sample_points_in_domain(jax.random.PRNGKey(3), 256, params)
    v8, v16, v32 = (
        jax.vmap(lambda p, g=g: fem_poisson.evaluate(g, p))(pts)
        for g in (gt8, gt16, gt32)
    )
    e8 = float(jnp.sqrt(jnp.mean((v8 - v32) ** 2)))
    e16 = float(jnp.sqrt(jnp.mean((v16 - v32) ** 2)))
    assert e16 < e8  # refinement is converging
