"""Geometric-multigrid preconditioner tests (solvers/multigrid.py)."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

# solver-tier: convergence/oracle checks, not semantic smoke
pytestmark = pytest.mark.slow

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


def _rect_operator(per_hole_params, n_holes, resolution, nu=1.0,
                   bounds=(0.0, 1.0, -1.0, 1.0)):
    """The masked rect stiffness operator the rect MG targets."""
    from metapde_tpu.solvers.mesh2d import (
        mesh_topology, node_coords, snapped_geometry,
    )

    xmin, xmax, ymin, ymax = bounds
    tris = jnp.asarray(mesh_topology(resolution))
    coords0 = jnp.asarray(node_coords(resolution, xmin, xmax, ymin, ymax),
                          jnp.float32)
    n_nodes = coords0.shape[0]
    on_rect = (jnp.isclose(coords0[:, 0], xmin)
               | jnp.isclose(coords0[:, 0], xmax)
               | jnp.isclose(coords0[:, 1], ymin)
               | jnp.isclose(coords0[:, 1], ymax))
    cell_h = min((xmax - xmin), (ymax - ymin)) / resolution
    geom = snapped_geometry(tris, coords0, per_hole_params, n_holes,
                            cell_h, boundary_fixed=on_rect)
    node_dead_adjacent = 1.0 - jax.ops.segment_min(
        jnp.repeat(geom.elem_alive, 3), tris.reshape(-1),
        num_segments=n_nodes)
    bdry = on_rect | (node_dead_adjacent > 0.5) | (geom.node_alive < 0.5)

    def apply(u):
        ue = u[tris]
        grad_u = jnp.einsum("ek,ekd->ed", ue, geom.gradphi)
        flux = nu * jnp.einsum("e,ed,ekd->ek", geom.area * geom.elem_alive,
                               grad_u, geom.gradphi)
        r = jax.ops.segment_sum(flux.reshape(-1), tris.reshape(-1),
                                num_segments=n_nodes)
        return jnp.where(bdry, u, r)

    return apply, n_nodes, bdry


def _pore_task_params():
    from metapde_tpu.config import DomainConfig

    dom = DomainConfig(xmin=0.0, xmax=1.0, ymin=-1.0, ymax=1.0)
    pde = get_pde(TaskConfig(pde="steady_burgers", domain=dom))
    return pde, pde.sample_params(jax.random.PRNGKey(5)), dom


def test_rect_vcycle_contracts_residual():
    from metapde_tpu.solvers.multigrid import make_rect_mg_preconditioner

    _, params, dom = _pore_task_params()
    _, _, per_hole_params, n_holes = params
    res = 32
    M = make_rect_mg_preconditioner(per_hole_params, n_holes, res,
                                    dom.xmin, dom.xmax, dom.ymin, dom.ymax)
    A, n, bdry = _rect_operator(per_hole_params, n_holes, res)
    b = jax.random.normal(jax.random.PRNGKey(0), (n,))
    b = jnp.where(bdry, 0.0, b)
    x = M(b)
    r = b - A(x)
    ratio = float(jnp.linalg.norm(r) / jnp.linalg.norm(b))
    # snapped interface cells are irregular; still a strong contraction
    assert ratio < 0.3, ratio


def test_rect_vcycle_is_linear():
    from metapde_tpu.solvers.multigrid import make_rect_mg_preconditioner

    _, params, dom = _pore_task_params()
    _, _, per_hole_params, n_holes = params
    M = make_rect_mg_preconditioner(per_hole_params, n_holes, 16,
                                    dom.xmin, dom.xmax, dom.ymin, dom.ymax,
                                    vector_dim=2)
    n2 = 17 * 17 * 2
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    u = jax.random.normal(k1, (n2,))
    v = jax.random.normal(k2, (n2,))
    lhs = M(2.0 * u - 3.0 * v)
    rhs = 2.0 * M(u) - 3.0 * M(v)
    assert np.allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-4)


def test_rect_mg_solve_matches_jacobi_solve():
    """MG-preconditioned steady-Burgers res-64 solve agrees with the
    Jacobi-preconditioned one."""
    from metapde_tpu.solvers import fem_steady_burgers

    pde, params, dom = _pore_task_params()
    kw = dict(resolution=64, xmin=dom.xmin, xmax=dom.xmax,
              ymin=dom.ymin, ymax=dom.ymax)
    gt_j = fem_steady_burgers.solve(params, precond="jacobi", **kw)
    gt_m = fem_steady_burgers.solve(params, precond="mg", **kw)
    assert float(gt_m.residual_norm) < 5e-4
    d = float(jnp.max(jnp.abs(gt_j.u_grid - gt_m.u_grid)))
    assert d < 5e-3, d
