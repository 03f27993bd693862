"""Double-precision oracle paths (solve_x64) for the accuracy-sweep
baselines.

The reference's classical oracle (PETSc/MUMPS via FEniCS) is f64
throughout; these tests pin that each family's solve_x64 (a) actually
produces f64 fields, and (b) agrees with the f32 production solve at the
same resolution to within f32 round-off-dominated tolerance — i.e. the
two paths discretize the same problem and differ only in precision.
"""

import jax
import jax.numpy as jnp
import numpy as np

import pytest

# solver-tier: convergence/oracle checks, not semantic smoke
pytestmark = pytest.mark.slow

from metapde_tpu.config import TaskConfig, DomainConfig
from metapde_tpu.pdes import get_pde
from metapde_tpu.solvers import fem_poisson, fem_elasticity, fem_steady_burgers


def _rel(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return float(np.sqrt(np.sum((a - b) ** 2) / (np.sum(b**2) + 1e-30)))


def test_poisson_x64_matches_f32_solve():
    cfg = TaskConfig(pde="poisson")
    pde = get_pde(cfg)
    params = pde.sample_params(jax.random.PRNGKey(0))
    gt32 = fem_poisson.solve(params, resolution=8)
    gt64 = fem_poisson.solve_x64(params, resolution=8)
    assert gt64.u_grid.dtype == jnp.float64
    assert _rel(gt32.u_grid, gt64.u_grid) < 5e-3


def test_elasticity_x64_matches_f32_solve():
    dom = DomainConfig(xmin=0.0, xmax=1.0, ymin=0.0, ymax=1.0)
    cfg = TaskConfig(pde="hyper_elasticity", domain=dom,
                     max_holes=5, max_hole_size=0.5,
                     vary_source=False, vary_bc=False)
    pde = get_pde(cfg)
    params = pde.sample_params(jax.random.PRNGKey(1))
    # pde.solve / pde.solve_ref share the ligament-aware resolution floor,
    # so both produce the same grid; solve_ref keeps f64 leaves
    gt32 = pde.solve(params, resolution=12)
    gt64 = pde.solve_ref(params, resolution=12)
    assert gt64.u_grid.dtype == jnp.float64
    assert gt32.u_grid.shape == gt64.u_grid.shape
    # nonlinear energy minimization: both paths must land on the same
    # buckling branch and agree to f32-assembly accuracy
    assert _rel(gt32.u_grid, gt64.u_grid) < 2e-2
    # the raw f64 cascade still works standalone (back-compat path)
    gt_casc = fem_elasticity.solve_x64(params, resolution=12)
    assert gt_casc.u_grid.dtype == jnp.float64


def test_fv_burgers_x64_matches_f32_solve():
    cfg = TaskConfig(pde="td_burgers",
                     domain=DomainConfig(xmin=0.0, xmax=1.0))
    pde = get_pde(cfg)
    params = pde.sample_params(jax.random.PRNGKey(3))
    gt32 = pde.solve(params, resolution=128)
    gt64 = pde.solve_ref(params, resolution=128)
    assert gt64.u_grid.dtype == jnp.float64
    assert _rel(gt32.u_grid, gt64.u_grid) < 1e-3


def test_steady_burgers_x64_matches_f32_solve():
    dom = DomainConfig(xmin=0.0, xmax=1.0, ymin=-1.0, ymax=1.0)
    cfg = TaskConfig(pde="steady_burgers", domain=dom)
    pde = get_pde(cfg)
    params = pde.sample_params(jax.random.PRNGKey(2))
    gt32 = pde.solve(params, resolution=16)
    gt64 = fem_steady_burgers.solve_x64(
        params, resolution=16, xmin=dom.xmin, xmax=dom.xmax,
        ymin=dom.ymin, ymax=dom.ymax)
    assert gt64.u_grid.dtype == jnp.float64
    assert _rel(gt32.u_grid, gt64.u_grid) < 5e-3
    # f64 Newton must reach a far tighter residual than the f32 floor
    assert float(gt64.residual_norm) < 1e-7
