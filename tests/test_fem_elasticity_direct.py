"""Sparse-direct hyperelasticity oracle (fem_elasticity.solve_direct).

The direct solver replaces the matrix-free Krylov cascade as the
ground-truth path (pdes/hyper_elasticity.py solve/solve_ref) because the
cascade stalls on near-feasibility-limit pore geometries (the reference's
FEniCS oracle is robust there only because MUMPS is a direct solver,
hyper_elasticity_fenics.py:143). These tests pin:
- agreement with the cascade where the cascade is trustworthy (mild
  geometries),
- that the direct solver reaches at-least-as-low discrete energy,
- the ligament-aware resolution floor used by the PdeDef oracle.
"""

import jax
import jax.numpy as jnp
import numpy as np

import pytest

# solver-tier: convergence/oracle checks, not semantic smoke
pytestmark = pytest.mark.slow

from metapde_tpu.config import Config, parse_overrides
from metapde_tpu.pdes import get_pde
from metapde_tpu.pdes.hyper_elasticity import ligament_resolution_floor
from metapde_tpu.solvers import fem_elasticity as fe


def _task(max_hole_size, max_holes=2, seed=None):
    args = [
        "--task.pde=hyper_elasticity",
        "--task.domain.xmin=0.0", "--task.domain.ymin=0.0",
        f"--task.max_holes={max_holes}",
        f"--task.max_hole_size={max_hole_size}",
        "--task.vary_source=false", "--task.vary_bc=false",
    ]
    cfg = parse_overrides(Config(), args)
    return get_pde(cfg.task)


def test_direct_matches_cascade_mild_geometry():
    pde = _task(max_hole_size=0.3)
    params = pde.sample_params(jax.random.PRNGKey(3))
    gt_c = fe.solve(params, resolution=16)
    gt_d = fe.solve_direct(params, resolution=16)
    pts = pde.sample_validation_points(jax.random.PRNGKey(7), 256, params,
                                       gt_c)
    vc = np.asarray(jax.vmap(lambda x: fe.evaluate(gt_c, x))(pts))
    vd = np.asarray(jax.vmap(lambda x: fe.evaluate(gt_d, x))(pts))
    rel = np.mean((vc - vd) ** 2) / np.mean(vd ** 2)
    assert rel < 2e-2, rel
    # the direct solver minimizes at least as well
    assert float(gt_d.final_energy) <= float(gt_c.final_energy) + 1e-5


def test_direct_no_pores_affine_compression():
    """max_holes=0: a solid block under -0.12 top displacement; the interior
    displacement field is y-affine to good accuracy and the solver must
    converge there from the affine warm start."""
    pde = _task(max_hole_size=0.5, max_holes=0)
    params = pde.sample_params(jax.random.PRNGKey(0))
    gt = fe.solve_direct(params, resolution=12)
    v = fe.evaluate(gt, jnp.asarray([0.5, 0.5]))
    assert np.isfinite(np.asarray(v)).all()
    # mid-height vertical displacement ~ half the top displacement
    assert abs(float(v[1]) - (-0.06)) < 0.02, v
    assert float(gt.final_energy) < 0.05


def test_effective_resolution_hook():
    """PdeDef.effective_resolution exposes the ligament floor so sweeps
    (cli/gt_convergence) can report the grid actually solved on."""
    pde = _task(max_hole_size=0.3)
    params = pde.sample_params(jax.random.PRNGKey(3))
    eff = pde.effective_resolution(params, 16)
    assert isinstance(eff, int) and eff >= 16
    # no pores -> identity
    pde0 = _task(max_hole_size=0.5, max_holes=0)
    params0 = pde0.sample_params(jax.random.PRNGKey(0))
    assert pde0.effective_resolution(params0, 16) == 16


def test_ligament_floor():
    # mild pores: requested resolution stands
    php = np.zeros((4, 5), np.float32)
    php[:, 4] = 0.05  # r_max 0.05, wall = 0.25 - 0.1 = 0.15
    assert ligament_resolution_floor(php, 0.25, 1.0, 32) == 32
    # near-limit pores: floor kicks in (wall = 0.25 - 2*0.118 = 0.0136)
    php[:, 4] = 0.118
    res = ligament_resolution_floor(php, 0.25, 1.0, 32)
    assert res >= 140, res
    assert res <= 192
    # cap respected
    php[:, 4] = 0.1249
    assert ligament_resolution_floor(php, 0.25, 1.0, 32) == 192


@pytest.mark.slow
def test_direct_beats_cascade_on_hard_geometry():
    """Near the porosity limit the cascade gets stuck at high energy; the
    direct solver must land materially lower at the same resolution."""
    pde = _task(max_hole_size=1.0, max_holes=2)
    # engineer a near-limit task: circles at the floor's trigger size
    src, bc, php, nh = pde.sample_params(jax.random.PRNGKey(3))
    php = php.at[:, 4].set(0.46)  # L0=1.0, wall=0.08
    params = (src, bc, php, nh)
    gt_c = fe.solve(params, resolution=32)
    gt_d = fe.solve_direct(params, resolution=32)
    assert float(gt_d.final_energy) <= float(gt_c.final_energy) + 1e-6


def test_solve_warm_branch_tracking():
    """Warm-started refinement (solve_warm) converges and stays near the
    coarse solution's energy branch on a mild geometry; the chained solve
    must agree with the coarse one far better than the displacement scale."""
    pde = _task(max_hole_size=0.3)
    params = pde.sample_params(jax.random.PRNGKey(5))
    g12 = pde.solve(params, resolution=12)
    g24 = pde.solve_warm(params, 24, g12)
    assert float(g24.final_gnorm) < 1e-5
    # one branch: energies differ only by discretization, not by branch
    assert abs(float(g24.final_energy) - float(g12.final_energy)) \
        < 0.5 * abs(float(g12.final_energy)) + 1e-4
    pts = pde.sample_validation_points(jax.random.PRNGKey(11), 256, params,
                                       g24)
    v12 = np.asarray(jax.vmap(lambda x: fe.evaluate(g12, x))(pts))
    v24 = np.asarray(jax.vmap(lambda x: fe.evaluate(g24, x))(pts))
    rel = np.mean((v12 - v24) ** 2) / np.mean(v24 ** 2)
    assert rel < 5e-2, rel
    # ref variant returns f64
    g48 = pde.solve_warm(params, 24, g24, ref=True)
    assert g48.u_grid.dtype == jnp.float64
