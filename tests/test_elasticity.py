"""Hyperelasticity task + neo-Hookean FEM solver tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metapde_tpu.config import DomainConfig, FieldConfig, TaskConfig
from metapde_tpu.models import make_field
from metapde_tpu.pdes import get_pde
from metapde_tpu.solvers import fem_elasticity


def _cfg(**kw):
    base = dict(
        pde="hyper_elasticity",
        domain=DomainConfig(xmin=0.0, xmax=1.0, ymin=0.0, ymax=1.0),
        max_holes=5,
        max_hole_size=0.5,
        vary_source=False,
        vary_bc=False,
        vary_geometry=True,
    )
    base.update(kw)
    return TaskConfig(**base)


def test_sample_params_feasible():
    pde = get_pde(_cfg())
    for seed in range(3):
        src, bc, php, nh = pde.sample_params(jax.random.PRNGKey(seed))
        assert src.shape == (2,)
        assert bc.shape == (2,)
        assert php.shape == (25, 5)
        assert int(nh) == 25
        # circles: shape coefficients zeroed (reference :146-148)
        assert np.allclose(php[:, :2], 0.0)
        # feasibility: pore diameter below the cell pitch minus wall
        L0 = 0.25
        assert float(php[0, 4]) * 2 <= L0 * 0.95 + 1e-6


def test_point_sets():
    pde = get_pde(_cfg())
    params = pde.sample_params(jax.random.PRNGKey(0))
    pts = pde.sample_points(jax.random.PRNGKey(1), 64, params)
    top, bottom, left, right, holes, domain = pts
    assert np.allclose(top[:, 1], 1.0)
    assert np.allclose(bottom[:, 1], 0.0)
    assert np.allclose(left[:, 0], 0.0)
    assert np.allclose(right[:, 0], 1.0)
    assert domain.shape == (64, 2)
    # domain points avoid pore interiors
    _, _, php, nh = params
    from metapde_tpu.solvers.fem_elasticity import _is_in_hole

    inside = jax.vmap(lambda p: _is_in_hole(p, php, nh))(domain)
    assert not bool(np.any(inside))


def test_loss_contract_and_identity_field():
    pde = get_pde(_cfg())
    params = pde.sample_params(jax.random.PRNGKey(0))
    points = pde.sample_points(jax.random.PRNGKey(1), 32, params)

    # zero displacement: F = I -> psi = 0; bottom loss 0, top loss = 1000*0.12^2/2
    zero_field = lambda x: jnp.zeros(x.shape[:-1] + (2,))
    bl, dl = pde.loss_fn(zero_field, points, params)
    assert np.isclose(float(dl["loss_domain"]), 0.0, atol=1e-6)
    assert np.isclose(float(bl["loss_bottom"]), 0.0, atol=1e-6)
    assert np.isclose(float(bl["loss_top"]), 1000.0 * 0.12 ** 2 / 2, rtol=1e-4)

    # uniform compression u = (0, -0.12 y): J = 0.88
    def compress(x):
        y = x[..., 1]
        return jnp.stack([jnp.zeros_like(y), -0.12 * y], axis=-1)

    bl2, dl2 = pde.loss_fn(compress, points, params)
    assert float(bl2["loss_top"]) < 1e-6
    assert float(bl2["loss_bottom"]) < 1e-6
    assert float(dl2["loss_domain"]) > 0.0  # strain energy positive


def test_solver_no_holes_uniform_compression():
    """Without pores the solution is close to uniform compression
    u_y = -0.12 y (plus lateral Poisson expansion)."""
    params = (
        jnp.zeros((2,)), jnp.asarray([1.0, 1.0]),
        jnp.zeros((1, 5)), jnp.int32(0),
    )
    gt = fem_elasticity.solve(params, resolution=12, load_steps=2,
                              newton_steps=15)
    assert np.isfinite(np.asarray(gt.u_grid)).all()
    # top row displaced by (0, -0.12), bottom fixed
    assert np.allclose(gt.u_grid[:, -1, 1], -0.12, atol=1e-6)
    assert np.allclose(gt.u_grid[:, 0, :], 0.0, atol=1e-6)
    # mid-height vertical displacement approx -0.06 at the centerline
    mid = gt.u_grid[6, 6, 1]
    assert -0.08 < float(mid) < -0.04


@pytest.mark.slow
def test_solver_with_pores_converges():
    pde = get_pde(_cfg())
    params = pde.sample_params(jax.random.PRNGKey(0))
    gt = pde.solve(params, resolution=24)
    u = np.asarray(gt.u_grid)
    assert np.isfinite(u).all()
    assert np.abs(u).max() < 0.5  # displacements stay physical
    assert float(gt.final_energy) < 1e3

    # evaluation: near the bottom the displacement is ~0
    v = fem_elasticity.evaluate(gt, jnp.asarray([0.5, 0.01]))
    assert np.linalg.norm(np.asarray(v)) < 0.02


@pytest.mark.slow
def test_energy_decreases_with_resolution_consistency():
    """Same task solved at res 12 vs 24: displacement fields agree within
    a few percent away from pores (self-consistency)."""
    pde = get_pde(_cfg(max_holes=3))
    params = pde.sample_params(jax.random.PRNGKey(1))
    gt_lo = pde.solve(params, resolution=12)
    gt_hi = pde.solve(params, resolution=24)
    pts = pde.sample_points_in_domain(jax.random.PRNGKey(2), 128, params)
    v_lo = jax.vmap(lambda p: fem_elasticity.evaluate(gt_lo, p))(pts)
    v_hi = jax.vmap(lambda p: fem_elasticity.evaluate(gt_hi, p))(pts)
    rel = float(
        jnp.sqrt(jnp.mean((v_lo - v_hi) ** 2))
        / jnp.sqrt(jnp.mean(v_hi ** 2))
    )
    assert rel < 0.25
