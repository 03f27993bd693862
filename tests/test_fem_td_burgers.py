"""Implicit-Euler CG1 FEM Burgers oracle tests.

The key check is cross-validation against the independent FV solver —
SURVEY.md section 4 item 4: the reference validates FEM against an
independent JAX FV solver; here both are first-party, so they must agree.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metapde_tpu.config import DomainConfig, TaskConfig
from metapde_tpu.pdes import get_pde
from metapde_tpu.pdes.burgers_formulations.default import ic_fn
from metapde_tpu.solvers import fem_td_burgers, fv_burgers


def _params(re=100.0, a=0.5, b=-0.3):
    return (jnp.array([re]), jnp.array([a, b]))


def test_ic_and_walls():
    params = _params()
    gt = fem_td_burgers.solve(params, resolution=128, num_tsteps=11,
                              ic_fn=ic_fn)
    xs = jnp.linspace(0.0, 1.0, 101)
    v0 = jax.vmap(
        lambda x: fem_td_burgers.evaluate(gt, jnp.array([x, 0.0]))
    )(xs)
    assert float(jnp.max(jnp.abs(v0 - ic_fn(xs, params)))) < 5e-3
    for t in (0.3, 0.7, 1.0):
        for xw in (0.0, 1.0):
            v = fem_td_burgers.evaluate(gt, jnp.array([xw, t]))
            assert abs(float(v)) < 1e-4


@pytest.mark.slow
def test_fem_agrees_with_fv():
    """Two independent discretizations of the same task must agree."""
    params = _params(re=80.0, a=0.4, b=0.2)
    gt_fem = fem_td_burgers.solve(params, resolution=256, num_tsteps=11,
                                  ic_fn=ic_fn)
    gt_fv = fv_burgers.solve(params, resolution=512, num_tsteps=11,
                             ic_fn=ic_fn)
    key = jax.random.PRNGKey(0)
    xs = jax.random.uniform(key, (256,))
    ts = jax.random.uniform(jax.random.PRNGKey(1), (256,))
    xt = jnp.stack([xs, ts], axis=1)
    v_fem = jax.vmap(lambda p: fem_td_burgers.evaluate(gt_fem, p))(xt)
    v_fv = jax.vmap(lambda p: fv_burgers.evaluate(gt_fv, p))(xt)
    rel = float(
        jnp.sqrt(jnp.mean((v_fem - v_fv) ** 2))
        / jnp.sqrt(jnp.mean(v_fv ** 2))
    )
    assert rel < 0.03


def test_self_convergence_in_space():
    params = _params(re=50.0, a=0.3, b=0.0)
    gts = {
        r: fem_td_burgers.solve(params, resolution=r, num_tsteps=11,
                                substeps=8, ic_fn=ic_fn)
        for r in (32, 64, 256)
    }
    xt = jnp.stack(
        [jnp.linspace(0.05, 0.95, 64), jnp.full(64, 0.5)], axis=1
    )
    v = {
        r: jax.vmap(lambda p, g=g: fem_td_burgers.evaluate(g, p))(xt)
        for r, g in gts.items()
    }
    err_lo = float(jnp.sqrt(jnp.mean((v[32] - v[256]) ** 2)))
    err_mid = float(jnp.sqrt(jnp.mean((v[64] - v[256]) ** 2)))
    assert err_mid < err_lo  # refining the mesh reduces the error
    assert err_mid < 0.02


def test_pde_def_fem_gt_wiring():
    cfg = TaskConfig(
        pde="td_burgers",
        domain=DomainConfig(xmin=0.0, xmax=1.0, tmin=0.0, tmax=1.0),
        num_tsteps=11,
        burgers_gt_solver="fem",
    )
    pde = get_pde(cfg)
    params = pde.sample_params(jax.random.PRNGKey(0))
    gt = pde.solve(params, resolution=64)
    assert gt.u_grid.shape == (11, 65)
    v = pde.evaluate_gt(gt, jnp.asarray([0.5, 0.5]))
    assert np.isfinite(float(v))
