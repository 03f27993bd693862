"""3D nonlinear Poisson (manufactured-solution family) tests.

This is the BASELINE.json configs[4] "3D Poisson stretch": no reference
counterpart (the reference is 2D-only, src/poisson/poisson_common.py), so
correctness is pinned by the manufactured solution itself — the exact
solution must zero the residual loss by construction.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from metapde_tpu.config import (
    Config, FieldConfig, MamlConfig, MeshConfig, TaskConfig, TrainConfig,
)
from metapde_tpu.pdes import get_pde
from metapde_tpu.pdes.poisson3d import exact_solution, is_outside, radius


def _cfg(**kw):
    return TaskConfig(pde="poisson3d", **kw)


def test_mms_exact_solution_zeroes_the_loss():
    """The manufactured solution evaluated as the field must satisfy both
    the residual and the boundary condition to f32 round-off."""
    pde = get_pde(_cfg())
    params = pde.sample_params(jax.random.PRNGKey(0))
    sol_params = (params[0], params[1])
    points = pde.sample_points(jax.random.PRNGKey(1), 64, params)

    def field_fn(xs):
        # single-point and batched calls, like the real field apply
        if xs.ndim == 1:
            return exact_solution(sol_params, xs)
        return jax.vmap(lambda x: exact_solution(sol_params, x))(xs)

    b_losses, d_losses = pde.loss_fn(field_fn, points, params)
    assert float(b_losses["boundary_loss"]) < 1e-10
    # second-derivative cancellation in f32: residual ~1e-5 scale squared
    assert float(d_losses["domain_loss"]) < 1e-6

    # a perturbed solution must NOT zero the residual (the loss sees it)
    def bad_fn(xs):
        x0 = xs[0] if xs.ndim == 1 else xs[:, 0]
        return field_fn(xs) + 0.1 * jnp.sin(3.0 * x0)
    _, bad_d = pde.loss_fn(bad_fn, points, params)
    assert float(bad_d["domain_loss"]) > 1e-2


def test_samplers_respect_geometry():
    pde = get_pde(_cfg())
    params = pde.sample_params(jax.random.PRNGKey(2))
    geo = params[2]

    pts = pde.sample_points_in_domain(jax.random.PRNGKey(3), 256, params)
    outside = jax.vmap(is_outside, in_axes=(0, None))(pts, geo)
    assert not bool(jnp.any(outside))

    bpts = pde.sample_points(jax.random.PRNGKey(4), 128, params)[0]
    lengths = jnp.linalg.norm(bpts, axis=1)
    dirs = bpts / lengths[:, None]
    r0 = jax.vmap(lambda d: radius(d, geo[0], geo[1]))(dirs)
    np.testing.assert_allclose(np.asarray(lengths), np.asarray(r0),
                               rtol=1e-5)


def test_vary_flags_freeze_factors():
    pde = get_pde(_cfg(vary_geometry=False))
    g1 = pde.sample_params(jax.random.PRNGKey(5))[2]
    g2 = pde.sample_params(jax.random.PRNGKey(6))[2]
    np.testing.assert_array_equal(np.asarray(g1), np.asarray(g2))

    pde = get_pde(_cfg(vary_source=False, vary_bc=False))
    p1 = pde.sample_params(jax.random.PRNGKey(5))
    p2 = pde.sample_params(jax.random.PRNGKey(6))
    np.testing.assert_array_equal(np.asarray(p1[0]), np.asarray(p2[0]))
    np.testing.assert_array_equal(np.asarray(p1[1]), np.asarray(p2[1]))
    assert not np.array_equal(np.asarray(p1[2]), np.asarray(p2[2]))


def test_radius_smooth_at_poles():
    # the Re[Y_4^4]-type term must vanish at the poles; zonal term survives
    c1, c2 = 0.2, -0.1
    north = jnp.array([0.0, 0.0, 1.0])
    r_pole = float(radius(north, c1, c2))
    assert np.isclose(r_pole, 1.0 + c2 * 1.0)
    equator = jnp.array([1.0, 0.0, 0.0])
    assert np.isclose(float(radius(equator, c1, c2)), 1.0 + c1 - c2)


@pytest.mark.slow
def test_fused_vhd_matches_operator_path_in_3d():
    """The fused Taylor-mode residual (field.bind(...).vhd) must agree with
    the jacfwd-of-grad operator path for in_dim=3."""
    from metapde_tpu.models import make_field

    pde = get_pde(_cfg())
    params = pde.sample_params(jax.random.PRNGKey(7))
    points = pde.sample_points(jax.random.PRNGKey(8), 32, params)

    fcfg = FieldConfig(num_layers=3, layer_size=16, in_dim=3, out_dim=1,
                       squeeze_scalar=True)
    field = make_field(fcfg)
    fp = field.init(jax.random.PRNGKey(9))

    bound = field.bind(fp)                       # has .vhd
    plain = lambda xs: field.apply(fp, xs)       # operator path
    assert hasattr(bound, "vhd")

    b1, d1 = pde.loss_fn(bound, points, params)
    b2, d2 = pde.loss_fn(plain, points, params)
    np.testing.assert_allclose(float(b1["boundary_loss"]),
                               float(b2["boundary_loss"]), rtol=1e-5)
    np.testing.assert_allclose(float(d1["domain_loss"]),
                               float(d2["domain_loss"]), rtol=2e-3)


@pytest.mark.slow
def test_maml_driver_3d_end_to_end(tmp_path):
    """Meta-train a few steps on poisson3d, validating against the exact
    oracle — the full driver path (sampling, rollout, validation) in 3D."""
    from metapde_tpu.train import maml_driver

    cfg = Config(
        task=TaskConfig(pde="poisson3d", inner_points=32, outer_points=32,
                        validation_points=64, n_eval=2),
        model=FieldConfig(num_layers=2, layer_size=16),
        maml=MamlConfig(bsize=2, inner_steps=2),
        train=TrainConfig(outer_steps=3, log_every=1, viz_every=0,
                          checkpoint_every=0, steps_per_call=1,
                          out_dir=str(tmp_path), expt_name="p3d"),
    )
    maml_driver.run(cfg)
    import json
    with open(tmp_path / "p3d" / "metrics.jsonl") as f:
        rows = [json.loads(l) for l in f if l.strip()]
    assert rows and all(np.isfinite(r["val_rel_err"]) for r in rows)
    # exact oracle: ground truth carries no discretization error, so the
    # untrained-field rel err is O(1), not NaN/inf
    assert rows[0]["val_rel_err"] < 1e3


@pytest.mark.slow
def test_large_task_batch_sharded_meta_step():
    """BASELINE.json configs[4]: a 256-task second-order MAML meta-step,
    task-batch sharded over the 8-device virtual mesh."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    import optax

    from metapde_tpu.train import maml_driver

    cfg = Config(
        task=TaskConfig(pde="poisson3d", inner_points=8, outer_points=8,
                        validation_points=8, n_eval=1),
        model=FieldConfig(num_layers=2, layer_size=8),
        maml=MamlConfig(bsize=256, inner_steps=2),
        mesh=MeshConfig(n_task_shards=8),
        train=TrainConfig(outer_steps=1, steps_per_call=1),
    )
    c = maml_driver.build(cfg)
    params, lrs = c["init_params"], c["inner_lrs"]
    opt_state = c["outer_opt"].init(params)
    lr_opt_state = c["lr_opt"].init(lrs)
    out = c["train_step"](jax.random.PRNGKey(0), params, lrs, opt_state,
                          lr_opt_state)
    losses, meta_losses = out[4], out[5]
    assert np.all(np.isfinite(np.asarray(meta_losses[0])))
    assert np.asarray(meta_losses[0]).shape[0] == 256
