"""Time-dependent 1-D viscous Burgers on (x, t) in [0,1] x [0, tmax].

PDE (reference: src/burgers/td_burgers_common.py:47-67):

    u_t = (1/Re) u_xx - u u_x        (x, t) in (0,1) x (0, tmax]
    u(x, 0) = IC(x; a, b)            formulation plugin
    u(0, t), u(1, t) = IC(0), IC(1)  Dirichlet walls (default.py:26-31)

The field takes (x, t) as a 2-vector. Task distribution
(td_burgers_common.py:94-113): Re ~ U(0.8, 1) * max_reynolds (vary_source),
ic_params ~ U(-2, 2)^2 (vary_ic).

Sampling semantics preserved (td_burgers_common.py:116-186):
- wall points: one x per time slice, (sample_tsteps - 1) slices
- initial points: domain xs + both walls, at t = 0
- domain points: n rounded down to a multiple of (sample_tsteps - 1)
- time sampling: uniform random in (tmin, tmax) or stratified grid
  (sample_time_random flag)

Ground truth comes from the JAX FV solver (solvers/fv_burgers.py) instead
of implicit-Euler FEniCS; validation coords cycle through the solver's
output time grid exactly as the reference tiles FEM timesteps
(trainer_util.py:61-68).
"""

from functools import partial

import jax
import jax.numpy as jnp

from ..config import TaskConfig
from ..solvers import fem_td_burgers, fv_burgers
from .burgers_formulations import get_formulation
from .registry import PdeDef


def make_pde(cfg: TaskConfig) -> PdeDef:
    dom = cfg.domain
    form = get_formulation(cfg.burgers_formulation)
    n_slices = cfg.sample_tsteps - 1

    def sample_params(key):
        if cfg.fixed_num_pdes is not None:
            key = jax.random.PRNGKey(cfg.seed)
        k1, k2, _ = jax.random.split(key, 3)
        k1 = k1 * jnp.uint32(cfg.vary_source)
        k2 = k2 * jnp.uint32(cfg.vary_ic)
        source_params = cfg.max_reynolds * jax.random.uniform(
            k1, shape=(1,), minval=0.8, maxval=1.0
        )
        ic_params = jax.random.uniform(k2, shape=(2,), minval=-2.0, maxval=2.0)
        return source_params, ic_params

    def sample_time(key, n):
        if cfg.sample_time_random:
            return jax.random.uniform(
                key, (n_slices * n, 1), minval=dom.tmin, maxval=dom.tmax
            )
        t = jnp.linspace(dom.tmin, dom.tmax, n_slices, endpoint=False)
        return jnp.repeat(t[1:], n).reshape(-1, 1)

    def _wall_points(key, x_wall):
        t = sample_time(key, 1)
        x = jnp.full((t.shape[0], 1), x_wall)
        return jnp.concatenate([x, t], axis=1)

    def sample_points_on_left(key, n, params):
        _, k2 = jax.random.split(key)
        return _wall_points(k2, dom.xmin)

    def sample_points_on_right(key, n, params):
        _, k2 = jax.random.split(key)
        return _wall_points(k2, dom.xmax)

    def sample_points_in_domain(key, n, params):
        k1, k2 = jax.random.split(key, 2)
        n_scaled = n // n_slices
        n_sample = n_scaled * n_slices
        xs = jax.random.uniform(
            k1, (n_sample,), minval=dom.xmin, maxval=dom.xmax
        )
        t = sample_time(k2, n_scaled)
        return jnp.concatenate([xs[:, None], t], axis=1)

    def sample_points_initial(key, n, params):
        pts = sample_points_in_domain(key, n, params)
        walls = jnp.array([[dom.xmin], [dom.xmax]])
        xs = jnp.concatenate([pts[:, :1], walls], axis=0)
        return jnp.concatenate([xs, jnp.zeros_like(xs)], axis=1)

    def sample_points(key, n, params):
        k1, k2, k3, k4, k5 = jax.random.split(key, 5)
        return (
            sample_points_on_left(k2, n, params),
            sample_points_on_right(k2, n, params),
            sample_points_initial(k3, n, params),
            sample_points_in_domain(k5, n, params),
        )

    def loss_domain_fn(field_fn, points_in_domain, params):
        """Squared residual u_t - ((1/Re) u_xx - u u_x)
        (td_burgers_common.py:54-67)."""
        source_params, _ = params
        inv_re = 1.0 / source_params[0]

        if hasattr(field_fn, "vhd"):
            # fused pass: g = (u_x, u_t), hd = (u_xx, u_tt); residual
            # u_t - ((1/Re) u_xx - u u_x)
            u, g, hd = field_fn.vhd(points_in_domain)
            res = g[:, 1] - (inv_re * hd[:, 0] - g[:, 0] * u)
            return res ** 2

        def residual(x):
            u = field_fn(x)
            grad_u = jax.grad(lambda y: jnp.sum(field_fn(y)))(x)
            e_x = jnp.zeros_like(x).at[0].set(1.0)
            _, hcol = jax.jvp(
                lambda y: jax.grad(lambda z: jnp.sum(field_fn(z)))(y), (x,), (e_x,)
            )
            u_xx = hcol[0]
            time_term = grad_u[1]
            nabla_term = inv_re * u_xx
            grad_term = grad_u[0] * u
            return time_term - (nabla_term - grad_term)

        return jax.vmap(residual)(points_in_domain) ** 2

    def loss_fn(field_fn, points, params):
        (points_on_left, points_on_right, points_initial,
         points_in_domain) = points
        return (
            {
                "loss_initial": jnp.mean(
                    form.loss_initial_fn(field_fn, points_initial, params)
                ),
                "loss_left": jnp.mean(
                    form.loss_left_fn(field_fn, points_on_left, params)
                ),
                "loss_right": jnp.mean(
                    form.loss_right_fn(field_fn, points_on_right, params)
                ),
            },
            {
                "loss_domain": jnp.mean(
                    loss_domain_fn(field_fn, points_in_domain, params)
                ),
            },
        )

    use_fem_gt = cfg.burgers_gt_solver == "fem"

    def solve(params, resolution=None, boundary_points=None,
              num_tsteps=None):
        # num_tsteps is the TIME-resolution sweep axis (the reference's
        # fenics_baseline.py:132-173 sweeps spatial x time grids by
        # rewriting FLAGS.num_tsteps); default = the task's config value
        nt = num_tsteps if num_tsteps is not None else cfg.num_tsteps
        if use_fem_gt:
            res = resolution if resolution is not None else 256
            return fem_td_burgers.solve(
                params,
                resolution=res,
                num_tsteps=nt,
                ic_fn=form.ic_fn,
                xmin=dom.xmin,
                xmax=dom.xmax,
                tmax=dom.tmax,
            )
        res = resolution if resolution is not None else 512
        return fv_burgers.solve(
            params,
            resolution=res,
            num_tsteps=nt,
            max_reynolds=cfg.max_reynolds,
            ic_fn=form.ic_fn,
            xmin=dom.xmin,
            xmax=dom.xmax,
            tmax=dom.tmax,
        )

    def _fv_solve_ref(params, resolution=None, boundary_points=None,
                      num_tsteps=None):
        res = resolution if resolution is not None else 1024
        return fv_burgers.solve_x64(
            params,
            resolution=res,
            num_tsteps=num_tsteps if num_tsteps is not None else cfg.num_tsteps,
            max_reynolds=cfg.max_reynolds,
            ic_fn=form.ic_fn,
            xmin=dom.xmin,
            xmax=dom.xmax,
            tmax=dom.tmax,
        )

    def sample_validation_points(key, n, params, gt=None):
        """Space random, time cycling through the solver's output grid
        (reference trainer_util.py:61-68)."""
        pts = sample_points_in_domain(key, n, params)
        n_actual = pts.shape[0]
        t_grid = (
            gt.t_grid if gt is not None
            else jnp.linspace(dom.tmin, dom.tmax, cfg.num_tsteps)
        )
        tile_idx = (n_actual // cfg.num_tsteps) + 1
        time_axis = jnp.tile(t_grid, tile_idx)[:n_actual]
        return jnp.concatenate([pts[:, :-1], time_axis[:, None]], axis=1)

    return PdeDef(
        name="td_burgers",
        in_dim=2,
        out_dim=1,
        scalar=True,
        sample_params=sample_params,
        sample_points=sample_points,
        sample_points_in_domain=sample_points_in_domain,
        loss_fn=loss_fn,
        solve=solve,
        evaluate_gt=(
            fem_td_burgers.evaluate if use_fem_gt else fv_burgers.evaluate
        ),
        sample_validation_points=sample_validation_points,
        # the fem gt has no f64 path; its sweeps fall back to `solve`
        solve_ref=None if use_fem_gt else _fv_solve_ref,
    )
