"""Nonlinear Poisson on random star-shaped domains.

PDE (reference: src/poisson/poisson_common.py:26-39, poisson_fenics.py:85-89):

    div((1 + 0.1 u^2) grad u) = f       in Omega
    u = g                               on dOmega

with Omega the star domain r(theta) = 1 + c1 cos(4 theta) + c2 cos(8 theta),
f a sum of two Gaussian bumps, and g a low-order Fourier series in theta.

Task distribution semantics preserved from the reference:
- a task IS a PRNG key; factors are frozen by zeroing their subkeys
  (poisson_common.py:52-57) so e.g. vary_geometry=False gives every task the
  key-zero geometry.
- rejection-free domain sampling: 3n uniform box points, then
  jax.random.choice with probability mask 1 - in_hole
  (poisson_common.py:100-119). Static shapes under jit.
- boundary sampling by the theta-parametrization with uniform jitter
  (poisson_common.py:77-88).

Ground truth comes from the JAX-native FEM solver in solvers/fem_poisson.py
instead of FEniCS.
"""

from functools import partial

import jax
import jax.numpy as jnp

from ..config import TaskConfig
from ..ops.operators import vmap_weighted_laplacian
from ..solvers import fem_poisson
from .registry import PdeDef


def radius(theta, c1, c2):
    return 1.0 + c1 * jnp.cos(4.0 * theta) + c2 * jnp.cos(8.0 * theta)


def boundary_conditions(bc_params, x):
    """Dirichlet value at boundary point x (poisson_common.py:122-134)."""
    theta = jnp.arctan2(x[1], x[0])
    return (
        bc_params[0]
        + bc_params[1] / 4.0 * jnp.cos(theta)
        + bc_params[2] / 4.0 * jnp.sin(theta)
        + bc_params[3] / 4.0 * jnp.cos(2.0 * theta)
        + bc_params[4] / 4.0 * jnp.sin(2.0 * theta)
    )


def source(source_params, x):
    """Sum-of-Gaussian-bumps source term (poisson_common.py:142-146)."""
    d2 = (x[0] - source_params[:, 0]) ** 2 + (x[1] - source_params[:, 1]) ** 2
    return jnp.sum(source_params[:, 2] * jnp.exp(-d2))


def is_in_hole(xy, geo_params, tol=1e-7):
    """True if xy lies OUTSIDE the star domain (poisson_common.py:91-97;
    the reference's naming is inherited: 'hole' = complement of the star)."""
    c1, c2 = geo_params
    theta = jnp.arctan2(xy[0], xy[1])  # note: reference passes (x, y) -> atan2(x, y)
    length = jnp.linalg.norm(xy)
    r0 = radius(theta, c1, c2)
    return r0 < length + tol


def make_pde(cfg: TaskConfig) -> PdeDef:
    dom = cfg.domain

    def sample_params(key):
        if cfg.fixed_num_pdes is not None:
            key = jax.random.PRNGKey(cfg.seed)
        k1, k2, k3 = jax.random.split(key, 3)
        # Frozen factors use the all-zero key (poisson_common.py:55-57)
        k1 = k1 * jnp.uint32(cfg.vary_source)
        k2 = k2 * jnp.uint32(cfg.vary_bc)
        k3 = k3 * jnp.uint32(cfg.vary_geometry)
        source_params = jax.random.normal(k1, shape=(2, 3))
        bc_params = cfg.bc_scale * jax.random.uniform(
            k2, minval=-1.0, maxval=1.0, shape=(5,)
        )
        geo_params = jax.random.uniform(k3, minval=-0.2, maxval=0.2, shape=(2,))
        return source_params, bc_params, geo_params

    def sample_points_on_boundary(key, n, params):
        _, _, geo_params = params
        c1, c2 = geo_params
        theta = jnp.linspace(0.0, 2.0 * jnp.pi, n)
        theta = theta + jax.random.uniform(
            key, minval=0.0, maxval=2.0 * jnp.pi / n, shape=(n,)
        )
        r0 = radius(theta, c1, c2)
        return jnp.stack([r0 * jnp.cos(theta), r0 * jnp.sin(theta)], axis=1)

    def sample_points_in_domain(key, n, params):
        _, _, geo_params = params
        k1, k2, k3 = jax.random.split(key, 3)
        n_cand = 3 * n
        xs = jax.random.uniform(k1, (n_cand,), minval=dom.xmin, maxval=dom.xmax)
        ys = jax.random.uniform(k2, (n_cand,), minval=dom.ymin, maxval=dom.ymax)
        xy = jnp.stack([xs, ys], axis=1)
        in_hole = jax.vmap(is_in_hole, in_axes=(0, None))(xy, geo_params)
        idxs = jax.random.choice(
            k3, xy.shape[0], replace=not cfg.sample_with_replacement,
            p=1.0 - in_hole, shape=(n,)
        )
        return xy[idxs]

    def sample_points(key, n, params):
        k1, k2 = jax.random.split(key)
        return (
            sample_points_on_boundary(k1, n, params),
            sample_points_in_domain(k2, n, params),
        )

    def loss_fn(field_fn, points, params):
        """(boundary_losses, domain_losses) dicts (poisson_common.py:26-39)."""
        points_on_boundary, points_in_domain = points
        source_params, bc_params, _ = params

        bc_vals = jax.vmap(partial(boundary_conditions, bc_params))(points_on_boundary)
        err_on_boundary = bc_vals - field_fn(points_on_boundary)
        loss_on_boundary = jnp.mean(err_on_boundary ** 2)

        if hasattr(field_fn, "vhd"):
            # fused Taylor-mode pass (models/siren.py field_apply_vhd):
            # div((1+0.1u^2) grad u) = (1+0.1u^2) lap(u) + 0.2 u |grad u|^2
            u, g, hd = field_fn.vhd(points_in_domain)
            lap = (1.0 + 0.1 * u ** 2) * hd.sum(-1) \
                + 0.2 * u * (g ** 2).sum(-1)
        else:
            lap = vmap_weighted_laplacian(
                points_in_domain, field_fn,
                lambda x: 1.0 + 0.1 * field_fn(x) ** 2,
            )
        src = jax.vmap(partial(source, source_params))(points_in_domain)
        loss_in_domain = jnp.mean((lap - src) ** 2)
        return {"boundary_loss": loss_on_boundary}, {"domain_loss": loss_in_domain}

    def solve(params, resolution=None, boundary_points=None):
        res = resolution if resolution is not None else 16
        return fem_poisson.solve(params, resolution=res)

    def solve_ref(params, resolution=None, boundary_points=None):
        res = resolution if resolution is not None else 64
        return fem_poisson.solve_x64(params, resolution=res)

    def sample_validation_points(key, n, params, gt=None):
        return sample_points_in_domain(key, n, params)

    return PdeDef(
        name="poisson",
        in_dim=2,
        out_dim=1,
        scalar=True,
        sample_params=sample_params,
        sample_points=sample_points,
        sample_points_in_domain=sample_points_in_domain,
        loss_fn=loss_fn,
        solve=solve,
        evaluate_gt=fem_poisson.evaluate,
        sample_validation_points=sample_validation_points,
        solve_ref=solve_ref,
        solve_hi=lambda params, resolution=None, boundary_points=None:
            fem_poisson.solve_richardson(
                params, resolution=resolution if resolution is not None
                else 16),
        evaluate_gt_hi=fem_poisson.evaluate_cubic,
    )
