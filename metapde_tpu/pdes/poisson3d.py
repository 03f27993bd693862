"""Nonlinear Poisson in 3D on random star-shaped balls — the "3D Poisson
stretch" large-task-batch config (BASELINE.json configs[4]).

PDE (same nonlinear operator as the 2D family, src/poisson/
poisson_common.py:26-39, one dimension up):

    div((1 + 0.1 u^2) grad u) = f       in Omega  (subset of R^3)
    u = g                               on dOmega

Omega is the star ball r(dir) = 1 + c1 Re[Y_4^4]-type term + c2 zonal term
(smooth on the sphere; the 3D analogue of the 2D star r(theta) =
1 + c1 cos 4theta + c2 cos 8theta).

Ground truth is by the METHOD OF MANUFACTURED SOLUTIONS: each task samples
an analytic solution

    u*(x) = b0 + b . x + sum_i a_i exp(-||x - mu_i||^2)

and DERIVES f := div((1+0.1 u*^2) grad u*) via autodiff (the same
weighted-Laplacian operator the residual loss uses) and g := u*|_boundary.
The oracle is therefore exact (zero discretization error) and fully
on-device — no host FEM; validation of a 3D solve needs no 3D mesher.
The trade, stated honestly: the source class is induced by the solution
class (Gaussian bumps + affine background) rather than sampled freely as
in the 2D family. There is no reference counterpart (the reference is
2D-only); this family exists to exercise large task batches and
higher-dimensional fields (256-task second-order MAML sharded over a
device mesh).

Task-distribution semantics preserved: a task IS a PRNG key; vary_source
freezes the bump params, vary_bc the affine background, vary_geometry the
star-ball shape (key-zeroing, poisson_common.py:52-57); rejection-free
domain sampling via choice(p=mask) (poisson_common.py:100-119).
"""

from functools import partial

import jax
import jax.numpy as jnp

from ..config import TaskConfig
from ..ops.operators import vmap_weighted_laplacian, weighted_laplacian
from .registry import PdeDef

# box bound for candidate sampling: r <= 1 + |c1| + |c2| <= 1.4
_BOX = 1.45


def radius(direction, c1, c2):
    """Star-ball radius along a unit direction.

    cos(4 theta) sin^4(phi) is the Re[Y_4^4] angular dependence (smooth at
    the poles, unlike a bare cos(4 theta)); cos(2 phi) is a smooth zonal
    perturbation. Written in Cartesian components of the direction to
    avoid pole-singular arctan branches under autodiff."""
    nx, ny, nz = direction[0], direction[1], direction[2]
    s2 = nx ** 2 + ny ** 2           # sin^2 phi
    # cos(4 theta) sin^4 phi = Re[(nx + i ny)^4]
    cos4t_s4 = nx ** 4 - 6.0 * nx ** 2 * ny ** 2 + ny ** 4
    cos2phi = 2.0 * nz ** 2 - 1.0    # cos(2 phi) with cos(phi) = nz
    return 1.0 + c1 * cos4t_s4 + c2 * cos2phi


def exact_solution(sol_params, x):
    """The manufactured solution u*(x) at one point x [3]."""
    source_params, bc_params = sol_params[0], sol_params[1]
    bumps = jnp.sum(
        source_params[:, 3]
        * jnp.exp(-jnp.sum((x - source_params[:, :3]) ** 2, axis=-1))
    )
    affine = bc_params[0] + 0.25 * jnp.dot(bc_params[1:4], x)
    return affine + bumps


def source(sol_params, x):
    """f := div((1+0.1 u*^2) grad u*) by autodiff of the manufactured
    solution — the identical operator the residual loss applies to the
    neural field, so MMS consistency is exact by construction."""
    u_fn = partial(exact_solution, sol_params)
    return weighted_laplacian(u_fn, lambda y: 1.0 + 0.1 * u_fn(y) ** 2, x)


def is_outside(x, geo_params, tol=1e-7):
    c1, c2 = geo_params
    length = jnp.linalg.norm(x)
    direction = x / jnp.maximum(length, 1e-12)
    return radius(direction, c1, c2) < length + tol


def make_pde(cfg: TaskConfig) -> PdeDef:
    def sample_params(key):
        if cfg.fixed_num_pdes is not None:
            key = jax.random.PRNGKey(cfg.seed)
        k1, k2, k3 = jax.random.split(key, 3)
        k1 = k1 * jnp.uint32(cfg.vary_source)
        k2 = k2 * jnp.uint32(cfg.vary_bc)
        k3 = k3 * jnp.uint32(cfg.vary_geometry)
        # two bumps: center in N(0, 0.5^2)^3 (inside the unit-ish ball),
        # amplitude N(0,1) — mirrors the 2D family's normal (2,3) table
        raw = jax.random.normal(k1, shape=(2, 4))
        source_params = raw * jnp.array([0.5, 0.5, 0.5, 1.0])
        bc_params = cfg.bc_scale * jax.random.uniform(
            k2, minval=-1.0, maxval=1.0, shape=(4,)
        )
        geo_params = jax.random.uniform(k3, minval=-0.2, maxval=0.2,
                                        shape=(2,))
        return source_params, bc_params, geo_params

    def sample_points_on_boundary(key, n, params):
        _, _, geo_params = params
        c1, c2 = geo_params
        dirs = jax.random.normal(key, shape=(n, 3))
        dirs = dirs / jnp.linalg.norm(dirs, axis=1, keepdims=True)
        r0 = jax.vmap(lambda d: radius(d, c1, c2))(dirs)
        return r0[:, None] * dirs

    def sample_points_in_domain(key, n, params):
        """Rejection-free uniform sampling via choice(p=mask), as in 2D
        (poisson_common.py:100-119) — but candidates come from the bounding
        BALL (uniform: direction x radius ~ cbrt(U)), not the bounding box:
        in 3D the star ball fills as little as 7% of the box, so a 3n box
        pool can under-fill the mask; 24n ball candidates keep >= 1.7n
        valid even at the worst-case geometry (min r = 0.6, ratio 0.071)."""
        _, _, geo_params = params
        c1, c2 = geo_params
        k1, k2, k3 = jax.random.split(key, 3)
        n_cand = 24 * n
        dirs = jax.random.normal(k1, shape=(n_cand, 3))
        dirs = dirs / jnp.linalg.norm(dirs, axis=1, keepdims=True)
        rad = _BOX * jax.random.uniform(k2, (n_cand, 1)) ** (1.0 / 3.0)
        x = rad * dirs
        outside = jax.vmap(is_outside, in_axes=(0, None))(x, geo_params)
        idxs = jax.random.choice(
            k3, x.shape[0], replace=not cfg.sample_with_replacement,
            p=1.0 - outside, shape=(n,)
        )
        pts = x[idxs]
        # Small-n tail guard: if fewer than n candidates were valid
        # (binomially possible at tiny n for worst-case 7.1% fill),
        # choice() pads with zero-probability (outside) candidates.
        # Re-project any such pick radially to half its direction's star
        # radius, which is strictly inside; a no-op in the normal case.
        d = pts / jnp.maximum(
            jnp.linalg.norm(pts, axis=1, keepdims=True), 1e-12
        )
        r_star = jax.vmap(lambda di: radius(di, c1, c2))(d)
        bad = jax.vmap(is_outside, in_axes=(0, None))(pts, geo_params) > 0.5
        return jnp.where(bad[:, None], 0.5 * r_star[:, None] * d, pts)

    def sample_points(key, n, params):
        k1, k2 = jax.random.split(key)
        return (
            sample_points_on_boundary(k1, n, params),
            sample_points_in_domain(k2, n, params),
        )

    def loss_fn(field_fn, points, params):
        points_on_boundary, points_in_domain = points
        source_params, bc_params, _ = params
        sol_params = (source_params, bc_params)

        bc_vals = jax.vmap(partial(exact_solution, sol_params))(
            points_on_boundary
        )
        err_on_boundary = bc_vals - field_fn(points_on_boundary)
        loss_on_boundary = jnp.mean(err_on_boundary ** 2)

        if hasattr(field_fn, "vhd"):
            u, g, hd = field_fn.vhd(points_in_domain)
            lap = (1.0 + 0.1 * u ** 2) * hd.sum(-1) \
                + 0.2 * u * (g ** 2).sum(-1)
        else:
            lap = vmap_weighted_laplacian(
                points_in_domain, field_fn,
                lambda x: 1.0 + 0.1 * field_fn(x) ** 2,
            )
        src = jax.vmap(partial(source, sol_params))(points_in_domain)
        loss_in_domain = jnp.mean((lap - src) ** 2)
        return (
            {"boundary_loss": loss_on_boundary},
            {"domain_loss": loss_in_domain},
        )

    def solve(params, resolution=None, boundary_points=None):
        # the manufactured solution IS the ground truth; resolution-free
        source_params, bc_params, _ = params
        return (source_params, bc_params)

    def evaluate_gt(gt, x):
        return exact_solution(gt, x)

    def sample_validation_points(key, n, params, gt=None):
        return sample_points_in_domain(key, n, params)

    return PdeDef(
        name="poisson3d",
        in_dim=3,
        out_dim=1,
        scalar=True,
        sample_params=sample_params,
        sample_points=sample_points,
        sample_points_in_domain=sample_points_in_domain,
        loss_fn=loss_fn,
        solve=solve,
        evaluate_gt=evaluate_gt,
        sample_validation_points=sample_validation_points,
        solve_ref=solve,
    )
