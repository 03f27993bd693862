"""Steady 2-D viscous Burgers flow past random star-shaped pores.

Task (reference: src/burgers/burgers_common.py): velocity field u(x,y) in a
rectangle with 1..max_holes random star-shaped holes, driven by sinusoidal
inlet/outlet profiles with no-slip walls and pore boundaries:

    (u . grad) u = (1/Re) lap u          in Omega \\ pores
    u = bc[0] * sin(pi (y-ymin)/(ymax-ymin))  on inlet  (x = xmin)
    u = bc[1] * sin(pi (y-ymin)/(ymax-ymin))  on outlet (x = xmax)
    u = 0                                 on walls and pore boundaries

The reference version of this family is broken and unregistered
(src/burgers/burgers_def.py:6 imports a nonexistent symbol;
sample_points_on_pores indexes keys[4] of a 3-way split,
burgers_common.py:256,309); this is a working TPU-native replacement with
the same task distribution:

- sample_params (burgers_common.py:106-181): Re ~ max_reynolds*U(0,1),
  inlet/outlet amplitudes ~ bc_scale*U(-1,1,(2,2)), hole count
  ~ U{1..max_holes}, star-shape coefficients ~ U(-0.2,0.2), sizes
  ~ U(0.1, max_hole_size/n_holes), centers uniform in an inset box, and the
  greedy overlap-validity pass (:161-179) expressed as a lax.scan instead of
  a host loop; valid holes sorted first, n_holes clamped to the valid count.
- pore-boundary sampling weighted by size^2 across holes (the role of the
  reference's cumsum arclength scheme, :253-312) without its key bug.
- domain residual ((u.grad)u - (1/Re) lap u)^2 with jvp-based second
  derivatives (burgers_common.py:35-52).
"""

from itertools import product  # noqa: F401  (parity with sibling modules)

import jax
import jax.numpy as jnp
import numpy as np

from ..config import TaskConfig
from ..solvers import fem_steady_burgers
from .registry import PdeDef


def make_pde(cfg: TaskConfig) -> PdeDef:
    dom = cfg.domain
    max_holes = max(cfg.max_holes, 1)

    def sample_params(key):
        if cfg.fixed_num_pdes is not None:
            idx = jax.random.randint(key, (), 0, cfg.fixed_num_pdes)
            key = jax.random.PRNGKey(cfg.seed)
            key = jax.random.fold_in(key, idx)

        k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
        k1 = k1 * jnp.uint32(cfg.vary_source)
        k2 = k2 * jnp.uint32(cfg.vary_bc)
        k3 = k3 * jnp.uint32(cfg.vary_geometry)
        k4 = k4 * jnp.uint32(cfg.vary_geometry)
        k5 = k5 * jnp.uint32(cfg.vary_geometry)
        k6 = k6 * jnp.uint32(cfg.vary_geometry)

        # Re in (0, max_reynolds]; floor keeps 1/Re finite when the key is
        # zeroed (burgers_common.py:127 draws the same range)
        source_params = jnp.maximum(
            cfg.max_reynolds * jax.random.uniform(k1, (1,)), 1.0
        )
        bc_params = cfg.bc_scale * jax.random.uniform(
            k2, (2, 2), minval=-1.0, maxval=1.0
        )

        n_holes = jax.random.randint(k3, (), 1, max_holes + 1)
        pore_shapes = jax.random.uniform(
            k4, (max_holes, 2), minval=-0.2, maxval=0.2
        )
        pore_sizes = jax.random.uniform(
            k5, (max_holes, 1), minval=0.1,
            maxval=cfg.max_hole_size / n_holes.astype(jnp.float32),
        )
        inset = 1.5 * cfg.max_hole_size
        pore_x0y0 = jax.random.uniform(
            k6, (max_holes, 2),
            minval=jnp.asarray([dom.xmin + inset, dom.ymin + inset]),
            maxval=jnp.asarray([dom.xmax - inset, dom.ymax - inset]),
        )

        # greedy overlap rejection (burgers_common.py:161-179): hole j is
        # valid iff it clears every previously-accepted hole by max_hole_size
        def accept(validity, j):
            dists = jnp.linalg.norm(
                pore_x0y0[j][None, :] - pore_x0y0, axis=1
            )
            space = (
                pore_sizes[j, 0] + pore_sizes[:, 0] + cfg.max_hole_size
            ) * validity
            ok = jnp.all(dists - space >= 0.0)
            return validity.at[j].set(ok.astype(jnp.float32)), None

        validity0 = jnp.zeros(max_holes).at[0].set(1.0)
        if max_holes > 1:
            validity, _ = jax.lax.scan(
                accept, validity0, jnp.arange(1, max_holes)
            )
        else:
            validity = validity0

        order = jnp.argsort(-validity, stable=True)
        per_hole_params = jnp.concatenate(
            [pore_shapes, pore_x0y0, pore_sizes], axis=1
        )[order]
        n_holes = jnp.minimum(n_holes, jnp.sum(validity).astype(jnp.int32))
        return source_params, bc_params, per_hole_params, n_holes

    def is_in_hole(xy, pore_params, tol=1e-7):
        c1, c2, x0, y0, size = (pore_params[i] for i in range(5))
        vx, vy = xy[0] - x0, xy[1] - y0
        theta = jnp.arctan2(vx, vy)
        length = jnp.sqrt(vx ** 2 + vy ** 2)
        r0 = size * (1.0 + c1 * jnp.cos(4 * theta) + c2 * jnp.cos(8 * theta))
        return r0 > length + tol

    def _in_any_hole(xy, params):
        _, _, per_hole_params, n_holes = params
        hole_mask = jnp.arange(per_hole_params.shape[0]) < n_holes
        in_hole = jax.vmap(
            jax.vmap(is_in_hole, in_axes=(0, None)), in_axes=(None, 0),
            out_axes=1,
        )(xy, per_hole_params)
        return jnp.any(in_hole & hole_mask[None, :], axis=1)

    def _stratified(key, n, lo, hi):
        jitter = jax.random.uniform(key, (1,), maxval=(hi - lo) / n)
        return jnp.linspace(lo, hi, n, endpoint=False) + jitter

    def sample_points_on_inlet(key, n, params):
        ys = _stratified(key, n, dom.ymin, dom.ymax)
        return jnp.stack([jnp.full(n, dom.xmin), ys], axis=1)

    def sample_points_on_outlet(key, n, params):
        return sample_points_on_inlet(key, n, params) + jnp.asarray(
            [[dom.xmax - dom.xmin, 0.0]]
        )

    def sample_points_on_walls(key, n, params):
        k1, k2 = jax.random.split(key)
        n_top = n // 2
        top = jnp.stack(
            [_stratified(k1, n_top, dom.xmin, dom.xmax),
             jnp.full(n_top, dom.ymax)], axis=1,
        )
        bot = jnp.stack(
            [_stratified(k2, n - n_top, dom.xmin, dom.xmax),
             jnp.full(n - n_top, dom.ymin)], axis=1,
        )
        return jnp.concatenate([top, bot])

    def sample_points_on_pores(key, n, params):
        """Points on pore rings, holes weighted by size^2 and masked by
        validity (role of burgers_common.py:253-312 without its key bug)."""
        _, _, per_hole_params, n_holes = params
        k1, k2 = jax.random.split(key)
        hole_mask = (jnp.arange(per_hole_params.shape[0]) < n_holes)
        w = per_hole_params[:, 4] ** 2 * hole_mask
        idx = jax.random.choice(
            k1, per_hole_params.shape[0], shape=(n,), p=w / jnp.sum(w)
        )
        php = per_hole_params[idx]
        thetas = jax.random.uniform(k2, (n,), maxval=2 * jnp.pi)
        r0 = php[:, 4] * (
            1 + php[:, 0] * jnp.cos(4 * thetas)
            + php[:, 1] * jnp.cos(8 * thetas)
        )
        return jnp.stack(
            [php[:, 2] + r0 * jnp.cos(thetas),
             php[:, 3] + r0 * jnp.sin(thetas)], axis=1,
        )

    def sample_points_in_domain(key, n, params):
        k1, k2, k3 = jax.random.split(key, 3)
        n_cand = 3 * n
        xs = jax.random.uniform(k1, (n_cand,), minval=dom.xmin, maxval=dom.xmax)
        ys = jax.random.uniform(k2, (n_cand,), minval=dom.ymin, maxval=dom.ymax)
        xy = jnp.stack([xs, ys], axis=1)
        in_hole = _in_any_hole(xy, params)
        idxs = jax.random.choice(
            k3, n_cand, replace=not cfg.sample_with_replacement,
            p=1.0 - in_hole, shape=(n,)
        )
        return xy[idxs]

    def sample_points(key, n, params):
        """Point-budget split mirrors burgers_common.py:197-213: 1/12 each to
        inlet/outlet, 1/6 walls, rest of n/2 to pores, n in the domain."""
        k1, k2, k3, k4, k5 = jax.random.split(key, 5)
        n_inlet = max(n // 12, 1)
        n_walls = max(n // 6, 2)
        n_holes_pts = max(n // 2 - n_walls - 2 * n_inlet, 1)
        return (
            sample_points_on_inlet(k1, n_inlet, params),
            sample_points_on_outlet(k2, n_inlet, params),
            sample_points_on_walls(k3, n_walls, params),
            sample_points_on_pores(k4, n_holes_pts, params),
            sample_points_in_domain(k5, n, params),
        )

    def loss_domain_fn(field_fn, points_in_domain, params):
        """((u.grad)u - (1/Re) lap u)^2, second derivatives by double-jvp
        (burgers_common.py:35-52)."""
        source_params = params[0]
        nu = 1.0 / source_params[0]

        if hasattr(field_fn, "vhd"):
            # fused pass: g [N,2,2] full Jacobian, hd [N,2,2] per-axis
            # second derivatives; residual (u.grad)u - nu lap u
            u, g, hd = field_fn.vhd(points_in_domain)
            adv = jnp.einsum("nij,nj->ni", g, u)
            return (adv - nu * hd.sum(-1)) ** 2

        ex = jnp.asarray([1.0, 0.0])
        ey = jnp.asarray([0.0, 1.0])

        def residual(x):
            u = jnp.reshape(field_fn(x), (2,))
            jac = jax.jacfwd(lambda y: jnp.reshape(field_fn(y), (2,)))(x)
            adv = jac @ u
            uxx = jax.jvp(
                lambda xi: jax.jvp(field_fn, (xi,), (ex,))[1], (x,), (ex,)
            )[1]
            uyy = jax.jvp(
                lambda xi: jax.jvp(field_fn, (xi,), (ey,))[1], (x,), (ey,)
            )[1]
            return adv - nu * jnp.reshape(uxx + uyy, (2,))

        return jax.vmap(residual)(points_in_domain) ** 2

    def _profile(points, amplitude):
        s = jnp.sin(
            jnp.pi * (points[:, 1] - dom.ymin) / (dom.ymax - dom.ymin)
        )
        return amplitude[None, :] * s[:, None]

    def loss_fn(field_fn, points, params):
        (pts_inlet, pts_outlet, pts_walls, pts_holes, pts_domain) = points
        _, bc_params, _, _ = params
        pts_noslip = jnp.concatenate([pts_walls, pts_holes])
        return (
            {
                "loss_noslip": jnp.mean(field_fn(pts_noslip) ** 2),
                "loss_inlet": jnp.mean(
                    (field_fn(pts_inlet) - _profile(pts_inlet, bc_params[0]))
                    ** 2
                ),
                "loss_outlet": jnp.mean(
                    (field_fn(pts_outlet) - _profile(pts_outlet, bc_params[1]))
                    ** 2
                ),
            },
            {
                "loss_domain": jnp.mean(
                    loss_domain_fn(field_fn, pts_domain, params)
                ),
            },
        )

    def solve(params, resolution=None, boundary_points=None):
        res = resolution if resolution is not None else 32
        return fem_steady_burgers.solve(
            params, resolution=res,
            xmin=dom.xmin, xmax=dom.xmax, ymin=dom.ymin, ymax=dom.ymax,
        )

    def solve_ref(params, resolution=None, boundary_points=None):
        res = resolution if resolution is not None else 64
        return fem_steady_burgers.solve_x64(
            params, resolution=res,
            xmin=dom.xmin, xmax=dom.xmax, ymin=dom.ymin, ymax=dom.ymax,
        )

    def sample_validation_points(key, n, params, gt=None):
        return sample_points_in_domain(key, n, params)

    return PdeDef(
        name="steady_burgers",
        in_dim=2,
        out_dim=2,
        scalar=False,
        sample_params=sample_params,
        sample_points=sample_points,
        sample_points_in_domain=sample_points_in_domain,
        loss_fn=loss_fn,
        solve=solve,
        evaluate_gt=fem_steady_burgers.evaluate,
        sample_validation_points=sample_validation_points,
        gt_version=2,  # v2: boundary-snapped conforming mesh (mesh2d.py)
        solve_ref=solve_ref,
    )
