"""2-D compressible neo-Hookean hyperelasticity on a porous sheet.

Task (reference: src/elasticity/hyper_elasticity_common.py): a rectangle
with a max_holes x max_holes grid of circular pores (pore shape coefficients
are sampled then zeroed, :146-148, leaving circles with one global random
scale) is compressed from the top by displacement (0, -0.12); the field is
the 2-vector displacement u(x).

Losses (hyper_elasticity_common.py:34-86):
- domain loss = neo-Hookean ENERGY DENSITY psi(F), F = I + grad u (not a
  residual — the PINN minimizes potential energy directly).
- boundary losses: 1000 * mean(u(bottom)^2), 1000 * mean((u(top)-(0,-0.12))^2).

Task sampling preserves the reference's lax.while_loop feasibility rejection
(:100-110: resample until the wall thickness between pores clears t_bar) and
the vary_* key-zeroing discipline. Point samplers mask pore interiors via
the reference's choice(p=mask) trick (:224-240).
"""

from functools import partial
from itertools import product

import jax
import jax.numpy as jnp
import numpy as np

from ..config import TaskConfig
from ..solvers import fem_elasticity
from .registry import PdeDef

TOP_DISPLACEMENT = -0.12  # hyper_elasticity_common.py:61


def ligament_resolution_floor(per_hole_params, L0, width, res, cap=192):
    """Effective oracle resolution that resolves the thinnest inter-pore wall.

    Near the sampler's feasibility limit (t_bar = 0.05,
    hyper_elasticity_common.py:177-183) the material ligaments between pores
    are ~0.05*L0 ~ 0.0125 wide; a structured lattice coarser than half that
    pinches them off during boundary snapping (the sheet disconnects and the
    oracle returns garbage — observed zero-energy solves at res 12). The
    reference never sees this because mshr/CGAL refines locally to conform.
    Floor: cell size h <= wall/2, capped at `cap`."""
    php = np.asarray(jax.device_get(per_hole_params))
    r_max = float(np.max(
        php[:, 4] * (1.0 + np.abs(php[:, 0]) + np.abs(php[:, 1]))
    ))
    wall = max(L0 - 2.0 * r_max, 0.025 * L0)
    need = int(np.ceil(2.0 * width / wall))
    return int(min(max(res, need), cap))


def deformation_gradient(x, field_fn):
    jac = jax.jacfwd(lambda y: jnp.reshape(field_fn(y), (-1,)))(x)
    return jnp.identity(2) + jac


def right_cauchygreen(x, field_fn):
    F = deformation_gradient(x, field_fn)
    return F @ F.T


def make_pde(cfg: TaskConfig) -> PdeDef:
    dom = cfg.domain
    max_holes = cfg.max_holes
    n_holes_total = max(max_holes * max_holes, 1)

    # static pore-grid centers (hyper_elasticity_common.py:159-161)
    if max_holes > 0:
        pore_x0 = np.linspace(dom.xmin, dom.xmax, max_holes)
        pore_y0 = np.linspace(dom.ymin, dom.ymax, max_holes)
        pore_x0y0 = np.asarray(list(product(pore_x0, pore_y0)), np.float32)
        L0 = float(pore_x0[1] - pore_x0[0]) if max_holes > 1 else 1.0
    else:
        pore_x0y0 = np.zeros((1, 2), np.float32)
        L0 = 1.0

    def _sample_body(key):
        k1, k2, k3, k4, k5, k6, k7 = jax.random.split(key, 7)
        k1 = k1 * jnp.uint32(cfg.vary_source)
        k2 = k2 * jnp.uint32(cfg.vary_bc)
        k3 = k3 * jnp.uint32(cfg.vary_geometry)
        k4 = k4 * jnp.uint32(cfg.vary_geometry)
        k6 = k6 * jnp.uint32(cfg.vary_geometry)

        source_params = jax.random.uniform(k1, (2,), minval=0.25, maxval=0.75)
        bc_params = cfg.bc_scale * jax.random.uniform(
            k2, minval=0.9, maxval=1.1, shape=(2,)
        )

        # pore shape coefficients sampled then zeroed -> circles (:146-148)
        pore_shape = 0.0 * jnp.concatenate([
            jax.random.uniform(k3, (1,), minval=-0.1, maxval=0.1),
            jax.random.uniform(k4, (1,), minval=-0.1, maxval=0.1),
        ])
        pore_shapes = jnp.tile(pore_shape[None, :], (n_holes_total, 1))

        # base radius from porosity phi = 0.5 (:163-167)
        phi = 0.5
        r0 = L0 * jnp.sqrt(2 * phi) / jnp.sqrt(
            (2 + pore_shape[0] ** 2 + pore_shape[1] ** 2) * jnp.pi
        )
        pore_scale = jax.random.uniform(
            k6, (1,),
            minval=0.2 * cfg.max_hole_size, maxval=1.5 * cfg.max_hole_size,
        )
        pore_sizes = jnp.full((n_holes_total, 1), r0) * pore_scale

        # feasibility: wall thickness between pores clears t_bar (:177-183)
        t_bar = 0.05
        theta = jnp.linspace(0, 2 * jnp.pi, 1000)
        r_theta = pore_scale[0] * r0 * (
            1 + pore_shape[0] * jnp.cos(4 * theta)
            + pore_shape[1] * jnp.cos(8 * theta)
        )
        x1 = r_theta * jnp.cos(theta)
        tmin = (L0 - 2 * jnp.max(x1)) / L0
        infeasible = tmin < t_bar

        per_hole_params = jnp.concatenate(
            [pore_shapes, jnp.asarray(pore_x0y0), pore_sizes], axis=1
        )
        n_holes = jnp.int32(max_holes * max_holes)
        return infeasible, source_params, bc_params, per_hole_params, n_holes

    def sample_params(key):
        if cfg.fixed_num_pdes is not None:
            key = jax.random.PRNGKey(cfg.seed)
        if max_holes <= 0:
            _, src, bc, php, _ = _sample_body(key)
            return src, bc, jnp.zeros((1, 5)), jnp.int32(0)

        def cond(state):
            return state[1]

        def body(state):
            key, _, *_ = state
            key, sub = jax.random.split(key)
            infeasible, src, bc, php, nh = _sample_body(key)
            return (sub, infeasible, src, bc, php, nh)

        init = (
            key, jnp.bool_(True), jnp.zeros((2,)), jnp.zeros((2,)),
            jnp.zeros((n_holes_total, 5)), jnp.int32(0),
        )
        _, _, src, bc, php, nh = jax.lax.while_loop(cond, body, init)
        return src, bc, php, nh

    def is_in_hole(xy, pore_params, tol=1e-7):
        c1, c2, x0, y0, size = (pore_params[i] for i in range(5))
        vx, vy = xy[0] - x0, xy[1] - y0
        theta = jnp.arctan2(vx, vy)
        length = jnp.sqrt(vx ** 2 + vy ** 2)
        r0 = size * (1.0 + c1 * jnp.cos(4 * theta) + c2 * jnp.cos(8 * theta))
        return r0 > length + tol

    def _mask_pore_points(key, n, xy, params):
        _, _, per_hole_params, n_holes = params
        in_hole = jax.vmap(
            jax.vmap(is_in_hole, in_axes=(0, None)), in_axes=(None, 0),
            out_axes=1,
        )(xy, per_hole_params)
        mask = jnp.arange(per_hole_params.shape[0])[None, :] < n_holes
        in_hole = jnp.any(in_hole & mask, axis=1)
        idxs = jax.random.choice(
            key, xy.shape[0], replace=not cfg.sample_with_replacement,
            p=1.0 - in_hole, shape=(n,)
        )
        return xy[idxs]

    def _edge_sampler(fixed_axis, fixed_val, lo, hi):
        def sampler(key, n, params):
            k1, k2 = jax.random.split(key)
            n_tmp = 10 * n
            vals = jax.random.uniform(k1, (n_tmp,), minval=lo, maxval=hi)
            if fixed_axis == 1:
                xy = jnp.stack([vals, jnp.full(n_tmp, fixed_val)], axis=1)
            else:
                xy = jnp.stack([jnp.full(n_tmp, fixed_val), vals], axis=1)
            return _mask_pore_points(k2, n, xy, params)

        return sampler

    sample_points_top = _edge_sampler(1, dom.ymax, dom.xmin, dom.xmax)
    sample_points_bottom = _edge_sampler(1, dom.ymin, dom.xmin, dom.xmax)
    sample_points_left = _edge_sampler(0, dom.xmin, dom.ymin, dom.ymax)
    sample_points_right = _edge_sampler(0, dom.xmax, dom.ymin, dom.ymax)

    def sample_points_on_pores(key, n, params):
        """Points on pore boundaries, kept if inside the box
        (hyper_elasticity_common.py:307-336)."""
        _, _, per_hole_params, n_holes = params
        k1, k2 = jax.random.split(key)
        n_tmp = int(1.5 * n)
        thetas = jax.random.uniform(k1, (n_tmp,), maxval=2 * jnp.pi)

        def ring(php):
            c1, c2, x0, y0, size = (php[i] for i in range(5))
            r0 = size * (1 + c1 * jnp.cos(4 * thetas) + c2 * jnp.cos(8 * thetas))
            return jnp.stack(
                [x0 + r0 * jnp.cos(thetas), y0 + r0 * jnp.sin(thetas)], axis=1
            )

        xy = jax.vmap(ring)(per_hole_params).reshape(-1, 2)
        in_bound = (
            (xy[:, 0] > dom.xmin) & (xy[:, 0] < dom.xmax)
            & (xy[:, 1] > dom.ymin) & (xy[:, 1] < dom.ymax)
        )
        idxs = jax.random.choice(
            k2, xy.shape[0], replace=not cfg.sample_with_replacement,
            p=in_bound.astype(jnp.float32), shape=(n,),
        )
        return xy[idxs]

    def sample_points_in_domain(key, n, params):
        k1, k2, k3 = jax.random.split(key, 3)
        n_cand = 3 * n
        xs = jax.random.uniform(k1, (n_cand,), minval=dom.xmin, maxval=dom.xmax)
        ys = jax.random.uniform(k2, (n_cand,), minval=dom.ymin, maxval=dom.ymax)
        xy = jnp.stack([xs, ys], axis=1)
        return _mask_pore_points(k3, n, xy, params)

    def sample_points(key, n, params):
        k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
        points_on_top = sample_points_top(k1, n, params)
        points_on_bottom = sample_points_bottom(k2, n, params)
        points_on_left = sample_points_left(k3, n, params)
        points_on_right = sample_points_right(k4, n, params)
        if max_holes > 0:
            points_on_holes = sample_points_on_pores(k5, n, params)
        else:
            points_on_holes = points_on_top
        points_in_domain = sample_points_in_domain(k6, n, params)
        return (
            points_on_top, points_on_bottom, points_on_left,
            points_on_right, points_on_holes, points_in_domain,
        )

    def loss_domain_fn(field_fn, points_in_domain, params):
        """Neo-Hookean energy density at each point
        (hyper_elasticity_common.py:34-56)."""
        _, bc_params, _, _ = params
        young_mod = bc_params[0]
        poisson_ratio = 0.49
        d = 2
        shear_mod = young_mod / (2 * (1 + poisson_ratio))
        bulk_mod = young_mod / (3 * (1 - 2 * poisson_ratio))

        def psi(F):
            J = jnp.linalg.det(F)
            Jinv = J ** (-2.0 / d)
            Ic = jnp.trace(F @ F.T)
            return (shear_mod / 2) * (Jinv * Ic - d) \
                + (bulk_mod / 2) * (J - 1) ** 2

        if hasattr(field_fn, "vjac"):
            # fused first-order pass (models/siren.py field_apply_vjac):
            # F = I + grad u for the whole point batch in one matmul chain
            _, g = field_fn.vjac(points_in_domain)
            F = jnp.eye(2)[None] + g
            return jax.vmap(psi)(F)

        def integrand(x):
            return psi(deformation_gradient(x, field_fn))

        return jax.vmap(integrand)(points_in_domain)

    def loss_fn(field_fn, points, params):
        (points_on_top, points_on_bottom, _, _, _, points_in_domain) = points
        target = jnp.asarray([0.0, TOP_DISPLACEMENT])
        return (
            {
                "loss_bottom": 1000.0 * jnp.mean(
                    field_fn(points_on_bottom) ** 2
                ),
                "loss_top": 1000.0 * jnp.mean(
                    (field_fn(points_on_top) - target) ** 2
                ),
            },
            {
                "loss_domain": jnp.mean(
                    loss_domain_fn(field_fn, points_in_domain, params)
                ),
            },
        )

    def _ligament_floor(params, res, cap=192):
        if max_holes <= 0:
            return res
        return ligament_resolution_floor(
            params[2], L0, dom.xmax - dom.xmin, res, cap=cap
        )

    def solve(params, resolution=None, boundary_points=None,
              boundary_cap=None):
        # boundary_cap is the BOUNDARY-refinement sweep axis (the
        # reference's fenics_baseline boundary_resolutions,
        # fenics_baseline.py:44-54): the ligament floor exists purely to
        # resolve pore-boundary geometry, so its cap controls how finely
        # boundary walls are resolved at a fixed nominal bulk resolution.
        cap = boundary_cap if boundary_cap is not None else 192
        res = _ligament_floor(params, resolution if resolution else 32, cap)
        return fem_elasticity.solve_direct(
            params,
            resolution=res,
            xmin=dom.xmin, xmax=dom.xmax, ymin=dom.ymin, ymax=dom.ymax,
            top_displacement=TOP_DISPLACEMENT,
        )

    def solve_ref(params, resolution=None, boundary_points=None,
                  boundary_cap=None):
        cap = boundary_cap if boundary_cap is not None else 192
        res = _ligament_floor(params, resolution if resolution else 48, cap)
        return fem_elasticity.solve_direct(
            params,
            resolution=res,
            xmin=dom.xmin, xmax=dom.xmax, ymin=dom.ymin, ymax=dom.ymax,
            top_displacement=TOP_DISPLACEMENT,
            out_dtype=jnp.float64,
        )

    def solve_warm(params, resolution, warm_start, ref=False):
        """Branch-tracking re-solve: warm-start from another resolution's
        solution of the same task (convergence sweeps; NOT the operational
        cache path, which stays warm-start-free so results are a pure
        function of (task, resolution)).

        newton_steps is raised well above solve_direct's default: the
        whole point of this path is to stay on the warm start's energy
        branch, and a short Newton budget can make the warm attempt
        "fail" and silently fall back to from-scratch load continuation
        on a different post-buckling branch (observed on a near-limit
        task: 40 steps -> fallback branch 6% lower in energy, rel_mse
        0.54 vs the tracked branch; 120 steps -> tracked branch, |g| to
        1e-12)."""
        res = _ligament_floor(params, resolution if resolution else 32)
        return fem_elasticity.solve_direct(
            params,
            resolution=res,
            xmin=dom.xmin, xmax=dom.xmax, ymin=dom.ymin, ymax=dom.ymax,
            top_displacement=TOP_DISPLACEMENT,
            out_dtype=jnp.float64 if ref else jnp.float32,
            warm_start=warm_start,
            newton_steps=120,
        )

    def sample_validation_points(key, n, params, gt=None):
        return sample_points_in_domain(key, n, params)

    return PdeDef(
        name="hyper_elasticity",
        in_dim=2,
        out_dim=2,
        scalar=False,
        sample_params=sample_params,
        sample_points=sample_points,
        sample_points_in_domain=sample_points_in_domain,
        loss_fn=loss_fn,
        solve=solve,
        evaluate_gt=fem_elasticity.evaluate,
        sample_validation_points=sample_validation_points,
        # v3: sparse-direct Newton oracle + ligament-aware resolution floor
        # (fem_elasticity.solve_direct); v2 was the boundary-snapped mesh
        gt_version=3,
        solve_ref=solve_ref,
        effective_resolution=_ligament_floor,
        solve_warm=solve_warm,
    )
