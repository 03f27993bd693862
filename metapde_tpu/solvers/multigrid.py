"""Matrix-free geometric multigrid for the structured-chart FEM solvers.

The reference gets high-resolution robustness from PETSc/MUMPS sparse direct
solves (td_burgers_fenics.py:87, hyper_elasticity_fenics.py:143). This build
is matrix-free f32 Krylov on TPU, where Jacobi-preconditioned BiCGStab
stagnates once the stiffness condition number outruns f32 (observed: the
Poisson star solver converges at resolution <= 32 and stalls at 64). The
structured logical charts (polar (rho, theta) for the star domain) admit
textbook geometric multigrid, which this module provides as a LINEAR
preconditioner for the Newton-Krylov solves:

- levels are the solver's own meshes at resolution, resolution/2, ... with
  the linear (unit-coefficient) stiffness operator rediscretized per level
  (spectrally equivalent to the Newton Jacobian: the nonlinear coefficient
  1 + 0.1 u^2 is O(1) and smooth);
- damped-Jacobi smoothing, separable full-weighting restriction / bilinear
  prolongation on the (rho, theta) chart (theta periodic, ring 0 = disk
  center), Dirichlet outer-ring rows held as identity;
- the V-cycle is a fixed linear operator (fixed sweep counts, zero initial
  guess), as BiCGStab preconditioning requires.

Everything is jnp on static shapes: transfers are rolls/reshapes, smoothing
is elementwise, the operator is the same segment_sum assembly the solvers
use — the whole preconditioner jits and vmaps with the solve.
"""

from functools import partial
from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class Level(NamedTuple):
    apply: Callable          # linear operator on node vectors [n_nodes]
    diag: jnp.ndarray        # operator diagonal (for damped Jacobi)
    nr: int
    nt: int
    bdry_mask: jnp.ndarray   # Dirichlet rows (identity in the operator)


def _vec_to_grid(u, nr, nt):
    """Node vector [1 + nr*nt] -> (center scalar, rings [nr, nt])."""
    return u[0], u[1:].reshape(nr, nt)


def _grid_to_vec(center, rings):
    return jnp.concatenate([center.reshape(1), rings.reshape(-1)])


def _restrict_theta(x):
    """Periodic full-weighting along the last axis, nt -> nt//2."""
    sm = 0.25 * jnp.roll(x, 1, axis=-1) + 0.5 * x + 0.25 * jnp.roll(x, -1, axis=-1)
    return sm[..., ::2]


def _prolong_theta(x, nt_f):
    """Periodic linear interpolation along the last axis, nt//2 -> nt."""
    out = jnp.zeros(x.shape[:-1] + (nt_f,), x.dtype)
    out = out.at[..., ::2].set(x)
    right = jnp.roll(x, -1, axis=-1)
    out = out.at[..., 1::2].set(0.5 * (x + right))
    return out


def restrict(u, fine: Level, coarse: Level):
    """Full-weighting (center, rings) transfer fine -> coarse."""
    c, r = _vec_to_grid(u, fine.nr, fine.nt)
    r = _restrict_theta(r)                      # [nr_f, nt_c]
    # rho full-weighting: coarse ring i <- fine rings 2i-1, 2i, 2i+1
    # (fine ring index is 1-based in the vector; row 0 of `r` is ring 1)
    center_row = jnp.full((1, r.shape[1]), c)
    padded = jnp.concatenate([center_row, r], axis=0)  # ring 0..nr_f
    ic = jnp.arange(1, coarse.nr + 1)
    fi = 2 * ic                                  # fine ring of coarse ring
    mid = padded[fi]
    lo = padded[fi - 1]
    hi = padded[jnp.minimum(fi + 1, fine.nr)]
    rc = 0.25 * lo + 0.5 * mid + 0.25 * hi
    # coarse center <- fine center and its ring-1 neighborhood
    cc = 0.5 * c + 0.5 * jnp.mean(padded[1])
    return _grid_to_vec(cc, rc)


def prolong(u, coarse: Level, fine: Level):
    """Bilinear (center, rings) transfer coarse -> fine."""
    c, r = _vec_to_grid(u, coarse.nr, coarse.nt)
    center_row = jnp.full((1, r.shape[1]), c)
    padded = jnp.concatenate([center_row, r], axis=0)  # ring 0..nr_c
    # fine even rings 2i -> coarse ring i; odd rings -> average of i, i+1
    i_f = jnp.arange(1, fine.nr + 1)
    lo = padded[i_f // 2]
    hi = padded[jnp.minimum((i_f + 1) // 2, coarse.nr)]
    rf = jnp.where((i_f % 2 == 0)[:, None], lo, 0.5 * (lo + hi))
    rf = _prolong_theta(rf, fine.nt)
    return _grid_to_vec(c, rf)


def vcycle(levels: Tuple[Level, ...], b, pre_sweeps=2, post_sweeps=2,
           coarse_sweeps=40, damping=0.7, restrict_fn=None, prolong_fn=None):
    """One multigrid V-cycle for A x = b with zero initial guess.

    A fixed linear operator in b (required for Krylov preconditioning).
    Transfers default to the polar (center, rings) pair; the rect-lattice
    levels pass their own.
    """
    rfn = restrict if restrict_fn is None else restrict_fn
    pfn = prolong if prolong_fn is None else prolong_fn

    def smooth(level, x, rhs, sweeps):
        for _ in range(sweeps):
            x = x + damping * (rhs - level.apply(x)) / level.diag
        return x

    def cycle(li, rhs):
        level = levels[li]
        if li == len(levels) - 1:
            return smooth(level, jnp.zeros_like(rhs), rhs, coarse_sweeps)
        x = smooth(level, jnp.zeros_like(rhs), rhs, pre_sweeps)
        res = rhs - level.apply(x)
        # Dirichlet rows are exact after smoothing (identity rows); keep
        # their coarse correction at zero
        res = jnp.where(level.bdry_mask, 0.0, res)
        coarse = levels[li + 1]
        cres = rfn(res, level, coarse)
        cres = jnp.where(coarse.bdry_mask, 0.0, cres)
        corr = cycle(li + 1, cres)
        x = x + jnp.where(level.bdry_mask, 0.0, pfn(corr, coarse, level))
        return smooth(level, x, rhs, post_sweeps)

    return cycle(0, b)


class RectLevel(NamedTuple):
    apply: Callable          # linear operator on node vectors [m*m]
    diag: jnp.ndarray
    m: int                   # nodes per side (resolution + 1)
    bdry_mask: jnp.ndarray   # constrained rows (identity in the operator)


def _rect_restrict(u, fine: RectLevel, coarse: RectLevel):
    """Vertex-centered full weighting on the lattice, m_f -> m_c."""
    g = u.reshape(fine.m, fine.m)
    gp = jnp.pad(g, 1)
    s = (
        4.0 * gp[1:-1, 1:-1]
        + 2.0 * (gp[:-2, 1:-1] + gp[2:, 1:-1]
                 + gp[1:-1, :-2] + gp[1:-1, 2:])
        + (gp[:-2, :-2] + gp[:-2, 2:] + gp[2:, :-2] + gp[2:, 2:])
    ) / 16.0
    return s[::2, ::2].reshape(-1)


def _rect_prolong(u, coarse: RectLevel, fine: RectLevel):
    """Bilinear interpolation on the lattice, m_c -> m_f."""
    gc = u.reshape(coarse.m, coarse.m)
    out = jnp.zeros((fine.m, fine.m), gc.dtype)
    out = out.at[::2, ::2].set(gc)
    out = out.at[1::2, ::2].set(0.5 * (gc[:-1, :] + gc[1:, :]))
    out = out.at[::2, 1::2].set(0.5 * (gc[:, :-1] + gc[:, 1:]))
    out = out.at[1::2, 1::2].set(
        0.25 * (gc[:-1, :-1] + gc[1:, :-1] + gc[:-1, 1:] + gc[1:, 1:])
    )
    return out.reshape(-1)


def make_rect_mg_preconditioner(per_hole_params, n_holes, resolution: int,
                                xmin, xmax, ymin, ymax, coeff=1.0,
                                min_resolution: int = 8, vector_dim: int = 1,
                                **vcycle_kwargs):
    """V-cycle preconditioner for the snapped-lattice pore-domain solvers
    (fem_steady_burgers / fem_elasticity).

    Rediscretizes the coeff-scaled unit stiffness operator on each level's
    OWN snapped mesh (mesh2d.snapped_geometry at resolution, resolution/2,
    ...): elements inside pores are dead, and constrained rows — outer
    rectangle, pore-boundary (dead-adjacent) nodes, dead nodes — are held
    as identity, matching the solvers' residual row structure. For
    vector_dim > 1 the scalar V-cycle is applied per component
    (block-diagonal preconditioner; the viscous/elastic coupling between
    components is left to the outer Krylov iteration).
    """
    from .mesh2d import mesh_topology, node_coords, snapped_geometry

    res_list = []
    r = resolution
    while r >= min_resolution * 2 and r % 2 == 0:
        res_list.append(r)
        r //= 2
    res_list.append(r)

    levels = []
    for res in res_list:
        tris = jnp.asarray(mesh_topology(res))
        coords0 = jnp.asarray(
            node_coords(res, xmin, xmax, ymin, ymax),
            jnp.result_type(per_hole_params),
        )
        n_nodes = coords0.shape[0]
        on_rect = (
            jnp.isclose(coords0[:, 0], xmin)
            | jnp.isclose(coords0[:, 0], xmax)
            | jnp.isclose(coords0[:, 1], ymin)
            | jnp.isclose(coords0[:, 1], ymax)
        )
        cell_h = min((xmax - xmin), (ymax - ymin)) / res
        geom = snapped_geometry(tris, coords0, per_hole_params, n_holes,
                                cell_h, boundary_fixed=on_rect)
        area, gradphi = geom.area, geom.gradphi
        elem_alive, node_alive = geom.elem_alive, geom.node_alive
        node_dead_adjacent = 1.0 - jax.ops.segment_min(
            jnp.repeat(elem_alive, 3), tris.reshape(-1),
            num_segments=n_nodes,
        )
        bdry_mask = (on_rect | (node_dead_adjacent > 0.5)
                     | (node_alive < 0.5))

        def apply(u, tris=tris, gradphi=gradphi, area=area,
                  elem_alive=elem_alive, n_nodes=n_nodes,
                  bdry_mask=bdry_mask):
            ue = u[tris]
            grad_u = jnp.einsum("ek,ekd->ed", ue, gradphi)
            flux = coeff * jnp.einsum(
                "e,ed,ekd->ek", area * elem_alive, grad_u, gradphi
            )
            r = jax.ops.segment_sum(
                flux.reshape(-1), tris.reshape(-1), num_segments=n_nodes
            )
            return jnp.where(bdry_mask, u, r)

        diag_elem = coeff * (area * elem_alive)[:, None] \
            * jnp.sum(gradphi ** 2, axis=2)
        diag = jax.ops.segment_sum(
            diag_elem.reshape(-1), tris.reshape(-1), num_segments=n_nodes
        )
        diag = jnp.where(bdry_mask, 1.0, jnp.maximum(diag, 1e-12))
        levels.append(RectLevel(apply=apply, diag=diag, m=res + 1,
                                bdry_mask=bdry_mask))

    scalar_cycle = partial(vcycle, tuple(levels),
                           restrict_fn=_rect_restrict,
                           prolong_fn=_rect_prolong, **vcycle_kwargs)
    if vector_dim == 1:
        return scalar_cycle

    def vector_cycle(v):
        g = v.reshape(-1, vector_dim)
        out = jnp.stack(
            [scalar_cycle(g[:, d]) for d in range(vector_dim)], axis=1
        )
        return out.reshape(-1)

    return vector_cycle


def make_polar_mg_preconditioner(geo_params, resolution: int,
                                 min_resolution: int = 2, **vcycle_kwargs):
    """Build a V-cycle preconditioner for the Poisson star-domain solver.

    Rediscretizes the UNIT-coefficient stiffness operator on the polar
    star meshes at resolution, resolution/2, ..., min_resolution (exact 2:1
    ring/angle coarsening holds down to resolution 2 given mesh_topology's
    nr = 4 res, nt = 16 res). Returns M: v -> approx A^{-1} v.
    """
    from .fem_poisson import _element_geometry, mesh_topology, node_coords

    res_list = []
    r = resolution
    while r >= min_resolution * 2 and r % 2 == 0:
        res_list.append(r)
        r //= 2
    res_list.append(r)

    levels = []
    for res in res_list:
        tris_np, nr, nt = mesh_topology(res)
        tris = jnp.asarray(tris_np)
        n_nodes = 1 + nr * nt
        coords = node_coords(geo_params, nr, nt)
        gradphi, area, _ = _element_geometry(coords, tris)
        bdry_idx = jnp.arange(1 + (nr - 1) * nt, n_nodes)
        bdry_mask = jnp.zeros((n_nodes,), bool).at[bdry_idx].set(True)

        def apply(u, tris=tris, gradphi=gradphi, area=area,
                  n_nodes=n_nodes, bdry_mask=bdry_mask):
            ue = u[tris]
            grad_u = jnp.einsum("ek,ekd->ed", ue, gradphi)
            flux = jnp.einsum("e,ed,ekd->ek", area, grad_u, gradphi)
            r = jax.ops.segment_sum(
                flux.reshape(-1), tris.reshape(-1), num_segments=n_nodes
            )
            return jnp.where(bdry_mask, u, r)

        diag_elem = area[:, None] * jnp.sum(gradphi ** 2, axis=2)
        diag = jax.ops.segment_sum(
            diag_elem.reshape(-1), tris.reshape(-1), num_segments=n_nodes
        )
        diag = jnp.where(bdry_mask, 1.0, jnp.maximum(diag, 1e-12))
        levels.append(Level(apply=apply, diag=diag, nr=nr, nt=nt,
                            bdry_mask=bdry_mask))

    return partial(vcycle, tuple(levels), **vcycle_kwargs)
