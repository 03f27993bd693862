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
           coarse_sweeps=40, damping=0.7):
    """One multigrid V-cycle for A x = b with zero initial guess.

    A fixed linear operator in b (required for Krylov preconditioning).
    """

    def smooth(level: Level, x, rhs, sweeps):
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
        cres = restrict(res, level, coarse)
        cres = jnp.where(coarse.bdry_mask, 0.0, cres)
        corr = cycle(li + 1, cres)
        x = x + jnp.where(level.bdry_mask, 0.0, prolong(corr, coarse, level))
        return smooth(level, x, rhs, post_sweeps)

    return cycle(0, b)


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
