"""JAX finite-volume solver for 1-D viscous Burgers (ground truth).

Replaces the reference's implicit-Euler CG1 FEniCS oracle
(src/burgers/td_burgers_fenics.py:38-159: Newton+MUMPS per step, retry with
relaxed damping) and plays the role of its JAX FV baseline
(src/burgers/td_burgers_jax_new.py: Godunov flux :288-297, SSP-RK3
:103-107, lax.scan time loop :324-353) — redesigned, not ported:

- Godunov flux for the convex flux f(u) = u^2/2.
- Central second-order diffusion (1/Re) u_xx.
- SSP-RK3 with a STATIC step count chosen from worst-case stability over
  the whole task distribution (max_reynolds and the IC amplitude bound),
  so one compiled solver serves every task and vmaps across eval tasks.
- Dirichlet walls via ghost cells pinned to the formulation's IC value at
  the wall coordinate (the reference's wall BCs reuse the IC expression,
  src/burgers/burgers_formulation/default.py:26-31).

The solution is stored at `num_tsteps` uniform output times and evaluated
anywhere in (x, t) by bilinear interpolation — jit/vmap friendly, entirely
on device.
"""

import math
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


class BurgersGroundTruth(NamedTuple):
    """u on a [num_tsteps, nx+2] grid.

    LAYOUT CAVEAT (FV producer, `solve` below): u_grid[:, 1:-1] are cell
    averages at centers xmin + (j-0.5)dx and u_grid[:, 0]/[:, -1] are GHOST
    values (2*bc - adjacent center) located at xmin-dx/2 / xmax+dx/2 — NOT
    the wall values. x_grid stores [xmin, centers..., xmax] (the domain
    span, for axis-range consumers like train/viz.py); it is NOT the
    positions of columns 0 and -1. Only `evaluate` (half-cell index
    mapping: u(xmin) = (ghost + first center)/2 = bc exactly) interprets
    u_grid correctly — do not interpolate u_grid against x_grid directly.
    The FEM producer (fem_td_burgers.solve) fills the same container with
    true node values AT x_grid positions and pairs with its own evaluate.
    """

    u_grid: jnp.ndarray    # [T, nx+2] see layout caveat above
    x_grid: jnp.ndarray    # [nx+2] [xmin, centers, xmax] (FV) / nodes (FEM)
    t_grid: jnp.ndarray    # [T]


def _godunov_flux(ul, ur):
    """Godunov numerical flux for f(u) = u^2/2."""
    f = lambda u: 0.5 * u * u
    # ul <= ur (rarefaction): min of f over [ul, ur] (0 if it straddles 0)
    rare = jnp.where((ul <= 0.0) & (ur >= 0.0), 0.0, jnp.minimum(f(ul), f(ur)))
    # ul > ur (shock): max of endpoint fluxes
    shock = jnp.maximum(f(ul), f(ur))
    return jnp.where(ul <= ur, rare, shock)


def _n_substeps(nx, length, tmax, max_reynolds, cfl, u_bound, num_tsteps):
    """Static worst-case stable step count (diffusion + advection limits)."""
    dx = length / nx
    nu_max = 1.0 / (0.8 * max_reynolds)
    dt_adv = cfl * dx / u_bound
    dt_diff = 0.45 * dx * dx / nu_max
    dt = min(dt_adv, dt_diff)
    steps = max(1, math.ceil(tmax / dt))
    seg = num_tsteps - 1
    per_seg = max(1, math.ceil(steps / seg))
    return per_seg * seg, per_seg


@partial(
    jax.jit,
    static_argnames=(
        "resolution", "num_tsteps", "max_reynolds", "cfl", "ic_fn",
        "xmin", "xmax", "tmax",
    ),
)
def solve(
    params,
    resolution: int = 512,
    num_tsteps: int = 101,
    max_reynolds: float = 100.0,
    cfl: float = 0.4,
    ic_fn=None,
    xmin: float = 0.0,
    xmax: float = 1.0,
    tmax: float = 1.0,
):
    """Solve one Burgers task; returns a BurgersGroundTruth pytree.

    params = (source_params, ic_params) with source_params[0] = Reynolds
    number (td_burgers_common.py:110).
    """
    source_params, _ = params
    re = source_params[0]
    nu = 1.0 / re

    nx = resolution
    length = xmax - xmin
    dx = length / nx
    centers = xmin + (jnp.arange(nx) + 0.5) * dx

    u0 = ic_fn(centers, params)
    # maximum principle: |u| bounded by IC/BC sup; |a|,|b| <= 2 -> bound 5
    u_bound = 5.0
    n_total, per_seg = _n_substeps(
        nx, length, tmax, max_reynolds, cfl, u_bound, num_tsteps
    )
    dt = tmax / n_total

    bc_l = ic_fn(jnp.asarray(xmin), params)
    bc_r = ic_fn(jnp.asarray(xmax), params)

    def rhs(u):
        # ghost cells: Dirichlet wall values (linear extrapolation so the
        # face value at the wall equals the BC)
        ghost_l = 2.0 * bc_l - u[0]
        ghost_r = 2.0 * bc_r - u[-1]
        ue = jnp.concatenate([ghost_l[None], u, ghost_r[None]])
        flux = _godunov_flux(ue[:-1], ue[1:])          # [nx+1] face fluxes
        adv = -(flux[1:] - flux[:-1]) / dx
        diff = nu * (ue[2:] - 2.0 * ue[1:-1] + ue[:-2]) / (dx * dx)
        return adv + diff

    def ssp_rk3(u, _):
        u1 = u + dt * rhs(u)
        u2 = 0.75 * u + 0.25 * (u1 + dt * rhs(u1))
        u3 = u / 3.0 + (2.0 / 3.0) * (u2 + dt * rhs(u2))
        return u3, None

    def segment(u, _):
        u, _ = jax.lax.scan(ssp_rk3, u, None, length=per_seg)
        return u, u

    _, frames = jax.lax.scan(segment, u0, None, length=num_tsteps - 1)
    frames = jnp.concatenate([u0[None], frames], axis=0)  # [T, nx]

    # append ghost values at both ends: with nodes at (j-0.5)dx the linear
    # interpolant ghost<->first-center passes exactly through the wall BC
    ghosts_l = 2.0 * bc_l - frames[:, :1]
    ghosts_r = 2.0 * bc_r - frames[:, -1:]
    u_grid = jnp.concatenate([ghosts_l, frames, ghosts_r], axis=1)
    x_grid = jnp.concatenate(
        [jnp.asarray([xmin]), centers, jnp.asarray([xmax])]
    )
    t_grid = jnp.linspace(0.0, tmax, num_tsteps)
    return BurgersGroundTruth(u_grid=u_grid, x_grid=x_grid, t_grid=t_grid)


def solve_x64(params, **kw):
    """Double-precision FV solve for accuracy sweeps: over ~1e5 SSP-RK3
    substeps the f32 path accumulates round-off; the reference's own FV
    baseline runs with x64 enabled (td_burgers_jax_new.py:9). Eager
    wrapper — do not call inside an outer jit."""
    with jax.enable_x64(True):
        params64 = jax.tree_util.tree_map(
            lambda a: (jnp.asarray(a, jnp.float64)
                       if jnp.issubdtype(jnp.result_type(a), jnp.floating)
                       else jnp.asarray(a)),
            params,
        )
        return solve(params64, **kw)


def evaluate(gt: BurgersGroundTruth, xt):
    """Evaluate u at (x, t) = xt[0], xt[1] by bilinear interpolation."""
    x, t = xt[0], xt[1]
    nxg = gt.x_grid.shape[0]
    T = gt.t_grid.shape[0]

    # time index (uniform grid)
    tmax = gt.t_grid[-1]
    ft = jnp.clip(t / tmax, 0.0, 1.0) * (T - 1)
    it = jnp.clip(jnp.floor(ft).astype(jnp.int32), 0, T - 2)
    wt = ft - it

    # space index: nodes at (j - 0.5) dx (j=0 is the ghost just outside the
    # left wall, j = nx+1 the right ghost); fx in [0.5, nx+0.5] after clip
    xmin = gt.x_grid[0]
    xmax = gt.x_grid[-1]
    dx = (xmax - xmin) / (nxg - 2)
    fx = (jnp.clip(x, xmin, xmax) - xmin) / dx + 0.5
    ix = jnp.clip(jnp.floor(fx).astype(jnp.int32), 0, nxg - 2)
    wx = jnp.clip(fx - ix, 0.0, 1.0)

    u00 = gt.u_grid[it, ix]
    u01 = gt.u_grid[it, ix + 1]
    u10 = gt.u_grid[it + 1, ix]
    u11 = gt.u_grid[it + 1, ix + 1]
    return (1 - wt) * ((1 - wx) * u00 + wx * u01) + wt * (
        (1 - wx) * u10 + wx * u11
    )
