"""Implicit-Euler CG1 FEM solver for 1-D viscous Burgers (ground truth).

The time-stepped FEM counterpart of the reference's oracle
(src/burgers/td_burgers_fenics.py:38-159: CG1 interval mesh, implicit-Euler
variational form :91-94, Newton+MUMPS per step with 0.2x relaxation retry
:103-115). The FV solver (fv_burgers.py) plays the reference's JAX FV
baseline role; this one reproduces the FEM oracle itself, TPU-style:

- closed-form P1 element integrals on a uniform mesh (mass h/6[1 4 1],
  stiffness 1/h[-1 2 -1], quadratic advection integrals exact), assembled
  as stencil slices — no sparse matrices, no host assembly;
- each implicit-Euler step is a damped Newton solve with Jacobi-
  preconditioned matrix-free BiCGStab (newton.py replaces PETSc/MUMPS,
  damping back-off replaces the relaxation retry);
- the time loop is a lax.scan of Newton solves, so the whole space-time
  solve is ONE compiled XLA computation and vmaps across eval tasks.

Returns the same BurgersGroundTruth container as the FV solver, evaluated
anywhere in (x, t) by bilinear interpolation on device.
"""

import math
from functools import partial

import jax
import jax.numpy as jnp

from .fv_burgers import BurgersGroundTruth
from .newton import newton_krylov


@partial(
    jax.jit,
    static_argnames=(
        "resolution", "num_tsteps", "substeps", "ic_fn",
        "xmin", "xmax", "tmax", "newton_steps",
    ),
)
def solve(
    params,
    resolution: int = 256,
    num_tsteps: int = 101,
    substeps: int = None,
    ic_fn=None,
    xmin: float = 0.0,
    xmax: float = 1.0,
    tmax: float = 1.0,
    newton_steps: int = 12,
):
    """Solve one Burgers task; params = (source_params, ic_params) with
    source_params[0] = Reynolds number (td_burgers_common.py:110). Wall BCs
    reuse the IC expression at the wall coordinates, as in the reference
    formulation (burgers_formulation/default.py:26-31)."""
    source_params, _ = params
    nu = 1.0 / source_params[0]

    n = resolution
    h = (xmax - xmin) / n
    nodes = xmin + jnp.arange(n + 1) * h

    u0 = ic_fn(nodes, params)
    bc_l = ic_fn(jnp.asarray(xmin), params)
    bc_r = ic_fn(jnp.asarray(xmax), params)

    if substeps is None:
        # implicit Euler is unconditionally stable; substep to dt ~ h so
        # refinement keeps tightening the total error. NB the scheme stays
        # first-order in time, so the O(dt)=O(h) time error dominates the
        # O(h^2) spatial error on fine grids — same accuracy class as the
        # reference oracle (td_burgers_fenics.py:101-119 steps implicit
        # Euler at the fixed output dt with no substepping at all). The
        # second-order-in-time oracle is the FV path (SSP-RK3, the default
        # burgers_gt_solver); matching O(h^2) here would need dt ~ h^2 or a
        # BDF2/Crank-Nicolson stepper.
        seg_dt = tmax / (num_tsteps - 1)
        substeps = max(1, math.ceil(seg_dt / h))
    dt = tmax / ((num_tsteps - 1) * substeps)

    def residual(u, u_old):
        """Galerkin residual of (u-u_old)/dt + u u_x - nu u_xx, CG1,
        constrained rows replaced by u - bc."""
        du = u - u_old
        mass = (h / 6.0) * (du[:-2] + 4.0 * du[1:-1] + du[2:]) / dt
        # advection element integrals (exact for P1):
        #   int_e u u_x phi_left  = (u_b-u_a)(u_a/3 + u_b/6)
        #   int_e u u_x phi_right = (u_b-u_a)(u_a/6 + u_b/3)
        d = u[1:] - u[:-1]
        ca = d * (u[:-1] / 3.0 + u[1:] / 6.0)
        cb = d * (u[:-1] / 6.0 + u[1:] / 3.0)
        adv = ca[1:] + cb[:-1]
        visc = (nu / h) * (-u[:-2] + 2.0 * u[1:-1] - u[2:])
        r_int = mass + adv + visc
        return jnp.concatenate(
            [(u[:1] - bc_l), r_int, (u[-1:] - bc_r)]
        )

    # Jacobi preconditioner from the linear (mass + viscous) diagonal
    diag = jnp.full(n + 1, (2.0 * h / 3.0) / dt + 2.0 * nu / h)
    diag = diag.at[0].set(1.0).at[-1].set(1.0)

    def euler_step(u_old, _):
        result = newton_krylov(
            lambda u: residual(u, u_old), u_old,
            max_steps=newton_steps, rel_tol=1e-5,
            krylov_tol=1e-6, krylov_max_iters=200,
            precond_diag=diag,
        )
        return result.u, result.residual_norm

    def segment(u, _):
        u, rnorms = jax.lax.scan(euler_step, u, None, length=substeps)
        return u, (u, jnp.max(rnorms))

    u_start = u0.at[0].set(bc_l).at[-1].set(bc_r)
    _, (frames, _) = jax.lax.scan(
        segment, u_start, None, length=num_tsteps - 1
    )
    u_grid = jnp.concatenate([u_start[None], frames], axis=0)  # [T, n+1]
    t_grid = jnp.linspace(0.0, tmax, num_tsteps)
    return BurgersGroundTruth(u_grid=u_grid, x_grid=nodes, t_grid=t_grid)


def evaluate(gt: BurgersGroundTruth, xt):
    """Evaluate u at (x, t) by bilinear interpolation (nodes here are
    uniformly spaced INCLUDING the walls, unlike the FV cell centers)."""
    x, t = xt[0], xt[1]
    T = gt.t_grid.shape[0]
    nn = gt.x_grid.shape[0]

    tmax = gt.t_grid[-1]
    ft = jnp.clip(t / tmax, 0.0, 1.0) * (T - 1)
    it = jnp.clip(jnp.floor(ft).astype(jnp.int32), 0, T - 2)
    wt = ft - it

    xmin, xmax = gt.x_grid[0], gt.x_grid[-1]
    fx = (jnp.clip(x, xmin, xmax) - xmin) / (xmax - xmin) * (nn - 1)
    ix = jnp.clip(jnp.floor(fx).astype(jnp.int32), 0, nn - 2)
    wx = fx - ix

    u00 = gt.u_grid[it, ix]
    u01 = gt.u_grid[it, ix + 1]
    u10 = gt.u_grid[it + 1, ix]
    u11 = gt.u_grid[it + 1, ix + 1]
    return (1 - wt) * ((1 - wx) * u00 + wx * u01) + wt * (
        (1 - wx) * u10 + wx * u11
    )
