"""Matrix-free Newton-Krylov utilities shared by the FEM solvers.

Replaces the reference's reliance on PETSc Newton with relaxation back-off
(td_burgers_fenics.py:103-115, hyper_elasticity_fenics.py:141-183). The
Jacobian is never materialized: J v comes from jax.jvp of the residual, and
linear solves use Krylov methods from jax.scipy. Damping/line-search recovers
the robustness PETSc's relaxation parameter provided.
"""

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class NewtonResult(NamedTuple):
    u: jnp.ndarray
    residual_norm: jnp.ndarray
    iterations: jnp.ndarray


def newton_krylov(
    residual_fn: Callable,
    u0: jnp.ndarray,
    max_steps: int = 30,
    rel_tol: float = 2e-5,
    abs_tol: float = 1e-12,
    damping: float = 1.0,
    krylov_tol: float = 1e-5,
    krylov_max_iters: int = 400,
    precond_diag: jnp.ndarray = None,
    precond_apply=None,
    symmetric: bool = False,
) -> NewtonResult:
    """Solve residual_fn(u) = 0 by damped Newton with matrix-free Krylov.

    Tolerances are RELATIVE to the initial residual norm — the natural
    stopping rule in f32, where absolute targets below ~1e-6 * scale are
    unreachable and make Krylov iterations spin to NaN. Uses a while_loop
    with static max_steps; shapes stay static for jit. BiCGStab handles the
    nonsymmetric Jacobians of Galerkin residuals; set symmetric=True (CG)
    for energy Hessians.
    """
    minv = 1.0 / precond_diag if precond_diag is not None else None

    def lin_solve(u, rhs):
        jvp_fn = lambda v: jax.jvp(residual_fn, (u,), (v,))[1]
        if precond_apply is not None:
            M = precond_apply  # e.g. a multigrid V-cycle (multigrid.py)
        elif minv is not None:
            M = lambda v: v * minv
        else:
            M = None
        if symmetric:
            sol, _ = jax.scipy.sparse.linalg.cg(
                jvp_fn, rhs, tol=krylov_tol, maxiter=krylov_max_iters, M=M
            )
        else:
            sol, _ = jax.scipy.sparse.linalg.bicgstab(
                jvp_fn, rhs, tol=krylov_tol, maxiter=krylov_max_iters, M=M
            )
        # guard a diverged Krylov solve: fall back to a preconditioned
        # steepest-descent-like step (the PETSc-relaxation analog)
        bad = ~jnp.isfinite(jnp.sum(sol))
        if precond_apply is not None:
            fallback = precond_apply(rhs)
        else:
            fallback = rhs * (minv if minv is not None else 1.0)
        return jnp.where(bad, fallback, sol)

    r0norm = jnp.linalg.norm(residual_fn(u0))
    target = jnp.maximum(rel_tol * r0norm, abs_tol)

    def cond(state):
        _, rnorm, it = state
        return jnp.logical_and(it < max_steps, rnorm > target)

    # candidate step fractions: full Newton first, damped fallbacks after —
    # the matrix-free analog of PETSc's relaxation back-off
    # (hyper_elasticity_fenics.py:177-183)
    alphas = jnp.asarray([1.0, 0.5, 0.25, 0.1]) * damping

    def body(state):
        u, rnorm_prev, it = state
        r = residual_fn(u)
        du = lin_solve(u, -r)

        def try_alpha(a):
            rn = jnp.linalg.norm(residual_fn(u + a * du))
            return jnp.where(jnp.isfinite(rn), rn, jnp.inf)

        rnorms = jax.vmap(try_alpha)(alphas)
        best = jnp.argmin(rnorms)
        improved = rnorms[best] < rnorm_prev
        u = jnp.where(improved, u + alphas[best] * du, u)
        rnorm = jnp.where(improved, rnorms[best], rnorm_prev)
        # no progress: bail out by jumping the counter to max_steps
        it = jnp.where(improved, it + 1, jnp.int32(max_steps))
        return u, rnorm, it

    u, rnorm, it = jax.lax.while_loop(cond, body, (u0, r0norm, jnp.int32(0)))
    return NewtonResult(u=u, residual_norm=rnorm, iterations=it)
