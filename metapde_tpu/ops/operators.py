"""Differential operators for neural fields.

TPU-first re-design of the reference operators (src/nets/field.py:47-108).
The reference builds each operator as jacfwd(jacrev(...)) per point and vmaps.
Here every operator is built from forward-mode JVPs taken against coordinate
basis vectors (the jvp-of-jvp formulation the reference itself prefers in its
hottest path, src/burgers/burgers_common.py:46-49): forward mode avoids the
transpose-of-transpose program XLA gets from jacfwd-of-jacrev, keeps the
per-point work a straight-line chain of fused VPU ops, and vmaps cleanly into
batched MXU matmuls over the collocation-point axis.

All *point* functions take a single coordinate x with shape [d]; the vmap_*
wrappers lift them over a batch of points [N, d]. Spatial dimension d is a
static Python int (from x.shape), so the basis-vector loop unrolls at trace
time into d fused JVP chains — no dynamic control flow under jit.
"""

from functools import partial

import jax
import jax.numpy as jnp


def _basis_like(x, i):
    """i-th coordinate basis vector, inheriting x's dtype AND its
    varying-manual-axes type (so jvp tangents stay well-typed under
    shard_map's check_vma when x is a sharded collocation point)."""
    return jnp.zeros_like(x).at[i].set(1.0)


def laplacian(potential_fn, x):
    """Trace of the Hessian of a scalar field at x ([d] -> scalar).

    Equivalent to reference laplace_operator with unit weighting
    (field.py:54-72) but computed as sum_i d^2 u / dx_i^2 via
    forward-over-reverse JVPs of grad(u).
    """
    d = x.shape[-1]
    grad_fn = jax.grad(lambda y: jnp.sum(potential_fn(y)))
    total = 0.0
    for i in range(d):
        e = _basis_like(x, i)
        _, hess_col = jax.jvp(grad_fn, (x,), (e,))
        total = total + hess_col[i]
    return total


def weighted_laplacian(potential_fn, weight_fn, x):
    """div(w(x) * grad(u))(x) for scalar u — the nonlinear-Poisson operator.

    Matches reference laplace_operator's weighted form (field.py:66-72):
    trace of jacfwd(x -> grad(u)(x) * w(x)). Note the reference scales the
    whole gradient row by the scalar weight before the outer jacobian, so the
    result is trace(d/dx [w(x) grad u(x)]) = div(w grad u).
    """
    d = x.shape[-1]

    def flux(y):
        return jax.grad(lambda z: jnp.sum(potential_fn(z)))(y) * weight_fn(y)

    total = 0.0
    for i in range(d):
        e = _basis_like(x, i)
        _, dflux = jax.jvp(flux, (x,), (e,))
        total = total + dflux[i]
    return total


def hessian_diag(potential_fn, x):
    """[d] vector of d^2 u / dx_i^2 at x (building block for PDE residuals)."""
    d = x.shape[-1]
    grad_fn = jax.grad(lambda y: jnp.sum(potential_fn(y)))
    cols = []
    for i in range(d):
        e = _basis_like(x, i)
        _, hess_col = jax.jvp(grad_fn, (x,), (e,))
        cols.append(hess_col[i])
    return jnp.stack(cols)


def divergence(field_fn, x):
    """Divergence of a vector field u: R^d -> R^d at x (field.py:80-94)."""
    d = x.shape[-1]
    f = lambda y: jnp.reshape(field_fn(y), (-1,))
    total = 0.0
    for i in range(d):
        e = _basis_like(x, i)
        _, jac_col = jax.jvp(f, (x,), (e,))
        total = total + jac_col[i]
    return total


def divergence_tensor(tensor_fn, x):
    """Row-wise divergence of a tensor field T: R^d -> R^{k x d} at x
    (field.py:97-103): out[k] = sum_i dT[k,i]/dx_i."""
    d = x.shape[-1]
    cols = []
    for i in range(d):
        e = _basis_like(x, i)
        _, jac_col = jax.jvp(lambda y: jnp.squeeze(tensor_fn(y)), (x,), (e,))
        cols.append(jac_col[..., i])
    return sum(cols)


def vmap_laplacian(points, potential_fn, weight_fn=None):
    """Laplacian (optionally coefficient-weighted) over a [N, d] point batch.

    Drop-in for reference vmap_laplace_operator (field.py:47-51)."""
    if weight_fn is None:
        return jax.vmap(partial(laplacian, potential_fn))(points)
    return jax.vmap(partial(weighted_laplacian, potential_fn, weight_fn))(points)


def vmap_weighted_laplacian(points, potential_fn, weight_fn):
    return jax.vmap(partial(weighted_laplacian, potential_fn, weight_fn))(points)


def vmap_divergence(points, field_fn):
    return jax.vmap(partial(divergence, field_fn))(points)


def vmap_divergence_tensor(points, tensor_fn):
    return jax.vmap(partial(divergence_tensor, tensor_fn))(points)
