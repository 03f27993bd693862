"""Solution-transfer interpolators (reference: src/burgers/burgers_common.py:
359-440, SecondOrderTaylorLookup + fenics_to_jax).

The reference needed these to drag FEniCS FEM solutions into JAX (project
gradients/hessians with MUMPS, then Taylor-expand around nearest dof, or
softmax-kNN over a sampled grid). Here ground truths are already
jit-evaluable, so the same tools are built once, generically, from any
evaluation function via autodiff:

- TaylorLookup: tabulate (u, grad u, hess u) at anchor points, evaluate by
  second-order Taylor expansion around the nearest anchor.
- knn_interpolant: low-temperature-softmax 5-NN interpolation over sampled
  values with a definedness mask (fenics_to_jax's scheme, :400-440).
"""

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class TaylorLookup(NamedTuple):
    """Second-order Taylor tables around anchor points (pytree, vmappable)."""

    x0s: jnp.ndarray  # [M, dim]
    u0s: jnp.ndarray  # [M, d]
    g0s: jnp.ndarray  # [M, d, dim]
    h0s: jnp.ndarray  # [M, d, dim, dim]


def build_taylor_lookup(fn: Callable, x0s) -> TaylorLookup:
    """Tabulate fn (x [dim] -> [d] or scalar) and its first two derivatives
    at anchor points (reference builds these with FEniCS projections +
    MUMPS, burgers_common.py:360-373; autodiff replaces all of that)."""
    x0s = jnp.asarray(x0s)

    def as_vec(x):
        out = fn(x)
        return jnp.atleast_1d(out)

    u0s = jax.vmap(as_vec)(x0s)
    g0s = jax.vmap(jax.jacfwd(as_vec))(x0s)
    h0s = jax.vmap(jax.jacfwd(jax.jacfwd(as_vec)))(x0s)
    return TaylorLookup(x0s=x0s, u0s=u0s, g0s=g0s, h0s=h0s)


def taylor_eval(lookup: TaylorLookup, x):
    """Evaluate at x [dim] by expansion around the nearest anchor
    (burgers_common.py:375-398)."""
    dists = jnp.sum((lookup.x0s - x[None, :]) ** 2, axis=1)
    i = jnp.argmin(dists)
    dx = x - lookup.x0s[i]
    u0, g0, h0 = lookup.u0s[i], lookup.g0s[i], lookup.h0s[i]
    return u0 + g0 @ dx + 0.5 * jnp.einsum("a,dab,b->d", dx, h0, dx)


def knn_interpolant(xys, values, mask=None, k: int = 5, temp: float = 1.0):
    """Softmax-weighted k-NN interpolant over sampled (xy, value) pairs
    (fenics_to_jax, burgers_common.py:400-440). Returns a jit/vmap-friendly
    fn x [dim] -> value."""
    xys = jnp.asarray(xys)
    values = jnp.atleast_2d(jnp.asarray(values))
    if values.shape[0] != xys.shape[0]:
        values = values.T
    mask = jnp.ones(xys.shape[0]) if mask is None else jnp.asarray(mask, jnp.float32)

    def interp(x):
        dists = jnp.sum((xys - x[None, :]) ** 2, axis=1)
        # masked (undefined) samples must neither occupy neighbor slots nor
        # receive softmax weight: push them past every valid distance and
        # drive their logits to -inf (a zero logit would still win e^0
        # relative weight whenever valid neighbors have d >~ temp)
        dists = jnp.where(mask > 0.5, dists, jnp.inf)
        neg_top, inds = jax.lax.top_k(-dists, k)
        d = -neg_top
        logits = jnp.where(mask[inds] > 0.5, temp / (d + 1e-14), -jnp.inf)
        w = jax.nn.softmax(logits)
        return jnp.einsum("k,kd->d", w, values[inds])

    return interp
