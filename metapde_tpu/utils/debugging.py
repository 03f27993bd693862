"""Debug tracing helpers (reference: src/util/debugging.py:19-75, djit/
dgrad/dvjp: naming JAX tracers per function argument for readable traces).

Modern JAX offers jax.debug.print / breakpoint; these wrappers add the
reference's capability of labeling abstract values during tracing plus a
key-lineage checker enforcing the "input key is terminal" PRNG discipline
the reference documents in comments (maml_pde.py:88).
"""

import functools

import jax
import jax.numpy as jnp


def djit(fn=None, *, name=None, **jit_kwargs):
    """jit that prints argument/output structures at trace time (each
    recompile), the modern analogue of the reference's tracer-naming djit."""
    if fn is None:
        return functools.partial(djit, name=name, **jit_kwargs)

    label = name or fn.__name__

    @functools.wraps(fn)
    def traced(*args, **kwargs):
        shapes = jax.tree_util.tree_map(
            lambda x: getattr(x, "shape", None), (args, kwargs)
        )
        print(f"[djit] tracing {label} with {shapes}")
        out = fn(*args, **kwargs)
        print(
            f"[djit] {label} -> "
            f"{jax.tree_util.tree_map(lambda x: getattr(x, 'shape', None), out)}"
        )
        return out

    return jax.jit(traced, **jit_kwargs)


def dgrad(fn, **grad_kwargs):
    """grad with trace-time structure printing."""
    return djit(jax.grad(fn, **grad_kwargs), name=f"grad({fn.__name__})")


class KeyLineage:
    """Debug-mode PRNG-key lineage checker: flags reuse of a consumed key.

    The reference relies on comment discipline ("the input key is terminal");
    this makes violations loud in eager debugging sessions. Not for use
    under jit (host-side state).
    """

    def __init__(self):
        self._consumed = set()

    def use(self, key, where: str = "?"):
        h = tuple(jnp.asarray(key).reshape(-1).tolist())
        if h in self._consumed:
            raise RuntimeError(
                f"PRNG key reused at {where}: {h}. Split before reuse."
            )
        self._consumed.add(h)
        return key

    def split(self, key, n=2, where: str = "?"):
        self.use(key, where)
        return jax.random.split(key, n)
