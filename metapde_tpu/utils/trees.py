"""Pytree utilities (reference: src/util/jax_tools.py:4-46, plus the
global-norm clipping recipe repeated inline in src/nets/maml.py:81-94,
src/maml_pde.py:210-223)."""

import jax
import jax.numpy as jnp


def global_norm(tree) -> jnp.ndarray:
    """sqrt of the sum of squares of every leaf."""
    leaves = jax.tree_util.tree_leaves(tree)
    if not leaves:
        return jnp.zeros(())
    return jnp.sqrt(sum(jnp.sum(jnp.square(x)) for x in leaves))


def clip_by_global_norm(tree, max_norm):
    """Scale the whole tree so its global norm is at most max_norm.

    Matches the reference's lax.cond formulation (maml.py:87-94): the tree is
    rescaled by max_norm/norm only when norm > max_norm, otherwise unchanged.
    """
    norm = global_norm(tree)
    scale = jnp.where(norm > max_norm, max_norm / jnp.maximum(norm, 1e-30), 1.0)
    return jax.tree_util.tree_map(lambda x: x * scale, tree), norm


def tree_stack(trees):
    """List of congruent pytrees -> single pytree with stacked leading axis."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *trees)


def tree_unstack(tree):
    """Pytree with leading axis -> list of pytrees (jax_tools.py:24-46)."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    n = leaves[0].shape[0]
    return [
        jax.tree_util.tree_unflatten(treedef, [leaf[i] for leaf in leaves])
        for i in range(n)
    ]


def match_vma(tree, like):
    """Cast `tree` leaves to carry the varying-manual-axes of `like`.

    Needed under shard_map (check_vma): a lax.scan carry initialized from
    replicated values (params, zero accumulators) becomes device-varying
    after one step of shard-varying losses, and scan requires carry-in and
    carry-out vma types to match. Outside shard_map this is a no-op."""
    vma = frozenset(getattr(jax.typeof(like), "vma", frozenset()))
    if not vma:
        return tree

    def cast(x):
        have = frozenset(getattr(jax.typeof(x), "vma", frozenset()))
        need = tuple(sorted(vma - have))
        return jax.lax.pcast(x, need, to="varying") if need else x

    return jax.tree_util.tree_map(cast, tree)


def dict_flatten(tree, prefix=""):
    """Flatten a nested dict pytree to a list of (dotted_name, leaf) pairs
    (jax_tools.py:4-21); used for per-parameter histograms/metrics."""
    out = []
    if isinstance(tree, dict):
        for k in sorted(tree.keys()):
            out.extend(dict_flatten(tree[k], prefix + str(k) + "."))
    else:
        out.append((prefix[:-1] if prefix else prefix, tree))
    return out
