"""LEAP: first-order meta-learning over loss-surface trajectories.

TPU-native re-design of the reference LEAP engine (src/nets/leap.py:32-228).
LEAP accumulates "pull-forward" meta-gradient increments along the inner
trajectory instead of differentiating through it, so it is first-order: the
meta-gradient is just a scan-carried accumulator. This makes LEAP's memory
footprint independent of inner_steps — ideal for the 60-80-step rollouts the
paper uses (pipeline/pipeline_leap_meta.sh).

Semantics preserved exactly (SURVEY.md section 2.2):
- increment: d = (theta_old - theta_new) - d_loss * grad, where
  d_loss = loss(theta_new) - loss(theta_old), stabilized to -|d_loss|
  (leap.py:190-215).
- normalized by the task-manifold norm sqrt(||d theta||^2 + d_loss^2)
  (leap.py:218-228).
- inner grads are global-norm clipped at `inner_grad_clip` before the inner
  optimizer step (leap.py:75-90).
"""

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..utils.trees import clip_by_global_norm, match_vma as _match_vma


class LeapDef(NamedTuple):
    """Algorithm-level LEAP parameters (reference LeapDef, leap.py:32-46)."""

    inner_opt: optax.GradientTransformation
    make_task_loss_fn: Callable  # key -> loss_fn; loss_fn: (key, params) -> (loss, aux)
    inner_steps: int
    n_batch_tasks: int
    norm: bool          # normalize increments by task-manifold norm
    loss_in_distance: bool  # include d_loss in the manifold metric
    stabilize: bool     # d_loss <- -|d_loss|
    inner_grad_clip: float
    remat: bool = False  # first-order: remat rarely needed
    # collocation-point mesh axis (see maml.MamlDef.pt_axis): loss fns return
    # their LOCAL point-shard loss; the engine pmeans over this axis
    pt_axis: str = None


def _pt_mean(leap_def, tree):
    if leap_def.pt_axis is None:
        return tree
    return jax.tree_util.tree_map(
        lambda x: jax.lax.pmean(x, leap_def.pt_axis), tree
    )


def _pt_vary(leap_def, tree):
    if leap_def.pt_axis is None:
        return tree
    return jax.tree_util.tree_map(
        lambda x: jax.lax.pcast(x, (leap_def.pt_axis,), to="varying"), tree
    )


def get_meta_grad_increment(leap_def: LeapDef, new_params, params, new_loss, loss, grad):
    """The LEAP pull-forward increment (reference leap.py:190-215)."""
    d_loss = new_loss - loss
    if leap_def.stabilize:
        d_loss = -jnp.abs(d_loss)

    if leap_def.norm:
        norm = compute_global_norm(leap_def, new_params, params, d_loss)
    else:
        norm = 1.0

    increment = jax.tree_util.tree_map(lambda x, y: x - y, params, new_params)
    if leap_def.loss_in_distance:
        increment = jax.tree_util.tree_map(
            lambda x, g: x - d_loss * g, increment, grad
        )
    return jax.tree_util.tree_map(lambda x: x / norm, increment)


def compute_global_norm(leap_def: LeapDef, new_params, old_params, d_loss):
    """Distance on the task manifold (reference leap.py:218-228)."""
    sum_sq = sum(
        jnp.sum(jnp.square(a - b))
        for a, b in zip(
            jax.tree_util.tree_leaves(new_params),
            jax.tree_util.tree_leaves(old_params),
        )
    )
    if leap_def.loss_in_distance:
        sum_sq = sum_sq + d_loss ** 2
    return jnp.sqrt(sum_sq)


def leap_inner_step(leap_def: LeapDef, key, params, opt_state, loss_fn, meta_grad_accum):
    """One inner step + meta-grad accumulator update (reference leap.py:49-102)."""
    k1, k2 = jax.random.split(key, 2)
    (loss, _aux), grad = jax.value_and_grad(loss_fn, argnums=1, has_aux=True)(k1, params)
    loss = _pt_mean(leap_def, loss)
    grad = _pt_vary(leap_def, _pt_mean(leap_def, grad))
    grad, _ = clip_by_global_norm(grad, leap_def.inner_grad_clip)
    updates, opt_state = leap_def.inner_opt.update(grad, opt_state, params)
    new_params = optax.apply_updates(params, updates)

    new_loss, new_aux = loss_fn(k2, new_params)
    new_loss = _pt_mean(leap_def, new_loss)
    new_aux = _pt_mean(leap_def, new_aux)
    increment = get_meta_grad_increment(
        leap_def, new_params, params,
        _pt_vary(leap_def, new_loss), _pt_vary(leap_def, loss), grad,
    )
    meta_grad_accum = jax.tree_util.tree_map(
        lambda x, y: x + y, meta_grad_accum, increment
    )
    return new_params, opt_state, meta_grad_accum, (new_loss, new_aux)


def single_task_rollout(leap_def: LeapDef, key, initial_params, loss_fn):
    """Adapt on one task, accumulating the LEAP meta-gradient
    (reference leap.py:105-147).

    Returns (final_params, meta_grad_accum, losses[inner_steps+1]).
    """
    loss0_key, inner_key = jax.random.split(key, 2)
    inner_keys = jax.random.split(inner_key, leap_def.inner_steps)

    initial_params = _pt_vary(leap_def, initial_params)
    loss0 = _pt_mean(leap_def, loss_fn(loss0_key, initial_params)[0])
    opt_state = leap_def.inner_opt.init(initial_params)
    meta_grad_accum = jax.tree_util.tree_map(jnp.zeros_like, initial_params)

    def body_fn(carry, key):
        params, opt_state, accum = carry
        params, opt_state, accum, (loss, _aux) = leap_inner_step(
            leap_def, key, params, opt_state, loss_fn, accum
        )
        return (params, opt_state, accum), loss

    if leap_def.remat:
        body_fn = jax.checkpoint(body_fn)

    carry0 = _match_vma(
        (initial_params, opt_state, meta_grad_accum), inner_keys
    )
    (final_params, _, meta_grad_accum), losses = jax.lax.scan(
        body_fn, carry0, inner_keys
    )
    losses = jnp.concatenate([jnp.reshape(loss0, (1,)), losses])
    # trajectories are identical across pt shards (updates are pmean'd), so
    # this pmean exactly converts the accumulator's type back to pt-invariant
    meta_grad_accum = _pt_mean(leap_def, meta_grad_accum)
    return final_params, meta_grad_accum, losses


def single_task_grad_and_losses(leap_def: LeapDef, key, initial_params):
    """Sample a task and compute its LEAP gradient (reference leap.py:150-167)."""
    loss_fn_key, rollout_key = jax.random.split(key, 2)
    loss_fn = leap_def.make_task_loss_fn(loss_fn_key)
    _, meta_grad, losses = single_task_rollout(
        leap_def, rollout_key, initial_params, loss_fn
    )
    return meta_grad, losses


def multi_task_grad_and_losses(leap_def: LeapDef, key, initial_params):
    """vmap over the task batch, mean the LEAP gradients (leap.py:170-187)."""
    keys = jax.random.split(key, leap_def.n_batch_tasks)
    grads, losses = jax.vmap(
        lambda k: single_task_grad_and_losses(leap_def, k, initial_params)
    )(keys)
    grads = jax.tree_util.tree_map(lambda g: g.mean(axis=0), grads)
    return grads, losses
