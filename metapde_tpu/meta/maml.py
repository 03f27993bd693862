"""Second-order MAML with learned per-parameter per-step inner learning rates.

TPU-native re-design of the reference MAML engine (src/nets/maml.py:31-233):

- The model is a raw parameter pytree (no flax Model/optimizer objects); the
  inner optimizer is an optax GradientTransformation whose state rides the
  lax.scan carry.
- The inner loop is a lax.scan over `inner_steps`, with the body optionally
  wrapped in jax.checkpoint (rematerialization) so the second-order meta
  gradient does not hold every inner activation live in HBM — the reference
  left this as a commented-out hint (maml.py:131); here it is first-class.
- Task-batch parallelism is jax.vmap here; the parallel layer shards the
  same code over a device mesh with psum-mean of meta-grads (parallel/).

Algorithm semantics preserved exactly (SURVEY.md section 2.2):
- inner update: grad * softplus(lr) per-parameter (maml.py:72-79), then
  global-norm clip at `inner_grad_clip` (maml.py:81-94), then the inner
  optimizer step.
- outer loss: exponentially decayed accumulation along the trajectory,
  L <- outer(theta_t) + decay * L (maml.py:136-140).
- the meta-gradient differentiates through the full unrolled inner loop
  w.r.t. (initial params, learned lrs) (maml.py:195-202).
"""

from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from ..utils.trees import clip_by_global_norm, match_vma as _match_vma


class MamlDef(NamedTuple):
    """Algorithm-level MAML parameters (reference MamlDef, maml.py:31-47)."""

    inner_opt: optax.GradientTransformation
    make_task_loss_fns: Callable  # key -> (inner_loss_fn, outer_loss_fn)
    # each loss fn: (key, params) -> (loss, aux_dict)
    inner_steps: int
    n_batch_tasks: int
    softplus_lrs: bool
    outer_loss_decay: float
    inner_grad_clip: float
    remat: bool = True
    # lax.scan unroll factor for the inner loop. >1 emits that many body
    # copies per loop trip — removes while-loop overhead for tiny bodies
    # (TPU) and makes XLA's compiled cost analysis count the unrolled
    # copies (its loop bodies are otherwise counted ONCE regardless of
    # trip count). inner_steps % unroll must be 0.
    unroll: int = 1
    # Collocation-point sharding (SURVEY.md section 2.3): when set (e.g. "pt"),
    # loss fns return the mean over their LOCAL point shard and the engine
    # pmeans losses/grads over this mesh axis. The pmean/pvary transposes give
    # the exact full-batch second-order meta-gradient (tests/test_sharding.py).
    pt_axis: Optional[str] = None


def _pt_mean(maml_def, tree):
    if maml_def.pt_axis is None:
        return tree
    return jax.tree_util.tree_map(
        lambda x: jax.lax.pmean(x, maml_def.pt_axis), tree
    )


def _pt_vary(maml_def, tree):
    if maml_def.pt_axis is None:
        return tree
    return jax.tree_util.tree_map(
        lambda x: jax.lax.pcast(x, (maml_def.pt_axis,), to="varying"), tree
    )


def _scale_by_lrs(grads, inner_lr, softplus: bool):
    maybe_softplus = (lambda x: jax.nn.softplus(x)) if softplus else (lambda x: x)
    g_struct = jax.tree_util.tree_structure(grads)
    lr_struct = jax.tree_util.tree_structure(inner_lr)
    if g_struct == lr_struct:
        return jax.tree_util.tree_map(
            lambda g, lr: g * maybe_softplus(lr), grads, inner_lr
        )
    return jax.tree_util.tree_map(lambda g: g * maybe_softplus(inner_lr), grads)


def maml_inner_step(maml_def: MamlDef, key, params, opt_state, inner_loss_fn, inner_lr):
    """One inner-loop step: lr-scaled, clipped gradient descent (maml.py:50-97).

    With pt_axis set, the local-shard gradient is pmean'd over the point
    axis (full-batch gradient) and re-varied to match the params' vma.
    """
    (loss, _aux), grads = jax.value_and_grad(inner_loss_fn, argnums=1, has_aux=True)(
        key, params
    )
    loss = _pt_mean(maml_def, loss)
    grads = _pt_vary(maml_def, _pt_mean(maml_def, grads))
    inner_lr = _pt_vary(maml_def, inner_lr)
    grads = _scale_by_lrs(grads, inner_lr, maml_def.softplus_lrs)
    grads, _ = clip_by_global_norm(grads, maml_def.inner_grad_clip)
    updates, opt_state = maml_def.inner_opt.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, loss


def single_task_rollout(
    maml_def: MamlDef,
    rollout_key,
    initial_params,
    inner_loss_fn,
    inner_lrs=None,
    outer_loss_fn: Optional[Callable] = None,
):
    """Adapt `initial_params` on one task; used for training AND deployment
    (reference single_task_rollout, maml.py:100-166).

    Args:
        inner_lrs: pytree congruent to params stacked [inner_steps, ...]
            (learned lrs), or None for unit lrs.

    Returns:
        final_params, (meta_loss, losses) where losses has shape
        [inner_steps + 1] (loss before/after each step).
    """
    if inner_lrs is None:
        inner_lrs = jnp.ones(maml_def.inner_steps)

    def body_fn(carry, lr):
        params, opt_state, key, meta_loss = carry
        k1, k2, k3 = jax.random.split(key, 3)
        params, opt_state, loss = maml_inner_step(
            maml_def, k1, params, opt_state, inner_loss_fn, lr
        )
        if outer_loss_fn is not None:
            step_outer = _pt_mean(maml_def, outer_loss_fn(k2, params)[0])
            meta_loss = step_outer + meta_loss * maml_def.outer_loss_decay
        return (params, opt_state, k3, meta_loss), loss

    if maml_def.remat:
        body_fn = jax.checkpoint(body_fn)

    # with pt sharding the trajectory params are pt-varying (pvaried by the
    # caller) while losses/keys are pt-invariant; match carry vma per leaf
    initial_params = _pt_vary(maml_def, initial_params)
    opt_state = maml_def.inner_opt.init(initial_params)
    carry0 = (initial_params, opt_state) + _match_vma(
        (rollout_key, jnp.zeros(())), rollout_key
    )
    (final_params, _, final_key, meta_loss), losses = jax.lax.scan(
        body_fn, carry0, inner_lrs, unroll=maml_def.unroll
    )

    loss_final = _pt_mean(maml_def, inner_loss_fn(final_key, final_params)[0])
    losses = jnp.append(losses, loss_final)
    return final_params, (meta_loss, losses)


def single_task_grad_and_losses(maml_def: MamlDef, key, initial_params, inner_lrs=None):
    """Sample a task, roll out, and differentiate w.r.t. (params, lrs)
    (reference maml.py:170-207)."""
    task_key, rollout_key, outer_loss_key = jax.random.split(key, 3)
    inner_loss_fn, outer_loss_fn = maml_def.make_task_loss_fns(task_key)

    def task_rollout_and_eval(params_and_lrs):
        params, lrs = params_and_lrs
        final_params, (outer_loss, losses) = single_task_rollout(
            maml_def, rollout_key, params, inner_loss_fn, lrs,
            outer_loss_fn=outer_loss_fn,
        )
        _, outer_aux = outer_loss_fn(outer_loss_key, final_params)
        outer_aux = _pt_mean(maml_def, outer_aux)
        return outer_loss, (losses, outer_aux)

    lrs = inner_lrs if inner_lrs is not None else jnp.ones(maml_def.inner_steps)
    (meta_loss, (losses, outer_aux)), meta_grad = jax.value_and_grad(
        task_rollout_and_eval, has_aux=True
    )((initial_params, lrs))

    if inner_lrs is None:
        meta_grad = meta_grad[0]
    return meta_grad, losses, (meta_loss, outer_aux)


def multi_task_grad_and_losses(maml_def: MamlDef, key, initial_params, inner_lrs=None):
    """vmap the single-task meta-gradient over a batch of tasks and average
    (reference maml.py:211-233). Under shard_map the vmap covers the local
    task shard and the mean is completed by a psum (parallel/sharding.py)."""
    keys = jax.random.split(key, maml_def.n_batch_tasks)
    grads, losses, meta_losses = jax.vmap(
        lambda k: single_task_grad_and_losses(maml_def, k, initial_params, inner_lrs)
    )(keys)
    grads = jax.tree_util.tree_map(lambda g: g.mean(axis=0), grads)
    return grads, losses, meta_losses
