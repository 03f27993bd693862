"""Outer-optimizer factory (reference: trainer_util.get_optimizer:593-612).

Maps the reference's flax.optim / flaxOptimizers choices onto optax:
- adam    -> optax.adam(b1=0.9, b2=0.99)      (trainer_util.py:595)
- rmsprop -> optax.adam(b1=0.0, b2=0.8)       (the reference's "rmsprop" is
             literally Adam with beta1=0, trainer_util.py:599)
- ranger  -> RAdam wrapped in Lookahead (slow weights held in optimizer
             STATE, so the params pytree stays a plain field pytree — no
             optax.lookahead LookaheadParams threading). Matches
             flaxOptimizers.Ranger(use_gc=False) (trainer_util.py:602-605):
             RAdam core, sync_period 6, slow step 0.5.
- sgd     -> optax.sgd
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


class LookaheadState(NamedTuple):
    inner: optax.OptState
    slow: optax.Params
    count: jnp.ndarray


def lookahead(inner: optax.GradientTransformation, sync_period: int = 6,
              slow_step: float = 0.5) -> optax.GradientTransformation:
    """Lookahead (Zhang et al. 2019) as a state-carrying transformation.

    Fast weights take `inner` steps; every sync_period steps the slow
    weights move slow += slow_step * (fast - slow) and the fast weights
    reset to the slow weights. Unlike optax.lookahead, params keep their
    original pytree structure (slow weights live in the opt state), so the
    meta-learning drivers and checkpoints are unaffected.
    """

    def init(params):
        return LookaheadState(
            inner=inner.init(params),
            slow=jax.tree_util.tree_map(jnp.asarray, params),
            count=jnp.zeros([], jnp.int32),
        )

    def update(updates, state, params=None):
        del_updates, inner_state = inner.update(updates, state.inner, params)
        fast = optax.apply_updates(params, del_updates)
        count = state.count + 1
        sync = count % sync_period == 0
        slow_new = jax.tree_util.tree_map(
            lambda s, f: s + slow_step * (f - s), state.slow, fast
        )
        # on sync steps the emitted update moves params to the new slow
        # weights; otherwise it is the plain fast update
        out = jax.tree_util.tree_map(
            lambda du, f, sn, p: jnp.where(sync, sn - p, du),
            del_updates, fast, slow_new, params,
        )
        slow = jax.tree_util.tree_map(
            lambda s, sn: jnp.where(sync, sn, s), state.slow, slow_new
        )
        return out, LookaheadState(inner=inner_state, slow=slow, count=count)

    return optax.GradientTransformation(init, update)


def get_optimizer(name: str, lr: float) -> optax.GradientTransformation:
    if name == "adam":
        return optax.adam(lr, b1=0.9, b2=0.99)
    if name == "rmsprop":
        return optax.adam(lr, b1=0.0, b2=0.8)
    if name == "ranger":
        return lookahead(optax.radam(lr, b2=0.99))
    if name == "sgd":
        return optax.sgd(lr)
    raise ValueError(f"unknown optimizer: {name!r}")
