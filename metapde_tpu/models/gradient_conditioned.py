"""Gradient-conditioned field: a model whose forward pass internally runs an
inner SGD adaptation (reference: src/nets/gradient_conditioned.py:18-140,
present in the reference but not wired into its drivers).

The apply is: given a task's inner-loss closure, adapt a copy of the params
with `inner_steps` of (optionally per-step-lr-scaled) SGD inside the forward
computation, then evaluate the adapted field at the query points. With
first_order=True, stop_gradients cut the second-order terms (CAVIA/FOMAML
style, gradient_conditioned.py:52-58).
"""

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..config import FieldConfig
from .siren import field_apply, init_field_params


class GradientConditionedFieldDef(NamedTuple):
    init: Callable
    apply: Callable  # (params, inner_loss_fn, x) -> adapted field values
    cfg: FieldConfig


def make_gradient_conditioned_field(
    cfg: FieldConfig,
    inner_steps: int = 5,
    inner_lr: float = 1e-3,
    learned_lrs: bool = False,
    first_order: bool = False,
) -> GradientConditionedFieldDef:
    def init(key):
        params = {"base": init_field_params(key, cfg)}
        if learned_lrs:
            params["log_lrs"] = jnp.zeros((inner_steps,))
        return params

    def apply(params, inner_loss_fn, x):
        base = params["base"]
        lrs = (
            inner_lr * jnp.exp(params["log_lrs"])
            if learned_lrs
            else jnp.full((inner_steps,), inner_lr)
        )

        def body(p, lr):
            grads = jax.grad(
                lambda q: inner_loss_fn(lambda y: field_apply(q, y, cfg))
            )(p)
            if first_order:
                grads = jax.lax.stop_gradient(grads)
            p = jax.tree_util.tree_map(lambda a, g: a - lr * g, p, grads)
            return p, None

        adapted, _ = jax.lax.scan(body, base, lrs)
        return field_apply(adapted, x, cfg)

    return GradientConditionedFieldDef(init=init, apply=apply, cfg=cfg)
