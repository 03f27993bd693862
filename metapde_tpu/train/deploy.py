"""Optimizer-based deployment adaptation (cfg.deploy.optimizer).

The reference measures deployment two ways: (a) the meta algorithm's own
k-step rollout (maml_pde.py:163-183 get_final_model), and (b) fine-tuning
from the meta init with a fresh first-order optimizer (nn_pde.py with
--load_model_from_expt, pipeline/pipeline_poisson_{maml,leap}.sh — the
paper's deployment curves). Path (a) is the drivers' get_final_model;
this module is path (b) as a jit/vmap-compatible k-step lax.scan so
deploy_bench can put both on the same accuracy-vs-time axis.

Semantics match get_final_model: one fresh collocation draw per task
(terminal PRNG key discipline), k optimizer steps on the full task loss,
static k so the scan compiles once per (k, optimizer) pair.
"""

from functools import partial

import jax
import jax.numpy as jnp
import optax

# one optimizer table for training AND deployment: optimizers.get_optimizer
# already encodes the reference's exact beta mapping (adam b2=0.99, rmsprop =
# adam(b1=0, b2=0.8), trainer_util.py:593-612); a local copy here had drifted
# to optax defaults (ADVICE r2)
from .optimizers import get_optimizer as _make_opt


def make_opt_final_model(pde, loss_fn, field, task_cfg, deploy_cfg,
                         model_is_pair: bool):
    """(key, model, task_params, inner_steps) -> adapted params.

    model_is_pair: MAML passes (params, learned_lrs); LEAP passes params.
    The learned-LR stack is ignored on this path (the optimizer replaces
    it), matching the reference's fine-tune protocol which loads only the
    model from the meta checkpoint (nn_pde.py:169-186).
    """
    opt = _make_opt(deploy_cfg.optimizer, deploy_cfg.inner_lr)

    def final_model(key, model, task_params, inner_steps: int):
        params = model[0] if model_is_pair else model
        if inner_steps == 0:
            return params
        k1, _ = jax.random.split(key)
        pts = pde.sample_points(k1, task_cfg.inner_points, task_params)

        def task_loss(fp):
            out = loss_fn(field.bind(fp), pts, task_params)
            return out[0] if isinstance(out, tuple) else out

        def step(carry, _):
            p, s = carry
            g = jax.grad(task_loss)(p)
            updates, s = opt.update(g, s, p)
            return (optax.apply_updates(p, updates), s), None

        (p, _), _ = jax.lax.scan(
            step, (params, opt.init(params)), None, length=int(inner_steps)
        )
        return p

    return final_model
