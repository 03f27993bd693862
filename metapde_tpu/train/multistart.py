"""Multi-start deployment: vmapped K-candidate adaptation with
self-computable argmin selection.

Motivation (RESULTS.md hyperelasticity audit; NEXT.md item 3a): on
multi-stable tasks (post-buckling branches of the compressed porous
sheet) a single deployment adaptation can converge into a HIGHER-energy
basin — the audited tail seed satisfied the displacement BCs to <2e-8
but sat 36% above the oracle's neo-Hookean energy (val rel_err 0.19).
The failure is detectable WITHOUT ground truth: the total task loss
(domain energy + weighted BC penalty — the same objective the adaptation
minimizes) separates the basins. So: run K independent adaptations
(different collocation-point PRNG streams, optionally jittered inits),
score all K on one COMMON freshly-sampled point set, keep the argmin.

TPU-native shape: the K candidates are one `jax.vmap` axis over the
existing adaptation rollout — K small-MLP rollouts batch onto the MXU in
one compiled computation; selection is a tree-indexed gather. No
counterpart exists in the reference (its deployment is one rollout,
src/maml_pde.py:163-183); this is a robustness feature the reference's
own paper protocol lacks.
"""

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp


class MultistartAux(NamedTuple):
    scores: jnp.ndarray   # [n_starts] common-point total loss per candidate
    best_idx: jnp.ndarray  # argmin of scores


def jitter_leaves(key, params, scale):
    """Relative Gaussian init jitter: leaf + scale * rms(leaf) * N(0,1).

    `scale` may be a traced scalar (0.0 disables — used to keep candidate 0
    at the exact meta-learned init so n_starts=K strictly dominates K=1).
    rms is per-leaf so the perturbation respects SIREN's layerwise
    init magnitudes (models/siren.py) instead of one global scale.
    """
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(key, len(leaves))
    out = []
    for leaf, k in zip(leaves, keys):
        rms = jnp.sqrt(jnp.mean(leaf ** 2) + 1e-12)
        out.append(leaf + scale * rms * jax.random.normal(k, leaf.shape,
                                                          leaf.dtype))
    return jax.tree_util.tree_unflatten(treedef, out)


def make_score_fn(pde, loss_fn, field, n_points: int) -> Callable:
    """Self-computable candidate score: the total task loss (bc_weight *
    boundary + domain — identical weighting to the drivers' loss_fn) on a
    freshly sampled point set. The key is SHARED across candidates by
    multistart_adapt, so scores differ only through the field params."""

    def score(key, field_params, task_params):
        pts = pde.sample_points(key, n_points, task_params)
        loss, _ = loss_fn(field.bind(field_params), pts, task_params)
        return loss

    return score


def multistart_adapt(
    key,
    model,
    task_params,
    adapt_fn: Callable,       # (key, model, task_params) -> field params
    score_fn: Callable,       # (key, field_params, task_params) -> scalar
    n_starts: int,
    jitter: float = 0.0,
    jitter_fn: Optional[Callable] = None,  # (key, model, scale) -> model
):
    """Run `adapt_fn` from `model` under n_starts independent PRNG streams
    (candidate 0 un-jittered; candidates 1.. optionally init-jittered),
    score every final candidate on ONE common point draw, return
    (best_field_params, MultistartAux)."""
    k_adapt, k_jit, k_score = jax.random.split(key, 3)
    adapt_keys = jax.random.split(k_adapt, n_starts)
    jit_keys = jax.random.split(k_jit, n_starts)
    idx = jnp.arange(n_starts)

    def one(i, ak, jk):
        m = model
        if jitter > 0.0 and jitter_fn is not None:
            m = jitter_fn(jk, model, jnp.where(i == 0, 0.0, jitter))
        return adapt_fn(ak, m, task_params)

    finals = jax.vmap(one)(idx, adapt_keys, jit_keys)
    scores = jax.vmap(lambda fp: score_fn(k_score, fp, task_params))(finals)
    # a diverged candidate (NaN score) loses the selection, never wins it
    scores = jnp.where(jnp.isnan(scores), jnp.inf, scores)
    best = jnp.argmin(scores)
    best_params = jax.tree_util.tree_map(lambda x: x[best], finals)
    return best_params, MultistartAux(scores=scores, best_idx=best)


def wrap_get_final_model(
    get_final_model: Callable,  # (key, model, task_params, inner_steps) -> fp
    score_fn: Callable,
    n_starts: int,
    jitter: float = 0.0,
    jitter_fn: Optional[Callable] = None,
):
    """Multi-start version of a driver's get_final_model; same signature,
    so make_coef_func / validation / deploy_bench compose unchanged."""

    def ms_final_model(key, model, task_params, inner_steps: int):
        best, _ = multistart_adapt(
            key, model, task_params,
            lambda k, m, tp: get_final_model(k, m, tp, inner_steps),
            score_fn, n_starts, jitter=jitter, jitter_fn=jitter_fn,
        )
        return best

    return ms_final_model
