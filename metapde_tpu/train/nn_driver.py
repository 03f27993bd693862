"""Plain-PINN driver: fit one network to one PDE task, optionally starting
from a meta-learned initialization (reference: src/nn_pde.py:47-507 and the
hybrid src/nn_pde_maml.py).

Reference semantics preserved:
- n_eval and fixed_num_pdes are forced to 1 (nn_pde.py:51-52): every task
  key resolves to the same PDE; the batch axis only varies collocation
  points.
- batch loss = SUM over the task batch of (bc_weight * boundary + domain)
  losses (nn_pde.py:93-107).
- per-loss-term gradient norms for diagnostics (get_grad_norms,
  nn_pde.py:77-91).
- deployment fine-tuning: --train.load_model_from_expt starts from the
  latest checkpoint of a meta-training run (nn_pde.py:169-186); this is how
  the paper's deployment accuracy-vs-time curves are produced
  (pipeline/pipeline_poisson_maml.sh).
- hybrid warm start (nn_pde_maml.py:178-241): when the loaded checkpoint
  carries learned inner LRs and cfg.maml.inner_steps > 0, one MAML
  adaptation rollout is applied before plain training begins.
"""

import dataclasses
import os
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import Config
from ..meta import maml
from ..models import make_field
from ..pdes import get_pde
from ..utils import Timer, global_norm
from . import checkpoints as ckpt
from .metrics import prepare_logging
from .optimizers import get_optimizer
from .validation import get_ground_truth, make_validation_fn


def build(cfg: Config):
    # force single-task mode (reference nn_pde.py:51-52) — via config copy,
    # never by mutating shared state. The run seed is folded into the task
    # seed so a seed sweep fine-tunes DIFFERENT tasks: pde.sample_params
    # pins the task to PRNGKey(task.seed) under fixed_num_pdes, and the
    # reference's deployment protocol draws the task from the run seed
    # (nn_pde.py:51-52). Without the fold, every sweep seed would measure
    # the same PRNGKey(task.seed) task 8 times.
    task_cfg = dataclasses.replace(cfg.task, n_eval=1, fixed_num_pdes=1,
                                   seed=cfg.task.seed + cfg.seed)
    cfg = dataclasses.replace(cfg, task=task_cfg)

    pde = get_pde(cfg.task)
    model_cfg = dataclasses.replace(
        cfg.model, in_dim=pde.in_dim, out_dim=pde.out_dim,
        squeeze_scalar=pde.scalar,
    )
    field = make_field(model_cfg)

    def loss_fn(field_fn, points, params):
        boundary_losses, domain_losses = pde.loss_fn(field_fn, points, params)
        loss = cfg.task.bc_weight * sum(boundary_losses.values()) + sum(
            domain_losses.values()
        )
        return loss, {**boundary_losses, **domain_losses}

    def task_loss_fn(key, field_params):
        k1, k2 = jax.random.split(key, 2)
        params = pde.sample_params(k1)
        points = pde.sample_points(k2, cfg.task.outer_points, params)
        return loss_fn(field.bind(field_params), points, params)

    def batch_loss_fn(key, field_params):
        keys = jax.random.split(key, max(cfg.maml.bsize, 1))
        loss, loss_dict = jax.vmap(task_loss_fn, (0, None))(keys, field_params)
        loss_aux = {k: jnp.mean(v) for k, v in loss_dict.items()}
        return jnp.sum(loss), loss_aux

    opt = get_optimizer(cfg.train.optimizer, cfg.maml.outer_lr)

    def _step_core(key, params, opt_state):
        (loss, loss_aux), grads = jax.value_and_grad(
            batch_loss_fn, argnums=1, has_aux=True
        )(key, params)
        grad_norm = global_norm(grads)
        scale = jnp.where(
            grad_norm > cfg.maml.grad_clip,
            cfg.maml.grad_clip / jnp.maximum(grad_norm, 1e-30),
            1.0,
        )
        grads = jax.tree_util.tree_map(lambda g: g * scale, grads)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, loss_aux, grad_norm

    train_step = jax.jit(_step_core)

    def _step_many_core(key, params, opt_state, n_steps):
        """n_steps training steps as one device computation (see the MAML
        driver's train_step_many for rationale)."""
        def body(carry, k):
            p, o = carry
            p, o, loss, loss_aux, gn = _step_core(k, p, o)
            return (p, o), (loss, loss_aux, gn)

        keys = jax.random.split(key, n_steps)
        (params, opt_state), (losses, aux_s, gns) = jax.lax.scan(
            body, (params, opt_state), keys
        )
        aux_last = jax.tree_util.tree_map(lambda x: x[-1], aux_s)
        return params, opt_state, losses[-1], aux_last, gns[-1], losses

    train_step_many = partial(jax.jit, static_argnames="n_steps")(
        _step_many_core
    )

    # --- multi-start fine-tuning (cfg.deploy.n_starts > 1) ------------------
    # K candidates fine-tuned in lockstep as one vmapped device computation
    # (per-candidate PRNG streams + optional init jitter), selected by the
    # self-computable total loss on a common point draw (train/multistart.py;
    # motivated by the post-buckling basin tail, RESULTS.md audit).
    from .multistart import make_score_fn

    @partial(jax.jit, static_argnames="n_steps")
    def ms_train_step_many(keys, params_k, opt_state_k, n_steps):
        return jax.vmap(
            lambda k, p, o: _step_many_core(k, p, o, n_steps)
        )(keys, params_k, opt_state_k)

    _score = make_score_fn(
        pde, loss_fn, field,
        cfg.deploy.score_points or cfg.task.validation_points,
    )

    @jax.jit
    def ms_scores(key, params_k):
        # the task is pinned (fixed_num_pdes=1), so any key yields THE task
        task_params = pde.sample_params(jax.random.PRNGKey(0))
        scores = jax.vmap(lambda fp: _score(key, fp, task_params))(params_k)
        return jnp.where(jnp.isnan(scores), jnp.inf, scores)

    @jax.jit
    def get_grad_norms(key, params):
        """Per-loss-term value + grad norm (reference nn_pde.py:77-91)."""
        _, loss_dict = batch_loss_fn(key, params)
        out = {}
        for k in loss_dict:
            val, g = jax.value_and_grad(
                lambda p: batch_loss_fn(key, p)[1][k]
            )(params)
            out[k] = (val, global_norm(g))
        return out

    def make_coef_func(key, params, task_params, coords):
        # no adaptation: the model itself is the solution (nn_pde.py:110-121)
        return jnp.squeeze(field.apply_inference(params, coords))

    def maml_warmup(key, params, inner_lrs):
        """One k-step MAML adaptation from a meta init (nn_pde_maml.py:178-241)."""
        task_key, rollout_key = jax.random.split(key)
        task_params = pde.sample_params(task_key)

        def inner_loss(key, fp):
            pts = pde.sample_points(key, cfg.task.inner_points, task_params)
            return loss_fn(field.bind(fp), pts, task_params)

        maml_def = maml.MamlDef(
            inner_opt=optax.sgd(cfg.maml.inner_lr),
            make_task_loss_fns=lambda k: (inner_loss, inner_loss),
            inner_steps=cfg.maml.inner_steps,
            n_batch_tasks=1,
            softplus_lrs=True,
            outer_loss_decay=cfg.maml.outer_loss_decay,
            inner_grad_clip=cfg.maml.inner_grad_clip,
        )
        lrs = jax.tree_util.tree_map(
            lambda x: x[: cfg.maml.inner_steps], inner_lrs
        )
        final_params, _ = maml.single_task_rollout(
            maml_def, rollout_key, params, inner_loss, lrs
        )
        return final_params

    key = jax.random.PRNGKey(cfg.seed)
    key, init_key = jax.random.split(key)
    init_params = field.init(init_key)

    return dict(
        cfg=cfg,
        pde=pde,
        field=field,
        model_cfg=model_cfg,
        loss_fn=loss_fn,
        batch_loss_fn=jax.jit(batch_loss_fn),
        train_step=train_step,
        train_step_many=train_step_many,
        ms_train_step_many=ms_train_step_many,
        ms_scores=ms_scores,
        get_grad_norms=get_grad_norms,
        make_coef_func=make_coef_func,
        maml_warmup=maml_warmup,
        opt=opt,
        init_params=init_params,
        key=key,
    )


def run(cfg: Config, maml_warmup: bool = False):
    out_dir = cfg.train.out_dir or f"{cfg.task.pde}_nn_results"
    path, log, metrics = prepare_logging(out_dir, cfg.train.expt_name)
    log(cfg.to_json())

    c = build(cfg)
    cfg = c["cfg"]
    pde = c["pde"]
    params = c["init_params"]
    key = c["key"]

    inner_lrs = None
    if cfg.train.load_model_from_expt:
        fname = ckpt.latest_checkpoint(cfg.train.load_model_from_expt)
        if fname:
            state = ckpt.load_checkpoint(fname)
            params = jax.tree_util.tree_map(jnp.asarray, state["params"])
            if state.get("inner_lrs") is not None:
                inner_lrs = jax.tree_util.tree_map(
                    jnp.asarray, state["inner_lrs"]
                )
            log(f"loaded checkpoint {fname}")
            # deployment fine-tunes intentionally change train.* settings;
            # task/model/solver drift is still worth surfacing (a differing
            # task family silently evaluates a different distribution)
            for d in ckpt.config_drift(cfg.train.load_model_from_expt, cfg):
                log(f"note: differs from loaded run's config: {d}")

    if maml_warmup and inner_lrs is not None:
        key, wk = jax.random.split(key)
        params = c["maml_warmup"](wk, params, inner_lrs)
        log("applied MAML warm-up adaptation")

    n_starts = max(1, cfg.deploy.n_starts)
    if n_starts > 1:
        # stack K candidates: candidate 0 is the exact init; 1.. optionally
        # init-jittered; all get independent PRNG streams below
        from .multistart import jitter_leaves

        key, jk = jax.random.split(key)
        jkeys = jax.random.split(jk, n_starts)
        scales = jnp.where(jnp.arange(n_starts) == 0, 0.0, cfg.deploy.jitter)
        params = jax.vmap(lambda k, s: jitter_leaves(k, params, s))(
            jkeys, scales
        )
        opt_state = jax.vmap(c["opt"].init)(params)
        log(f"multi-start fine-tune: {n_starts} candidates, "
            f"jitter={cfg.deploy.jitter}")
    else:
        opt_state = c["opt"].init(params)

    key, gt_key, gt_points_key = jax.random.split(key, 3)
    gt_keys = jax.random.split(gt_key, cfg.task.n_eval)
    gt_params = jax.vmap(pde.sample_params)(gt_keys)
    from .gt_cache import task_cache_extra
    bundle = get_ground_truth(
        pde, gt_params, gt_points_key, cfg.task.validation_points,
        cfg.solver.ground_truth_resolution,
        cache_dir=(os.path.join(cfg.train.out_dir, "gt_cache")
                   if cfg.train.out_dir else None),
        # key = (pde, resolution, gt_version, gt-affecting non-default task
        # fields, gt key) — see gt_cache.task_cache_extra
        cache_extra=task_cache_extra(cfg.task),
        cache_keys=gt_keys,
    )
    validation_fn = make_validation_fn(
        pde, c["make_coef_func"], cfg.task.n_eval,
        num_tsteps=cfg.task.num_tsteps if cfg.task.pde == "td_burgers" else None,
        symmetry=cfg.task.pde == "hyper_elasticity",
    )

    train_step = c["train_step"]
    train_step_many = c["train_step_many"]
    spc = max(1, cfg.train.steps_per_call)

    def _next_boundary(step):
        n = cfg.train.outer_steps - step
        for every in (cfg.train.log_every, cfg.train.checkpoint_every,
                      cfg.train.measure_grad_norm_every):
            if every and every > 0:
                n = min(n, every - step % every)
        return max(1, min(n, spc))

    def _current_best(score_key):
        """(best-candidate params, idx, scores) under multi-start; identity
        otherwise."""
        if n_starts == 1:
            return params, 0, None
        scores = c["ms_scores"](score_key, params)
        idx = int(jnp.argmin(scores))
        best = jax.tree_util.tree_map(lambda x: x[idx], params)
        return best, idx, scores

    step = 0
    while step < cfg.train.outer_steps:
        block = _next_boundary(step) if spc > 1 else 1
        key, subkey = jax.random.split(key)
        with Timer() as t:
            if n_starts > 1:
                subkeys = jax.random.split(subkey, n_starts)
                params, opt_state, loss_k, loss_aux_k, gn_k, losses_all = (
                    c["ms_train_step_many"](subkeys, params, opt_state,
                                            n_steps=block)
                )
                # report the best candidate's loss; NaN in SOME candidates
                # only loses them the selection (scores -> inf)
                best_k = int(jnp.argmin(
                    jnp.where(jnp.isnan(loss_k), jnp.inf, loss_k)
                ))
                loss = loss_k[best_k]
                grad_norm = gn_k[best_k]
                loss_aux = jax.tree_util.tree_map(
                    lambda x: x[best_k], loss_aux_k
                )
                # kept per-candidate so the metrics row can report the
                # SELECTION-best candidate's training stats (the row must
                # describe one candidate, not a mix of two)
                ms_cand = (loss_k, gn_k, loss_aux_k, best_k)
                nan_now = bool(np.all(np.isnan(
                    np.asarray(losses_all)[:, -1]
                )))
            elif block == 1:
                params, opt_state, loss, loss_aux, grad_norm = train_step(
                    subkey, params, opt_state
                )
                nan_now = np.isnan(float(loss))
            else:
                params, opt_state, loss, loss_aux, grad_norm, losses_all = (
                    train_step_many(subkey, params, opt_state, n_steps=block)
                )
                nan_now = bool(np.any(np.isnan(np.asarray(losses_all))))
            jax.block_until_ready(params)
        step_time = t.interval / block
        step += block
        log_step = step - 1

        if nan_now:
            log(f"encountered nan at step {log_step}")
            break

        hit = lambda every: (
            every > 0 and (log_step % every == 0 if spc == 1
                           else step % every == 0)
        )
        # validation cadence: val_every when set, else log_every (val_every
        # was previously dead config; denser validation also densifies
        # best-checkpoint tracking)
        if hit(cfg.train.val_every or cfg.train.log_every):
            key, sk = jax.random.split(key)
            val_params, best_idx, scores = _current_best(sk)
            val = validation_fn(
                val_params, bundle.gt_params, bundle.coords, bundle.gt_vals
            )
            # under multi-start, every stat in this row must describe the
            # same (selection-best) candidate; train-loss-best index is
            # logged separately as ms_train_best_idx
            row_loss, row_gn, row_aux = loss, grad_norm, loss_aux
            if scores is not None:
                loss_k, gn_k, loss_aux_k, best_k = ms_cand
                row_loss = loss_k[best_idx]
                row_gn = gn_k[best_idx]
                row_aux = jax.tree_util.tree_map(
                    lambda x: x[best_idx], loss_aux_k
                )
            ms_txt = (
                "" if scores is None else
                ", ms_best: {}, ms_scores: {}".format(
                    best_idx, [float(s) for s in scores])
            )
            log(
                "step: {}, loss: {}, val_mse: {}, val_rel_err: {}, "
                "grad_norm: {}, time: {}{}".format(
                    log_step, float(row_loss), float(val.mse),
                    float(val.rel_err), float(row_gn), step_time, ms_txt,
                )
            )
            if metrics is not None:
                # diverged candidates score inf; keep metrics.jsonl strict
                # RFC-8259 (no Infinity/NaN tokens) by mapping them to None
                fin = lambda v: float(v) if np.isfinite(float(v)) else None
                extra = {} if scores is None else {
                    "ms_best_idx": best_idx,
                    "ms_train_best_idx": best_k,
                    "ms_score_best": fin(jnp.min(scores)),
                    "ms_score_worst": fin(jnp.max(scores)),
                }
                metrics.log(
                    log_step,
                    loss=row_loss,
                    val_mse=val.mse,
                    val_rel_err=val.rel_err,
                    val_rel_err_std=val.rel_err_std,
                    per_time_step_error=val.t_rel_sq_err,
                    grad_norm=row_gn,
                    step_time=step_time,
                    **{k: fin(v) for k, v in row_aux.items()},
                    **extra,
                )
            if path is not None:
                # best-val state stays durable (quality is not monotone in
                # steps); under multi-start val_params is already the
                # selection-best candidate, so save exactly what was scored
                best_val = (val.rel_err_median
                            if cfg.train.best_metric == "rel_err_median"
                            else val.rel_err)
                ckpt.save_best_checkpoint(
                    path, log_step, float(best_val),
                    {"params": val_params, "prng_key": key},
                )

        if hit(cfg.train.measure_grad_norm_every) and n_starts == 1:
            norms = c["get_grad_norms"](subkey, params)
            log("loss vals and grad norms: ",
                {k: (float(v[0]), float(v[1])) for k, v in norms.items()})

    key, sk = jax.random.split(key)
    final_params, best_idx, scores = _current_best(sk)
    if scores is not None:
        log("multi-start selection: best candidate {} of {}, scores {}".format(
            best_idx, n_starts, [float(s) for s in scores]))
    if path is not None:
        state = {"params": final_params, "prng_key": key}
        if n_starts == 1:
            state["opt_state"] = opt_state
        else:
            state["ms_scores"] = np.asarray(scores)
            state["ms_best_idx"] = best_idx
        ckpt.save_checkpoint(path, step, state)
    return final_params
