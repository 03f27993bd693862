"""LEAP meta-training driver (reference: src/leap_pde.py:51-399).

Same shape as the MAML driver with the reference's differences preserved:
- single task loss fn (no inner/outer split), Adam inner optimizer
  (leap_pde.py:87), no learned LRs.
- first-order meta-gradient: the LEAP accumulator rides the scan carry, so
  memory is independent of inner_steps (60-80 in the paper configs).
- norm / loss_in_distance / stabilize all on (leap_pde.py:89-97).
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
from ..meta import leap
from ..models import make_field
from ..parallel.mesh import POINT_AXIS, make_mesh
from ..parallel.sharding import make_sharded_leap_grad_fn
from ..pdes import get_pde
from ..utils import Timer, global_norm
from . import checkpoints as ckpt
from .metrics import prepare_logging
from .optimizers import get_optimizer
from .validation import get_ground_truth, make_validation_fn


def build(cfg: Config):
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

    n_pt = cfg.mesh.n_point_shards

    def make_task_loss_fn_factory(pt_sharded: bool):
        def make_task_loss_fn(key):
            task_params = pde.sample_params(key)

            def task_loss(key, field_params):
                n = cfg.task.inner_points
                if pt_sharded:
                    key = jax.random.fold_in(key, jax.lax.axis_index(POINT_AXIS))
                    n = n // n_pt
                pts = pde.sample_points(key, n, task_params)
                return loss_fn(field.bind(field_params), pts, task_params)

            return task_loss

        return make_task_loss_fn

    def _make_leap_def(pt_sharded: bool):
        return leap.LeapDef(
            inner_opt=optax.adam(cfg.leap.inner_lr, b1=0.9, b2=0.99),
            make_task_loss_fn=make_task_loss_fn_factory(pt_sharded),
            inner_steps=cfg.leap.inner_steps,
            n_batch_tasks=cfg.leap.bsize,
            norm=cfg.leap.norm,
            loss_in_distance=cfg.leap.loss_in_distance,
            stabilize=cfg.leap.stabilize,
            inner_grad_clip=cfg.leap.inner_grad_clip,
            pt_axis=POINT_AXIS if pt_sharded else None,
        )

    leap_def = _make_leap_def(False)

    key = jax.random.PRNGKey(cfg.seed)
    key, init_key = jax.random.split(key)
    init_params = field.init(init_key)

    outer_opt = get_optimizer(cfg.train.optimizer, cfg.leap.outer_lr)

    use_mesh = cfg.mesh.n_task_shards > 1 or cfg.mesh.n_point_shards > 1
    if use_mesh:
        mesh = make_mesh(cfg.mesh.n_task_shards, cfg.mesh.n_point_shards)
        grad_fn = make_sharded_leap_grad_fn(_make_leap_def(n_pt > 1), mesh)
    else:
        mesh = None
        grad_fn = jax.jit(
            lambda key, params: leap.multi_task_grad_and_losses(
                leap_def, key, params
            )
        )

    def _step_core(key, params, opt_state):
        meta_grad, losses = grad_fn(key, params)
        meta_grad_norm = global_norm(meta_grad)
        scale = jnp.where(
            meta_grad_norm > cfg.leap.grad_clip,
            cfg.leap.grad_clip / jnp.maximum(meta_grad_norm, 1e-30),
            1.0,
        )
        meta_grad = jax.tree_util.tree_map(lambda g: g * scale, meta_grad)
        updates, opt_state = outer_opt.update(meta_grad, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, losses, meta_grad_norm

    train_step = jax.jit(_step_core)

    @partial(jax.jit, static_argnames="n_steps")
    def train_step_many(key, params, opt_state, n_steps):
        """n_steps outer steps as one device computation (see the MAML
        driver's train_step_many for rationale)."""
        def body(carry, k):
            p, o = carry
            p, o, losses, gn = _step_core(k, p, o)
            return (p, o), (jnp.mean(losses[:, -1]), losses, gn)

        keys = jax.random.split(key, n_steps)
        (params, opt_state), (ml_means, losses_s, gns) = jax.lax.scan(
            body, (params, opt_state), keys
        )
        return params, opt_state, losses_s[-1], gns[-1], ml_means

    def get_final_model(key, params, task_params, inner_steps: int):
        """k-step Adam adaptation from the init (leap_pde.py:140-156)."""
        if inner_steps == 0:
            return params
        task_loss = leap_def.make_task_loss_fn  # build from params directly

        def loss_for_task(key, fp):
            pts = pde.sample_points(key, cfg.task.inner_points, task_params)
            return loss_fn(field.bind(fp), pts, task_params)

        temp_def = leap_def._replace(inner_steps=inner_steps)
        final_params, _, _ = leap.single_task_rollout(
            temp_def, key, params, loss_for_task
        )
        return final_params

    # deployment path selection: LEAP's own inner-optimizer rollout above,
    # or k steps of a fresh optimizer at deploy.inner_lr (train/deploy.py,
    # the reference's nn_pde fine-tune protocol) when deploy.optimizer set
    deploy_final_model = get_final_model
    if cfg.deploy.optimizer:
        from .deploy import make_opt_final_model

        deploy_final_model = make_opt_final_model(
            pde, loss_fn, field, cfg.task, cfg.deploy, model_is_pair=False
        )

    # multi-start deployment (cfg.deploy.n_starts > 1): K vmapped rollouts,
    # keep the argmin of the self-computable total loss (train/multistart.py)
    if cfg.deploy.n_starts > 1:
        from . import multistart as ms

        score_fn = ms.make_score_fn(
            pde, loss_fn, field,
            cfg.deploy.score_points or cfg.task.validation_points,
        )
        deploy_final_model = ms.wrap_get_final_model(
            deploy_final_model, score_fn, cfg.deploy.n_starts,
            jitter=cfg.deploy.jitter, jitter_fn=ms.jitter_leaves,
        )

    def make_coef_func(key, params, task_params, coords,
                       inner_steps: Optional[int] = None):
        k = leap_def.inner_steps if inner_steps is None else inner_steps
        final_params = deploy_final_model(key, params, task_params, k)
        return jnp.squeeze(field.apply_inference(final_params, coords))

    @jax.jit
    def validation_losses(params):
        _, losses = leap.multi_task_grad_and_losses(
            leap_def, jax.random.PRNGKey(0), params
        )
        return losses

    return dict(
        pde=pde,
        field=field,
        model_cfg=model_cfg,
        leap_def=leap_def,
        loss_fn=loss_fn,
        init_params=init_params,
        outer_opt=outer_opt,
        train_step=train_step,
        train_step_many=train_step_many,
        get_final_model=get_final_model,
        deploy_final_model=deploy_final_model,
        make_coef_func=make_coef_func,
        validation_losses=validation_losses,
        mesh=mesh,
        key=key,
    )


def run(cfg: Config):
    out_dir = cfg.train.out_dir or f"{cfg.task.pde}_leap_results"
    path, log, metrics = prepare_logging(out_dir, cfg.train.expt_name)
    log(cfg.to_json())
    if path is not None:
        with open(f"{path}/config.json", "w") as f:
            f.write(cfg.to_json())

    c = build(cfg)
    pde = c["pde"]
    params = c["init_params"]
    key = c["key"]

    resume_step = 0
    resume_state = None
    if cfg.train.load_model_from_expt:
        fname = ckpt.latest_checkpoint(cfg.train.load_model_from_expt)
        if fname:
            state = ckpt.load_checkpoint(fname)
            params = jax.tree_util.tree_map(jnp.asarray, state["params"])
            resume_state = state
            log(f"loaded checkpoint {fname}")
            for d in ckpt.config_drift(cfg.train.load_model_from_expt, cfg):
                log(f"WARNING: config drift vs loaded run: {d}")

    opt_state = c["outer_opt"].init(params)
    if resume_state is not None and resume_state.get("opt_state") is not None:
        # elastic resume (see maml_driver.run)
        try:
            opt_state = jax.tree_util.tree_map(
                jnp.asarray, resume_state["opt_state"]
            )
            if resume_state.get("prng_key") is not None:
                key = jnp.asarray(resume_state["prng_key"])
            resume_step = int(resume_state.get("step", 0)) + 1
            log(f"resuming optimizer state at step {resume_step}")
        except Exception as e:
            log(f"could not resume optimizer state ({e}); fresh optimizer")

    # eval-task keys ride in the checkpoint so the eval task set (and hence
    # val_rel_err) is pinned across resume chains (see maml_driver.run)
    if resume_state is not None and resume_state.get("gt_key") is not None:
        gt_key = jnp.asarray(resume_state["gt_key"])
        gt_points_key = jnp.asarray(resume_state["gt_points_key"])
        log("pinned eval tasks from checkpoint gt_key")
    else:
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
    # branch-aware validation (cfg.train.branch_aware_val): energy-gated
    # rel err — see maml_driver + train/energy.py; elasticity LEAP shares
    # the post-buckling branch-roulette hazard
    branch_kwargs = {}
    if cfg.train.branch_aware_val:
        from .energy import make_branch_kwargs

        branch_kwargs = make_branch_kwargs(
            pde, bundle, c["deploy_final_model"], c["field"],
            cfg.leap.inner_steps, cfg.task.validation_points,
        )
        log(f"branch-aware validation on: oracle energies "
            f"{[round(float(e), 5) for e in branch_kwargs['oracle_energy']]}")

    validation_fn = make_validation_fn(
        pde,
        partial(c["make_coef_func"], inner_steps=cfg.leap.inner_steps),
        cfg.task.n_eval,
        num_tsteps=cfg.task.num_tsteps if cfg.task.pde == "td_burgers" else None,
        symmetry=cfg.task.pde == "hyper_elasticity",
        **branch_kwargs,
    )

    train_step = c["train_step"]
    train_step_many = c["train_step_many"]
    spc = max(1, cfg.train.steps_per_call)

    def _next_boundary(step):
        n = cfg.train.outer_steps - step
        for every in (cfg.train.log_every, cfg.train.checkpoint_every):
            if every and every > 0:
                n = min(n, every - step % every)
        return max(1, min(n, spc))

    step = resume_step
    while step < cfg.train.outer_steps:
        block = _next_boundary(step) if spc > 1 else 1
        key, subkey = jax.random.split(key)
        with Timer() as t:
            if block == 1:
                params, opt_state, losses, meta_grad_norm = train_step(
                    subkey, params, opt_state
                )
                ml_means = None
            else:
                params, opt_state, losses, meta_grad_norm, ml_means = (
                    train_step_many(subkey, params, opt_state, n_steps=block)
                )
            jax.block_until_ready(params)
        step_time = t.interval / block
        step += block
        log_step = step - 1

        nan_now = (
            np.isnan(np.mean(np.asarray(losses)))
            if ml_means is None else bool(np.any(np.isnan(ml_means)))
        )
        if nan_now:
            log(f"encountered nan at step {log_step}")
            break

        hit = lambda every: (
            every > 0 and (log_step % every == 0 if spc == 1
                           else step % every == 0)
        )
        # val_every, when set, overrides log_every for this whole block
        # (validation + log line + metrics + best-checkpoint tracking);
        # 0 = ride log_every.
        if hit(cfg.train.val_every or cfg.train.log_every):
            with Timer() as deploy_timer:
                val = validation_fn(
                    params, bundle.gt_params, bundle.coords, bundle.gt_vals
                )
                jax.block_until_ready(val.mse)
            deployment_time = deploy_timer.interval / cfg.task.n_eval

            val_losses = c["validation_losses"](params)
            log(
                "step: {}, meta_loss: {}, val_meta_loss: {}, val_mse: {}, "
                "val_rel_err: {}, val_rel_err_std: {}, deployment_time: {}, "
                "meta_grad_norm: {}, time: {}".format(
                    log_step,
                    np.mean(np.asarray(losses)[:, -1]),
                    np.mean(np.asarray(val_losses)[:, -1]),
                    float(val.mse), float(val.rel_err), float(val.rel_err_std),
                    deployment_time, float(meta_grad_norm), step_time,
                )
            )
            if metrics is not None:
                metrics.log(
                    log_step,
                    meta_loss=np.mean(np.asarray(losses)[:, -1]),
                    val_meta_loss=np.mean(np.asarray(val_losses)[:, -1]),
                    val_mse=val.mse,
                    val_rel_err=val.rel_err,
                    val_rel_err_std=val.rel_err_std,
                    val_rel_err_median=val.rel_err_median,
                    per_dim_rel_err=val.per_dim_rel_err,
                    per_time_step_error=val.t_rel_sq_err,
                    deployment_time=deployment_time,
                    meta_grad_norm=meta_grad_norm,
                    step_time=step_time,
                    per_step_losses=np.mean(np.asarray(losses), axis=0),
                    **({} if val.rel_err_branch is None else dict(
                        val_rel_err_branch=val.rel_err_branch,
                        val_branch_flags=val.branch_flags,
                        val_branch_mask=np.asarray(
                            val.branch_mask).astype(int),
                    )),
                )
            if path is not None:
                # best-val state stays durable (quality is not monotone in
                # steps — see checkpoints.save_best_checkpoint)
                best_val = {
                    "rel_err_median": val.rel_err_median,
                    "rel_err_branch": (val.rel_err_branch
                                       if val.rel_err_branch is not None
                                       else val.rel_err),
                }.get(cfg.train.best_metric, val.rel_err)
                ckpt.save_best_checkpoint(path, log_step, float(best_val), {
                    "params": params, "opt_state": opt_state, "prng_key": key,
                    "gt_key": gt_key, "gt_points_key": gt_points_key,
                })

        if path is not None and step > 1 and hit(cfg.train.checkpoint_every):
            ckpt.save_checkpoint(path, log_step, {
                "params": params, "opt_state": opt_state, "prng_key": key,
                "gt_key": gt_key, "gt_points_key": gt_points_key,
            })

    if path is not None:
        ckpt.save_checkpoint(path, step, {
            "params": params, "opt_state": opt_state, "prng_key": key,
            "gt_key": gt_key, "gt_points_key": gt_points_key,
        })
    return params
