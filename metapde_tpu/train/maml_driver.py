"""MAML meta-training driver (reference: src/maml_pde.py:61-472).

Builds the task-loss machinery, the learned per-step inner-LR pytree with its
own Adam, the (optionally mesh-sharded) jitted train step, the ground-truth
validation harness, metrics/checkpointing — and runs the meta-train loop.

Reference semantics preserved:
- total loss = bc_weight * sum(boundary losses) + sum(domain losses)
  (maml_pde.py:76-85).
- inner-LR pytree: congruent to the model, stacked inner_steps deep,
  initialized to ones, meta-optimized by Adam(lr_inner_lr, b2=0.99)
  (maml_pde.py:150-159).
- meta-grad global-norm clip: norm measured on the MODEL part, the scale
  applied to both model and lr grads (maml_pde.py:210-223).
- NaN abort (maml_pde.py:260-262).
- deployment path get_final_model = k-step single_task_rollout with truncated
  lr stacks — one code path for train and inference (maml_pde.py:163-183).
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
from ..parallel.mesh import POINT_AXIS, make_mesh
from ..parallel.sharding import make_sharded_maml_grad_fn
from ..pdes import get_pde
from ..utils import Timer, clip_by_global_norm, global_norm
from . import checkpoints as ckpt
from .metrics import prepare_logging
from .optimizers import get_optimizer
from .validation import get_ground_truth, make_validation_fn


def build(cfg: Config):
    """Construct every pure component of a MAML experiment; returns a dict.

    Kept separate from run() so tests, benchmarks, and __graft_entry__ can
    reuse the exact training computation without the outer loop.
    """
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

    def make_task_loss_fns_factory(pt_sharded: bool):
        """Task loss factory; pt_sharded=True splits the collocation-point
        batch across the mesh's pt axis and pmeans the loss (the PINN
        analogue of sequence parallelism, SURVEY.md section 5)."""

        def make_task_loss_fns(key):
            # The input key is terminal (PRNG discipline, maml_pde.py:88)
            task_params = pde.sample_params(key)

            def point_loss(key, field_params, n):
                # pt-sharded losses are LOCAL to the shard's point subset;
                # the meta engine pmeans losses/grads over pt (maml.py)
                if pt_sharded:
                    key = jax.random.fold_in(
                        key, jax.lax.axis_index(POINT_AXIS)
                    )
                    n = n // n_pt
                pts = pde.sample_points(key, n, task_params)
                return loss_fn(field.bind(field_params), pts, task_params)

            inner_loss = lambda key, fp: point_loss(key, fp, cfg.task.inner_points)
            outer_loss = lambda key, fp: point_loss(key, fp, cfg.task.outer_points)
            return inner_loss, outer_loss

        return make_task_loss_fns

    def _make_maml_def(pt_sharded: bool):
        return maml.MamlDef(
            inner_opt=optax.sgd(cfg.maml.inner_lr),
            make_task_loss_fns=make_task_loss_fns_factory(pt_sharded),
            inner_steps=cfg.maml.inner_steps,
            n_batch_tasks=cfg.maml.bsize,
            softplus_lrs=True,
            outer_loss_decay=cfg.maml.outer_loss_decay,
            inner_grad_clip=cfg.maml.inner_grad_clip,
            remat=cfg.train.remat_inner_steps,
            unroll=cfg.maml.unroll,
            pt_axis=POINT_AXIS if pt_sharded else None,
        )

    maml_def = _make_maml_def(False)

    key = jax.random.PRNGKey(cfg.seed)
    key, init_key = jax.random.split(key)
    init_params = field.init(init_key)

    # learned per-parameter per-step inner lrs (maml_pde.py:151-154)
    inner_lrs = jax.tree_util.tree_map(
        lambda x: jnp.ones((cfg.maml.inner_steps,) + x.shape, x.dtype), init_params
    )

    outer_opt = get_optimizer(cfg.train.optimizer, cfg.maml.outer_lr)
    lr_opt = optax.adam(cfg.maml.lr_inner_lr, b1=0.9, b2=0.99)

    # --- train step ---------------------------------------------------------
    use_mesh = cfg.mesh.n_task_shards > 1 or cfg.mesh.n_point_shards > 1
    if use_mesh:
        mesh = make_mesh(cfg.mesh.n_task_shards, cfg.mesh.n_point_shards)
        grad_fn = make_sharded_maml_grad_fn(_make_maml_def(n_pt > 1), mesh)
    else:
        mesh = None
        grad_fn = jax.jit(
            lambda key, params, lrs: maml.multi_task_grad_and_losses(
                maml_def, key, params, lrs
            )
        )

    def _step_core(key, params, lrs, opt_state, lr_opt_state):
        meta_grad, losses, meta_losses = grad_fn(key, params, lrs)
        model_grad, lr_grad = meta_grad
        # norm on the model part, scale applied to both (maml_pde.py:210-223)
        meta_grad_norm = global_norm(model_grad)
        scale = jnp.where(
            meta_grad_norm > cfg.maml.grad_clip,
            cfg.maml.grad_clip / jnp.maximum(meta_grad_norm, 1e-30),
            1.0,
        )
        model_grad, lr_grad = jax.tree_util.tree_map(
            lambda g: g * scale, (model_grad, lr_grad)
        )
        updates, opt_state = outer_opt.update(model_grad, opt_state, params)
        params = optax.apply_updates(params, updates)
        lr_updates, lr_opt_state = lr_opt.update(lr_grad, lr_opt_state, lrs)
        lrs = optax.apply_updates(lrs, lr_updates)
        return params, lrs, opt_state, lr_opt_state, losses, meta_losses, meta_grad_norm

    train_step = jax.jit(_step_core)

    @partial(jax.jit, static_argnames="n_steps")
    def train_step_many(key, params, lrs, opt_state, lr_opt_state, n_steps):
        """n_steps outer steps as ONE device computation (lax.scan).

        The per-step host round trip dominates wall clock for this model
        size (step ~0.7 ms on a v5e chip vs ~45 ms of dispatch + sync
        latency); batching outer steps on device recovers the 60x. Returns
        the final state, the LAST step's loss detail, and the per-step
        meta-loss means for logging/NaN checks.
        """
        def body(carry, k):
            p, l, o, lo = carry
            p, l, o, lo, losses, meta_losses, gn = _step_core(k, p, l, o, lo)
            return (p, l, o, lo), (jnp.mean(meta_losses[0]), losses,
                                   meta_losses, gn)

        keys = jax.random.split(key, n_steps)
        carry, (ml_means, losses_s, meta_losses_s, gns) = jax.lax.scan(
            body, (params, lrs, opt_state, lr_opt_state), keys
        )
        params, lrs, opt_state, lr_opt_state = carry
        losses_last, meta_losses_last = jax.tree_util.tree_map(
            lambda x: x[-1], (losses_s, meta_losses_s)
        )
        return (params, lrs, opt_state, lr_opt_state, losses_last,
                meta_losses_last, gns[-1], ml_means)

    # --- deployment / validation -------------------------------------------
    def get_final_model(key, model_and_lrs, task_params, inner_steps: int):
        """k-step adaptation from the meta-learned init (maml_pde.py:163-183)."""
        params, lrs = model_and_lrs
        if inner_steps == 0:
            return params
        k1, k2 = jax.random.split(key, 2)
        pts = pde.sample_points(k1, cfg.task.inner_points, task_params)
        inner_loss_fn = lambda key, fp: loss_fn(
            field.bind(fp), pts, task_params
        )
        # k <= trained steps: truncate the learned-LR stack (reference
        # maml_pde.py:163-183). k > trained steps: extend it by repeating
        # the final step's LRs — deployment can then spend a larger
        # adaptation budget than meta-training unrolled.
        def _take_k(x):
            if inner_steps <= x.shape[0]:
                return x[:inner_steps]
            pad = jnp.broadcast_to(
                x[-1], (inner_steps - x.shape[0],) + x.shape[1:]
            )
            return jnp.concatenate([x, pad], axis=0)

        lrs_k = jax.tree_util.tree_map(_take_k, lrs)
        temp_def = maml_def._replace(inner_steps=inner_steps)
        final_params, _ = maml.single_task_rollout(
            temp_def, k2, params, inner_loss_fn, lrs_k
        )
        return final_params

    # deployment path selection: the learned-LR rollout above (the MAML
    # protocol) or, with cfg.deploy.optimizer set, k steps of a fresh
    # first-order optimizer (the reference's fine-tune deployment protocol,
    # train/deploy.py). Training-time validation keeps the learned-LR path
    # unless the config says otherwise (deploy.optimizer defaults "").
    deploy_final_model = get_final_model
    if cfg.deploy.optimizer:
        from .deploy import make_opt_final_model

        deploy_final_model = make_opt_final_model(
            pde, loss_fn, field, cfg.task, cfg.deploy, model_is_pair=True
        )

    # multi-start deployment (cfg.deploy.n_starts > 1): K vmapped rollouts,
    # keep the argmin of the self-computable total loss (train/multistart.py)
    if cfg.deploy.n_starts > 1:
        from . import multistart as ms

        score_fn = ms.make_score_fn(
            pde, loss_fn, field,
            cfg.deploy.score_points or cfg.task.validation_points,
        )
        # jitter only the model params, never the learned inner-LR pytree
        jitter_fn = lambda k, m, s: (ms.jitter_leaves(k, m[0], s), m[1])
        deploy_final_model = ms.wrap_get_final_model(
            deploy_final_model, score_fn, cfg.deploy.n_starts,
            jitter=cfg.deploy.jitter, jitter_fn=jitter_fn,
        )

    def make_coef_func(key, model_and_lrs, task_params, coords,
                       inner_steps: Optional[int] = None):
        k = maml_def.inner_steps if inner_steps is None else inner_steps
        final_params = deploy_final_model(key, model_and_lrs, task_params, k)
        return jnp.squeeze(field.apply_inference(final_params, coords))

    @jax.jit
    def validation_losses(params, lrs):
        _, losses, meta_losses = maml.multi_task_grad_and_losses(
            maml_def, jax.random.PRNGKey(0), params, lrs
        )
        return losses, meta_losses

    return dict(
        pde=pde,
        field=field,
        model_cfg=model_cfg,
        maml_def=maml_def,
        loss_fn=loss_fn,
        init_params=init_params,
        inner_lrs=inner_lrs,
        outer_opt=outer_opt,
        lr_opt=lr_opt,
        train_step=train_step,
        train_step_many=train_step_many,
        get_final_model=get_final_model,
        deploy_final_model=deploy_final_model,
        make_coef_func=make_coef_func,
        validation_losses=validation_losses,
        mesh=mesh,
        key=key,
    )


def _render_viz(path, cfg, pde, c, model_and_lrs, bundle, step):
    """Ground-truth comparison plots every viz_every steps
    (reference maml_pde.py:404-433)."""
    from ..utils.trees import tree_unstack
    from . import viz

    try:
        gts_list = list(bundle.gts)
        params_list = tree_unstack(bundle.gt_params)
        field = c["field"]
        if cfg.task.pde == "td_burgers":
            viz.plot_burgers_time_series(
                path, pde, model_and_lrs, gts_list[0], params_list[0],
                lambda k, m, p, s: c["get_final_model"](k, m, p, s),
                cfg.maml.inner_steps,
                lambda p, x: field.apply(p, x), step=step,
            )
        else:
            dom = cfg.task.domain
            viz.compare_plots_with_ground_truth(
                path, pde, model_and_lrs, gts_list, params_list,
                lambda k, m, p, s: c["get_final_model"](k, m, p, s),
                inner_steps_list=(0, cfg.maml.inner_steps),
                bounds=(dom.xmin, dom.xmax, dom.ymin, dom.ymax),
                field_apply=lambda p, x: field.apply(p, x), step=step,
            )
    except Exception as e:  # viz must never kill training
        print(f"viz failed at step {step}: {e}")


def run(cfg: Config):
    """Full meta-training loop (reference main, maml_pde.py:61-439)."""
    out_dir = cfg.train.out_dir or f"{cfg.task.pde}_maml_results"
    path, log, metrics = prepare_logging(out_dir, cfg.train.expt_name)
    log(cfg.to_json())
    if path is not None:
        with open(f"{path}/config.json", "w") as f:
            f.write(cfg.to_json())

    c = build(cfg)
    pde, field = c["pde"], c["field"]
    params, inner_lrs = c["init_params"], c["inner_lrs"]
    key = c["key"]

    resume_step = 0
    resume_state = None
    if cfg.train.load_model_from_expt:
        fname = ckpt.latest_checkpoint(cfg.train.load_model_from_expt)
        if fname:
            state = ckpt.load_checkpoint(fname)
            params = jax.tree_util.tree_map(jnp.asarray, state["params"])
            if state.get("inner_lrs") is not None:
                inner_lrs = jax.tree_util.tree_map(
                    jnp.asarray, state["inner_lrs"]
                )
            resume_state = state
            log(f"loaded checkpoint {fname}")
            for d in ckpt.config_drift(cfg.train.load_model_from_expt, cfg):
                log(f"WARNING: config drift vs loaded run: {d}")

    opt_state = c["outer_opt"].init(params)
    lr_opt_state = c["lr_opt"].init(inner_lrs)
    if resume_state is not None and resume_state.get("opt_state") is not None:
        # elastic resume: restore optimizer states, PRNG, and step count so
        # a watchdog relaunch continues the same trajectory (the reference
        # restarts Adam fresh and rewinds to step 0, maml_pde.py:126-141)
        try:
            opt_state = jax.tree_util.tree_map(
                jnp.asarray, resume_state["opt_state"]
            )
            if resume_state.get("lr_opt_state") is not None:
                lr_opt_state = jax.tree_util.tree_map(
                    jnp.asarray, resume_state["lr_opt_state"]
                )
            if resume_state.get("prng_key") is not None:
                key = jnp.asarray(resume_state["prng_key"])
            resume_step = int(resume_state.get("step", 0)) + 1
            log(f"resuming optimizer state at step {resume_step}")
        except Exception as e:  # config drift: fall back to fresh opt
            log(f"could not resume optimizer state ({e}); fresh optimizers")

    # ground truth (once, on device — reference does this on CPU via FEniCS).
    # Eval-task keys are PINNED across resumes: they ride in the checkpoint,
    # so val_rel_err stays comparable along a continuation chain. Deriving
    # them from the restored PRNG stream (the old behavior) re-rolled the
    # eval task set at every resume — which is how the em5 200k->270k
    # regression stayed invisible to training-val (RESULTS.md round 2).
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
        # fields, gt key): the key bytes pin WHICH task was drawn, and
        # task_cache_extra pins the sample_params/solve semantics that the
        # key bytes alone do not capture (gt_cache.py)
        cache_extra=task_cache_extra(cfg.task),
        cache_keys=gt_keys,
    )

    # Branch-aware validation (cfg.train.branch_aware_val; VERDICT r4 item
    # 5): compute each eval task's oracle domain energy ONCE through the MC
    # estimator on fixed audit points, and per validation call compare the
    # adapted model's energy on the same points — flagged tasks (energy
    # parity + high rel err = different legitimate solution branch) are
    # excluded from rel_err_branch so elasticity val curves separate
    # optimization error from branch roulette in-stream (train/energy.py).
    branch_kwargs = {}
    if cfg.train.branch_aware_val:
        from .energy import make_branch_kwargs

        branch_kwargs = make_branch_kwargs(
            pde, bundle, c["deploy_final_model"], c["field"],
            cfg.maml.inner_steps, cfg.task.validation_points,
        )
        log(f"branch-aware validation on: oracle energies "
            f"{[round(float(e), 5) for e in branch_kwargs['oracle_energy']]}")

    validation_fn = make_validation_fn(
        pde,
        partial(c["make_coef_func"], inner_steps=cfg.maml.inner_steps),
        cfg.task.n_eval,
        num_tsteps=cfg.task.num_tsteps if cfg.task.pde == "td_burgers" else None,
        symmetry=cfg.task.pde == "hyper_elasticity",
        **branch_kwargs,
    )

    train_step = c["train_step"]
    train_step_many = c["train_step_many"]
    spc = max(1, cfg.train.steps_per_call)

    def _next_boundary(step):
        """Steps until the next log/viz/checkpoint boundary or the end."""
        n = cfg.train.outer_steps - step
        for every in (cfg.train.log_every, cfg.train.viz_every,
                      cfg.train.checkpoint_every):
            if every and every > 0:
                n = min(n, every - step % every)
        return max(1, min(n, spc))

    profiling = False
    step = resume_step
    it = 0
    while step < cfg.train.outer_steps:
        if cfg.train.profile_dir and it == 1:  # skip the compile iteration
            jax.profiler.start_trace(cfg.train.profile_dir)
            profiling = True
        if profiling and it == 1 + cfg.train.profile_steps:
            jax.profiler.stop_trace()
            profiling = False
            log(f"wrote profiler trace to {cfg.train.profile_dir}")
        it += 1
        block = _next_boundary(step) if spc > 1 else 1
        key, subkey = jax.random.split(key)
        with Timer() as t:
            if block == 1:
                (params, inner_lrs, opt_state, lr_opt_state, losses,
                 meta_losses, meta_grad_norm) = train_step(
                    subkey, params, inner_lrs, opt_state, lr_opt_state
                )
                ml_means = None
            else:
                (params, inner_lrs, opt_state, lr_opt_state, losses,
                 meta_losses, meta_grad_norm, ml_means) = train_step_many(
                    subkey, params, inner_lrs, opt_state, lr_opt_state,
                    n_steps=block,
                )
            jax.block_until_ready(params)
        step_time = t.interval / block
        step += block
        # log/metrics below report the LAST completed step of the block,
        # matching the reference's per-step log cadence
        log_step = step - 1

        nan_now = (
            np.isnan(np.mean(np.asarray(meta_losses[0])))
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
        # 0 = ride log_every. Denser validation densifies best-checkpoint
        # tracking at ~one extra deploy rollout per hit.
        if hit(cfg.train.val_every or cfg.train.log_every):
            with Timer() as deploy_timer:
                val = validation_fn(
                    (params, inner_lrs), bundle.gt_params, bundle.coords,
                    bundle.gt_vals,
                )
                jax.block_until_ready(val.mse)
            deployment_time = deploy_timer.interval / cfg.task.n_eval

            val_losses, val_meta_losses = c["validation_losses"](params, inner_lrs)

            log(
                "step: {}, meta_loss: {}, val_meta_loss: {}, val_mse: {}, "
                "val_rel_err: {}, val_rel_err_std: {}, deployment_time: {}, "
                "meta_grad_norm: {}, time: {}".format(
                    log_step,
                    np.mean(np.asarray(meta_losses[0])),
                    np.mean(np.asarray(val_meta_losses[0])),
                    float(val.mse),
                    float(val.rel_err),
                    float(val.rel_err_std),
                    deployment_time,
                    float(meta_grad_norm),
                    step_time,
                )
            )
            if metrics is not None:
                metrics.log(
                    log_step,
                    meta_loss=np.mean(np.asarray(meta_losses[0])),
                    val_meta_loss=np.mean(np.asarray(val_meta_losses[0])),
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
                # meta-training quality is not monotone in steps (measured
                # em5 regression, RESULTS.md); keep the best-val state
                # durable. save_best_checkpoint no-ops unless improved.
                best_val = {
                    "rel_err_median": val.rel_err_median,
                    # energy-gated mean (requires branch_aware_val; falls
                    # back to the plain mean when the audit is off)
                    "rel_err_branch": (val.rel_err_branch
                                       if val.rel_err_branch is not None
                                       else val.rel_err),
                }.get(cfg.train.best_metric, val.rel_err)
                ckpt.save_best_checkpoint(path, log_step, float(best_val), {
                    "params": params, "inner_lrs": inner_lrs,
                    "opt_state": opt_state, "lr_opt_state": lr_opt_state,
                    "prng_key": key, "gt_key": gt_key,
                    "gt_points_key": gt_points_key,
                })

        if path is not None and hit(cfg.train.viz_every):
            _render_viz(path, cfg, pde, c, (params, inner_lrs), bundle,
                        log_step)

        if path is not None and step > 1 and hit(cfg.train.checkpoint_every):
            ckpt.save_checkpoint(path, log_step, {
                "params": params, "inner_lrs": inner_lrs,
                "opt_state": opt_state, "lr_opt_state": lr_opt_state,
                "prng_key": key, "gt_key": gt_key,
                "gt_points_key": gt_points_key,
            })

    if profiling:
        jax.profiler.stop_trace()
    if path is not None:
        ckpt.save_checkpoint(path, step, {
            "params": params, "inner_lrs": inner_lrs,
            "opt_state": opt_state, "lr_opt_state": lr_opt_state,
            "prng_key": key, "gt_key": gt_key,
            "gt_points_key": gt_points_key,
        })
    return params, inner_lrs
