"""Deployment benchmark: accuracy vs wall time for k-step adaptation.

The product-facing path of the framework (reference SURVEY section 3.5:
get_final_model k-step rollout timed as deployment_time,
maml_pde.py:163-193,265-271, and the paper's accuracy-vs-time curves that
pipeline/pipeline_poisson_{maml,leap}.sh measure by fine-tune sweeps):
load a meta-learned checkpoint, then for each k in --inner-steps-list
adapt to n_eval FRESH tasks with k inner steps and report wall time per
task and rel error vs the on-device FEM/FV ground truth.

    python -m metapde_tpu.cli.deploy_bench --algo=maml \
        --train.load_model_from_expt=results_poisson_maml/tpu_run5 \
        --inner-steps-list=0,1,2,5,10,20 --task.n_eval=8

Writes deploy_bench<suffix>.jsonl (one line per k) into the checkpoint
dir and prints the table to stdout, where <suffix> is
``[_<deploy.optimizer>][_<compute_dtype>]_n<n_eval>[_best]`` — e.g. the
default protocol on an 8-task draw from the best checkpoint lands at
``deploy_bench_n8_best.jsonl``. Plain ``deploy_bench.jsonl`` files in
committed run dirs are frozen legacy rows from before the suffix scheme
(they mix 4- and 8-task draws and carry no n_eval field); new runs never
write them. Timing uses a device->host fetch as the barrier (see
RESULTS.md timing-methodology note).
"""

import json
import os
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config, parse_overrides
from ..train import checkpoints as ckpt
from ..train import leap_driver, maml_driver
from ..train.validation import get_ground_truth, make_validation_fn
from ..utils.trees import tree_unstack


from ..train.energy import domain_energy, gt_field

_gt_field = gt_field  # canonical home is train/energy.py (also used by
                      # branch-aware training validation, maml_driver)


def _domain_energy(pde, field_fn, points, task_params):
    """Host-float wrapper over train.energy.domain_energy."""
    return float(domain_energy(pde, field_fn, points, task_params))


def run(cfg: Config, algo: str = "maml", inner_steps_list=(0, 1, 2, 5, 10, 20),
        repeats: int = 3, which: str = "latest", energy_audit: bool = False):
    driver = maml_driver if algo == "maml" else leap_driver
    c = driver.build(cfg)
    pde = c["pde"]

    expt = cfg.train.load_model_from_expt
    if not expt:
        raise SystemExit("--train.load_model_from_expt is required")
    # --checkpoint=best benches the best-validation state the training run
    # tracked (checkpoints.save_best_checkpoint) — meta-training quality is
    # not monotone in steps; falls back to latest when no best exists
    fname = None
    resolved_best = False
    if which == "best":
        fname = ckpt.best_checkpoint(expt)
        resolved_best = fname is not None
        if not fname:
            print("no checkpoint_best.pickle; falling back to latest")
    fname = fname or ckpt.latest_checkpoint(expt)
    if not fname:
        raise SystemExit(f"no checkpoint under {expt}")
    state = ckpt.load_checkpoint(fname)
    params = jax.tree_util.tree_map(jnp.asarray, state["params"])
    if algo == "maml":
        lrs = jax.tree_util.tree_map(
            jnp.asarray, state.get("inner_lrs", c["inner_lrs"])
        )
        model = (params, lrs)
    else:
        model = params
    print(f"loaded {fname}")

    key = jax.random.PRNGKey(cfg.seed + 7919)  # fresh, unseen tasks
    key, gt_key, pts_key = jax.random.split(key, 3)
    gt_keys = jax.random.split(gt_key, cfg.task.n_eval)
    gt_params = jax.vmap(pde.sample_params)(gt_keys)
    # cache next to the meta run (results_<family>/gt_cache), keyed on the
    # PRNG key bytes: deterministic from cfg.seed, so a CPU process can
    # pre-warm these solves for a TPU bench (see train/gt_cache.py).
    # The key bytes pin WHICH task key was drawn but NOT what
    # sample_params/solve make of it — that depends on gt-affecting
    # TaskConfig fields (max_reynolds, burgers_gt_solver, vary_*, ...), and
    # this family-level cache dir is shared across experiments, so those
    # fields must enter the key too (gt_cache.task_cache_extra; only
    # non-default fields are hashed, so growing TaskConfig still never
    # invalidates existing caches — the round-14 incident).
    from ..train.gt_cache import task_cache_extra
    bundle = get_ground_truth(
        pde, gt_params, pts_key, cfg.task.validation_points,
        cfg.solver.ground_truth_resolution,
        cache_dir=os.path.join(os.path.dirname(expt.rstrip("/")) or ".",
                               "gt_cache"),
        cache_extra=task_cache_extra(cfg.task),
        cache_keys=gt_keys,
    )

    # oracle-free quality signal: the self-computable total task loss of the
    # deployed model (bc_weight * boundary + domain; for hyperelasticity the
    # neo-Hookean energy + BC penalty) on a fixed fresh point draw. This is
    # the multi-start selection objective (train/multistart.py) reported as
    # a bench column — it flags optimization-multi-stability tails (basin
    # misconvergence) WITHOUT a ground-truth solve.
    from ..train.multistart import make_score_fn

    score_fn = make_score_fn(
        pde, c["loss_fn"], c["field"],
        cfg.deploy.score_points or cfg.task.validation_points,
    )

    def make_self_loss_fn(k):
        @jax.jit
        def self_losses(model, gt_params):
            keys = jax.random.split(jax.random.PRNGKey(0), cfg.task.n_eval)
            sk = jax.random.PRNGKey(1)

            def one(key, tp):
                fp = c["deploy_final_model"](key, model, tp, int(k))
                return score_fn(sk, fp, tp)

            return jax.vmap(one)(keys, gt_params)

        return self_losses

    # --energy_audit: per-task MC domain energy of the oracle field, shared
    # points per task. A deployed model whose energy is AT OR BELOW the
    # oracle's through the same estimator while val_rel_err stays large is
    # on a different legitimate solution branch (post-buckling
    # multistability), not under-optimized — measured on the seed-1
    # elasticity tail (RESULTS.md round-2 branch non-identifiability).
    audit_pts, oracle_E = None, None
    if energy_audit:
        gt_params_list = tree_unstack(bundle.gt_params)
        audit_pts = [
            pde.sample_points(jax.random.PRNGKey(31 + i),
                              cfg.task.validation_points, tp)
            for i, tp in enumerate(gt_params_list)
        ]
        oracle_E = [
            _domain_energy(pde, _gt_field(pde, g), p, tp)
            for g, p, tp in zip(bundle.gts, audit_pts, gt_params_list)
        ]

    rows = []
    for k in inner_steps_list:
        val_fn = make_validation_fn(
            pde, partial(c["make_coef_func"], inner_steps=int(k)),
            cfg.task.n_eval,
            num_tsteps=(cfg.task.num_tsteps
                        if cfg.task.pde == "td_burgers" else None),
            symmetry=cfg.task.pde == "hyper_elasticity",
        )
        val = val_fn(model, bundle.gt_params, bundle.coords, bundle.gt_vals)
        _ = float(val.mse)  # warmup/compile + barrier

        t0 = time.perf_counter()
        for _ in range(repeats):
            val = val_fn(model, bundle.gt_params, bundle.coords,
                         bundle.gt_vals)
            _ = float(val.mse)  # host fetch = hard barrier
        dt = (time.perf_counter() - t0) / repeats
        self_losses = np.asarray(make_self_loss_fn(k)(model,
                                                      bundle.gt_params))
        audit_cols = {}
        if energy_audit:
            keys_a = jax.random.split(jax.random.PRNGKey(0), cfg.task.n_eval)
            model_E = []
            for i, (tp, p) in enumerate(zip(tree_unstack(bundle.gt_params),
                                            audit_pts)):
                fp = c["deploy_final_model"](keys_a[i], model, tp, int(k))
                model_E.append(
                    _domain_energy(pde, c["field"].bind(fp), p, tp))
            audit_cols = {
                "model_energy": model_E,
                "oracle_energy_mc": oracle_E,
                # tasks where the model matches/beats the oracle's sampled
                # energy (within 2%): rel_err there measures branch
                # disagreement, not solution quality
                "energy_parity_tasks": int(sum(
                    m <= o * 1.02 for m, o in zip(model_E, oracle_E))),
            }
        row = {
            "inner_steps": int(k),
            "n_eval": int(cfg.task.n_eval),
            "checkpoint": os.path.basename(fname),
            "checkpoint_step": int(state.get("step", -1)),
            # multi-start deployment (train/multistart.py) composes through
            # make_coef_func; record the config so rows are self-describing
            **({"n_starts": cfg.deploy.n_starts,
                "jitter": cfg.deploy.jitter}
               if cfg.deploy.n_starts > 1 else {}),
            **({"deploy_optimizer": cfg.deploy.optimizer,
                "deploy_inner_lr": cfg.deploy.inner_lr}
               if cfg.deploy.optimizer else {}),
            **({"compute_dtype": cfg.model.compute_dtype}
               if cfg.model.compute_dtype else {}),
            "time_per_task_s": dt / cfg.task.n_eval,
            "val_mse": float(val.mse),
            "val_rel_err": float(val.rel_err),
            "val_rel_err_std": float(val.rel_err_std),
            "val_rel_err_median": float(val.rel_err_median),
            "val_rel_err_p90": float(val.rel_err_p90),
            "self_loss_mean": float(np.mean(self_losses)),
            "self_loss_median": float(np.median(self_losses)),
            "self_loss_max": float(np.max(self_losses)),
            **audit_cols,
        }
        rows.append(row)
        print(json.dumps(row))

    # optimizer-mode and best-checkpoint rows land in their own files so
    # the default-protocol bench of the same checkpoint is never clobbered
    # (a best-ckpt run overwrote a latest-ckpt k-sweep before this suffix)
    suffix = f"_{cfg.deploy.optimizer}" if cfg.deploy.optimizer else ""
    # mixed-precision deploy variants get their own file too (a bf16
    # bench must not clobber the default-precision rows)
    if cfg.model.compute_dtype:
        suffix += f"_{cfg.model.compute_dtype}"
    # the task-draw size is ALWAYS in the name (ADVICE r4): the committed
    # unsuffixed history mixes 8- and 4-task sweeps with no n_eval field to
    # tell them apart, so unsuffixed files are frozen legacy — every new
    # bench writes _n<k> and can never clobber a legacy row
    suffix += f"_n{cfg.task.n_eval}"
    # suffix keyed on the checkpoint actually benched, not the requested
    # one: a --checkpoint=best run that fell back to latest must not write
    # latest-checkpoint rows into deploy_bench_best.jsonl (ADVICE r2)
    if resolved_best:
        suffix += "_best"
    out = os.path.join(expt, f"deploy_bench{suffix}.jsonl")
    with open(out, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    print(f"wrote {out}")
    return rows


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    algo, steps_list, repeats, which, rest = (
        "maml", (0, 1, 2, 5, 10, 20), 3, "latest", [])
    energy_audit = False
    for a in argv:
        if a.startswith("--algo="):
            algo = a.split("=", 1)[1]
        elif a.startswith("--inner-steps-list="):
            steps_list = tuple(
                int(x) for x in a.split("=", 1)[1].split(",")
            )
        elif a.startswith("--repeats="):
            repeats = int(a.split("=", 1)[1])
        elif a.startswith("--checkpoint="):
            which = a.split("=", 1)[1]
        elif a == "--energy_audit":
            energy_audit = True
        else:
            rest.append(a)
    cfg = parse_overrides(Config(), rest)
    run(cfg, algo=algo, inner_steps_list=steps_list, repeats=repeats,
        which=which, energy_audit=energy_audit)


if __name__ == "__main__":
    main()
