"""Per-task decomposition of the elasticity-MAML training-val drift.

VERDICT r3 weak item 3: em5/em6's val_rel_err MEAN drifts up past ~150k
steps (0.022 @ 65k -> 0.065 @ 205k) and was read as a training
regression; the MEDIAN over the 4 pinned eval tasks is flat (~0.011,
then ~0.019 after the em5->em5_1 eval-set re-roll) the whole time. This
script decomposes the pinned-set validation into PER-TASK errors at a
series of checkpoints to identify whether the drift is (a) global
divergence (all tasks degrade — an optimizer/LR problem) or (b) a
single branch-multistable task's displacement error growing while the
model's own energy stays low (the RESULTS.md seed-1 deep-dive
mechanism: displacement-space validation against one FEM branch has an
irreducible, growing tail on post-buckling tasks).

For the worst task it also runs the energy audit: the adapted model's
MC domain energy vs the oracle field's energy through the SAME
estimator (deploy_bench._domain_energy) — lower-than-oracle model
energy with large displacement error is the branch-mismatch signature.

Usage (CPU is fine; gt comes from the shared cache):
    JAX_PLATFORMS=cpu python pipeline/em_regression_diag.py \
        [ckpt_dir_or_file ...]
Defaults to the em5/em6/em7 chain checkpoints.
"""
import json
import os
import sys
from functools import partial

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from metapde_tpu.config import load_run_config  # noqa: E402
from metapde_tpu.train import checkpoints as ckpt  # noqa: E402
from metapde_tpu.train import maml_driver  # noqa: E402
from metapde_tpu.train.gt_cache import task_cache_extra  # noqa: E402
from metapde_tpu.train.validation import get_ground_truth  # noqa: E402
from metapde_tpu.utils.trees import tree_unstack  # noqa: E402
from metapde_tpu.cli.deploy_bench import _domain_energy, _gt_field  # noqa: E402


def per_task_rel(c, cfg, bundle, state, k):
    """Per-task mirror-disambiguated relative squared errors (the same
    quantity validation.make_validation_fn averages)."""
    model = (
        jax.tree_util.tree_map(jnp.asarray, state["params"]),
        jax.tree_util.tree_map(jnp.asarray, state["inner_lrs"]),
    )
    mk = partial(c["make_coef_func"], inner_steps=k)
    keys = jax.random.split(jax.random.PRNGKey(0), cfg.task.n_eval)
    coords, gt_vals = bundle.coords, bundle.gt_vals

    def coefs_at(crds):
        out = jax.vmap(mk, (0, None, 0, 0))(keys, model, bundle.gt_params,
                                            crds)
        return out.reshape(out.shape[0], out.shape[1], -1)

    gt = gt_vals.reshape(gt_vals.shape[0], gt_vals.shape[1], -1)
    norm = jnp.mean(gt ** 2, axis=1, keepdims=True).mean(
        axis=2, keepdims=True)
    err_l = coefs_at(coords) - gt
    rel_l = jnp.mean(err_l ** 2 / norm, axis=(1, 2))
    coords_m = coords.at[:, :, 0].set(1.0 - coords[:, :, 0])
    coefs_m = coefs_at(coords_m).at[:, :, 0].multiply(-1.0)
    rel_m = jnp.mean((coefs_m - gt) ** 2 / norm, axis=(1, 2))
    return np.asarray(jnp.minimum(rel_l, rel_m))


def main(paths):
    base = "results_elasticity_maml"
    cfg = load_run_config(f"{base}/em6")
    c = maml_driver.build(cfg)
    pde = c["pde"]

    state0 = ckpt.load_checkpoint(f"{base}/em6/checkpoint_best.pickle")
    gt_key = jnp.asarray(state0["gt_key"])
    gt_points_key = jnp.asarray(state0["gt_points_key"])
    gt_keys = jax.random.split(gt_key, cfg.task.n_eval)
    gt_params = jax.vmap(pde.sample_params)(gt_keys)
    bundle = get_ground_truth(
        pde, gt_params, gt_points_key, cfg.task.validation_points,
        cfg.solver.ground_truth_resolution,
        cache_dir=f"{base}/gt_cache",
        cache_extra=task_cache_extra(cfg.task),
        cache_keys=gt_keys,
    )
    params_list = tree_unstack(gt_params)

    rows = []
    for p in paths:
        fname = p if p.endswith(".pickle") else ckpt.latest_checkpoint(p)
        if not fname or not os.path.exists(fname):
            print(f"skip {p} (no checkpoint)")
            continue
        state = ckpt.load_checkpoint(fname)
        rel = per_task_rel(c, cfg, bundle, state, cfg.maml.inner_steps)
        row = {"checkpoint": fname, "step": int(state.get("step", -1)),
               "per_task_rel_err": [float(x) for x in rel],
               "mean": float(rel.mean()),
               "median": float(np.median(rel))}
        rows.append(row)
        print(json.dumps(row), flush=True)

    # energy audit on the worst task of the last checkpoint
    worst = int(np.argmax(rows[-1]["per_task_rel_err"]))
    state = ckpt.load_checkpoint(
        rows[-1]["checkpoint"])
    model = (
        jax.tree_util.tree_map(jnp.asarray, state["params"]),
        jax.tree_util.tree_map(jnp.asarray, state["inner_lrs"]),
    )
    task = params_list[worst]
    final_params = c["deploy_final_model"](
        jax.random.PRNGKey(0), model, task, cfg.maml.inner_steps)
    field_fn = lambda x: c["field"].apply_inference(final_params, x)  # noqa
    pts = pde.sample_points(jax.random.PRNGKey(7),
                            cfg.task.validation_points, task)
    e_model = _domain_energy(pde, field_fn, pts, task)
    e_oracle = _domain_energy(pde, _gt_field(pde, bundle.gts[worst]),
                              pts, task)
    print(json.dumps({
        "worst_task": worst,
        "model_mc_energy": e_model,
        "oracle_mc_energy": e_oracle,
        "branch_mismatch_signature": bool(e_model < e_oracle),
    }), flush=True)


if __name__ == "__main__":
    args = sys.argv[1:] or [
        "results_elasticity_maml/em5/checkpoint_step_199999.pickle",
        "results_elasticity_maml/em6/checkpoint_best.pickle",
        "results_elasticity_maml/em6/checkpoint_step_250001.pickle",
        "results_elasticity_maml/em7_1",
    ]
    main(args)
