"""Standalone solution visualization from a meta-learned checkpoint.

The reference renders truth-vs-adapted-model grids only inside training
(compare_plots_with_ground_truth, trainer_util.py:187-292, called at
viz_every); this CLI produces the same artifact post-hoc from any
checkpoint, on fresh tasks:

    python -m metapde_tpu.cli.solution_viz --algo=maml \
        --train.load_model_from_expt=results_poisson_maml/tpu_run6b \
        --inner-steps-list=0,2,5 --out=figures/poisson_solutions.png \
        --task.pde=poisson ...  # same model/task flags as training

For td_burgers an x-t heatmap time series is drawn instead of 2-D fields
(reference plot_model_time_series_new).
"""

import os
import sys

import jax
import jax.numpy as jnp

from ..config import Config, parse_overrides
from ..train import checkpoints as ckpt
from ..train import leap_driver, maml_driver, viz
from ..train.validation import get_ground_truth
from ..utils.trees import tree_unstack


def run(cfg: Config, algo: str, inner_steps_list, out: str, n_tasks: int = 3):
    driver = maml_driver if algo == "maml" else leap_driver
    c = driver.build(cfg)
    pde, field = c["pde"], c["field"]

    expt = cfg.train.load_model_from_expt
    if not expt:
        raise SystemExit("--train.load_model_from_expt is required")
    fname = ckpt.latest_checkpoint(expt)
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
    gt_keys = jax.random.split(gt_key, max(n_tasks, 1))
    gt_params = jax.vmap(pde.sample_params)(gt_keys)
    bundle = get_ground_truth(
        pde, gt_params, pts_key, cfg.task.validation_points,
        cfg.solver.ground_truth_resolution,
    )
    gts_list = list(bundle.gts)
    params_list = tree_unstack(bundle.gt_params)

    out_dir = os.path.dirname(out) or "."
    os.makedirs(out_dir, exist_ok=True)
    stem = os.path.splitext(os.path.basename(out))[0]
    get_final = lambda k, m, p, s: c["get_final_model"](k, m, p, s)
    apply_fn = lambda p, x: field.apply(p, x)
    if cfg.task.pde == "td_burgers":
        fname = viz.plot_burgers_time_series(
            out_dir, pde, model, gts_list[0], params_list[0],
            get_final, max(inner_steps_list), apply_fn, step=None,
        )
    else:
        dom = cfg.task.domain
        fname = viz.compare_plots_with_ground_truth(
            out_dir, pde, model, gts_list, params_list, get_final,
            inner_steps_list=tuple(inner_steps_list), n_tasks=n_tasks,
            bounds=(dom.xmin, dom.xmax, dom.ymin, dom.ymax),
            field_apply=apply_fn, step=None,
        )
    if fname and os.path.basename(fname) != os.path.basename(out):
        os.replace(fname, os.path.join(out_dir, os.path.basename(out)))
        fname = os.path.join(out_dir, os.path.basename(out))
    print(fname)
    return fname


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    algo, steps, out, n_tasks, rest = "maml", (0, 2, 5), "figures/solutions.png", 3, []
    for a in argv:
        if a.startswith("--algo="):
            algo = a.split("=", 1)[1]
        elif a.startswith("--inner-steps-list="):
            steps = tuple(int(x) for x in a.split("=", 1)[1].split(","))
        elif a.startswith("--out="):
            out = a.split("=", 1)[1]
        elif a.startswith("--n-tasks="):
            n_tasks = int(a.split("=", 1)[1])
        else:
            rest.append(a)
    cfg = parse_overrides(Config(), rest)
    run(cfg, algo, steps, out, n_tasks)


if __name__ == "__main__":
    main()
