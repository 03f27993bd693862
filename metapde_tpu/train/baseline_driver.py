"""Classical-solver baseline sweep (reference: src/fenics_baseline.py:57-177).

Times and validates the JAX-native ground-truth solvers across resolution
grids against a high-resolution reference solve of the same tasks, producing
the accuracy-vs-time Pareto data the paper compares meta-learned deployment
against (resultAnalysis.ipynb cells 3/13/20; reference protocol:
high-res ground truth at FLAGS.ground_truth_resolution, then loops over
spatial_resolutions x boundary/time resolutions re-solving + timing).

Results: errors_by_resolution.json (+ .npy-compatible dict) in the expt dir;
metric semantics = validation_error (fenics_baseline.py:95-127): mean squared
error and relative squared error at validation coords, averaged over n_eval
tasks.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..pdes import get_pde
from ..utils import Timer, tree_unstack
from .metrics import prepare_logging


def run(cfg: Config, spatial_resolutions=(4, 8, 16, 32), axis2=None,
        oracle: str = "p1"):
    """Sweep solver accuracy-vs-time over `spatial_resolutions`, optionally
    crossed with a second axis (the reference sweeps spatial x time x
    boundary grids, fenics_baseline.py:38-54,132-173).

    axis2: optional (kwarg_name, values) — each value is passed to
        pde.solve as a keyword (e.g. ("num_tsteps", (33, 65, 129)) for
        td_burgers time resolution; ("boundary_cap", (48, 96, 192)) for
        hyper_elasticity boundary refinement). None = 1-axis sweep with
        the solver's defaults (result keys stay plain "res").

    oracle: "p1" (the default f32 production solver, timed) or
        "richardson" — the higher-ORDER oracle pair (pde.solve_hi /
        evaluate_gt_hi, e.g. poisson's Richardson-extrapolated nested x64
        P1 solves + bicubic eval) giving the Pareto line that matches the
        reference's P2-element convergence order. The reference solve then
        also uses solve_hi so the sweep isn't floored by the reference's
        own error.
    """
    out_dir = cfg.train.out_dir or f"{cfg.task.pde}_solver_baseline"
    path, log, _ = prepare_logging(out_dir, cfg.train.expt_name)
    log(cfg.to_json())

    pde = get_pde(cfg.task)
    if oracle == "richardson":
        if pde.solve_hi is None:
            raise SystemExit(f"oracle=richardson: {cfg.task.pde} has no "
                             "solve_hi")
        pde = pde._replace(solve=pde.solve_hi, evaluate_gt=pde.evaluate_gt_hi,
                           solve_ref=pde.solve_hi)
    key = jax.random.PRNGKey(cfg.seed)
    key, gt_key, pts_key = jax.random.split(key, 3)
    gt_keys = jax.random.split(gt_key, cfg.task.n_eval)
    gt_params = jax.vmap(pde.sample_params)(gt_keys)
    params_list = tree_unstack(gt_params)

    # high-resolution reference solves; prefer the pde's dedicated
    # high-accuracy path (e.g. fem_poisson.solve_x64) when it has one —
    # an f32 reference's own convergence floor otherwise masks the sweep
    # (the reference's PETSc oracle is f64 throughout)
    solve_ref = pde.solve_ref or pde.solve
    ref_res = cfg.solver.ground_truth_resolution
    log(f"reference solves at resolution {ref_res}"
        + (" (x64 path)" if pde.solve_ref else ""))
    ref_vals, coords = [], []
    pts_keys = jax.random.split(pts_key, len(params_list))
    for params, k in zip(params_list, pts_keys):
        gt = solve_ref(params, resolution=ref_res)
        pts = pde.sample_validation_points(
            k, cfg.task.validation_points, params, gt
        )
        v = jax.vmap(lambda x: pde.evaluate_gt(gt, x))(pts)
        ref_vals.append(np.asarray(v).reshape(v.shape[0], -1))
        coords.append(pts)

    ax2_name, ax2_values = axis2 if axis2 is not None else (None, (None,))
    results = {}
    for res in spatial_resolutions:
        if res >= ref_res:
            continue
        for v2 in ax2_values:
            kw = {} if v2 is None else {ax2_name: v2}
            errs, times = [], []
            # warm-up compile (excluded from timing, matching the
            # reference's per-solve CPU timing discipline)
            _ = jax.block_until_ready(
                pde.solve(params_list[0], resolution=res, **kw)
            )
            for params, pts, ref in zip(params_list, coords, ref_vals):
                with Timer() as t:
                    gt = pde.solve(params, resolution=res, **kw)
                    v = jax.vmap(lambda x: pde.evaluate_gt(gt, x))(pts)
                    jax.block_until_ready(v)
                v = np.asarray(v).reshape(ref.shape)
                err = v - ref
                normalizer = np.mean(ref ** 2, axis=0, keepdims=True).mean()
                errs.append(float(np.mean(err ** 2 / max(normalizer, 1e-12))))
                times.append(t.interval)
            entry = {
                "rel_mse": float(np.mean(errs)),
                "rel_mse_std": float(np.std(errs)),
                # the mean is tail-dominated on pore-geometry families (a
                # few hard tasks); report the median alongside, matching
                # the deploy-bench metrics
                "rel_mse_median": float(np.median(errs)),
                "time_per_solve": float(np.mean(times)),
            }
            label = str(res) if v2 is None else f"{res},{ax2_name}={v2}"
            if v2 is not None:
                entry[ax2_name] = v2
            results[label] = entry
            log(f"res {label}: rel_mse {np.mean(errs):.3e} "
                f"@ {np.mean(times):.4f}s/solve")

    if path is not None:
        with open(os.path.join(path, "errors_by_resolution.json"), "w") as f:
            json.dump(results, f, indent=2)
    return results
