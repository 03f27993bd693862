"""Ground-truth harness + validation metrics.

Re-design of the reference's validation stack (src/util/trainer_util.py:
get_ground_truth_points:36-75, vmap_validation_error:501-577) with the key
TPU difference: ground-truth solutions are jit-compatible pytrees evaluated
on device (the reference loops point-by-point through FEniCS on the host).

Metric semantics preserved exactly:
- val_mse: mean squared error of the k-step-adapted field vs ground truth at
  validation coords, over all eval tasks.
- rel_sq_err: err^2 / mean(gt^2 over points) (trainer_util.py:554-555).
- per-dim relative error, std across tasks, per-timestep error for
  td_burgers (trainer_util.py:558-568).
- hyper_elasticity left/right symmetry disambiguation: also evaluate the
  x-mirrored field (x -> 1-x, u_x -> -u_x) and keep the better branch per
  task (trainer_util.py:525-549).
"""

from functools import partial
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.trees import tree_unstack


class GroundTruthBundle(NamedTuple):
    # list of per-task ground-truth pytrees. A list, NOT a stacked pytree:
    # per-task effective resolutions may differ (hyper_elasticity's ligament
    # floor solves hard pore geometries on finer grids), so the leaves are
    # not stackable in general. Consumers iterate; the stacked arrays below
    # are what the jitted validation path uses.
    gts: list
    gt_vals: jnp.ndarray  # [n_eval, V, out_dim]
    coords: jnp.ndarray   # [n_eval, V, in_dim]
    gt_params: object     # stacked task params


def get_ground_truth(pde, gt_params_stacked, key, n_points, resolution,
                     cache_dir=None, cache_extra=None, cache_keys=None):
    """Solve each eval task with the JAX-native solver and tabulate values at
    sampled validation coords (reference trainer_util.py:36-75).

    cache_dir: optional GroundTruthCache directory. Eval-task params derive
    deterministically from the run seed, so supervisor relaunches
    (pipeline/supervise.sh) hit the cache instead of re-solving + paying
    the solver's compile through the device tunnel.

    cache_keys: the per-task PRNG keys the params were sampled from (stacked,
    [n_eval, 2] uint32). When given, cache entries are keyed on these exact
    integer key bytes (backend-independent) so a CPU process can pre-warm the
    cache for a TPU run."""
    params_list = tree_unstack(gt_params_stacked)
    keys = jax.random.split(key, len(params_list))
    cache = None
    if cache_dir:
        from .gt_cache import GroundTruthCache

        cache = GroundTruthCache(cache_dir)
    key_mats = (list(np.asarray(jax.device_get(cache_keys)))
                if cache_keys is not None else [None] * len(params_list))

    gts, coords, vals = [], [], []
    for params, k, km in zip(params_list, keys, key_mats):
        if cache is not None:
            gt = cache.get_or_solve(pde, params, resolution,
                                    extra_hparams=cache_extra,
                                    key_material=km)
        else:
            gt = pde.solve(params, resolution=resolution)
        pts = pde.sample_validation_points(k, n_points, params, gt)
        v = jax.vmap(lambda x: pde.evaluate_gt(gt, x))(pts)
        if v.ndim == 1:
            v = v[:, None]
        gts.append(gt)
        coords.append(pts)
        vals.append(v)

    return GroundTruthBundle(
        gts=gts,
        gt_vals=jnp.stack(vals),
        coords=jnp.stack(coords),
        gt_params=gt_params_stacked,
    )


class ValidationResult(NamedTuple):
    mse: jnp.ndarray
    norms: jnp.ndarray            # per-dim mean of gt^2
    rel_err: jnp.ndarray          # mean relative squared error
    per_dim_rel_err: jnp.ndarray
    rel_err_std: jnp.ndarray      # std of per-task rel err
    t_rel_sq_err: Optional[jnp.ndarray]  # per-timestep (td_burgers) or None
    # median of per-task rel err: robust to eval tasks whose ground truth
    # has near-zero norm, which explode the mean relative metric (the
    # reference metric shares the hazard; both are reported)
    rel_err_median: jnp.ndarray = None
    # 90th percentile of per-task rel err: quantifies the heavy tail that
    # dominates the mean on pore-geometry families (a few hard geometries)
    rel_err_p90: jnp.ndarray = None
    # branch-aware metrics (energy-gated; train/energy.py): mean per-task
    # rel err EXCLUDING tasks flagged as branch-divergent (model domain
    # energy <= oracle's through the same MC estimator AND rel err above
    # threshold — there rel_err measures branch disagreement, not solution
    # quality). None unless make_validation_fn got an energy_fn.
    rel_err_branch: jnp.ndarray = None
    branch_flags: jnp.ndarray = None   # count of flagged tasks
    branch_mask: jnp.ndarray = None    # [n_eval] bool, True = flagged


def make_validation_fn(
    pde,
    make_coef_func: Callable,
    n_eval: int,
    num_tsteps: Optional[int] = None,
    symmetry: bool = False,
    energy_fn: Optional[Callable] = None,
    audit_points=None,
    oracle_energy=None,
    branch_margin: float = 1.02,
    branch_err_threshold: float = 0.1,
):
    """Build a jitted validation-error function.

    make_coef_func: (key, model, task_params, coords) -> [V] or [V, out]
    values of the adapted model at coords (reference make_coef_func,
    maml_pde.py:186-193).

    Branch-aware validation (generalizing the reference's mirror-min
    disambiguation, trainer_util.py:525-549 — see train/energy.py): pass
    energy_fn(key, model, task_params_i, pts_i) -> scalar model domain
    energy, audit_points (per-task stacked points pytree, fixed across
    calls), and oracle_energy [n_eval] (the ground-truth field's energy
    through the SAME estimator on the SAME points). A task is flagged
    branch-divergent when the adapted model matches/beats the oracle's
    energy within branch_margin while its rel err exceeds
    branch_err_threshold; rel_err_branch excludes flagged tasks from the
    mean so optimization error separates from branch roulette in-stream.
    """
    branch_aware = energy_fn is not None
    if branch_aware:
        oracle_energy = jnp.asarray(oracle_energy)

    def validation_error(model, gt_params, coords, gt_vals) -> ValidationResult:
        keys = jax.random.split(jax.random.PRNGKey(0), n_eval)
        coefs = jax.vmap(make_coef_func, (0, None, 0, 0))(
            keys, model, gt_params, coords
        )
        coefs = coefs.reshape(coefs.shape[0], coefs.shape[1], -1)
        gt = gt_vals.reshape(coefs.shape)

        if symmetry:
            # hyper_elasticity: the compressed porous sheet solution is
            # x-mirror symmetric; score both branches (trainer_util.py:525-549)
            err_left = coefs - gt
            mse_left = jnp.mean(err_left ** 2, axis=(1, 2))

            coords_m = coords.at[:, :, 0].set(1.0 - coords[:, :, 0])
            coefs_m = jax.vmap(make_coef_func, (0, None, 0, 0))(
                keys, model, gt_params, coords_m
            )
            coefs_m = coefs_m.reshape(coefs.shape)
            coefs_m = coefs_m.at[:, :, 0].multiply(-1.0)
            err_right = coefs_m - gt
            mse_right = jnp.mean(err_right ** 2, axis=(1, 2))

            use_right = (mse_left > mse_right)[:, None, None]
            err = jnp.where(use_right, err_right, err_left)
            # the reference's take_min returns mse_left on both branches and
            # sums it (trainer_util.py:538-547); rel_err below uses the
            # branch-selected err, which is what the paper reports
            mse = jnp.sum(mse_left)
        else:
            err = coefs - gt
            mse = jnp.mean(err ** 2)

        normalizer = jnp.mean(gt ** 2, axis=1, keepdims=True)  # [T,1,D]
        rel_sq_err = err ** 2 / normalizer.mean(axis=2, keepdims=True)

        t_rel = None
        if num_tsteps is not None:
            # per-timestep error: validation coords cycle through the
            # solver's time grid (trainer_util.py:558-568)
            tile_idx = coords.shape[1] // num_tsteps
            base = jnp.arange(tile_idx) * num_tsteps
            t_errs = []
            for i in range(num_tsteps):
                idx = base + i
                t_err = err[:, idx, :]
                t_norm = jnp.mean(gt[:, idx, :] ** 2, axis=1, keepdims=True)
                t_errs.append(
                    jnp.mean(t_err ** 2 / t_norm.mean(axis=2, keepdims=True))
                )
            t_rel = jnp.stack(t_errs)

        per_task_rel = jnp.mean(rel_sq_err, axis=(1, 2))

        rel_err_branch = branch_flags = branch_mask = None
        if branch_aware:
            e_keys = jax.random.split(jax.random.PRNGKey(2), n_eval)
            model_E = jax.vmap(energy_fn, (0, None, 0, 0))(
                e_keys, model, gt_params, audit_points
            )
            branch_mask = (model_E <= oracle_energy * branch_margin) & (
                per_task_rel > branch_err_threshold
            )
            keep = ~branch_mask
            n_keep = jnp.maximum(jnp.sum(keep), 1)
            rel_err_branch = jnp.where(
                jnp.any(keep),
                jnp.sum(jnp.where(keep, per_task_rel, 0.0)) / n_keep,
                jnp.mean(per_task_rel),  # all flagged: fall back to mean
            )
            branch_flags = jnp.sum(branch_mask)

        return ValidationResult(
            mse=mse,
            norms=jnp.mean(normalizer, axis=(0, 1)),
            rel_err=jnp.mean(rel_sq_err),
            per_dim_rel_err=jnp.mean(rel_sq_err, axis=(0, 1)),
            rel_err_std=jnp.std(per_task_rel),
            t_rel_sq_err=t_rel,
            rel_err_median=jnp.median(per_task_rel),
            rel_err_p90=jnp.percentile(per_task_rel, 90.0),
            rel_err_branch=rel_err_branch,
            branch_flags=branch_flags,
            branch_mask=branch_mask,
        )

    return jax.jit(validation_error)
