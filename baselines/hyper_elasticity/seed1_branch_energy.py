"""Seed-1 elasticity tail: is the deployed model on a DIFFERENT energy
branch than the oracle (cf. the task-7 oracle branch multistability)?
Compare the model's MC energy against the res-96 oracle's FEM energy on
the pinned seed-1 task, and measure val error with/without x-mirror."""
import dataclasses
import json
import pickle

import jax
import jax.numpy as jnp

from metapde_tpu.config import Config, parse_overrides
from metapde_tpu.pdes import get_pde
from metapde_tpu.models import make_field

cfg = parse_overrides(Config(), [
    "--task.pde=hyper_elasticity",
    "--task.domain.xmin=0.0", "--task.domain.ymin=0.0",
    "--task.max_holes=5", "--task.max_hole_size=1.0",
    "--task.vary_source=false", "--task.vary_bc=false",
    "--model.num_layers=8", "--model.layer_size=64",
    "--model.omega=30", "--model.omega0=30",
    "--task.bc_weight=1.0",
    "--solver.ground_truth_resolution=96",
    "--seed=1",
])
task_cfg = dataclasses.replace(cfg.task, n_eval=1, fixed_num_pdes=1,
                               seed=cfg.task.seed + cfg.seed)
pde = get_pde(task_cfg)
params_task = pde.sample_params(jax.random.PRNGKey(0))  # pinned task

with open("results_elasticity_deploy/deploy_ms96em5_j05_seed_1/"
          "checkpoint_best.pickle", "rb") as f:
    ck = pickle.load(f)
model_params = ck["params"] if isinstance(ck, dict) and "params" in ck else ck
print("checkpoint keys:", list(ck.keys()) if isinstance(ck, dict) else type(ck))

import dataclasses as _dc
model_cfg = _dc.replace(cfg.model, in_dim=pde.in_dim, out_dim=pde.out_dim, squeeze_scalar=pde.scalar)
model = make_field(model_cfg)
field_fn = model.bind(model_params)

# model MC energy + bc losses on a big sample
key = jax.random.PRNGKey(1234)
pts = pde.sample_points(key, 16384, params_task)
bc_losses, dom_losses = pde.loss_fn(field_fn, pts, params_task)
print(json.dumps({
    "model_domain_energy_mc": float(dom_losses["loss_domain"]),
    "model_loss_top": float(bc_losses["loss_top"]),
    "model_loss_bottom": float(bc_losses["loss_bottom"]),
}))

# oracle at res 96 (same as the deploy run's ground truth)
gt = jax.block_until_ready(pde.solve(params_task, resolution=96))
print(json.dumps({
    "oracle_final_energy": float(gt.final_energy),
    "oracle_eff_res": int(pde.effective_resolution(params_task, 96)),
}))

# val error with and without x-mirror disambiguation
vkey = jax.random.PRNGKey(1000)
vp = pde.sample_validation_points(vkey, 2048, params_task, gt)
rv = jax.vmap(lambda x: pde.evaluate_gt(gt, x))(vp)
mv = jax.vmap(field_fn)(vp)

def rel(a, b):
    return float(jnp.sum((a - b) ** 2) / jnp.sum(b ** 2))

# x-mirror: reflect x about domain midline 0.5, negate u_x
vp_m = vp.at[:, 0].set(1.0 - vp[:, 0])
mv_m = jax.vmap(field_fn)(vp_m) * jnp.asarray([-1.0, 1.0])
print(json.dumps({
    "val_rel_mse": rel(mv, rv),
    "val_rel_mse_mirrored_model": rel(mv_m, rv),
}))

# oracle energy sanity: MC-evaluate the ORACLE field through the same
# loss to make the comparison apples-to-apples (same estimator)
def _gt_single(x):
    return pde.evaluate_gt(gt, x)

def gt_field(X):
    X = jnp.asarray(X)
    if X.ndim == 1:
        return _gt_single(X)
    return jax.vmap(_gt_single)(X)
bc_g, dom_g = pde.loss_fn(gt_field, pts, params_task)
print(json.dumps({
    "oracle_domain_energy_mc_same_points": float(dom_g["loss_domain"]),
    "oracle_loss_top": float(bc_g["loss_top"]),
    "oracle_loss_bottom": float(bc_g["loss_bottom"]),
}))
