"""Task-7 branch diagnosis: is the low-energy ref-192 branch representable
on coarse lattices (downward warm chain), and did the upward chain's ref
warm attempt fail (verbose)?"""
import json
import jax
import jax.numpy as jnp

from metapde_tpu.config import Config
from metapde_tpu.pdes import get_pde
from metapde_tpu.solvers import fem_elasticity

from metapde_tpu.config import parse_overrides
cfg = parse_overrides(Config(), [
    "--task.pde=hyper_elasticity",
    "--task.domain.xmin=0.0", "--task.domain.ymin=0.0",
    "--task.max_holes=5", "--task.max_hole_size=1.0",
    "--task.vary_source=false", "--task.vary_bc=false",
])
pde = get_pde(cfg.task)

keys = jax.random.split(jax.random.PRNGKey(0), 8)
params = pde.sample_params(keys[7])

def solve_at(res, warm, ref=False, verbose=True):
    eff = int(pde.effective_resolution(params, res))
    gt = fem_elasticity.solve_direct(
        params, resolution=eff,
        xmin=0.0, xmax=1.0, ymin=0.0, ymax=1.0,
        top_displacement=-0.12,
        out_dtype=jnp.float64 if ref else jnp.float32,
        warm_start=warm, newton_steps=120, verbose=verbose,
    )
    return jax.block_until_ready(gt), eff

pts = pde.sample_validation_points(jax.random.PRNGKey(1000), 1024, params)

def rel_mse(gt, ref_vals):
    v = jax.vmap(lambda x: pde.evaluate_gt(gt, x))(pts)
    return float(jnp.sum((v - ref_vals) ** 2) / jnp.sum(ref_vals ** 2))

print("== upward chain 48->96->144->192 (verbose) ==", flush=True)
chain = {}
prev = None
for res in (48, 96, 144):
    print(f"-- solve res {res}", flush=True)
    prev, eff = solve_at(res, prev)
    chain[res] = prev
    print(json.dumps({"res": res, "eff": eff,
                      "energy": float(prev.final_energy)}), flush=True)
print("-- ref solve res 192 (warm from 144)", flush=True)
ref, eff = solve_at(192, prev, ref=True)
print(json.dumps({"res": 192, "eff": eff,
                  "energy": float(ref.final_energy)}), flush=True)
rv = jax.vmap(lambda x: pde.evaluate_gt(ref, x))(pts)

print("== downward chain 192->144->96->48 (warm from ref branch) ==",
      flush=True)
prev = ref
for res in (144, 96, 48):
    print(f"-- solve res {res} (warm from finer)", flush=True)
    gt, eff = solve_at(res, prev)
    row = {"res": res, "eff": eff, "energy": float(gt.final_energy),
           "rel_mse_vs_ref": rel_mse(gt, rv),
           "up_chain_energy": float(chain[res].final_energy),
           "up_chain_rel_mse": rel_mse(chain[res], rv)}
    print(json.dumps(row), flush=True)
    prev = gt
