"""One-off gt-cache key migration for the round-3 keying fix.

train/gt_cache.py now hashes gt-affecting non-default TaskConfig fields
into the cache key (task_cache_extra — ADVICE r2 high: key bytes alone
under-keyed the cache). That changes the key of every existing entry whose
family uses non-default fields (td_burgers, elasticity, steady_burgers) —
and the elasticity res-48 near-limit solves cost minutes-hours each on this
1-core host. Deploy-bench entries are fully deterministic (key material =
split(split(PRNGKey(seed+7919), 3)[1], n_eval)), so this script relinks
them old-key -> new-key without re-solving.

Usage:
    python pipeline/migrate_gt_cache.py <run_dir> <resolution> [n_eval]

run_dir: an experiment dir with config.json (e.g. results_elasticity_maml/em5);
the family cache dir is <dirname(run_dir)>/gt_cache, as deploy_bench uses.
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(run_dir: str, resolution: int, n_eval: int = None):
    import jax
    import numpy as np

    from metapde_tpu.config import Config, merge_dict
    from metapde_tpu.pdes import get_pde
    from metapde_tpu.train.gt_cache import _key, task_cache_extra

    with open(os.path.join(run_dir, "config.json")) as f:
        cfg = merge_dict(Config(), json.load(f))
    n_eval = n_eval or cfg.task.n_eval
    pde = get_pde(cfg.task)
    extra = task_cache_extra(cfg.task)
    if not extra:
        print(f"{run_dir}: no non-default gt fields; keys unchanged")
        return

    key = jax.random.PRNGKey(cfg.seed + 7919)  # deploy_bench key schedule
    _, gt_key, _ = jax.random.split(key, 3)
    gt_keys = np.asarray(jax.device_get(jax.random.split(gt_key, n_eval)))

    cache_dir = os.path.join(os.path.dirname(run_dir.rstrip("/")) or ".",
                             "gt_cache")
    base = {"resolution": int(resolution),
            "gt_version": getattr(pde, "gt_version", 1)}
    moved = missing = present = 0
    for km in gt_keys:
        old = _key(pde.name, dict(base), None, key_material=km)
        new = _key(pde.name, {**base, **extra}, None, key_material=km)
        oldp = os.path.join(cache_dir, f"{pde.name}_{old}.pickle")
        newp = os.path.join(cache_dir, f"{pde.name}_{new}.pickle")
        if os.path.exists(newp):
            present += 1
        elif os.path.exists(oldp):
            os.link(oldp, newp)
            moved += 1
        else:
            missing += 1
    print(f"{run_dir} res={resolution} n_eval={n_eval}: "
          f"{moved} relinked, {present} already new-keyed, {missing} absent")


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]),
         int(sys.argv[3]) if len(sys.argv) > 3 else None)
