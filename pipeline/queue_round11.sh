#!/bin/bash
# Round-11 session queue (ONE TPU process at a time). State at launch
# (2026-08-18, post-VM-rebuild): the axon tunnel is back; bm6's 220k
# td_burgers checkpoint was lost to the rebuild (its metrics/log and the
# 220k deploy bench survived, RESULTS.md); em5 (hyperelasticity MAML)
# survived at 200k via the gitignore whitelist. The elasticity v3
# gt cache did NOT survive (results_*/gt_cache/ was gitignored) — it is
# re-warmed on CPU below and commit_ckpts.sh now force-tracks caches.
#
#   1. CPU v3 gt pre-warm for the em5 eval tasks (n_eval=4, res 32)
#   2. commit the re-warmed cache
#   3. supervised em5 continuation 200k -> 500k (--from_run exact config)
#
# Usage: queue_round11.sh
cd "$(dirname "$0")/.."
set -u

echo "queue11: CPU v3 gt pre-warm for results_elasticity_maml at $(date)"
env PYTHONPATH= JAX_PLATFORMS=cpu timeout 14400 \
  python -m metapde_tpu.cli.maml_pde \
    --from_run=results_elasticity_maml/em5 \
    --train.outer_steps=1 --train.steps_per_call=1 \
    --train.log_every=1 --train.val_every=100 --train.viz_every=0 \
    --train.checkpoint_every=0 \
    --train.load_model_from_expt=results_elasticity_maml/em5 \
    --train.out_dir=results_elasticity_maml --train.expt_name=gtwarm_elas_v3

bash pipeline/commit_ckpts.sh "Re-warmed elasticity v3 gt cache (post-rebuild)"

echo "queue11: supervised em5 continuation toward 500k at $(date)"
bash pipeline/supervise2.sh results_elasticity_maml em5 60 900 -- \
  python -m metapde_tpu.cli.maml_pde \
    --from_run=results_elasticity_maml/em5 \
    --train.outer_steps=500001 --train.steps_per_call=500 \
    --train.log_every=5000 --train.val_every=100 --train.viz_every=0 \
    --train.checkpoint_every=10000

echo "queue11: done at $(date)"
