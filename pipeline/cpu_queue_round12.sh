#!/bin/bash
# Round-12 CPU queue: de-confounded res-96 elasticity deployment re-sweep
# (NEXT.md item 3a) + multi-start A/B.
#
# The original deploy_maml96 sweep accidentally fine-tuned from the
# 60k-step tpu_run1 init (init and oracle-res confounded); its em5-init
# re-run was lost with the 2026-08-18 VM rebuild. Both sweeps below use
# the em5 (200k) init and the res-96 oracle:
#   A. deploy_maml96em5   — single-start (the de-confounded baseline)
#   B. deploy_ms96em5     — multi-start K=8, jitter 0.05: the
#      argmin-energy selection fix for the post-buckling tail
#      (train/multistart.py). Seed 1 is the audited symmetric 5x5-pore
#      tail task (fine-tuned into a +36%-energy basin, val rel_err 0.19).
# Sweep A warms the res-96 gt cache for B (keys are init-independent).
#
# Runs on CPU (TPU is busy with the em5 500k continuation); error metrics
# are backend-independent.
cd "$(dirname "$0")/.."
set -u

COMMON=(
  --task.pde=hyper_elasticity
  --task.domain.xmin=0.0 --task.domain.ymin=0.0
  --task.max_holes=5 --task.max_hole_size=1.0
  --task.vary_source=false --task.vary_bc=false
  --solver.ground_truth_resolution=96
  --model.num_layers=8 --model.layer_size=64 --model.omega=30 --model.omega0=30
  --train.optimizer=adam --maml.outer_lr=1e-5 --maml.grad_clip=100
  --maml.inner_steps=5 --maml.inner_lr=1e-5
  --task.bc_weight=1.0 --train.outer_steps=200 --task.outer_points=1024
  --task.validation_points=1024 --train.log_every=5 --train.val_every=5
  --train.viz_every=0 --train.checkpoint_every=0
  --train.load_model_from_expt=results_elasticity_maml/em5
  --train.out_dir=results_elasticity_deploy
)

echo "queue12: A. single-start em5-init res-96 sweep at $(date)"
env PYTHONPATH= JAX_PLATFORMS=cpu timeout 28800 \
  python -m metapde_tpu.cli.sweep --driver=nn_pde_maml --seeds=1,2,3,4,5,6,7,8 -- \
    "${COMMON[@]}" --train.expt_name=deploy_maml96em5

bash pipeline/commit_ckpts.sh "Res-96 em5-init deploy re-sweep (single-start) + gt cache"

echo "queue12: B. multi-start K=8 sweep at $(date)"
env PYTHONPATH= JAX_PLATFORMS=cpu timeout 57600 \
  python -m metapde_tpu.cli.sweep --driver=nn_pde_maml --seeds=1,2,3,4,5,6,7,8 -- \
    "${COMMON[@]}" --train.expt_name=deploy_ms96em5 \
    --deploy.n_starts=8 --deploy.jitter=0.05

bash pipeline/commit_ckpts.sh "Res-96 multi-start (K=8) deploy sweep"

echo "queue12: done at $(date)"
