#!/bin/bash
# Round-12b CPU queue: bounded replacement for cpu_queue_round12.sh's
# stage B. The full 8-seed K=8 multi-start sweep costs ~8x a single-start
# sweep on this 1-core host (~13 h — past the session); seeds 1,2,3
# suffice: seed 1 IS the audited multi-stability tail (single-start from
# the em5 init converges to ~5.2e-2 rel err; healthy seeds sit at
# 3.8e-4-1.3e-3), seeds 2-3 check multi-start does no harm on healthy
# tasks. The res-96 gt cache is already warm from stage A.
#
# Usage: cpu_queue_round12b.sh [wait_pid ...]
cd "$(dirname "$0")/.."
set -u

for WAIT_PID in "$@"; do
  echo "queue12b: waiting for pid $WAIT_PID"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
  echo "queue12b: pid $WAIT_PID done at $(date)"
done

bash pipeline/commit_ckpts.sh "Res-96 em5-init deploy re-sweep (single-start) + gt cache"

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

echo "queue12b: multi-start K=8 sweep (seeds 1,2,3) at $(date)"
env PYTHONPATH= JAX_PLATFORMS=cpu timeout 21600 \
  python -m metapde_tpu.cli.sweep --driver=nn_pde_maml --seeds=1,2,3 -- \
    "${COMMON[@]}" --train.expt_name=deploy_ms96em5 \
    --deploy.n_starts=8 --deploy.jitter=0.05

bash pipeline/commit_ckpts.sh "Res-96 multi-start (K=8) deploy sweep, seeds 1-3"

echo "queue12b: done at $(date)"
