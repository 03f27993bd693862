#!/bin/bash
# Sequential CPU deployment fine-tune queue (this VM has ONE CPU core —
# run at most one CPU sweep at a time; the TPU queue runs independently).
# Deployment fine-tune curves are CPU-timed by design, matching the
# reference's CPU deployment timing (BASELINE.md missing_time constants).
#
#   1. poisson LEAP deployment sweep (8 seeds) from the lp2 60k init
#   2. hyperelasticity MAML deployment sweep (8 seeds)
#   3. hyperelasticity LEAP deployment sweep (8 seeds) from newest lde1*
#
# Usage: cpu_queue_round3.sh [wait_pid]
#   wait_pid: optional PID of an already-running CPU sweep to wait for.
cd "$(dirname "$0")/.."
set -u
export PYTHONPATH= JAX_PLATFORMS=cpu

WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  echo "cpu-queue3: waiting for pid $WAIT_PID"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
  echo "cpu-queue3: pid $WAIT_PID done at $(date)"
fi

newest_ckpt_dir() {  # out_dir expt_prefix
  for d in $(ls -dt "$1/$2"* 2>/dev/null); do
    if ls "$d"/checkpoint_step_*.pickle >/dev/null 2>&1; then
      echo "$d"; return
    fi
  done
}

# ---- 1. poisson LEAP deployment sweep ----
D=$(newest_ckpt_dir results_poisson_leap lp2)
if [ -n "${D:-}" ]; then
  echo "cpu-queue3: poisson LEAP deployment sweep from $D"
  python -m metapde_tpu.cli.sweep --driver=nn_pde --seeds=1,2,3,4,5,6,7,8 -- \
    --task.pde=poisson --solver.ground_truth_resolution=32 \
    --model.num_layers=5 --model.layer_size=64 --model.omega=30 --model.omega0=30 \
    --train.optimizer=adam --maml.outer_lr=2.5e-5 \
    --task.bc_weight=1.0 --train.outer_steps=200 --task.outer_points=512 \
    --task.validation_points=1024 --train.log_every=5 --train.val_every=5 \
    --train.viz_every=0 --train.checkpoint_every=0 \
    --train.load_model_from_expt="$D" \
    --train.out_dir=results_poisson_deploy --train.expt_name=deploy_leap
fi

# ---- 2. hyperelasticity MAML deployment sweep ----
echo "cpu-queue3: elasticity MAML deployment sweep"
python -m metapde_tpu.cli.sweep --driver=nn_pde_maml --seeds=1,2,3,4,5,6,7,8 -- \
  --task.pde=hyper_elasticity \
  --task.domain.xmin=0.0 --task.domain.ymin=0.0 \
  --task.max_holes=5 --task.max_hole_size=1.0 \
  --task.vary_source=false --task.vary_bc=false \
  --solver.ground_truth_resolution=32 \
  --model.num_layers=8 --model.layer_size=64 --model.omega=30 --model.omega0=30 \
  --train.optimizer=adam --maml.outer_lr=1e-5 --maml.grad_clip=100 \
  --maml.inner_steps=5 --maml.inner_lr=1e-5 \
  --task.bc_weight=1.0 --train.outer_steps=200 --task.outer_points=1024 \
  --task.validation_points=1024 --train.log_every=5 --train.val_every=5 \
  --train.viz_every=0 --train.checkpoint_every=0 \
  --train.load_model_from_expt=results_elasticity_maml/tpu_run1 \
  --train.out_dir=results_elasticity_deploy --train.expt_name=deploy_maml

# ---- 3. hyperelasticity LEAP deployment sweep ----
D=$(newest_ckpt_dir results_elasticity_leap lde1)
if [ -n "${D:-}" ]; then
  echo "cpu-queue3: elasticity LEAP deployment sweep from $D"
  python -m metapde_tpu.cli.sweep --driver=nn_pde --seeds=1,2,3,4,5,6,7,8 -- \
    --task.pde=hyper_elasticity \
    --task.domain.xmin=0.0 --task.domain.ymin=0.0 \
    --task.max_holes=5 --task.max_hole_size=0.5 \
    --task.vary_source=false --task.vary_bc=false \
    --solver.ground_truth_resolution=48 \
    --model.num_layers=10 --model.layer_size=128 --model.omega=30 --model.omega0=30 \
    --train.optimizer=adam --maml.outer_lr=5e-6 \
    --task.bc_weight=1.0 --train.outer_steps=200 --task.outer_points=1024 \
    --task.validation_points=1024 --train.log_every=5 --train.val_every=5 \
    --train.viz_every=0 --train.checkpoint_every=0 \
    --train.load_model_from_expt="$D" \
    --train.out_dir=results_elasticity_deploy --train.expt_name=deploy_leap
fi

echo "cpu-queue3: all sweeps done at $(date)"
