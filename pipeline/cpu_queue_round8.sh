#!/bin/bash
# Round-8 sequential CPU queue: re-measure EVERY deployment fine-tune
# sweep with per-seed task diversity restored (nn_driver now folds the
# run seed into the task seed; before the fix each 8-seed sweep
# fine-tuned the same PRNGKey(task.seed) task 8 times — see commit
# "Fix two validation-path bugs").
#
# Old deploy dirs are junk (single-task medians); each family's dirs are
# removed before its re-run so analysis globs don't mix generations.
#
# Order: cheap + headline families first; elasticity MAML (near-limit
# pore tasks, expensive floored oracles + open branch-mismatch question)
# last.
#
# Usage: cpu_queue_round8.sh [wait_pid ...]
cd "$(dirname "$0")/.."
set -u
export PYTHONPATH= JAX_PLATFORMS=cpu

for WAIT_PID in "$@"; do
  echo "cpu-queue8: waiting for pid $WAIT_PID"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
  echo "cpu-queue8: pid $WAIT_PID done at $(date)"
done

newest_ckpt_dir() {  # out_dir expt_prefix
  for d in $(ls -dt "$1/$2"* 2>/dev/null); do
    if ls "$d"/checkpoint_step_*.pickle >/dev/null 2>&1; then
      echo "$d"; return
    fi
  done
}

# ---- 1. poisson (MAML + LEAP) ----
echo "cpu-queue8: poisson deployment sweeps at $(date)"
rm -rf results_poisson_deploy/deploy_maml_seed_* \
       results_poisson_deploy/deploy_leap_seed_*
timeout 21600 bash pipeline/deployment_poisson.sh

# ---- 2. td_burgers (MAML from newest bm6 ckpt + LEAP) ----
echo "cpu-queue8: td_burgers deployment sweeps at $(date)"
rm -rf results_burgers_deploy/deploy_maml_seed_* \
       results_burgers_deploy/deploy_leap_seed_*
BM=$(newest_ckpt_dir results_burgers_maml bm6)
[ -z "${BM:-}" ] && BM=results_burgers_maml/tpu_run1
echo "cpu-queue8: burgers MAML init $BM"
timeout 21600 python -m metapde_tpu.cli.sweep --driver=nn_pde_maml --seeds=1,2,3,4,5,6,7,8 -- \
  --task.pde=td_burgers --task.domain.xmin=0.0 --task.max_reynolds=100 \
  --task.num_tsteps=201 --task.vary_source=false \
  --solver.ground_truth_resolution=512 \
  --model.num_layers=8 --model.layer_size=64 --model.omega=30 --model.omega0=30 \
  --train.optimizer=adam --maml.outer_lr=1e-5 --maml.grad_clip=100 \
  --maml.inner_steps=5 --maml.inner_lr=1e-4 \
  --task.bc_weight=1.0 --train.outer_steps=200 --task.outer_points=1024 \
  --task.validation_points=1024 --train.log_every=5 --train.val_every=5 \
  --train.viz_every=0 --train.checkpoint_every=0 \
  --train.load_model_from_expt="$BM" \
  --train.out_dir=results_burgers_deploy --train.expt_name=deploy_maml
timeout 21600 python -m metapde_tpu.cli.sweep --driver=nn_pde --seeds=1,2,3,4,5,6,7,8 -- \
  --task.pde=td_burgers --task.domain.xmin=0.0 --task.max_reynolds=100 \
  --task.num_tsteps=201 --task.vary_source=false --task.vary_bc=false \
  --solver.ground_truth_resolution=512 \
  --model.num_layers=10 --model.layer_size=128 --model.omega=30 --model.omega0=30 \
  --train.optimizer=adam --maml.outer_lr=1e-5 \
  --task.bc_weight=1.0 --train.outer_steps=200 --task.outer_points=1024 \
  --task.validation_points=1024 --train.log_every=5 --train.val_every=5 \
  --train.viz_every=0 --train.checkpoint_every=0 \
  --train.load_model_from_expt=results_burgers_leap/ldb3_2 \
  --train.out_dir=results_burgers_deploy --train.expt_name=deploy_leap

# ---- 3. elasticity LEAP (v3 oracle, hole 0.5 family) ----
echo "cpu-queue8: elasticity LEAP deployment sweep at $(date)"
rm -rf results_elasticity_deploy/deploy_leap_seed_*
timeout 43200 python -m metapde_tpu.cli.sweep --driver=nn_pde --seeds=1,2,3,4,5,6,7,8 -- \
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
  --train.load_model_from_expt=results_elasticity_leap/lde1_1 \
  --train.out_dir=results_elasticity_deploy --train.expt_name=deploy_leap

# ---- 4. steady-Burgers MAML ----
echo "cpu-queue8: steady-burgers deployment sweep at $(date)"
rm -rf results_sburgers_deploy/deploy_maml_seed_*
timeout 21600 python -m metapde_tpu.cli.sweep --driver=nn_pde_maml --seeds=1,2,3,4,5,6,7,8 -- \
  --task.pde=steady_burgers --task.max_reynolds=10 \
  --task.max_holes=4 --task.max_hole_size=0.3 --task.bc_weight=10.0 \
  --solver.ground_truth_resolution=48 \
  --model.num_layers=5 --model.layer_size=64 --model.omega=30 --model.omega0=30 \
  --train.optimizer=adam --maml.outer_lr=1e-5 --maml.grad_clip=100 \
  --maml.inner_steps=5 --maml.inner_lr=1e-4 \
  --train.outer_steps=200 --task.outer_points=1024 \
  --task.validation_points=1024 --train.log_every=5 --train.val_every=5 \
  --train.viz_every=0 --train.checkpoint_every=0 \
  --train.load_model_from_expt=results_sburgers_maml/sb3 \
  --train.out_dir=results_sburgers_deploy --train.expt_name=deploy_maml

# ---- 5. elasticity MAML (near-limit family) from newest em5 ckpt ----
echo "cpu-queue8: elasticity MAML deployment sweep at $(date)"
rm -rf results_elasticity_deploy/deploy_maml_seed_*
EM=$(newest_ckpt_dir results_elasticity_maml em5)
[ -z "${EM:-}" ] && EM=results_elasticity_maml/tpu_run1
echo "cpu-queue8: elasticity MAML init $EM"
timeout 43200 python -m metapde_tpu.cli.sweep --driver=nn_pde_maml --seeds=1,2,3,4,5,6,7,8 -- \
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
  --train.load_model_from_expt="$EM" \
  --train.out_dir=results_elasticity_deploy --train.expt_name=deploy_maml

echo "cpu-queue8: all sweeps done at $(date)"
