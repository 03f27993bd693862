#!/bin/bash
# Follow-on sequential CPU queue after cpu_queue_round4.sh (ONE CPU core):
# re-run the hyperelasticity MAML deployment fine-tune sweep against the
# v3 oracle (fem_elasticity.solve_direct + ligament floor, gt_version=3).
# The previous sweep (results_elasticity_deploy/deploy_maml_seed_*) was
# validated against v2 cached ground truths that the Krylov cascade had
# left on the wrong energy branch for hard pore geometries — junk; its
# dirs are removed first so the re-run keeps clean names.
#
# Usage: cpu_queue_round5.sh [wait_pid]
cd "$(dirname "$0")/.."
set -u
export PYTHONPATH= JAX_PLATFORMS=cpu

WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  echo "cpu-queue5: waiting for pid $WAIT_PID"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
  echo "cpu-queue5: pid $WAIT_PID done at $(date)"
fi

newest_ckpt_dir() {  # out_dir expt_prefix
  for d in $(ls -dt "$1/$2"* 2>/dev/null); do
    if ls "$d"/checkpoint_step_*.pickle >/dev/null 2>&1; then
      echo "$d"; return
    fi
  done
}

echo "cpu-queue5: removing v2-validated junk deploy_maml seed dirs"
rm -rf results_elasticity_deploy/deploy_maml_seed_*

D=$(newest_ckpt_dir results_elasticity_maml em5)
[ -z "${D:-}" ] && D=results_elasticity_maml/tpu_run1
echo "cpu-queue5: elasticity MAML deployment sweep (v3 oracle) from $D"
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
  --train.load_model_from_expt="$D" \
  --train.out_dir=results_elasticity_deploy --train.expt_name=deploy_maml

echo "cpu-queue5: all jobs done at $(date)"
