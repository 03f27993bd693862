#!/bin/bash
# Follow-on sequential CPU queue after cpu_queue_round3.sh (ONE CPU core).
# Rewritten after the v3 oracle landed (fem_elasticity.solve_direct +
# ligament resolution floor, gt_version=3):
#
#   1. hyperelasticity MAML deployment fine-tune sweep, re-run against
#      the v3 oracle — the previous seeds were validated against v2
#      cached ground truths the Krylov cascade had left on the wrong
#      energy branch for hard pore geometries (junk; dirs removed first).
#   2. steady-Burgers MAML deployment fine-tune sweep (8 seeds) from the
#      sb3 60k-step init — the last family without a deployment sweep.
#   3. hyperelasticity oracle per-task diagnostic at the operational
#      protocol only (res 48 vs the f64 res-96 reference). The original
#      12/24/48 sweep is pointless now: the ligament floor maps all
#      coarse requests for near-limit tasks to the same floored solve.
#
# Usage: cpu_queue_round4.sh [wait_pid]
cd "$(dirname "$0")/.."
set -u
export PYTHONPATH= JAX_PLATFORMS=cpu

WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  echo "cpu-queue4: waiting for pid $WAIT_PID"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
  echo "cpu-queue4: pid $WAIT_PID done at $(date)"
fi

newest_ckpt_dir() {  # out_dir expt_prefix
  for d in $(ls -dt "$1/$2"* 2>/dev/null); do
    if ls "$d"/checkpoint_step_*.pickle >/dev/null 2>&1; then
      echo "$d"; return
    fi
  done
}

# ---- 1. elasticity MAML deployment sweep, v3 oracle ----
echo "cpu-queue4: removing v2-validated junk deploy_maml seed dirs"
rm -rf results_elasticity_deploy/deploy_maml_seed_*

D=$(newest_ckpt_dir results_elasticity_maml em5)
[ -z "${D:-}" ] && D=results_elasticity_maml/tpu_run1
echo "cpu-queue4: elasticity MAML deployment sweep (v3 oracle) from $D"
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

# ---- 2. steady-Burgers MAML deployment sweep (config mirrors sb3) ----
echo "cpu-queue4: steady-burgers MAML deployment sweep"
python -m metapde_tpu.cli.sweep --driver=nn_pde_maml --seeds=1,2,3,4,5,6,7,8 -- \
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

# ---- 3. elasticity oracle per-task diagnostic (operational protocol) ----
echo "cpu-queue4: elasticity per-task oracle diagnostic (res 48 vs f64 96)"
timeout 21600 python -m metapde_tpu.cli.gt_convergence --per_task \
  --task.pde=hyper_elasticity \
  --task.domain.xmin=0.0 --task.domain.ymin=0.0 \
  --task.max_holes=5 --task.max_hole_size=0.5 \
  --task.vary_source=false --task.vary_bc=false \
  --resolutions=48 --ref_resolution=96 --n_tasks=8 \
  | tee baselines/hyper_elasticity/per_task_diagnostic.jsonl

echo "cpu-queue4: all jobs done at $(date)"
