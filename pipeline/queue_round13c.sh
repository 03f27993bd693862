#!/bin/bash
# Round-13c TPU queue (chained after queue_round13.sh): re-earn the
# elasticity-LEAP number on a clean config (VERDICT item 8). lde1 is the
# drift-free bc_weight=1.0 trajectory (the reference protocol,
# /root/reference/pipeline/pipeline_leap_meta.sh:9); lde1_1 drifted to
# bc_weight=100. Continue lde1 from its 28k checkpoint to 60k with the
# SAME config (elastic resume), then k-sweep deploy bench it.
#
# Usage: queue_round13c.sh [wait_pid ...]
cd "$(dirname "$0")/.."
set -u

for WAIT_PID in "$@"; do
  echo "queue13c: waiting for pid $WAIT_PID"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
  echo "queue13c: pid $WAIT_PID done at $(date)"
done

LEAP_ARGS=(
  --task.pde=hyper_elasticity
  --task.domain.xmin=0.0 --task.domain.ymin=0.0
  --task.max_holes=5 --task.max_hole_size=0.5
  --task.vary_source=false --task.vary_bc=false
  --task.bc_weight=1.0
  --task.inner_points=2048 --task.outer_points=2048
  --task.validation_points=1024 --task.n_eval=4
  --solver.ground_truth_resolution=32
  --model.num_layers=10 --model.layer_size=128 --model.omega=30 --model.omega0=30
  --leap.bsize=8 --leap.inner_steps=20 --leap.inner_lr=5e-6 --leap.outer_lr=5e-6
  --leap.grad_clip=1000 --leap.inner_grad_clip=1000
  --train.optimizer=adam
)

# expt prefix lde2: supervise's resume glob must NOT match the drifted
# lde1_1 dir (prefix "lde1" would); first launch seeds from lde1@28k,
# retries resume from the newest lde2* checkpoint (supervise appends its
# own --train.load_model_from_expt, which wins).
echo "queue13c: lde2 clean continuation (from lde1@28k) to 60k at $(date)"
bash pipeline/supervise.sh results_elasticity_leap lde2 40 900 -- \
  python -m metapde_tpu.cli.leap_pde "${LEAP_ARGS[@]}" \
    --train.outer_steps=60001 --train.steps_per_call=100 \
    --train.log_every=2000 --train.val_every=100 --train.viz_every=0 \
    --train.checkpoint_every=4000 \
    --train.load_model_from_expt=results_elasticity_leap/lde1 \
    --train.out_dir=results_elasticity_leap --train.expt_name=lde2
bash pipeline/commit_ckpts.sh "lde2 clean-config 60k checkpoint"

newest_ckpt_dir() {
  for d in $(ls -dt "$1/$2"* 2>/dev/null); do
    if ls "$d"/checkpoint_step_*.pickle >/dev/null 2>&1; then
      echo "$d"; return
    fi
  done
}

# deploy bench at res-48 (the measurement protocol); gt cache is warm
# from the lde1_1 benches (same tasks: cache keys are task+seed, not init)
BENCH_ARGS=(
  --task.pde=hyper_elasticity
  --task.domain.xmin=0.0 --task.domain.ymin=0.0
  --task.max_holes=5 --task.max_hole_size=0.5
  --task.vary_source=false --task.vary_bc=false
  --task.bc_weight=1.0
  --task.inner_points=2048 --task.outer_points=2048 --task.validation_points=1024
  --task.n_eval=8
  --solver.ground_truth_resolution=48
  --model.num_layers=10 --model.layer_size=128 --model.omega=30 --model.omega0=30
  --leap.bsize=8 --leap.inner_steps=20 --leap.inner_lr=5e-6 --leap.outer_lr=5e-6
  --leap.grad_clip=1000 --leap.inner_grad_clip=1000
  --train.optimizer=adam
)
D=$(newest_ckpt_dir results_elasticity_leap lde2)
if [ -n "${D:-}" ]; then
  echo "queue13c: lde2 clean deploy bench (TPU) on $D at $(date)"
  timeout 3600 python -m metapde_tpu.cli.deploy_bench --algo=leap \
    "${BENCH_ARGS[@]}" --inner-steps-list=0,5,20,40 \
    --train.load_model_from_expt="$D"
fi

bash pipeline/commit_ckpts.sh "queue13c artifacts"
echo "queue13c: done at $(date)"
