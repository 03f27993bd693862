#!/bin/bash
# Round-13 sequential TPU queue (ONE TPU process at a time). This round's
# obligations (VERDICT round 1):
#   1. sb3 steady-Burgers k-sweep deploy bench @60k (adaptation-budget
#      attribution for the 2.1e-2 median gap; k>5 uses the padded
#      learned-LR stack)
#   2. sb3 meta-training continuation 60k -> 300k (the family is 60k vs
#      the 500k protocol; the k=0 init error 3.3e-2 says the init is
#      undertrained)
#   3. sb3 k-sweep bench at the continued checkpoint
#   4. TPU re-measurement of the deploy benches whose jsonl carries
#      CPU-host times (VERDICT item 10): em5 elasticity MAML @200k,
#      lde1_1 elasticity LEAP @60k, td_burgers tpu_run1 @60k
#   5. em5 continuation 200k -> 500k (VERDICT item 6)
#   6. td_burgers continuation 60k -> 500k (re-earning the lost bm6
#      weights, VERDICT item 6)
#   7. final benches at the new checkpoints
#
# Usage: queue_round13.sh [wait_pid ...]
cd "$(dirname "$0")/.."
set -u

for WAIT_PID in "$@"; do
  echo "queue13: waiting for pid $WAIT_PID"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
  echo "queue13: pid $WAIT_PID done at $(date)"
done

newest_ckpt_dir() {  # out_dir expt_prefix
  for d in $(ls -dt "$1/$2"* 2>/dev/null); do
    if ls "$d"/checkpoint_step_*.pickle >/dev/null 2>&1; then
      echo "$d"; return
    fi
  done
}

# ---------------- steady-Burgers (sb3 config, seed 0) ------------------
SB_ARGS=(
  --task.pde=steady_burgers
  --task.max_reynolds=10 --task.max_holes=4 --task.max_hole_size=0.3
  --task.bc_weight=10.0
  --task.inner_points=1024 --task.outer_points=1024
  --task.validation_points=1024 --task.n_eval=8
  --solver.ground_truth_resolution=48
  --model.num_layers=5 --model.layer_size=64 --model.omega=30 --model.omega0=30
  --maml.bsize=8 --maml.inner_steps=5 --maml.inner_lr=1e-4 --maml.outer_lr=1e-5
  --maml.grad_clip=100 --maml.inner_grad_clip=100
  --train.optimizer=adam
)

# 1. k-sweep bench @60k
D=$(newest_ckpt_dir results_sburgers_maml sb3)
if [ -n "${D:-}" ]; then
  echo "queue13: sb3 k-sweep bench (TPU) on $D at $(date)"
  timeout 3600 python -m metapde_tpu.cli.deploy_bench --algo=maml \
    "${SB_ARGS[@]}" --inner-steps-list=0,1,2,5,10,20,40,80 \
    --train.load_model_from_expt="$D"
fi

# 2. sb3 continuation 60k -> 300k (same config; elastic resume restores
#    Adam states + PRNG + step from the newest sb3* checkpoint)
echo "queue13: sb3 continuation to 300k at $(date)"
bash pipeline/supervise.sh results_sburgers_maml sb3 40 900 -- \
  python -m metapde_tpu.cli.maml_pde "${SB_ARGS[@]}" \
    --task.n_eval=8 \
    --train.outer_steps=300001 --train.steps_per_call=500 \
    --train.log_every=5000 --train.val_every=100 --train.viz_every=0 \
    --train.checkpoint_every=20000 \
    --train.out_dir=results_sburgers_maml --train.expt_name=sb3
bash pipeline/commit_ckpts.sh "sb3 continuation checkpoint"

# 3. k-sweep bench at the continued checkpoint
D=$(newest_ckpt_dir results_sburgers_maml sb3)
if [ -n "${D:-}" ]; then
  echo "queue13: sb3 k-sweep bench (TPU) on continued $D at $(date)"
  timeout 3600 python -m metapde_tpu.cli.deploy_bench --algo=maml \
    "${SB_ARGS[@]}" --inner-steps-list=0,1,2,5,10,20,40,80 \
    --train.load_model_from_expt="$D"
fi

# ---------------- 4. TPU re-measured deploy benches (item 10) ----------
ELAS_BENCH_ARGS=(
  --task.pde=hyper_elasticity
  --task.domain.xmin=0.0 --task.domain.ymin=0.0
  --task.max_holes=5 --task.max_hole_size=1.0
  --task.vary_source=false --task.vary_bc=false
  --task.bc_weight=100.0
  --task.inner_points=1024 --task.outer_points=1024 --task.validation_points=1024
  --task.n_eval=8
  --solver.ground_truth_resolution=48
  --model.num_layers=8 --model.layer_size=64 --model.omega=30 --model.omega0=30
  --maml.bsize=8 --maml.inner_steps=5 --maml.inner_lr=1e-5 --maml.outer_lr=1e-5
  --maml.grad_clip=100 --maml.inner_grad_clip=100
  --train.optimizer=adam
)
D=$(newest_ckpt_dir results_elasticity_maml em5)
if [ -n "${D:-}" ]; then
  echo "queue13: em5 elasticity MAML deploy bench (TPU) on $D at $(date)"
  timeout 3600 python -m metapde_tpu.cli.deploy_bench --algo=maml \
    "${ELAS_BENCH_ARGS[@]}" --inner-steps-list=0,1,2,5 \
    --train.load_model_from_expt="$D"
fi

LEAP_BENCH_ARGS=(
  --task.pde=hyper_elasticity
  --task.domain.xmin=0.0 --task.domain.ymin=0.0
  --task.max_holes=5 --task.max_hole_size=0.5
  --task.vary_source=false --task.vary_bc=false
  --task.bc_weight=100.0
  --task.inner_points=2048 --task.outer_points=2048 --task.validation_points=1024
  --task.n_eval=8
  --solver.ground_truth_resolution=48
  --model.num_layers=10 --model.layer_size=128 --model.omega=30 --model.omega0=30
  --leap.bsize=8 --leap.inner_steps=20 --leap.inner_lr=5e-6 --leap.outer_lr=5e-6
  --leap.grad_clip=1000 --leap.inner_grad_clip=1000
  --train.optimizer=adam
)
D=$(newest_ckpt_dir results_elasticity_leap lde1_1)
if [ -n "${D:-}" ]; then
  echo "queue13: lde1_1 elasticity LEAP deploy bench (TPU) on $D at $(date)"
  timeout 3600 python -m metapde_tpu.cli.deploy_bench --algo=leap \
    "${LEAP_BENCH_ARGS[@]}" --inner-steps-list=0,5,20,40 \
    --train.load_model_from_expt="$D"
fi

BURGERS_ARGS=(
  --task.pde=td_burgers
  --task.domain.xmin=0.0 --task.domain.ymin=0.0
  --task.max_reynolds=100 --task.num_tsteps=201
  --task.vary_source=false --task.bc_weight=100.0
  --task.inner_points=1024 --task.outer_points=1024
  --task.validation_points=1024
  --solver.ground_truth_resolution=512
  --model.num_layers=8 --model.layer_size=64 --model.omega=30 --model.omega0=30
  --maml.bsize=8 --maml.inner_steps=5 --maml.inner_lr=1e-4 --maml.outer_lr=1e-5
  --maml.grad_clip=100 --maml.inner_grad_clip=100
  --train.optimizer=adam
)
D=$(newest_ckpt_dir results_burgers_maml tpu_run1)
if [ -n "${D:-}" ]; then
  echo "queue13: td_burgers MAML deploy bench (TPU) on $D at $(date)"
  timeout 3600 python -m metapde_tpu.cli.deploy_bench --algo=maml \
    "${BURGERS_ARGS[@]}" --task.n_eval=8 --inner-steps-list=0,1,2,5 \
    --train.load_model_from_expt="$D"
fi

# ---------------- 5. em5 continuation 200k -> 500k ---------------------
ELAS_TRAIN_ARGS=(
  --task.pde=hyper_elasticity
  --task.domain.xmin=0.0 --task.domain.ymin=0.0
  --task.max_holes=5 --task.max_hole_size=1.0
  --task.vary_source=false --task.vary_bc=false
  --task.bc_weight=100.0
  --task.inner_points=1024 --task.outer_points=1024
  --task.validation_points=1024 --task.n_eval=4
  --solver.ground_truth_resolution=32
  --model.num_layers=8 --model.layer_size=64 --model.omega=30 --model.omega0=30
  --maml.bsize=8 --maml.inner_steps=5 --maml.inner_lr=1e-5 --maml.outer_lr=1e-5
  --maml.grad_clip=100 --maml.inner_grad_clip=100
  --train.optimizer=adam
)
echo "queue13: em5 continuation to 500k at $(date)"
bash pipeline/supervise.sh results_elasticity_maml em5 60 900 -- \
  python -m metapde_tpu.cli.maml_pde "${ELAS_TRAIN_ARGS[@]}" \
    --train.outer_steps=500001 --train.steps_per_call=500 \
    --train.log_every=5000 --train.val_every=100 --train.viz_every=0 \
    --train.checkpoint_every=20000 \
    --train.out_dir=results_elasticity_maml --train.expt_name=em5
bash pipeline/commit_ckpts.sh "em5 500k checkpoint"

# em5 final bench
D=$(newest_ckpt_dir results_elasticity_maml em5)
if [ -n "${D:-}" ]; then
  echo "queue13: em5 FINAL deploy bench (TPU) on $D at $(date)"
  timeout 3600 python -m metapde_tpu.cli.deploy_bench --algo=maml \
    "${ELAS_BENCH_ARGS[@]}" --inner-steps-list=0,1,2,5 \
    --train.load_model_from_expt="$D"
fi

# ---------------- 6. td_burgers continuation 60k -> 500k ---------------
echo "queue13: td_burgers continuation to 500k at $(date)"
bash pipeline/supervise.sh results_burgers_maml tpu_run1 60 900 -- \
  python -m metapde_tpu.cli.maml_pde "${BURGERS_ARGS[@]}" \
    --task.n_eval=4 \
    --train.outer_steps=500001 --train.steps_per_call=500 \
    --train.log_every=5000 --train.val_every=100 --train.viz_every=0 \
    --train.checkpoint_every=20000 \
    --train.out_dir=results_burgers_maml --train.expt_name=tpu_run1
bash pipeline/commit_ckpts.sh "td_burgers 500k checkpoint"

# td_burgers final bench
D=$(newest_ckpt_dir results_burgers_maml tpu_run1)
if [ -n "${D:-}" ]; then
  echo "queue13: td_burgers FINAL deploy bench (TPU) on $D at $(date)"
  timeout 3600 python -m metapde_tpu.cli.deploy_bench --algo=maml \
    "${BURGERS_ARGS[@]}" --task.n_eval=8 --inner-steps-list=0,1,2,5 \
    --train.load_model_from_expt="$D"
fi

bash pipeline/commit_ckpts.sh "queue13 final artifacts"
echo "queue13: done at $(date)"
