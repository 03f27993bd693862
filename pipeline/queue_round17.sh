#!/bin/bash
# Round-2 recovery queue: the queue15 orchestrator shell died mid-round
# (its supervise.sh child for the sb3 continuation survived, ppid 1), and
# the bf16/f32 accuracy probes it had launched both crashed in a flaky
# TPU-tunnel window before training a single step. This queue waits for
# the surviving sb3 supervise, then runs, in value order for the time
# remaining this round:
#   A. the 4 accuracy probes (f32 control / bf16 / fast-sampler /
#      fast+bf16) that gate adopting the 2.33x with-replacement sampler
#      and bf16 compute in the headline bench protocol,
#   B. the sb3 (steady-Burgers MAML) final k-sweep + adam-deploy benches,
#   C. the lde2 clean-config elasticity-LEAP re-earn to 60k + bench,
#   D. long-run continuations (em5, td_burgers) until the round ends.
# ONE TPU process at a time.
#
# Usage: queue_round17.sh [wait_pid ...]
cd "$(dirname "$0")/.."
set -u

for WAIT_PID in "$@"; do
  echo "queue17: waiting for pid $WAIT_PID"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
  echo "queue17: pid $WAIT_PID done at $(date)"
done

newest_ckpt_dir() {  # out_dir expt_prefix
  for d in $(ls -dt "$1/$2"* 2>/dev/null); do
    if ls "$d"/checkpoint_step_*.pickle >/dev/null 2>&1; then
      echo "$d"; return
    fi
  done
}

# ---- stage A: accuracy probes (flagship poisson config, 10k steps) ------
PO_ARGS=(
  --task.pde=poisson
  --task.inner_points=1024 --task.outer_points=1024
  --task.validation_points=1024 --task.n_eval=8
  --solver.ground_truth_resolution=32
  --model.num_layers=3 --model.layer_size=64 --model.omega=30 --model.omega0=30
  --maml.bsize=16 --maml.inner_steps=5 --maml.inner_lr=1e-4 --maml.outer_lr=1e-5
  --maml.grad_clip=100 --maml.inner_grad_clip=100
  --train.optimizer=adam
  --train.outer_steps=10001 --train.steps_per_call=500
  --train.log_every=1000 --train.val_every=500 --train.viz_every=0
  --train.checkpoint_every=10000
  --train.out_dir=results_poisson_maml
)
run_probe() {  # name extra_args...
  local NAME=$1; shift
  echo "queue17: probe $NAME at $(date)"
  # retry once: the 06:12 attempts died to a transient tunnel fault
  for ATTEMPT in 1 2; do
    timeout 1800 python -m metapde_tpu.cli.maml_pde "${PO_ARGS[@]}" \
      --train.expt_name="$NAME" "$@" && return
    echo "queue17: probe $NAME attempt $ATTEMPT failed; sleeping 120s"
    sleep 120
  done
}
run_probe probe10k_f32
run_probe probe10k_bf16 --model.compute_dtype=bfloat16
run_probe probe10k_fast --task.sample_with_replacement=true
run_probe probe10k_fast_bf16 --task.sample_with_replacement=true \
  --model.compute_dtype=bfloat16
bash pipeline/commit_ckpts.sh "10k accuracy probes: f32/bf16/fast-sampler"

# ---- stage B: sb3 final benches -----------------------------------------
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
D=$(newest_ckpt_dir results_sburgers_maml sb3)
if [ -n "${D:-}" ]; then
  echo "queue17: sb3 k-sweep bench (TPU) on continued $D at $(date)"
  timeout 3600 python -m metapde_tpu.cli.deploy_bench --algo=maml \
    "${SB_ARGS[@]}" --inner-steps-list=0,1,2,5,10,20,40,80 \
    --train.load_model_from_expt="$D"
  echo "queue17: sb3 k-sweep bench (TPU, best ckpt) on $D at $(date)"
  timeout 3600 python -m metapde_tpu.cli.deploy_bench --algo=maml \
    "${SB_ARGS[@]}" --inner-steps-list=0,1,2,5,10,20,40,80 \
    --checkpoint=best --train.load_model_from_expt="$D"
  echo "queue17: sb3 adam-deploy bench (lr=1e-4 won the 60k A/B) on $D at $(date)"
  timeout 3600 python -m metapde_tpu.cli.deploy_bench --algo=maml \
    "${SB_ARGS[@]}" --inner-steps-list=0,5,20,50,100 \
    --deploy.optimizer=adam --deploy.inner_lr=1e-4 \
    --train.load_model_from_expt="$D"
fi
bash pipeline/commit_ckpts.sh "sb3 300k benches"

# ---- stage C: lde2 clean-config LEAP re-earn ----------------------------
LEAP_TRAIN_ARGS=(
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
echo "queue17: lde2 clean continuation (from lde1@28k) to 60k at $(date)"
bash pipeline/supervise.sh results_elasticity_leap lde2 40 900 -- \
  python -m metapde_tpu.cli.leap_pde "${LEAP_TRAIN_ARGS[@]}" \
    --train.outer_steps=60001 --train.steps_per_call=100 \
    --train.log_every=2000 --train.val_every=1000 --train.viz_every=0 \
    --train.checkpoint_every=4000 \
    --train.load_model_from_expt=results_elasticity_leap/lde1 \
    --train.out_dir=results_elasticity_leap --train.expt_name=lde2
bash pipeline/commit_ckpts.sh "lde2 clean-config checkpoint"

LDE2_BENCH_ARGS=(
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
  echo "queue17: lde2 clean deploy bench (TPU, best ckpt) on $D at $(date)"
  timeout 3600 python -m metapde_tpu.cli.deploy_bench --algo=leap \
    "${LDE2_BENCH_ARGS[@]}" --inner-steps-list=0,5,20,40 \
    --checkpoint=best --train.load_model_from_expt="$D"
fi
bash pipeline/commit_ckpts.sh "lde2 clean bench"

# ---- stage D: long continuations until the round ends -------------------
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
echo "queue17: td_burgers continuation toward 500k at $(date)"
bash pipeline/supervise.sh results_burgers_maml tpu_run1 60 900 -- \
  python -m metapde_tpu.cli.maml_pde "${BURGERS_ARGS[@]}" \
    --task.n_eval=4 \
    --train.outer_steps=500001 --train.steps_per_call=500 \
    --train.log_every=5000 --train.val_every=1000 --train.viz_every=0 \
    --train.checkpoint_every=20000 \
    --train.out_dir=results_burgers_maml --train.expt_name=tpu_run1
bash pipeline/commit_ckpts.sh "td_burgers continuation checkpoint"
echo "queue17: done at $(date)"
