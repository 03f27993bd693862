#!/bin/bash
# Round-2 final queue: replaces queue_round17.sh mid-flight. The poisson
# res-32 gt solve reproducibly kernel-faults the TPU worker on this
# tunnel window (3 crashes, all inside gt_cache.get_or_solve's on-device
# solve; steady-Burgers training on the same chip runs fine), which
# burned the f32 control probe's two attempts before the CPU cache
# prewarm landed. With the cache now warm, the probes are pure cache
# hits; this queue finishes the remaining probes, re-runs the f32
# control, then the sb3 benches and the lde2 re-earn until round end.
# ONE TPU process at a time.
#
# Usage: queue_round18.sh [wait_pid ...]
cd "$(dirname "$0")/.."
set -u

for WAIT_PID in "$@"; do
  echo "queue18: waiting for pid $WAIT_PID"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
  echo "queue18: pid $WAIT_PID done at $(date)"
done

newest_ckpt_dir() {  # out_dir expt_prefix
  for d in $(ls -dt "$1/$2"* 2>/dev/null); do
    if ls "$d"/checkpoint_step_*.pickle >/dev/null 2>&1; then
      echo "$d"; return
    fi
  done
}

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
  echo "queue18: probe $NAME at $(date)"
  for ATTEMPT in 1 2; do
    timeout 1800 python -m metapde_tpu.cli.maml_pde "${PO_ARGS[@]}" \
      --train.expt_name="$NAME" "$@" && return
    echo "queue18: probe $NAME attempt $ATTEMPT failed; sleeping 120s"
    sleep 120
  done
}
run_probe probe10k_fast --task.sample_with_replacement=true
run_probe probe10k_fast_bf16 --task.sample_with_replacement=true \
  --model.compute_dtype=bfloat16
run_probe probe10k_f32
bash pipeline/commit_ckpts.sh "10k accuracy probes: f32 control, bf16, fast sampler"

# ---- sb3 final benches ----------------------------------------------------
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
  echo "queue18: sb3 k-sweep bench (TPU) on continued $D at $(date)"
  timeout 3600 python -m metapde_tpu.cli.deploy_bench --algo=maml \
    "${SB_ARGS[@]}" --inner-steps-list=0,1,2,5,10,20,40,80 \
    --train.load_model_from_expt="$D"
  echo "queue18: sb3 k-sweep bench (TPU, best ckpt) on $D at $(date)"
  timeout 3600 python -m metapde_tpu.cli.deploy_bench --algo=maml \
    "${SB_ARGS[@]}" --inner-steps-list=0,1,2,5,10,20,40,80 \
    --checkpoint=best --train.load_model_from_expt="$D"
  echo "queue18: sb3 adam-deploy bench (lr=1e-4) on $D at $(date)"
  timeout 3600 python -m metapde_tpu.cli.deploy_bench --algo=maml \
    "${SB_ARGS[@]}" --inner-steps-list=0,5,20,50,100 \
    --deploy.optimizer=adam --deploy.inner_lr=1e-4 \
    --train.load_model_from_expt="$D"
fi
bash pipeline/commit_ckpts.sh "sb3 300k benches"

# ---- lde2 clean-config LEAP re-earn (runs until the round ends) ----------
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
echo "queue18: lde2 clean continuation (from lde1@28k) to 60k at $(date)"
bash pipeline/supervise.sh results_elasticity_leap lde2 40 900 -- \
  python -m metapde_tpu.cli.leap_pde "${LEAP_TRAIN_ARGS[@]}" \
    --train.outer_steps=60001 --train.steps_per_call=100 \
    --train.log_every=2000 --train.val_every=1000 --train.viz_every=0 \
    --train.checkpoint_every=4000 \
    --train.load_model_from_expt=results_elasticity_leap/lde1 \
    --train.out_dir=results_elasticity_leap --train.expt_name=lde2
bash pipeline/commit_ckpts.sh "lde2 clean-config checkpoint"
echo "queue18: done at $(date)"
