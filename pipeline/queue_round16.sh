#!/bin/bash
# Round-16 sequential TPU queue: run after queue15's stages A-C (perf
# study, adam benches, em5@200k bench, bf16 probes). Adds the
# fast-sampler accuracy probes that perf_round14 motivated (2.33x
# steps/s), re-runs bench.py's protocol decision data, then resumes the
# long training continuations from queue15 stages D-G.
#
# Usage: queue_round16.sh [wait_pid ...]
cd "$(dirname "$0")/.."
set -u

for WAIT_PID in "$@"; do
  echo "queue16: waiting for pid $WAIT_PID"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
  echo "queue16: pid $WAIT_PID done at $(date)"
done

newest_ckpt_dir() {  # out_dir expt_prefix
  for d in $(ls -dt "$1/$2"* 2>/dev/null); do
    if ls "$d"/checkpoint_step_*.pickle >/dev/null 2>&1; then
      echo "$d"; return
    fi
  done
}

# ---- stage A: fast-sampler 10k accuracy probes --------------------------
# same protocol as queue15's probe10k_{f32,bf16}; these two isolate the
# sampler axis (and the sampler+bf16 combination bench.py would adopt)
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
echo "queue16: fast-sampler 10k accuracy probe at $(date)"
timeout 14400 python -m metapde_tpu.cli.maml_pde "${PO_ARGS[@]}" \
  --task.sample_with_replacement=true --train.expt_name=probe10k_fast
echo "queue16: fast-sampler+bf16 10k accuracy probe at $(date)"
timeout 14400 python -m metapde_tpu.cli.maml_pde "${PO_ARGS[@]}" \
  --task.sample_with_replacement=true --model.compute_dtype=bfloat16 \
  --train.expt_name=probe10k_fast_bf16
bash pipeline/commit_ckpts.sh "fast-sampler 10k accuracy probes"

# ---- stages D-G of queue15 (verbatim) -----------------------------------
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
echo "queue16: sb3 continuation to 300k at $(date)"
bash pipeline/supervise.sh results_sburgers_maml sb3 40 900 -- \
  python -m metapde_tpu.cli.maml_pde "${SB_ARGS[@]}" \
    --task.n_eval=8 \
    --train.outer_steps=300001 --train.steps_per_call=500 \
    --train.log_every=5000 --train.val_every=1000 --train.viz_every=0 \
    --train.checkpoint_every=20000 \
    --train.out_dir=results_sburgers_maml --train.expt_name=sb3
bash pipeline/commit_ckpts.sh "sb3 continuation checkpoint"

D=$(newest_ckpt_dir results_sburgers_maml sb3)
if [ -n "${D:-}" ]; then
  echo "queue16: sb3 k-sweep bench (TPU) on continued $D at $(date)"
  timeout 5400 python -m metapde_tpu.cli.deploy_bench --algo=maml \
    "${SB_ARGS[@]}" --inner-steps-list=0,1,2,5,10,20,40,80 \
    --train.load_model_from_expt="$D"
  echo "queue16: sb3 k-sweep bench (TPU, best ckpt) on $D at $(date)"
  timeout 5400 python -m metapde_tpu.cli.deploy_bench --algo=maml \
    "${SB_ARGS[@]}" --inner-steps-list=0,1,2,5,10,20,40,80 \
    --checkpoint=best --train.load_model_from_expt="$D"
  echo "queue16: sb3 adam-deploy bench on continued $D at $(date)"
  timeout 5400 python -m metapde_tpu.cli.deploy_bench --algo=maml \
    "${SB_ARGS[@]}" --inner-steps-list=0,5,20,50,100 \
    --deploy.optimizer=adam --deploy.inner_lr=1e-3 \
    --train.load_model_from_expt="$D"
fi
bash pipeline/commit_ckpts.sh "sb3 continued benches"

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
echo "queue16: lde2 clean continuation (from lde1@28k) to 60k at $(date)"
bash pipeline/supervise.sh results_elasticity_leap lde2 40 900 -- \
  python -m metapde_tpu.cli.leap_pde "${LEAP_TRAIN_ARGS[@]}" \
    --train.outer_steps=60001 --train.steps_per_call=100 \
    --train.log_every=2000 --train.val_every=1000 --train.viz_every=0 \
    --train.checkpoint_every=4000 \
    --train.load_model_from_expt=results_elasticity_leap/lde1 \
    --train.out_dir=results_elasticity_leap --train.expt_name=lde2
bash pipeline/commit_ckpts.sh "lde2 clean-config 60k checkpoint"

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
  echo "queue16: lde2 clean deploy bench (TPU) on $D at $(date)"
  timeout 5400 python -m metapde_tpu.cli.deploy_bench --algo=leap \
    "${LDE2_BENCH_ARGS[@]}" --inner-steps-list=0,5,20,40 \
    --train.load_model_from_expt="$D"
  echo "queue16: lde2 clean deploy bench (TPU, best ckpt) on $D at $(date)"
  timeout 5400 python -m metapde_tpu.cli.deploy_bench --algo=leap \
    "${LDE2_BENCH_ARGS[@]}" --inner-steps-list=0,5,20,40 \
    --checkpoint=best --train.load_model_from_expt="$D"
fi
bash pipeline/commit_ckpts.sh "queue16: lde2 clean bench"

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
echo "queue16: em5 continuation to 500k at $(date)"
bash pipeline/supervise.sh results_elasticity_maml em5 60 900 -- \
  python -m metapde_tpu.cli.maml_pde "${ELAS_TRAIN_ARGS[@]}" \
    --train.outer_steps=500001 --train.steps_per_call=500 \
    --train.log_every=5000 --train.val_every=1000 --train.viz_every=0 \
    --train.checkpoint_every=20000 \
    --train.out_dir=results_elasticity_maml --train.expt_name=em5
bash pipeline/commit_ckpts.sh "em5 500k checkpoint"

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
  echo "queue16: em5 FINAL deploy bench (TPU, best ckpt) on $D at $(date)"
  timeout 5400 python -m metapde_tpu.cli.deploy_bench --algo=maml \
    "${ELAS_BENCH_ARGS[@]}" --inner-steps-list=0,1,2,5 \
    --checkpoint=best --train.load_model_from_expt="$D"
fi
bash pipeline/commit_ckpts.sh "queue16: em5 final bench"

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
echo "queue16: td_burgers continuation to 500k at $(date)"
bash pipeline/supervise.sh results_burgers_maml tpu_run1 60 900 -- \
  python -m metapde_tpu.cli.maml_pde "${BURGERS_ARGS[@]}" \
    --task.n_eval=4 \
    --train.outer_steps=500001 --train.steps_per_call=500 \
    --train.log_every=5000 --train.val_every=1000 --train.viz_every=0 \
    --train.checkpoint_every=20000 \
    --train.out_dir=results_burgers_maml --train.expt_name=tpu_run1
bash pipeline/commit_ckpts.sh "td_burgers 500k checkpoint"

D=$(newest_ckpt_dir results_burgers_maml tpu_run1)
if [ -n "${D:-}" ]; then
  echo "queue16: td_burgers FINAL deploy bench (TPU, best ckpt) on $D at $(date)"
  timeout 5400 python -m metapde_tpu.cli.deploy_bench --algo=maml \
    "${BURGERS_ARGS[@]}" --task.n_eval=8 --inner-steps-list=0,1,2,5 \
    --checkpoint=best --train.load_model_from_expt="$D"
fi

bash pipeline/commit_ckpts.sh "queue16 final artifacts"
echo "queue16: done at $(date)"
