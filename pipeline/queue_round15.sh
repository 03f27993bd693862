#!/bin/bash
# Round-15 sequential TPU queue: continuation of queue_round14.sh after a
# deliberate mid-queue swap (stages 1-4 of queue14 = the deploy re-benches
# are done; this queue inserts the perf-study block and the new
# deploy-optimizer benches before resuming the long training
# continuations). ONE TPU process at a time.
#
# Usage: queue_round15.sh [wait_pid ...]
cd "$(dirname "$0")/.."
set -u

for WAIT_PID in "$@"; do
  echo "queue15: waiting for pid $WAIT_PID"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
  echo "queue15: pid $WAIT_PID done at $(date)"
done

newest_ckpt_dir() {  # out_dir expt_prefix
  for d in $(ls -dt "$1/$2"* 2>/dev/null); do
    if ls "$d"/checkpoint_step_*.pickle >/dev/null 2>&1; then
      echo "$d"; return
    fi
  done
}

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

# ---- stage A: perf-study block (width-128 control, bf16, fast sampler) --
bash pipeline/perf_round14.sh baselines/perf_round14.jsonl
bash pipeline/commit_ckpts.sh "perf14 roofline variants"

# ---- stage B: sb3 Adam-mode deploy k-sweep @60k (deploy.optimizer) ------
# two LRs bracket the fine-tune protocol's effective step size
D=$(newest_ckpt_dir results_sburgers_maml sb3)
if [ -n "${D:-}" ]; then
  for LR in 1e-3 1e-4; do
    echo "queue15: sb3 adam-deploy bench lr=$LR on $D at $(date)"
    timeout 5400 python -m metapde_tpu.cli.deploy_bench --algo=maml \
      "${SB_ARGS[@]}" --inner-steps-list=0,5,20,50,100 \
      --deploy.optimizer=adam --deploy.inner_lr=$LR \
      --train.load_model_from_expt="$D"
    mv "$D/deploy_bench_adam.jsonl" "$D/deploy_bench_adam_${LR}.jsonl"
  done
fi
bash pipeline/commit_ckpts.sh "sb3 adam-deploy benches @60k"

# ---- stage B2: em5@200k TPU deploy bench ---------------------------------
# the CPU A/B (RESULTS.md round-2 checkpoint-selection section) showed the
# em5 trajectory regressed after 200k; the 200k checkpoint is the
# best-known elasticity MAML init, so its TPU-timed rows are the headline
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
echo "queue15: em5@200k deploy bench (TPU) at $(date)"
timeout 5400 python -m metapde_tpu.cli.deploy_bench --algo=maml \
  "${ELAS_BENCH_ARGS[@]}" --inner-steps-list=0,1,2,5 \
  --train.load_model_from_expt=results_elasticity_maml/em5
bash pipeline/commit_ckpts.sh "em5@200k TPU deploy bench"

# ---- stage C: bf16 vs f32 accuracy probe (10k-step flagship trainings) --
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
echo "queue15: f32 10k accuracy probe at $(date)"
timeout 14400 python -m metapde_tpu.cli.maml_pde "${PO_ARGS[@]}" \
  --train.expt_name=probe10k_f32
echo "queue15: bf16 10k accuracy probe at $(date)"
timeout 14400 python -m metapde_tpu.cli.maml_pde "${PO_ARGS[@]}" \
  --model.compute_dtype=bfloat16 --train.expt_name=probe10k_bf16
bash pipeline/commit_ckpts.sh "bf16 vs f32 10k accuracy probes"

# ---- stage D: sb3 continuation 60k -> 300k + re-benches -----------------
echo "queue15: sb3 continuation to 300k at $(date)"
bash pipeline/supervise.sh results_sburgers_maml sb3 40 900 -- \
  python -m metapde_tpu.cli.maml_pde "${SB_ARGS[@]}" \
    --task.n_eval=8 \
    --train.outer_steps=300001 --train.steps_per_call=500 \
    --train.log_every=5000 --train.val_every=100 --train.viz_every=0 \
    --train.checkpoint_every=20000 \
    --train.out_dir=results_sburgers_maml --train.expt_name=sb3
bash pipeline/commit_ckpts.sh "sb3 continuation checkpoint"

D=$(newest_ckpt_dir results_sburgers_maml sb3)
if [ -n "${D:-}" ]; then
  echo "queue15: sb3 k-sweep bench (TPU) on continued $D at $(date)"
  timeout 5400 python -m metapde_tpu.cli.deploy_bench --algo=maml \
    "${SB_ARGS[@]}" --inner-steps-list=0,1,2,5,10,20,40,80 \
    --train.load_model_from_expt="$D"
  echo "queue15: sb3 k-sweep bench (TPU, best ckpt) on $D at $(date)"
  timeout 5400 python -m metapde_tpu.cli.deploy_bench --algo=maml \
    "${SB_ARGS[@]}" --inner-steps-list=0,1,2,5,10,20,40,80 \
    --checkpoint=best --train.load_model_from_expt="$D"
  echo "queue15: sb3 adam-deploy bench on continued $D at $(date)"
  timeout 5400 python -m metapde_tpu.cli.deploy_bench --algo=maml \
    "${SB_ARGS[@]}" --inner-steps-list=0,5,20,50,100 \
    --deploy.optimizer=adam --deploy.inner_lr=1e-3 \
    --train.load_model_from_expt="$D"
fi
bash pipeline/commit_ckpts.sh "sb3 continued benches"

# ---- stage E: lde2 clean-config LEAP re-earn (VERDICT item 8) -----------
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
echo "queue15: lde2 clean continuation (from lde1@28k) to 60k at $(date)"
bash pipeline/supervise.sh results_elasticity_leap lde2 40 900 -- \
  python -m metapde_tpu.cli.leap_pde "${LEAP_TRAIN_ARGS[@]}" \
    --train.outer_steps=60001 --train.steps_per_call=100 \
    --train.log_every=2000 --train.val_every=100 --train.viz_every=0 \
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
  echo "queue15: lde2 clean deploy bench (TPU) on $D at $(date)"
  timeout 5400 python -m metapde_tpu.cli.deploy_bench --algo=leap \
    "${LDE2_BENCH_ARGS[@]}" --inner-steps-list=0,5,20,40 \
    --train.load_model_from_expt="$D"
fi
bash pipeline/commit_ckpts.sh "queue15: lde2 clean bench"

# ---- stage F: em5 continuation 270k -> 500k (VERDICT item 6) ------------
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
echo "queue15: em5 continuation to 500k at $(date)"
bash pipeline/supervise.sh results_elasticity_maml em5 60 900 -- \
  python -m metapde_tpu.cli.maml_pde "${ELAS_TRAIN_ARGS[@]}" \
    --train.outer_steps=500001 --train.steps_per_call=500 \
    --train.log_every=5000 --train.val_every=100 --train.viz_every=0 \
    --train.checkpoint_every=20000 \
    --train.out_dir=results_elasticity_maml --train.expt_name=em5
bash pipeline/commit_ckpts.sh "em5 500k checkpoint"

D=$(newest_ckpt_dir results_elasticity_maml em5)
if [ -n "${D:-}" ]; then
  echo "queue15: em5 FINAL deploy bench (TPU, best ckpt) on $D at $(date)"
  timeout 5400 python -m metapde_tpu.cli.deploy_bench --algo=maml \
    "${ELAS_BENCH_ARGS[@]}" --inner-steps-list=0,1,2,5 \
    --checkpoint=best --train.load_model_from_expt="$D"
fi
bash pipeline/commit_ckpts.sh "queue15: em5 final bench"

# ---- stage G: td_burgers continuation 60k -> 500k -----------------------
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
echo "queue15: td_burgers continuation to 500k at $(date)"
bash pipeline/supervise.sh results_burgers_maml tpu_run1 60 900 -- \
  python -m metapde_tpu.cli.maml_pde "${BURGERS_ARGS[@]}" \
    --task.n_eval=4 \
    --train.outer_steps=500001 --train.steps_per_call=500 \
    --train.log_every=5000 --train.val_every=100 --train.viz_every=0 \
    --train.checkpoint_every=20000 \
    --train.out_dir=results_burgers_maml --train.expt_name=tpu_run1
bash pipeline/commit_ckpts.sh "td_burgers 500k checkpoint"

D=$(newest_ckpt_dir results_burgers_maml tpu_run1)
if [ -n "${D:-}" ]; then
  echo "queue15: td_burgers FINAL deploy bench (TPU, best ckpt) on $D at $(date)"
  timeout 5400 python -m metapde_tpu.cli.deploy_bench --algo=maml \
    "${BURGERS_ARGS[@]}" --task.n_eval=8 --inner-steps-list=0,1,2,5 \
    --checkpoint=best --train.load_model_from_expt="$D"
fi

bash pipeline/commit_ckpts.sh "queue15 final artifacts"
echo "queue15: done at $(date)"
