#!/bin/bash
# CPU-only gt-cache pre-warm queue: front-runs the cache misses that
# queue_round7.sh steps 2/4/5 would otherwise pay for on their first
# (crash-prone, tunnel-dependent) TPU execution. Safe to run while the
# axon tunnel is down: everything here is JAX_PLATFORMS=cpu, and the
# gt cache is content-addressed on (pde, hparams, params) with
# backend-independent PRNG-key-byte keys, so queue7's later re-runs
# become pure cache hits. ONE job at a time (1-core VM).
#
# Usage: queue_cpu_prewarm.sh   (no wait pids: starts immediately)
cd "$(dirname "$0")/.."
set -u

newest_ckpt_dir() {  # out_dir expt_prefix
  for d in $(ls -dt "$1/$2"* 2>/dev/null); do
    if ls "$d"/checkpoint_step_*.pickle >/dev/null 2>&1; then
      echo "$d"; return
    fi
  done
}

# ------- 1. em5 elasticity MAML deploy-bench gt (v3, res 48, hole 1.0) ----
# near-limit family: ligament-floored host solves take minutes-hours each
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
  echo "prewarm: em5 elasticity gt (CPU) for $D at $(date)"
  env PYTHONPATH= JAX_PLATFORMS=cpu timeout 28800 \
    python -m metapde_tpu.cli.deploy_bench --algo=maml \
      "${ELAS_BENCH_ARGS[@]}" --inner-steps-list=0 \
      --train.load_model_from_expt="$D"
fi

# ------- 2. lde1 elasticity LEAP deploy-bench gt (v3, res 48, hole 0.5) ---
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
D=$(newest_ckpt_dir results_elasticity_leap lde1)
if [ -n "${D:-}" ]; then
  echo "prewarm: lde1 LEAP elasticity gt (CPU) for $D at $(date)"
  env PYTHONPATH= JAX_PLATFORMS=cpu timeout 28800 \
    python -m metapde_tpu.cli.deploy_bench --algo=leap \
      "${LEAP_BENCH_ARGS[@]}" --inner-steps-list=0 \
      --train.load_model_from_expt="$D"
fi

# ------- 3. bm6 td_burgers MAML deploy-bench gt (FV res 512) --------------
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
D=$(newest_ckpt_dir results_burgers_maml bm6)
if [ -n "${D:-}" ]; then
  echo "prewarm: bm6 burgers gt (CPU) for $D at $(date)"
  env PYTHONPATH= JAX_PLATFORMS=cpu timeout 7200 \
    python -m metapde_tpu.cli.deploy_bench --algo=maml \
      "${BURGERS_ARGS[@]}" --task.n_eval=8 --inner-steps-list=0 \
      --train.load_model_from_expt="$D"
fi

echo "prewarm: all done at $(date)"
