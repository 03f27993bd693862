#!/bin/bash
# Follow-on sequential TPU queue (ONE TPU process at a time — the axon
# relay wedges if two run concurrently): after the elasticity LEAP run
# (lde1, 60k steps) finishes,
#   1. elasticity LEAP deploy bench (CPU gt pre-warm, then TPU bench)
#   2. resume td_burgers LEAP ldb3 to the full 40k budget (supervised)
#   3. td_burgers LEAP deploy bench (CPU gt pre-warm, then TPU bench)
#
# Usage: queue_round3.sh [wait_pid]
#   wait_pid: optional PID of an already-running supervisor to wait for.
cd "$(dirname "$0")/.."
set -u

WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  echo "queue3: waiting for supervisor pid $WAIT_PID"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
  echo "queue3: pid $WAIT_PID done at $(date)"
fi

newest_ckpt_dir() {  # out_dir expt_prefix
  for d in $(ls -dt "$1/$2"* 2>/dev/null); do
    if ls "$d"/checkpoint_step_*.pickle >/dev/null 2>&1; then
      echo "$d"; return
    fi
  done
}

ELAS_BENCH_ARGS=(
  --task.pde=hyper_elasticity
  --task.domain.xmin=0.0 --task.domain.ymin=0.0
  --task.max_holes=5 --task.max_hole_size=0.5
  --task.vary_source=false --task.vary_bc=false
  --solver.ground_truth_resolution=48
  --model.num_layers=10 --model.layer_size=128 --model.omega=30 --model.omega0=30
  --leap.inner_steps=20 --leap.inner_lr=5e-6 --leap.outer_lr=5e-6 --leap.bsize=8
  --task.inner_points=2048 --task.outer_points=2048 --task.validation_points=1024
  --task.n_eval=8
)

# ---- 1. elasticity LEAP deploy bench ----
D=$(newest_ckpt_dir results_elasticity_leap lde1)
if [ -n "${D:-}" ]; then
  echo "queue3: elasticity gt pre-warm (CPU) for $D"
  env PYTHONPATH= JAX_PLATFORMS=cpu timeout 7200 \
    python -m metapde_tpu.cli.deploy_bench --algo=leap \
    "${ELAS_BENCH_ARGS[@]}" --inner-steps-list=0 \
    --train.load_model_from_expt="$D"
  echo "queue3: elasticity LEAP deploy bench (TPU) on $D"
  timeout 3600 python -m metapde_tpu.cli.deploy_bench --algo=leap \
    "${ELAS_BENCH_ARGS[@]}" --inner-steps-list=0,5,20,40 \
    --train.load_model_from_expt="$D"
fi

# ---- 2. td_burgers LEAP: resume ldb3 to the full 40k budget ----
bash pipeline/supervise.sh results_burgers_leap ldb3 40 900 -- \
  python -m metapde_tpu.cli.leap_pde --task.pde=td_burgers \
    --task.domain.xmin=0.0 --task.max_reynolds=100 \
    --task.vary_source=false --task.vary_bc=false --task.bc_weight=1.0 \
    --solver.ground_truth_resolution=512 --task.num_tsteps=201 \
    --model.num_layers=10 --model.layer_size=128 --model.omega=30 --model.omega0=30 \
    --leap.inner_steps=80 --leap.inner_lr=1e-6 --leap.outer_lr=5e-5 --leap.bsize=8 \
    --task.inner_points=2048 --task.outer_points=2048 --task.validation_points=1024 \
    --task.n_eval=4 \
    --train.outer_steps=40000 --train.log_every=500 --train.val_every=100 \
    --train.viz_every=10000 --train.checkpoint_every=2000 --train.steps_per_call=50 \
    --train.out_dir=results_burgers_leap --train.expt_name=ldb3

BURGERS_BENCH_ARGS=(
  --task.pde=td_burgers
  --task.domain.xmin=0.0 --task.max_reynolds=100
  --task.vary_source=false --task.vary_bc=false --task.bc_weight=1.0
  --solver.ground_truth_resolution=512 --task.num_tsteps=201
  --model.num_layers=10 --model.layer_size=128 --model.omega=30 --model.omega0=30
  --leap.inner_steps=80 --leap.inner_lr=1e-6 --leap.outer_lr=5e-5 --leap.bsize=8
  --task.inner_points=2048 --task.outer_points=2048 --task.validation_points=1024
  --task.n_eval=8
)

# ---- 3. td_burgers LEAP deploy bench ----
D=$(newest_ckpt_dir results_burgers_leap ldb3)
if [ -n "${D:-}" ]; then
  echo "queue3: burgers gt pre-warm (CPU) for $D"
  env PYTHONPATH= JAX_PLATFORMS=cpu timeout 7200 \
    python -m metapde_tpu.cli.deploy_bench --algo=leap \
    "${BURGERS_BENCH_ARGS[@]}" --inner-steps-list=0 \
    --train.load_model_from_expt="$D"
  echo "queue3: burgers LEAP deploy bench (TPU) on $D"
  timeout 3600 python -m metapde_tpu.cli.deploy_bench --algo=leap \
    "${BURGERS_BENCH_ARGS[@]}" --inner-steps-list=0,5,20,80 \
    --train.load_model_from_expt="$D"
fi

echo "queue3: all jobs done at $(date)"
