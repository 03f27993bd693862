#!/bin/bash
# Sequential TPU job queue for this round (ONE TPU process at a time — the
# axon relay wedges if two run concurrently). Each training job runs under
# supervise.sh (crash/stall recovery with checkpoint resume); each completed
# family gets a deploy_bench k-sweep refresh against its newest checkpoint.
#
# Usage: queue_round2.sh [wait_pid]
#   wait_pid: optional PID of an already-running supervisor to wait for
#             before starting the queue (e.g. the poisson LEAP launch).
cd "$(dirname "$0")/.."
set -u

WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  echo "queue: waiting for supervisor pid $WAIT_PID"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
  echo "queue: pid $WAIT_PID done at $(date)"
fi

newest_ckpt_dir() {  # out_dir expt_prefix
  for d in $(ls -dt "$1/$2"* 2>/dev/null); do
    if ls "$d"/checkpoint_step_*.pickle >/dev/null 2>&1; then
      echo "$d"; return
    fi
  done
}

# ---- 1. poisson LEAP deploy bench (paper config, fresh tasks) ----
D=$(newest_ckpt_dir results_poisson_leap lp2)
if [ -n "${D:-}" ]; then
  echo "queue: poisson LEAP deploy bench on $D"
  timeout 3600 python -m metapde_tpu.cli.deploy_bench --algo=leap \
    --task.pde=poisson --solver.ground_truth_resolution=32 \
    --model.num_layers=5 --model.layer_size=64 --model.omega=30 --model.omega0=30 \
    --leap.inner_steps=60 --leap.inner_lr=2.5e-5 --leap.outer_lr=5e-5 --leap.bsize=8 \
    --task.inner_points=4096 --task.outer_points=4096 --task.validation_points=4096 \
    --task.n_eval=8 --inner-steps-list=0,5,20,60 \
    --train.load_model_from_expt="$D"
fi

# ---- 2. hyperelasticity LEAP: resume lde1 to the full 60k budget ----
bash pipeline/supervise.sh results_elasticity_leap lde1 40 900 -- \
  python -m metapde_tpu.cli.leap_pde --task.pde=hyper_elasticity \
    --task.domain.xmin=0.0 --task.domain.ymin=0.0 \
    --task.max_holes=5 --task.max_hole_size=0.5 \
    --task.vary_source=false --task.vary_bc=false \
    --solver.ground_truth_resolution=48 \
    --model.num_layers=10 --model.layer_size=128 --model.omega=30 --model.omega0=30 \
    --leap.inner_steps=20 --leap.inner_lr=5e-6 --leap.outer_lr=5e-6 \
    --leap.inner_grad_clip=1000 --leap.grad_clip=1000 --leap.bsize=8 \
    --task.inner_points=2048 --task.outer_points=2048 --task.validation_points=1024 \
    --task.n_eval=8 \
    --train.outer_steps=60000 --train.log_every=500 --train.val_every=100 \
    --train.viz_every=10000 --train.checkpoint_every=2000 --train.steps_per_call=50 \
    --train.out_dir=results_elasticity_leap --train.expt_name=lde1

D=$(newest_ckpt_dir results_elasticity_leap lde1)
if [ -n "${D:-}" ]; then
  echo "queue: elasticity LEAP deploy bench on $D"
  timeout 3600 python -m metapde_tpu.cli.deploy_bench --algo=leap \
    --task.pde=hyper_elasticity \
    --task.domain.xmin=0.0 --task.domain.ymin=0.0 \
    --task.max_holes=5 --task.max_hole_size=0.5 \
    --task.vary_source=false --task.vary_bc=false \
    --solver.ground_truth_resolution=48 \
    --model.num_layers=10 --model.layer_size=128 --model.omega=30 --model.omega0=30 \
    --leap.inner_steps=20 --leap.inner_lr=5e-6 --leap.outer_lr=5e-6 --leap.bsize=8 \
    --task.inner_points=2048 --task.outer_points=2048 --task.validation_points=1024 \
    --task.n_eval=8 --inner-steps-list=0,5,20,40 \
    --train.load_model_from_expt="$D"
fi

# ---- 3. td_burgers LEAP: resume ldb3 to the full 40k budget ----
bash pipeline/supervise.sh results_burgers_leap ldb3 40 900 -- \
  python -m metapde_tpu.cli.leap_pde --task.pde=td_burgers \
    --task.domain.xmin=0.0 --task.max_reynolds=100 \
    --task.vary_source=false --task.vary_bc=false \
    --solver.ground_truth_resolution=512 --task.num_tsteps=201 \
    --model.num_layers=10 --model.layer_size=128 --model.omega=30 --model.omega0=30 \
    --leap.inner_steps=80 --leap.inner_lr=1e-6 --leap.outer_lr=5e-5 --leap.bsize=8 \
    --task.inner_points=2048 --task.outer_points=2048 --task.validation_points=1024 \
    --task.n_eval=4 \
    --train.outer_steps=40000 --train.log_every=500 --train.val_every=100 \
    --train.viz_every=10000 --train.checkpoint_every=2000 --train.steps_per_call=50 \
    --train.out_dir=results_burgers_leap --train.expt_name=ldb3

D=$(newest_ckpt_dir results_burgers_leap ldb3)
if [ -n "${D:-}" ]; then
  echo "queue: burgers LEAP deploy bench on $D"
  timeout 3600 python -m metapde_tpu.cli.deploy_bench --algo=leap \
    --task.pde=td_burgers \
    --task.domain.xmin=0.0 --task.max_reynolds=100 \
    --task.vary_source=false --task.vary_bc=false \
    --solver.ground_truth_resolution=512 --task.num_tsteps=201 \
    --model.num_layers=10 --model.layer_size=128 --model.omega=30 --model.omega0=30 \
    --leap.inner_steps=80 --leap.inner_lr=1e-6 --leap.outer_lr=5e-5 --leap.bsize=8 \
    --task.inner_points=2048 --task.outer_points=2048 --task.validation_points=1024 \
    --task.n_eval=8 --inner-steps-list=0,5,20,80 \
    --train.load_model_from_expt="$D"
fi

echo "queue: all jobs done at $(date)"
