#!/bin/bash
# Relaunch of queue_round3.sh steps 2-3 only (the elasticity LEAP deploy
# bench of step 1 already completed). Reason for the relaunch: the first
# ldb3 resume attempt omitted --task.bc_weight=1.0, silently flipping the
# objective to the bc_weight=100 default mid-run (meta_loss jumped 500x);
# that run dir was removed and the flag is now explicit here and in
# queue_round3.sh. See also the resume config-drift warning in the
# training drivers this incident motivated.
cd "$(dirname "$0")/.."
set -u

# ---- td_burgers LEAP: resume ldb3 to the full 40k budget ----
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

newest_ckpt_dir() {  # out_dir expt_prefix
  for d in $(ls -dt "$1/$2"* 2>/dev/null); do
    if ls "$d"/checkpoint_step_*.pickle >/dev/null 2>&1; then
      echo "$d"; return
    fi
  done
}

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

# ---- td_burgers LEAP deploy bench ----
D=$(newest_ckpt_dir results_burgers_leap ldb3)
if [ -n "${D:-}" ]; then
  echo "queue3b: burgers gt pre-warm (CPU) for $D"
  env PYTHONPATH= JAX_PLATFORMS=cpu timeout 7200 \
    python -m metapde_tpu.cli.deploy_bench --algo=leap \
    "${BURGERS_BENCH_ARGS[@]}" --inner-steps-list=0 \
    --train.load_model_from_expt="$D"
  echo "queue3b: burgers LEAP deploy bench (TPU) on $D"
  timeout 3600 python -m metapde_tpu.cli.deploy_bench --algo=leap \
    "${BURGERS_BENCH_ARGS[@]}" --inner-steps-list=0,5,20,80 \
    --train.load_model_from_expt="$D"
fi

echo "queue3b: all jobs done at $(date)"
