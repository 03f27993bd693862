#!/bin/bash
# Round-5 sequential TPU queue (ONE TPU process at a time): complete the
# hyperelasticity MAML family to the reference's FULL 500k-step budget —
# the one family×algo cell where we still trail the reference (ref ≈2e-3
# at 500k; ours 4.9e-3 mean / 3.3e-3 median at 110k). Elastic resume from
# results_elasticity_maml/tpu_run1 (step 60001, full opt/PRNG state).
#
#   1. CPU gt-cache pre-warm for the training out_dir (flaky-tunnel
#      mitigation: the FEM oracle's first TPU execution can crash the
#      worker; with the cache warm the TPU run never runs the solve).
#   2. supervised 500k-step MAML continuation (expt em5, ckpt every 20k).
#   3. deploy bench refresh: CPU gt pre-warm, then TPU k-sweep at the
#      res-48 conforming-oracle protocol, 8 fresh tasks.
#
# Usage: queue_round5.sh [wait_pid]
cd "$(dirname "$0")/.."
set -u

WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  echo "queue5: waiting for pid $WAIT_PID"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
  echo "queue5: pid $WAIT_PID done at $(date)"
fi

# exact tpu_run1/tpu_run2 training config (must match for gt-cache keys
# and for a semantically clean Adam-state resume)
TRAIN_ARGS=(
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

# ---- 1. CPU gt-cache pre-warm (expt name must NOT match the em5 glob
#         or the supervisor could pick it as a resume dir) ----
echo "queue5: CPU gt pre-warm for results_elasticity_maml"
env PYTHONPATH= JAX_PLATFORMS=cpu timeout 3600 \
  python -m metapde_tpu.cli.maml_pde "${TRAIN_ARGS[@]}" \
    --train.outer_steps=1 --train.steps_per_call=1 \
    --train.log_every=1 --train.val_every=100 --train.viz_every=0 \
    --train.checkpoint_every=0 \
    --train.out_dir=results_elasticity_maml --train.expt_name=gtwarm_elas

# ---- 2. supervised 500k continuation ----
bash pipeline/supervise.sh results_elasticity_maml em5 60 900 -- \
  python -m metapde_tpu.cli.maml_pde "${TRAIN_ARGS[@]}" \
    --train.outer_steps=500001 --train.steps_per_call=500 \
    --train.log_every=5000 --train.val_every=100 --train.viz_every=0 \
    --train.checkpoint_every=20000 \
    --train.load_model_from_expt=results_elasticity_maml/tpu_run1 \
    --train.out_dir=results_elasticity_maml --train.expt_name=em5

newest_ckpt_dir() {  # out_dir expt_prefix
  for d in $(ls -dt "$1/$2"* 2>/dev/null); do
    if ls "$d"/checkpoint_step_*.pickle >/dev/null 2>&1; then
      echo "$d"; return
    fi
  done
}

BENCH_ARGS=(
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
)

# ---- 3. deploy bench refresh on the newest em5 checkpoint ----
D=$(newest_ckpt_dir results_elasticity_maml em5)
if [ -n "${D:-}" ]; then
  echo "queue5: elasticity MAML gt pre-warm (CPU) for $D"
  env PYTHONPATH= JAX_PLATFORMS=cpu timeout 7200 \
    python -m metapde_tpu.cli.deploy_bench --algo=maml \
    "${BENCH_ARGS[@]}" --inner-steps-list=0 \
    --train.load_model_from_expt="$D"
  echo "queue5: elasticity MAML deploy bench (TPU) on $D"
  timeout 3600 python -m metapde_tpu.cli.deploy_bench --algo=maml \
    "${BENCH_ARGS[@]}" --inner-steps-list=0,2,5 \
    --train.load_model_from_expt="$D"
fi

echo "queue5: all jobs done at $(date)"
