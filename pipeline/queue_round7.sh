#!/bin/bash
# Round-7 sequential TPU queue (ONE TPU process at a time). Recovers the
# orphaned tail of queue_round6.sh (its parent died with a session crash;
# only the bm6 supervisor survived) and then finishes the elasticity
# story against the v3 oracle (fem_elasticity.solve_direct + ligament
# resolution floor, gt_version=3):
#
#   1. wait for the bm6 supervisor to drain (td_burgers MAML -> 500k)
#   2. bm6 deploy bench refresh: CPU gt pre-warm, then TPU k-sweep
#   3. hyperelasticity MAML em5 continuation 210k -> 500k:
#      CPU v3 gt-cache pre-warm, then supervised TPU run
#   4. em5 deploy bench (v3 oracle, res-48 protocol, 8 fresh tasks)
#   5. lde1_1 (elasticity LEAP) deploy bench re-measured vs v3
#
# Usage: queue_round7.sh [wait_pid ...]
cd "$(dirname "$0")/.."
set -u

for WAIT_PID in "$@"; do
  echo "queue7: waiting for pid $WAIT_PID"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
  echo "queue7: pid $WAIT_PID done at $(date)"
done

newest_ckpt_dir() {  # out_dir expt_prefix
  for d in $(ls -dt "$1/$2"* 2>/dev/null); do
    if ls "$d"/checkpoint_step_*.pickle >/dev/null 2>&1; then
      echo "$d"; return
    fi
  done
}

# ---------------- 2. bm6 deploy bench (from queue6's dead tail) -------
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
  echo "queue7: burgers gt pre-warm (CPU) for $D"
  env PYTHONPATH= JAX_PLATFORMS=cpu timeout 7200 \
    python -m metapde_tpu.cli.deploy_bench --algo=maml \
      "${BURGERS_ARGS[@]}" --task.n_eval=8 --inner-steps-list=0 \
      --train.load_model_from_expt="$D"
  echo "queue7: burgers MAML deploy bench (TPU) on $D"
  timeout 3600 python -m metapde_tpu.cli.deploy_bench --algo=maml \
    "${BURGERS_ARGS[@]}" --task.n_eval=8 --inner-steps-list=0,1,2,5 \
    --train.load_model_from_expt="$D"
fi

# ---------------- 3. em5 continuation to 500k (v3 oracle) -------------
# exact em5 training config (must match for gt-cache keys and a
# semantically clean Adam-state resume; see results_elasticity_maml/em5/
# config.json)
ELAS_ARGS=(
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

# v3 gt pre-warm: gt_version bumped 2->3, so every validation solve is a
# cache miss; run it on CPU first (the oracle's first TPU-process
# execution can crash the axon worker in flaky tunnel windows, and the
# ligament-floored near-limit tasks are minutes-long host solves anyway).
echo "queue7: CPU v3 gt pre-warm for results_elasticity_maml"
env PYTHONPATH= JAX_PLATFORMS=cpu timeout 14400 \
  python -m metapde_tpu.cli.maml_pde "${ELAS_ARGS[@]}" \
    --train.outer_steps=1 --train.steps_per_call=1 \
    --train.log_every=1 --train.val_every=100 --train.viz_every=0 \
    --train.checkpoint_every=0 \
    --train.out_dir=results_elasticity_maml --train.expt_name=gtwarm_elas_v3

echo "queue7: supervised em5 continuation to 500k"
bash pipeline/supervise.sh results_elasticity_maml em5 60 900 -- \
  python -m metapde_tpu.cli.maml_pde "${ELAS_ARGS[@]}" \
    --train.outer_steps=500001 --train.steps_per_call=500 \
    --train.log_every=5000 --train.val_every=100 --train.viz_every=0 \
    --train.checkpoint_every=20000 \
    --train.load_model_from_expt=results_elasticity_maml/tpu_run1 \
    --train.out_dir=results_elasticity_maml --train.expt_name=em5

# ---------------- 4. em5 deploy bench (v3, res-48 protocol) -----------
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
  echo "queue7: elasticity gt pre-warm (CPU) for $D"
  env PYTHONPATH= JAX_PLATFORMS=cpu timeout 14400 \
    python -m metapde_tpu.cli.deploy_bench --algo=maml \
      "${ELAS_BENCH_ARGS[@]}" --inner-steps-list=0 \
      --train.load_model_from_expt="$D"
  echo "queue7: elasticity MAML deploy bench (TPU) on $D"
  timeout 3600 python -m metapde_tpu.cli.deploy_bench --algo=maml \
    "${ELAS_BENCH_ARGS[@]}" --inner-steps-list=0,1,2,5 \
    --train.load_model_from_expt="$D"
fi

# ---------------- 5. lde1_1 LEAP deploy bench re-measured vs v3 -------
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
  echo "queue7: LEAP elasticity gt pre-warm (CPU) for $D"
  env PYTHONPATH= JAX_PLATFORMS=cpu timeout 14400 \
    python -m metapde_tpu.cli.deploy_bench --algo=leap \
      "${LEAP_BENCH_ARGS[@]}" --inner-steps-list=0 \
      --train.load_model_from_expt="$D"
  echo "queue7: LEAP elasticity deploy bench (TPU) on $D"
  timeout 3600 python -m metapde_tpu.cli.deploy_bench --algo=leap \
    "${LEAP_BENCH_ARGS[@]}" --inner-steps-list=0,5,20,40 \
    --train.load_model_from_expt="$D"
fi

echo "queue7: all jobs done at $(date)"
