#!/bin/bash
# Round-6 sequential TPU queue: complete td_burgers MAML to the
# reference's FULL 500k-step budget (ref MAML ~1e-3 at 500k; ours
# 1.2e-3 mean / 6.9e-4 median at 120k, but the 120k run kept no
# checkpoint — resume from tpu_run1 @ 60001 which has full opt/PRNG
# state). Config mirrors results_burgers_maml/tpu_run1/config.json
# exactly (gt-cache keys + clean Adam resume + drift check).
#
#   1. wait for the round-3b and round-5 queues (both TPU) to drain
#   2. CPU gt-cache pre-warm for the training out_dir
#   3. supervised 500k-step MAML continuation (expt bm6, ckpt every 20k)
#   4. deploy bench refresh: CPU gt pre-warm, then TPU k-sweep, 8 tasks
#
# Usage: queue_round6.sh [wait_pid ...]
cd "$(dirname "$0")/.."
set -u

for WAIT_PID in "$@"; do
  echo "queue6: waiting for pid $WAIT_PID"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
  echo "queue6: pid $WAIT_PID done at $(date)"
done

TRAIN_ARGS=(
  --task.pde=td_burgers
  --task.domain.xmin=0.0 --task.domain.ymin=0.0
  --task.max_reynolds=100 --task.num_tsteps=201
  --task.vary_source=false --task.bc_weight=100.0
  --task.inner_points=1024 --task.outer_points=1024
  --task.validation_points=1024 --task.n_eval=4
  --solver.ground_truth_resolution=512
  --model.num_layers=8 --model.layer_size=64 --model.omega=30 --model.omega0=30
  --maml.bsize=8 --maml.inner_steps=5 --maml.inner_lr=1e-4 --maml.outer_lr=1e-5
  --maml.grad_clip=100 --maml.inner_grad_clip=100
  --train.optimizer=adam
)

# ---- CPU gt-cache pre-warm (expt name must NOT match the bm6 glob) ----
echo "queue6: CPU gt pre-warm for results_burgers_maml"
env PYTHONPATH= JAX_PLATFORMS=cpu timeout 3600 \
  python -m metapde_tpu.cli.maml_pde "${TRAIN_ARGS[@]}" \
    --train.outer_steps=1 --train.steps_per_call=1 \
    --train.log_every=1 --train.val_every=100 --train.viz_every=0 \
    --train.checkpoint_every=0 \
    --train.out_dir=results_burgers_maml --train.expt_name=gtwarm_burgers

# ---- supervised 500k continuation ----
bash pipeline/supervise.sh results_burgers_maml bm6 60 900 -- \
  python -m metapde_tpu.cli.maml_pde "${TRAIN_ARGS[@]}" \
    --train.outer_steps=500001 --train.steps_per_call=500 \
    --train.log_every=5000 --train.val_every=100 --train.viz_every=0 \
    --train.checkpoint_every=20000 \
    --train.load_model_from_expt=results_burgers_maml/tpu_run1 \
    --train.out_dir=results_burgers_maml --train.expt_name=bm6

newest_ckpt_dir() {  # out_dir expt_prefix
  for d in $(ls -dt "$1/$2"* 2>/dev/null); do
    if ls "$d"/checkpoint_step_*.pickle >/dev/null 2>&1; then
      echo "$d"; return
    fi
  done
}

BENCH_ARGS=(
  "${TRAIN_ARGS[@]}"
)

# ---- deploy bench refresh ----
D=$(newest_ckpt_dir results_burgers_maml bm6)
if [ -n "${D:-}" ]; then
  echo "queue6: burgers gt pre-warm (CPU) for $D"
  env PYTHONPATH= JAX_PLATFORMS=cpu timeout 7200 \
    python -m metapde_tpu.cli.deploy_bench --algo=maml \
      "${BENCH_ARGS[@]}" --task.n_eval=8 --inner-steps-list=0 \
      --train.load_model_from_expt="$D"
  echo "queue6: burgers MAML deploy bench (TPU) on $D"
  timeout 3600 python -m metapde_tpu.cli.deploy_bench --algo=maml \
    "${BENCH_ARGS[@]}" --task.n_eval=8 --inner-steps-list=0,1,2,5 \
    --train.load_model_from_expt="$D"
fi

echo "queue6: all jobs done at $(date)"
