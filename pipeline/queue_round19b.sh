#!/bin/bash
# Round-3 follow-up queue (run AFTER queue_round19.sh, or instead of its
# open-ended em6 tail when the clock is short):
#   W1  w128 — width-128 flagship config study (VERDICT r2 item 10): the
#        roofline showed width 128 sustains 2.5x the FLOP rate; meta-train
#        poisson 3x128 to 100k and compare val-vs-wallclock against 3x64.
#   W2  bf16 deploy benches on the big LEAP nets (the measured ms/task
#        lever from the round-3 attribution: slopes are compute-bound).
#   W3  lp3 — poisson LEAP 60k -> 200k continuation (VERDICT item 9),
#        chunked until the round ends.
#
# Usage: queue_round19b.sh [wait_pid ...]
cd "$(dirname "$0")/.."
set -u

for WAIT_PID in "$@"; do
  echo "queue19b: waiting for pid $WAIT_PID"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
  echo "queue19b: pid $WAIT_PID done at $(date)"
done

newest_ckpt_dir() {  # out_dir expt_prefix
  for d in $(ls -dt "$1/$2"* 2>/dev/null); do
    if ls "$d"/checkpoint_step_*.pickle >/dev/null 2>&1; then
      echo "$d"; return
    fi
  done
}

# ---- W1: width-128 poisson MAML to 100k ----------------------------------
PO128_ARGS=(
  --task.pde=poisson
  --task.inner_points=1024 --task.outer_points=1024
  --task.validation_points=1024 --task.n_eval=8
  --solver.ground_truth_resolution=32
  --model.num_layers=3 --model.layer_size=128 --model.omega=30 --model.omega0=30
  --maml.bsize=16 --maml.inner_steps=5 --maml.inner_lr=1e-4 --maml.outer_lr=1e-5
  --maml.grad_clip=100 --maml.inner_grad_clip=100
  --train.optimizer=adam
)
for TARGET in 50001 100001; do
  D=$(newest_ckpt_dir results_poisson_maml w128)
  if [ -n "${D:-}" ]; then
    LAST=$(ls -v "$D"/checkpoint_step_*.pickle | tail -1 | grep -o '[0-9]*' | tail -1)
    if [ "${LAST:-0}" -ge $((TARGET - 1)) ]; then
      echo "queue19b: w128 already at $LAST >= $TARGET; skip"
      continue
    fi
  fi
  echo "queue19b: w128 chunk -> $TARGET at $(date)"
  bash pipeline/supervise.sh results_poisson_maml w128 10 900 -- \
    python -m metapde_tpu.cli.maml_pde "${PO128_ARGS[@]}" \
      --train.outer_steps=$TARGET --train.steps_per_call=500 \
      --train.log_every=2000 --train.val_every=1000 --train.viz_every=0 \
      --train.checkpoint_every=10000 \
      --train.out_dir=results_poisson_maml --train.expt_name=w128
  bash pipeline/commit_ckpts.sh "w128 width-128 study chunk -> $TARGET"
done
D=$(newest_ckpt_dir results_poisson_maml w128)
if [ -n "${D:-}" ]; then
  echo "queue19b: w128 k-sweep benches on $D at $(date)"
  timeout 3600 python -m metapde_tpu.cli.deploy_bench --algo=maml \
    --from_run="$D" --task.n_eval=8 --inner-steps-list=0,1,2,5,10,20 \
    --checkpoint=best
  bash pipeline/commit_ckpts.sh "w128 deploy bench (best)"
fi

# ---- W2: bf16 deploy benches on the compute-bound LEAP nets ---------------
D=$(newest_ckpt_dir results_elasticity_leap lde2)
if [ -n "${D:-}" ]; then
  echo "queue19b: lde2 bf16 deploy bench on $D at $(date)"
  timeout 3600 python -m metapde_tpu.cli.deploy_bench --algo=leap \
    --from_run="$D" --task.n_eval=8 --inner-steps-list=0,5,20,40 \
    --model.compute_dtype=bfloat16 --checkpoint=best
fi
D=$(newest_ckpt_dir results_burgers_leap ldb3)
if [ -n "${D:-}" ]; then
  echo "queue19b: ldb3 bf16 deploy bench on $D at $(date)"
  timeout 3600 python -m metapde_tpu.cli.deploy_bench --algo=leap \
    --from_run="$D" --task.n_eval=8 --inner-steps-list=0,5,20,80 \
    --model.compute_dtype=bfloat16
fi
bash pipeline/commit_ckpts.sh "bf16 LEAP deploy benches"

# ---- W3: lp3 poisson LEAP 60k -> 200k until round end ---------------------
for TARGET in $(seq 80001 20000 200001); do
  D=$(newest_ckpt_dir results_poisson_leap lp3)
  if [ -n "${D:-}" ]; then
    LAST=$(ls -v "$D"/checkpoint_step_*.pickle | tail -1 | grep -o '[0-9]*' | tail -1)
    if [ "${LAST:-0}" -ge $((TARGET - 1)) ]; then
      echo "queue19b: lp3 already at $LAST >= $TARGET; skip"
      continue
    fi
  fi
  echo "queue19b: lp3 chunk -> $TARGET at $(date)"
  bash pipeline/supervise.sh results_poisson_leap lp3 10 900 -- \
    python -m metapde_tpu.cli.leap_pde \
      --from_run=results_poisson_leap/lp2_4 \
      --train.expt_name=lp3 \
      --train.outer_steps=$TARGET --train.steps_per_call=100 \
      --train.log_every=2000 --train.val_every=1000 --train.viz_every=0 \
      --train.checkpoint_every=4000
  bash pipeline/commit_ckpts.sh "lp3 poisson LEAP chunk -> $TARGET"
done
D=$(newest_ckpt_dir results_poisson_leap lp3)
if [ -n "${D:-}" ]; then
  timeout 3600 python -m metapde_tpu.cli.deploy_bench --algo=leap \
    --from_run="$D" --task.n_eval=8 --inner-steps-list=0,5,20,60 \
    --checkpoint=best
  bash pipeline/commit_ckpts.sh "lp3 deploy bench (best)"
fi
echo "queue19b: done at $(date)"
