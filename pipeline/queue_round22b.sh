#!/bin/bash
# Round-22b follow-on queue: runs AFTER queue_round22.sh exits, inside the
# same hard stop — mop-up stages that earn their slot only if the em7
# ladder finished with time to spare.
#   S1  sbi10 24-fresh-task benches (best + latest): the 8-task fresh-task
#       median at k=20 (8.4e-3) is within task-draw variance of the bar;
#       24 tasks estimate the family median stably (RESULTS.md sbi10
#       ceiling note).
#   S2  w64/w128 fast 100k Pareto arms (VERDICT item 3) if still unrun.
# Usage: queue_round22b.sh <hard_stop_epoch> <queue22_pid>
cd "$(dirname "$0")/.."
set -u
HARD_STOP=$1; shift

for WAIT_PID in "$@"; do
  echo "queue22b: waiting for pid $WAIT_PID"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
done

fits() {
  local LEFT=$(( HARD_STOP - $(date +%s) ))
  if [ "$LEFT" -lt "$1" ]; then
    echo "queue22b: skip stage (est $1s > ${LEFT}s left)"; return 1
  fi
  return 0
}

newest_ckpt_dir() {
  for d in $(ls -dt "$1/$2"* 2>/dev/null); do
    if ls "$d"/checkpoint_step_*.pickle >/dev/null 2>&1; then
      echo "$d"; return
    fi
  done
}

# ---- S1: sbi10 24-task fresh-task benches -----------------------------------
D=$(newest_ckpt_dir results_sburgers_maml sbi10)
if [ -n "${D:-}" ] && [ ! -f "$D/deploy_bench_n24.done" ] && fits 2600; then
  timeout 5200 python -m metapde_tpu.cli.deploy_bench --algo=maml \
    --from_run="$D" --task.n_eval=24 --inner-steps-list=10,20,40,80 \
    --checkpoint=best \
  && timeout 5200 python -m metapde_tpu.cli.deploy_bench --algo=maml \
    --from_run="$D" --task.n_eval=24 --inner-steps-list=10,20,40,80 \
  && touch "$D/deploy_bench_n24.done"
  bash pipeline/commit_ckpts.sh "sbi10 24-task fresh benches"
fi

# ---- S1.5: em7 latest-checkpoint bench --------------------------------------
# The per-task diagnostic (RESULTS.md round 4) showed best-checkpoint
# selection on this family tracks a branch-multistable eval task's
# roulette; the latest-checkpoint fresh-task bench is the honest
# convergence readout alongside the queued best benches.
D=$(newest_ckpt_dir results_elasticity_maml em7)
if [ -n "${D:-}" ] && [ ! -f "$D/deploy_bench.jsonl" ] && fits 1300; then
  timeout 2600 python -m metapde_tpu.cli.deploy_bench --algo=maml \
    --from_run="$D" --task.n_eval=8 --solver.ground_truth_resolution=48 \
    --inner-steps-list=0,1,2,5,10,20
  bash pipeline/commit_ckpts.sh "em7 latest-checkpoint bench"
fi

# ---- S2: width Pareto arms (self-skipping duplicates of queue22 S6) ---------
PO_ARGS=(
  --task.pde=poisson
  --task.inner_points=1024 --task.outer_points=1024
  --task.validation_points=1024 --task.n_eval=8
  --solver.ground_truth_resolution=32
  --model.num_layers=3 --model.layer_size=64 --model.omega=30 --model.omega0=30
  --maml.bsize=16 --maml.inner_steps=5 --maml.inner_lr=1e-4 --maml.outer_lr=1e-5
  --maml.grad_clip=100 --maml.inner_grad_clip=100
  --train.optimizer=adam
  --train.steps_per_call=500
  --train.log_every=2000 --train.val_every=1000 --train.viz_every=0
  --train.checkpoint_every=10000
  --train.out_dir=results_poisson_maml
)
for ARM in "pw64f_100k:64:2400" "pw128f_100k:128:3300"; do
  NAME=${ARM%%:*}; REST=${ARM#*:}; W=${REST%%:*}; EST=${REST##*:}
  D=$(newest_ckpt_dir results_poisson_maml "$NAME")
  if [ -n "${D:-}" ]; then
    LAST=$(ls -v "$D"/checkpoint_step_*.pickle | tail -1 | grep -o '[0-9]*' | tail -1)
    [ "${LAST:-0}" -ge 100000 ] && { echo "queue22b: $NAME done"; continue; }
  fi
  fits "$EST" || continue
  bash pipeline/supervise.sh results_poisson_maml "$NAME" 4 1200 -- \
    python -m metapde_tpu.cli.maml_pde "${PO_ARGS[@]}" \
      --train.expt_name="$NAME" --model.layer_size="$W" \
      --task.sample_with_replacement=true --model.compute_dtype=bfloat16 \
      --train.outer_steps=100001
  bash pipeline/commit_ckpts.sh "$NAME chunk"
done
echo "queue22b: done at $(date)"
