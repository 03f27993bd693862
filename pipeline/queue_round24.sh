#!/bin/bash
# Round-24 queue (round 5). VERDICT r4 priority order:
#   S1  em7 elasticity-MAML ladder 235k -> 500k in 50k chunks, best bench
#       @374k/@500k, latest bench @500k (VERDICT r4 item 1 — the single
#       remaining same-protocol IOU; reference pipleline_maml_meta.sh:8).
#       Chunks read pipeline/em7_extra_flags.txt at launch time so
#       validation options implemented mid-ladder (branch-aware val,
#       VERDICT item 5) apply to later chunks without editing this file
#       while bash is executing it.
#   S2+ pipeline/r24_tail.sh (separate file so it can be authored while
#       S1 holds the chip): large-task-batch throughput frontier (item 3),
#       lp3 poisson-LEAP budget push (item 2), w128 seeds / sbi10
#       extension if window remains (items 6/4).
# Step-time planning (measured r4): em7 93.8 ms/step -> 50k chunk ~4700s;
# benches at res-48 ~1300s each (gt cache warm).
# Usage: queue_round24.sh <hard_stop_epoch>
cd "$(dirname "$0")/.."
set -u
HARD_STOP=$1; shift || true

fits() {
  local LEFT=$(( HARD_STOP - $(date +%s) ))
  if [ "$LEFT" -lt "$1" ]; then
    echo "queue24: skip stage (est $1s > ${LEFT}s left)"; return 1
  fi
  return 0
}

newest_ckpt_dir() {  # out_dir expt_prefix
  for d in $(ls -dt "$1/$2"* 2>/dev/null); do
    if ls "$d"/checkpoint_step_*.pickle >/dev/null 2>&1; then
      echo "$d"; return
    fi
  done
}

run_chunk() {  # est out_dir prefix target spc ckpt_every -- train_cmd...
  local EST=$1 OUT=$2 PREFIX=$3 TARGET=$4 SPC=$5 CKPT_EVERY=$6; shift 6
  [ "$1" = "--" ] && shift
  local D; D=$(newest_ckpt_dir "$OUT" "$PREFIX")
  if [ -n "${D:-}" ]; then
    local LAST
    LAST=$(ls -v "$D"/checkpoint_step_*.pickle | tail -1 \
           | grep -o '[0-9]*' | tail -1)
    if [ "${LAST:-0}" -ge $((TARGET - 1)) ]; then
      echo "queue24: $PREFIX already at $LAST >= $TARGET; skip"; return 0
    fi
  fi
  fits "$EST" || return 1
  echo "queue24: $PREFIX chunk -> $TARGET at $(date)"
  bash pipeline/supervise.sh "$OUT" "$PREFIX" 6 1200 -- \
    "$@" \
    --train.outer_steps=$TARGET --train.steps_per_call=$SPC \
    --train.log_every=2000 --train.val_every=1000 --train.viz_every=0 \
    --train.checkpoint_every=$CKPT_EVERY
  bash pipeline/commit_ckpts.sh "$PREFIX chunk -> $TARGET"
}

bench_run() {  # est label out_dir prefix algo extra...
  local EST=$1 LABEL=$2 OUT=$3 PREFIX=$4 ALGO=$5; shift 5
  local D; D=$(newest_ckpt_dir "$OUT" "$PREFIX")
  [ -n "${D:-}" ] || { echo "queue24: no ckpt dir for $PREFIX"; return 0; }
  fits $((2 * EST)) || return 1
  timeout $((2 * EST)) python -m metapde_tpu.cli.deploy_bench \
    --algo="$ALGO" --from_run="$D" "$@" \
    || { echo "queue24: bench $LABEL failed/timed out; NOT committing"; \
         return 1; }
  bash pipeline/commit_ckpts.sh "$LABEL"
}

# ---- S1: em7 ladder -> 500k (VERDICT r4 item 1) -----------------------------
python pipeline/seed_from_best.py results_elasticity_maml/em6 \
  results_elasticity_maml/em7 2>/dev/null || true
for T in 274001 324001 374001 424001 474001 500001; do
  EST=4200; [ "$T" = 500001 ] && EST=2800
  # branch-aware validation etc. (VERDICT item 5): flags land in this
  # file once implemented; word-split on purpose (flags contain no spaces)
  EM7_EXTRA=$(cat pipeline/em7_extra_flags.txt 2>/dev/null || true)
  run_chunk "$EST" results_elasticity_maml em7 "$T" 500 5000 -- \
    python -m metapde_tpu.cli.maml_pde \
    --from_run=results_elasticity_maml/em7 \
    --train.expt_name=em7 --train.out_dir=results_elasticity_maml \
    --maml.outer_lr=3e-6 $EM7_EXTRA || break
  if [ "$T" = 374001 ] || [ "$T" = 500001 ]; then
    bench_run 1300 "em7 best-checkpoint bench @$T" \
      results_elasticity_maml em7 maml \
      --task.n_eval=8 --solver.ground_truth_resolution=48 \
      --inner-steps-list=0,1,2,5,10,20 --checkpoint=best
  fi
  if [ "$T" = 500001 ]; then
    bench_run 1300 "em7 latest-checkpoint bench @500k" \
      results_elasticity_maml em7 maml \
      --task.n_eval=8 --solver.ground_truth_resolution=48 \
      --inner-steps-list=0,1,2,5,10,20
  fi
done

# ---- S2+: tail stages (authored while S1 runs) ------------------------------
bash pipeline/r24_tail.sh "$HARD_STOP"

echo "queue24: done at $(date)"
