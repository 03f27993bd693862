#!/bin/bash
# Round-23 queue (round 4, second session). Remaining VERDICT r3 items,
# cheapest-closable first, then the em7 ladder for the rest of the window:
#   S1  deploy-time bf16 benches on compute-bound LEAP rows (item 6, ~45m)
#   S2  f32 parity probes s1..s3 -> completes the 30k parity matrix (item 4)
#   S3  w64/w128 fast 100k Pareto arms (item 3)
#   S4  em7 ladder 224k -> 500k in 50k chunks, best bench @374k/@500k,
#       latest bench at end (item 2; self-resuming across rounds)
#   S5  sbi10 24-fresh-task benches (item 1 ceiling estimate) if time
#   S6  lp3 poisson LEAP chunk (item 5) if time
# Step-time planning (measured r3): em6/em7 93.8 ms/step, probes f32
# 50 ms, fast-bf16 21.5 ms, w128 fast ~33 ms.
# Usage: queue_round23.sh <hard_stop_epoch> [wait_pid ...]
cd "$(dirname "$0")/.."
set -u
HARD_STOP=$1; shift

for WAIT_PID in "$@"; do
  echo "queue23: waiting for pid $WAIT_PID"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
done

fits() {
  local LEFT=$(( HARD_STOP - $(date +%s) ))
  if [ "$LEFT" -lt "$1" ]; then
    echo "queue23: skip stage (est $1s > ${LEFT}s left)"; return 1
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
      echo "queue23: $PREFIX already at $LAST >= $TARGET; skip"; return 0
    fi
  fi
  fits "$EST" || return 1
  echo "queue23: $PREFIX chunk -> $TARGET at $(date)"
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
  [ -n "${D:-}" ] || { echo "queue23: no ckpt dir for $PREFIX"; return 0; }
  fits "$EST" || return 1
  timeout $((2 * EST)) python -m metapde_tpu.cli.deploy_bench \
    --algo="$ALGO" --from_run="$D" "$@" \
    || { echo "queue23: bench $LABEL failed/timed out; NOT committing"; \
         return 1; }
  bash pipeline/commit_ckpts.sh "$LABEL"
}

# ---- S1: deploy-time bf16 on the compute-bound LEAP rows (item 6) -----------
# deploy_bench suffix order is <optimizer><dtype><best>, so a bf16 best-ckpt
# sweep lands at deploy_bench_bfloat16_best.jsonl and a latest-ckpt fallback
# at deploy_bench_bfloat16.jsonl — guard on either.
bf16_done() {  # run_dir
  ls "$1"/deploy_bench*bfloat16*.jsonl >/dev/null 2>&1
}
bf16_done results_elasticity_leap/lde2_3 || \
  bench_run 900 "lde2 bf16 deploy bench (best)" \
    results_elasticity_leap lde2 leap \
    --task.n_eval=8 --inner-steps-list=0,5,20,40,80 --checkpoint=best \
    --model.compute_dtype=bfloat16
# lp2's fresh-task gt includes the known kernel-faulting poisson res-32
# solve (NEXT.md 8): attempt 1 may die AFTER the CPU fallback caches the
# solution (worker crash takes the process down); attempt 2 then hits the
# cache and skips the faulting solve entirely.
bf16_done results_poisson_leap/lp2_4 || \
  bench_run 900 "lp2 bf16 deploy bench (best)" \
    results_poisson_leap lp2 leap \
    --task.n_eval=8 --inner-steps-list=0,5,20,40,80 --checkpoint=best \
    --model.compute_dtype=bfloat16 || \
  bench_run 900 "lp2 bf16 deploy bench (best, retry)" \
    results_poisson_leap lp2 leap \
    --task.n_eval=8 --inner-steps-list=0,5,20,40,80 --checkpoint=best \
    --model.compute_dtype=bfloat16
bf16_done results_burgers_leap/ldb3_2 || \
  bench_run 900 "ldb3 bf16 deploy bench (best)" \
    results_burgers_leap ldb3 leap \
    --task.n_eval=8 --inner-steps-list=0,5,20,40,80 --checkpoint=best \
    --model.compute_dtype=bfloat16

# ---- S2: f32 parity probes s1..s3 (item 4) ----------------------------------
PO_ARGS=(
  --task.pde=poisson
  --task.inner_points=1024 --task.outer_points=1024
  --task.validation_points=1024 --task.n_eval=8
  --solver.ground_truth_resolution=32
  --model.num_layers=3 --model.layer_size=64 --model.omega=30 --model.omega0=30
  --maml.bsize=16 --maml.inner_steps=5 --maml.inner_lr=1e-4 --maml.outer_lr=1e-5
  --maml.grad_clip=100 --maml.inner_grad_clip=100
  --train.optimizer=adam
  --train.outer_steps=30001 --train.steps_per_call=500
  --train.log_every=2000 --train.val_every=1000 --train.viz_every=0
  --train.checkpoint_every=30000
  --train.out_dir=results_poisson_maml
)
# probes run as supervised chunks: the 22:30 wedge stalled a bare probe at
# step 14k with no checkpoint to resume from (checkpoint_every was 30000);
# run_chunk's supervise wrapper stall-detects and resumes from 5k-step
# checkpoints instead of losing the whole attempt.
run_chunk 2300 results_poisson_maml p30k_f32_s1 30001 500 5000 -- \
  python -m metapde_tpu.cli.maml_pde "${PO_ARGS[@]}" \
    --train.expt_name=p30k_f32_s1 --seed=1
run_chunk 2300 results_poisson_maml p30k_f32_s2 30001 500 5000 -- \
  python -m metapde_tpu.cli.maml_pde "${PO_ARGS[@]}" \
    --train.expt_name=p30k_f32_s2 --seed=2
run_chunk 2300 results_poisson_maml p30k_f32_s3 30001 500 5000 -- \
  python -m metapde_tpu.cli.maml_pde "${PO_ARGS[@]}" \
    --train.expt_name=p30k_f32_s3 --seed=3
bash pipeline/commit_ckpts.sh "parity probes f32 s1-s3"

# ---- S3: width-128 Pareto arms (item 3) -------------------------------------
run_chunk 2500 results_poisson_maml pw64f_100k 100001 500 10000 -- \
  python -m metapde_tpu.cli.maml_pde "${PO_ARGS[@]}" \
    --train.expt_name=pw64f_100k \
    --task.sample_with_replacement=true --model.compute_dtype=bfloat16
run_chunk 3400 results_poisson_maml pw128f_100k 100001 500 10000 -- \
  python -m metapde_tpu.cli.maml_pde "${PO_ARGS[@]}" \
    --train.expt_name=pw128f_100k --model.layer_size=128 \
    --task.sample_with_replacement=true --model.compute_dtype=bfloat16
bash pipeline/commit_ckpts.sh "width Pareto arms"

# ---- S4: em7 ladder -> 500k (item 2) ----------------------------------------
python pipeline/seed_from_best.py results_elasticity_maml/em6 \
  results_elasticity_maml/em7 2>/dev/null || true
EM7_ARGS=(
  python -m metapde_tpu.cli.maml_pde
  --from_run=results_elasticity_maml/em7
  --train.expt_name=em7 --train.out_dir=results_elasticity_maml
  --maml.outer_lr=3e-6
)
for T in 274001 324001 374001 424001 474001 500001; do
  EST=5100; [ "$T" = 500001 ] && EST=2800
  run_chunk "$EST" results_elasticity_maml em7 "$T" 500 5000 -- \
    "${EM7_ARGS[@]}" || break
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

# ---- S5: sbi10 24-fresh-task benches (item 1 ceiling) -----------------------
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

# ---- S6: lp3 poisson LEAP chunk (item 5) ------------------------------------
run_chunk 4600 results_poisson_leap lp3 80001 500 5000 -- \
  python -m metapde_tpu.cli.leap_pde \
    --from_run=results_poisson_leap/lp2_4 --train.expt_name=lp3

echo "queue23: done at $(date)"
