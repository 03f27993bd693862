#!/bin/bash
# Round-21 queue (continues queue_round20; stages self-skip completed work).
# Priorities per NEXT.md handoff, ordered for a ~2.5h healthy window:
#   S1  sbi10  — steady-Burgers inner_steps=10 to 50k + best/latest benches
#                (VERDICT-r2 item 3: the open <=5e-3 @ k<=20 bar).
#   S2  p30k_f32_s1 — completes the seed-1 matched parity pair (item 6).
#   S3  w128 fast probe — the 3x128-vs-3x64 Pareto point (item 10).
#   S4  seed-2 parity pair.
#   S5  sbi10 -> 100k + benches.
#   S6  seed-3 parity pair.
#   S7  em6 ladder 300k+ with best bench per chunk (item 1b stretch).
#   S8  lp3 poisson LEAP continuation chunk (item 9).
# Estimates from measured step times this window: probes fast 21.5ms/step,
# f32 ~50ms/step, sbi10 ~60ms/step (sb3 was 31ms at inner_steps=5), em6
# 94ms/step.
#
# Usage: queue_round21.sh <hard_stop_epoch> [wait_pid ...]
cd "$(dirname "$0")/.."
set -u
HARD_STOP=$1; shift

for WAIT_PID in "$@"; do
  echo "queue21: waiting for pid $WAIT_PID"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
done

fits() {  # est_seconds — 0 (success) if the stage fits before HARD_STOP
  local LEFT=$(( HARD_STOP - $(date +%s) ))
  if [ "$LEFT" -lt "$1" ]; then
    echo "queue21: skip stage (est $1s > ${LEFT}s left)"; return 1
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
      echo "queue21: $PREFIX already at $LAST >= $TARGET; skip"; return 0
    fi
  fi
  fits "$EST" || return 1
  echo "queue21: $PREFIX chunk -> $TARGET at $(date)"
  bash pipeline/supervise.sh "$OUT" "$PREFIX" 6 1200 -- \
    "$@" \
    --train.outer_steps=$TARGET --train.steps_per_call=$SPC \
    --train.log_every=2000 --train.val_every=1000 --train.viz_every=0 \
    --train.checkpoint_every=$CKPT_EVERY
  bash pipeline/commit_ckpts.sh "$PREFIX chunk -> $TARGET"
}

em6_bench() {
  local D; D=$(newest_ckpt_dir results_elasticity_maml em6)
  [ -n "${D:-}" ] || return 0
  fits 1200 || return 1
  timeout 2400 python -m metapde_tpu.cli.deploy_bench --algo=maml \
    --from_run="$D" --task.n_eval=8 --solver.ground_truth_resolution=48 \
    --inner-steps-list=0,1,2,5,10,20 --checkpoint=best
  bash pipeline/commit_ckpts.sh "em6 best-checkpoint bench"
}

sbi10_bench() {
  local D; D=$(newest_ckpt_dir results_sburgers_maml sbi10)
  [ -n "${D:-}" ] || return 0
  fits 1400 || return 1
  timeout 2400 python -m metapde_tpu.cli.deploy_bench --algo=maml \
    --from_run="$D" --task.n_eval=8 --inner-steps-list=0,1,2,5,10,20,40,80 \
    --checkpoint=best
  timeout 2400 python -m metapde_tpu.cli.deploy_bench --algo=maml \
    --from_run="$D" --task.n_eval=8 --inner-steps-list=0,1,2,5,10,20,40,80
  bash pipeline/commit_ckpts.sh "sbi10 deploy benches (best + latest)"
}

SB_ARGS=(
  --task.pde=steady_burgers
  --task.max_reynolds=10 --task.max_holes=4 --task.max_hole_size=0.3
  --task.bc_weight=10.0
  --task.inner_points=1024 --task.outer_points=1024
  --task.validation_points=1024 --task.n_eval=8
  --solver.ground_truth_resolution=48
  --model.num_layers=5 --model.layer_size=64 --model.omega=30 --model.omega0=30
  --maml.bsize=8 --maml.inner_steps=10 --maml.inner_lr=1e-4 --maml.outer_lr=1e-5
  --maml.grad_clip=100 --maml.inner_grad_clip=100
  --train.optimizer=adam
  --train.out_dir=results_sburgers_maml --train.expt_name=sbi10
)

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
run_probe() {  # est name extra...
  local EST=$1 NAME=$2; shift 2
  if [ -f "results_poisson_maml/$NAME/metrics.jsonl" ] && \
     tail -1 "results_poisson_maml/$NAME/metrics.jsonl" | grep -q '"step": 29999'; then
    echo "queue21: probe $NAME already complete; skip"; return 0
  fi
  fits "$EST" || return 1
  echo "queue21: probe $NAME at $(date)"
  for ATTEMPT in 1 2; do
    timeout 2700 python -m metapde_tpu.cli.maml_pde "${PO_ARGS[@]}" \
      --train.expt_name="$NAME" "$@" && return 0
    echo "queue21: probe $NAME attempt $ATTEMPT failed; sleeping 60s"
    sleep 60
  done
}

# ---- S1: sbi10 -> 50k + benches --------------------------------------------
run_chunk 3500 results_sburgers_maml sbi10 50001 500 10000 -- \
  python -m metapde_tpu.cli.maml_pde "${SB_ARGS[@]}"
sbi10_bench

# ---- S2: complete the seed-1 parity pair -----------------------------------
run_probe 1800 p30k_f32_s1 --seed=1
bash pipeline/commit_ckpts.sh "parity probe f32 seed 1"

# ---- S3: w128 fast probe (Pareto point) ------------------------------------
run_probe 1300 p30k_fast_w128_s1 --seed=1 \
  --task.sample_with_replacement=true --model.compute_dtype=bfloat16 \
  --model.layer_size=128
bash pipeline/commit_ckpts.sh "w128 fast probe"

# ---- S4: seed-2 parity pair -------------------------------------------------
run_probe 900 p30k_fast_s2 --seed=2 \
  --task.sample_with_replacement=true --model.compute_dtype=bfloat16
run_probe 1800 p30k_f32_s2 --seed=2
bash pipeline/commit_ckpts.sh "parity probes seed 2"

# ---- S5: sbi10 -> 100k + benches -------------------------------------------
run_chunk 3500 results_sburgers_maml sbi10 100001 500 10000 -- \
  python -m metapde_tpu.cli.maml_pde "${SB_ARGS[@]}"
sbi10_bench

# ---- S6: seed-3 parity pair -------------------------------------------------
run_probe 900 p30k_fast_s3 --seed=3 \
  --task.sample_with_replacement=true --model.compute_dtype=bfloat16
run_probe 1800 p30k_f32_s3 --seed=3
bash pipeline/commit_ckpts.sh "parity probes seed 3"

# ---- S7: em6 ladder with best bench per chunk ------------------------------
for T in $(seq 300001 50000 500001); do
  run_chunk 5000 results_elasticity_maml em6 "$T" 500 10000 -- \
    python -m metapde_tpu.cli.maml_pde \
      --from_run=results_elasticity_maml/em5 --train.expt_name=em6 \
    || break
  em6_bench
done

# ---- S8: lp3 poisson LEAP continuation (item 9) ----------------------------
run_chunk 3000 results_poisson_leap lp3 120001 500 10000 -- \
  python -m metapde_tpu.cli.leap_pde \
    --from_run=results_poisson_leap/lp2_4 --train.expt_name=lp3
echo "queue21: done at $(date)"
