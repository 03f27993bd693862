#!/bin/bash
# Round-22 queue (round 4). Priorities = VERDICT.md r3 "Next round" list:
#   S1  sbi10 -> 100k + best/latest benches   (item 1: the open <=5e-3 bar)
#   S2  p30k_fast_s3 parity probe             (item 4, cheap slice)
#   S3  em7: seed from em6's BEST checkpoint (223999) with outer_lr 3e-6
#       — the controlled val-regression arm (item 2); em6's own 224k->250k
#       trajectory at outer_lr=1e-5 is the baseline it is compared
#       against — then ladder -> 500k in 50k chunks, best bench mid+final.
#   S4  deploy-time bf16 benches on the compute-bound LEAP rows (item 6)
#   S5  f32 parity probes s1..s3                (item 4) if time
#   S6  w64/w128 fast 100k Pareto arms          (item 3) if time
#   S7  lp3 poisson LEAP chunk                  (item 5) if time
# Step-time planning numbers (measured r3): em6 93.8 ms/step, sbi10
# 60 ms/step, probes fast 21.5 ms / f32 50 ms, poisson LEAP 222 ms,
# burgers LEAP 540 ms, elasticity LEAP 709 ms. The LEAP budget pushes and
# lde2's last 12k are mostly NOT scheduled: at those step times they cost
# 2.4-9 h each and every LEAP row already beats the reference's converged
# number (RESULTS.md) — re-scoped in NEXT.md instead.
#
# Usage: queue_round22.sh <hard_stop_epoch> [wait_pid ...]
cd "$(dirname "$0")/.."
set -u
HARD_STOP=$1; shift

for WAIT_PID in "$@"; do
  echo "queue22: waiting for pid $WAIT_PID"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
done

fits() {  # est_seconds — 0 (success) if the stage fits before HARD_STOP
  local LEFT=$(( HARD_STOP - $(date +%s) ))
  if [ "$LEFT" -lt "$1" ]; then
    echo "queue22: skip stage (est $1s > ${LEFT}s left)"; return 1
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
      echo "queue22: $PREFIX already at $LAST >= $TARGET; skip"; return 0
    fi
  fi
  fits "$EST" || return 1
  echo "queue22: $PREFIX chunk -> $TARGET at $(date)"
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
  [ -n "${D:-}" ] || { echo "queue22: no ckpt dir for $PREFIX"; return 0; }
  fits "$EST" || return 1
  timeout $((2 * EST)) python -m metapde_tpu.cli.deploy_bench \
    --algo="$ALGO" --from_run="$D" "$@" \
    || { echo "queue22: bench $LABEL failed/timed out; NOT committing"; \
         return 1; }
  bash pipeline/commit_ckpts.sh "$LABEL"
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
    echo "queue22: probe $NAME already complete; skip"; return 0
  fi
  fits "$EST" || return 1
  echo "queue22: probe $NAME at $(date)"
  for ATTEMPT in 1 2; do
    timeout 2700 python -m metapde_tpu.cli.maml_pde "${PO_ARGS[@]}" \
      --train.expt_name="$NAME" "$@" && return 0
    echo "queue22: probe $NAME attempt $ATTEMPT failed; sleeping 60s"
    sleep 60
  done
}

# ---- S1: sbi10 -> 100k + benches (VERDICT item 1) ---------------------------
run_chunk 4300 results_sburgers_maml sbi10 100001 500 5000 -- \
  python -m metapde_tpu.cli.maml_pde "${SB_ARGS[@]}"
bench_run 1400 "sbi10 deploy bench (best)" results_sburgers_maml sbi10 maml \
  --task.n_eval=8 --inner-steps-list=0,1,2,5,10,20,40,80 --checkpoint=best
bench_run 1400 "sbi10 deploy bench (latest)" results_sburgers_maml sbi10 maml \
  --task.n_eval=8 --inner-steps-list=0,1,2,5,10,20,40,80

# ---- S2: fast_s3 parity probe (item 4 slice) --------------------------------
run_probe 900 p30k_fast_s3 --seed=3 \
  --task.sample_with_replacement=true --model.compute_dtype=bfloat16
bash pipeline/commit_ckpts.sh "parity probe fast seed 3"

# ---- S3: em7 — controlled regression arm -> 500k (item 2) -------------------
python pipeline/seed_from_best.py results_elasticity_maml/em6 \
  results_elasticity_maml/em7
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
done

# ---- S4: deploy-time bf16 on the compute-bound LEAP rows (item 6) -----------
bench_run 900 "lde2 bf16 deploy bench (best)" \
  results_elasticity_leap lde2 leap \
  --task.n_eval=8 --inner-steps-list=0,5,20,40,80 --checkpoint=best \
  --model.compute_dtype=bfloat16
bench_run 900 "lp2 bf16 deploy bench (best)" \
  results_poisson_leap lp2 leap \
  --task.n_eval=8 --inner-steps-list=0,5,20,40,80 --checkpoint=best \
  --model.compute_dtype=bfloat16
bench_run 900 "ldb3 bf16 deploy bench (best)" \
  results_burgers_leap ldb3 leap \
  --task.n_eval=8 --inner-steps-list=0,5,20,40,80 --checkpoint=best \
  --model.compute_dtype=bfloat16

# ---- S5: remaining parity probes (item 4) -----------------------------------
run_probe 1800 p30k_f32_s1 --seed=1
run_probe 1800 p30k_f32_s2 --seed=2
run_probe 1800 p30k_f32_s3 --seed=3
bash pipeline/commit_ckpts.sh "parity probes f32"

# ---- S6: width-128 Pareto arms (item 3) --------------------------------------
run_chunk 2400 results_poisson_maml pw64f_100k 100001 500 10000 -- \
  python -m metapde_tpu.cli.maml_pde "${PO_ARGS[@]}" \
    --train.expt_name=pw64f_100k \
    --task.sample_with_replacement=true --model.compute_dtype=bfloat16
run_chunk 3300 results_poisson_maml pw128f_100k 100001 500 10000 -- \
  python -m metapde_tpu.cli.maml_pde "${PO_ARGS[@]}" \
    --train.expt_name=pw128f_100k --model.layer_size=128 \
    --task.sample_with_replacement=true --model.compute_dtype=bfloat16

# ---- S7: lp3 poisson LEAP chunk (item 5) -------------------------------------
run_chunk 4600 results_poisson_leap lp3 80001 500 5000 -- \
  python -m metapde_tpu.cli.leap_pde \
    --from_run=results_poisson_leap/lp2_4 --train.expt_name=lp3

echo "queue22: done at $(date)"
