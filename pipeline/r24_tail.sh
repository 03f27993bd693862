#!/bin/bash
# Round-24 tail stages (run by queue_round24.sh after the em7 ladder).
#   T1 large-task-batch throughput frontier (VERDICT r4 item 3): the
#      north-star metric (residual evals/s/chip) at bsize {16,64,256} x
#      width {64,128} on the flagship config (fast sampler + bf16 compute,
#      unroll=5, no remat — the bench.py variant), via cli/roofline which
#      reports steps/s + exact-FLOPs MFU per cell. Never explored on the
#      real chip: every bench so far ran reference-parity bsize 16
#      (11.1M evals/s/chip flat for three rounds, MXU measurably idle).
#   T2 lp3 poisson-LEAP budget chunks 60k -> as far as the window allows
#      (VERDICT item 2; reference protocol 500k, pipeline_leap_meta.sh:5).
#   T3 pw128f seed-2 100k arm (VERDICT item 6) if window remains.
#   T4 sbi10 budget chunk (VERDICT item 4) if window remains.
cd "$(dirname "$0")/.."
set -u
HARD_STOP=$1
# live override: lets the operator extend/shrink the tail window after the
# queue launched (the queue's HARD_STOP was captured at launch time)
[ -f pipeline/r24_hard_stop ] && HARD_STOP=$(cat pipeline/r24_hard_stop)

fits() {
  local LEFT=$(( HARD_STOP - $(date +%s) ))
  if [ "$LEFT" -lt "$1" ]; then
    echo "r24_tail: skip stage (est $1s > ${LEFT}s left)"; return 1
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
      echo "r24_tail: $PREFIX already at $LAST >= $TARGET; skip"; return 0
    fi
  fi
  fits "$EST" || return 1
  echo "r24_tail: $PREFIX chunk -> $TARGET at $(date)"
  bash pipeline/supervise.sh "$OUT" "$PREFIX" 6 1200 -- \
    "$@" \
    --train.outer_steps=$TARGET --train.steps_per_call=$SPC \
    --train.log_every=2000 --train.val_every=1000 --train.viz_every=0 \
    --train.checkpoint_every=$CKPT_EVERY
  bash pipeline/commit_ckpts.sh "$PREFIX chunk -> $TARGET"
}

# ---- T1: large-task-batch throughput frontier -------------------------------
FRONTIER=baselines/throughput_frontier_r05.jsonl
if [ ! -f "$FRONTIER" ] && fits 2700; then
  mkdir -p baselines
  : > "$FRONTIER.tmp"
  ok=1
  for CELL in "16 64 100" "64 64 50" "256 64 25" \
              "16 128 50" "64 128 25" "256 128 25"; do
    set -- $CELL; BS=$1; W=$2; BLK=$3
    # per-cell window guard: big cells pay a multi-minute compile (the
    # cost-analysis lowering fully unrolls the inner scan)
    fits 1300 || break
    echo "r24_tail: frontier cell bsize=$BS width=$W at $(date)"
    timeout 1200 python -m metapde_tpu.cli.roofline \
      --bsize="$BS" --layer_size="$W" --compute_dtype=bfloat16 \
      --fast_sampler --no_remat --unroll=5 \
      --block="$BLK" --blocks=5 >> "$FRONTIER.tmp" \
      || { echo "r24_tail: cell bsize=$BS width=$W FAILED"; ok=0; }
  done
  mv "$FRONTIER.tmp" "$FRONTIER"
  git add -f "$FRONTIER" && git commit -q -m \
    "throughput frontier: bsize x width sweep on the real chip" \
    -- "$FRONTIER" || true
  [ "$ok" = 1 ] || echo "r24_tail: frontier finished with failed cells"
fi

# ---- T2: lp3 poisson LEAP budget chunks -------------------------------------
# 222 ms/step measured (NEXT.md 3): 15k chunk ~ 3330s + compile. Chunked
# fine so each commit lands even if the window dies mid-push.
for T in 75001 90001 105001 120001 135001; do
  run_chunk 3800 results_poisson_leap lp3 "$T" 500 5000 -- \
    python -m metapde_tpu.cli.leap_pde \
      --from_run=results_poisson_leap/lp2_4 --train.expt_name=lp3 \
    || break
done
# deploy bench from the lp3 best checkpoint if any chunk landed
D=$(newest_ckpt_dir results_poisson_leap lp3)
if [ -n "${D:-}" ] && ! ls "$D"/deploy_bench*_n8*.jsonl >/dev/null 2>&1 \
    && fits 1800; then
  timeout 1800 python -m metapde_tpu.cli.deploy_bench --algo=leap \
    --from_run="$D" --task.n_eval=8 --inner-steps-list=0,5,20,40,80 \
    --checkpoint=best \
  && bash pipeline/commit_ckpts.sh "lp3 deploy bench (best)"
fi

# ---- T3: pw128f seed-2 100k arm ---------------------------------------------
PO_ARGS=(
  --task.pde=poisson
  --task.inner_points=1024 --task.outer_points=1024
  --task.validation_points=1024 --task.n_eval=8
  --solver.ground_truth_resolution=32
  --model.num_layers=3 --model.layer_size=128 --model.omega=30
  --model.omega0=30
  --maml.bsize=16 --maml.inner_steps=5 --maml.inner_lr=1e-4
  --maml.outer_lr=1e-5 --maml.grad_clip=100 --maml.inner_grad_clip=100
  --train.optimizer=adam --train.out_dir=results_poisson_maml
  --task.sample_with_replacement=true --model.compute_dtype=bfloat16
)
run_chunk 3600 results_poisson_maml pw128f_s2 100001 500 10000 -- \
  python -m metapde_tpu.cli.maml_pde "${PO_ARGS[@]}" \
    --train.expt_name=pw128f_s2 --seed=2

# ---- T4: sbi10 budget chunk -------------------------------------------------
run_chunk 4700 results_sburgers_maml sbi10 150001 500 5000 -- \
  python -m metapde_tpu.cli.maml_pde \
    --from_run=results_sburgers_maml/sbi10_2 --train.expt_name=sbi10

echo "r24_tail: done at $(date)"
