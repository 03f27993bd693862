#!/bin/bash
# Round-3 queue, final ordering (replaces queue_round19c.sh mid-flight at
# the lde2 chunk boundary; stages skip completed work):
#   S2  lde2  — remaining chunks to 60k + latest/best/bf16 benches.
#   S3  em6   — elasticity MAML 200k -> 300k (VERDICT r2 item 1b shares
#               TOP rank with bm7; runs before sbi10 so a short round
#               cannot cut it), bench after each chunk.
#   S4  sbi10 — steady-Burgers inner_steps=10 to 100k + benches.
#   S5  probes — multi-seed fast-protocol parity + w128 Pareto point.
#   S6  em6 open-ended 300k -> 500k until round end.
#
# Usage: queue_round19d.sh [wait_pid ...]
cd "$(dirname "$0")/.."
set -u

for WAIT_PID in "$@"; do
  echo "queue19d: waiting for pid $WAIT_PID"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
  echo "queue19d: pid $WAIT_PID done at $(date)"
done

newest_ckpt_dir() {  # out_dir expt_prefix
  for d in $(ls -dt "$1/$2"* 2>/dev/null); do
    if ls "$d"/checkpoint_step_*.pickle >/dev/null 2>&1; then
      echo "$d"; return
    fi
  done
}

run_chunks() {  # out_dir prefix ckpt_every spc targets... -- train_cmd...
  local OUT=$1 PREFIX=$2 CKPT_EVERY=$3 SPC=$4; shift 4
  local TARGETS=()
  while [ "$1" != "--" ]; do TARGETS+=("$1"); shift; done
  shift
  for TARGET in "${TARGETS[@]}"; do
    local D; D=$(newest_ckpt_dir "$OUT" "$PREFIX")
    if [ -n "${D:-}" ]; then
      local LAST
      LAST=$(ls -v "$D"/checkpoint_step_*.pickle | tail -1 \
             | grep -o '[0-9]*' | tail -1)
      if [ "${LAST:-0}" -ge $((TARGET - 1)) ]; then
        echo "queue19d: $PREFIX already at $LAST >= $TARGET; skip"
        continue
      fi
    fi
    echo "queue19d: $PREFIX chunk -> $TARGET at $(date)"
    bash pipeline/supervise.sh "$OUT" "$PREFIX" 10 900 -- \
      "$@" \
      --train.outer_steps=$TARGET --train.steps_per_call=$SPC \
      --train.log_every=2000 --train.val_every=1000 --train.viz_every=0 \
      --train.checkpoint_every=$CKPT_EVERY
    bash pipeline/commit_ckpts.sh "$PREFIX chunk -> $TARGET"
  done
}

# ---- S2: lde2 to 60k + benches (latest, best, bf16) ------------------------
LEAP_TRAIN_ARGS=(
  --task.pde=hyper_elasticity
  --task.domain.xmin=0.0 --task.domain.ymin=0.0
  --task.max_holes=5 --task.max_hole_size=0.5
  --task.vary_source=false --task.vary_bc=false
  --task.bc_weight=1.0
  --task.inner_points=2048 --task.outer_points=2048
  --task.validation_points=1024 --task.n_eval=4
  --solver.ground_truth_resolution=32
  --model.num_layers=10 --model.layer_size=128 --model.omega=30 --model.omega0=30
  --leap.bsize=8 --leap.inner_steps=20 --leap.inner_lr=5e-6 --leap.outer_lr=5e-6
  --leap.grad_clip=1000 --leap.inner_grad_clip=1000
  --train.optimizer=adam
)
run_chunks results_elasticity_leap lde2 4000 100 44001 52001 60001 -- \
  python -m metapde_tpu.cli.leap_pde "${LEAP_TRAIN_ARGS[@]}" \
    --train.out_dir=results_elasticity_leap --train.expt_name=lde2
D=$(newest_ckpt_dir results_elasticity_leap lde2)
if [ -n "${D:-}" ]; then
  echo "queue19d: lde2 LEAP benches on $D at $(date)"
  timeout 3600 python -m metapde_tpu.cli.deploy_bench --algo=leap \
    --from_run="$D" --task.n_eval=8 --inner-steps-list=0,5,20,40
  timeout 3600 python -m metapde_tpu.cli.deploy_bench --algo=leap \
    --from_run="$D" --task.n_eval=8 --inner-steps-list=0,5,20,40 \
    --checkpoint=best
  timeout 3600 python -m metapde_tpu.cli.deploy_bench --algo=leap \
    --from_run="$D" --task.n_eval=8 --inner-steps-list=0,5,20,40 \
    --model.compute_dtype=bfloat16 --checkpoint=best
  bash pipeline/commit_ckpts.sh "lde2@60k LEAP deploy benches (latest/best/bf16)"
fi

# ---- S3: em6 elasticity MAML 200k -> 300k (top-rank item) ------------------
em6_chunk_and_bench() {  # targets...
  run_chunks results_elasticity_maml em6 10000 500 "$@" -- \
    python -m metapde_tpu.cli.maml_pde \
      --from_run=results_elasticity_maml/em5 --train.expt_name=em6
  local D; D=$(newest_ckpt_dir results_elasticity_maml em6)
  if [ -n "${D:-}" ]; then
    timeout 3600 python -m metapde_tpu.cli.deploy_bench --algo=maml \
      --from_run="$D" --task.n_eval=8 --solver.ground_truth_resolution=48 \
      --inner-steps-list=0,1,2,5,10,20 --checkpoint=best
    bash pipeline/commit_ckpts.sh "em6 best-checkpoint bench"
  fi
}
em6_chunk_and_bench 250001 300001

# ---- S4: sbi10 steady-Burgers inner_steps=10 to 100k + benches -------------
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
)
run_chunks results_sburgers_maml sbi10 10000 500 50001 100001 -- \
  python -m metapde_tpu.cli.maml_pde "${SB_ARGS[@]}" \
    --train.out_dir=results_sburgers_maml --train.expt_name=sbi10
D=$(newest_ckpt_dir results_sburgers_maml sbi10)
if [ -n "${D:-}" ]; then
  echo "queue19d: sbi10 k-sweep benches on $D at $(date)"
  timeout 3600 python -m metapde_tpu.cli.deploy_bench --algo=maml \
    --from_run="$D" --task.n_eval=8 --inner-steps-list=0,1,2,5,10,20,40,80
  timeout 3600 python -m metapde_tpu.cli.deploy_bench --algo=maml \
    --from_run="$D" --task.n_eval=8 --inner-steps-list=0,1,2,5,10,20,40,80 \
    --checkpoint=best
  bash pipeline/commit_ckpts.sh "sbi10 deploy benches (latest + best)"
fi

# ---- S5: multi-seed fast-protocol parity + width-128 probe -----------------
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
run_probe() {  # name extra...
  local NAME=$1; shift
  if [ -f "results_poisson_maml/$NAME/metrics.jsonl" ] && \
     tail -1 "results_poisson_maml/$NAME/metrics.jsonl" | grep -q '"step": 29999'; then
    echo "queue19d: probe $NAME already complete; skip"
    return
  fi
  echo "queue19d: probe $NAME at $(date)"
  for ATTEMPT in 1 2; do
    timeout 3600 python -m metapde_tpu.cli.maml_pde "${PO_ARGS[@]}" \
      --train.expt_name="$NAME" "$@" && return
    echo "queue19d: probe $NAME attempt $ATTEMPT failed; sleeping 120s"
    sleep 120
  done
}
for SEED in 1 2 3; do
  run_probe "p30k_fast_s${SEED}" --seed=$SEED \
    --task.sample_with_replacement=true --model.compute_dtype=bfloat16
  run_probe "p30k_f32_s${SEED}" --seed=$SEED
done
run_probe p30k_fast_w128_s1 --seed=1 \
  --task.sample_with_replacement=true --model.compute_dtype=bfloat16 \
  --model.layer_size=128
bash pipeline/commit_ckpts.sh "30k multi-seed fast-protocol parity probes + w128"

# ---- S6: em6 open-ended 300k -> 500k until round end -----------------------
for T in $(seq 350001 50000 500001); do
  em6_chunk_and_bench "$T"
done
echo "queue19d: done at $(date)"
