#!/bin/bash
# Round-3 queue: finish the 500k-protocol items from VERDICT r2.
#   S1  bm7  — td_burgers MAML 60k -> 500k (resume tpu_run1; the bm6
#              headline has no committed weights). Chunked targets with
#              commit_ckpts between, then latest+best k-sweep benches.
#   S2  lde2 — finish the clean elasticity LEAP re-earn to 60k, then
#              latest+best LEAP benches (retires the drifted lde1_1 row).
#   S3  sbi10 — fresh steady-Burgers MAML with inner_steps=10 (the
#              builder-attributed lever for the <=5e-3 @ k<=20 bar).
#   S4  multi-seed fast-protocol parity: with-replacement+bf16 vs f32
#              control at seeds 1,2,3, 30k steps each (VERDICT item 6).
#   S5  em6  — elasticity MAML continuation from em5@200k with pinned
#              eval tasks + best tracking, 50k chunks until round end.
# ONE TPU process at a time. Eval tasks are pinned across every resume
# hop by the checkpointed gt_key (train/maml_driver.py round-3 change).
#
# Usage: queue_round19.sh [wait_pid ...]
cd "$(dirname "$0")/.."
set -u

for WAIT_PID in "$@"; do
  echo "queue19: waiting for pid $WAIT_PID"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
  echo "queue19: pid $WAIT_PID done at $(date)"
done

newest_ckpt_dir() {  # out_dir expt_prefix
  for d in $(ls -dt "$1/$2"* 2>/dev/null); do
    if ls "$d"/checkpoint_step_*.pickle >/dev/null 2>&1; then
      echo "$d"; return
    fi
  done
}

# ---- S0 (CPU, background): prewarm poisson res-32 gt for probe seeds ----
# The poisson multigrid gt program kernel-faults the TPU worker on the
# round-2 tunnel window (NEXT.md 8); gt_cache now also retries on CPU in
# code, but prewarming keeps the probe stages crash-free. Keys depend only
# on (seed, n_eval, resolution, pde) so tiny 1-step runs fill them.
(
  for SEED in 1 2 3; do
    env PYTHONPATH= JAX_PLATFORMS=cpu timeout 3600 \
      python -m metapde_tpu.cli.maml_pde \
        --task.pde=poisson --seed=$SEED --task.n_eval=8 \
        --solver.ground_truth_resolution=32 \
        --task.inner_points=32 --task.outer_points=32 \
        --task.validation_points=64 \
        --model.num_layers=2 --model.layer_size=16 \
        --maml.bsize=2 --maml.inner_steps=2 \
        --train.outer_steps=1 --train.log_every=1 --train.viz_every=0 \
        --train.checkpoint_every=0 \
        --train.out_dir=results_poisson_maml \
        --train.expt_name=gtwarm_seed$SEED \
        > /tmp/gtwarm_seed$SEED.log 2>&1
    echo "queue19: prewarm seed $SEED done at $(date)"
  done
  touch /tmp/queue19_prewarm_done
) &
PREWARM_PID=$!
echo "queue19: CPU prewarm running as pid $PREWARM_PID"

# ---- S1: bm7 td_burgers MAML 60k -> 500k --------------------------------
# Chunked so weights/metrics become durable every ~45 min (bm6's 220k
# weights were lost to exactly this gap in round 1).
for TARGET in 160001 260001 360001 460001 500001; do
  D=$(newest_ckpt_dir results_burgers_maml bm7)
  if [ -n "${D:-}" ]; then
    LAST=$(ls -v "$D"/checkpoint_step_*.pickle | tail -1 | grep -o '[0-9]*' | tail -1)
    if [ "${LAST:-0}" -ge $((TARGET - 1)) ]; then
      echo "queue19: bm7 already at $LAST >= $TARGET; skip"
      continue
    fi
  fi
  echo "queue19: bm7 chunk -> $TARGET at $(date)"
  bash pipeline/supervise.sh results_burgers_maml bm7 10 900 -- \
    python -m metapde_tpu.cli.maml_pde \
      --from_run=results_burgers_maml/tpu_run1 \
      --train.expt_name=bm7 \
      --train.outer_steps=$TARGET --train.steps_per_call=500 \
      --train.log_every=2000 --train.val_every=1000 --train.viz_every=0 \
      --train.checkpoint_every=20000
  bash pipeline/commit_ckpts.sh "bm7 td_burgers 500k-protocol chunk -> $TARGET"
done

D=$(newest_ckpt_dir results_burgers_maml bm7)
if [ -n "${D:-}" ]; then
  echo "queue19: bm7 k-sweep benches on $D at $(date)"
  timeout 3600 python -m metapde_tpu.cli.deploy_bench --algo=maml \
    --from_run="$D" --task.n_eval=8 --inner-steps-list=0,1,2,5,10,20,40
  timeout 3600 python -m metapde_tpu.cli.deploy_bench --algo=maml \
    --from_run="$D" --task.n_eval=8 --inner-steps-list=0,1,2,5,10,20,40 \
    --checkpoint=best
  bash pipeline/commit_ckpts.sh "bm7 500k deploy benches (latest + best)"
fi

# ---- S2: lde2 clean elasticity LEAP to 60k + benches ---------------------
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
for TARGET in 44001 52001 60001; do
  D=$(newest_ckpt_dir results_elasticity_leap lde2)
  if [ -n "${D:-}" ]; then
    LAST=$(ls -v "$D"/checkpoint_step_*.pickle | tail -1 | grep -o '[0-9]*' | tail -1)
    if [ "${LAST:-0}" -ge $((TARGET - 1)) ]; then
      echo "queue19: lde2 already at $LAST >= $TARGET; skip"
      continue
    fi
  fi
  echo "queue19: lde2 chunk -> $TARGET at $(date)"
  bash pipeline/supervise.sh results_elasticity_leap lde2 10 900 -- \
    python -m metapde_tpu.cli.leap_pde "${LEAP_TRAIN_ARGS[@]}" \
      --train.outer_steps=$TARGET --train.steps_per_call=100 \
      --train.log_every=2000 --train.val_every=1000 --train.viz_every=0 \
      --train.checkpoint_every=4000 \
      --train.out_dir=results_elasticity_leap --train.expt_name=lde2
  bash pipeline/commit_ckpts.sh "lde2 clean LEAP chunk -> $TARGET"
done
D=$(newest_ckpt_dir results_elasticity_leap lde2)
if [ -n "${D:-}" ]; then
  echo "queue19: lde2 LEAP benches on $D at $(date)"
  timeout 3600 python -m metapde_tpu.cli.deploy_bench --algo=leap \
    --from_run="$D" --task.n_eval=8 --inner-steps-list=0,5,20,40
  timeout 3600 python -m metapde_tpu.cli.deploy_bench --algo=leap \
    --from_run="$D" --task.n_eval=8 --inner-steps-list=0,5,20,40 \
    --checkpoint=best
  bash pipeline/commit_ckpts.sh "lde2@60k LEAP deploy benches (latest + best)"
fi

# ---- S3: sbi10 steady-Burgers MAML, inner_steps=10 -----------------------
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
for TARGET in 50001 100001 150001; do
  D=$(newest_ckpt_dir results_sburgers_maml sbi10)
  if [ -n "${D:-}" ]; then
    LAST=$(ls -v "$D"/checkpoint_step_*.pickle | tail -1 | grep -o '[0-9]*' | tail -1)
    if [ "${LAST:-0}" -ge $((TARGET - 1)) ]; then
      echo "queue19: sbi10 already at $LAST >= $TARGET; skip"
      continue
    fi
  fi
  echo "queue19: sbi10 chunk -> $TARGET at $(date)"
  bash pipeline/supervise.sh results_sburgers_maml sbi10 10 900 -- \
    python -m metapde_tpu.cli.maml_pde "${SB_ARGS[@]}" \
      --train.outer_steps=$TARGET --train.steps_per_call=500 \
      --train.log_every=2000 --train.val_every=1000 --train.viz_every=0 \
      --train.checkpoint_every=10000 \
      --train.out_dir=results_sburgers_maml --train.expt_name=sbi10
  bash pipeline/commit_ckpts.sh "sbi10 inner_steps=10 chunk -> $TARGET"
done
D=$(newest_ckpt_dir results_sburgers_maml sbi10)
if [ -n "${D:-}" ]; then
  echo "queue19: sbi10 k-sweep benches on $D at $(date)"
  timeout 3600 python -m metapde_tpu.cli.deploy_bench --algo=maml \
    --from_run="$D" --task.n_eval=8 --inner-steps-list=0,1,2,5,10,20,40,80
  timeout 3600 python -m metapde_tpu.cli.deploy_bench --algo=maml \
    --from_run="$D" --task.n_eval=8 --inner-steps-list=0,1,2,5,10,20,40,80 \
    --checkpoint=best
  bash pipeline/commit_ckpts.sh "sbi10 deploy benches (latest + best)"
fi

# ---- S4: multi-seed fast-protocol parity (VERDICT item 6) ----------------
echo "queue19: waiting for CPU prewarm before probes"
while [ ! -f /tmp/queue19_prewarm_done ] && kill -0 "$PREWARM_PID" 2>/dev/null; do
  sleep 60
done
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
for SEED in 1 2 3; do
  for VARIANT in fast f32; do
    NAME="p30k_${VARIANT}_s${SEED}"
    if [ -f "results_poisson_maml/$NAME/metrics.jsonl" ] && \
       tail -1 "results_poisson_maml/$NAME/metrics.jsonl" | grep -q '"step": 29999'; then
      echo "queue19: probe $NAME already complete; skip"
      continue
    fi
    EXTRA=()
    if [ "$VARIANT" = fast ]; then
      EXTRA=(--task.sample_with_replacement=true --model.compute_dtype=bfloat16)
    fi
    echo "queue19: probe $NAME at $(date)"
    for ATTEMPT in 1 2; do
      timeout 3600 python -m metapde_tpu.cli.maml_pde "${PO_ARGS[@]}" \
        --seed=$SEED --train.expt_name="$NAME" "${EXTRA[@]}" && break
      echo "queue19: probe $NAME attempt $ATTEMPT failed; sleeping 120s"
      sleep 120
    done
  done
done
bash pipeline/commit_ckpts.sh "30k multi-seed fast-protocol parity probes"

# ---- S5: em6 elasticity MAML continuation until round end ----------------
# Resume from em5@200k (the em5_1 200k->270k segment regressed and is
# abandoned); pinned eval tasks + best tracking from the first em6 hop.
for TARGET in $(seq 250001 50000 500001); do
  D=$(newest_ckpt_dir results_elasticity_maml em6)
  if [ -n "${D:-}" ]; then
    LAST=$(ls -v "$D"/checkpoint_step_*.pickle | tail -1 | grep -o '[0-9]*' | tail -1)
    if [ "${LAST:-0}" -ge $((TARGET - 1)) ]; then
      echo "queue19: em6 already at $LAST >= $TARGET; skip"
      continue
    fi
  fi
  echo "queue19: em6 chunk -> $TARGET at $(date)"
  bash pipeline/supervise.sh results_elasticity_maml em6 10 900 -- \
    python -m metapde_tpu.cli.maml_pde \
      --from_run=results_elasticity_maml/em5 \
      --train.expt_name=em6 \
      --train.outer_steps=$TARGET --train.steps_per_call=500 \
      --train.log_every=2000 --train.val_every=1000 --train.viz_every=0 \
      --train.checkpoint_every=10000
  bash pipeline/commit_ckpts.sh "em6 elasticity continuation chunk -> $TARGET"
  # bench the best state after every chunk so the round always has a
  # current em6 row even if the next chunk is cut off mid-flight
  D=$(newest_ckpt_dir results_elasticity_maml em6)
  if [ -n "${D:-}" ]; then
    timeout 3600 python -m metapde_tpu.cli.deploy_bench --algo=maml \
      --from_run="$D" --task.n_eval=8 --solver.ground_truth_resolution=48 \
      --inner-steps-list=0,1,2,5,10,20 --checkpoint=best
    bash pipeline/commit_ckpts.sh "em6 best-checkpoint bench after $TARGET"
  fi
done
echo "queue19: done at $(date)"
