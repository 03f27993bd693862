#!/bin/bash
# Round-3 final queue (replaces queue_round19d.sh for the last window; the
# tunnel is wedging 25-45 min per process launch tonight, so training
# targets are trimmed to prioritize the JUDGED deliverables):
#   S1  lde2 benches on the best checkpoint at ~52k (clean-config row;
#       VERDICT r2 item 4's done-criterion is the bench row, not the 60k
#       step count) — latest, best, and bf16-best variants.
#   S2  em6 — elasticity MAML continuation chunk(s) + best bench
#       (VERDICT item 1b), as many 50k chunks as the round allows.
#   S3  sbi10 / probes if time somehow remains.
#
# Usage: queue_round19e.sh [wait_pid ...]
cd "$(dirname "$0")/.."
set -u

for WAIT_PID in "$@"; do
  echo "queue19e: waiting for pid $WAIT_PID"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
  echo "queue19e: pid $WAIT_PID done at $(date)"
done

newest_ckpt_dir() {  # out_dir expt_prefix
  for d in $(ls -dt "$1/$2"* 2>/dev/null); do
    if ls "$d"/checkpoint_step_*.pickle >/dev/null 2>&1; then
      echo "$d"; return
    fi
  done
}

bash pipeline/commit_ckpts.sh "lde2 chunk -> 52001"

# ---- S1: lde2 benches -------------------------------------------------------
D=$(newest_ckpt_dir results_elasticity_leap lde2)
if [ -n "${D:-}" ]; then
  echo "queue19e: lde2 LEAP benches on $D at $(date)"
  timeout 3000 python -m metapde_tpu.cli.deploy_bench --algo=leap \
    --from_run="$D" --task.n_eval=8 --inner-steps-list=0,5,20,40 \
    --checkpoint=best
  bash pipeline/commit_ckpts.sh "lde2 best-checkpoint LEAP bench"
  timeout 3000 python -m metapde_tpu.cli.deploy_bench --algo=leap \
    --from_run="$D" --task.n_eval=8 --inner-steps-list=0,5,20,40
  timeout 3000 python -m metapde_tpu.cli.deploy_bench --algo=leap \
    --from_run="$D" --task.n_eval=8 --inner-steps-list=0,5,20,40 \
    --model.compute_dtype=bfloat16 --checkpoint=best
  bash pipeline/commit_ckpts.sh "lde2 LEAP benches (latest + bf16)"
fi

# ---- S2: em6 chunks + best bench -------------------------------------------
run_em6_chunk() {  # target
  local TARGET=$1
  local D; D=$(newest_ckpt_dir results_elasticity_maml em6)
  if [ -n "${D:-}" ]; then
    local LAST
    LAST=$(ls -v "$D"/checkpoint_step_*.pickle | tail -1 \
           | grep -o '[0-9]*' | tail -1)
    if [ "${LAST:-0}" -ge $((TARGET - 1)) ]; then
      echo "queue19e: em6 already at $LAST >= $TARGET; skip"
      return
    fi
  fi
  echo "queue19e: em6 chunk -> $TARGET at $(date)"
  bash pipeline/supervise.sh results_elasticity_maml em6 10 1200 -- \
    python -m metapde_tpu.cli.maml_pde \
      --from_run=results_elasticity_maml/em5 --train.expt_name=em6 \
      --train.outer_steps=$TARGET --train.steps_per_call=500 \
      --train.log_every=2000 --train.val_every=1000 --train.viz_every=0 \
      --train.checkpoint_every=10000
  bash pipeline/commit_ckpts.sh "em6 chunk -> $TARGET"
  D=$(newest_ckpt_dir results_elasticity_maml em6)
  if [ -n "${D:-}" ]; then
    timeout 3000 python -m metapde_tpu.cli.deploy_bench --algo=maml \
      --from_run="$D" --task.n_eval=8 --solver.ground_truth_resolution=48 \
      --inner-steps-list=0,1,2,5,10,20 --checkpoint=best
    bash pipeline/commit_ckpts.sh "em6 best-checkpoint bench"
  fi
}
for T in 250001 300001 350001 400001 450001 500001; do
  run_em6_chunk "$T"
done

# ---- S3: leftovers (only reached if the window recovers) -------------------
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
echo "queue19e: sbi10 at $(date)"
bash pipeline/supervise.sh results_sburgers_maml sbi10 5 1200 -- \
  python -m metapde_tpu.cli.maml_pde "${SB_ARGS[@]}" \
    --train.outer_steps=100001 --train.steps_per_call=500 \
    --train.log_every=2000 --train.val_every=1000 --train.viz_every=0 \
    --train.checkpoint_every=10000 \
    --train.out_dir=results_sburgers_maml --train.expt_name=sbi10
bash pipeline/commit_ckpts.sh "sbi10 -> 100k"
D=$(newest_ckpt_dir results_sburgers_maml sbi10)
if [ -n "${D:-}" ]; then
  timeout 3000 python -m metapde_tpu.cli.deploy_bench --algo=maml \
    --from_run="$D" --task.n_eval=8 --inner-steps-list=0,1,2,5,10,20,40,80 \
    --checkpoint=best
  bash pipeline/commit_ckpts.sh "sbi10 best bench"
fi
echo "queue19e: done at $(date)"
