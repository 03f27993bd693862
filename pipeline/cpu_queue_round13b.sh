#!/bin/bash
# Round-13b CPU queue (chained after cpu_queue_round13.sh): the one-task
# deep dive VERDICT item 8 asks for. Task 7 of the hole-1.0 warm-chain
# sweep (the hardest near-limit geometry: walls ~0.029, ligament-floored
# to res 69) sits at 3.5e-2 single-branch discretization error vs the
# res-96 reference. Push ITS branch-tracked ladder to finer lattices
# (96, 144 vs an f64 res-192 reference) to show plain O(h^2)-ish
# convergence below 1e-2, or produce the written bound.
#
# Usage: cpu_queue_round13b.sh [wait_pid ...]
cd "$(dirname "$0")/.."
set -u

for WAIT_PID in "$@"; do
  echo "cpu13b: waiting for pid $WAIT_PID"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
  echo "cpu13b: pid $WAIT_PID done at $(date)"
done

echo "cpu13b: near-limit task-7 fine-lattice warm chain at $(date)"
env PYTHONPATH= JAX_PLATFORMS=cpu timeout 43200 \
  python -m metapde_tpu.cli.gt_convergence --warm_chain --per_task \
    --task.pde=hyper_elasticity \
    --task.domain.xmin=0.0 --task.domain.ymin=0.0 \
    --task.max_holes=5 --task.max_hole_size=1.0 \
    --task.vary_source=false --task.vary_bc=false \
    --resolutions=48,96,144 --ref_resolution=192 \
    --n_tasks=8 --task_index=7 \
  | tee baselines/hyper_elasticity/warm_chain_hole10_task7_fine.jsonl

bash pipeline/commit_ckpts.sh "near-limit task-7 fine-lattice warm chain"
echo "cpu13b: done at $(date)"
