#!/bin/bash
# Round-9 sequential CPU queue: branch-tracked oracle self-convergence
# tables (gt_convergence --warm_chain, commit "Branch-tracking warm-start
# continuation"). Runs after the round-8 deployment re-sweeps.
#
# Each task's resolution chain is warm-started coarse -> fine -> f64 ref,
# so cross-resolution disagreement measures discretization error on ONE
# energy branch — near-limit pore lattices no longer show O(1) "error"
# from landing on different pore-collapse patterns per resolution.
#
# Usage: cpu_queue_round9.sh [wait_pid ...]
cd "$(dirname "$0")/.."
set -u
export PYTHONPATH= JAX_PLATFORMS=cpu

for WAIT_PID in "$@"; do
  echo "cpu-queue9: waiting for pid $WAIT_PID"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
  echo "cpu-queue9: pid $WAIT_PID done at $(date)"
done

mkdir -p baselines/hyper_elasticity

# LEAP family (hole 0.5): full resolution ladder vs f64 res-96 ref
echo "cpu-queue9: warm-chain convergence, hole-0.5 family at $(date)"
timeout 21600 python -m metapde_tpu.cli.gt_convergence --warm_chain --per_task \
  --task.pde=hyper_elasticity \
  --task.domain.xmin=0.0 --task.domain.ymin=0.0 \
  --task.max_holes=5 --task.max_hole_size=0.5 \
  --task.vary_source=false --task.vary_bc=false \
  --resolutions=12,24,48 --ref_resolution=96 --n_tasks=8 \
  | tee baselines/hyper_elasticity/warm_chain_hole05.jsonl

# MAML family (hole 1.0, near-limit): operational res 32/48 vs f64 res-96
echo "cpu-queue9: warm-chain convergence, hole-1.0 family at $(date)"
timeout 43200 python -m metapde_tpu.cli.gt_convergence --warm_chain --per_task \
  --task.pde=hyper_elasticity \
  --task.domain.xmin=0.0 --task.domain.ymin=0.0 \
  --task.max_holes=5 --task.max_hole_size=1.0 \
  --task.vary_source=false --task.vary_bc=false \
  --resolutions=32,48 --ref_resolution=96 --n_tasks=8 \
  | tee baselines/hyper_elasticity/warm_chain_hole10.jsonl

echo "cpu-queue9: all jobs done at $(date)"
