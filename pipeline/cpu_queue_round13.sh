#!/bin/bash
# Round-13 CPU queue (runs behind the deploy_ms96em5 seeds-1,2,3 sweep).
#
#   1. seed-1 multi-start jitter characterization: K=8 at jitter 0.2 and
#      0.5 (the 0.05 A/B landed every candidate in the same buckling
#      basin as single-start: best 4.5e-2 vs 5.1e-2 - candidates from a
#      small jitter ball around one 200k init do not escape; see
#      RESULTS.md round-2 multi-start section)
#   2. elasticity 2-axis classical baseline: resolution x boundary_cap
#      (reference protocol fenics_baseline.py: spatial x boundary)
#   3. td_burgers 2-axis classical baseline: resolution x num_tsteps
#
# Usage: cpu_queue_round13.sh [wait_pid ...]
cd "$(dirname "$0")/.."
set -u

for WAIT_PID in "$@"; do
  echo "cpu13: waiting for pid $WAIT_PID"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
  echo "cpu13: pid $WAIT_PID done at $(date)"
done

MS_ARGS=(
  --task.pde=hyper_elasticity
  --task.domain.xmin=0.0 --task.domain.ymin=0.0
  --task.max_holes=5 --task.max_hole_size=1.0
  --task.vary_source=false --task.vary_bc=false
  --solver.ground_truth_resolution=96
  --model.num_layers=8 --model.layer_size=64 --model.omega=30 --model.omega0=30
  --train.optimizer=adam --maml.outer_lr=1e-5 --maml.grad_clip=100
  --maml.inner_steps=5 --maml.inner_lr=1e-5
  --task.bc_weight=1.0 --train.outer_steps=200 --task.outer_points=1024
  --task.validation_points=1024 --train.log_every=5 --train.val_every=5
  --train.viz_every=0 --train.checkpoint_every=0
  --train.load_model_from_expt=results_elasticity_maml/em5
  --train.out_dir=results_elasticity_deploy
)

for J in 0.2 0.5; do
  TAG=${J/./}
  echo "cpu13: seed-1 multi-start jitter $J at $(date)"
  env PYTHONPATH= JAX_PLATFORMS=cpu timeout 14400 \
    python -m metapde_tpu.cli.nn_pde_maml --seed=1 "${MS_ARGS[@]}" \
      --deploy.n_starts=8 --deploy.jitter=$J \
      --train.expt_name=deploy_ms96em5_j${TAG}_seed_1
done

echo "cpu13: elasticity 2-axis baseline at $(date)"
env PYTHONPATH= JAX_PLATFORMS=cpu timeout 28800 \
  python -m metapde_tpu.cli.solver_baseline \
    --task.pde=hyper_elasticity \
    --task.domain.xmin=0.0 --task.domain.ymin=0.0 \
    --task.max_holes=5 --task.max_hole_size=1.0 \
    --task.vary_source=false --task.vary_bc=false \
    --task.n_eval=4 --task.validation_points=1024 \
    --solver.ground_truth_resolution=64 \
    --resolutions=8,16,32 --axis2=boundary_cap:48,96,192 \
    --train.out_dir=baselines/hyper_elasticity --train.expt_name=sweep2axis

echo "cpu13: td_burgers 2-axis baseline at $(date)"
env PYTHONPATH= JAX_PLATFORMS=cpu timeout 14400 \
  python -m metapde_tpu.cli.solver_baseline \
    --task.pde=td_burgers \
    --task.domain.xmin=0.0 --task.domain.ymin=0.0 \
    --task.max_reynolds=100 --task.num_tsteps=201 \
    --task.vary_source=false \
    --task.n_eval=8 --task.validation_points=1024 \
    --solver.ground_truth_resolution=1024 \
    --resolutions=16,32,64,128,256 --axis2=num_tsteps:17,65,201 \
    --train.out_dir=baselines/td_burgers --train.expt_name=sweep2axis

bash pipeline/commit_ckpts.sh "cpu13 artifacts"
echo "cpu13: done at $(date)"
