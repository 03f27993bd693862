#!/bin/bash
# Classical-solver accuracy-vs-time baselines (reference:
# pipeline/pipeline_baseline.sh; the reference pins FEM to one CPU core via
# taskset — here the solvers are jit-compiled JAX and run wherever jax does).
cd "$(dirname "$0")/.."

python -m metapde_tpu.cli.solver_baseline --task.pde=poisson \
  --solver.ground_truth_resolution=64 --resolutions=2,4,8,16,32 \
  --task.n_eval=16 --train.expt_name=res_sweep "$@"

python -m metapde_tpu.cli.solver_baseline --task.pde=td_burgers \
  --task.domain.xmin=0.0 --solver.ground_truth_resolution=512 \
  --resolutions=16,32,64,128,256 --task.vary_source=false \
  --task.max_reynolds=100 --task.num_tsteps=9 --task.n_eval=8 \
  --train.expt_name=res_sweep "$@"

python -m metapde_tpu.cli.solver_baseline --task.pde=hyper_elasticity \
  --task.domain.xmin=0.0 --task.domain.ymin=0.0 \
  --task.max_holes=5 --task.max_hole_size=1.0 \
  --task.vary_source=false --task.vary_bc=false \
  --solver.ground_truth_resolution=64 --resolutions=4,8,16,32 \
  --task.n_eval=8 --train.expt_name=res_sweep "$@"
