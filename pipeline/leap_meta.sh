#!/bin/bash
# Paper meta-training configs, LEAP (reference: pipeline/pipeline_leap_meta.sh).
cd "$(dirname "$0")/.."

python -m metapde_tpu.cli.leap_pde --task.pde=poisson \
  --solver.ground_truth_resolution=32 \
  --model.num_layers=5 --model.layer_size=64 --model.omega=30 --model.omega0=30 \
  --leap.inner_steps=60 --leap.inner_lr=2.5e-5 --leap.outer_lr=5e-5 \
  --leap.bsize=8 --task.bc_weight=1.0 \
  --task.inner_points=4096 --task.outer_points=4096 --task.validation_points=4096 \
  --task.n_eval=8 --train.outer_steps=500000 --train.log_every=2000 --train.steps_per_call=200 --train.checkpoint_every=50000 \
  --train.optimizer=adam --train.expt_name=default_final "$@" &

python -m metapde_tpu.cli.leap_pde --task.pde=td_burgers \
  --task.domain.xmin=0.0 --task.max_reynolds=100 \
  --solver.ground_truth_resolution=512 --task.num_tsteps=201 \
  --task.vary_source=false --task.vary_bc=false \
  --model.num_layers=10 --model.layer_size=128 --model.omega=30 --model.omega0=30 \
  --leap.inner_steps=80 --leap.inner_lr=1e-6 --leap.outer_lr=5e-5 \
  --leap.bsize=8 --task.bc_weight=1.0 \
  --task.inner_points=2048 --task.outer_points=2048 --task.validation_points=2048 \
  --task.n_eval=8 --train.outer_steps=500000 --train.log_every=2000 --train.steps_per_call=200 --train.checkpoint_every=50000 \
  --train.optimizer=adam --train.expt_name=default_final "$@" &

python -m metapde_tpu.cli.leap_pde --task.pde=hyper_elasticity \
  --task.domain.xmin=0.0 --task.domain.ymin=0.0 \
  --task.max_holes=5 --task.max_hole_size=0.5 \
  --solver.ground_truth_resolution=32 \
  --task.vary_source=false --task.vary_bc=false \
  --model.num_layers=10 --model.layer_size=128 --model.omega=30 --model.omega0=30 \
  --leap.inner_steps=20 --leap.inner_lr=5e-6 --leap.outer_lr=5e-6 \
  --leap.inner_grad_clip=1000 --leap.grad_clip=1000 --leap.bsize=8 \
  --task.bc_weight=1.0 \
  --task.inner_points=2048 --task.outer_points=2048 --task.validation_points=1024 \
  --task.n_eval=8 --train.outer_steps=500000 --train.log_every=2000 --train.steps_per_call=200 --train.checkpoint_every=50000 \
  --train.optimizer=adam --train.expt_name=full_default "$@" &

wait
