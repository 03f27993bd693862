#!/bin/bash
# Paper meta-training configs, MAML (reference: pipeline/pipleline_maml_meta.sh).
# One flagship run per PDE family; adjust --mesh.n_task_shards to the slice.
cd "$(dirname "$0")/.."

python -m metapde_tpu.cli.maml_pde --task.pde=poisson \
  --solver.ground_truth_resolution=16 \
  --model.num_layers=3 --model.layer_size=64 --model.omega=30 --model.omega0=30 \
  --maml.inner_steps=5 --maml.inner_lr=1e-4 --maml.outer_lr=1e-5 \
  --maml.inner_grad_clip=100 --maml.grad_clip=100 --maml.bsize=16 \
  --task.bc_weight=1.0 --task.inner_points=1024 --task.outer_points=1024 \
  --task.validation_points=1024 --task.n_eval=8 \
  --train.outer_steps=500000 --train.log_every=2000 --train.steps_per_call=200 --train.checkpoint_every=50000 --train.optimizer=adam \
  --train.expt_name=default_final "$@" &

python -m metapde_tpu.cli.maml_pde --task.pde=td_burgers \
  --task.domain.xmin=0.0 --task.domain.ymin=0.0 \
  --solver.ground_truth_resolution=512 --task.max_reynolds=100 \
  --task.num_tsteps=201 --task.vary_source=false \
  --model.num_layers=8 --model.layer_size=64 --model.omega=30 --model.omega0=30 \
  --maml.inner_steps=5 --maml.inner_lr=1e-4 --maml.outer_lr=1e-5 \
  --maml.inner_grad_clip=100 --maml.grad_clip=100 --maml.bsize=8 \
  --task.inner_points=1024 --task.outer_points=1024 --task.validation_points=1024 \
  --task.n_eval=8 --train.outer_steps=500000 --train.log_every=2000 --train.steps_per_call=200 --train.checkpoint_every=50000 \
  --train.optimizer=adam --train.expt_name=default_final "$@" &

python -m metapde_tpu.cli.maml_pde --task.pde=hyper_elasticity \
  --task.domain.xmin=0.0 --task.domain.ymin=0.0 \
  --task.max_holes=5 --task.max_hole_size=1.0 \
  --solver.ground_truth_resolution=32 \
  --task.vary_source=false --task.vary_bc=false \
  --model.num_layers=8 --model.layer_size=64 --model.omega=30 --model.omega0=30 \
  --maml.inner_steps=5 --maml.inner_lr=1e-5 --maml.outer_lr=1e-5 \
  --maml.inner_grad_clip=100 --maml.grad_clip=100 --maml.bsize=8 \
  --task.bc_weight=1.0 --task.inner_points=1024 --task.outer_points=1024 \
  --task.validation_points=1024 --task.n_eval=8 \
  --train.outer_steps=500000 --train.log_every=2000 --train.steps_per_call=200 --train.checkpoint_every=50000 --train.optimizer=adam \
  --train.expt_name=default_final "$@" &

wait
