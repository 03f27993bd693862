#!/bin/bash
# 3D Poisson stretch meta-training (BASELINE.json configs[4]): 256-task
# second-order MAML on the poisson3d manufactured-solution family.
# Designed for a v5p-32-class slice: the task batch shards over the dp
# mesh axis (8 below — set n_task_shards to the device count). On one
# chip, drop --mesh.n_task_shards and bsize to 16 for a smoke run.
# Validation is against the EXACT manufactured solution (no oracle cost),
# so val_every can be tight.
cd "$(dirname "$0")/.."

python -m metapde_tpu.cli.maml_pde --task.pde=poisson3d \
  --model.num_layers=5 --model.layer_size=128 --model.omega=30 --model.omega0=30 \
  --maml.inner_steps=5 --maml.inner_lr=1e-4 --maml.outer_lr=1e-5 \
  --maml.inner_grad_clip=100 --maml.grad_clip=100 --maml.bsize=256 \
  --mesh.n_task_shards=8 \
  --task.bc_weight=1.0 --task.inner_points=2048 --task.outer_points=2048 \
  --task.validation_points=2048 --task.n_eval=8 \
  --train.outer_steps=500000 --train.log_every=2000 --train.steps_per_call=200 \
  --train.checkpoint_every=50000 --train.optimizer=adam \
  --train.out_dir=results_poisson3d_maml --train.expt_name=default_final "$@"
