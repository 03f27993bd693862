#!/bin/bash
# Deployment fine-tune sweeps from meta-learned inits, 8 seeds (reference:
# pipeline/pipeline_poisson_maml.sh, pipeline_poisson_leap.sh).
cd "$(dirname "$0")/.."

# from a MAML init (hybrid warm start applies learned inner LRs)
python -m metapde_tpu.cli.sweep --driver=nn_pde_maml --seeds=1,2,3,4,5,6,7,8 -- \
  --task.pde=poisson --solver.ground_truth_resolution=32 \
  --model.num_layers=3 --model.layer_size=64 --model.omega=30 --model.omega0=30 \
  --train.optimizer=adam --maml.outer_lr=1e-5 --maml.grad_clip=100 \
  --task.bc_weight=1.0 --train.outer_steps=200 --task.outer_points=1024 \
  --task.validation_points=1024 --train.log_every=5 \
  --train.load_model_from_expt=poisson_maml_results/default_final \
  --train.expt_name=deploy_maml

# from a LEAP init
python -m metapde_tpu.cli.sweep --driver=nn_pde --seeds=1,2,3,4,5,6,7,8 -- \
  --task.pde=poisson --solver.ground_truth_resolution=32 \
  --model.num_layers=5 --model.layer_size=64 --model.omega=30 --model.omega0=30 \
  --train.optimizer=adam --maml.outer_lr=2.5e-5 \
  --task.bc_weight=1.0 --train.outer_steps=200 --task.outer_points=512 \
  --task.validation_points=1024 --train.log_every=5 \
  --train.load_model_from_expt=poisson_leap_results/default_final \
  --train.expt_name=deploy_leap
