#!/bin/bash
# TD-Burgers deployment fine-tune sweeps, 8 seeds (reference:
# pipeline/pipeline_burger_maml.sh / _leap.sh deployment runs).
# Run on CPU (env PYTHONPATH= JAX_PLATFORMS=cpu ...) if the TPU is busy.
cd "$(dirname "$0")/.."

# from the MAML init (hybrid warm start applies learned inner LRs)
python -m metapde_tpu.cli.sweep --driver=nn_pde_maml --seeds=1,2,3,4,5,6,7,8 -- \
  --task.pde=td_burgers --task.domain.xmin=0.0 --task.max_reynolds=100 \
  --task.num_tsteps=201 --task.vary_source=false \
  --solver.ground_truth_resolution=512 \
  --model.num_layers=8 --model.layer_size=64 --model.omega=30 --model.omega0=30 \
  --train.optimizer=adam --maml.outer_lr=1e-5 --maml.grad_clip=100 \
  --maml.inner_steps=5 --maml.inner_lr=1e-4 \
  --task.bc_weight=1.0 --train.outer_steps=200 --task.outer_points=1024 \
  --task.validation_points=1024 --train.log_every=5 --train.val_every=5 \
  --train.viz_every=0 --train.checkpoint_every=0 \
  --train.load_model_from_expt=results_burgers_maml/tpu_run1 \
  --train.out_dir=results_burgers_deploy --train.expt_name=deploy_maml

# from the LEAP init (plain fine-tune, 10x128 net)
python -m metapde_tpu.cli.sweep --driver=nn_pde --seeds=1,2,3,4,5,6,7,8 -- \
  --task.pde=td_burgers --task.domain.xmin=0.0 --task.max_reynolds=100 \
  --task.num_tsteps=201 --task.vary_source=false --task.vary_bc=false \
  --solver.ground_truth_resolution=512 \
  --model.num_layers=10 --model.layer_size=128 --model.omega=30 --model.omega0=30 \
  --train.optimizer=adam --maml.outer_lr=1e-5 \
  --task.bc_weight=1.0 --train.outer_steps=200 --task.outer_points=1024 \
  --task.validation_points=1024 --train.log_every=5 --train.val_every=5 \
  --train.viz_every=0 --train.checkpoint_every=0 \
  --train.load_model_from_expt=results_burgers_leap/ldb3_1 \
  --train.out_dir=results_burgers_deploy --train.expt_name=deploy_leap
