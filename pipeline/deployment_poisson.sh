#!/bin/bash
# Deployment fine-tune sweeps from meta-learned inits, 8 seeds (reference:
# pipeline/pipeline_poisson_maml.sh, pipeline_poisson_leap.sh: nn_pde runs
# with --load_model_from_expt producing the paper's accuracy-vs-wallclock
# deployment curves; parsed here by train/analysis.accuracy_vs_time).
# Run on CPU (env PYTHONPATH= JAX_PLATFORMS=cpu ...) if the TPU is busy.
cd "$(dirname "$0")/.."

# from the 500k-step MAML init (hybrid warm start applies learned inner LRs)
python -m metapde_tpu.cli.sweep --driver=nn_pde_maml --seeds=1,2,3,4,5,6,7,8 -- \
  --task.pde=poisson --solver.ground_truth_resolution=32 \
  --model.num_layers=3 --model.layer_size=64 --model.omega=30 --model.omega0=30 \
  --train.optimizer=adam --maml.outer_lr=1e-5 --maml.grad_clip=100 \
  --maml.inner_steps=5 --maml.inner_lr=1e-4 \
  --task.bc_weight=1.0 --train.outer_steps=200 --task.outer_points=1024 \
  --task.validation_points=1024 --train.log_every=5 --train.val_every=5 \
  --train.viz_every=0 --train.checkpoint_every=0 \
  --train.load_model_from_expt=results_poisson_maml/tpu_run6b \
  --train.out_dir=results_poisson_deploy --train.expt_name=deploy_maml

# from the LEAP init (plain fine-tune); newest LEAP run dir that actually
# has a checkpoint (lp2 preferred, tpu_run1_1 fallback)
LEAP_D=""
for d in $(ls -dt results_poisson_leap/lp2* results_poisson_leap/tpu_run1* 2>/dev/null); do
  if ls "$d"/checkpoint_step_*.pickle >/dev/null 2>&1; then LEAP_D=$d; break; fi
done
if [ -z "$LEAP_D" ]; then
  echo "deployment_poisson: no LEAP checkpoint yet; skipping LEAP sweep"; exit 0
fi
python -m metapde_tpu.cli.sweep --driver=nn_pde --seeds=1,2,3,4,5,6,7,8 -- \
  --task.pde=poisson --solver.ground_truth_resolution=32 \
  --model.num_layers=5 --model.layer_size=64 --model.omega=30 --model.omega0=30 \
  --train.optimizer=adam --maml.outer_lr=2.5e-5 \
  --task.bc_weight=1.0 --train.outer_steps=200 --task.outer_points=512 \
  --task.validation_points=1024 --train.log_every=5 --train.val_every=5 \
  --train.viz_every=0 --train.checkpoint_every=0 \
  --train.load_model_from_expt="$LEAP_D" \
  --train.out_dir=results_poisson_deploy --train.expt_name=deploy_leap
