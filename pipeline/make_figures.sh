#!/bin/bash
# Regenerate the paper-style accuracy-vs-time Pareto figures (reference:
# resultAnalysis.ipynb cells 6-8/17/24) from committed artifacts:
#   baselines/<pde>/errors_by_resolution.json  (cli/solver_baseline sweeps)
#   results_*/<run>/deploy_bench.jsonl         (cli/deploy_bench k-sweeps)
# Reference context points are the published numbers from BASELINE.md.
cd "$(dirname "$0")/.."
set -e
export PYTHONPATH= JAX_PLATFORMS=cpu

python -m metapde_tpu.cli.paper_plots --out=figures \
  --title="Poisson: accuracy vs wall time per task" --name=pareto_poisson \
  --baseline=baselines/poisson \
  --baseline2="Richardson oracle (order ~3, x64 CPU):baselines/poisson_richardson" \
  --deploy=MAML:results_poisson_maml/tpu_run6b/deploy_bench.jsonl \
  --deploy=LEAP:results_poisson_leap/lp2_4/deploy_bench.jsonl \
  --finetune="MAML fine-tune (CPU):results_poisson_deploy/deploy_maml_seed_*" \
  --finetune="LEAP fine-tune (CPU):results_poisson_deploy/deploy_leap_seed_*" \
  --ref-point="ref FEM res 2:0.22:6.3e-3" \
  --ref-point="ref FEM res 8:1.04:4.3e-5"

python -m metapde_tpu.cli.paper_plots --out=figures \
  --title="TD-Burgers: accuracy vs wall time per task" --name=pareto_td_burgers \
  --baseline=baselines/td_burgers \
  --deploy=MAML:results_burgers_maml/bm7_5/deploy_bench.jsonl \
  --deploy=LEAP:results_burgers_leap/ldb3_1/deploy_bench.jsonl \
  --finetune="MAML fine-tune (CPU):results_burgers_deploy/deploy_maml_seed_*" \
  --finetune="LEAP fine-tune (CPU):results_burgers_deploy/deploy_leap_seed_*" \
  --ref-point="ref FV res 16:41:2.1e-2" \
  --ref-point="ref FV res 256:42:6.3e-4"

python -m metapde_tpu.cli.paper_plots --out=figures \
  --title="Hyperelasticity: accuracy vs wall time per task" --name=pareto_elasticity \
  --baseline=baselines/hyper_elasticity \
  --deploy=MAML:results_elasticity_maml/em5/deploy_bench.jsonl \
  --deploy=LEAP:results_elasticity_leap/lde2_3/deploy_bench_best.jsonl \
  --finetune="MAML fine-tune (CPU):results_elasticity_deploy/deploy_maml_seed_*" \
  --finetune="LEAP fine-tune (CPU):results_elasticity_deploy/deploy_leap_seed_*" \
  --ref-point="ref FEM res (8,12):20.6:9.1e-4" \
  --ref-point="ref FEM res (32,8):88.5:1.4e-4"

python -m metapde_tpu.cli.paper_plots --out=figures \
  --title="Steady Burgers (net-new): accuracy vs wall time per task" \
  --name=pareto_steady_burgers \
  --deploy=MAML:results_sburgers_maml/sb3_1/deploy_bench_latest300k.jsonl \
  --finetune="MAML fine-tune (CPU):results_sburgers_deploy/deploy_maml_seed_*"
