#!/bin/bash
# Round-10 sequential TPU queue: LEAP step-budget continuations (NEXT.md
# item 1 tail — the LEAP families beat/match the reference's quality at
# 40-60k steps; these push each toward the reference's 500k budget in
# bounded, checkpoint-resumable segments).
#
# Each continuation uses --from_run (exact-config resume from the run's
# serialized config.json — the anti-config-drift path added after the
# lde1_1 bc_weight incident) and self-terminates at its outer_steps
# target; supervise2 recovers tunnel wedges and resumes from the newest
# checkpoint. Segment sizes chosen for ~3-5h each at measured per-step
# costs (poisson 0.22 s, elasticity 0.195 s, burgers 0.54 s).
#
# Usage: queue_round10.sh [wait_pid ...]
cd "$(dirname "$0")/.."
set -u

for WAIT_PID in "$@"; do
  echo "queue10: waiting for pid $WAIT_PID"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
  echo "queue10: pid $WAIT_PID done at $(date)"
done

# ---- 1. poisson LEAP lp2 60k -> 120k ----
echo "queue10: poisson LEAP continuation at $(date)"
bash pipeline/supervise2.sh results_poisson_leap lp2 40 900 -- \
  python -m metapde_tpu.cli.leap_pde \
    --from_run=results_poisson_leap/lp2_4 \
    --train.outer_steps=120001 --train.checkpoint_every=5000 \
    --train.viz_every=0

# ---- 2. elasticity LEAP lde1 60k -> 120k ----
echo "queue10: elasticity LEAP continuation at $(date)"
# NB lde1_1's config carries the bc_weight=100 drift (RESULTS.md caveat);
# continue on ITS exact config rather than reintroducing a third variant.
bash pipeline/supervise2.sh results_elasticity_leap lde1 40 900 -- \
  python -m metapde_tpu.cli.leap_pde \
    --from_run=results_elasticity_leap/lde1_1 \
    --train.outer_steps=120001 --train.checkpoint_every=5000 \
    --train.viz_every=0

# ---- 3. td_burgers LEAP ldb3 40k -> 60k ----
echo "queue10: td_burgers LEAP continuation at $(date)"
bash pipeline/supervise2.sh results_burgers_leap ldb3 40 900 -- \
  python -m metapde_tpu.cli.leap_pde \
    --from_run=results_burgers_leap/ldb3_2 \
    --train.outer_steps=60001 --train.checkpoint_every=5000 \
    --train.viz_every=0

echo "queue10: all continuations done at $(date)"
