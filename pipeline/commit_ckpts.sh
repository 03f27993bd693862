#!/bin/bash
# Commit the NEWEST checkpoint of each active run dir (plus its run
# metadata) so long-run weights survive the between-rounds git
# reconstruction of the workspace. Motivated by a real loss: bm6's 220k
# td_burgers MAML checkpoint was never git-whitelisted, the workspace
# was rebuilt from git between sessions, and 160k steps of training were
# lost (only metrics/log survived). checkpoint_step_*.pickle is
# gitignored by default; `git add -f` force-tracks exactly the newest
# one per run dir (~2 MB each).
#
# Usage: commit_ckpts.sh [message]
cd "$(dirname "$0")/.."
set -u
MSG=${1:-"Checkpoint commit: newest weights per active run"}

staged=0
for fam in results_*/; do
  for d in "$fam"*/; do
    [ -d "$d" ] || continue
    newest=$(ls -v "$d"checkpoint_step_*.pickle 2>/dev/null | tail -1)
    [ -n "$newest" ] || continue
    # skip if this exact file is already tracked
    if ! git ls-files --error-unmatch "$newest" >/dev/null 2>&1; then
      git add -f "$newest" && staged=1
    fi
    for meta in config.json metrics.jsonl log.txt deploy_bench.jsonl; do
      [ -f "$d$meta" ] && git add "$d$meta"
    done
  done
done

# Ground-truth caches are gitignored but expensive to rebuild (the v3
# elasticity near-limit solves are minutes-long host Newton chains; the
# whole elasticity cache was lost in the 2026-08-18 workspace rebuild).
# Force-track every cache pickle (~100s of KB each).
for cache in results_*/gt_cache/*.pickle; do
  [ -f "$cache" ] || continue
  if ! git ls-files --error-unmatch "$cache" >/dev/null 2>&1; then
    git add -f "$cache" && staged=1
  fi
done

if ! git diff --cached --quiet; then
  git commit -q -m "$MSG"
  echo "commit_ckpts: committed at $(date)"
else
  echo "commit_ckpts: nothing new to commit"
fi
