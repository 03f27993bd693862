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
# The commit uses an explicit pathspec of exactly the files this script
# staged, so anything else sitting in the index (user work staged by a
# concurrent session) is never swept into a checkpoint commit.
#
# Usage: commit_ckpts.sh [message]
cd "$(dirname "$0")/.."
set -u
MSG=${1:-"Checkpoint commit: newest weights per active run"}

added=()
for fam in results_*/; do
  for d in "$fam"*/; do
    [ -d "$d" ] || continue
    newest=$(ls -v "$d"checkpoint_step_*.pickle 2>/dev/null | tail -1)
    [ -n "$newest" ] || continue
    # skip if this exact file is already tracked
    if ! git ls-files --error-unmatch "$newest" >/dev/null 2>&1; then
      git add -f "$newest" && added+=("$newest")
    fi
    # best-val weights are as durable-worthy as the newest step
    # (meta-training quality is not monotone in steps, RESULTS.md)
    if [ -f "${d}checkpoint_best.pickle" ]; then
      git add -f "${d}checkpoint_best.pickle" \
        && added+=("${d}checkpoint_best.pickle")
    fi
    # -f: run metadata inside gitignored dirs (e.g. gtwarm*/) must still
    # become durable, not just dirs covered by the gitignore whitelist
    for meta in "$d"config.json "$d"metrics.jsonl "$d"log.txt \
        "$d"deploy_bench*.jsonl; do
      [ -f "$meta" ] && git add -f "$meta" && added+=("$meta")
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
    git add -f "$cache" && added+=("$cache")
  fi
done

if [ "${#added[@]}" -gt 0 ] && ! git diff --cached --quiet -- "${added[@]}"; then
  git commit -q -m "$MSG" -- "${added[@]}"
  echo "commit_ckpts: committed ${#added[@]} paths at $(date)"
else
  echo "commit_ckpts: nothing new to commit"
fi
