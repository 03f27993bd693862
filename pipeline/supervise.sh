#!/bin/bash
# Crash supervisor for TPU training runs: runs the training command in the
# foreground and relaunches it on nonzero exit (e.g. transient
# axon-tunnel/TPU UNAVAILABLE faults), resuming from the newest run dir
# under OUT_DIR/EXPT* that contains a checkpoint. Complements
# watchdog.sh (which handles silent stalls); together they give the
# elastic single-chip recovery story (SURVEY.md section 5: the reference
# has no failure recovery at all).
#
# Usage: supervise.sh <out_dir> <expt_prefix> <max_retries> -- <cmd...>
set -u
OUT_DIR=$1; EXPT=$2; MAX_RETRIES=$3; shift 3
[ "$1" = "--" ] && shift

newest_ckpt_dir() {
  for d in $(ls -dt "$OUT_DIR/$EXPT"* 2>/dev/null); do
    if ls "$d"/checkpoint_step_*.pickle >/dev/null 2>&1; then
      echo "$d"; return
    fi
  done
}

tries=0
while true; do
  D=$(newest_ckpt_dir)
  if [ -n "${D:-}" ]; then
    echo "supervise: launching with resume from $D (try $tries)"
    "$@" --train.load_model_from_expt="$D"
  else
    echo "supervise: launching fresh (try $tries)"
    "$@"
  fi
  rc=$?
  if [ "$rc" -eq 0 ]; then
    echo "supervise: clean exit"; exit 0
  fi
  tries=$((tries + 1))
  if [ "$tries" -gt "$MAX_RETRIES" ]; then
    echo "supervise: giving up after $tries failures (rc=$rc)"; exit "$rc"
  fi
  echo "supervise: rc=$rc; retrying in 60s"
  sleep 60
done
