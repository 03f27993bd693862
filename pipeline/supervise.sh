#!/bin/bash
# Run supervisor for TPU training: handles BOTH failure modes of the axon
# tunnel (SURVEY.md section 5 — the reference has no failure recovery):
#   1. crashes (TPU UNAVAILABLE kernel faults) -> nonzero child exit;
#   2. silent stalls (wedged tunnel: child sleeps on a futex forever with
#      no CPU accrual) -> newest run dir's metrics.jsonl stops advancing.
# Either way the child is killed BY PID (never by pattern) and relaunched,
# resuming from the newest run dir under OUT_DIR/EXPT* that contains a
# checkpoint.
#
# Usage: supervise.sh <out_dir> <expt_prefix> <max_retries> <stall_s> -- <cmd...>
# stall_s must exceed the worst-case gap between metrics.jsonl writes
# (train.log_every steps) plus first-compile time; the stall clock only
# arms once metrics.jsonl is non-empty. BEFORE that (ground-truth solves +
# first compile can also wedge), a launch deadline of 3*stall_s since
# child start applies instead.
set -u
OUT_DIR=$1; EXPT=$2; MAX_RETRIES=$3; STALL_S=$4; shift 4
[ "$1" = "--" ] && shift

newest_ckpt_dir() {
  for d in $(ls -dt "$OUT_DIR/$EXPT"* 2>/dev/null); do
    if ls "$d"/checkpoint_step_*.pickle >/dev/null 2>&1; then
      echo "$d"; return
    fi
  done
}

newest_metrics() {
  ls -t "$OUT_DIR/$EXPT"*/metrics.jsonl 2>/dev/null | head -1
}

tries=0
while true; do
  D=$(newest_ckpt_dir)
  if [ -n "${D:-}" ]; then
    echo "supervise: launching with resume from $D (try $tries)"
    "$@" --train.load_model_from_expt="$D" &
  else
    echo "supervise: launching fresh (try $tries)"
    "$@" &
  fi
  CHILD=$!
  LAUNCHED=$(date +%s)

  rc=""
  while true; do
    sleep 30
    if ! kill -0 "$CHILD" 2>/dev/null; then
      wait "$CHILD"; rc=$?
      break
    fi
    M=$(newest_metrics)
    if ! { [ -n "$M" ] && [ -s "$M" ]; }; then
      # pre-metrics phase: gt solves / first compile may wedge too
      SINCE=$(( $(date +%s) - LAUNCHED ))
      if [ "$SINCE" -gt $((3 * STALL_S)) ]; then
        echo "supervise: no metrics ${SINCE}s after launch; killing child $CHILD"
        kill "$CHILD" 2>/dev/null; sleep 10
        kill -9 "$CHILD" 2>/dev/null
        wait "$CHILD" 2>/dev/null
        rc=launch-stall
        break
      fi
      continue
    fi
    AGE=$(( $(date +%s) - $(stat -c %Y "$M") ))
    if [ "$AGE" -gt "$STALL_S" ]; then
      echo "supervise: $M stalled ${AGE}s; killing child $CHILD"
      kill "$CHILD" 2>/dev/null; sleep 10
      kill -9 "$CHILD" 2>/dev/null
      wait "$CHILD" 2>/dev/null
      rc=stall
      break
    fi
  done

  if [ "$rc" = "0" ]; then
    echo "supervise: clean exit"; exit 0
  fi
  tries=$((tries + 1))
  if [ "$tries" -gt "$MAX_RETRIES" ]; then
    echo "supervise: giving up after $tries failures (rc=$rc)"; exit 1
  fi
  echo "supervise: rc=$rc; retrying in 60s"
  sleep 60
done
