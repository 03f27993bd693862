#!/bin/bash
# Run supervisor for TPU training, v2: supervise.sh plus a pre-launch
# tunnel probe. Handles all three failure modes of the axon tunnel:
#   1. crashes (TPU UNAVAILABLE kernel faults) -> nonzero child exit;
#   2. silent stalls (wedged tunnel: child sleeps on a futex forever with
#      no CPU accrual) -> newest run dir's metrics.jsonl stops advancing;
#   3. wedged WINDOWS (minutes-to-hours where any device init hangs) —
#      new in v2: before each (re)launch, a 90s `jax.devices()` probe
#      must succeed; while it fails, retry the probe every 60s instead of
#      burning a full 3*stall_s launch deadline per wedged child.
# The child is killed BY PID (never by pattern) and relaunched, resuming
# from the newest run dir under OUT_DIR/EXPT* that contains a checkpoint.
# Probe attempts do not count against MAX_RETRIES.
#
# Usage: supervise2.sh <out_dir> <expt_prefix> <max_retries> <stall_s> -- <cmd...>
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

probe_tunnel() {
  # One TPU process at a time: only called when no child is running.
  timeout 90 python -c "import jax; jax.devices()" >/dev/null 2>&1
}

tries=0
while true; do
  until probe_tunnel; do
    echo "supervise2: tunnel probe failed at $(date); retrying in 60s"
    sleep 60
  done
  echo "supervise2: tunnel probe ok at $(date)"

  D=$(newest_ckpt_dir)
  if [ -n "${D:-}" ]; then
    echo "supervise2: launching with resume from $D (try $tries)"
    "$@" --train.load_model_from_expt="$D" &
  else
    echo "supervise2: launching fresh (try $tries)"
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
      # pre-metrics phase: gt solves / first compile can wedge too
      SINCE=$(( $(date +%s) - LAUNCHED ))
      if [ "$SINCE" -gt $((3 * STALL_S)) ]; then
        echo "supervise2: no metrics ${SINCE}s after launch; killing child $CHILD"
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
      echo "supervise2: $M stalled ${AGE}s; killing child $CHILD"
      kill "$CHILD" 2>/dev/null; sleep 10
      kill -9 "$CHILD" 2>/dev/null
      wait "$CHILD" 2>/dev/null
      rc=stall
      break
    fi
  done

  if [ "$rc" = "0" ]; then
    echo "supervise2: clean exit"; exit 0
  fi
  tries=$((tries + 1))
  if [ "$tries" -gt "$MAX_RETRIES" ]; then
    echo "supervise2: giving up after $tries failures (rc=$rc)"; exit 1
  fi
  echo "supervise2: rc=$rc; retrying in 60s"
  sleep 60
done
