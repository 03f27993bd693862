#!/bin/bash
# Watchdog for TPU training runs: if the newest run dir's metrics.jsonl
# stops advancing for STALL_S seconds AFTER first progress (a wedged device
# tunnel looks like a futex sleep with no CPU accrual), kill the process and
# relaunch it resuming from the latest checkpoint. Elastic-recovery stand-in
# for single-chip runs; the reference has no failure recovery (SURVEY.md
# section 5). Compile time is covered by only arming once metrics.jsonl is
# non-empty; relaunches get fresh suffixed expt dirs (prepare_logging), so
# the watchdog always tracks the newest dir under OUT_DIR matching EXPT*.
#
# Usage: watchdog.sh <out_dir> <expt_prefix> <pgrep_pattern> <stall_s> -- <relaunch cmd...>
set -u
OUT_DIR=$1; EXPT=$2; PATTERN=$3; STALL_S=$4; shift 4
[ "$1" = "--" ] && shift

newest_dir() {
  # newest run dir that actually HAS a checkpoint to resume from (a run
  # that stalls before its first checkpoint must not trigger a fresh-init
  # relaunch)
  for d in $(ls -dt "$OUT_DIR/$EXPT"* 2>/dev/null); do
    if ls "$d"/checkpoint_step_*.pickle >/dev/null 2>&1; then
      echo "$d"
      return
    fi
  done
  ls -dt "$OUT_DIR/$EXPT"* 2>/dev/null | head -1
}

while true; do
  sleep 30
  PID=$(pgrep -f "$PATTERN" | head -1)
  if [ -z "${PID}" ]; then
    echo "watchdog: process gone; exiting"
    exit 0
  fi
  D=$(newest_dir); M="$D/metrics.jsonl"
  [ -f "$M" ] || continue
  [ -s "$M" ] || continue   # not armed until first real progress
  AGE=$(( $(date +%s) - $(stat -c %Y "$M") ))
  if [ "$AGE" -gt "$STALL_S" ]; then
    echo "watchdog: $M stalled ${AGE}s; killing and resuming from $D"
    # kill matching pids EXPLICITLY, excluding this script (its own cmdline
    # contains the relaunch args, so pkill -f would be suicide — learned
    # the hard way)
    for p in $(pgrep -f "$PATTERN"); do
      [ "$p" = "$$" ] && continue
      kill "$p" 2>/dev/null
    done
    sleep 10
    for p in $(pgrep -f "$PATTERN"); do
      [ "$p" = "$$" ] && continue
      kill -9 "$p" 2>/dev/null
    done
    sleep 30
    setsid nohup "$@" --train.load_model_from_expt="$D" \
      < /dev/null >> "$OUT_DIR/watchdog_relaunch.log" 2>&1 &
    echo "watchdog: relaunched as $!"
    sleep 120   # let the relaunch get through startup before re-checking
  fi
done
