#!/bin/bash
# Round-14 TPU perf-study block (VERDICT round-1 item 2 tail): the
# roofline landed in round 2 (RESULTS.md) but two asked-for controls did
# not — the lane-aligned width-128 run and a bf16 variant. Runs in a
# deliberate gap between queue stages (NEVER concurrently with another
# TPU process — the axon relay wedges both).
#
# Rows (all flagship Poisson MAML, bsize 16, 5 inner steps, 1024 pts):
#   1. f32 width-64 unroll5/no-remat      (the adopted bench config)
#   2. bf16 compute_dtype, width-64       (traffic halving on carried h/J/D)
#   3. f32 width-128 control              (full MXU lanes)
#   4. bf16 width-128
#   5. f32 width-64 fast_sampler          (sort-free point draws)
#   6. bf16 + fast_sampler                (combined best-guess)
#
# Usage: perf_round14.sh [out_jsonl]
cd "$(dirname "$0")/.."
set -u
OUT=${1:-baselines/perf_round14.jsonl}
mkdir -p "$(dirname "$OUT")"
: > "$OUT"

run() {
  echo "perf14: $* at $(date)" >&2
  timeout 900 python -m metapde_tpu.cli.roofline \
    --block=100 --blocks=5 --unroll=5 --no_remat "$@" >> "$OUT"
}

run
run --compute_dtype=bfloat16
run --layer_size=128
run --layer_size=128 --compute_dtype=bfloat16
run --fast_sampler
run --compute_dtype=bfloat16 --fast_sampler

echo "perf14: wrote $OUT" >&2
cat "$OUT"
