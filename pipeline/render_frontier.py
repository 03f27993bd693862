"""Render the throughput-frontier sweep (baselines/throughput_frontier_r05
.jsonl, written by pipeline/r24_tail.sh T1 via cli/roofline) as the
RESULTS.md markdown table: steps/s, residual-point evals/s/chip (the
BASELINE.json north-star metric), sustained TFLOP/s and MFU per cell.

evals/step = bsize * (inner_steps*inner_points + (inner_steps+1)*
outer_points)  — the doubly-differentiated unroll's collocation-point
residual evaluations (bench.py's definition, kept identical so the
frontier rows are comparable with the flagship 11.1M evals/s/chip
series).

Usage: python pipeline/render_frontier.py [path.jsonl]
"""

import json
import sys


def main(path="baselines/throughput_frontier_r05.jsonl"):
    rows = [json.loads(l) for l in open(path) if l.strip()]
    print("| bsize | width | ms/step | steps/s | evals/s/chip | "
          "sustained TFLOP/s | MFU (bf16 peak) | HBM GB/s |")
    print("|---|---|---|---|---|---|---|---|")
    for r in rows:
        c = r["config"]
        evals = c["bsize"] * (
            c["inner_steps"] * c["points"] + (c["inner_steps"] + 1)
            * c["points"]
        )
        eps = r["steps_per_sec"] * evals
        print(f"| {c['bsize']} | {c['layer_size']} | {r['ms_per_step']:.2f}"
              f" | {r['steps_per_sec']:.1f} | {eps / 1e6:.1f}M | "
              f"{r['sustained_tflops']:.2f} | "
              f"{100 * r.get('mfu_vs_bf16_peak', 0):.1f}% | "
              f"{r['sustained_hbm_gbps']:.0f} |")


if __name__ == "__main__":
    main(*sys.argv[1:])
