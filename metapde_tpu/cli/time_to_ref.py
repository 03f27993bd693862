"""Time-to-reference-L2 headline table (VERDICT r4 stretch item 8).

For each family: the wall-clock a single v5e chip needs, under this repo's
training configs, to reach the REFERENCE's converged validation rel_err —
the number the north star is phrased in (BASELINE.json: paper accuracy in
<15 min on v5e-8 vs the reference's 5-6 h CPU / multi-day GPU protocol,
reference README.md:19 and resultAnalysis.ipynb converged values).

Method: scan metrics.jsonl of a run (or a `a+b+c` continuation chain,
concatenated by step), integrate wall time as sum(delta_step x
step_time_row) — i.e. pure training compute on the chip, excluding
ground-truth solves and jit compiles (one-time costs, reported separately
by the drivers) — and report the first crossing of the target together
with the run's best. Targets default to the reference's converged numbers
(BASELINE.md, resultAnalysis.ipynb cells 4-23).

Usage:
    python -m metapde_tpu.cli.time_to_ref                # default table
    python -m metapde_tpu.cli.time_to_ref --metric=val_rel_err_median \
        --row="label:dirA+dirB:2e-3:ref cost note"
"""

import argparse
import json
import os
import sys

# (label, run chain, target = reference converged val rel_err, reference
# cost note). Chain dirs are scanned in order; rows whose step goes
# backwards vs the best-so-far step are dropped (overlapping restarts).
DEFAULT_ROWS = [
    ("Poisson MAML (w128 fast+bf16, 1024 pts)",
     "results_poisson_maml/pw128f_100k",
     4e-4, "500k steps @ 3.21 s/step T4 (~446 h GPU); README: 5-6 h CPU"),
    ("Poisson MAML (w64, 256-pt cfg)",
     "results_poisson_maml/tpu_run5+results_poisson_maml/tpu_run6"
     "+results_poisson_maml/tpu_run6b",
     4e-4, "same"),
    ("Poisson LEAP",
     "results_poisson_leap/tpu_run1+results_poisson_leap/tpu_run1_1"
     "+results_poisson_leap/lp2_4+results_poisson_leap/lp3*",
     1e-3, "500k-step protocol (pipeline_leap_meta.sh)"),
    ("TD-Burgers MAML",
     "results_burgers_maml/tpu_run1+results_burgers_maml/bm6"
     "+results_burgers_maml/bm7+results_burgers_maml/bm7_5",
     1e-3, "500k-step protocol"),
    ("TD-Burgers LEAP",
     "results_burgers_leap/ldb3+results_burgers_leap/ldb3_1"
     "+results_burgers_leap/ldb3_2",
     1e-3, "500k-step protocol"),
    ("Hyperelasticity MAML",
     "results_elasticity_maml/tpu_run1+results_elasticity_maml/em5"
     "+results_elasticity_maml/em5_1"
     "+results_elasticity_maml/em6+results_elasticity_maml/em7*",
     2e-3, "500k-step protocol"),
    ("Hyperelasticity LEAP",
     "results_elasticity_leap/lde1+results_elasticity_leap/lde1_1"
     "+results_elasticity_leap/lde2"
     "+results_elasticity_leap/lde2_2+results_elasticity_leap/lde2_3",
     4e-3, "500k-step protocol"),
]


def scan_chain(chain: str, metric: str):
    """Yield (step, value, step_time) rows across a continuation chain,
    monotone in step. Chain elements may be globs (`em7*` covers the
    supervisor's suffixed resume dirs em7, em7_1, ...); on overlapping
    steps the earlier-listed (lexicographically earlier for globs, i.e.
    chronologically earlier resume) dir's row wins."""
    import glob as globlib

    dirs = []
    for el in chain.split("+"):
        expanded = sorted(globlib.glob(el)) if any(
            c in el for c in "*?[") else [el]
        dirs.extend(expanded or [el])
    rows = []
    for d in dirs:
        path = os.path.join(d, "metrics.jsonl")
        if not os.path.exists(path):
            continue
        with open(path) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                try:
                    r = json.loads(line)
                except json.JSONDecodeError:
                    continue
                v = r.get(metric)
                if v is None or r.get("step") is None:
                    continue
                rows.append((int(r["step"]), float(v),
                             float(r.get("step_time") or 0.0)))
    rows.sort(key=lambda t: t[0])
    out, last = [], -1
    for step, v, st in rows:
        if step <= last:
            continue  # overlapping restart window; keep the earlier row
        out.append((step, v, st))
        last = step
    return out


def time_to_target(rows, target: float):
    """(first step <= target, integrated seconds to that step, best value,
    best step, total integrated seconds)."""
    t = 0.0
    prev_step = 0
    hit_step = hit_time = None
    best_v, best_s = float("inf"), None
    for step, v, st in rows:
        t += (step - prev_step) * st
        prev_step = step
        if v < best_v:
            best_v, best_s = v, step
        if hit_step is None and v <= target:
            hit_step, hit_time = step, t
    return hit_step, hit_time, best_v, best_s, t


def fmt_h(seconds):
    if seconds is None:
        return "-"
    if seconds < 90:
        return f"{seconds:.0f} s"
    if seconds < 5400:
        return f"{seconds / 60:.1f} min"
    return f"{seconds / 3600:.2f} h"


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--metric", default="val_rel_err")
    p.add_argument("--row", action="append", default=[],
                   help="label:chain:target[:ref note] — replaces the "
                        "default table when given")
    p.add_argument("--json", action="store_true",
                   help="emit one JSON line per row instead of markdown")
    args = p.parse_args(argv)

    rows_spec = []
    if args.row:
        for spec in args.row:
            parts = spec.split(":")
            label, chain, target = parts[0], parts[1], float(parts[2])
            note = parts[3] if len(parts) > 3 else ""
            rows_spec.append((label, chain, target, note))
    else:
        rows_spec = DEFAULT_ROWS

    out_rows = []
    for label, chain, target, note in rows_spec:
        rows = scan_chain(chain, args.metric)
        if not rows:
            out_rows.append(dict(label=label, error="no metrics found",
                                 chain=chain))
            continue
        hit_step, hit_time, best_v, best_s, total_t = time_to_target(
            rows, target)
        out_rows.append(dict(
            label=label, target=target, metric=args.metric,
            hit_step=hit_step, hit_seconds=hit_time,
            best_value=best_v, best_step=best_s,
            total_train_seconds=total_t, ref_note=note, chain=chain,
        ))

    if args.json:
        for r in out_rows:
            print(json.dumps(r))
        return out_rows

    print(f"| Family (config) | ref converged target | time on 1x v5e to "
          f"target | steps to target | our best ({args.metric}) | "
          f"reference cost |")
    print("|---|---|---|---|---|---|")
    for r in out_rows:
        if "error" in r:
            print(f"| {r['label']} | - | {r['error']} | - | - | - |")
            continue
        hit = fmt_h(r["hit_seconds"]) if r["hit_step"] is not None \
            else f"not yet (best {r['best_value']:.2e})"
        steps = (f"{r['hit_step']:,}" if r["hit_step"] is not None
                 else f"> {r['best_step']:,}")
        print(f"| {r['label']} | {r['target']:.0e} | {hit} | {steps} | "
              f"{r['best_value']:.2e} @ {r['best_step']:,} | "
              f"{r['ref_note']} |")
    return out_rows


if __name__ == "__main__":
    main()
