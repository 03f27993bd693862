"""Training validation-error-vs-wallclock curves for run comparisons.

The reference compares meta-training configs by val accuracy against
wall-clock (resultAnalysis.ipynb cells 5/8: per-expt val curves from
log.txt regexes). This CLI reproduces that comparison from metrics.jsonl,
for config studies such as VERDICT-r2 item 10 (3x64 vs 3x128 SIREN width
on the fast protocol): which config Pareto-dominates in accuracy per
second of meta-training.

Wallclock is reconstructed from the metrics epoch timestamps: the first
interval (which includes jit compile + ground-truth solves) and any
interval larger than 10x the steady-state median (a resume gap or a
wedged-tunnel stall, not training) are each REPLACED BY the median
interval — a restart contributes one ordinary interval of wallclock, not
up to ten (ADVICE r3) — so curves measure training compute, not tunnel
weather. Runs whose timestamps are all identical fall back to
step-indexed x rather than collapsing to t=0 on a log axis.

Usage:
    python -m metapde_tpu.cli.train_curves --out=figures --name=width_pareto \
        --title="Poisson MAML fast protocol, seed 1" \
        --run="3x64:results_poisson_maml/p30k_fast_s1" \
        --run="3x128:results_poisson_maml/p30k_fast_w128_s1"
"""

import json
import os
import sys

from ..train.analysis import load_run
from .paper_plots import SERIES_COLORS, SURFACE, TEXT, TEXT_2


def wallclock_curve(path):
    """[(cumulative_train_seconds, best_val_rel_err_so_far), ...] for a run
    dir, with compile/stall intervals replaced per the module docstring."""
    records = [r for r in load_run(path) if r.get("val_rel_err") is not None]
    if len(records) < 2:
        return [(0.0, r["val_rel_err"]) for r in records]
    dts = [0.0] + [records[i]["time"] - records[i - 1]["time"]
                   for i in range(1, len(records))]
    steady = sorted(dts[1:])[len(dts[1:]) // 2]
    if steady <= 0:
        # all timestamps duplicated: no usable wallclock signal — use
        # step-indexed x instead of piling every point at t=0 (ADVICE r3)
        pts, best = [], float("inf")
        for i, r in enumerate(records):
            best = min(best, r["val_rel_err"])
            pts.append((float(r.get("step", i)) or float(i), best))
        return pts
    dts[0] = steady
    t, best, pts = 0.0, float("inf"), []
    for r, dt in zip(records, dts):
        t += steady if (dt <= 0 or dt > 10.0 * steady) else dt
        best = min(best, r["val_rel_err"])
        pts.append((t, best))
    return pts


def make_figure(title, runs, out_path):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(6.4, 4.4), dpi=160)
    fig.patch.set_facecolor(SURFACE)
    ax.set_facecolor(SURFACE)

    for i, (label, path) in enumerate(runs):
        pts = wallclock_curve(path)
        if not pts:
            continue
        c = SERIES_COLORS[i % len(SERIES_COLORS)]
        ax.plot([p[0] for p in pts], [p[1] for p in pts], "-",
                color=c, linewidth=2, label=label)
        ax.annotate(f"{pts[-1][1]:.1e}", pts[-1],
                    textcoords="offset points", xytext=(6, -3),
                    fontsize=7.5, color=TEXT_2)

    ax.set_xscale("log")
    ax.set_yscale("log")
    ax.set_xlabel("meta-training wallclock (s)", color=TEXT)
    ax.set_ylabel("best val relative error so far", color=TEXT)
    ax.set_title(title, color=TEXT, fontsize=11)
    ax.grid(True, which="both", color="#e6e4df", linewidth=0.6, zorder=0)
    ax.set_axisbelow(True)
    for s in ("top", "right"):
        ax.spines[s].set_visible(False)
    for s in ("left", "bottom"):
        ax.spines[s].set_color("#c3c2b7")
    ax.tick_params(colors=TEXT_2, labelsize=8)
    ax.legend(fontsize=8, frameon=False, labelcolor=TEXT)
    fig.tight_layout()
    fig.savefig(out_path, facecolor=SURFACE)
    plt.close(fig)
    return out_path


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    out_dir, title, name, runs = "figures", "", "train_curves", []
    for a in argv:
        if a.startswith("--out="):
            out_dir = a.split("=", 1)[1]
        elif a.startswith("--title="):
            title = a.split("=", 1)[1]
        elif a.startswith("--name="):
            name = a.split("=", 1)[1]
        elif a.startswith("--run="):
            label, path = a.split("=", 1)[1].split(":", 1)
            runs.append((label, path))
        else:
            raise SystemExit(f"unknown arg {a}")
    if not runs:
        raise SystemExit("need at least one --run=LABEL:path")
    os.makedirs(out_dir, exist_ok=True)
    out_path = os.path.join(out_dir, f"{name}.png")
    make_figure(title, runs, out_path)
    # machine-readable endpoint summary next to the figure
    for label, path in runs:
        pts = wallclock_curve(path)
        if pts:
            print(json.dumps({"run": label, "path": path,
                              "train_seconds": round(pts[-1][0], 1),
                              "best_val_rel_err": pts[-1][1]}))
    print(out_path)


if __name__ == "__main__":
    main()
