"""Tests for cli/train_curves wallclock reconstruction."""

import json
import os

from metapde_tpu.cli.train_curves import wallclock_curve


def _write_run(tmp_path, records):
    d = tmp_path / "run"
    os.makedirs(d, exist_ok=True)
    with open(d / "metrics.jsonl", "w") as f:
        for r in records:
            f.write(json.dumps(r) + "\n")
    return str(d)


def test_compile_interval_and_gaps_replaced_by_median(tmp_path):
    # steady interval 10s; the first interval (compile, 300s) and a resume
    # gap (5000s) must each be REPLACED BY the 10s median (not clamped to
    # 10x it, ADVICE r3): total = 6 intervals x 10s exactly
    t0 = 1000.0
    times = [t0, t0 + 300, t0 + 310, t0 + 320, t0 + 5320, t0 + 5330]
    errs = [1.0, 0.5, 0.6, 0.2, 0.1, 0.15]
    recs = [{"step": i * 1000, "time": t, "val_rel_err": e}
            for i, (t, e) in enumerate(zip(times, errs))]
    pts = wallclock_curve(_write_run(tmp_path, recs))
    assert len(pts) == 6
    assert abs(pts[-1][0] - 60.0) < 1e-9
    # best-so-far is monotone nonincreasing
    ys = [p[1] for p in pts]
    assert all(a >= b for a, b in zip(ys, ys[1:]))
    assert ys[-1] == 0.1


def test_duplicate_timestamps_fall_back_to_steps(tmp_path):
    # all-identical timestamps must not collapse every point to t=0 (which
    # a log-scale axis silently drops); x falls back to the step index
    recs = [{"step": i * 1000, "time": 42.0, "val_rel_err": 1.0 / (i + 1)}
            for i in range(4)]
    pts = wallclock_curve(_write_run(tmp_path, recs))
    assert [p[0] for p in pts] == [0.0, 1000.0, 2000.0, 3000.0]
    assert pts[-1][1] == 0.25


def test_short_run_passthrough(tmp_path):
    recs = [{"step": 0, "time": 5.0, "val_rel_err": 0.3}]
    pts = wallclock_curve(_write_run(tmp_path, recs))
    assert pts == [(0.0, 0.3)]
