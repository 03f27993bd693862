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


def test_compile_interval_replaced_and_gap_clamped(tmp_path):
    # steady interval 10s; first interval (compile, 300s) and a resume gap
    # (5000s) must both be replaced/clamped so they don't dominate wallclock
    t0 = 1000.0
    times = [t0, t0 + 300, t0 + 310, t0 + 320, t0 + 5320, t0 + 5330]
    errs = [1.0, 0.5, 0.6, 0.2, 0.1, 0.15]
    recs = [{"step": i * 1000, "time": t, "val_rel_err": e}
            for i, (t, e) in enumerate(zip(times, errs))]
    pts = wallclock_curve(_write_run(tmp_path, recs))
    assert len(pts) == 6
    total = pts[-1][0]
    # steady median is 10s; 6 intervals all <= 10*steady=100s =>
    # total well under the raw 5330s span
    assert total <= 6 * 100.0
    # best-so-far is monotone nonincreasing
    ys = [p[1] for p in pts]
    assert all(a >= b for a, b in zip(ys, ys[1:]))
    assert ys[-1] == 0.1


def test_short_run_passthrough(tmp_path):
    recs = [{"step": 0, "time": 5.0, "val_rel_err": 0.3}]
    pts = wallclock_curve(_write_run(tmp_path, recs))
    assert pts == [(0.0, 0.3)]
