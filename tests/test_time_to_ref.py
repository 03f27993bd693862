"""time_to_ref CLI: chain concatenation + wall-clock integration.

The headline table (VERDICT r4 stretch item 8) integrates training
wall-clock as sum(delta_step x step_time) over metrics.jsonl rows across a
continuation chain; overlap rows from restarts must be dropped (earlier
dir wins) and the first target crossing found.
"""

import json
import os

from metapde_tpu.cli.time_to_ref import (
    fmt_h, scan_chain, time_to_target,
)


def _write_metrics(d, rows):
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "metrics.jsonl"), "w") as f:
        for step, v, st in rows:
            f.write(json.dumps(
                {"step": step, "val_rel_err": v, "step_time": st}) + "\n")


def test_chain_concat_drops_restart_overlap(tmp_path):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    _write_metrics(a, [(10, 0.5, 1.0), (20, 0.3, 1.0), (30, 0.2, 1.0)])
    # b resumed from step 20's checkpoint: rows 25/35 overlap then extend
    _write_metrics(b, [(25, 0.25, 2.0), (35, 0.1, 2.0)])
    rows = scan_chain(f"{a}+{b}", "val_rel_err")
    assert [r[0] for r in rows] == [10, 20, 25, 30, 35]
    # monotone: row 25 from b is kept (no a-row at 25), 30 from a, 35 from b


def test_time_to_target_integration(tmp_path):
    a = str(tmp_path / "a")
    _write_metrics(a, [(10, 0.5, 1.0), (20, 0.3, 2.0), (30, 0.05, 1.0)])
    hit_step, hit_time, best_v, best_s, total = time_to_target(
        scan_chain(a, "val_rel_err"), target=0.1)
    assert hit_step == 30
    # 10*1.0 + 10*2.0 + 10*1.0
    assert hit_time == 40.0 and total == 40.0
    assert best_v == 0.05 and best_s == 30


def test_target_never_hit(tmp_path):
    a = str(tmp_path / "a")
    _write_metrics(a, [(10, 0.5, 1.0)])
    hit_step, hit_time, best_v, best_s, total = time_to_target(
        scan_chain(a, "val_rel_err"), target=0.1)
    assert hit_step is None and hit_time is None
    assert best_v == 0.5 and total == 10.0


def test_missing_dir_skipped(tmp_path):
    a = str(tmp_path / "a")
    _write_metrics(a, [(10, 0.5, 1.0)])
    rows = scan_chain(f"{tmp_path}/nonexistent+{a}", "val_rel_err")
    assert len(rows) == 1


def test_fmt_h():
    assert fmt_h(None) == "-"
    assert fmt_h(30) == "30 s"
    assert fmt_h(600) == "10.0 min"
    assert fmt_h(7200) == "2.00 h"


def test_chain_glob_expansion(tmp_path):
    # supervisor resume dirs em7, em7_1, ...: a glob element covers them in
    # chronological (lexicographic) order
    _write_metrics(str(tmp_path / "em7"), [(10, 0.5, 1.0)])
    _write_metrics(str(tmp_path / "em7_1"), [(20, 0.3, 1.0)])
    _write_metrics(str(tmp_path / "em7_2"), [(30, 0.2, 1.0)])
    rows = scan_chain(f"{tmp_path}/em7*", "val_rel_err")
    assert [r[0] for r in rows] == [10, 20, 30]
