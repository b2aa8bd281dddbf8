"""Round-12 invariants: benchdiff host-calibration normalization.

The r11 review proved a x1.31 bench "regression" was pure host drift
(git-worktree A/B on the same machine) — BENCH files now carry
deterministic host probes (bench.py `calib_cpu`/`calib_spark`) and
tools/benchdiff.py judges queries on the drift-normalized ratio when
both sides carry the probe.  These tests pin that contract: host drift
alone never flags; a genuine code slowdown still flags through the
normalization; files without calib lines keep the raw-ratio behavior.
"""

from __future__ import annotations

import json


def _run_benchdiff(tmp_path, old_queries, new_queries, threshold=1.3):
    from tools.benchdiff import main

    po, pn = tmp_path / "old.json", tmp_path / "new.json"
    po.write_text(json.dumps({"queries": old_queries}))
    pn.write_text(json.dumps({"queries": new_queries}))
    return main([str(po), str(pn), "--threshold", str(threshold)])


def test_host_drift_alone_does_not_flag(tmp_path, capsys):
    # every query x1.35 slower, but the Spark probe says the HOST is
    # x1.35 slower -> normalized ratios ~1.0, exit 0
    old = {"calib_cpu": 1.0, "calib_spark": 1.0, "q1": 8.0, "q2": 5.0}
    new = {"calib_cpu": 1.35, "calib_spark": 1.35, "q1": 10.8, "q2": 6.75}
    assert _run_benchdiff(tmp_path, old, new) == 0
    out = capsys.readouterr().out
    assert "host probe" in out
    assert "REGRESSED" not in out
    assert "norm x1.00" in out


def test_code_regression_flags_through_normalization(tmp_path, capsys):
    # host x1.2 slower but q1 is x2.4 slower -> norm x2.0 -> flags
    old = {"calib_spark": 1.0, "q1": 4.0, "q2": 5.0}
    new = {"calib_spark": 1.2, "q1": 9.6, "q2": 6.0}
    assert _run_benchdiff(tmp_path, old, new) == 1
    out = capsys.readouterr().out
    assert "q1" in out and "REGRESSED" in out
    # q2 is pure drift — must not flag
    assert out.count("REGRESSED") == 1


def test_calib_excluded_from_subtotal(tmp_path, capsys):
    old = {"calib_spark": 1.0, "q1": 10.0}
    new = {"calib_spark": 1.0, "q1": 10.0}
    _run_benchdiff(tmp_path, old, new)
    out = capsys.readouterr().out
    sub = [ln for ln in out.splitlines() if "shared subtotal" in ln][0]
    assert "10.00" in sub and "11.00" not in sub


def test_legacy_files_keep_raw_behavior(tmp_path, capsys):
    # no calib lines on either side -> raw ratio judged, no norm column
    old = {"q1": 4.0}
    new = {"q1": 6.0}
    assert _run_benchdiff(tmp_path, old, new) == 1
    out = capsys.readouterr().out
    assert "norm" not in out and "REGRESSED" in out


def test_host_speedup_does_not_hide_regression(tmp_path, capsys):
    # faster host (drift 0.5) makes raw look flat while code got 2x
    # slower on equal hardware -> normalized x2.0 flags
    old = {"calib_spark": 2.0, "q1": 8.0}
    new = {"calib_spark": 1.0, "q1": 8.0}
    assert _run_benchdiff(tmp_path, old, new) == 1
    out = capsys.readouterr().out
    assert "REGRESSED" in out
