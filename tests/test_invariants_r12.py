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


# ---------------------------------------------------------------------------
# pair-generator auto-sized shuffle width (r11 verdict #5): the knob a
# cluster sets globally, derived per-operator from the measured index
# row count instead.  Small inputs must keep their existing plans; when
# the width engages it must not change a single pair.
# ---------------------------------------------------------------------------


def test_pair_shuffle_width_thresholds(spark):
    from architxt_spark.functions.dedup import (
        _PAIR_ROWS_PER_PARTITION as R,
    )
    from architxt_spark.functions.dedup import _pair_shuffle_width

    base = spark.sparkContext.defaultParallelism
    # at or below base * target rows: session default suffices -> 0
    assert _pair_shuffle_width(spark, 0) == 0
    assert _pair_shuffle_width(spark, base * R) == 0
    # past it: power-of-two width sized to the data
    w = _pair_shuffle_width(spark, 40 * R)
    assert w >= 40 and w & (w - 1) == 0
    assert _pair_shuffle_width(spark, 160_000_000) == 64  # the 4M-doc rung


def test_auto_width_changes_no_pairs(spark, monkeypatch):
    """Force the width to engage on a small corpus (patched target) and
    assert the pair set is identical to the default-width run."""
    from architxt_spark.functions import dedup

    docs = spark.createDataFrame(
        [(i, f"common boilerplate sentence row {i % 7} with shared tokens here",)
         for i in range(60)],
        "doc_id long, text string",
    )

    def pairs():
        ng = dedup.ngram_jaccard_pairs(docs, "text", "doc_id", threshold=0.5)
        wn = dedup.winnow_pairs(docs, "text", "doc_id")
        return (
            sorted(map(tuple, ng.select("id_a", "id_b", "jaccard").collect())),
            sorted(map(tuple, wn.select("id_a", "id_b", "n_common").collect())),
        )

    baseline = pairs()
    monkeypatch.setattr(dedup, "_PAIR_ROWS_PER_PARTITION", 1)  # every row its own bucket
    widened = pairs()
    assert baseline == widened
    assert baseline[0] and baseline[1]  # non-vacuous: the corpus has near-dups


def test_uniform_probe_shift_does_not_flag(tmp_path, capsys):
    """r13: the calib probe gains more from a faster host than mixed
    workloads — raw ratios flat, normalized uniformly ~x1.4 on 6+
    lines.  A uniform normalized shift is a probe artifact: no flags."""
    old = {"calib_spark": 0.175}
    new = {"calib_spark": 0.123}
    for i in range(8):
        old[f"q{i}"] = 5.0 + i
        new[f"q{i}"] = (5.0 + i) * 0.98  # raw flat-to-better
    assert _run_benchdiff(tmp_path, old, new) == 0
    out = capsys.readouterr().out
    assert "REGRESSED" not in out
    assert "pack median" in out and "probe-shift" in out


def test_single_query_regression_still_flags_through_probe_shift(tmp_path, capsys):
    """The pack guard must not absorb a real per-query regression: same
    uniform probe shift, but one line is x3 raw — flags."""
    old = {"calib_spark": 0.175}
    new = {"calib_spark": 0.123}
    for i in range(8):
        old[f"q{i}"] = 5.0 + i
        new[f"q{i}"] = (5.0 + i) * (3.0 if i == 3 else 0.98)
    assert _run_benchdiff(tmp_path, old, new) == 1
    out = capsys.readouterr().out
    assert out.count("REGRESSED") == 1 and "q3" in out
