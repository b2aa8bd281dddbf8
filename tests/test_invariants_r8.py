"""Round-8 regression invariants: partial-sidecar range tiling, the
HTTP range opener's position-correctness contract, the benchdiff fold
mapping, and the generalized classifier SQL twin's equivalence to the
self-labelled registry form."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st


# ---------------------------------------------------------------------------
# _member_ranges: sidecar offsets of ANY coverage must tile [0, size)
# ---------------------------------------------------------------------------


@settings(max_examples=200, deadline=None)
@given(
    size=st.integers(min_value=1, max_value=10_000),
    offsets=st.lists(st.integers(min_value=0, max_value=12_000), max_size=30),
    split_bytes=st.integers(min_value=1, max_value=4_000),
)
def test_member_ranges_tile_exactly(size, offsets, split_bytes):
    """Whatever subset of gzip members a CDX sidecar lists (partial,
    out-of-range, duplicated, unsorted), the planned ranges must tile
    [0, file_size) exactly — no gap (dropped records) and no overlap
    (duplicated records) — and respect split_bytes whenever a listed
    member boundary allows a cut."""
    from architxt_spark.sources.warc import _member_ranges

    members = [(o, 1) for o in offsets]
    ranges = _member_ranges(members, split_bytes, size)
    assert ranges[0][0] == 0
    assert ranges[-1][1] == size
    for (s0, e0), (s1, e1) in zip(ranges, ranges[1:]):
        assert e0 == s1  # contiguous: no gap, no overlap
        assert s0 < e0
    starts = {o for o in offsets if 0 < o < size}
    for s, e in ranges[:-1]:
        # every cut lands on a listed member start (byte 0 aside)
        assert e in starts
        # a range only exceeds split_bytes when no listed boundary
        # allowed a shorter one
        if e - s > split_bytes:
            assert not any(s < o < s + split_bytes for o in starts | {size})


def test_member_ranges_empty_file():
    from architxt_spark.sources.warc import _member_ranges

    assert _member_ranges([], 100, 0) == []
    assert _member_ranges([(0, 5)], 100, 0) == []


# ---------------------------------------------------------------------------
# benchdiff fold mapping: pre-fold constituents sum into the fold name
# ---------------------------------------------------------------------------


def test_benchdiff_fold_mapping():
    from tools.benchdiff import apply_folds

    old = {"window_orders": 0.4, "grouping_orders": 0.3, "ann_topk": 1.5,
           "scan_filter_project": 0.2}
    # folds synthesize only against a post-fold OTHER side (r11: the same
    # machinery runs in reverse for build-line splits)
    other = {"window_grouping": 0.6, "ann_suite": 1.4}
    mapped, partial = apply_folds(old, other)
    assert mapped["window_grouping"] == pytest.approx(0.7)
    assert mapped["ann_suite"] == pytest.approx(1.5)  # partial constituents
    assert "window_orders" not in mapped and "ann_topk" not in mapped
    assert mapped["scan_filter_project"] == 0.2
    # a fold synthesized from a SUBSET of its constituents is marked
    # partial (comparing it as the full fold would skew the diff);
    # a complete synthesis is not
    assert partial == {"ann_suite"}
    # a post-fold file passes through untouched
    new = {"window_grouping": 0.6, "window_orders": 99.0}
    mapped2, partial2 = apply_folds(new, old)
    assert mapped2["window_grouping"] == 0.6
    assert mapped2["window_orders"] == 99.0
    assert partial2 == set()
    # two post-SPLIT files keep per-artifact lines (no aggregate synth):
    # a slowdown in one artifact must compare artifact-vs-artifact
    s1 = {"ivf_build": 2.0, "pq_encode": 2.0}
    s2 = {"ivf_build": 2.0, "pq_encode": 3.2}
    m1, _ = apply_folds(s1, s2)
    assert "ann_index_build" not in m1 and m1["pq_encode"] == 2.0
    # cross-era: old conflated line vs new split lines -> the new side
    # synthesizes the aggregate for an honest scope-equal comparison
    conflated = {"ann_index_build": 4.3}
    m2, _ = apply_folds(s2, conflated)
    assert m2["ann_index_build"] == pytest.approx(5.2)


# ---------------------------------------------------------------------------
# classifier SQL twin: the general sources form reproduces the
# self-labelled registry form exactly
# ---------------------------------------------------------------------------


def test_classifier_sql_general_form_matches_self_labelled(spark):
    duckdb = pytest.importorskip("duckdb")
    from architxt_spark.functions.classifier import (
        classifier_score_sql,
        quality_classifier_sql,
    )

    rows = [
        (i, ("careful analysis of history" if i % 2 else "casino bonus spins win")
         + f" filler {i}")
        for i in range(12)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    con = duckdb.connect()
    con.register("documents", df.toPandas())
    via_where = con.execute(quality_classifier_sql(
        "documents", "doc_id % 2 = 1", "doc_id % 2 = 0"
    )).fetchall()
    via_src = con.execute(classifier_score_sql(
        "documents",
        "(SELECT * FROM documents WHERE doc_id % 2 = 1)",
        "(SELECT * FROM documents WHERE doc_id % 2 = 0)",
    )).fetchall()
    assert sorted(via_where) == sorted(via_src)
