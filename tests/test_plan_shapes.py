"""Physical-plan regression tests for the headline queries' scale
properties: filters pushed to the parquet scan, dimensions broadcast, no
cartesian products in pair generation.  PLANS.md documents these shapes;
these tests gate them."""

import pytest


@pytest.fixture(scope="module")
def entry():
    import sys

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as e

    return e


SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_scan_filter_project_pushdown(spark, entry):
    plan = _plan(entry.q_scan_filter_project(spark, SF))
    assert "PushedFilters: [" in plan
    assert "GreaterThan(l_quantity" in plan
    # column pruning: full lineitem has 16 columns; the read schema must not
    read_schema = plan.split("ReadSchema:", 1)[1].splitlines()[0]
    assert read_schema.count(":") <= 6


def test_join_revenue_broadcasts_dimensions(spark, entry):
    plan = _plan(entry.q_join_revenue_by_nation(spark, SF))
    assert plan.count("BroadcastHashJoin") >= 3
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan  # dims must not shuffle at this size


def test_contamination_broadcasts_benchmark_set(spark, entry):
    plan = _plan(entry.q_contamination_check(spark, SF))
    assert "BroadcastHashJoin" in plan and "LeftOuter" in plan
    assert "CartesianProduct" not in plan


def test_pair_generators_avoid_cartesian(spark, entry):
    for q in ("q_dedup_minhash_lsh", "q_dedup_ngram_jaccard"):  # jaccard now folds winnow in
        plan = _plan(getattr(entry, q)(spark, SF))
        assert "CartesianProduct" not in plan, q


def test_hygiene_scans_have_no_exchange(spark, entry):
    """Per-doc hygiene ops are scan+project only — any Exchange is a
    regression."""
    for q in ("q_text_profile", "q_gopher_quality_flags", "q_doc_fingerprint_winnow"):
        plan = _plan(getattr(entry, q)(spark, SF))
        assert "Exchange" not in plan, q


def test_bm25_single_scan_codegen(spark, entry):
    """BM25: no token explode, no Python UDF, stats broadcast back, top-k
    as TakeOrdered (never a global sort materialization)."""
    plan = _plan(entry.q_bm25_topk(spark, SF))
    assert "Generate" not in plan  # no explode of the token stream
    assert "Python" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "TakeOrderedAndProject" in plan


def test_pq_adc_no_cartesian_no_python(spark, entry):
    """PQ/ADC: codebooks and LUTs broadcast; scoring is a hash join +
    aggregation — no cartesian on raw vectors, no Python in the plan."""
    plan = _plan(entry.q_ann_pq_adc(spark, SF))
    assert "CartesianProduct" not in plan
    assert "Python" not in plan
    assert "BroadcastHashJoin" in plan


def test_lm_perplexity_shuffle_joins_no_cartesian(spark, entry):
    """LM scoring: transitions join count tables keyed on words; the only
    nested-loop is the broadcast of the 1-row vocab-size aggregate."""
    plan = _plan(entry.q_lm_perplexity(spark, SF))
    assert "CartesianProduct" not in plan
    assert "Python" not in plan


def test_exact_spans_no_cartesian(spark, entry):
    """Exact-span detection pairs via the DF-capped shingle inverted index;
    the run-extension window partitions by (pair, diagonal)."""
    plan = _plan(entry.q_dedup_exact_spans(spark, SF))
    assert "CartesianProduct" not in plan
    assert "Python" not in plan


def test_collocations_filters_before_unigram_joins(spark, entry):
    """The min_count HAVING must land below the joins (only heavy
    bigrams reach them) and nothing may go cartesian."""
    plan = _plan(entry.q_collocations(spark, SF))
    assert "CartesianProduct" not in plan
    # the c_xy >= k filter sits on the aggregate side, under the joins:
    # in the executed plan string the Filter on c_xy appears after
    # (deeper than) the last join operator header line
    join_at = plan.index("Join")
    assert "(c_xy" in plan[join_at:], "min_count filter not below the joins"


def test_pagerank_no_cartesian_and_aggregated_edges(spark, entry):
    plan = _plan(entry.q_link_pagerank(spark, SF))
    assert "CartesianProduct" not in plan


def test_unicode_split_is_map_side_only(spark, entry):
    """clean_unicode + hash_split add NO data-dependent shuffle: Arrow
    eval + project.  The one permitted Exchange is `_spread`'s
    round-robin fan-out of an under-partitioned input (a no-op at real
    scale) — never a hash/range repartition."""
    plan = _plan(entry.q_unicode_split(spark, SF))
    for chunk in plan.split("Exchange ")[1:]:
        assert chunk.startswith("RoundRobinPartitioning"), chunk.split("\n")[0]


def test_corpus_report_histogram_not_corpus_window(spark, entry):
    """The decile cumsum window must consume the length HISTOGRAM (an
    aggregated frame), never the raw corpus: every Window in the plan
    sits above a HashAggregate."""
    plan = _plan(entry.q_corpus_report(spark, SF))
    assert "CartesianProduct" not in plan
    for chunk in plan.split("Window")[1:]:
        # below each Window there must be an aggregate before any scan
        scan = chunk.find("Scan ")
        agg = chunk.find("HashAggregate")
        assert agg != -1 and (scan == -1 or agg < scan)


def test_planaudit_heuristics(spark):
    """The audit tool's flag logic on synthetic plans (the tool itself
    sweeps the live registry; see tools/planaudit.py)."""
    import sys

    sys.path.insert(0, "/root/repo/tools")
    from planaudit import audit_plan

    assert audit_plan("Project\n+- CartesianProduct\n") == ["CARTESIAN"]
    # BNLJ over a 1-row global-agg stats frame is sanctioned generically
    ok = "BroadcastNestedLoopJoin\n:- Scan parquet\n+- HashAggregate(keys=[], ...)\n"
    assert audit_plan(ok) == []
    bad = "BroadcastNestedLoopJoin\n:- Scan parquet\n+- Scan parquet\n"
    assert audit_plan(bad) == ["NESTEDLOOP"]
    # unpartitioned window straight over a scan = one-task funnel
    gw = ("Window [sum(x) windowspecdefinition(ts ASC NULLS FIRST, frame)]\n"
          "+- Scan parquet\n")
    assert audit_plan(gw) == ["GLOBALWINDOW"]
    # partitioned window over raw data: normal, unflagged
    pw = ("Window [sum(x) windowspecdefinition(user_id, ts ASC NULLS FIRST, f)]\n"
          "+- Scan parquet\n")
    assert audit_plan(pw) == []
    # unpartitioned window over an aggregated (bounded) frame: fine
    hw = ("Window [sum(c) windowspecdefinition(n ASC NULLS FIRST, f)]\n"
          "+- HashAggregate(keys=[n])\n   +- Scan parquet\n")
    assert audit_plan(hw) == []
