"""Driver-contract invariants for __spark_entry__.py."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_registry_oracle_alignment():
    """Every queries() entry must have an oracle_sql() twin and vice
    versa — a new operator can't silently land without its gate."""
    import __spark_entry__ as E

    q, o = E.queries(), E.oracle_sql()
    assert set(q) == set(o), (
        f"missing oracles: {sorted(set(q) - set(o))}; "
        f"orphan oracles: {sorted(set(o) - set(q))}"
    )


def test_rotation_prefix_is_valid_and_first():
    """The rotation prefix must reference real queries and actually lead
    the registry ordering (the driver gates roughly the first 50)."""
    import __spark_entry__ as E

    q = E.queries()
    allq = E._all_queries()
    names = list(q)
    assert set(names) == set(allq)
    # brand-new entries (no driver verdict ever) lead outright
    new = (
        "link_pagerank", "unicode_split", "collocations", "corpus_report",
        "corpus_delta", "tfidf_terms", "random_project", "corpus_drift",
        "ann_recall", "ppl_buckets", "warc_split_roundtrip",
    )
    for i, k in enumerate(new):
        assert names.index(k) == i, k
    # the 34 entries whose only driver verdict is round-4 come next so
    # every registry entry ends the round with a verdict <= 2 rounds old
    for k in ("scan_filter_project", "agg_pricing_summary",
              "join_revenue_by_nation", "sort_limit_top_orders",
              "percentile_orders", "unpivot_orders", "events_rollup_streaming",
              "retention_cohorts", "dataset_extract_nation",
              "forest_stats_documents", "rewrite_documents",
              "cluster_documents", "cluster_instance_documents",
              "tree_leaves_nation", "coverage_metric", "bm25_topk",
              "dedup_simhash", "dedup_filtered", "graph_extract",
              "typed_export_orders", "sampling_mixture", "sampling_pack"):
        assert names.index(k) < len(new) + 34, k
    # r6: every entry folded, added, or code-touched this round must also
    # lead the window
    for k in ("sketch_suite", "bpe_tokenizer", "chunk_pipeline",
              "dedup_minhash_lsh", "dedup_components", "curation_pipeline",
              "stream_fm_distinct", "bm25_batch"):
        assert names.index(k) < len(new) + 50, k
