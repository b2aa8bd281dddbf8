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
    # r10: code-touched entries lead (rewrite probe/apply fusion,
    # sampling token-budget SQL-twin cast, curation up-front validation,
    # ann serving-index temp-dir lifecycle), then ALL 32 entries whose
    # newest driver verdict is r8 — the <=2-round rotation contract
    touched = ("rewrite_documents", "sampling_mixture",
               "curation_pipeline", "ann_recall", "ann_suite",
               "multimodal_profile", "stream_curate", "semantic_dedup")
    for i, k in enumerate(touched):
        assert names.index(k) == i, k
    stale_r8 = (
        "events_sessionize_streaming", "stream_minhash_dedup",
        "stream_curate", "stream_url_seen", "forest_stats_documents",
        "contamination_screen", "doc_loader_json_props",
        "llm_label_schema", "tree_leaves_nation", "extract_valid_trees",
        "coverage_metric", "bm25_topk", "lm_perplexity", "ngram_stats",
        "dsir", "quality_classifier", "domain_profile", "link_pagerank",
        "collocations", "tfidf_terms", "random_project", "ppl_buckets",
        "warc_split_roundtrip", "dedup_exact_spans", "dedup_simhash",
        "dedup_filtered", "events_sessionize", "graph_extract",
        "typed_export_orders", "sampling_temperature",
        "sampling_weighted", "sampling_pack",
    )
    for k in stale_r8:
        assert names.index(k) < 45, k
    # folded-away entries must be GONE (their coverage lives in the folds)
    for gone in ("ann_topk", "ann_ivf_topk", "ann_pq_adc", "window_orders",
                 "grouping_orders", "corpus_report", "corpus_drift",
                 "string_funcs_parts", "date_math_orders", "json_props_events",
                 "gopher_quality_flags", "doc_fingerprint_winnow",
                 "bpe_tokenizer", "bpe_train_merges",
                 "funnel_signup_view_purchase", "retention_cohorts",
                 "export_sql_ddl", "export_cypher_stats", "asof_events",
                 "range_join_signup_clicks", "dedup_ngram_jaccard",
                 "dedup_minhash_lsh", "stream_fm_distinct"):
        assert gone not in allq, gone
