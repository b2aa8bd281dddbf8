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
    # r14: code-touched entries lead (scale-safe AMI contingency, XOR
    # .xls + .ods repeat fixes, scalar-similarity/entity_labels folds,
    # 12-bit progressive JPEG), then ALL 36 entries whose newest driver
    # verdict is r12 — the <=2-round rotation contract
    touched = ("metrics_customer", "doc_loader_files",
               "cluster_instance_documents", "cluster_documents",
               "multimodal_profile", "multimodal_dedup")
    for i, k in enumerate(touched):
        assert names.index(k) == i, k
    stale_r12 = (
        "ann_recall", "ann_suite", "bm25_topk", "collocations",
        "contamination_screen", "coverage_metric", "dedup_exact_spans",
        "dedup_filtered", "dedup_pairs", "dedup_simhash",
        "distinct_parts_per_brand", "doc_loader_json_props",
        "domain_profile", "dsir", "events_sessionize",
        "extract_valid_trees", "graph_extract", "link_pagerank",
        "llm_label_schema", "lm_perplexity", "ngram_stats", "ppl_buckets",
        "quality_classifier", "random_project", "rewrite_documents",
        "sampling_pack", "sampling_temperature", "sampling_weighted",
        "semantic_dedup", "stream_curate", "stream_minhash_dedup",
        "stream_url_seen", "tfidf_terms", "tree_leaves_nation",
        "typed_export_orders", "warc_split_roundtrip",
    )
    for k in stale_r12:
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
