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
    # r9: code-touched entries lead (ann serving-path recall variant,
    # JVM NFC seam on the unicode/curation hot path), then ALL 32
    # entries whose newest driver verdict is r7 — the <=2-round
    # rotation contract
    touched = ("ann_recall", "ann_suite", "unicode_split",
               "curation_pipeline", "rewrite_documents",
               "cluster_documents", "cluster_instance_documents",
               "sampling_mixture")
    for i, k in enumerate(touched):
        assert names.index(k) == i, k
    stale_r7 = (
        "dataset_extract_nation", "schema_groups_nation",
        "metrics_customer", "text_profile", "pii_redaction",
        "simple_rewrite_documents", "multimodal_profile", "gen_instance",
        "llm_rewrite_stub", "extract_vocab", "nlp_parse_forest",
        "bm25_batch", "doc_chunking", "semantic_dedup", "sketch_suite",
        "corpus_delta", "lang_distribution", "dedup_components",
        "chunk_pipeline", "embedding_near_dup", "sampling_strata",
        "c4_clean", "window_grouping", "corpus_health", "scalar_funcs",
        "doc_quality_stats", "bpe_suite", "events_funnel", "export_stats",
        "temporal_joins", "dedup_pairs", "distinct_parts_per_brand",
    )
    for k in stale_r7:
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
