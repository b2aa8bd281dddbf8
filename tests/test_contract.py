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
    # r15 (optimization round 2): entries whose executed code changed
    # this round lead (single-scan classifier/LM/DSIR scoring, cross-pair
    # signature carry, BFS/PageRank scheduling cuts, memo-key +
    # signature-lifecycle changes), then ALL 36 entries whose newest
    # driver verdict is r13 — the <=2-round rotation contract
    touched = (
        "quality_classifier", "lm_perplexity", "ppl_buckets", "dsir",
        "contamination_screen", "graph_extract", "link_pagerank",
        "dedup_pairs", "dedup_filtered", "stream_minhash_dedup",
        "stream_curate",
    )
    for i, k in enumerate(touched):
        assert names.index(k) == i, k
    stale_r13 = (
        "curation_pipeline", "crawl_to_corpus", "c4_clean", "text_profile",
        "pii_redaction", "lang_distribution", "doc_quality_stats",
        "bm25_batch", "bpe_suite", "chunk_pipeline", "corpus_delta",
        "crawl_media_dedup", "dataset_extract_nation", "dedup_components",
        "doc_chunking", "embedding_near_dup", "events_funnel",
        "events_rollup_streaming", "events_sessionize_streaming",
        "export_stats", "extract_vocab", "forest_stats_documents",
        "gen_instance", "join_salted_revenue", "llm_rewrite_stub",
        "nlp_parse_forest", "sampling_mixture", "sampling_strata",
        "scalar_funcs", "schema_groups_nation", "simple_rewrite_documents",
        "sketch_suite", "temporal_joins", "unicode_split",
        "unpivot_orders", "window_grouping",
    )
    for k in stale_r13:
        assert names.index(k) < 47, k
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
