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
    # r13: code-touched entries lead (PDF /Encrypt parsing + CMap guards +
    # fast-AES seam + ODF Blowfish; fold hosts for the tests-only SURVEY
    # §2 rows), then ALL 36 entries whose newest driver verdict is r11 —
    # the <=2-round rotation contract
    touched = ("doc_loader_files", "forest_stats_documents",
               "dataset_extract_nation")
    for i, k in enumerate(touched):
        assert names.index(k) == i, k
    stale_r11 = (
        "bm25_batch", "bpe_suite", "c4_clean", "chunk_pipeline",
        "cluster_documents", "cluster_instance_documents", "corpus_delta",
        "corpus_health", "crawl_media_dedup", "crawl_to_corpus",
        "curation_pipeline", "dedup_components", "doc_chunking",
        "doc_quality_stats", "embedding_near_dup", "events_funnel",
        "export_stats", "extract_vocab", "gen_instance",
        "lang_distribution", "llm_rewrite_stub", "metrics_customer",
        "multimodal_dedup", "multimodal_profile", "nlp_parse_forest",
        "pii_redaction", "sampling_mixture", "sampling_strata",
        "scalar_funcs", "schema_groups_nation",
        "simple_rewrite_documents", "sketch_suite", "temporal_joins",
        "text_profile", "unicode_split", "window_grouping",
    )
    for k in stale_r11:
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
