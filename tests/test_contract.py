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
    # r4 operators: near the gate window (their verdicts are at most one
    # round old, so drifting a few rows past ~50 as r5 entries land is OK)
    for k in ("bm25_topk", "ann_pq_adc", "bpe_train_merges", "lm_perplexity",
              "dedup_exact_spans", "sampling_temperature", "sampling_weighted",
              "doc_chunking", "ngram_stats"):
        assert names.index(k) < 56, k
    # r5: every entry added, folded, or code-touched this round, plus the
    # 24 whose last driver verdict predates r4, must also lead the window
    for k in ("bm25_batch", "bpe_encode_counts", "bpe_vocab", "semantic_dedup",
              "dsir_scores", "chunk_dedup", "chunk_strip", "ann_ivf_topk",
              "dedup_ngram_jaccard", "nlp_parse_forest", "ann_topk",
              "stream_minhash_dedup", "embedding_near_dup",
              "fm_distinct_tokens", "kmv_token_overlap", "bloom_screen"):
        assert names.index(k) < 50, k
