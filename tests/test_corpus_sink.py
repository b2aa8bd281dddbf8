"""Partitioned curated-corpus parquet sink (sinks/corpus.py)."""

import os

import pytest
from pyspark.sql import functions as F

from architxt_spark.sinks.corpus import corpus_manifest, verify_corpus, write_corpus


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_write_partition_layout_and_roundtrip(spark, docs, tmp_path):
    path = str(tmp_path / "corpus")
    manifest = write_corpus(docs, path, partition_cols=["lang"])
    langs = {r.lang for r in docs.select("lang").distinct().collect()}
    dirs = {d for d in os.listdir(f"{path}/data") if d.startswith("lang=")}
    assert dirs == {f"lang={l}" for l in langs}
    # one data file per partition value at files_per_partition=1
    for d in dirs:
        files = [f for f in os.listdir(f"{path}/data/{d}") if f.endswith(".parquet")]
        assert len(files) == 1, d
    back = spark.read.parquet(f"{path}/data")
    assert back.count() == docs.count()
    got = {
        tuple(sorted(r.asDict().items()))
        for r in back.select(*docs.columns).collect()
    }
    want = {tuple(sorted(r.asDict().items())) for r in docs.collect()}
    assert got == want
    assert manifest.count() == len(langs)


def test_manifest_is_order_independent(docs):
    a = {r.lang: r.content_hash for r in corpus_manifest(docs, ["lang"]).collect()}
    shuffled = docs.orderBy(F.md5("text")).repartition(7)
    b = {r.lang: r.content_hash for r in corpus_manifest(shuffled, ["lang"]).collect()}
    assert a == b


def test_verify_detects_tamper(spark, docs, tmp_path):
    path = str(tmp_path / "corpus")
    write_corpus(docs, path, partition_cols=["lang"])
    ok = verify_corpus(spark, path)
    assert all(r.ok for r in ok.collect())
    # drop one partition's data files and re-verify
    victim = sorted(d for d in os.listdir(f"{path}/data") if d.startswith("lang="))[0]
    for f in os.listdir(f"{path}/data/{victim}"):
        if f.endswith(".parquet"):
            os.remove(f"{path}/data/{victim}/{f}")
    again = {}
    for r in verify_corpus(spark, path).collect():
        again[r.lang] = bool(r.ok) if r.ok is not None else False
    bad_lang = victim.split("=", 1)[1]
    assert again[bad_lang] is False
    assert sum(1 for v in again.values() if v) == len(again) - 1


def test_files_per_partition_bounds_fanout(spark, docs, tmp_path):
    path = str(tmp_path / "corpus3")
    write_corpus(docs, path, partition_cols=["lang"], files_per_partition=3)
    for d in os.listdir(f"{path}/data"):
        if not d.startswith("lang="):
            continue
        files = [f for f in os.listdir(f"{path}/data/{d}") if f.endswith(".parquet")]
        assert 1 <= len(files) <= 3, d
    with pytest.raises(ValueError):
        write_corpus(docs, str(tmp_path / "x"), partition_cols=["lang"], files_per_partition=0)


def test_shuffle_salt_orders_deterministically(spark, docs, tmp_path):
    """shuffle_salt fixes a reproducible pseudo-random within-file order;
    a different salt gives a different order over the same rows."""

    def order(path, salt):
        write_corpus(docs, path, partition_cols=["lang"], shuffle_salt=salt)
        first = sorted(os.listdir(f"{path}/data"))
        lang_dir = [d for d in first if d.startswith("lang=")][0]
        pf = [f for f in os.listdir(f"{path}/data/{lang_dir}") if f.endswith(".parquet")][0]
        import pyarrow.parquet as pq

        return list(pq.read_table(f"{path}/data/{lang_dir}/{pf}", columns=["doc_id"])["doc_id"].to_pylist())

    a = order(str(tmp_path / "s1"), "epoch0")
    b = order(str(tmp_path / "s2"), "epoch0")
    c = order(str(tmp_path / "s3"), "epoch1")
    assert a == b                      # deterministic
    assert sorted(a) == sorted(c)      # same rows
    assert a != c                      # different epoch, different order
    assert a != sorted(a)              # actually shuffled, not id-ordered


def test_cluster_by_gives_disjoint_row_group_stats(spark, docs, tmp_path):
    """cluster_by range-clusters within partition values: parquet
    row-group/file min-max stats on the cluster column become (near-)
    disjoint, the precondition for stats-based pruning on read."""
    import pyarrow.parquet as pq

    path = str(tmp_path / "clustered")
    write_corpus(docs, path, partition_cols=["lang"], cluster_by=["n_chars"])
    # collect (min, max) of n_chars per parquet file for one language
    lang_dir = sorted(
        d for d in os.listdir(f"{path}/data") if d.startswith("lang=")
    )[0]
    spans = []
    for f in os.listdir(f"{path}/data/{lang_dir}"):
        if not f.endswith(".parquet"):
            continue
        md = pq.ParquetFile(f"{path}/data/{lang_dir}/{f}").metadata
        for rg in range(md.num_row_groups):
            col = next(
                md.row_group(rg).column(i)
                for i in range(md.num_columns)
                if md.row_group(rg).column(i).path_in_schema == "n_chars"
            )
            spans.append((col.statistics.min, col.statistics.max))
    assert spans
    spans.sort()
    overlaps = sum(1 for a, b in zip(spans, spans[1:]) if b[0] < a[1])
    assert overlaps == 0  # disjoint (boundary-equal allowed)
    # rows preserved
    assert spark.read.parquet(f"{path}/data").count() == docs.count()
    with pytest.raises(ValueError):
        write_corpus(
            docs, str(tmp_path / "x2"), partition_cols=["lang"],
            cluster_by=["n_chars"], shuffle_salt="s",
        )


def test_compact_corpus_merges_files_and_preserves_content(spark, docs, tmp_path):
    """Append-heavy layout (many files per partition) compacts to one
    file per partition value with a bit-identical manifest; rows and
    values survive exactly."""
    from architxt_spark.sinks.corpus import compact_corpus, corpus_manifest

    path = str(tmp_path / "corpus")
    # simulate the append-heavy layout a foreachBatch sink produces:
    # several appends -> several files per partition value
    half_a = docs.filter("doc_id % 2 = 0")
    half_b = docs.filter("doc_id % 2 = 1")
    for part in (half_a, half_b):
        part.coalesce(1).write.mode("append").partitionBy("lang").parquet(f"{path}/data")
    corpus_manifest(docs, ["lang"]).write.parquet(f"{path}/manifest")
    before = {
        d: len([f for f in os.listdir(f"{path}/data/{d}") if f.endswith(".parquet")])
        for d in os.listdir(f"{path}/data")
        if d.startswith("lang=")
    }
    assert any(n > 1 for n in before.values())
    stored = {tuple(r) for r in spark.read.parquet(f"{path}/manifest").collect()}

    compact_corpus(spark, path)
    after = {
        d: len([f for f in os.listdir(f"{path}/data/{d}") if f.endswith(".parquet")])
        for d in os.listdir(f"{path}/data")
        if d.startswith("lang=")
    }
    assert set(after) == set(before) and all(n == 1 for n in after.values())
    assert {tuple(r) for r in spark.read.parquet(f"{path}/manifest").collect()} == stored
    back = spark.read.parquet(f"{path}/data")
    assert back.count() == docs.count()
    got = {tuple(sorted(r.asDict().items())) for r in back.select(*docs.columns).collect()}
    assert got == {tuple(sorted(r.asDict().items())) for r in docs.collect()}


def test_merge_corpus_delta_ingest(spark, tmp_path):
    """Delta ingest: exact dups vs the fingerprint index, within-batch
    dups, near-dups vs the band index — all dropped without rescanning
    corpus text; manifests accumulate per batch and verify/compact
    aggregate them."""
    from architxt_spark.sinks.corpus import (
        compact_corpus,
        merge_corpus,
        verify_corpus,
    )

    def doc(i, extra=""):
        # disjoint vocabulary per i => zero shingle overlap across docs
        words = " ".join(f"w{i}x{j}" for j in range(12))
        return f"{words} {extra}".strip()

    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string, lang string")
    path = str(tmp_path / "c")

    a = mk([(i, doc(i), "en") for i in range(10)])
    c1 = {r.stage: r.n_docs for r in
          merge_corpus(spark, path, a, partition_cols=["lang"]).collect()}
    assert c1 == {"input": 10, "exact": 10, "kept": 10}

    b = mk(
        [(100 + i, doc(i), "en") for i in range(3)]        # exact dups of A
        + [(200, doc(50), "en"), (201, doc(50), "en")]     # within-batch pair
        + [(300, doc(60), "en")]                            # genuinely new
        + [(301, doc(2, "tail"), "en")]                     # near-dup of A's doc 2
    )
    c2 = {r.stage: r.n_docs for r in
          merge_corpus(spark, path, b, partition_cols=["lang"]).collect()}
    assert c2["input"] == 7
    assert c2["exact"] == 3          # -3 index hits, -1 within-batch dup
    assert c2["kept"] == 2           # near-dup of doc 2 dropped by the band index

    data = spark.read.parquet(f"{path}/data")
    assert data.count() == 12 and data.select("text").distinct().count() == 12
    assert all(r.ok for r in verify_corpus(spark, path).collect())

    # a third batch resending batch B is fully absorbed by the indexes
    c3 = {r.stage: r.n_docs for r in
          merge_corpus(spark, path, b, partition_cols=["lang"]).collect()}
    assert c3["kept"] == 0
    assert spark.read.parquet(f"{path}/data").count() == 12

    # compaction aggregates the per-batch manifest rows and verifies
    compact_corpus(spark, path)
    after = spark.read.parquet(f"{path}/data")
    assert after.count() == 12
    assert all(r.ok for r in verify_corpus(spark, path).collect())


def test_merge_corpus_exact_only(spark, tmp_path):
    from architxt_spark.sinks.corpus import merge_corpus

    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string, lang string")
    path = str(tmp_path / "c2")
    merge_corpus(spark, path, mk([(1, "alpha beta gamma", "en")]),
                 partition_cols=["lang"], near=False)
    c = {r.stage: r.n_docs for r in merge_corpus(
        spark, path,
        mk([(2, "alpha beta gamma", "en"), (3, "delta epsilon zeta", "en")]),
        partition_cols=["lang"], near=False).collect()}
    assert c == {"input": 2, "exact": 1, "kept": 1}


def test_cli_merge(spark, tmp_path, capsys):
    from architxt_spark import cli

    docs = spark.createDataFrame(
        [(i, " ".join(f"m{i}w{j}" for j in range(12)), "en") for i in range(6)],
        "doc_id long, text string, lang string",
    )
    docs.filter("doc_id < 4").write.parquet(str(tmp_path / "b1"))
    docs.filter("doc_id >= 2").write.parquet(str(tmp_path / "b2"))  # 2 overlap
    corpus = str(tmp_path / "c")
    cli.main(["merge", corpus, str(tmp_path / "b1"), "--partition-by", "lang"])
    cli.main(["merge", corpus, str(tmp_path / "b2"), "--partition-by", "lang"])
    out = capsys.readouterr().out.strip().splitlines()
    assert out[-3:] == ["input\t4", "exact\t2", "kept\t2"]
    assert spark.read.parquet(f"{corpus}/data").count() == 6


def test_compact_corpus_compacts_delta_indexes(spark, tmp_path):
    """After several merges the fp/band indexes hold one file per batch;
    compaction collapses them with content invariance."""
    import glob

    from architxt_spark.sinks.corpus import compact_corpus, merge_corpus

    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string, lang string")
    path = str(tmp_path / "c")
    for b in range(3):
        merge_corpus(
            spark, path,
            mk([(b * 10 + i, " ".join(f"b{b}d{i}w{j}" for j in range(12)), "en")
                for i in range(4)]),
            partition_cols=["lang"],
        )
    def n_files(sub):
        return len(glob.glob(f"{path}/index/{sub}/*.parquet"))
    fp_before = spark.read.parquet(f"{path}/index/fp")
    fps_before = sorted(r.fp for r in fp_before.collect())
    assert n_files("fp") >= 3
    compact_corpus(spark, path)
    assert n_files("fp") == 1 and n_files("bands") == 1
    assert sorted(r.fp for r in spark.read.parquet(f"{path}/index/fp").collect()) == fps_before
    # merging after compaction still dedups against the compacted index
    c = {r.stage: r.n_docs for r in merge_corpus(
        spark, path,
        mk([(100, " ".join(f"b0d0w{j}" for j in range(12)), "en")]),
        partition_cols=["lang"]).collect()}
    assert c["exact"] == 0
