"""Curated-corpus parquet sink: the artifact a pretraining run actually
ships — hive-partitioned parquet plus a per-partition manifest.

Beyond-reference component (the reference exports to SQL/Cypher/JSONL
only; a 100-TB curation run lands on object storage as partitioned
parquet).  Scale design:

- **Partition layout**: ``partitionBy(*partition_cols)`` gives hive-style
  directories (``lang=en/…``) so downstream training readers prune
  partitions for free (mixture re-weighting by language/source reads only
  the strata it needs).
- **Small-files control**: naive ``partitionBy`` writes one file per
  (task × partition-value) — with P partition values and T upstream
  tasks, up to P·T files.  We repartition on the partition columns plus a
  bounded ``file_bucket`` salt first, so each partition value lands in at
  most ``files_per_partition`` tasks → at most that many files.  At
  100 TB you raise ``files_per_partition`` to keep individual files in
  the 128 MB–1 GB sweet spot; the shuffle this costs is the one that
  co-locates rows by partition value, which the write needs anyway.
- **Manifest**: one tiny aggregate per partition value (doc count, token
  sum, content hash XOR) written next to the data — the integrity record
  a resumable multi-job backfill checks before re-writing a partition.
  The content hash is order-independent (XOR of per-row md5 prefixes) so
  re-writes with different task layouts verify identical.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: bounded writer-salt domain; actual fan-out per partition value is
#: ``files_per_partition`` ≤ this.
_MAX_FILES_PER_PARTITION = 4096


def corpus_manifest(
    df: DataFrame,
    partition_cols: list[str],
    *,
    text_col: str = "text",
) -> DataFrame:
    """Per-partition integrity summary: ``(*partition_cols, n_docs,
    n_chars, content_hash)``.  ``content_hash`` is the XOR of the first
    15 hex digits of each row's text md5 — commutative, so it is
    independent of row order and file layout."""
    row_hash = F.conv(F.substring(F.md5(F.col(text_col)), 1, 15), 16, 10).cast("long")
    # bit_xor is a real aggregate: constant state per group and
    # map-combinable (partial XOR per task, merged at the reduce) — the
    # collect_list+aggregate spelling would buffer one long PER ROW of a
    # partition value into a single array in one task, O(n_docs) memory.
    return df.groupBy(*partition_cols).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.length(F.col(text_col))).cast("long").alias("n_chars"),
        F.bit_xor(row_hash).alias("content_hash"),
    )


def corpus_manifest_sql(src: str, partition_cols: list[str], text_col: str = "text") -> str:
    """DuckDB twin of :func:`corpus_manifest` — the same per-partition
    ``(n_docs, n_chars, content_hash)`` with the md5-prefix value spelled
    as hex-digit position arithmetic (DuckDB has no ``conv()``)."""
    digit = f"(strpos('0123456789abcdef', substr(md5({text_col}), {{d}}, 1)) - 1)"
    num = " + ".join(f"{digit.format(d=d + 1)} * {16 ** (14 - d)}" for d in range(15))
    cols = ", ".join(partition_cols)
    return (
        f"SELECT {cols}, CAST(COUNT(*) AS BIGINT) AS n_docs, "
        f"CAST(SUM(length({text_col})) AS BIGINT) AS n_chars, "
        f"bit_xor(CAST({num} AS BIGINT)) AS content_hash "
        f"FROM {src} GROUP BY {cols}"
    )


def write_corpus(
    df: DataFrame,
    path: str,
    *,
    partition_cols: list[str],
    text_col: str = "text",
    files_per_partition: int = 1,
    shuffle_salt: str | None = None,
    cluster_by: list[str] | None = None,
    mode: str = "error",
) -> DataFrame:
    """Write the curated corpus as hive-partitioned parquet under
    ``path``/data with a manifest at ``path``/manifest; returns the
    manifest frame (already materialized by the write).

    ``files_per_partition`` bounds output files per partition value —
    size it so files land near your block size (at local test scale 1 is
    right; a 100-TB run uses hundreds).

    ``shuffle_salt`` fixes a DETERMINISTIC pseudo-random training order:
    rows are sorted within each output task by the salted content hash,
    so a training job reading files sequentially sees a reproducible
    shuffle (change the salt to re-shuffle between epochs without
    rewriting bytes in a different layout scheme).  Sort is per-task —
    no global sort shuffle is ever issued.

    ``cluster_by`` instead range-clusters rows WITHIN each partition
    value by the given columns (one range shuffle + per-task sort), so
    parquet row-group min/max statistics become disjoint and a reader
    filtering on those columns (quality bucket, token-length band)
    prunes row groups without touching them — the lakehouse layout for
    selective re-reads of a 100-TB corpus.  Mutually exclusive with
    ``shuffle_salt``."""
    if shuffle_salt is not None and cluster_by:
        raise ValueError("shuffle_salt and cluster_by are mutually exclusive")
    if not 1 <= files_per_partition <= _MAX_FILES_PER_PARTITION:
        raise ValueError(f"files_per_partition must be in 1..{_MAX_FILES_PER_PARTITION}")
    salt = (
        F.conv(F.substring(F.md5(F.col(text_col)), 1, 7), 16, 10).cast("long")
        % files_per_partition
    )
    if cluster_by:
        placed = df.repartitionByRange(
            *[F.col(c) for c in partition_cols + cluster_by]
        ).sortWithinPartitions(*partition_cols, *cluster_by)
        placed = placed.withColumn("__file_bucket", F.lit(0))
    else:
        placed = df.withColumn("__file_bucket", salt).repartition(
            *[F.col(c) for c in partition_cols], F.col("__file_bucket")
        )
    if shuffle_salt is not None:
        # partition columns lead the sort so the dynamic-partition file
        # writer's own partition-grouping sort is a no-op and the salted
        # order survives into the files
        placed = placed.sortWithinPartitions(
            *partition_cols, F.md5(F.concat(F.lit(shuffle_salt), F.col(text_col)))
        )
    (
        placed.drop("__file_bucket")
        .write.mode(mode)
        .partitionBy(*partition_cols)
        .parquet(os.path.join(path, "data"))
    )
    manifest = corpus_manifest(df, partition_cols, text_col=text_col)
    manifest.write.mode(mode).parquet(os.path.join(path, "manifest"))
    return manifest


def _manifest_agg(manifest: DataFrame, partition_cols: list[str]) -> DataFrame:
    """Collapse an APPENDED manifest (one row per batch per partition
    value — what :func:`merge_corpus` accumulates) to one row per value:
    counts add, and the content hash is XOR so batch hashes combine to
    exactly the whole-partition hash."""
    return manifest.groupBy(*partition_cols).agg(
        F.sum("n_docs").cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("n_chars"),
        F.bit_xor("content_hash").alias("content_hash"),
    )


def verify_corpus(spark: SparkSession, path: str, *, text_col: str = "text") -> DataFrame:
    """Re-derive the manifest from the written data and diff it against
    the stored one: ``(*partition_cols, ok)`` per partition value — the
    check a resumable backfill runs before deciding which partitions to
    re-write.  Reads only the data files (manifest columns are recomputed
    with the same order-independent hash).  Appended manifests (delta
    batches) aggregate first — XOR composes batch hashes exactly."""
    raw = spark.read.parquet(os.path.join(path, "manifest"))
    partition_cols = [c for c in raw.columns if c not in ("n_docs", "n_chars", "content_hash")]
    stored = _manifest_agg(raw, partition_cols)
    actual = corpus_manifest(
        spark.read.parquet(os.path.join(path, "data")), partition_cols, text_col=text_col
    )
    a = actual.select(
        *partition_cols,
        F.col("n_docs").alias("a_docs"),
        F.col("n_chars").alias("a_chars"),
        F.col("content_hash").alias("a_hash"),
    )
    return (
        stored.join(a, partition_cols, "full_outer")
        .select(
            *partition_cols,
            # coalesce: a one-sided partition (present only in data or
            # only in the manifest) leaves the other side's columns NULL,
            # making the conjunction NULL — it must report ok=false, not
            # silently drop out of every `~ok` filter
            F.coalesce(
                (F.col("n_docs") == F.col("a_docs"))
                & (F.col("n_chars") == F.col("a_chars"))
                & (F.col("content_hash") == F.col("a_hash")),
                F.lit(False),
            ).alias("ok"),
        )
    )


def compact_corpus(
    spark: SparkSession,
    path: str,
    *,
    text_col: str = "text",
    files_per_partition: int = 1,
) -> DataFrame:
    """Rewrite the corpus at ``path`` with the target file fan-out and
    prove content invariance: the order-independent manifest recomputed
    from the compacted data must equal the stored one, or the original
    layout is left in place and the call raises.

    The operational fix for streaming/append-heavy corpora (a
    ``foreachBatch`` sink writes one file per batch per partition — a
    month of micro-batches is tens of thousands of tiny files whose scan
    overhead dominates at 100 TB).  The rewrite is one shuffle on the
    partition columns; the swap is write-new / verify / replace, so a
    failed verify never destroys data."""
    import shutil
    import tempfile

    raw = spark.read.parquet(os.path.join(path, "manifest"))
    partition_cols = [
        c for c in raw.columns if c not in ("n_docs", "n_chars", "content_hash")
    ]
    stored = _manifest_agg(raw, partition_cols)
    df = spark.read.parquet(os.path.join(path, "data"))
    tmp = tempfile.mkdtemp(prefix="corpus_compact_", dir=os.path.dirname(path) or ".")
    manifest = write_corpus(
        df,
        tmp,
        partition_cols=partition_cols,
        text_col=text_col,
        files_per_partition=files_per_partition,
        mode="overwrite",
    )
    bad = verify_corpus(spark, tmp, text_col=text_col).filter(~F.col("ok")).count()
    stored_rows = {tuple(sorted(r.asDict().items())) for r in stored.collect()}
    new_rows = {tuple(sorted(r.asDict().items())) for r in manifest.collect()}
    if bad or stored_rows != new_rows:
        shutil.rmtree(tmp, ignore_errors=True)
        raise RuntimeError("compaction verify failed; original layout untouched")
    for sub in ("data", "manifest"):
        shutil.rmtree(os.path.join(path, sub))
        shutil.move(os.path.join(tmp, sub), os.path.join(path, sub))
    shutil.rmtree(tmp, ignore_errors=True)
    # delta sidecar indexes (index/fp, index/bands) accumulate one small
    # file per merge batch — compact them with the same write-new /
    # verify / replace swap (invariance check: exact row-count + XOR of
    # row hashes, both order-independent)
    for sub in ("fp", "bands"):
        idx = os.path.join(path, "index", sub)
        if not os.path.isdir(idx):
            continue
        frame = spark.read.parquet(idx)
        row_hash = F.conv(
            F.substring(F.md5(F.concat_ws("\x01", *frame.columns)), 1, 15), 16, 10
        ).cast("long")
        def _sig(d):
            # constant-state map-combinable XOR (see corpus_manifest);
            # coalesce: bit_xor over zero rows is NULL, pin it to 0 so
            # empty-index signatures compare stably
            return d.agg(
                F.count("*").cast("long"),
                F.coalesce(F.bit_xor(row_hash), F.lit(0).cast("long")),
            ).first()
        before = _sig(frame)
        itmp = idx + ".compact_tmp"
        frame.coalesce(max(1, files_per_partition)).write.mode("overwrite").parquet(itmp)
        if _sig(spark.read.parquet(itmp)) != before:
            shutil.rmtree(itmp, ignore_errors=True)
            raise RuntimeError(f"index compaction verify failed for {sub}")
        shutil.rmtree(idx)
        shutil.move(itmp, idx)
    return manifest


def merge_corpus(
    spark: SparkSession,
    path: str,
    new_docs: DataFrame,
    *,
    partition_cols: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    near: bool = True,
    files_per_partition: int = 1,
) -> DataFrame:
    """Delta ingest: deduplicate ``new_docs`` against the corpus at
    ``path`` and append the survivors — WITHOUT rescanning the corpus.

    The corpus keeps a sidecar ``index/`` (bytes per document, not the
    documents): ``index/fp`` holds content fingerprints for exact dedup,
    ``index/bands`` the MinHash LSH band keys for near-dup (the same
    index :func:`~architxt_spark.streaming.corpus.minhash_dedup_batch`
    maintains — a corpus can be fed alternately by this batch verb and
    the streaming ingester and the state composes).  A delta therefore
    costs O(|delta| + |index scan|): two anti-join shuffles on hash
    keys, never a join against corpus text.

    Stages (census returned as ``(stage, n_docs)``):

    1. ``input`` — batch rows;
    2. ``exact`` — within-batch exact dedup (min-id per fingerprint)
       then anti-join against ``index/fp``;
    3. ``kept`` — near-dup filter against + update of ``index/bands``
       (skipped when ``near=False``);
    4. append survivors to ``data``/``manifest`` (manifests accumulate
       one row per batch per partition value; ``verify_corpus`` and
       ``compact_corpus`` aggregate them — XOR hashes compose exactly),
       and the survivors' fingerprints to ``index/fp``.

    First call on an empty ``path`` bootstraps corpus and indexes in one
    pass.  Recovery note: data + fp-index appends land BEFORE the band
    index append (the ``write_output`` ordering seam), so a failed run
    replayed from the caller re-emits at-worst duplicate rows — it can
    never see its own bands and drop the whole batch; for checkpointed
    replays use the streaming ingester."""
    from architxt_spark.functions.text import fingerprint
    from architxt_spark.session import read_parquet_if_exists, stage_barrier

    fp_path = os.path.join(path, "index", "fp")
    batch = stage_barrier(new_docs)
    census = [("input", batch.count())]

    fps = batch.select(
        F.col(id_col).alias("__id"), fingerprint(F.col(text_col)).alias("fp")
    )
    keep = fps.groupBy("fp").agg(F.min("__id").alias("__id"))
    hist = read_parquet_if_exists(spark, fp_path)  # None only on bootstrap;
    # a transient read error propagates rather than re-ingesting duplicates
    if hist is not None:
        keep = keep.join(hist.select("fp").distinct(), "fp", "left_anti")
    survivors = stage_barrier(
        batch.join(
            keep.select("__id"), batch[id_col] == F.col("__id"), "left_semi"
        )
    )
    census.append(("exact", survivors.count()))

    # Crash-ordering: the DATA/manifest append (and the fp-index append,
    # which gates future exact dedup) must land before the band-index
    # append inside minhash_dedup_batch — hence the write_output seam.
    # A crash mid-sequence then replays as duplicates, never as loss.
    kept_n = [0]

    def _commit(kept: DataFrame) -> None:
        kept_n[0] = kept.count()
        if kept_n[0] > 0:
            write_corpus(
                kept,
                path,
                partition_cols=partition_cols,
                text_col=text_col,
                files_per_partition=files_per_partition,
                mode="append",
            )
            kept.select(
                fingerprint(F.col(text_col)).alias("fp")
            ).write.mode("append").parquet(fp_path)

    if near:
        from architxt_spark.streaming.corpus import minhash_dedup_batch

        minhash_dedup_batch(
            survivors,
            os.path.join(path, "index", "bands"),
            text_col=text_col,
            id_col=id_col,
            write_output=_commit,
        )
    else:
        _commit(survivors)
    census.append(("kept", kept_n[0]))
    return spark.createDataFrame(census, "stage string, n_docs long")
