"""Round-7 regression invariants: crash-ordering of persistent-state
appends (output BEFORE index/bitmap), constant-state manifest hashing,
one-sided verify, narrowed bootstrap catches, entity/JPEG edge fixes,
and the streaming WARC default path's O(record) memory model."""

from __future__ import annotations

import gzip

import pytest
from pyspark.sql import functions as F


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


# ---------------------------------------------------------------------------
# crash-ordering: output append lands before persistent-index append
# ---------------------------------------------------------------------------


def test_minhash_dedup_output_before_index(spark, tmp_path):
    """If the caller's output write crashes, the band index must NOT have
    the batch's bands — a checkpoint replay then re-emits the batch's
    survivors instead of dropping them all as already-seen."""
    import os

    from architxt_spark.streaming.corpus import minhash_dedup_batch

    idx = str(tmp_path / "bands")
    batch = _docs(spark, [(1, "the quick brown fox jumps over the lazy dog today", "en"),
                          (2, "an entirely different second document body right here", "en")])

    def boom(_kept):
        raise RuntimeError("sink died")

    with pytest.raises(RuntimeError, match="sink died"):
        minhash_dedup_batch(batch, idx, write_output=boom)
    assert not os.path.isdir(idx), "index append must not precede output append"

    # replay: same batch, healthy sink — every survivor re-emitted
    out = []
    kept = minhash_dedup_batch(batch, idx, write_output=lambda k: out.append(k.count()))
    assert out == [2]
    assert sorted(r.doc_id for r in kept.collect()) == [1, 2]
    assert spark.read.parquet(idx).count() > 0  # index committed after output


def test_url_seen_output_before_bloom(spark, tmp_path):
    import os

    from architxt_spark.streaming.corpus import url_seen_batch

    bloom = str(tmp_path / "bloom")
    batch = spark.createDataFrame(
        [("http://a/", 1), ("http://b/", 2)], "url string, doc_id long"
    )

    def boom(_kept):
        raise RuntimeError("sink died")

    with pytest.raises(RuntimeError, match="sink died"):
        url_seen_batch(batch, bloom, n_bits=4096, write_output=boom)
    assert not os.path.isdir(bloom)

    kept = url_seen_batch(batch, bloom, n_bits=4096, write_output=lambda k: None)
    assert {r.url for r in kept.collect()} == {"http://a/", "http://b/"}
    # second sighting now filtered by the committed bitmap
    again = url_seen_batch(batch, bloom, n_bits=4096, write_output=lambda k: None)
    assert again.count() == 0


# ---------------------------------------------------------------------------
# constant-state manifest hash + one-sided verify
# ---------------------------------------------------------------------------


def test_corpus_manifest_is_map_combinable(spark):
    """The content hash must be a real bit_xor aggregate (constant state,
    partial-combinable), never collect_list-into-one-array."""
    from architxt_spark.sinks.corpus import corpus_manifest

    m = corpus_manifest(_docs(spark, [(1, "aa", "en"), (2, "bb", "en")]), ["lang"])
    plan = m._jdf.queryExecution().optimizedPlan().toString()
    assert "collect_list" not in plan
    assert "bit_xor" in plan.lower()
    row = m.first()
    assert row.n_docs == 2 and row.content_hash is not None


def test_verify_corpus_reports_one_sided_partitions_false(spark, tmp_path):
    import shutil

    from architxt_spark.sinks.corpus import verify_corpus, write_corpus

    path = str(tmp_path / "c")
    write_corpus(
        _docs(spark, [(1, "alpha", "en"), (2, "beta", "fr")]),
        path,
        partition_cols=["lang"],
    )
    # remove one partition's data entirely: present only in the manifest
    shutil.rmtree(str(tmp_path / "c" / "data" / "lang=fr"))
    ok = {r.lang: r.ok for r in verify_corpus(spark, path).collect()}
    assert ok["en"] is True
    assert ok["fr"] is False  # NOT None — one-sided must fail loudly


def test_read_parquet_if_exists_narrow(spark, tmp_path):
    """Missing path → None (bootstrap); corrupt parquet → raises (a real
    error must never be mistaken for 'no index yet')."""
    from architxt_spark.session import read_parquet_if_exists

    assert read_parquet_if_exists(spark, str(tmp_path / "nope")) is None
    bad = tmp_path / "bad"
    bad.mkdir()
    (bad / "part-0.parquet").write_text("this is not parquet")
    with pytest.raises(Exception):
        read_parquet_if_exists(spark, str(bad)).collect()


# ---------------------------------------------------------------------------
# entity / JPEG edge fixes
# ---------------------------------------------------------------------------


def test_html_double_escaped_entities_stay_escaped_once():
    from architxt_spark.sources.warc import html_to_text

    # &amp;lt; is the ESCAPED text "&lt;" — must unescape exactly once,
    # never resurrect literal markup
    assert html_to_text(b"<p>&amp;lt;b&amp;gt; and A &amp; B</p>") == "&lt;b&gt; and A & B"


def test_jpeg_fill_bytes_between_segments():
    import struct

    from architxt_spark.functions.multimodal import decode_jpeg_dims

    app0 = b"\xff\xe0" + struct.pack(">H", 4) + b"JF"
    sof = b"\xff\xff\xff\xc0" + struct.pack(">H", 11) + b"\x08" + struct.pack(">HH", 7, 9) + b"\x01\x11\x00"
    jpg = b"\xff\xd8" + app0 + sof  # legal 0xFF fill run before the SOF marker
    assert decode_jpeg_dims(jpg) == (9, 7)


# ---------------------------------------------------------------------------
# streaming WARC default path: O(record) memory, bounded Arrow batches
# ---------------------------------------------------------------------------


def test_read_warc_streams_with_record_bounded_memory(tmp_path):
    """Parse a 64 MB gz archive driver-side through the same iterator the
    Spark tasks run; peak allocation must stay far below the inflated
    size (O(largest record + read chunk), not O(file))."""
    import tracemalloc

    from architxt_spark.sources.warc import _WHOLE_FILE, _range_records, build_warc

    rec_payload = b"A" * (64 << 10)
    raw = build_warc(
        [{"warc_type": "response", "target_uri": f"http://m/{i}", "payload": rec_payload}
         for i in range(1000)]  # ~64 MB uncompressed
    )
    p = tmp_path / "big.warc.gz"
    p.write_bytes(gzip.compress(raw))

    opener = lambda q: gzip.GzipFile(fileobj=open(q, "rb"))  # noqa: E731
    tracemalloc.start()
    n = 0
    for rec in _range_records(str(p), 0, _WHOLE_FILE, ("response",), False, opener):
        n += 1
        assert rec["payload"] == rec_payload
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    assert n == 1000
    # buffer discipline: one 16 MB ensure() chunk + record + slack << 64 MB
    assert peak < 40 << 20, f"peak {peak >> 20} MB — whole-file materialization?"


def test_read_warc_bounded_arrow_batches(spark, tmp_path):
    """batch_rows caps rows per yielded pandas frame, and an empty file
    still emits the stable schema."""
    from architxt_spark.sources import warc as W

    raw = W.build_warc(
        [{"warc_type": "response", "target_uri": f"http://b/{i}", "payload": b"x" * 10}
         for i in range(10)]
    )
    (tmp_path / "a.warc").write_bytes(raw)
    (tmp_path / "empty.warc").write_bytes(b"")

    frames = list(
        W._batched_frames(
            W._range_records(str(tmp_path / "a.warc"), 0, W._WHOLE_FILE, (), False,
                             lambda p: open(p, "rb")),
            batch_rows=3,
        )
    )
    assert [len(f) for f in frames] == [3, 3, 3, 1]
    assert all(list(f.columns) == W._WARC_COLS for f in frames)

    df = W.read_warc(spark, str(tmp_path), batch_rows=3)
    assert df.count() == 10  # empty file contributes zero rows, no error


def test_read_warc_gz_multi_member_stream(spark, tmp_path):
    """CommonCrawl layout: one gzip MEMBER per record — the incremental
    GzipFile path must read across members transparently."""
    from architxt_spark.sources.warc import build_warc, read_warc

    members = b"".join(
        gzip.compress(build_warc(
            [{"warc_type": "response", "target_uri": f"http://g/{i}", "payload": b"p%d" % i}]
        ))
        for i in range(5)
    )
    (tmp_path / "cc.warc.gz").write_bytes(members)
    rows = read_warc(spark, str(tmp_path / "cc.warc.gz")).collect()
    assert sorted(r.target_uri for r in rows) == [f"http://g/{i}" for i in range(5)]


def test_read_warc_split_gz_idx_sidecar(spark, tmp_path):
    """A `.idx` member-offset sidecar makes compressed archives
    SPLITTABLE: member-aligned byte ranges, one task each, byte-identical
    to the per-file reader (both plain-int and CDXJ sidecar formats)."""
    import json

    from architxt_spark.sources.warc import build_warc, read_warc, read_warc_split

    member_blobs = [
        gzip.compress(build_warc(
            [{"warc_type": "response", "target_uri": f"http://s/{i}",
              "payload": b"payload-%d " % i * 40}]
        ))
        for i in range(12)
    ]
    blob = b"".join(member_blobs)
    (tmp_path / "cc.warc.gz").write_bytes(blob)
    offs, pos = [], 0
    for m in member_blobs:
        offs.append((pos, len(m)))
        pos += len(m)
    # CDXJ-style lines (the CommonCrawl shape)
    (tmp_path / "cc.warc.gz.idx").write_text(
        "\n".join(
            f"com,s)/{i} 20260101000000 "
            + json.dumps({"url": f"http://s/{i}", "offset": str(o), "length": str(ln)})
            for i, (o, ln) in enumerate(offs)
        )
    )
    whole = sorted(
        (r.target_uri, bytes(r.payload))
        for r in read_warc(spark, str(tmp_path / "cc.warc.gz")).collect()
    )
    split_df = read_warc_split(
        spark, str(tmp_path / "cc.warc.gz"), split_bytes=sum(ln for _, ln in offs) // 4
    )
    got = sorted((r.target_uri, bytes(r.payload)) for r in split_df.collect())
    assert got == whole and len(got) == 12
    assert split_df.rdd.getNumPartitions() > 1  # genuinely split

    # plain "offset length" sidecar format parses identically
    from architxt_spark.sources.warc import _parse_idx

    assert _parse_idx("\n".join(f"{o} {ln}" for o, ln in offs)) == sorted(offs)
