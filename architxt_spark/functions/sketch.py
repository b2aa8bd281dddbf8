"""Deterministic distributed sketches.

Spark's built-in ``approx_count_distinct`` (HyperLogLog++) is not
reproducible outside the JVM, so it can never pass a cross-engine hash
gate.  This module implements the classic Flajolet–Martin PCSA
cardinality sketch (Flajolet & Martin 1985, the ancestor of HLL) from
first principles on BOTH engines with md5-derived hashes and
integer-only bit arithmetic — bit-identical estimates, full oracle.

Why integer bit ops instead of HLL's leading-zero rank: the
least-significant set/zero bit is extractable exactly (``x & -x`` and
``~b & (b+1)`` are powers of two, whose ``log2`` is exact in IEEE
doubles), while leading-zero counts via ``floor(log2(w))`` can straddle
the floor boundary differently per libm — a cross-engine hash-gate
hazard.

Scale shape: ONE map-combinable aggregate — per bucket, the ``bit_or``
of observed rank bits (``m`` longs of state per partition, merged by
``bit_or``) — the exact pattern a 100 TB cardinality count needs: no
shuffle of values, only the m-row sketch.  Contrast with exact
``count_distinct``, which shuffles every distinct value.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Flajolet–Martin bias correction constant (phi from the 1985 paper).
FM_PHI = 0.77351

#: usable hash bits (60 = 15 hex digits of the md5, BIGINT-safe).
HASH_BITS = 60


def _hash60(col: Column) -> Column:
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast("long")


def _hash60_sql(col: str) -> str:
    digit = f"(strpos('0123456789abcdef', substr(md5(CAST({col} AS VARCHAR)), {{d}}, 1)) - 1)"
    return (
        "("
        + " + ".join(f"{digit.format(d=d + 1)} * {16 ** (14 - d)}" for d in range(15))
        + ")"
    )


def fm_count_distinct(
    df: DataFrame,
    value_col: Column | str,
    *,
    m: int = 256,
) -> DataFrame:
    """Flajolet–Martin PCSA cardinality estimate of the distinct values
    of ``value_col`` — returns one row ``(m, est_distinct)``.

    Each value hashes to 60 bits; the low ``log2(m)`` bits pick a bucket
    and the rank of the least-significant set bit of the remaining bits
    sets one bit in that bucket's BITMAP (``bit_or`` aggregate — the
    original PCSA register).  Per bucket, ``R`` = index of the lowest
    UNSET bitmap bit; estimate = ``m / phi * 2^(mean R)``, rounded to a
    long.  ``m`` must be a power of two.  NULLs are ignored
    (count-distinct semantics).  Buckets no value hashed into contribute
    ``R = 0`` — the ``sum/m`` mean handles them without densification.
    """
    return fm_estimate(fm_bitmaps(df, value_col, m=m), m=m)


def fm_bitmaps(
    df: DataFrame,
    value_col: Column | str,
    *,
    m: int = 256,
) -> DataFrame:
    """The mergeable FM state: per-bucket rank bitmaps ``(bucket,
    bitmap)``.  Two states over any data splits merge by ``bit_or`` per
    bucket — order- and partition-independent, which is what makes the
    sketch exactly replayable in incremental/streaming settings."""
    if m & (m - 1):
        raise ValueError(f"m={m} must be a power of two")
    col = F.col(value_col) if isinstance(value_col, str) else value_col
    base = df.select(_hash60(col).alias("__h")).filter(F.col("__h").isNotNull())
    base = base.select(
        (F.col("__h") % m).alias("bucket"),
        # integer division: `/` is DOUBLE division in Spark, and a 53-bit
        # mantissa silently mangles the low bits of a 60-bit hash
        F.expr(f"__h DIV {m}").alias("__w"),
    )
    # the least-significant set bit of w IS the bitmap bit to set (an
    # exact power of two — no rank/shift round-trip needed); an all-zero
    # w observes the top rank's bit.
    bit = F.expr(
        f"CASE WHEN __w = 0 THEN CAST(1 AS BIGINT) << {HASH_BITS}"
        " ELSE __w & -__w END"
    )
    return (
        base.select("bucket", bit.alias("__bit"))
        .groupBy("bucket")
        .agg(F.expr("bit_or(__bit)").alias("bitmap"))
    )


def fm_estimate(bitmaps: DataFrame, *, m: int = 256) -> DataFrame:
    """Estimate from a ``(bucket, bitmap)`` state frame (possibly holding
    multiple mergeable rows per bucket, e.g. appended streaming batches —
    they are ``bit_or``-combined first)."""
    merged = bitmaps.groupBy("bucket").agg(F.expr("bit_or(bitmap)").alias("__bm"))
    # lowest unset bit of the bitmap, as an exact power of two
    low_zero = F.expr("CAST((~__bm) & (__bm + 1) AS DOUBLE)")
    r = F.log2(low_zero).cast("int").alias("__r")
    est = (
        F.round(F.lit(m / FM_PHI) * F.pow(F.lit(2.0), F.sum("__r") / F.lit(float(m))))
        .cast("long")
        .alias("est_distinct")
    )
    return merged.select("bucket", r).agg(F.lit(m).alias("m"), est)


def fm_count_distinct_sql(table: str, value_expr: str, *, m: int = 256) -> str:
    """DuckDB twin of :func:`fm_count_distinct` — same md5 hash, same
    integer bit arithmetic, same rounding."""
    if m & (m - 1):
        raise ValueError(f"m={m} must be a power of two")
    h = _hash60_sql(value_expr)
    return f"""
        WITH __h AS (
            SELECT CAST({h} AS BIGINT) AS h FROM {table}
            WHERE {value_expr} IS NOT NULL
        ),
        __bw AS (
            SELECT h % {m} AS b, CAST(h // {m} AS BIGINT) AS w FROM __h
        ),
        __bits AS (
            SELECT b,
                   CASE WHEN w = 0 THEN CAST(1 AS BIGINT) << {HASH_BITS}
                        ELSE w & -w
                   END AS bit
            FROM __bw
        ),
        __bm AS (SELECT b, bit_or(bit) AS bm FROM __bits GROUP BY 1),
        __r AS (
            SELECT b, CAST(log2(CAST((~bm) & (bm + 1) AS DOUBLE)) AS INT) AS r
            FROM __bm
        )
        SELECT {m} AS m,
               CAST(round({m} / {FM_PHI} * pow(2.0, sum(r) / {float(m)})) AS BIGINT)
               AS est_distinct
        FROM __r
    """


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) sketch: mergeable distinct + set-operation estimates
# ---------------------------------------------------------------------------


def kmv_sketch(
    df: DataFrame,
    value_col: Column | str,
    *,
    k: int = 128,
) -> DataFrame:
    """K-minimum-values sketch (Bar-Yossef et al. 2002): the ``k``
    smallest distinct 60-bit hashes of the value set, as one row
    ``(hashes array<long>)``.

    Fully deterministic (md5 order statistics — no RNG, no partitioning
    sensitivity) and MERGEABLE: the union sketch of two sets is the k
    smallest of the concatenated sketches, which is how multi-table /
    multi-day sketches compose without touching raw data again.

    Scale shape: distinct-hash then ``TakeOrdered``-style global k-min —
    per-partition top-k heaps, only ``k`` longs cross the wire.
    """
    col = F.col(value_col) if isinstance(value_col, str) else value_col
    hashes = (
        df.select(_hash60(col).alias("__h"))
        .filter(F.col("__h").isNotNull())
        .distinct()
        .orderBy("__h")
        .limit(k)
    )
    return hashes.agg(F.sort_array(F.collect_list("__h")).alias("hashes"))


def kmv_estimates(
    sketch_a: DataFrame,
    sketch_b: DataFrame,
    *,
    k: int = 128,
) -> DataFrame:
    """Distinct/union/intersection/Jaccard estimates from two KMV
    sketches — one row ``(est_a, est_b, est_union, est_jaccard)``.

    Union: k smallest of the merged hash lists, estimate ``(k-1) *
    2^60 / kth_min`` (when a side has fewer than k distinct values its
    sketch IS the exact hash set, and the estimate degrades gracefully to
    near-exact).  Jaccard: fraction of the union sketch's hashes present
    in both input sketches (the standard KMV intersection trick) —
    everything array ops on two 1-row frames, no data motion.
    """
    two_sixty = float(1 << HASH_BITS)

    def est(h: Column) -> Column:
        n = F.size(h)
        return F.when(n < k, n.cast("double")).otherwise(
            F.round(F.lit(k - 1) * F.lit(two_sixty) / F.element_at(h, k), 1)
        )

    a = sketch_a.select(F.col("hashes").alias("ha"))
    b = sketch_b.select(F.col("hashes").alias("hb"))
    joined = a.crossJoin(b)
    union_full = F.array_sort(F.array_union(F.col("ha"), F.col("hb")))
    union_k = F.slice(union_full, 1, k)
    both = F.size(
        F.filter(
            union_k,
            lambda x: F.array_contains(F.col("ha"), x)
            & F.array_contains(F.col("hb"), x),
        )
    )
    return joined.select(
        est(F.col("ha")).alias("est_a"),
        est(F.col("hb")).alias("est_b"),
        est(union_k).alias("est_union"),
        F.when(
            F.size(union_k) > 0, F.round(both / F.size(union_k), 4)
        ).alias("est_jaccard"),
    )


def kmv_sketch_sql(table: str, value_expr: str, *, k: int = 128) -> str:
    """DuckDB twin of :func:`kmv_sketch`."""
    h = _hash60_sql(value_expr)
    return f"""
        SELECT coalesce(list_sort(list(h)), []) AS hashes FROM (
            SELECT DISTINCT CAST({h} AS BIGINT) AS h FROM {table}
            WHERE {value_expr} IS NOT NULL
            ORDER BY h LIMIT {k}
        )
    """


def kmv_estimates_sql(sketch_a_sql: str, sketch_b_sql: str, *, k: int = 128) -> str:
    """DuckDB twin of :func:`kmv_estimates` over two sketch subqueries."""
    two_sixty = float(1 << HASH_BITS)

    def est(h: str) -> str:
        return (
            f"CASE WHEN len({h}) < {k} THEN CAST(len({h}) AS DOUBLE)"
            f" ELSE round({k - 1} * {two_sixty} / ({h})[{k}], 1) END"
        )

    return f"""
        WITH a AS (SELECT hashes AS ha FROM ({sketch_a_sql})),
        b AS (SELECT hashes AS hb FROM ({sketch_b_sql})),
        j AS (
            SELECT ha, hb,
                   (list_sort(list_distinct(list_concat(ha, hb))))[1:{k}] AS uk
            FROM a CROSS JOIN b
        )
        SELECT {est('ha')} AS est_a,
               {est('hb')} AS est_b,
               {est('uk')} AS est_union,
               CASE WHEN len(uk) > 0 THEN
                   round(CAST(len(list_filter(uk, x -> list_contains(ha, x)
                         AND list_contains(hb, x))) AS DOUBLE) / len(uk), 4)
               END AS est_jaccard
        FROM j
    """


# ---------------------------------------------------------------------------
# Deterministic Bloom filter: reproducible membership screening
# ---------------------------------------------------------------------------

#: bits per filter word — 63, not 64, so every bit mask is an exact
#: power of two representable as a positive BIGINT via ``pow(2.0, b)``
#: (no shift-by-column needed, identical on both engines).
BLOOM_WORD = 63


def _bloom_pos(v: Column, i: int, n_bits: int) -> Column:
    return _hash60(F.concat(F.lit(f"{i}:"), v)) % n_bits


def _bloom_pos_sql(v: str, i: int, n_bits: int) -> str:
    return f"({_hash60_sql(chr(39) + f'{i}:' + chr(39) + ' || ' + v)} % {n_bits})"


def bloom_build(
    df: DataFrame,
    value_col: Column | str,
    *,
    n_bits: int = 4096,
    n_hashes: int = 4,
) -> DataFrame:
    """Build a Bloom filter over the distinct values of ``value_col`` —
    returned as ``(word_idx, bits)`` rows (63-bit words; absent words are
    all-zero).

    Spark's built-in bloom machinery (``bloomFilter``, runtime bloom
    joins) uses JVM hashing and is not reproducible outside the JVM; this
    one derives its ``n_hashes`` bit positions from ``md5(i || ':' ||
    value)``, so any engine — or a later session — rebuilds the exact
    same filter.  Build is one explode (``n_hashes`` rows per value) +
    one map-combinable ``bit_or`` groupBy whose output is bounded by
    ``n_bits/63`` words: ship THAT as the broadcast side instead of the
    value set itself — the membership-screening pattern ahead of an
    expensive join (contamination, blocklists) at 100 TB.
    """
    col = F.col(value_col) if isinstance(value_col, str) else value_col
    base = df.select(col.cast("string").alias("__v")).filter(F.col("__v").isNotNull())
    pos = F.explode(
        F.array(*[_bloom_pos(F.col("__v"), i, n_bits) for i in range(n_hashes)])
    ).alias("__p")
    return (
        base.select(pos)
        .select(
            F.floor(F.col("__p") / BLOOM_WORD).cast("long").alias("word_idx"),
            F.pow(F.lit(2.0), (F.col("__p") % BLOOM_WORD).cast("int"))
            .cast("long")
            .alias("__bit"),
        )
        .groupBy("word_idx")
        .agg(F.expr("bit_or(__bit)").alias("bits"))
    )


class BloomSaturationWarning(UserWarning):
    """An in-use Bloom bitmap is past its healthy operating point."""


class BloomSaturationError(RuntimeError):
    """An in-use Bloom bitmap is saturated enough to silently drop a
    large fraction of genuinely-fresh values."""


def suggest_bloom_bits(expected_values: int, *, n_hashes: int = 4) -> int:
    """Bitmap size (power of two) for ``expected_values`` distinct values:
    the ~10-bits-per-value rule the 8M-doc streambench rehearsal
    validated (BASELINE.md "Second streaming-history point").  At 10
    bits/value with k=4 hashes the filled filter sits at ~33% set bits
    and a ~1% per-probe false-positive rate; the under-sized rehearsal
    bitmap (2 bits/value) reached ~85% set bits and silently dropped
    ~3/4 of fresh documents.
    """
    if expected_values <= 0:
        raise ValueError("expected_values must be positive")
    target = max(4096, 10 * expected_values * max(1, n_hashes) // 4)
    return 1 << (target - 1).bit_length()


def bloom_saturation(bloom: DataFrame, *, n_bits: int) -> float:
    """Set-bit fraction of a :func:`bloom_build` words frame — ONE
    aggregate over ≤ ``n_bits/63`` word rows (absent words are all-zero),
    so the check costs nothing next to the probe it protects."""
    row = bloom.selectExpr("sum(bit_count(bits)) AS set_bits").collect()[0]
    return (row["set_bits"] or 0) / n_bits


def check_bloom_saturation(
    bloom: DataFrame,
    *,
    n_bits: int,
    n_hashes: int = 4,
    warn_at: float = 0.30,
    refuse_at: float = 0.60,
    override: bool = False,
    context: str = "bloom filter",
) -> float:
    """Guard a persistent Bloom bitmap against silent over-dropping.

    Saturation is the quiet failure mode of every bounded-state bloom
    tier: the bitmap keeps ANSWERING as it fills, but the per-probe
    false-positive rate is ``saturation**n_hashes`` — the r11.5
    streambench rehearsal measured an under-sized bitmap (~85% set bits,
    ~52% per-band fp) keeping only ~280 of ~2000 genuinely-fresh
    documents, with no error anywhere.  This makes the contract
    executable instead of a docstring: warn past ``warn_at`` (a
    correctly-sized filter reaches ~33% at design capacity — the warning
    is the "plan the resize now" signal), refuse past ``refuse_at``
    (≈13% fp at k=4 and climbing fast) unless ``override`` says the
    caller accepts the drop rate.  Returns the measured saturation.
    """
    import warnings

    sat = bloom_saturation(bloom, n_bits=n_bits)
    fp = sat**n_hashes
    if sat >= refuse_at and not override:
        raise BloomSaturationError(
            f"{context}: {sat:.0%} of {n_bits} bits set — ~{fp:.0%} of "
            f"fresh values would be silently dropped as presumed-seen. "
            f"Rebuild with n_bits >= suggest_bloom_bits(expected_values) "
            f"or pass override=True to accept the drop rate."
        )
    if sat >= warn_at:
        warnings.warn(
            f"{context}: {sat:.0%} of {n_bits} bits set (~{fp:.1%} "
            f"false-positive rate) — at or past design capacity; size "
            f"the next rebuild with suggest_bloom_bits().",
            BloomSaturationWarning,
            stacklevel=2,
        )
    return sat


def bloom_probe(
    df: DataFrame,
    bloom: DataFrame,
    value_col: Column | str,
    *,
    n_bits: int = 4096,
    n_hashes: int = 4,
    out_col: str = "maybe_member",
) -> DataFrame:
    """Probe a :func:`bloom_build` filter: appends boolean ``out_col`` —
    true iff ALL hash bits are set (possibly member); false is a
    DEFINITE non-member.  Small filters (≤4096 set words) collect into a
    literal map, so the probe is pure codegen column ops: no join, no
    shuffle — how a broadcast bloom screen runs.  Larger filters (the
    1<<22-bit crawl-frontier bitmaps and up) delegate to
    :func:`bloom_probe_join` — a tens-of-thousands-entry ``create_map``
    literal makes Catalyst choke on the expression tree, while the
    broadcast words-frame join stays a bounded hash join (verified
    bit-identical)."""
    words = {int(r["word_idx"]): int(r["bits"]) for r in bloom.collect()}
    if len(words) > 4096:
        spark = df.sparkSession
        words_df = spark.createDataFrame(
            list(words.items()), "word_idx long, bits long"
        )
        return bloom_probe_join(
            df, words_df, value_col,
            n_bits=n_bits, n_hashes=n_hashes, out_col=out_col,
        )
    col = F.col(value_col) if isinstance(value_col, str) else value_col
    v = col.cast("string")
    if not words:
        # NULL probes stay NULL (matching the non-empty path, where the
        # cast/hash chain propagates NULL, and the SQL twin's bool_and)
        return df.withColumn(out_col, F.when(v.isNotNull(), F.lit(False)))
    wmap = F.create_map(
        *[F.lit(x).cast("long") for kv in words.items() for x in kv]
    )
    test = F.lit(True)
    for i in range(n_hashes):
        p = _bloom_pos(v, i, n_bits)
        word = F.coalesce(
            F.element_at(wmap, F.floor(p / BLOOM_WORD).cast("long")),
            F.lit(0).cast("long"),
        )
        mask = F.pow(F.lit(2.0), (p % BLOOM_WORD).cast("int")).cast("long")
        test = test & (word.bitwiseAND(mask) != 0)
    return df.withColumn(out_col, test)


def bloom_probe_join(
    df: DataFrame,
    bloom: DataFrame,
    value_col: Column | str,
    *,
    n_bits: int,
    n_hashes: int = 4,
    out_col: str = "maybe_member",
) -> DataFrame:
    """Join-based twin of :func:`bloom_probe` for LARGE filters: the
    literal-map probe materializes every bitmap word into one driver-side
    expression — fine at 4096 bits, pathological at the 2^26-bit filters
    a long-running ingest needs (a million-entry ``create_map``).  This
    variant explodes the probe values' hash positions and joins them
    against the words frame (``word_idx`` keyed, broadcast-able at
    ≤ n_bits/63 rows ≈ 16 MB at 2^26 bits), then folds back per row:
    member iff ALL hash bits are set.  Same hashes, same words, same
    semantics — shape chosen by filter size."""
    col = F.col(value_col) if isinstance(value_col, str) else value_col
    others = df.columns
    probes = (
        df.withColumn("__v", col.cast("string"))
        .withColumn("__row", F.monotonically_increasing_id())
        .withColumn(
            "__p",
            F.explode(
                F.array(
                    *[_bloom_pos(F.col("__v"), i, n_bits) for i in range(n_hashes)]
                )
            ),
        )
        .withColumn("word_idx", F.floor(F.col("__p") / BLOOM_WORD).cast("long"))
        .withColumn(
            "__mask",
            F.pow(F.lit(2.0), (F.col("__p") % BLOOM_WORD).cast("int")).cast("long"),
        )
    )
    hit = (
        probes.join(F.broadcast(bloom), "word_idx", "left")
        .withColumn(
            "__hit",
            F.coalesce(F.col("bits"), F.lit(0).cast("long"))
            .bitwiseAND(F.col("__mask")) != 0,
        )
        .groupBy("__row", "__v", *others)
        .agg(F.min(F.col("__hit").cast("int")).alias("__all"))
        .withColumn(
            out_col,
            F.when(F.col("__v").isNotNull(), F.col("__all") == 1),
        )
        .drop("__row", "__all", "__v")
    )
    return hit


def bloom_membership_sql(
    build_table: str,
    build_expr: str,
    probe_table: str,
    probe_id: str,
    probe_expr: str,
    *,
    n_bits: int = 4096,
    n_hashes: int = 4,
) -> str:
    """DuckDB replay of build-then-probe: returns ``(probe_id,
    maybe_member)`` per probe row — same hashes, words, and bit tests."""
    build_pos = " UNION ALL ".join(
        f"SELECT {_bloom_pos_sql('v', i, n_bits)} AS p FROM __vals"
        for i in range(n_hashes)
    )
    probe_checks = []
    for i in range(n_hashes):
        pos = _bloom_pos_sql("v", i, n_bits)
        probe_checks.append(
            f"SELECT id, v, {i} AS hi, CAST(floor(({pos}) / {BLOOM_WORD}) AS BIGINT) AS w,"
            f" CAST(pow(2.0, ({pos}) % {BLOOM_WORD}) AS BIGINT) AS mask FROM __probe"
        )
    probe_pos = " UNION ALL ".join(probe_checks)
    return f"""
        WITH __vals AS (
            SELECT DISTINCT CAST({build_expr} AS VARCHAR) AS v FROM {build_table}
            WHERE {build_expr} IS NOT NULL
        ),
        __pos AS ({build_pos}),
        __bloom AS (
            SELECT CAST(floor(p / {BLOOM_WORD}) AS BIGINT) AS w,
                   bit_or(CAST(pow(2.0, p % {BLOOM_WORD}) AS BIGINT)) AS bits
            FROM __pos GROUP BY 1
        ),
        __probe AS (
            -- NULL probe values stay (NULL membership), matching the Spark
            -- probe which appends a column without dropping rows
            SELECT {probe_id} AS id, CAST({probe_expr} AS VARCHAR) AS v
            FROM {probe_table}
        ),
        __checks AS ({probe_pos}),
        __tested AS (
            SELECT c.id, c.v, (coalesce(b.bits, 0) & c.mask) <> 0 AS hit
            FROM __checks c LEFT JOIN __bloom b ON c.w = b.w
        )
        SELECT id AS {probe_id}, bool_and(hit) AS maybe_member
        FROM __tested GROUP BY id, v
    """


# ---------------------------------------------------------------------------
# Count-min sketch: mergeable frequency estimation
# ---------------------------------------------------------------------------


def cms_build(
    df: DataFrame,
    value_col: Column | str,
    *,
    width: int = 1024,
    depth: int = 4,
) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005) over the value
    stream — returned as ``(row_idx, col_idx, cnt)`` cells (absent cells
    are zero).  Completes the sketch suite: FM/KMV answer "how many
    distinct", Bloom answers "is it a member", count-min answers "how
    often" — all deterministic md5 positions, unlike Spark's
    ``countMinSketch`` JVM hashing.

    Build is one explode (``depth`` rows per occurrence) + a
    map-combinable sum groupBy bounded by ``depth × width`` cells.  Cells
    MERGE by addition (commutative monoid — multi-day sketches add), and
    the estimate ``min_i cells[i][h_i(v)]`` over-counts only (one-sided
    error ≤ e·N/width with prob 1−e^−depth).
    """
    col = F.col(value_col) if isinstance(value_col, str) else value_col
    base = df.select(col.cast("string").alias("__v")).filter(F.col("__v").isNotNull())
    pos = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).alias("r"),
                    (_hash60(F.concat(F.lit(f"{i}:"), F.col("__v"))) % width).alias("c"),
                )
                for i in range(depth)
            ]
        )
    ).alias("__p")
    return (
        base.select(pos)
        .select(F.col("__p.r").alias("row_idx"), F.col("__p.c").alias("col_idx"))
        .groupBy("row_idx", "col_idx")
        .agg(F.count("*").alias("cnt"))
    )


def cms_query(
    df: DataFrame,
    cms: DataFrame,
    value_col: Column | str,
    *,
    width: int = 1024,
    depth: int = 4,
    out_col: str = "est_count",
) -> DataFrame:
    """Point-frequency estimates from a :func:`cms_build` sketch:
    appends ``out_col`` = min over the ``depth`` hashed cells.  The
    sketch (≤ depth×width rows) is collected into a literal map, so the
    probe is pure codegen — no join, no shuffle."""
    cells = {
        (int(r["row_idx"]), int(r["col_idx"])): int(r["cnt"]) for r in cms.collect()
    }
    col = F.col(value_col) if isinstance(value_col, str) else value_col
    v = col.cast("string")
    if not cells:
        return df.withColumn(out_col, F.lit(0).cast("long"))
    maps = []
    for i in range(depth):
        row_cells = {c: n for (r, c), n in cells.items() if r == i}
        if row_cells:
            maps.append(
                F.create_map(
                    *[F.lit(x).cast("long") for kv in row_cells.items() for x in kv]
                )
            )
        else:
            maps.append(None)
    est = None
    for i in range(depth):
        p = _hash60(F.concat(F.lit(f"{i}:"), v)) % width
        cell = (
            F.coalesce(F.element_at(maps[i], p), F.lit(0).cast("long"))
            if maps[i] is not None
            else F.lit(0).cast("long")
        )
        est = cell if est is None else F.least(est, cell)
    return df.withColumn(out_col, est)


def cms_estimates_sql(
    build_table: str,
    build_expr: str,
    probe_table: str,
    probe_id: str,
    probe_expr: str,
    *,
    width: int = 1024,
    depth: int = 4,
) -> str:
    """DuckDB replay of build-then-query: ``(probe_id, est_count)``."""
    build_pos = " UNION ALL ".join(
        f"SELECT {i} AS r,"
        f" ({_hash60_sql(chr(39) + f'{i}:' + chr(39) + ' || v')} % {width}) AS c"
        f" FROM __vals"
        for i in range(depth)
    )
    probe_pos = " UNION ALL ".join(
        f"SELECT id, v, {i} AS r,"
        f" ({_hash60_sql(chr(39) + f'{i}:' + chr(39) + ' || v')} % {width}) AS c"
        f" FROM __probe"
        for i in range(depth)
    )
    return f"""
        WITH __vals AS (
            SELECT CAST({build_expr} AS VARCHAR) AS v FROM {build_table}
            WHERE {build_expr} IS NOT NULL
        ),
        __pos AS ({build_pos}),
        __cells AS (SELECT r, c, count(*) AS cnt FROM __pos GROUP BY 1, 2),
        __probe AS (
            -- NULL probe values stay, matching the Spark probe (est 0 via
            -- the coalesce on both engines)
            SELECT {probe_id} AS id, CAST({probe_expr} AS VARCHAR) AS v
            FROM {probe_table}
        ),
        __pp AS ({probe_pos}),
        __joined AS (
            SELECT p.id, p.v, coalesce(cl.cnt, 0) AS cnt
            FROM __pp p LEFT JOIN __cells cl ON p.r = cl.r AND p.c = cl.c
        )
        SELECT id AS {probe_id}, CAST(min(cnt) AS BIGINT) AS est_count
        FROM __joined GROUP BY id, v
    """
