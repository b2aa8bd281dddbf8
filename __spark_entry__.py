"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes one entry per implemented operator class from
SURVEY.md §2 (+ the beyond-reference LLM-data-pipeline operators);
``oracle_sql()`` gives the DuckDB-equivalent SQL for each.  Numeric
conventions for engine-exact parity:

- money/value sums go through ``DECIMAL(18,4)`` (exact arithmetic on both
  engines), then round + cast to double for a stable schema;
- counts are BIGINT on both sides (DuckDB ``SUM(int)`` would be HUGEINT —
  always cast);
- ranks from ``row_number`` are cast to INT in SQL (DuckDB default BIGINT);
- timestamps are formatted to strings before hashing;
- text/dedup/ANN expressions are generated from the SAME definitions on
  both sides (see ``architxt_spark.functions``), md5-based hashes included.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from architxt_spark.functions import ann, dedup, sampling, search
from architxt_spark.functions import text as T


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet carries TIMESTAMP(NANOS) which Spark's parquet reader
    rejects by default; read nanos as long and convert exactly (integer
    `div`, no double round-trip).  Session TZ pinned to UTC so formatted
    timestamps match DuckDB's naive timestamps."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    ts_type = dict(ev.dtypes).get("ts")
    if ts_type == "bigint":
        ev = ev.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_type == "timestamp_ntz":
        # naive micros == UTC wall clock; session TZ is pinned to UTC above,
        # so the cast is value-preserving and unix_micros/window work.
        ev = ev.withColumn("ts", F.col("ts").cast("timestamp"))
    return ev


def _dec(col: str) -> F.Column:
    return F.col(col).cast("decimal(18,4)")


# ---------------------------------------------------------------------------
# classical relational operators (SURVEY §2.8 checklist)
# ---------------------------------------------------------------------------


def q_scan_filter_project(spark: SparkSession, sf: str) -> DataFrame:
    """Scan + filter + projection — pushed down to the parquet scan."""
    li = _t(spark, sf, "lineitem")
    return li.filter(
        (F.col("l_quantity") > 45) & (F.col("l_shipdate") >= "1997-01-01")
    ).select("l_orderkey", "l_linenumber", "l_quantity")


def q_agg_pricing_summary(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q1 flavor: two-key groupBy with exact decimal aggregates."""
    li = _t(spark, sf, "lineitem")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum(_dec("l_quantity")), 2).cast("double").alias("sum_qty"),
            F.round(F.sum(_dec("l_extendedprice")), 2).cast("double").alias("sum_base_price"),
            F.round(
                F.sum(_dec("l_extendedprice") * (F.lit(1).cast("decimal(18,4)") - _dec("l_discount"))), 2
            ).cast("double").alias("sum_disc_price"),
            F.round(F.avg(_dec("l_quantity")), 4).cast("double").alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
    )


def q_join_revenue_by_nation(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q5 flavor: 5-way join with broadcast dims, revenue per nation."""
    li = _t(spark, sf, "lineitem").select("l_orderkey", "l_extendedprice", "l_discount")
    orders = _t(spark, sf, "orders").select("o_orderkey", "o_custkey")
    cust = _t(spark, sf, "customer").select("c_custkey", "c_nationkey")
    nation = _t(spark, sf, "nation").select("n_nationkey", "n_name", "n_regionkey")
    region = _t(spark, sf, "region").select("r_regionkey", "r_name")
    revenue = F.sum(_dec("l_extendedprice") * (F.lit(1).cast("decimal(18,4)") - _dec("l_discount")))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .filter(F.col("r_name") == "EUROPE")
        .groupBy("n_name")
        .agg(F.round(revenue, 2).cast("double").alias("revenue"))
    )


def q_join_filtered_customers(spark: SparkSession, sf: str) -> DataFrame:
    """LEFT ANTI + LEFT SEMI in one tagged frame: customers never
    referenced by an order (the loader's ``read_unreferenced_table``
    anti-join semantics) and customers with ≥1 high-value order."""
    cust = _t(spark, sf, "customer")
    orders = _t(spark, sf, "orders").select("o_custkey")
    anti = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select(
            F.lit("anti").alias("variant"),
            "c_custkey",
            F.col("c_name").alias("detail"),
        )
    )
    big = _t(spark, sf, "orders").filter(F.col("o_totalprice") > 100000).select("o_custkey")
    semi = (
        cust.join(big, cust.c_custkey == big.o_custkey, "left_semi")
        .select(
            F.lit("semi").alias("variant"),
            "c_custkey",
            F.col("c_mktsegment").alias("detail"),
        )
    )
    return anti.unionByName(semi)


def q_window_orders(spark: SparkSession, sf: str) -> DataFrame:
    """Both window classes in one pass — ranking (row_number over a price
    ordering) and an ordered running frame (cumulative decimal sum over
    the date ordering) — filtered to each customer's top-3 by price.  The
    running total is computed over the FULL partition before the rank
    filter, so the unbounded-preceding frame is exercised end to end."""
    orders = _t(spark, sf, "orders")
    w_rank = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    w_run = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            F.row_number().over(w_rank).alias("rank"),
            F.round(F.sum(_dec("o_totalprice")).over(w_run), 2)
            .cast("double")
            .alias("running_total"),
        )
        .filter(F.col("rank") <= 3)
    )


def q_sort_limit_top_orders(spark: SparkSession, sf: str) -> DataFrame:
    """Global top-10 with deterministic tie-break (sort + limit)."""
    orders = _t(spark, sf, "orders")
    return (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", F.round(_dec("o_totalprice"), 2).cast("double").alias("o_totalprice"))
    )


def q_setop_nations_cust_minus_supp(spark: SparkSession, sf: str) -> DataFrame:
    """Set difference: nations with customers EXCEPT nations with suppliers."""
    cust_nations = _t(spark, sf, "customer").select(F.col("c_nationkey").alias("nationkey")).distinct()
    supp_nations = _t(spark, sf, "supplier").select(F.col("s_nationkey").alias("nationkey")).distinct()
    return cust_nations.exceptAll(supp_nations).distinct()


def q_grouping_orders(spark: SparkSession, sf: str) -> DataFrame:
    """The whole grouping-sets family in one tagged frame: ROLLUP, CUBE,
    and explicit GROUPING SETS (Spark 4 ``DataFrame.groupingSets``) over
    (status, priority) with count + exact decimal sum each."""
    orders = _t(spark, sf, "orders")
    aggs = [
        F.count("*").alias("n"),
        F.round(F.sum(_dec("o_totalprice")), 2).cast("double").alias("total"),
    ]
    rollup = orders.rollup("o_orderstatus", "o_orderpriority").agg(*aggs)
    cube = orders.cube("o_orderstatus", "o_orderpriority").agg(*aggs)
    gsets = orders.groupingSets(
        [["o_orderstatus"], ["o_orderpriority"], []],
        "o_orderstatus",
        "o_orderpriority",
    ).agg(*aggs)
    return (
        rollup.select(F.lit("rollup").alias("variant"), "*")
        .unionByName(cube.select(F.lit("cube").alias("variant"), "*"))
        .unionByName(gsets.select(F.lit("gsets").alias("variant"), "*"))
    )


def q_percentile_orders(spark: SparkSession, sf: str) -> DataFrame:
    """Exact interpolated percentiles (median + p90) of order value per
    priority — single sort-based aggregate, no approximation."""
    orders = _t(spark, sf, "orders")
    pct = F.expr("percentile(CAST(o_totalprice AS DOUBLE), array(0.5D, 0.9D))")
    return orders.groupBy("o_orderpriority").agg(
        F.round(pct[0], 4).alias("p50"),
        F.round(pct[1], 4).alias("p90"),
        F.count("*").alias("n"),
    )


def q_asof_events(spark: SparkSession, sf: str) -> DataFrame:
    """Both AS-OF directions (custom operator — union + carry-forward
    window, one shuffle on the key) in one frame: each signup attached to
    the user's most recent purchase at-or-before it (backward) AND the
    next purchase within 7 days (forward + tolerance, pandas merge_asof
    parity)."""
    from architxt_spark.operators.temporal import asof_join

    ev = _events(spark, sf)
    signups = ev.filter(F.col("event_type") == "signup").select("user_id", "event_id", "ts")
    purchases = ev.filter(F.col("event_type") == "purchase").select("user_id", "event_id", "ts")
    back = asof_join(signups, purchases, by=["user_id"], right_cols=["event_id"]).select(
        "user_id", "event_id", F.col("event_id_right").alias("prev_purchase")
    )
    fwd = asof_join(
        signups, purchases, by=["user_id"], right_cols=["event_id"],
        direction="forward", tolerance_seconds=7 * 86400,
    ).select("user_id", "event_id", F.col("event_id_right").alias("next_purchase"))
    return back.join(fwd, ["user_id", "event_id"])


def _await_stream(query, timeout: int = 300) -> None:
    """availableNow still races a slow host: comparing the memory sink while
    the stream is mid-flight would surface as a baffling data mismatch, so a
    timeout fails loudly instead."""
    if not query.awaitTermination(timeout):
        query.stop()
        raise TimeoutError(f"stream {query.name!r} did not finish in {timeout}s")


def q_events_rollup_streaming(spark: SparkSession, sf: str) -> DataFrame:
    """Structured Streaming end-to-end under the correctness gate: the
    windowed rollup runs as a REAL stream (file source, availableNow
    trigger, memory sink, complete mode so every window is emitted at
    stream end) and must hash-match the batch-equivalent DuckDB rollup."""
    from architxt_spark.streaming.events import read_event_stream, stream_hourly_rollup

    name = "arch_stream_rollup"
    for q in spark.streams.active:
        if q.name == name:
            q.stop()
    stream = read_event_stream(spark, sf, glob="events.parquet").withColumn(
        "value", F.col("value").cast("decimal(18,6)")
    )
    query = (
        stream_hourly_rollup(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    _await_stream(query)
    return spark.table(name).select(
        F.date_format("hour_start", "yyyy-MM-dd HH:mm:ss").alias("hour_start"),
        "event_type",
        "n_events",
        F.round(F.col("value_sum"), 2).cast("double").alias("value_sum"),
    )


def q_events_sessionize_streaming(spark: SparkSession, sf: str) -> DataFrame:
    """CUSTOM STATEFUL streaming under the FULL hash gate: gap-based
    sessionization via applyInPandasWithState over a real stream.  With
    availableNow the whole file is one micro-batch, so every session
    closed by an in-batch gap emits deterministically; each user's
    trailing open session stays in state (its event-time timeout never
    fires once the stream ends) — exactly the unbounded-stream semantics.
    The emitted set is therefore SQL-expressible after all: the batch
    sessionization MINUS each user's last (still-open) session, which the
    oracle states with a QUALIFY row_number() DESC > 1 filter."""
    from architxt_spark.streaming.events import read_event_stream, stream_sessionize

    name = "arch_stream_sessionize"
    for q in spark.streams.active:
        if q.name == name:
            q.stop()
    stream = read_event_stream(spark, sf, glob="events.parquet")
    query = (
        stream_sessionize(stream, gap_minutes=30)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    _await_stream(query)
    return spark.table(name).select(
        "user_id",
        F.date_format("session_start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        F.date_format("session_end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
        "n_events",
    )


def q_stream_minhash_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Incremental cross-batch near-dup under the FULL hash gate: the
    foreachBatch stream (``streaming/corpus.py``) filters each micro-batch
    against the persistent LSH band index.  Determinism: the documents
    table is split into two files (even doc_ids, then odd) and the stream
    is run twice against the SAME checkpoint — run 1 seeds the index from
    file A, run 2 (availableNow picks up only the new file) filters file B
    against A's surviving bands.  The oracle replays both batches in SQL
    over the identical md5 band keys."""
    from architxt_spark.streaming.corpus import stream_minhash_dedup

    return _two_batch_stream(spark, sf, stream_minhash_dedup)


def _two_batch_stream(
    spark: SparkSession,
    sf: str,
    stream_fn,
    *,
    cols: tuple[str, ...] = ("doc_id", "text"),
    schema: str = "doc_id long, text string",
) -> DataFrame:
    """Shared deterministic two-batch replay harness: even doc_ids stream
    first (seeding the persistent index), then odd ones; per-invocation
    tempfile scratch (hermetic, concurrent-driver safe — the out dir must
    outlive this call, read lazily)."""
    import tempfile

    scratch = tempfile.mkdtemp(prefix="architxt_stream_")
    src, index, out, ckpt = (f"{scratch}/{d}" for d in ("src", "index", "out", "ckpt"))

    docs = _t(spark, sf, "documents").select(*cols)
    for batch_filter in (F.col("doc_id") % 2 == 0, F.col("doc_id") % 2 == 1):
        docs.filter(batch_filter).coalesce(1).write.mode("append").parquet(src)
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        _await_stream(stream_fn(stream, index, out, ckpt))
    return spark.read.parquet(out).select("doc_id")


#: fixed per-stratum hash-key thresholds for the streaming token-budget
#: mixture leg of the stream_curate gate (literal so the DuckDB twin is
#: bit-exact; derive real ones with sampling.mixture_token_thresholds):
#: ~44% of en, ~25% of fr ship; de/es/zh drop entirely
STREAM_MIX_THRESHOLDS = {"en": 437_500, "fr": 250_000}


def q_stream_curate(spark: SparkSession, sf: str) -> DataFrame:
    """Streaming ingestion curation under the full hash gate: per
    micro-batch Gopher gate → eval-set DECONTAMINATION (r8: benchmark =
    the doc_id%37 slice; a contaminated record never ships and never
    seeds the band index) → incremental cross-batch near-dup against the
    persistent band index → token-budget MIXTURE gate (r10: fixed
    per-stratum sample_key thresholds decide what SHIPS; sampled-out
    docs still seed the index — `streaming/corpus.py` stream_curate) —
    same two-batch deterministic replay as stream_minhash_dedup; the
    oracle replays both batches over the pre-gated, pre-decontaminated
    table (valid because the decontam screen is a pure batch-independent
    row filter against a static benchmark) and applies the same
    threshold CASE over the shipped ids."""
    import tempfile

    from architxt_spark.streaming.corpus import stream_curate

    bench_path = tempfile.mkdtemp(prefix="architxt_bench_") + "/bench"
    _t(spark, sf, "documents").select("doc_id", "text").filter(
        F.col("doc_id") % 37 == 0
    ).write.parquet(bench_path)
    return _two_batch_stream(
        spark,
        sf,
        lambda stream, index, out, ckpt: stream_curate(
            stream, index, out, ckpt, decontaminate_path=bench_path,
            mixture_col="lang", mixture_thresholds=STREAM_MIX_THRESHOLDS,
        ),
        cols=("doc_id", "text", "lang"),
        schema="doc_id long, text string, lang string",
    )


def q_stream_url_seen(spark: SparkSession, sf: str) -> DataFrame:
    """Bounded-state streaming URL dedup under the full hash gate: two
    deterministic micro-batches (even doc_ids seed the Bloom bitmap, odd
    probe it); synthesized URLs collide across batches on
    source×(doc_id%40).  State is n_bits/63 longs regardless of stream
    length; the oracle replays the exact md5 bit positions, so even
    Bloom false positives reproduce identically
    (`streaming/corpus.py` stream_url_seen)."""
    import tempfile

    from architxt_spark.streaming.corpus import stream_url_seen

    scratch = tempfile.mkdtemp(prefix="architxt_urlseen_")
    src, bloom, out, ckpt = (f"{scratch}/{d}" for d in ("src", "bloom", "out", "ckpt"))
    docs = _t(spark, sf, "documents").select(
        "doc_id",
        F.concat(
            F.lit("http://"), F.col("source"), F.lit("/p"),
            (F.col("doc_id") % 40).cast("string"),
        ).alias("url"),
    )
    for batch_filter in (F.col("doc_id") % 2 == 0, F.col("doc_id") % 2 == 1):
        docs.filter(batch_filter).coalesce(1).write.mode("append").parquet(src)
        stream = (
            spark.readStream.schema("doc_id long, url string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        _await_stream(stream_url_seen(stream, bloom, out, ckpt, n_bits=4096))
    return spark.read.parquet(out).select("url", "doc_id")


def q_join_salted_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """Salted equi-join (operators/skew.py): lineitem joined to orders with
    the left side's keys spread over 16 salts and the right replicated to
    meet them — semantically identical to the plain join, so the oracle is
    the unsalted SQL.  The salt derives from the stable line id, so
    retries are deterministic."""
    from architxt_spark.operators.skew import salted_join

    li = _t(spark, sf, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice", "l_discount"
    )
    o = _t(spark, sf, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderstatus"
    )
    j = salted_join(li, o, "l_orderkey", n_salts=16, salt_by="l_linenumber")
    return j.groupBy("o_orderstatus").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
        F.count("*").alias("n_lines"),
    )


def q_retention_cohorts(spark: SparkSession, sf: str) -> DataFrame:
    """Weekly retention cohorts: users bucketed by signup week, counted by
    weeks-since-signup in which they had any later event.  Two aggs + one
    join; the cohort matrix is small by construction."""
    ev = _events(spark, sf)
    first = ev.filter(F.col("event_type") == "signup").groupBy("user_id").agg(
        F.min(F.date_trunc("week", F.col("ts"))).alias("cohort_week")
    )
    active = (
        ev.join(first, "user_id")
        .filter(F.col("ts") >= F.col("cohort_week"))
        .select(
            "user_id",
            "cohort_week",
            F.floor(
                (F.col("ts").cast("double") - F.col("cohort_week").cast("double")) / (7 * 86400)
            ).cast("long").alias("week_n"),
        )
        .distinct()
    )
    return active.groupBy("cohort_week", "week_n").agg(
        F.count("*").alias("n_users")
    )


def q_unpivot_orders(spark: SparkSession, sf: str) -> DataFrame:
    """Unpivot/melt (wide -> long): numeric order columns into
    (metric, value) rows, averaged per metric — the inverse of the
    extraction pivot, narrow transform + one agg exchange."""
    o = _t(spark, sf, "orders")
    long = o.unpivot(
        ["o_orderkey"],
        ["o_totalprice", "o_custkey"],
        "metric",
        "value",
    )
    return long.groupBy("metric").agg(
        F.round(F.avg("value"), 4).alias("avg_value"),
        F.count("*").alias("n"),
    )


def q_funnel_signup_view_purchase(spark: SparkSession, sf: str) -> DataFrame:
    """Ordered funnel: users reaching signup -> first view at-or-after it
    -> first purchase at-or-after that view.  Per-stage one groupBy(user)
    + one join — never a per-user event sort on the driver."""
    ev = _events(spark, sf)
    su = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("st"))
    )
    vi = (
        ev.filter(F.col("event_type") == "view")
        .join(su, "user_id")
        .filter(F.col("ts") >= F.col("st"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("vt"))
    )
    pu = (
        ev.filter(F.col("event_type") == "purchase")
        .join(vi, "user_id")
        .filter(F.col("ts") >= F.col("vt"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("pt"))
    )
    stages = (
        su.select(F.lit("1_signup").alias("stage"), "user_id")
        .unionByName(vi.select(F.lit("2_view").alias("stage"), "user_id"))
        .unionByName(pu.select(F.lit("3_purchase").alias("stage"), "user_id"))
    )
    return stages.groupBy("stage").agg(F.count("*").alias("n_users"))


def q_range_join_signup_clicks(spark: SparkSession, sf: str) -> DataFrame:
    """Point-in-interval range join: clicks landing in the hour after each
    signup, counted per signup."""
    from architxt_spark.operators.temporal import range_join

    ev = _events(spark, sf)
    signups = ev.filter(F.col("event_type") == "signup").select(
        "user_id",
        F.col("event_id").alias("signup_event"),
        F.col("ts").alias("start"),
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("end"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts")
    joined = range_join(clicks, signups, by=["user_id"], left_ts="ts")
    return joined.groupBy("signup_event").agg(F.count("*").alias("n_clicks"))


def q_string_funcs_parts(spark: SparkSession, sf: str) -> DataFrame:
    """String functions: regexp extraction, casing, length, edit distance."""
    part = _t(spark, sf, "part")
    return part.select(
        "p_partkey",
        F.upper(F.regexp_extract("p_name", r"^(\w+)", 1)).alias("first_word"),
        F.length("p_name").alias("name_len"),
        F.levenshtein("p_brand", "p_type").alias("brand_type_dist"),
    )


def q_date_math_orders(spark: SparkSession, sf: str) -> DataFrame:
    """Date functions: truncation, extraction, per-month rollup."""
    orders = _t(spark, sf, "orders")
    return (
        orders.select(
            F.year("o_orderdate").alias("yr"),
            F.month("o_orderdate").alias("mo"),
        )
        .groupBy("yr", "mo")
        .agg(F.count("*").alias("n_orders"))
    )


def q_json_props_events(spark: SparkSession, sf: str) -> DataFrame:
    """Semi-structured access: JSON field extraction + aggregation."""
    events = _events(spark, sf)
    return (
        events.select(
            "event_type",
            F.get_json_object("props", "$.k").cast("long").alias("k"),
        )
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("k").alias("k_sum"),
        )
    )


def q_distinct_parts_per_brand(spark: SparkSession, sf: str) -> DataFrame:
    """COUNT DISTINCT per group (exact)."""
    part = _t(spark, sf, "part")
    return part.groupBy("p_brand").agg(
        F.countDistinct("p_type").alias("n_types"),
        F.max("p_size").alias("max_size"),
    )


# ---------------------------------------------------------------------------
# meta-model pipeline (loader → schema induction → extraction)
# ---------------------------------------------------------------------------


def _nation_forest(spark: SparkSession, sf: str) -> DataFrame:
    from architxt_spark.sources import FK, read_relational

    tables = {
        "nation": _t(spark, sf, "nation"),
        "region": _t(spark, sf, "region"),
    }
    fks = [FK("nation", "n_regionkey", "region", "r_regionkey")]
    pks = {"nation": ["n_nationkey"], "region": ["r_regionkey"]}
    return read_relational(spark, tables, fks, pks)


def q_dataset_extract_nation(spark: SparkSession, sf: str) -> DataFrame:
    """Full loader round-trip THROUGH THE ASSOCIATION-TABLE BRANCH
    (r13 fold: ``parse_association_table``, reference
    ``loader/sql.py:188-231``): a synthetic pure-FK m-n table
    (nation↔region) becomes the only root, so every tree is a
    ``(ROOT (REL::nation<->region group_nation group_region))`` and the
    schema pivot extraction of the *nation* groups must still reproduce
    the source table exactly (FK cols excluded) — any entity loss or
    mis-grouping in the association collapse flips the hash."""
    from architxt_spark.plans import extract_group_dataset
    from architxt_spark.sources import FK, read_relational

    nation, region = _t(spark, sf, "nation"), _t(spark, sf, "region")
    link = nation.select(
        F.col("n_nationkey").alias("l_nkey"),
        (F.col("n_nationkey") % 5).alias("l_rkey"),
    )
    nodes = read_relational(
        spark,
        {"nation": nation, "region": region, "nation_region": link},
        [
            FK("nation", "n_regionkey", "region", "r_regionkey"),
            FK("nation_region", "l_nkey", "nation", "n_nationkey"),
            FK("nation_region", "l_rkey", "region", "r_regionkey"),
        ],
        {
            "nation": ["n_nationkey"],
            "region": ["r_regionkey"],
            "nation_region": ["l_nkey", "l_rkey"],
        },
    )
    # The loader's table schema already fixes the entity columns (nation
    # minus its FK), so the pivot takes explicit values: no distinct-values
    # job, no materialization barrier — the extraction is ONE job.
    entities = [c for c in nation.columns if c != "n_regionkey"]
    return extract_group_dataset(nodes, "nation", entities=entities)


def q_schema_groups_nation(spark: SparkSession, sf: str) -> DataFrame:
    """Schema induction output: inferred group → entity mapping, plus
    the schema-quality properties ``group_overlap`` (mean pairwise
    Jaccard of entity sets; nation/region are disjoint → 0) and
    ``group_balance_score`` (1 − σ/μ of entities-per-group; both groups
    carry 2 entities → 1) as tagged metric rows (r13 fold,
    plans/schema.py:174-192, reference ``schema.py:293-344``)."""
    from architxt_spark.plans import schema_from_forest

    nodes = _nation_forest(spark, sf)
    schema = schema_from_forest(nodes)
    rows = sorted(
        (g, e) for g, ents in schema.groups.items() for e in ents
    )
    rows.append(("__metric__:group_overlap", f"{schema.group_overlap:.6f}"))
    rows.append(
        ("__metric__:group_balance", f"{schema.group_balance_score:.6f}")
    )
    return spark.createDataFrame(rows, "group_name string, entity string")


def q_forest_stats_documents(spark: SparkSession, sf: str) -> DataFrame:
    """Forest inspector over row-tree-ified documents — computed on the
    forest AFTER a JSONL export → import round-trip (r13 fold:
    ``write_jsonl_forest``/``read_jsonl_forest``, trees.py:233,263 —
    any node/label/shape loss in the codec flips every census column),
    plus the grammar-census metrics ``num_productions`` (distinct
    (lhs, ordered-rhs) productions = the ROOT rule + one per distinct
    non-null column pattern) and ``unlabelled_ratio``
    (metrics.py:240-276)."""
    import shutil
    import tempfile

    from architxt_spark.metrics import forest_stats, num_productions, unlabelled_ratio
    from architxt_spark.sources.documents import row_trees
    from architxt_spark.trees import read_jsonl_forest, write_jsonl_forest

    docs = _t(spark, sf, "documents")
    nodes = row_trees(docs, "documents", ["doc_id"])
    tmp = tempfile.mkdtemp(prefix="forest_jsonl_")
    try:
        write_jsonl_forest(nodes, tmp)
        rt = read_jsonl_forest(spark, tmp)
        s = forest_stats(rt)
        n_prod = num_productions(rt)
        u_ratio = unlabelled_ratio(rt)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.createDataFrame(
        [(
            s["n_trees"], s["n_nodes"], s["n_entities"], s["n_groups"],
            s["max_depth"], round(float(s["avg_depth"]), 6), s["n_entity_labels"],
            n_prod, round(float(u_ratio), 6),
        )],
        "n_trees long, n_nodes long, n_entities long, n_groups long,"
        " max_depth int, avg_depth double, n_entity_labels long,"
        " n_productions long, ratio_unlabelled double",
    )


def q_metrics_customer(spark: SparkSession, sf: str) -> DataFrame:
    """The schema-quality metric family over the same customer projection,
    as (metric, value) rows: FD confidence (X → c_mktsegment),
    dependency_score (max FD confidence over each consequent),
    redundancy_score (τ=0, pair subsets), and (r13 fold) the clustering
    agreement pair ``cluster_ami`` / ``cluster_completeness``
    (reference ``metrics.py:240-277``) between the market-segment
    classes and a deterministic 3-way nationkey clustering — computed
    scale-safe: the contingency table aggregates IN SPARK
    (``groupBy(class, cluster).count()``, bounded by
    |segments|×|clusters| = 15 cells regardless of row count) and
    AMI/EMI/completeness evaluate from the counts on the driver
    (metrics.py ``cluster_contingency`` / ``*_from_counts``); the
    expected-MI hypergeometric sum is replayed closed-form by the
    oracle via lgamma/generate_series."""
    from architxt_spark.metrics import (
        cluster_ami_from_counts,
        cluster_completeness_from_counts,
        cluster_contingency,
        confidence,
        dependency_score,
        redundancy_score,
    )

    cols = ["c_nationkey", "c_acctbal", "c_mktsegment"]
    cust = _t(spark, sf, "customer").select(*cols)
    counts = cluster_contingency(
        cust, "c_mktsegment", (F.col("c_nationkey") % 3).cast("int")
    )
    rows = [
        ("confidence", round(confidence(cust, "c_mktsegment"), 6)),
        ("dependency", round(dependency_score(cust, cols), 6)),
        ("redundancy", round(redundancy_score(
            cust.select("c_nationkey", "c_mktsegment", "c_acctbal"),
            tau=0.0, max_subset_size=2,
        ), 6)),
        ("cluster_ami", round(cluster_ami_from_counts(counts), 6)),
        ("cluster_completeness",
         round(cluster_completeness_from_counts(counts), 6)),
    ]
    return spark.createDataFrame(rows, "metric string, value double")


# ---------------------------------------------------------------------------
# text analysis / dedup / ANN (beyond-reference pipeline operators)
# ---------------------------------------------------------------------------


def q_text_profile(spark: SparkSession, sf: str) -> DataFrame:
    """Per-document text-analysis profile — token counts, distinct-token
    ratio, language-ID, content fingerprint, quality score, and
    Gopher-style bi/trigram repetition — all pure column ops in ONE scan
    (no shuffle; the whole profile rides the parquet read)."""
    docs = _t(spark, sf, "documents")
    t = F.col("text")
    return docs.select(
        "doc_id",
        T.token_count(t).alias("n_tokens"),
        F.round(T.distinct_token_ratio(t), 5).alias("distinct_ratio"),
        T.lang_id(t).alias("lang_guess"),
        T.fingerprint(t).alias("fingerprint"),
        F.round(T.quality_score(t), 5).alias("quality"),
        F.round(T.dup_ngram_fraction(t, 2), 5).alias("rep_bigram"),
        F.round(T.dup_ngram_fraction(t, 3), 5).alias("rep_trigram"),
    )


def _with_synthetic_pii(docs: DataFrame) -> DataFrame:
    """Deterministically inject PII spans (the synthetic corpus has none):
    same expression as the oracle SQL so redaction is comparable."""
    d = F.col("doc_id").cast("string")
    return docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(F.col("doc_id") % 7 == 0, F.concat(F.lit(" contact user"), d, F.lit("@example.com now"))).otherwise(F.lit("")),
            F.when(F.col("doc_id") % 11 == 0, F.concat(F.lit(" from 10.0."), (F.col("doc_id") % 256).cast("string"), F.lit(".42"))).otherwise(F.lit("")),
            F.when(F.col("doc_id") % 13 == 0, F.lit(" call +1 555 867 5309")).otherwise(F.lit("")),
        ).alias("text"),
    )


_PII_INJECT_SQL = (
    "text"
    " || (case when doc_id % 7 = 0 then ' contact user' || cast(doc_id as varchar) || '@example.com now' else '' end)"
    " || (case when doc_id % 11 = 0 then ' from 10.0.' || cast(doc_id % 256 as varchar) || '.42' else '' end)"
    " || (case when doc_id % 13 = 0 then ' call +1 555 867 5309' else '' end)"
)


def q_pii_redaction(spark: SparkSession, sf: str) -> DataFrame:
    """PII scrub over deterministically-injected spans: per-kind match
    counts plus an md5 of the redacted text, so the oracle verifies the
    exact redaction output byte-for-byte.  JVM-side regexp only."""
    docs = _with_synthetic_pii(_t(spark, sf, "documents"))
    t = F.col("text")
    return docs.filter(
        (F.col("doc_id") % 7 == 0) | (F.col("doc_id") % 11 == 0) | (F.col("doc_id") % 13 == 0)
    ).select(
        "doc_id",
        T.pii_count(t, "email").cast("long").alias("n_email"),
        T.pii_count(t, "ipv4").cast("long").alias("n_ip"),
        T.pii_count(t, "phone").cast("long").alias("n_phone"),
        F.md5(T.redact_pii(t)).alias("redacted_md5"),
    )


def q_contamination_check(spark: SparkSession, sf: str) -> DataFrame:
    """Benchmark-contamination screen: documents sharing >= 30% of their
    distinct word trigrams with a held-out 'benchmark' slice (doc_id < 25
    stands in for the eval set).  Scale shape: the benchmark gram set is
    bounded and broadcast; one shuffle for the per-doc aggregate."""
    docs = _t(spark, sf, "documents").select("doc_id", "text")
    # tokens materialized first (shingles_of_tokens contract) so the split
    # is evaluated once per row, not once per gram
    grams = docs.select(
        "doc_id", T.tokens(F.col("text")).alias("__t")
    ).select(
        "doc_id",
        F.explode(F.array_distinct(T.shingles_of_tokens(F.col("__t"), 3))).alias("gram"),
    )
    bench = grams.filter(F.col("doc_id") < 25).select("gram").distinct()
    hits = (
        grams.filter(F.col("doc_id") >= 25)
        .join(F.broadcast(bench.withColumn("hit", F.lit(1))), "gram", "left")
        .groupBy("doc_id")
        .agg((F.sum(F.coalesce(F.col("hit"), F.lit(0))) / F.count("*")).alias("frac"))
    )
    return hits.filter(F.col("frac") >= 0.3).select(
        "doc_id", F.round("frac", 5).alias("overlap_frac")
    )


def q_contamination_screen(spark: SparkSession, sf: str) -> DataFrame:
    """Registry fold of both contamination screens against the held-out
    benchmark slice (doc_id < 25): 'ngram' rows = the distinct-trigram
    overlap check (id_b NULL, score = overlap fraction >= 0.3); 'doc'
    rows = document-level MinHash near-dup candidates (score =
    est_jaccard; benchmark band index broadcast, corpus never shuffled
    on the band key).  One (variant, id_a, id_b, score) frame."""
    ngram = q_contamination_check(spark, sf).select(
        F.lit("ngram").alias("variant"),
        F.col("doc_id").alias("id_a"),
        F.lit(None).cast("long").alias("id_b"),
        F.col("overlap_frac").alias("score"),
    )
    docs = _t(spark, sf, "documents")
    doc = dedup.minhash_cross_pairs(
        docs.filter(F.col("doc_id") >= 25),
        docs.filter(F.col("doc_id") < 25),
        "text",
        "doc_id",
        max_band_df=1000,
    ).select(
        F.lit("doc").alias("variant"),
        F.col("corpus_id").alias("id_a"),
        F.col("bench_id").alias("id_b"),
        F.col("est_jaccard").alias("score"),
    )
    return ngram.unionByName(doc)


def q_dedup_minhash_lsh(spark: SparkSession, sf: str) -> DataFrame:
    """Banded MinHash LSH candidate pairs, hot bands capped (the
    production shape — a band shared by >max_band_df docs is boilerplate
    and would emit a quadratic pair set)."""
    return dedup.minhash_lsh_pairs(
        _t(spark, sf, "documents"), "text", "doc_id", max_band_df=1000
    )


def q_dedup_ngram_jaccard(spark: SparkSession, sf: str) -> DataFrame:
    """Shingle-index near-dup family, both screens tagged in one frame:
    'jaccard' = n-gram Jaccard pairs (DF-capped inverted index, score =
    rounded Jaccard); 'winnow' = winnowed-fingerprint screening (score =
    shared-fingerprint count) — the ~1/w-cost sibling on the same index
    shape.  Registry fold of the former dedup_winnow_pairs."""
    docs = _t(spark, sf, "documents")
    jac = dedup.ngram_jaccard_pairs(docs, "text", "doc_id", threshold=0.2).select(
        F.lit("jaccard").alias("variant"),
        "id_a",
        "id_b",
        F.col("jaccard").alias("score"),
    )
    win = dedup.winnow_pairs(docs, "text", "doc_id").select(
        F.lit("winnow").alias("variant"),
        "id_a",
        "id_b",
        F.col("n_common").cast("double").alias("score"),
    )
    return jac.unionByName(win)


def q_doc_fingerprint_winnow(spark: SparkSession, sf: str) -> DataFrame:
    """Winnowed rolling-hash document fingerprints (MOSS-style): per-doc
    total n-gram hashes vs the ~1/w kept by winnowing — the sub-linear
    fingerprint set for plagiarism screening.  Pure column ops."""
    docs = _t(spark, sf, "documents")
    t = F.col("text")
    return docs.select(
        "doc_id",
        F.size(T.shingle_fingerprints(t, 3)).cast("long").alias("n_grams"),
        F.size(T.winnow_fingerprints(t, 3, 4)).cast("long").alias("n_winnowed"),
    )


def q_gopher_quality_flags(spark: SparkSession, sf: str) -> DataFrame:
    """Gopher-style composite quality filter: per-document rule flags
    (word-count bounds, mean word length, repetition, stopword presence)
    plus the overall keep decision and BPE-ish token count."""
    docs = _t(spark, sf, "documents")
    t = F.col("text")
    n_tok = T.token_count(t)
    mean_wl = F.length(F.regexp_replace(t, r"\s+", "")) / F.greatest(n_tok, F.lit(1))
    f_words = n_tok.between(20, 100000)
    f_wordlen = mean_wl.between(3.0, 10.0)
    f_rep = T.dup_ngram_fraction(t, 2) <= 0.2
    f_stop = T.stopword_ratio(t) >= 0.02
    keep = f_words & f_wordlen & f_rep & f_stop
    return docs.select(
        "doc_id",
        T.bpe_token_count(t).cast("long").alias("bpe_tokens"),
        f_words.cast("long").alias("f_words"),
        f_wordlen.cast("long").alias("f_wordlen"),
        f_rep.cast("long").alias("f_rep"),
        f_stop.cast("long").alias("f_stop"),
        keep.cast("long").alias("keep"),
    )



def q_c4_clean(spark: SparkSession, sf: str) -> DataFrame:
    """C4-style line-level web cleaning (Raffel et al. 2020 §2.2): keep
    lines ending in terminal punctuation with ≥5 words and no
    javascript/cookie-policy boilerplate; drop pages with lorem ipsum, a
    curly brace, or <3 sentences after cleaning.  The flat test corpus has
    no newlines, so the query synthesizes a deterministic multi-line page
    (sentence breaks at 'table'/'line' tokens + rule-marker injections
    keyed on doc_id) identically on both engines — every rule fires
    non-degenerately.  Pure scan-side projection, no shuffle
    (`functions/text.py` c4_clean / c4_keep)."""
    docs = _t(spark, sf, "documents")
    page = F.concat(
        F.regexp_replace(F.col("text"), " (table|line) ", ".\n"),
        F.when(F.col("doc_id") % 7 == 0, F.lit("\nyou must enable javascript to view this page.")).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 13 == 0, F.lit("\nwe have updated our privacy policy today.")).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 11 == 0, F.lit("\nlorem ipsum dolor sit amet consectetur.")).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 17 == 0, F.lit(" {")).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 19 == 0, F.lit("\nle chat est dans le jardin et la maison.")).otherwise(F.lit("")),
    )
    staged = docs.select("doc_id", page.alias("page"))
    cleaned = staged.select(
        "doc_id", "page", T.c4_clean(F.col("page")).alias("clean")
    )
    prof = T.line_lang_profile(F.col("page"))
    return cleaned.select(
        "doc_id",
        F.size(F.split("page", "\n")).cast("long").alias("n_lines"),
        F.when(F.col("clean") == "", F.lit(0))
        .otherwise(F.size(F.split("clean", "\n")))
        .cast("long")
        .alias("n_kept"),
        F.regexp_count("clean", F.lit(r"[.!?]")).cast("long").alias("n_sent"),
        T.c4_keep(F.col("page"), F.col("clean")).cast("long").alias("keep"),
        F.md5("clean").alias("clean_fp"),
        # sibling line-level hygiene ops on the same synthesized page:
        # within-doc duplicate-line strip (verified by fingerprint) and
        # the per-line language segmentation profile
        F.md5(T.dedup_lines(F.col("page"))).alias("dedup_fp"),
        prof.getField("n_known").alias("n_lang_known"),
        prof.getField("dominant_lang").alias("dominant_lang"),
        prof.getField("mixed").cast("long").alias("lang_mixed"),
    )


def q_chunk_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """CCNet-style paragraph-hash dedup over non-overlapping token
    windows: chunk md5s, corpus-wide occurrence counts, keep-first rule —
    one narrow chunk explode + one map-combinable hash groupBy + a join
    back on the hash; no windows (`functions/dedup.py` chunk_dedup)."""
    return dedup.chunk_dedup(
        _t(spark, sf, "documents"), "text", "doc_id", chunk_tokens=32
    )



def q_chunk_strip(spark: SparkSession, sf: str) -> DataFrame:
    """Transform side of chunk-hash dedup: rebuild each document from its
    first-occurrence chunks only, verified via md5 of the rebuilt text
    (`functions/dedup.py` strip_duplicate_chunks)."""
    out = dedup.strip_duplicate_chunks(
        _t(spark, sf, "documents"), "text", "doc_id", chunk_tokens=32
    )
    return out.select(
        "doc_id", F.md5("clean_text").alias("clean_md5"), "n_chunks", "n_kept"
    )


def q_dedup_exact_spans(spark: SparkSession, sf: str) -> DataFrame:
    """Exact shared-span detection (exact-substring dedup signal): DF-capped
    positioned-shingle inverted index + diagonal run extension; returns the
    longest exact shared token run per document pair."""
    return dedup.exact_span_pairs(
        _t(spark, sf, "documents"), "text", "doc_id", min_tokens=12
    )


def q_dedup_components(spark: SparkSession, sf: str) -> DataFrame:
    """Transitive near-dup clusters: MinHash pairs → distributed hash-min
    connected components (the scale path for dedup cluster formation —
    no driver-side union-find)."""
    pairs = dedup.minhash_lsh_pairs(
        _t(spark, sf, "documents"), "text", "doc_id", max_band_df=1000
    )
    return dedup.connected_components(pairs)


def q_dedup_simhash(spark: SparkSession, sf: str) -> DataFrame:
    return dedup.simhash_buckets(_t(spark, sf, "documents"), "text", "doc_id")


def q_dedup_filtered(spark: SparkSession, sf: str) -> DataFrame:
    """End-to-end dedup keep-set: exact-dup groups keep the min id; the
    greater id of every MinHash near-dup pair is dropped."""
    out = dedup.dedup_filter(_t(spark, sf, "documents"), "text", "doc_id")
    return out.select(F.col("id").alias("doc_id"))


def q_embedding_near_dup(spark: SparkSession, sf: str) -> DataFrame:
    """Embedding near-duplicates, both paths tagged in one frame: the
    all-pairs cosine baseline AND the sign-LSH-bucketed scale variant
    (shuffle on bucket keys, never all-pairs)."""
    emb = _t(spark, sf, "embeddings")
    # the all-pairs baseline runs on a bounded id-slice: it is the LABELLED
    # correctness reference, and unbounded it is quadratic in the corpus
    # (80 s at sf0.1 for 25M pairs); the LSH scale path stays full-corpus
    brute = ann.cosine_near_dup_pairs(
        emb.filter(F.col("vec_id") < 1000), threshold=0.5
    ).select(F.lit("brute").alias("variant"), "*")
    lsh = ann.cosine_near_dup_pairs_lsh(emb, dim=64, threshold=0.35).select(
        F.lit("lsh").alias("variant"), "*"
    )
    return brute.unionByName(lsh)


def q_ann_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Top-k similarity search, exact + approximate tagged in one frame:
    the brute-force cosine baseline (queries broadcast, corpus scanned
    once) and the sign-LSH bucketed variant (exact re-scoring within
    shared buckets)."""
    emb = _t(spark, sf, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    brute = ann.brute_force_topk(emb, queries, k=5).select(
        F.lit("brute").alias("variant"), "*"
    )
    lsh = ann.lsh_topk(emb, queries, dim=64, k=5).select(
        F.lit("lsh").alias("variant"), "*"
    )
    return brute.unionByName(lsh)


_PQ_CODES_CACHE: dict = {}


def pq_serving_codes(spark: SparkSession, sf: str):
    """Memoized PQ serving artifact per (session, sf): sub-codebooks +
    the encoded corpus codes, barriered once — a deployment quantizes
    the corpus at INDEX time, so per-batch queries pay only the
    broadcast-LUT scoring pass (the same serving split as
    ``ivf_serving_index``; deterministic, values unchanged)."""
    from architxt_spark.session import stage_barrier

    key = (spark.sparkContext.applicationId, sf)
    if key not in _PQ_CODES_CACHE:
        cb, codes = ann.pq_encode(_t(spark, sf, "embeddings"))
        _PQ_CODES_CACHE[key] = (stage_barrier(cb), stage_barrier(codes))
    return _PQ_CODES_CACHE[key]


def q_ann_pq_adc(spark: SparkSession, sf: str) -> DataFrame:
    """Product-quantization ANN: vectors compressed to m sub-codes,
    queries scored by asymmetric distance (broadcast per-query lookup
    tables, decimal sub-score sums) — the memory side of IVF-PQ.  The
    corpus encode is the once-per-session serving artifact
    (``pq_serving_codes``); queries pay the scoring pass only."""
    emb = _t(spark, sf, "embeddings")
    return ann.pq_topk(
        emb, emb.filter(F.col("vec_id") < 10), k=5,
        encoded=pq_serving_codes(spark, sf),
    )


def q_ngram_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Corpus n-gram heavy hitters (boilerplate-detection statistic):
    explode + map-combinable groupBy, TakeOrdered top-k, deterministic
    (doc_freq, total_freq, gram) ranking."""
    return T.ngram_stats(_t(spark, sf, "documents").select("doc_id", "text"), k=50)


def q_doc_chunking(spark: SparkSession, sf: str) -> DataFrame:
    """Overlapping token-window chunking (context-window prep): narrow
    per-doc explode, pure slicing, no shuffle (`functions/text.py`)."""
    return T.chunk_documents(
        _t(spark, sf, "documents").select("doc_id", "text"),
        chunk_tokens=64,
        overlap=16,
    )


def q_lm_perplexity(spark: SparkSession, sf: str) -> DataFrame:
    """Bigram-LM perplexity quality scoring (CCNet-style filter): two
    wordcount groupBys train the LM, per-doc transitions join the count
    tables, decimal log-prob sums (`functions/lm.py`)."""
    from architxt_spark.functions import lm

    return lm.bigram_lm_perplexity(_t(spark, sf, "documents").select("doc_id", "text"))


def q_bpe_train_merges(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic BPE merge training: one word-count shuffle, then
    merge iterations on the vocab-bounded word frame; greedy merge order
    via literal separator-string replace (`functions/bpe.py`)."""
    from architxt_spark.functions import bpe

    return bpe.train_bpe_merges(_t(spark, sf, "documents").select("text"), n_merges=6)


def q_bpe_encode_counts(spark: SparkSession, sf: str) -> DataFrame:
    """Train-then-apply tokenizer pair: learn 6 BPE merges on the corpus
    (one wordcount job + driver-local merge loop on the vocab-bounded
    frame), then greedy-encode every word occurrence with the merge chain
    folded into literal codegen replaces — one map-side pass — and count
    the resulting tokens (`functions/bpe.py`)."""
    from architxt_spark.functions import bpe

    docs = _t(spark, sf, "documents").select("doc_id", "text")
    merges = bpe.train_bpe_merges(docs, n_merges=6)
    return (
        bpe.bpe_encode(docs, merges)
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
    )


def q_bpe_vocab(spark: SparkSession, sf: str) -> DataFrame:
    """Tokenizer vocabulary induced by the trained merge table: corpus
    character alphabet (id-ordered) + merges in training order — ids are
    prefix-stable under retraining (`functions/bpe.py` vocab_from_merges)."""
    from architxt_spark.functions import bpe

    docs = _t(spark, sf, "documents").select("text")
    merges = bpe.train_bpe_merges(docs, n_merges=6)
    return bpe.vocab_from_merges(docs, merges)


#: BM25 demo query: a fixed small bag of terms from the corpus vocabulary.
_BM25_TERMS = ["spark", "vector", "stream"]


def q_bm25_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Lexical retrieval: BM25 top-k over the documents corpus — one
    codegen scan for per-term token counts, a 1-row stats aggregate
    broadcast back, TakeOrdered for the top-k (`functions/search.py`)."""
    return search.bm25_topk(
        _t(spark, sf, "documents").select("doc_id", "text"), _BM25_TERMS, k=25
    )


# ---------------------------------------------------------------------------
# meta-model pipeline II: document loader, rewrite ops, clustering
# ---------------------------------------------------------------------------


def _unlabelled_doc_forest(spark: SparkSession, sf: str, limit: int | None = None) -> DataFrame:
    """documents rows → row trees with the GROUP labels stripped (the
    'unstructured input' shape the rewrite operators discover structure in)."""
    from architxt_spark.sources.documents import row_trees

    docs = _t(spark, sf, "documents").select("doc_id", "lang", "source")
    if limit is not None:
        docs = docs.limit(limit)
    dn = row_trees(docs, "documents", ["doc_id"])
    return dn.withColumn(
        "node_type",
        F.when(F.col("depth") == 1, F.lit(None).cast("string")).otherwise(F.col("node_type")),
    )



#: Batched BM25 eval-sweep query bags (query_id, term bag).
_BM25_BAGS = [
    (1, ["spark", "vector"]),
    (2, ["stream", "data"]),
    (3, ["model", "graph", "model"]),
]


def q_bm25_batch(spark: SparkSession, sf: str) -> DataFrame:
    """Batched BM25 retrieval: several query bags scored in ONE corpus
    pass — tokens explode once and semi-join the broadcast query
    vocabulary, per-term parts sum as DECIMAL(18,6), per-query top-k via
    the salted two-phase window (`functions/search.py` bm25_topk_batch).
    Bag 3 repeats a term to exercise query-term-frequency weighting."""
    qdf = spark.createDataFrame(
        [(qid, terms) for qid, terms in _BM25_BAGS], "query_id int, terms array<string>"
    )
    return search.bm25_topk_batch(
        _t(spark, sf, "documents").select("doc_id", "text"), qdf, k=15
    )


def q_doc_loader_json_props(spark: SparkSession, sf: str) -> DataFrame:
    """Document loader (dict→GROUP/ENT normalization) over the events.props
    JSON column → dataset extraction of the induced 'root' group."""
    from architxt_spark.plans import extract_group_dataset
    from architxt_spark.sources.documents import read_documents_df

    # the events table is one parquet file locally -> one partition; spread
    # so the JSON normalization + __tid hashing parallelize (the whole
    # chain ran single-task: 11.3 s -> ~3 s at sf0.1)
    ev = _events(spark, sf).repartition(spark.sparkContext.defaultParallelism)
    nodes = read_documents_df(ev, "props", "event_id")
    return extract_group_dataset(nodes, "root")


def q_simple_rewrite_documents(spark: SparkSession, sf: str) -> DataFrame:
    """simple_rewrite baseline: unlabelled trees collapse to one GROUP per
    distinct entity-label set; group ids via dense_rank."""
    from architxt_spark.operators.engine import simple_rewrite

    out = simple_rewrite(_unlabelled_doc_forest(spark, sf))
    return (
        out.filter(F.col("node_type") == "GROUP")
        .groupBy(F.col("node_name").alias("group_id"))
        .agg(F.count("*").alias("n_trees"))
    )


def q_rewrite_documents(spark: SparkSession, sf: str) -> DataFrame:
    """Full iterative rewrite loop (reduce → cluster → find_groups → op
    chain to fixpoint) on a bounded slice; verified via node-type census
    (cluster NAMES are modal labels — tie-broken nondeterministically, so
    they stay out of the oracle)."""
    from architxt_spark.operators.engine import rewrite

    out = rewrite(_unlabelled_doc_forest(spark, sf, limit=200), epoch=3)
    return (
        out.groupBy(F.coalesce(F.col("node_type"), F.lit("UNTYPED")).alias("node_type"))
        .agg(F.count("*").alias("n_nodes"))
    )


def q_cluster_documents(spark: SparkSession, sf: str) -> DataFrame:
    """Subtree clustering (candidate signatures → LSH/exact pairs →
    connected components): distinct cluster support over the doc forest,
    plus (r13 fold) the ``get_equiv_of`` census — every candidate
    subtree re-assigned to the fitted index through
    ``assign_to_clusters`` (similarity.py:911, reference
    ``TreeClusterer.get_equiv_of`` ``similarity.py:370-432``) must hit
    its own cluster with an exact-membership score of 1.0 — plus (r14
    fold) the ``entity_cluster_labels`` census (similarity.py:866,
    reference ``entity_labels`` ``similarity.py:514-553``): every ENT
    under a clustered parent maps to a cluster name (3 per doc tree,
    one cluster)."""
    from architxt_spark.similarity import (
        assign_to_clusters,
        cluster_forest_with_index,
        entity_cluster_labels,
    )
    from architxt_spark.sources.documents import row_trees

    docs = _t(spark, sf, "documents").select("doc_id", "lang", "source")
    dn = row_trees(docs, "documents", ["doc_id"])
    asg, index = cluster_forest_with_index(dn)
    support = asg.select("support").distinct()
    equiv = assign_to_clusters(dn, index).agg(
        F.count("*").cast("long").alias("n_assigned"),
        F.countDistinct("cluster_name").cast("long").alias("n_clusters"),
        F.round(F.min("score"), 6).alias("min_score"),
        F.round(F.max("score"), 6).alias("max_score"),
    )
    # τ-scored (non-exact) branch: candidates whose signature drops
    # `source` are NOT index members; best jaccard vs {doc_id, lang,
    # source} is exactly 2/3, so τ=0.5 assigns every one with a pinned
    # fuzzy score — the reference's best-scoring-at-or-above-tau rule
    fuzzy_src = row_trees(docs.select("doc_id", "lang"), "documents", ["doc_id"])
    fuzzy = assign_to_clusters(fuzzy_src, index, tau=0.5, metric="jaccard").agg(
        F.count("*").cast("long").alias("n_fuzzy"),
        F.countDistinct("cluster_name").cast("long").alias("n_fuzzy_clusters"),
        F.round(F.min("score"), 6).alias("fuzzy_score"),
    )
    labels = entity_cluster_labels(dn).agg(
        F.count("*").cast("long").alias("n_ent_labeled"),
        F.countDistinct("cluster_name").cast("long").alias("n_label_clusters"),
    )
    return support.crossJoin(equiv).crossJoin(fuzzy).crossJoin(labels)


def q_cluster_instance_documents(spark: SparkSession, sf: str) -> DataFrame:
    """Instance-mode clustering (context-weighted similarity, reference
    ``TreeClusterer.fit`` with ``schema_only=False``): a heterogeneous
    forest where B-shaped subtrees share the entity signature
    ``{doc_id, n_chars}`` but sit under disjoint ancestor contexts —
    signature mode merges them into one cluster; instance mode separates
    them at τ=0.8 (their context-weighted jaccard similarity is 0.714).

    Even doc rows emit ``(ROOT (W (A lang source f1 (B doc_id n_chars))))``,
    odd rows ``(ROOT (C extra (B doc_id n_chars)))``.  Expected cluster
    supports: B-even = E, B-odd = O, the even ROOT/W/A blob = 3E, the odd
    ROOT/C blob = 2O (E/O = even/odd doc counts).

    r14 fold: the raw scalar similarity functions (similarity.py:60-168,
    reference ``similarity.py:44-77``) join the gate as tagged rows —
    published known-answer pins (MARTHA/MARHTA 0.961111, the
    below-0.7-boost-threshold case, Levenshtein.ratio's indel semantics
    on kitten/sitting, jaccard doctests, the disjoint-context shortcut)
    plus data-derived pair sums over the document token vocabulary
    (vocabulary-bounded collect, ~31 tokens at any SF; 465 pairs on the
    driver), replayed by the oracle through DuckDB's own
    levenshtein/jaro_winkler built-ins and list algebra — so the metric
    CONVENTIONS (indel ratio = Dice on sorted distinct sequences, boost
    threshold, decay-weighted context mean) are hash-pinned against an
    independent engine."""
    from architxt_spark.similarity import (
        METRIC_FUNCS,
        cluster_forest_instance,
        context_similarity,
        jaccard,
        jaro_winkler,
        levenshtein_ratio,
    )

    even = [
        ("r", None, None, "ROOT"), ("0", "r", None, "W"), ("0.0", "0", None, "A"),
        ("0.0.0", "0.0", "ENT", "lang"), ("0.0.1", "0.0", "ENT", "source"),
        ("0.0.2", "0.0", "ENT", "f1"), ("0.0.3", "0.0", None, "B"),
        ("0.0.3.0", "0.0.3", "ENT", "doc_id"), ("0.0.3.1", "0.0.3", "ENT", "n_chars"),
    ]
    odd = [
        ("r", None, None, "ROOT"), ("0", "r", None, "C"),
        ("0.0", "0", "ENT", "extra"), ("0.1", "0", None, "B"),
        ("0.1.0", "0.1", "ENT", "doc_id"), ("0.1.1", "0.1", "ENT", "n_chars"),
    ]

    def emit(tpl):
        structs = []
        for suffix, parent, ntype, nname in tpl:
            path = [] if suffix == "r" else [int(x) for x in suffix.split(".")]
            parent_expr = (
                "CAST(NULL AS STRING)" if parent is None
                else f"concat(__tid, ':{parent}')"
            )
            path_expr = (
                "CAST(array() AS ARRAY<INT>)" if not path
                else "array(" + ",".join(map(str, path)) + ")"
            )
            structs.append(
                "named_struct("
                "'tree_id', __tid, "
                f"'node_id', concat(__tid, ':{suffix}'), "
                f"'parent_id', {parent_expr}, "
                f"'pos', {path[-1] if path else 0}, "
                f"'path', {path_expr}, "
                f"'depth', {len(path)}, "
                f"'node_type', {'CAST(NULL AS STRING)' if ntype is None else repr(ntype)}, "
                f"'node_name', '{nname}', "
                "'leaf_value', CAST(NULL AS STRING), "
                "'metadata', CAST(NULL AS MAP<STRING,STRING>))"
            )
        return "array(" + ", ".join(structs) + ")"

    nodes = (
        _t(spark, sf, "documents")
        .select(F.concat(F.lit("d"), F.col("doc_id")).alias("__tid"), (F.col("doc_id") % 2).alias("par"))
        .select(F.explode(F.expr(f"CASE WHEN par = 0 THEN {emit(even)} ELSE {emit(odd)} END")).alias("n"))
        .select("n.*")
    )
    asg = cluster_forest_instance(nodes, tau=0.8, metric="jaccard")
    support = asg.select(
        F.lit("support").alias("tag"),
        F.col("support").cast("double").alias("value"),
    ).distinct()

    toks = sorted(
        r[0]
        for r in _t(spark, sf, "documents")
        .select(F.explode(F.split("text", " ")).alias("tok"))
        .filter(F.col("tok") != "")
        .distinct()
        .collect()
        if r[0]
    )
    from itertools import combinations

    lev_m, jw_m, jac_m = (
        METRIC_FUNCS[m] for m in ("levenshtein", "jaro", "jaccard")
    )
    lev_sum = jw_sum = jac_sum = ctx_sum = 0.0
    for a, b in combinations(toks, 2):
        sa, sb = set(a), set(b)
        lev_sum += lev_m(sa, sb)
        jw_sum += jw_m(sa, sb)
        jac_sum += jac_m(sa, sb)
        ctx_sum += context_similarity(
            [frozenset(a), frozenset(a[:2])], [frozenset(b), frozenset(b[:2])]
        )
    rows = [
        ("metric_lev_pairs", round(lev_sum, 6)),
        ("metric_jw_pairs", round(jw_sum, 6)),
        ("metric_jaccard_pairs", round(jac_sum, 6)),
        ("metric_ctx_pairs", round(ctx_sum, 6)),
        ("kat_jw_martha_marhta", round(jaro_winkler("MARTHA", "MARHTA"), 6)),
        ("kat_jw_below_boost", round(jaro_winkler("aXXXX", "aYYYY"), 6)),
        ("kat_lev_kitten_sitting", round(levenshtein_ratio("kitten", "sitting"), 6)),
        ("kat_jaccard_abc_bcd", round(jaccard(set("abc"), set("bcd")), 6)),
        ("kat_jaccard_empty", jaccard(set(), set())),
        ("kat_ctx_disjoint", context_similarity([frozenset("a")], [frozenset("b")])),
    ]
    return support.unionByName(
        spark.createDataFrame(rows, "tag string, value double")
    )


def q_llm_label_schema(spark: SparkSession, sf: str) -> DataFrame:
    """LLM schema labelling (prompt builders + renaming application,
    reference ``labelling/__init__.py:71-163``) with the deterministic
    StubChatModel: schema groups/relations are renamed from their
    attribute lists and the broadcast-map rename is applied to the forest."""
    from architxt_spark.labelling import (
        StubChatModel,
        apply_renamings,
        llm_group_labelling,
        llm_relation_labelling,
    )
    from architxt_spark.plans.schema import schema_from_forest

    nodes = _nation_forest(spark, sf)
    schema = schema_from_forest(nodes)
    g = llm_group_labelling(schema, StubChatModel(), nodes=nodes)
    r = llm_relation_labelling(schema, StubChatModel(), group_renames=g)
    out = apply_renamings(nodes, g | r)
    return (
        out.filter(F.col("node_type").isin("GROUP", "REL"))
        .groupBy("node_type", "node_name")
        .agg(F.count("*").alias("n"))
    )


def q_tree_leaves_nation(spark: SparkSession, sf: str) -> DataFrame:
    """Ordered token projection per tree (Tree.leaves): nation trees render
    group + REL-copy + referenced-region leaves in path order."""
    from architxt_spark.trees import leaves_df

    nodes = _nation_forest(spark, sf)
    return leaves_df(nodes).select("text")


def q_extract_valid_trees(spark: SparkSession, sf: str) -> DataFrame:
    """Schema-validity filter+project: subtrees with labels outside the
    schema are dropped with their children promoted to the nearest valid
    ancestor; stray entities under a ROOT-ified root are removed.  Census
    over the nation forest filtered to a nation-only schema."""
    from architxt_spark.plans import extract_valid_trees
    from architxt_spark.plans.schema import SchemaPlan

    nodes = _nation_forest(spark, sf)
    schema = SchemaPlan(groups={"nation": frozenset({"n_name", "n_nationkey"})}, relations=set())
    out = extract_valid_trees(nodes, schema)
    return out.groupBy(
        F.coalesce(F.col("node_type"), F.lit("UNTYPED")).alias("node_type"),
        F.coalesce(F.col("node_name"), F.lit("")).alias("node_name"),
    ).agg(F.count("*").alias("n"))


def q_coverage_metric(spark: SparkSession, sf: str) -> DataFrame:
    """Coverage metric: Jaccard of entity-OID sets before vs after the
    validity filter (region entities drop → 2C/(2C+2R))."""
    from architxt_spark.metrics import coverage, entity_oids
    from architxt_spark.plans import extract_valid_trees
    from architxt_spark.plans.schema import SchemaPlan

    nodes = _nation_forest(spark, sf)
    schema = SchemaPlan(groups={"nation": frozenset({"n_name", "n_nationkey"})}, relations=set())
    out = extract_valid_trees(nodes, schema)
    c = coverage(entity_oids(nodes), entity_oids(out))
    return spark.createDataFrame([(round(c, 6),)], "coverage double")


def q_export_sql_ddl(spark: SparkSession, sf: str) -> DataFrame:
    """SQL exporter DDL: inferred schema → CREATE TABLE statements with the
    FK column on the many side (orientation-driven)."""
    from architxt_spark.plans import schema_from_forest
    from architxt_spark.sinks import schema_ddl

    nodes = _nation_forest(spark, sf)
    schema = schema_from_forest(nodes, keep_unlabelled=False)
    rows = [(i, s) for i, s in enumerate(schema_ddl(schema))]
    return spark.createDataFrame(rows, "stmt_no int, ddl string")


def q_export_cypher_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Cypher exporter: MERGE script census over the nation forest (node
    MERGEs per group row, edge MERGEs per REL instance)."""
    from architxt_spark.plans import schema_from_forest
    from architxt_spark.sinks import export_cypher_script

    nodes = _nation_forest(spark, sf)
    schema = schema_from_forest(nodes, keep_unlabelled=False)
    script = export_cypher_script(nodes, schema)
    n_nodes = sum(s.startswith("MERGE (n:") for s in script)
    n_edges = sum("MERGE (a)-[" in s for s in script)
    return spark.createDataFrame(
        [("node_merge", n_nodes), ("edge_merge", n_edges)], "kind string, n long"
    )


# ---------------------------------------------------------------------------
# multimodal columns (binary + typed metadata; decode stubbed)
# ---------------------------------------------------------------------------


def _media_frame(spark: SparkSession, sf: str) -> DataFrame:
    docs = _t(spark, sf, "documents")
    return docs.select(
        F.col("doc_id").cast("string").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode("text", "UTF-8").alias("content"),
    )


def q_multimodal_profile(spark: SparkSession, sf: str) -> DataFrame:
    """Multimodal columns end to end, two tagged variants in one frame.

    'plumbing': JVM-side byte metadata (length + content hash, no
    decode) joined to the Arrow-batched mapInPandas feature extraction
    (s=content_md5, a=n_bytes, b=has_feature).

    'decoded': REAL stdlib codecs — per doc_id a structurally valid PNG
    (even ids; dims derived from the id) or silent WAV (odd ids) is
    synthesized, then decoded back by decode_media_meta; the oracle
    replays the encoding arithmetic, so a decoder that misreads any
    header byte hash-mismatches (s=fmt; png: a=width, b=height; wav:
    a=n_channels, b=sample_rate, c=duration_ms).

    'pixels' (r10): the real pixel/sample decoders — formula-generated
    content round-tripped through encode → decode (PNG across all five
    scanline filters, GIF through LZW, JPEG through the DC-exact
    baseline path, WAV through PCM de-interleave; d%4 split) and
    reduced to a position-weighted checksum the oracle computes
    closed-form.

    'frames' (r10): the MJPEG-in-AVI video sampler — 4 constant frames
    per container, every_ms picks frames 0 and 2; checksum over the
    sampled frames' (exact) pixel values, closed-form in the oracle
    (doc_id%16 slice)."""
    import pandas as pd

    from architxt_spark.functions.multimodal import (
        decode_media_meta,
        extract_features,
        make_png_bytes,
        make_wav_bytes,
        with_byte_metadata,
    )

    media = _media_frame(spark, sf)
    meta = with_byte_metadata(media).select("media_id", "n_bytes", "content_md5")
    feats = extract_features(media).select(
        "media_id", "kind", (F.size("feature") == 16).alias("has_feature")
    )
    plumbing = meta.join(feats, "media_id").select(
        F.lit("plumbing").alias("variant"),
        "media_id",
        F.col("content_md5").alias("s"),
        F.col("n_bytes").cast("long").alias("a"),
        F.col("has_feature").cast("long").alias("b"),
        F.lit(None).cast("long").alias("c"),
    )

    def build(batches):
        for pdf in batches:
            kinds, contents = [], []
            for d in pdf["doc_id"]:
                d = int(d)
                if d % 2 == 0:
                    kinds.append("image")
                    contents.append(make_png_bytes(d % 64 + 1, (d * 7) % 64 + 1))
                else:
                    kinds.append("audio")
                    contents.append(
                        make_wav_bytes((d // 2) % 2 + 1, 8000, (d % 50 + 1) * 80)
                    )
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"].astype(str),
                    "kind": kinds,
                    "content": contents,
                }
            )

    real_media = (
        dedup._spread(_t(spark, sf, "documents").select("doc_id"))
        .mapInPandas(build, "media_id string, kind string, content binary")
    )
    decoded = decode_media_meta(real_media).select(
        F.lit("decoded").alias("variant"),
        "media_id",
        F.col("fmt").alias("s"),
        F.coalesce(F.col("width"), F.col("n_channels")).cast("long").alias("a"),
        F.coalesce(F.col("height"), F.col("sample_rate")).cast("long").alias("b"),
        F.col("duration_ms").cast("long").alias("c"),
    )

    # 'pixels' (r10): the REAL pixel/sample decoders under the hash gate.
    # Content is synthesized from a pure-integer formula both engines can
    # evaluate, round-tripped through encode -> decode (PNG exercising
    # all five scanline filters via doc_id % 5, GIF through the LZW path,
    # WAV through PCM de-interleaving), and reduced to a position-
    # weighted checksum — any mis-decoded byte/sample shifts it.  The
    # oracle computes the same checksum closed-form (no codec in DuckDB).
    def build_pixels(batches):
        from architxt_spark.functions.jpeg import (
            decode_jpeg_pixels,
            make_jpeg_bytes,
        )
        from architxt_spark.functions.multimodal import (
            decode_gif_pixels,
            decode_png_pixels,
            decode_wav_samples,
            make_gif_bytes,
        )

        for pdf in batches:
            rows = []
            for d in pdf["doc_id"]:
                d = int(d)
                w, h = d % 8 + 2, (d * 3) % 6 + 2
                if d % 4 == 0:
                    # half the slice (d%8==0) writes ADAM7 interlaced
                    # (r11.5) — same pixels, so the same position-weighted
                    # checksum gates the seven-pass de-interlace exactly
                    n = w * h * 3
                    pixels = bytes((d * 31 + i * 7) % 256 for i in range(n))
                    content = make_png_bytes(
                        w, h, pixels, color_type=2, filter_type=d % 5,
                        interlace=1 if d % 8 == 0 else 0,
                    )
                    vals = list(decode_png_pixels(content)[3])
                    fmt = "png_i" if d % 8 == 0 else "png"
                elif d % 4 == 1:
                    palette = bytes((d * 13 + m * 29) % 256 for m in range(12))
                    indices = bytes((d + i) % 4 for i in range(w * h))
                    if d % 8 == 5:
                        # r14.5: this residue travels as TIFF — palette
                        # LZW at d%16==5 (ColorMap planes carry the GIF
                        # palette's RGB bytes << 8, so the decoded
                        # stream and checksum are IDENTICAL to gif's),
                        # and CCITT G4 fax at d%16==13 (the indices'
                        # low bit as ink on a min-is-white page, so the
                        # black-is-zero view is the closed form
                        # 255 - 255*((d+i)%4%2))
                        from architxt_spark.functions.tiff import (
                            decode_tiff_pixels,
                            make_tiff_bytes,
                        )

                        if d % 16 == 13:
                            bits = bytes(b % 2 for b in indices)
                            content = make_tiff_bytes(
                                w, h, bits, bit_depth=1, compression=4,
                                big_endian=(d % 3 == 0),
                            )
                        else:
                            pal = (
                                [v << 8 for v in palette[0::3]]
                                + [v << 8 for v in palette[1::3]]
                                + [v << 8 for v in palette[2::3]]
                            )
                            # d%3 rotates byte order; d%5==0 travels
                            # TILED (4x4 grid with partial edge tiles)
                            content = make_tiff_bytes(
                                w, h, indices, palette=pal,
                                compression=5,
                                big_endian=(d % 3 == 0),
                                tile=(4, 4) if d % 5 == 0 else None,
                            )
                        vals = list(decode_tiff_pixels(content)[3])
                        fmt = "tiff_g4" if d % 16 == 13 else "tiff"
                    else:
                        content = make_gif_bytes(w, h, indices, palette)
                        vals = list(decode_gif_pixels(content)[3])
                        fmt = "gif"
                elif d % 4 == 2:
                    # grayscale constant 8x8 blocks: the DC-only JPEG
                    # path is bit-exact, so the decoded pixels equal the
                    # formula both engines evaluate; half the slice
                    # (d%8==2) encodes PROGRESSIVE (SOF2, r11) — same
                    # coefficients, so the same closed-form oracle gates
                    # the successive-approximation DC scans + AC EOBRUN
                    # machinery byte-exactly
                    bx, by = d % 3 + 1, d % 2 + 1
                    jw, jh = 8 * bx, 8 * by
                    img = bytes(
                        (d * 37 + (((p // jw) // 8) * bx + ((p % jw) // 8)) * 11) % 256
                        for p in range(jw * jh)
                    )
                    if d % 8 == 6:
                        # r14: this half-slice travels at 12-BIT
                        # precision (sequential at d%32==6, LOSSLESS
                        # SOF3 at d%32==22, progressive at d%16==14)
                        # with samples 16× the 8-bit formula — the
                        # decoder's downscale restores byte-identical
                        # pixels, so the SAME closed-form oracle now
                        # also gates the 12-bit level shift, Pq=1 quant
                        # tables, 12-bit SOF2 bit planes, and the
                        # Annex-H predictor/difference machinery.
                        # r14.5: the d%64==38 quarter of the sequential
                        # and the d%32==30 half of the progressive leg
                        # re-entropy-code ARITHMETICALLY (SOF9/SOF10,
                        # T.81 Annex D QM-coder) — identical quantized
                        # coefficients, so the unchanged oracle gates
                        # the 12-bit arithmetic decode byte-exactly
                        img12 = b"".join(
                            (b * 16).to_bytes(2, "little") for b in img
                        )
                        content = make_jpeg_bytes(
                            jw, jh, img12, channels=1, precision=12,
                            progressive=(d % 16 == 14),
                            lossless=(d % 32 == 22),
                            predictor=d % 7 + 1,
                            arithmetic=(d % 64 == 38 or d % 32 == 30),
                        )
                    else:
                        # r14.5: the d%16==10 half of the 8-bit
                        # progressive leg travels as SOF10 arithmetic
                        content = make_jpeg_bytes(
                            jw, jh, img, channels=1, progressive=(d % 8 == 2),
                            arithmetic=(d % 16 == 10),
                        )
                    vals = list(decode_jpeg_pixels(content)[3])
                    fmt = "jpeg_prog" if d % 8 == 2 else "jpeg"
                else:
                    ch = (d // 2) % 2 + 1
                    frames = d % 50 + 8
                    samples = [
                        [((d * 11 + f * 3) % 2001) - 1000 + c for f in range(frames)]
                        for c in range(ch)
                    ]
                    # r14.5: the d%8==7 residue travels as WIDE PCM
                    # (24-bit at d%16==7, 32-bit at d%16==15 — top bytes
                    # carry the same int16 samples, oracle unchanged);
                    # the d%32==19 residue travels as G.711 µ-LAW, whose
                    # companding round-trip the oracle replays closed-form
                    # (the audioop-pinned 14-bit floor formulas in SQL)
                    if d % 32 == 19:
                        content = make_wav_bytes(
                            ch, 8000, frames, samples=samples, g711="ulaw"
                        )
                        fmt = "wav_ulaw"
                    else:
                        width = {7: 3, 15: 4}.get(d % 16, 2)
                        content = make_wav_bytes(
                            ch, 8000, frames, samples=samples,
                            sample_width=width,
                        )
                        fmt = "wav"
                    chans = decode_wav_samples(content)[2]
                    vals = [s for cvals in chans for s in cvals]
                checksum = sum(v * (p + 1) for p, v in enumerate(vals))
                rows.append((str(d), fmt, checksum, len(vals)))
            yield pd.DataFrame(rows, columns=["media_id", "s", "a", "b"])

    pixels = (
        dedup._spread(_t(spark, sf, "documents").select("doc_id"))
        .mapInPandas(build_pixels, "media_id string, s string, a long, b long")
        .select(
            F.lit("pixels").alias("variant"),
            "media_id", "s", "a", "b",
            F.lit(None).cast("long").alias("c"),
        )
    )

    # 'frames' (r10): the MJPEG-in-AVI video sampler under the hash gate
    # — 4 constant frames per container (DC-exact through the JPEG
    # round-trip), every_ms=200 over 100ms frames samples frames 0 and
    # 2; checksum = sum over sampled frames of value·(idx+1), which the
    # oracle computes closed-form.  Bounded to the doc_id%16 slice.
    def build_frames(batches):
        from architxt_spark.functions.jpeg import make_jpeg_bytes
        from architxt_spark.functions.multimodal import make_avi_mjpeg_bytes

        for pdf in batches:
            rows = []
            for d in pdf["doc_id"]:
                d = int(d)
                if d % 16:
                    continue
                frames = []
                for k in range(4):
                    v = (d * 53 + k * 19) % 256
                    img = bytes([v]) * 64
                    frames.append(make_jpeg_bytes(8, 8, img, channels=1))
                rows.append(
                    (str(d), make_avi_mjpeg_bytes(frames, us_per_frame=100_000))
                )
            yield pd.DataFrame(rows, columns=["media_id", "content"])

    avi_media = (
        dedup._spread(_t(spark, sf, "documents").select("doc_id"))
        .mapInPandas(build_frames, "media_id string, content binary")
    )
    from architxt_spark.functions.multimodal import sample_video_frames

    sampled = sample_video_frames(avi_media, every_ms=200)
    # constant frames: pixel 0 IS the frame value (binary -> first byte,
    # sign-corrected to 0..255)
    frames_agg = (
        sampled.select(
            "media_id",
            "frame_idx",
            F.conv(F.hex(F.expr("substring(pixels, 1, 1)")), 16, 10)
            .cast("int")
            .alias("__v"),
        )
        .groupBy("media_id")
        .agg(
            F.sum(F.col("__v") * (F.col("frame_idx") + 1)).cast("long").alias("a"),
            F.count("*").cast("long").alias("b"),
        )
        .select(
            F.lit("frames").alias("variant"),
            "media_id",
            F.lit("avi").alias("s"),
            "a",
            "b",
            F.lit(None).cast("long").alias("c"),
        )
    )
    return (
        plumbing.unionByName(decoded)
        .unionByName(pixels)
        .unionByName(frames_agg)
    )


def _dedup_image_bytes(d: int) -> bytes:
    """The near-dup fixture image for doc_id ``d`` — groups of 4
    (doc_id // 4): base PNG (filter d % 5), the SAME pixels recompressed
    as baseline JPEG (DC-exact constant blocks), a brightness-shifted
    (+8) PNG, and a one-cell-perturbed GIF (through the LZW path).
    Shared by ``multimodal_dedup`` and the crawl-media composite so one
    closed-form oracle covers both.

    Quadratic mix: a LINEAR formula's gradient pattern has only ~192
    distinct wrap shapes, so at sf0.1's 1250 groups unrelated images
    collided into near-dup pairs en masse; the quadratic gives
    1250/1250 distinct hashes (3 genuine coincidence pairs, replayed
    identically by the oracle)."""
    from architxt_spark.functions.jpeg import make_jpeg_bytes
    from architxt_spark.functions.multimodal import make_gif_bytes, make_png_bytes

    g, m = d // 4, d % 4
    pr, pc = g % 8, g % 7 + 1

    def val(r: int, c: int) -> int:
        z = g * 73 + r * 9 + c
        v = ((z * z + 3 * z) % 7919) % 192
        if m == 3 and r == pr and c == pc:
            v = (v + 96) % 192
        return v + (8 if m == 2 else 0)

    px = bytes(val(y // 8, x // 8) for y in range(64) for x in range(72))
    if m == 1:
        return make_jpeg_bytes(72, 64, px, channels=1)
    if m == 3:
        palette = bytes(b for v in range(256) for b in (v, v, v))
        return make_gif_bytes(72, 64, px, palette)
    return make_png_bytes(72, 64, px, color_type=0, filter_type=d % 5)


def q_multimodal_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Image near-duplicate dedup over the REAL pixel decoders (r11):
    perceptual hashes + Hamming-banded LSH, two tagged variants.

    Fixture: per doc_id a 72×64 grayscale image whose 8×8 blocks take
    pure-integer formula values; groups of 4 (doc_id // 4) hold — base
    PNG (filter doc_id % 5), the SAME pixels recompressed as baseline
    JPEG (DC-exact constant blocks), a brightness-shifted (+8) PNG, and
    a one-cell-perturbed GIF (through the LZW path).

    'hash': per image (real decode → integer luma → block means) the
    gradient dhash and average ahash — recompression is hash-identical
    and brightness shifts cancel in both, so any decoder or hash-math
    drift hash-mismatches.  'pairs': ``hamming_near_dup`` with 4×16-bit
    bands, max_hamming 3 — by pigeonhole the banded join is EXACT at
    this threshold, so the oracle verifies it against a closed-form
    all-pairs scan while the Spark plan stays banded (never cartesian;
    see tests/test_imagehash.py's plan assertions).

    'afp'/'apairs' (r11, AUDIO): per doc_id a 1040-sample formula WAV in
    groups of 3 (doc_id // 3) — base clip, the SAME clip at 3× amplitude
    (the energy-delta fingerprint is exactly scale-invariant), and a
    locally-edited copy (one sample bumped — flips at most the two bits
    whose frames it touches).  Real PCM decode →
    ``audio_fingerprint64`` (functions/audiohash.py), pairs through the
    SAME Hamming-banded join as the images."""
    import pandas as pd

    from architxt_spark.functions.audiohash import audio_fingerprints
    from architxt_spark.functions.imagehash import hamming_near_dup, image_hashes

    def build(batches):
        for pdf in batches:
            yield pd.DataFrame(
                [(str(int(d)), _dedup_image_bytes(int(d))) for d in pdf["doc_id"]],
                columns=["media_id", "content"],
            )

    media = (
        dedup._spread(_t(spark, sf, "documents").select("doc_id"))
        .mapInPandas(build, "media_id string, content binary")
    )
    hashes = image_hashes(media).persist()
    hashes.count()  # eager: the hash variant and both band-join sides
    # would otherwise each re-run the Python decode chain
    hash_rows = hashes.select(
        F.lit("hash").alias("variant"),
        F.col("media_id").alias("s"),
        F.col("dhash").alias("a"),
        F.col("ahash").alias("b"),
    )
    pair_rows = hamming_near_dup(hashes, bands=4, max_hamming=3).select(
        F.lit("pairs").alias("variant"),
        F.concat_ws("|", "id_a", "id_b").alias("s"),
        F.col("hamming").cast("long").alias("a"),
        F.lit(None).cast("long").alias("b"),
    )

    def build_audio(batches):
        from architxt_spark.functions.multimodal import make_wav_bytes

        for pdf in batches:
            rows = []
            for d in pdf["doc_id"]:
                d = int(d)
                g, m = d // 3, d % 3
                vals = []
                for f in range(1040):
                    z = g * 131 + f
                    s = ((z * z + 3 * z) % 2001) - 1000
                    if m == 1:
                        s *= 3
                    elif m == 2 and f == 170:
                        s += 4000
                    vals.append(s)
                rows.append(
                    (str(d), make_wav_bytes(1, 8000, len(vals), samples=[vals]))
                )
            yield pd.DataFrame(rows, columns=["media_id", "content"])

    clips = (
        dedup._spread(_t(spark, sf, "documents").select("doc_id"))
        .mapInPandas(build_audio, "media_id string, content binary")
    )
    fps = audio_fingerprints(clips).persist()
    fps.count()  # eager: the fp variant and both band-join sides
    afp_rows = fps.select(
        F.lit("afp").alias("variant"),
        F.col("media_id").alias("s"),
        F.col("afp").alias("a"),
        F.col("n_samples").alias("b"),
    )
    apair_rows = hamming_near_dup(fps, "afp", bands=4, max_hamming=3).select(
        F.lit("apairs").alias("variant"),
        F.concat_ws("|", "id_a", "id_b").alias("s"),
        F.col("hamming").cast("long").alias("a"),
        F.lit(None).cast("long").alias("b"),
    )
    return (
        hash_rows.unionByName(pair_rows)
        .unionByName(afp_rows)
        .unionByName(apair_rows)
    )


_MEDIA_CRAWL_CACHE: dict = {}


def media_crawl_archives(spark: SparkSession, sf: str) -> str:
    """Memoized per (session, sf): crawl-shaped ``.warc.gz`` archives
    (32 shards, one gzip member per record — the read_warc unit of
    parallelism is the FILE, so the shard count IS the scan width; 4
    shards measured 9.7 s against ~1.4 s at 32 on local[32]) whose
    responses carry the
    BINARY image fixtures of :func:`_dedup_image_bytes`, plus the noise
    records a real crawl has (warcinfo, a request, a text/html page) —
    the content-type gate downstream must drop them.  Fixture
    scaffolding, not pipeline work, hence the memoization."""
    import atexit
    import gzip as _gzip
    import shutil
    import tempfile

    from architxt_spark.sources.warc import build_warc

    key = (spark.sparkContext.applicationId, sf)
    if key not in _MEDIA_CRAWL_CACHE:
        ids = [
            int(r.doc_id)
            for r in _t(spark, sf, "documents").select("doc_id").orderBy("doc_id").collect()
        ]
        root = tempfile.mkdtemp(prefix="architxt_mediacrawl_")
        atexit.register(shutil.rmtree, root, ignore_errors=True)
        ctypes = {0: "image/png", 1: "image/jpeg", 2: "image/png", 3: "image/gif"}
        for part in range(32):
            recs = [
                {
                    "warc_type": "warcinfo",
                    "target_uri": "",
                    "payload": f"software: media-crawler/{part}\r\n".encode(),
                    "content_type": "application/warc-fields",
                },
                {
                    "warc_type": "request",
                    "target_uri": f"http://media.test/{part}",
                    "payload": b"GET / HTTP/1.1\r\nHost: media.test\r\n\r\n",
                    "content_type": "application/http; msgtype=request",
                },
                {
                    "warc_type": "response",
                    "target_uri": f"http://media.test/page-{part}.html",
                    "payload": b"<html><body><p>an index page</p></body></html>",
                    "content_type": "text/html; charset=utf-8",
                },
            ]
            recs += [
                {
                    "warc_type": "response",
                    "target_uri": f"img:{d}",
                    "payload": _dedup_image_bytes(d),
                    "content_type": ctypes[d % 4],
                }
                for d in ids
                if d % 32 == part
            ]
            with open(f"{root}/media-{part}.warc.gz", "wb") as f:
                for rec in recs:
                    f.write(_gzip.compress(build_warc([rec]), 1))
        _MEDIA_CRAWL_CACHE[key] = root
    return _MEDIA_CRAWL_CACHE[key]


def q_crawl_media_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """The crawl→image-dedup composite (r11.5): ``read_warc`` with
    ``extract_text=False`` → content-type gate keeps ``image/*``
    responses only → REAL pixel decode + perceptual hashes over the
    BINARY payloads → Hamming-banded near-dup pairs.  Gates the seam no
    other oracle crosses — binary payload bytes surviving the WARC
    write→gzip→split→parse round trip EXACTLY (one flipped byte anywhere
    breaks a decode or flips a hash) — with the same closed-form
    hash/pairs oracle as ``multimodal_dedup`` (same fixture formula, so
    the SQL twin is shared verbatim)."""
    from architxt_spark.functions.imagehash import hamming_near_dup, image_hashes
    from architxt_spark.sources.warc import read_warc

    recs = read_warc(spark, media_crawl_archives(spark, sf), extract_text=False)
    media = recs.filter(F.col("content_type").startswith("image/")).select(
        F.regexp_extract("target_uri", r"^img:(\d+)$", 1).alias("media_id"),
        F.col("payload").alias("content"),
    )
    hashes = image_hashes(media).persist()
    hashes.count()  # eager: the hash variant and both band-join sides
    hash_rows = hashes.select(
        F.lit("hash").alias("variant"),
        F.col("media_id").alias("s"),
        F.col("dhash").alias("a"),
        F.col("ahash").alias("b"),
    )
    pair_rows = hamming_near_dup(hashes, bands=4, max_hamming=3).select(
        F.lit("pairs").alias("variant"),
        F.concat_ws("|", "id_a", "id_b").alias("s"),
        F.col("hamming").cast("long").alias("a"),
        F.lit(None).cast("long").alias("b"),
    )
    return hash_rows.unionByName(pair_rows)


def q_doc_loader_files(spark: SparkSession, sf: str) -> DataFrame:
    """File-format reader gate (r11.5): every document in the %3==1
    slice is WRITTEN as a real office/PDF/legacy-Excel file and READ
    BACK through the stdlib readers inside the Arrow boundary —
    ``doc_id % 5`` picks .xls (OLE2+BIFF8) / .docx / .odt / .pdf /
    .pptx.  The
    per-format census (count, chars, XOR of readback-md5 prefixes) is
    replayed closed-form by the oracle: the writers are exact on the
    control-cleaned text (PDF additionally ASCII-projected — its
    content streams are latin-1), so any cell/paragraph/page loss or
    mis-decoded byte in `sources/xls.py`, `sources/office.py`, or
    `sources/pdf.py` flips the hash.  One registry row gating all the
    stdlib file readers — the fold-over-new-rows tradeoff applied to
    the loader tail."""
    import pandas as pd

    from architxt_spark.functions.dedup import _spread

    docs = (
        _t(spark, sf, "documents")
        .select("doc_id", "text")
        .filter(F.col("doc_id") % 3 == 1)
    )

    def rt(batches):
        import hashlib
        import os
        import re
        import tempfile

        from architxt_spark.sources.office import (
            make_docx_bytes,
            make_odt_bytes,
            make_pptx_bytes,
            read_docx_paragraphs,
            read_odt_paragraphs,
            read_pptx_slides,
        )
        from architxt_spark.sources.pdf import make_pdf_bytes, read_pdf_pages
        from architxt_spark.sources.xls import _read_xls_stdlib, make_xls_bytes

        ctrl = re.compile(r"[\x00-\x1f\x7f]")
        nonascii = re.compile(r"[^ -~]")
        for pdf_ in batches:
            rows = []
            for d, text in zip(pdf_["doc_id"], pdf_["text"]):
                d = int(d)
                clean = f"d{d}: " + ctrl.sub(" ", text or "")
                m = d % 5
                if m == 0:
                    # r12: rotate the spreadsheet shapes — CryptoAPI RC4
                    # (SHA-1 lineage), binary RC4 (MD5 lineage, the
                    # VelvetSweatshop default), and plain; r13 adds the
                    # pre-OLE2 BIFF4 raw-stream shape (Excel 2.x-4.0 —
                    # the sheet name becomes Sheet1, values byte-equal)
                    # and the d%4==3 residue travels as .ods (the ODF
                    # table walk through read_ods_sheets)
                    from architxt_spark.sources.xls import DEFAULT_XLS_PASSWORD

                    if d % 4 == 3:
                        from architxt_spark.sources.office import (
                            make_ods_bytes,
                            read_ods_sheets,
                        )

                        blob = make_ods_bytes({"S": [["t"], [clean]]})
                        back = read_ods_sheets(blob)["S"][0]["t"]
                        fmt = "ods"
                    else:
                        kw = {}
                        if d % 4 == 0:
                            kw = {"password": DEFAULT_XLS_PASSWORD, "crypto_api": True}
                        elif d % 4 == 1:
                            # r14: the legacy-wrap slot alternates
                            # binary RC4 (MD5 lineage) with XOR
                            # method-0 obfuscation (d%8 splits the
                            # d≡25 (mod 60) residue into both)
                            kw = {
                                "password": DEFAULT_XLS_PASSWORD,
                                "xor_obfuscation": d % 8 == 5,
                            }
                        elif d % 4 == 2:
                            # byte-string cells: only exact for
                            # cp1252-safe text (BIFF8 keeps UTF-16)
                            try:
                                clean.encode("cp1252")
                                kw = {"biff": 4}
                            except UnicodeEncodeError:
                                pass
                        # r14.5: the d%8==6 residue stores its value as
                        # a FORMULA record's cached STRING result (the
                        # computed-cell read path) — readback is byte-
                        # equal, so the oracle hash is shape-independent
                        from architxt_spark.sources.xls import XlsFormula

                        cell = XlsFormula(clean) if d % 8 == 6 else clean
                        blob = make_xls_bytes({"S": [["t"], [cell]]}, **kw)
                        with tempfile.NamedTemporaryFile(
                            suffix=".xls", delete=False
                        ) as f:
                            f.write(blob)
                            p = f.name
                        try:
                            back = next(iter(_read_xls_stdlib(p).values()))[0]["t"]
                        finally:
                            os.unlink(p)
                        fmt = "xls"
                elif m == 1:
                    # r12: half the docx docs travel as password-
                    # protected OLE2 containers (Standard / Agile
                    # encryption under Excel's default password);
                    # r14: the d%8==7 residue travels as legacy Word
                    # binary .doc (FIB + piece table, mixed cp1252/
                    # UTF-16 pieces) and the d%8==5 residue as RTF
                    # (\\uN escapes) — readback is byte-equal in every
                    # wrap, so the oracle hash is wrap-independent
                    if d % 8 == 7:
                        from architxt_spark.sources.worddoc import (
                            make_doc_bytes,
                            read_doc_paragraphs,
                        )

                        blob = make_doc_bytes([clean])
                        back = read_doc_paragraphs(blob)[0]
                    elif d % 8 == 5:
                        from architxt_spark.sources.rtf import (
                            make_rtf_bytes,
                            read_rtf_text,
                        )

                        blob = make_rtf_bytes([clean])
                        back = read_rtf_text(blob)[0]
                    else:
                        blob = make_docx_bytes([clean])
                        wrap = {0: "standard", 2: "agile"}.get(d % 4)
                        if wrap:
                            from architxt_spark.sources.ooxml_crypto import (
                                make_encrypted_ooxml,
                            )

                            blob = make_encrypted_ooxml(blob, scheme=wrap)
                        back = read_docx_paragraphs(blob)[0]
                    fmt = "docx"
                elif m == 2:
                    # r12: half the odt docs travel password-protected.
                    # r13: the encrypted half rotates SCHEME per doc —
                    # ODF 1.2 (PBKDF2 + AES-256-CBC) and the OpenOffice
                    # ≤3.x legacy shape (SHA-1 start key, 16-byte PBKDF2
                    # key, Blowfish 64-bit CFB, SHA1/1K checksum) — over
                    # the raw-deflated content.xml; readback byte-equal
                    # in every shape, so the oracle hash is
                    # wrap-independent
                    blob = make_odt_bytes([clean])
                    if d % 4 < 2:
                        from architxt_spark.sources.ooxml_crypto import (
                            make_encrypted_odt,
                        )

                        scheme = "aes" if d % 4 == 0 else "blowfish"
                        blob = make_encrypted_odt(blob, "gate", scheme=scheme)
                        back = read_odt_paragraphs(blob, password="gate")[0]
                    else:
                        back = read_odt_paragraphs(blob)[0]
                    fmt = "odt"
                elif m == 3:
                    pclean = nonascii.sub("?", clean).rstrip()
                    # r12: alternate the file SHAPE per doc so the gate
                    # drives the widened reader — classic xref table,
                    # PDF 1.5 object-streams + predictor-coded xref
                    # stream, and ToUnicode-CMap'd (code-shifted)
                    # strings; readback is byte-equal in every shape, so
                    # the oracle hash is shape-independent
                    # pdf docs satisfy d ≡ 13 (mod 15): d%4 cycles
                    # 1,0,3,2, d%2 alternates, and d%7 cycles all seven
                    # residues — every combination of {classic, objstm}
                    # × {plain, tounicode, cid} × {clear, RC4, AES-128,
                    # AES-256} recurs across the slice
                    enc = {0: False, 1: "rc4", 2: "aesv2", 3: "aesv3"}[
                        d % 7 % 4
                    ]
                    back = read_pdf_pages(
                        make_pdf_bytes(
                            [pclean],
                            object_streams=bool(d % 2 == 0),
                            tounicode=bool(d % 4 < 2),
                            cid=bool(d % 4 == 2),
                            encrypt=enc,
                        )
                    )[0]
                    fmt = "pdf"
                else:
                    # r14: the d%8==1 residue travels as legacy
                    # PowerPoint binary .ppt (SlideListWithText record
                    # tree) — readback byte-equal, wrap-independent hash
                    if d % 8 == 1:
                        from architxt_spark.sources.ppt import (
                            make_ppt_bytes,
                            read_ppt_slides,
                        )

                        blob = make_ppt_bytes([clean])
                        back = read_ppt_slides(blob)[0]
                    else:
                        blob = make_pptx_bytes([clean])
                        wrap = {0: "standard", 2: "agile"}.get(d % 4)
                        if wrap:
                            from architxt_spark.sources.ooxml_crypto import (
                                make_encrypted_ooxml,
                            )

                            blob = make_encrypted_ooxml(blob, scheme=wrap)
                        back = read_pptx_slides(blob)[0]
                    fmt = "pptx"
                h = int(hashlib.md5(back.encode("utf-8")).hexdigest()[:15], 16)
                rows.append((fmt, len(back), h))
            yield pd.DataFrame(rows, columns=["fmt", "n_chars", "h"])

    rt_df = _spread(docs).mapInPandas(rt, "fmt string, n_chars long, h long")
    return rt_df.groupBy("fmt").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("n_chars"),
        F.bit_xor("h").alias("content_hash"),
    )


def q_gen_instance(spark: SparkSession, sf: str) -> DataFrame:
    """Synthetic instance generator: schema → size×(group/relation shapes)
    via range × broadcast-template cross join; census oracle."""
    from architxt_spark.generator import gen_instance
    from architxt_spark.plans.schema import Relation, RelationOrientation, SchemaPlan

    schema = SchemaPlan(
        groups={"person": frozenset({"name", "age"}), "city": frozenset({"zip"})},
        relations={Relation("person<->city", "person", "city", RelationOrientation.RIGHT)},
    )
    nodes = gen_instance(spark, schema, size=100)
    return (
        nodes.groupBy(
            F.coalesce(F.col("node_type"), F.lit("UNTYPED")).alias("node_type"),
            F.coalesce(F.col("node_name"), F.lit("")).alias("node_name"),
        )
        .agg(F.count("*").alias("n"))
    )


def q_llm_rewrite_stub(spark: SparkSession, sf: str) -> DataFrame:
    """LLM-rewrite plumbing (token-budgeted batching + per-batch fallback)
    with the deterministic uppercase normalizer standing in for the model
    endpoint; GROUP-label census after the rewrite."""
    from architxt_spark.llm import UppercaseGroupNormalizer, llm_rewrite
    from architxt_spark.sources.documents import row_trees

    docs = _t(spark, sf, "documents").select("doc_id", "lang", "source")
    nodes = row_trees(docs, "documents", ["doc_id"])
    out = llm_rewrite(nodes, UppercaseGroupNormalizer)
    return (
        out.filter(F.col("node_type") == "GROUP")
        .groupBy(F.col("node_name").alias("group_name"))
        .agg(F.count("*").alias("n"))
    )


def q_extract_vocab(spark: SparkSession, sf: str) -> DataFrame:
    """Label-vocabulary extraction: distributed support counts + driver-side
    fuzzy merge over the (tiny) distinct label set."""
    from architxt_spark.llm import extract_vocab
    from architxt_spark.sources.documents import row_trees

    docs = _t(spark, sf, "documents").select("doc_id", "lang")
    nat = _t(spark, sf, "nation").select("n_nationkey", "n_name")
    nodes = row_trees(docs, "documents", ["doc_id"]).unionByName(
        row_trees(nat, "nation", ["n_nationkey"])
    )
    vocab = extract_vocab(nodes, min_support=2)
    return spark.createDataFrame(vocab, "label string, support long")


# ---------------------------------------------------------------------------
# NLP enrichment (text → meta-model)
# ---------------------------------------------------------------------------


def _coord_enrich_golden() -> tuple[int, int, int, int]:
    """Golden census of the coordination-fix + entity-enrichment family
    (r13 fold; nlp/parser.py:294-560, reference
    ``parser/__init__.py:179-407``): a COORD/CCONJ tree through
    ``fix_all_coord`` (lift-next-to-host + CONJ flattening) and a
    3-entity sentence through ``enrich_sentence_tree`` exercising
    longest-first insertion, the nested-entity ``REL::nested`` unnest,
    and partial-overlap token duplication.  Returns
    (n_nodes, n_leaves, n_entities, shape_hash) over both trees —
    any behavioral drift in the family flips the shape hash."""
    import hashlib
    import json

    from architxt_spark.nlp.parser import enrich_sentence_tree, fix_all_coord
    from architxt_spark.trees import PyTree, tree_to_rows

    t = PyTree("SENT", [
        "I",
        PyTree("VP", [
            "eat",
            PyTree("NP", ["apples"]),
            PyTree("COORD", [
                PyTree("CCONJ", ["and"]),
                PyTree("NP", ["pears"]),
                PyTree("NP", ["figs"]),
            ]),
        ]),
    ])
    fix_all_coord(t)
    t2 = enrich_sentence_tree(
        "alpha beta gamma delta",
        [("outer", 0, 16), ("inner", 6, 10), ("dup", 11, 21)],
    )

    def canon(n):
        return n if isinstance(n, str) else [n.label, [canon(c) for c in n.children]]

    rows = tree_to_rows(t, "g1") + tree_to_rows(t2, "g2")
    blob = json.dumps([canon(t), canon(t2)])
    return (
        len(rows),
        sum(1 for r in rows if r["leaf_value"] is not None),
        sum(1 for r in rows if r["node_type"] == "ENT"),
        int(hashlib.md5(blob.encode()).hexdigest()[:15], 16),
    )


def q_nlp_parse_forest(spark: SparkSession, sf: str) -> DataFrame:
    """Sentence splitting (absolute char offsets, per-sentence token
    counts) PLUS the distributed-parse forest census (stub constituency
    parser behind the real mapInPandas boundary) broadcast onto every
    sentence row, PLUS (r13 fold) the coord-fix/enrich golden census
    columns (:func:`_coord_enrich_golden`).  Registry fold of the former
    split_sentences — all three coverages verified in one frame."""
    from architxt_spark.nlp import parse_sentences_df, split_sentences

    docs = _t(spark, sf, "documents").select("doc_id", F.col("text").alias("txt"))
    sents = split_sentences(docs)
    g_nodes, g_leaves, g_ents, g_hash = _coord_enrich_golden()
    census = parse_sentences_df(sents).agg(
        F.countDistinct("tree_id").alias("n_trees"),
        F.count("*").alias("n_nodes"),
        F.count("leaf_value").alias("n_leaves"),
    ).select(
        "*",
        F.lit(g_nodes).cast("long").alias("golden_nodes"),
        F.lit(g_leaves).cast("long").alias("golden_leaves"),
        F.lit(g_ents).cast("long").alias("golden_ents"),
        F.lit(g_hash).cast("long").alias("golden_shape_hash"),
    )
    return sents.select(
        "doc_id",
        "sent_idx",
        "sent_start",
        "sent_end",
        T.token_count(F.col("sentence")).alias("n_tokens"),
    ).crossJoin(F.broadcast(census))


# ---------------------------------------------------------------------------
# similarity search II + text distribution
# ---------------------------------------------------------------------------


#: (applicationId, sf_dir) -> (index_path, trained-codebook DataFrame).
#: The persisted IVF serving index is deterministic for a given corpus,
#: so it is built ONCE per Spark session per sf dir — every later call
#: (ann_suite probes, ann_recall's indexed A/B) measures the serving
#: regime the variant exists for; bench.py times the build itself as
#: its own ann_index_build line.
_IVF_INDEX_CACHE: dict = {}


def ivf_serving_index(spark: SparkSession, sf: str, *, rebuild: bool = False):
    """Trained codebook + cell-partitioned parquet index for ``sf``'s
    embeddings table, memoized per Spark session.  ``rebuild=True``
    forces a fresh build into a new temp dir (the bench's explicit
    build-cost measurement); the previous build's temp dir is removed
    on rebuild and every live dir is reaped at exit, so long-lived
    processes don't accumulate orphaned indexes in /tmp."""
    import atexit
    import shutil
    import tempfile

    key = (spark.sparkContext.applicationId, sf)
    if rebuild or key not in _IVF_INDEX_CACHE:
        old = _IVF_INDEX_CACHE.pop(key, None)
        if old is not None:
            shutil.rmtree(os.path.dirname(old[0]), ignore_errors=True)
        emb = _t(spark, sf, "embeddings")
        cb = ann.train_codebook(emb, n_cells=16, iterations=2)
        root = tempfile.mkdtemp(prefix="ivfidx_")
        atexit.register(shutil.rmtree, root, ignore_errors=True)
        idx = root + "/index"
        ann.build_ivf_index(emb, cb, idx)
        _IVF_INDEX_CACHE[key] = (idx, cb)
    return _IVF_INDEX_CACHE[key]


def q_ann_ivf_topk(spark: SparkSession, sf: str) -> DataFrame:
    """IVF partition-pruning ANN, both codebook paths tagged in one frame:
    'first' = deterministic first-N codebook; 'trained' = two
    deterministic Lloyd rounds (assign-to-nearest + rounded per-dimension
    means, empty cells keep their centroid) before the same
    probe/re-score path; 'indexed' (r8) = the PERSISTED-index serving
    path — build_ivf_index materializes the trained codebook's inverted
    file as cell-partitioned parquet and ivf_topk_indexed answers the
    same queries through parquet partition PRUNING, so the at-rest
    100-TB layout itself sits under the hash gate (results provably
    identical to the in-memory 'trained' path).  The index is built
    once per session (``ivf_serving_index``) — the 'indexed' variant
    here measures the SERVING regime (probe + prune), not a per-call
    rebuild; bench.py records the build as its own line.  Registry
    fold of the former ann_ivf_trained — zero coverage loss."""
    emb = _t(spark, sf, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    first = ann.ivf_topk(emb, queries, k=5, n_cells=16, nprobe=4).select(
        F.lit("first").alias("variant"), "*"
    )
    # the trained codebook is deterministic in (sf) and identical to the
    # one the memoized serving index trains — reuse it instead of paying
    # two Lloyd rounds per call (r10; values unchanged, oracle unchanged)
    idx, cb_idx = ivf_serving_index(spark, sf)
    trained = ann.ivf_topk(
        emb, queries, k=5, n_cells=16, nprobe=4, centroids=cb_idx
    ).select(F.lit("trained").alias("variant"), "*")
    indexed = ann.ivf_topk_indexed(
        spark, idx, queries, cb_idx, k=5, nprobe=4
    ).select(F.lit("indexed").alias("variant"), "*")
    return first.unionByName(trained).unionByName(indexed)



def q_semantic_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """SemDeDup-style semantic deduplication: k-means the embeddings with
    the trained IVF codebook (2 deterministic Lloyd rounds), then drop
    within-cell cosine near-duplicates above the threshold — pairs are
    generated ONLY inside a cell (shuffle on cell_id, never all-pairs),
    min-id representative kept (`functions/ann.py` semantic_dedup)."""
    emb = _t(spark, sf, "embeddings")
    _idx, cb = ivf_serving_index(spark, sf)  # same deterministic codebook
    return ann.semantic_dedup(emb, n_cells=16, threshold=0.35, centroids=cb)



def q_dsir_scores(spark: SparkSession, sf: str) -> DataFrame:
    """DSIR importance weighting (Xie et al. 2023): hashed word
    unigram+bigram bucket models of a target slice (doc_id < 25 stands in
    for the vetted corpus) vs the raw corpus; per-doc mean log probability
    ratio with DECIMAL summation.  Bucket tables are bounded and
    broadcast; the only data-row shuffle is the per-doc sum
    (`functions/dsir.py`)."""
    from architxt_spark.functions import dsir

    docs = _t(spark, sf, "documents").select("doc_id", "text")
    return dsir.dsir_scores(docs, docs.filter(F.col("doc_id") < 25))



_DSIR_MODEL_CACHE: dict = {}


def dsir_model(spark: SparkSession, sf: str) -> DataFrame:
    """Memoized DSIR importance model per (session, sf) — the fit-once
    artifact (Xie et al. estimate the ratio model per corpus snapshot,
    then score every batch); bucket-bounded, barriered once."""
    from architxt_spark.functions import dsir
    from architxt_spark.session import stage_barrier

    key = (spark.sparkContext.applicationId, sf)
    if key not in _DSIR_MODEL_CACHE:
        docs = _t(spark, sf, "documents").select("doc_id", "text")
        _DSIR_MODEL_CACHE[key] = stage_barrier(
            dsir.dsir_ratio_model(docs, docs.filter(F.col("doc_id") < 25))
        )
    return _DSIR_MODEL_CACHE[key]


def q_dsir(spark: SparkSession, sf: str) -> DataFrame:
    """Registry fold of the DSIR pair: 'score' rows are the per-document
    importance weights (a = n_feats, b = dsir_score; former
    dsir_scores); 'select' rows the Gumbel-top-k resampling take
    (a = sel_key, b = sel_rank; former dsir_select — deterministic
    Gumbel from the salted doc hash, global top-k via TakeOrdered).
    One (part, doc_id, a, b) frame (`functions/dsir.py`).  The ratio
    model is the once-per-session artifact (``dsir_model``); each call
    pays the scoring pass."""
    from architxt_spark.functions import dsir
    from architxt_spark.session import stage_barrier

    docs = _t(spark, sf, "documents").select("doc_id", "text")
    target = docs.filter(F.col("doc_id") < 25)
    # one scoring pass (per-doc DECIMAL sums over the broadcast model)
    # feeds BOTH parts — without the barrier the select branch re-runs it
    scored = stage_barrier(
        dsir.dsir_scores(docs, target, ratios=dsir_model(spark, sf))
    )
    score = scored.select(
        F.lit("score").alias("part"),
        "doc_id",
        F.col("n_feats").cast("double").alias("a"),
        F.col("dsir_score").alias("b"),
    )
    select = dsir.dsir_select_from_scores(scored, k=50, salt="ds").select(
        F.lit("select").alias("part"),
        "doc_id",
        F.col("sel_key").alias("a"),
        F.col("sel_rank").cast("double").alias("b"),
    )
    return score.unionByName(select)


def q_fm_distinct_tokens(spark: SparkSession, sf: str) -> DataFrame:
    """Flajolet-Martin PCSA cardinality sketch over the corpus token
    stream, alongside the exact distinct count for error visibility: one
    map-combinable bit_or aggregate of m bucket bitmaps — the 100-TB
    cardinality pattern where exact count_distinct would shuffle every
    value (`functions/sketch.py`)."""
    from architxt_spark.functions import sketch

    toks = _t(spark, sf, "documents").select(
        F.explode(T.tokens(F.col("text"))).alias("tok")
    )
    est = sketch.fm_count_distinct(toks, "tok", m=256)
    exact = toks.agg(F.count_distinct("tok").cast("long").alias("exact_distinct"))
    return est.crossJoin(F.broadcast(exact))



def q_kmv_token_overlap(spark: SparkSession, sf: str) -> DataFrame:
    """KMV set-operation sketches: token-vocabulary overlap between the
    even- and odd-doc_id halves of the corpus — two mergeable k-min-hash
    sketches (only k longs each cross the wire), then distinct/union/
    Jaccard estimates as pure array ops, with the exact Jaccard
    side-by-side (`functions/sketch.py` kmv_sketch/kmv_estimates)."""
    from architxt_spark.functions import sketch

    docs = _t(spark, sf, "documents")
    toks = lambda pred: docs.filter(pred).select(
        F.explode(T.tokens(F.col("text"))).alias("tok")
    )
    even, odd = toks(F.col("doc_id") % 2 == 0), toks(F.col("doc_id") % 2 == 1)
    est = sketch.kmv_estimates(
        sketch.kmv_sketch(even, "tok", k=64), sketch.kmv_sketch(odd, "tok", k=64), k=64
    )
    ev = even.select("tok").distinct()
    od = odd.select("tok").distinct()
    exact = (
        ev.join(od, "tok").agg(F.count("*").alias("__i"))
        .crossJoin(F.broadcast(ev.unionByName(od).distinct().agg(F.count("*").alias("__u"))))
        .select(F.round(F.col("__i") / F.col("__u"), 4).alias("exact_jaccard"))
    )
    return est.crossJoin(F.broadcast(exact))



def q_bloom_screen(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic Bloom membership screen: build the filter over the
    benchmark slice's token vocabulary (doc_id < 25), probe the full
    corpus vocabulary — the broadcast pre-join contamination screen,
    reproducible across engines unlike the JVM bloom machinery
    (`functions/sketch.py` bloom_build/bloom_probe)."""
    from architxt_spark.functions import sketch

    docs = _t(spark, sf, "documents")
    toks = lambda frame: frame.select(F.explode(T.tokens(F.col("text"))).alias("tok"))
    bloom = sketch.bloom_build(
        toks(docs.filter(F.col("doc_id") < 25)), "tok", n_bits=2048, n_hashes=3
    )
    vocab = toks(docs).distinct()
    return sketch.bloom_probe(vocab, bloom, "tok", n_bits=2048, n_hashes=3)



def q_stream_fm_distinct(spark: SparkSession, sf: str) -> DataFrame:
    """Incremental streaming cardinality: the documents table split into
    two files streams through foreachBatch, each batch appending its FM
    bucket bitmaps to parquet state; the final estimate bit_or-merges the
    state.  Because the sketch state is an idempotent commutative
    monoid, the streamed estimate is BIT-IDENTICAL to the batch sketch
    over the whole corpus — which is exactly what the oracle computes
    (`streaming/corpus.py` stream_fm_distinct, `functions/sketch.py`)."""
    import tempfile

    from architxt_spark.functions.sketch import fm_estimate
    from architxt_spark.streaming.corpus import stream_fm_distinct

    # fresh scratch per invocation: hermetic (repo-location-independent)
    # and safe under concurrent drivers; the state dir must outlive this
    # call (the returned frame reads it lazily), so no cleanup here
    scratch = tempfile.mkdtemp(prefix="architxt_stream_fm_")
    src_dir, state, ckpt = (f"{scratch}/{d}" for d in ("src", "state", "ckpt"))

    docs = _t(spark, sf, "documents").select("doc_id", "text")
    for batch_filter in (F.col("doc_id") % 2 == 0, F.col("doc_id") % 2 == 1):
        docs.filter(batch_filter).coalesce(1).write.mode("append").parquet(src_dir)
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir)
        )
        _await_stream(stream_fm_distinct(stream, state, ckpt, m=256))
    return fm_estimate(spark.read.parquet(state), m=256)



def q_cms_token_freq(spark: SparkSession, sf: str) -> DataFrame:
    """Count-min frequency sketch: build over the corpus token stream,
    probe the benchmark slice's vocabulary with the exact counts
    side-by-side — the "how often" member of the deterministic sketch
    suite (`functions/sketch.py` cms_build/cms_query)."""
    from architxt_spark.functions import sketch

    docs = _t(spark, sf, "documents")
    stream = docs.select(F.explode(T.tokens(F.col("text"))).alias("tok"))
    cms = sketch.cms_build(stream, "tok", width=1024, depth=4)
    vocab = (
        docs.filter(F.col("doc_id") < 25)
        .select(F.explode(T.tokens(F.col("text"))).alias("tok"))
        .distinct()
    )
    est = sketch.cms_query(vocab, cms, "tok", width=1024, depth=4)
    exact = stream.groupBy("tok").agg(F.count("*").cast("long").alias("exact_count"))
    return est.join(exact, "tok", "left").select(
        "tok", "est_count", F.coalesce("exact_count", F.lit(0)).alias("exact_count")
    )



def q_sketch_suite(spark: SparkSession, sf: str) -> DataFrame:
    """Registry fold of the deterministic sketch suite (FM-PCSA
    cardinality, KMV set-operations, Bloom membership, count-min
    frequency) into ONE tagged long-form frame — (sketch, k, metric,
    value) — zero coverage loss vs the former four entries: every value
    each sketch produced is a row here, exact counterparts included."""

    def melt(df: DataFrame, tag: str, key_col: str | None, metrics: list[str]) -> DataFrame:
        parts = [
            df.select(
                F.lit(tag).alias("sketch"),
                (F.col(key_col).cast("string") if key_col else F.lit("")).alias("k"),
                F.lit(m).alias("metric"),
                F.col(m).cast("double").alias("value"),
            )
            for m in metrics
        ]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    fm = q_fm_distinct_tokens(spark, sf)
    kmv = q_kmv_token_overlap(spark, sf)
    bloom = q_bloom_screen(spark, sf).withColumn(
        "member", F.col("maybe_member").cast("int")
    )
    cms = q_cms_token_freq(spark, sf)
    # r7 fold: the STREAMING incremental FM twin (former stream_fm_distinct
    # entry) — its bit_or-merged state must reproduce the batch sketch
    fm_stream = q_stream_fm_distinct(spark, sf)
    return (
        melt(fm, "fm", None, ["m", "est_distinct", "exact_distinct"])
        .unionByName(
            melt(kmv, "kmv", None, ["est_a", "est_b", "est_union", "est_jaccard", "exact_jaccard"])
        )
        .unionByName(melt(bloom, "bloom", "tok", ["member"]))
        .unionByName(melt(cms, "cms", "tok", ["est_count", "exact_count"]))
        .unionByName(melt(fm_stream, "fm_stream", None, ["m", "est_distinct"]))
    )


def q_bpe_tokenizer(spark: SparkSession, sf: str) -> DataFrame:
    """Registry fold of the trained tokenizer: 'encode' rows are the
    per-token occurrence counts of the train-then-apply encoder (former
    bpe_encode_counts), 'vocab' rows the induced vocabulary with n =
    token_id (former bpe_vocab), 'fertility' rows the per-language
    word/token counts that drive per-language token budgeting (token =
    lang, kind = n_words|n_tokens).  One (part, token, kind, n) frame.
    The merge table trains ONCE (one corpus wordcount job) and feeds all
    three branches — the former per-branch retraining tripled the
    wordcount shuffle for identical merges."""
    from architxt_spark.functions import bpe

    docs = _t(spark, sf, "documents").select("doc_id", "lang", "text")
    merges = [
        (r.left, r.right)
        for r in bpe.train_bpe_merges(docs, n_merges=6).orderBy("step").collect()
    ]
    enc = (
        bpe.bpe_encode(docs, merges)
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
        .select(
            F.lit("encode").alias("part"),
            "token",
            F.lit("").alias("kind"),
            F.col("cnt").cast("long").alias("n"),
        )
    )
    voc = bpe.vocab_from_merges(docs, merges).select(
        F.lit("vocab").alias("part"),
        "token",
        "kind",
        F.col("token_id").cast("long").alias("n"),
    )
    fert = bpe.bpe_fertility(docs, merges, group_col="lang")
    fert_rows = fert.select(
        F.lit("fertility").alias("part"),
        F.col("lang").alias("token"),
        F.lit("n_words").alias("kind"),
        F.col("n_words").alias("n"),
    ).unionByName(
        fert.select(
            F.lit("fertility").alias("part"),
            F.col("lang").alias("token"),
            F.lit("n_tokens").alias("kind"),
            F.col("n_tokens").alias("n"),
        )
    )
    return enc.unionByName(voc).unionByName(fert_rows)


def q_chunk_pipeline(spark: SparkSession, sf: str) -> DataFrame:
    """Registry fold of chunk-hash dedup: 'detect' rows are the per-chunk
    occurrence/keep decisions (former chunk_dedup), 'strip' rows the
    rebuilt-document verification (former chunk_strip; chunk_id = -1,
    h = md5 of the rebuilt text, a = n_chunks, b = n_kept)."""
    det = q_chunk_dedup(spark, sf).select(
        F.lit("detect").alias("part"),
        "doc_id",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.col("chunk_md5").alias("h"),
        F.col("n_occ").cast("long").alias("a"),
        F.col("kept").cast("long").alias("b"),
    )
    strip = q_chunk_strip(spark, sf).select(
        F.lit("strip").alias("part"),
        "doc_id",
        F.lit(-1).cast("long").alias("chunk_id"),
        F.col("clean_md5").alias("h"),
        F.col("n_chunks").cast("long").alias("a"),
        F.col("n_kept").cast("long").alias("b"),
    )
    return det.unionByName(strip)


#: curation-pipeline mixture: per-language take counts for the exact
#: mixture stage (shared by the Spark query and its DuckDB twin)
_CURATE_MIX = {"en": 60, "fr": 25, "de": 25, "es": 25, "zh": 25}


_QUALITY_MODEL_CACHE: dict = {}


def quality_model_weights(spark: SparkSession, sf: str) -> DataFrame:
    """Memoized trained quality-model weights per (session, sf) — the
    train-once / score-many serving split (same posture as the ANN
    serving index and the PQ codes): a pipeline trains its quality
    model once per corpus snapshot and scores every batch with it.
    Training is deterministic in the corpus (integer perceptron), so
    the scored margins are identical either way; the returned weight
    table is an n_buckets-bounded driver-local frame.  bench.py times
    the model fits as their own model_build line."""
    from architxt_spark.functions.classifier import train_quality_classifier

    key = (spark.sparkContext.applicationId, sf)
    if key not in _QUALITY_MODEL_CACHE:
        # pos (doc_id < 25) and neg partition the SAME table: one
        # labelled scan instead of two file reads (r15, label_col path)
        docs = _t(spark, sf, "documents").select("doc_id", "text")
        _QUALITY_MODEL_CACHE[key] = train_quality_classifier(
            docs.withColumn(
                "__y", F.when(F.col("doc_id") < 25, 1).otherwise(-1)
            ),
            label_col="__y",
        )
    return _QUALITY_MODEL_CACHE[key]


def q_quality_classifier(spark: SparkSession, sf: str) -> DataFrame:
    """fastText-style model-based quality filter: hashed-unigram linear
    classifier trained with 3 deterministic full-batch perceptron
    iterations (pos = the vetted doc_id<25 slice, neg = the rest), then
    every document scored by its integer margin — bit-exact across
    engines, the CCNet/LLaMA pipeline's quality-model stage
    (`functions/classifier.py`).  The trained weights are the
    once-per-session model artifact (``quality_model_weights``); each
    call pays the scoring pass."""
    from architxt_spark.functions.classifier import classifier_score

    docs = _t(spark, sf, "documents").select("doc_id", "text")
    return classifier_score(docs, quality_model_weights(spark, sf))


def q_domain_profile(spark: SparkSession, sf: str) -> DataFrame:
    """Domain-level curation signals (URL-screening stage): per-domain
    doc counts, corpus-wide duplicate-fingerprint counts, deterministic
    mean quality, and a blocklist flag — the domain-bounded frame a
    crawl pipeline broadcasts as its keep/drop side input
    (`functions/domains.py`)."""
    from architxt_spark.functions.domains import domain_profile

    return domain_profile(
        _t(spark, sf, "documents"), blocklist=("src3", "src7")
    )


#: appended to each document for the unicode-hygiene oracle so NFC,
#: control-strip, and punct-standardization all do real work on the
#: ASCII test corpus: decomposed e+combining-acute, curly quotes,
#: ellipsis, en-dash, NBSP, a C0 control, CRLF
_UNICODE_MARKER = "e\u0301 \u201cq\u201d\u2026\u2013\u00a0\x01ok\r\nend"

#: deterministic split fractions for the hash_split oracle
_SPLITS = {"train": 0.9, "valid": 0.05, "test": 0.05}


def q_unicode_split(spark: SparkSession, sf: str) -> DataFrame:
    """Unicode hygiene + leakage-safe split (the preprocessing a crawl
    corpus runs BEFORE any hashing): NFC normalization (Arrow-batched
    pandas_udf — Spark ships no normalizer expression), control-char
    strip + CRLF fold + typographic-punct standardization (codegen
    regexp/translate), then deterministic train/valid/test assignment by
    salted content-independent hash boundaries — a document's split
    never changes when other documents are added
    (`functions/text.py:clean_unicode`, `functions/sampling.py:hash_split`)."""
    from architxt_spark.functions.sampling import hash_split
    from architxt_spark.functions.text import clean_unicode

    docs = _t(spark, sf, "documents").select(
        "doc_id", F.concat("text", F.lit(_UNICODE_MARKER)).alias("text")
    )
    return hash_split(
        clean_unicode(docs, "text"), "doc_id", _SPLITS, salt="v1"
    ).select("doc_id", "text", "split")


def q_warc_split_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """WARC source under the hash gate — ALL THREE reader paths, tagged:

    - ``split``: the uncompressed byte-range reader
      (`sources/warc.py:read_warc_split`, boundaries landing mid-record);
    - ``stream``: the STREAMING default path (`read_warc`) over a
      CommonCrawl-layout ``.warc.gz`` (one gzip member per record,
      inflated incrementally — O(record) task memory, r7 rewrite);
    - ``idx``: the gz member-range splitter driven by the ``.idx``
      offset sidecar (member-aligned compressed splits).

    Each emits every record's payload md5; the oracle computes the same
    md5s directly from the source table × 3 tags, so parser, split
    sync, gzip member walk, and HTTP strip must all be byte-perfect."""
    import gzip as _gzip
    import tempfile

    from architxt_spark.sources.warc import build_warc, read_warc, read_warc_split

    rows = (
        _t(spark, sf, "documents")
        .select("doc_id", "text")
        .orderBy("doc_id")
        .collect()
    )
    recs = [
        {
            "warc_type": "response",
            "target_uri": f"doc:{r.doc_id}",
            "payload": r.text.encode("utf-8"),
            "content_type": "text/plain",
        }
        for r in rows
    ]
    scratch = tempfile.mkdtemp(prefix="architxt_warc_")
    with open(f"{scratch}/gate.warc", "wb") as f:
        f.write(build_warc(recs))
    # CommonCrawl layout: one gzip member per record + offset sidecar
    members = [_gzip.compress(build_warc([r])) for r in recs]
    gz_dir = tempfile.mkdtemp(prefix="architxt_warc_gz_")
    with open(f"{gz_dir}/gate.warc.gz", "wb") as f:
        f.write(b"".join(members))
    pos = 0
    with open(f"{gz_dir}/gate.warc.gz.idx", "w") as f:
        for m in members:
            f.write(f"{pos} {len(m)}\n")
            pos += len(m)

    def tagged(df: DataFrame, tag: str) -> DataFrame:
        return df.select(
            F.lit(tag).alias("reader"),
            F.col("target_uri").alias("uri"),
            F.md5("payload").alias("payload_md5"),
        )

    split = read_warc_split(spark, f"{scratch}/gate.warc", split_bytes=64 << 10,
                            extract_text=False)
    stream = read_warc(spark, f"{gz_dir}/gate.warc.gz", extract_text=False)
    via_idx = read_warc_split(spark, f"{gz_dir}/gate.warc.gz",
                              split_bytes=max(pos // 8, 1), extract_text=False)
    return (
        tagged(split, "split")
        .unionByName(tagged(stream, "stream"))
        .unionByName(tagged(via_idx, "idx"))
    )


_CRAWL_FIXTURE_CACHE: dict = {}


def crawl_fixture_archives(spark: SparkSession, sf: str) -> str:
    """Memoized per (session, sf): deterministic crawl-shaped ``.warc.gz``
    archives built from the documents table — 32 archives (doc_id % 32;
    the read_warc unit of parallelism is the FILE, so the shard count IS
    the scan width of every pre-shuffle stage downstream — with 4 shards
    the whole parse→gate→quality chain ran 4-wide on local[32] and the
    quality barrier alone drew ~8 s at sf0.1; ``media_crawl_archives``
    learned the same lesson in r11.5.  A real crawl is thousands of
    archives ≫ cores, so many-shards is also the representative layout),
    CommonCrawl layout (one gzip member per record), each page the
    document's text wrapped in minimal HTML (``html_to_text`` is exact
    identity on this corpus — verified at every SF — so the extraction
    seam is hash-gated, not approximated).  Each archive also carries
    NOISE records a real crawl has: warcinfo, a request, a 404 response,
    and an image/png response — the status/content-type gate downstream
    must drop them.  Fixture scaffolding, not pipeline work, hence the
    memoization (the measured op is read→curate→write)."""
    import atexit
    import gzip as _gzip
    import shutil
    import tempfile

    from architxt_spark.sources.warc import build_warc

    key = (spark.sparkContext.applicationId, sf)
    if key not in _CRAWL_FIXTURE_CACHE:
        rows = (
            _t(spark, sf, "documents")
            .select("doc_id", "text", "lang", "source")
            .orderBy("doc_id")
            .collect()
        )
        root = tempfile.mkdtemp(prefix="architxt_crawl_")
        atexit.register(shutil.rmtree, root, ignore_errors=True)
        for part in range(32):
            recs = [
                {
                    "warc_type": "warcinfo",
                    "target_uri": "",
                    "payload": f"software: fixture-crawler/{part}\r\n".encode(),
                    "content_type": "application/warc-fields",
                },
                {
                    "warc_type": "request",
                    "target_uri": f"http://crawl.test/{part}",
                    "payload": b"GET / HTTP/1.1\r\nHost: crawl.test\r\n\r\n",
                    "content_type": "application/http; msgtype=request",
                },
                {
                    "warc_type": "response",
                    "target_uri": f"http://crawl.test/missing-{part}",
                    "payload": b"<html><body>gone</body></html>",
                    "http_status": 404,
                },
                {
                    "warc_type": "response",
                    "target_uri": f"http://crawl.test/logo-{part}.png",
                    "payload": b"\x89PNG\r\n\x1a\nnot-really",
                    "content_type": "image/png",
                },
            ]
            recs += [
                {
                    "warc_type": "response",
                    "target_uri": f"doc:{r.doc_id}|{r.lang}|{r.source}",
                    "payload": f"<html><body><p>{r.text}</p></body></html>".encode(),
                    "content_type": "text/html; charset=utf-8",
                }
                for r in rows
                if r.doc_id % 32 == part
            ]
            members = [_gzip.compress(build_warc([r])) for r in recs]
            with open(f"{root}/crawl-{part:02d}.warc.gz", "wb") as f:
                f.write(b"".join(members))
        _CRAWL_FIXTURE_CACHE[key] = root
    return _CRAWL_FIXTURE_CACHE[key]


def q_crawl_to_corpus(spark: SparkSession, sf: str) -> DataFrame:
    """The production 100-TB job end to end under ONE hash gate (r11):
    ``read_warc`` (streaming gzip members) → HTTP status/content-type
    gate → URI metadata parse → ``curate_corpus`` (quality → near-dedup
    → eval-set decontamination → leakage-safe hash split) →
    ``write_corpus`` (hive-partitioned parquet by split + manifest) —
    the reference lifecycle's load→simplify composition
    (``architxt/cli/loader.py:163-224``) at crawl scale.

    Three tagged variants: 'crawl' pins the parser+extraction seam
    (per-lang doc counts + order-independent XOR of text-md5 prefixes —
    a single mis-parsed byte anywhere flips it); 'census' gates every
    curation stage count; 'manifest' gates the written corpus's
    per-split (n_docs, n_chars, content_hash).  The oracle replays all
    three from the documents table (extraction is exact identity on
    this corpus) through the same census/keep-set/split/manifest SQL."""
    import atexit
    import shutil
    import tempfile

    from architxt_spark.functions.curation import curate_corpus
    from architxt_spark.sinks.corpus import write_corpus
    from architxt_spark.sources.warc import read_warc

    recs = read_warc(spark, crawl_fixture_archives(spark, sf))
    docs = (
        recs.filter(
            (F.col("http_status") == 200)
            & F.col("content_type").contains("html")
            & F.col("target_uri").startswith("doc:")
        )
        .select(
            F.regexp_extract("target_uri", r"^doc:(\d+)\|", 1).cast("long").alias("doc_id"),
            "text",
            F.regexp_extract("target_uri", r"\|([^|]*)\|", 1).alias("lang"),
            F.regexp_extract("target_uri", r"\|([^|]*)$", 1).alias("source"),
            F.length("text").alias("n_chars"),
        )
        .persist()
    )
    docs.count()  # eager: the crawl census, decontam bench, curation
    # stages, and the sink all read this frame — without the barrier each
    # consumer re-runs the Python WARC parse chain (the chained-frame
    # persist rule; at real scale this materialization is the natural
    # land-the-crawl checkpoint)
    bench = docs.filter(F.col("doc_id") % 23 == 5).select("doc_id", "text")
    kept, census = curate_corpus(
        docs,
        decontaminate_against=bench,
        split_map={"train": 0.9, "valid": 0.1},
        salt="crawl",
    )
    out_root = tempfile.mkdtemp(prefix="architxt_corpusout_")
    atexit.register(shutil.rmtree, out_root, ignore_errors=True)
    manifest = write_corpus(
        kept.select("doc_id", "text", "lang", "source", "split"),
        f"{out_root}/corpus",
        partition_cols=["split"],
    )
    crawl_hash = F.conv(F.substring(F.md5(F.col("text")), 1, 15), 16, 10).cast("long")
    crawl = docs.groupBy("lang").agg(
        F.count("*").cast("long").alias("a"),
        F.bit_xor(crawl_hash).alias("c"),
    )
    return (
        crawl.select(
            F.lit("crawl").alias("variant"), F.col("lang").alias("s"),
            "a", F.lit(None).cast("long").alias("b"), "c",
        )
        .unionByName(
            census.select(
                F.lit("census").alias("variant"), F.col("stage").alias("s"),
                F.col("n_docs").cast("long").alias("a"),
                F.lit(None).cast("long").alias("b"),
                F.lit(None).cast("long").alias("c"),
            )
        )
        .unionByName(
            manifest.select(
                F.lit("manifest").alias("variant"), F.col("split").alias("s"),
                F.col("n_docs").alias("a"), F.col("n_chars").alias("b"),
                F.col("content_hash").alias("c"),
            )
        )
    )


def q_ppl_buckets(spark: SparkSession, sf: str) -> DataFrame:
    """CCNet-style perplexity partition (head/middle/tail by LM score):
    bucket thresholds from a HISTOGRAM of the rounded ppl values + a
    cumsum over that aggregated frame — never a global sort/ntile over
    the corpus (`functions/lm.py:ppl_buckets`)."""
    from architxt_spark.functions.lm import ppl_buckets

    return ppl_buckets(_t(spark, sf, "documents"))


def q_ann_recall(spark: SparkSession, sf: str) -> DataFrame:
    """ANN index self-evaluation: recall@5 of the sign-LSH, in-memory
    IVF, AND persisted-index serving paths against the brute-force
    ground truth per query (the A/B an index migration runs) — integer
    intersection counts, so the evaluation itself is hash-gated
    (`functions/ann.py:ann_recall`).  'indexed' (r9) gates the variant
    an operator actually deploys: recall measured through the
    session's ``ivf_serving_index`` parquet index + nprobe pruning."""
    emb = _t(spark, sf, "embeddings")
    idx, cb = ivf_serving_index(spark, sf)
    return ann.ann_recall(
        emb, emb.filter(F.col("vec_id") < 10), dim=64, k=5,
        methods=("lsh", "ivf", "indexed"), index_path=idx, centroids=cb,
    )


def q_corpus_drift(spark: SparkSession, sf: str) -> DataFrame:
    """Token-distribution drift (Jeffreys divergence per token) between
    the even- and odd-id halves of the documents table — the
    corpus-versioning QA check between an old snapshot and a new crawl
    (`functions/text.py:corpus_drift`)."""
    from architxt_spark.functions.text import corpus_drift

    docs = _t(spark, sf, "documents")
    return corpus_drift(
        docs.filter("doc_id % 2 = 0"), docs.filter("doc_id % 2 = 1"), min_count=20
    )


def q_random_project(spark: SparkSession, sf: str) -> DataFrame:
    """JL sign projection of the embedding table to 8 fixed-point
    components — integer sums make an inherently-random-looking operator
    bit-exact across engines (`functions/ann.py:random_project`).  The
    gate frame explodes the projection to scalar (vec_id, j, component)
    rows (the compare hashes cells, not arrays)."""
    from architxt_spark.functions.ann import random_project

    emb = _t(spark, sf, "embeddings").select("vec_id", "embedding")
    proj = random_project(emb).select("vec_id", F.posexplode("proj"))
    return proj.select(
        "vec_id", F.col("pos").cast("long").alias("j"), F.col("col").alias("component")
    )


def q_tfidf_terms(spark: SparkSession, sf: str) -> DataFrame:
    """Per-document TF-IDF salient terms (keyword extraction): one token
    explode → map-combinable (doc, term) counts, document frequencies
    from the same aggregate, corpus size on a 1-row broadcast; row
    membership decided by exact integer thresholds so the float score is
    value-hashed, never rank-compared (`functions/text.py:tfidf_terms`)."""
    from architxt_spark.functions.text import tfidf_terms

    return tfidf_terms(_t(spark, sf, "documents"), min_df=3, min_tf=3)


def q_corpus_delta(spark: SparkSession, sf: str) -> DataFrame:
    """Batch delta ingest under the full hash gate: even doc_ids
    bootstrap a corpus + its fingerprint/band sidecar indexes
    (`sinks/corpus.py:merge_corpus`), odd doc_ids then merge against
    them — within-batch exact keep, fp-index anti-join, band-index
    screen, band-min chain — all WITHOUT rescanning corpus text.  The
    oracle replays both batches over the identical md5 fingerprints and
    band keys."""
    import tempfile

    from architxt_spark.sinks.corpus import merge_corpus

    scratch = tempfile.mkdtemp(prefix="architxt_delta_")
    docs = _t(spark, sf, "documents").select("doc_id", "text", "lang")
    for batch_filter in (F.col("doc_id") % 2 == 0, F.col("doc_id") % 2 == 1):
        merge_corpus(
            spark, scratch, docs.filter(batch_filter), partition_cols=["lang"]
        )
    return spark.read.parquet(f"{scratch}/data").select("doc_id")


def q_corpus_report(spark: SparkSession, sf: str) -> DataFrame:
    """Corpus datasheet (the published-with-the-corpus stats card):
    sizes, EXACT token-length deciles from a bounded length histogram
    (never a single-reducer percentile), language mix, exact-dup share,
    deterministic mean quality + Gopher pass rate, top sources
    (`functions/report.py:corpus_report`)."""
    from architxt_spark.functions.report import corpus_report

    return corpus_report(_t(spark, sf, "documents"), source_col="source")


def q_collocations(spark: SparkSession, sf: str) -> DataFrame:
    """Bigram collocation mining by PMI — exact BIGINT counts, min-count
    filter BEFORE the unigram joins, log-sum PMI (no c_xy*N overflow at
    corpus scale, engine skew at libm-ulp level)
    (`functions/text.py:collocations`)."""
    from architxt_spark.functions.text import collocations

    return collocations(_t(spark, sf, "documents"), min_count=8)


def q_link_pagerank(spark: SparkSession, sf: str) -> DataFrame:
    """Link-graph ranking (crawl/host-quality signal): build the
    session-transition graph over page ids from the behavioral log (one
    window pass), then 3 iterations of EXACT integer fixed-point
    PageRank — rank units are BIGINTs and every division is integral, so
    Spark and DuckDB agree to the bit with no float summation-order
    drift (`functions/linkgraph.py`).  Two variants tagged (r8): 'drop'
    = dangling mass dropped (the original gated simplification),
    'dangling' = mass-conserving uniform redistribution — the published
    host-rank form, its 1-row-broadcast-per-iteration shape now under
    the hash gate too."""
    from architxt_spark.functions.linkgraph import pagerank, session_edges

    pages = _events(spark, sf).select(
        "user_id",
        "ts",
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("page"),
    )
    from architxt_spark.session import stage_barrier

    # one materialization feeds BOTH variants' iteration chains — the
    # session window pass runs once, not per variant
    edges = stage_barrier(session_edges(pages))
    drop = pagerank(edges).select(
        F.lit("drop").alias("variant"), F.col("node").alias("page"), "rank_units"
    )
    dang = pagerank(edges, redistribute_dangling=True).select(
        F.lit("dangling").alias("variant"), F.col("node").alias("page"), "rank_units"
    )
    return drop.unionByName(dang)


def q_curation_pipeline(spark: SparkSession, sf: str) -> DataFrame:
    """End-to-end curation chain census — the FULL published recipe in
    one operator (r7 extension): Gopher quality gate (pure scan filter —
    junk never reaches a shuffle) → domain screen (blocklist + mirror
    rule, broadcast anti-join) → exact + MinHash near-dup removal over
    exact representatives → eval-set decontamination (benchmark band
    index broadcast) → CCNet-style LM-perplexity tail drop trained on a
    CLEAN REFERENCE slice (the published CCNet form; histogram-exact
    thresholds) → fastText-style classifier gate trained on labelled
    seed slices (integer perceptron, broadcast weights; r8 extension) →
    exact per-language mixture take → concat-and-chunk sequence packing;
    one (stage, n_docs) row per stage — the pack row counts the training
    sequences produced (`functions/curation.py` curate_corpus)."""
    from architxt_spark.functions.curation import curate_corpus

    docs = _t(spark, sf, "documents").select(
        "doc_id", "text", "lang", "n_chars", "source"
    )
    bench = docs.filter(F.col("doc_id") % 37 == 0).select("doc_id", "text")
    ref = docs.filter(F.col("doc_id") % 29 == 3).select("doc_id", "text")
    _, census = curate_corpus(
        docs,
        domain_col="source",
        domain_blocklist=("src13",),
        decontaminate_against=bench,
        ppl_drop_tail=True,
        ppl_train_docs=ref,
        quality_model_weights=curation_model_weights(spark, sf),
        mixture_col="lang",
        mixture_counts=_CURATE_MIX,
        pack_token_col="n_chars",
        pack_budget=4096,
        pack_buckets=8,
        salt="cur",
    )
    return census


_CURATION_MODEL_CACHE: dict = {}


def curation_model_weights(spark: SparkSession, sf: str) -> DataFrame:
    """Memoized classifier for the curation chain's model stage, trained
    on the chain's own labelled seed slices (doc_id%41 == 1 / 2) — the
    serving posture: one quality model per corpus snapshot scores every
    curation batch (``curate_corpus(quality_model_weights=)``).
    Identical weights to the inline training, so the census oracle is
    unchanged; the fit rides bench.py's model_build line."""
    from architxt_spark.functions.classifier import train_quality_classifier

    key = (spark.sparkContext.applicationId, sf)
    if key not in _CURATION_MODEL_CACHE:
        # both seed slices come from the SAME table: one labelled scan
        # instead of two file reads (r15, label_col path)
        docs = _t(spark, sf, "documents").select("doc_id", "text")
        _CURATION_MODEL_CACHE[key] = train_quality_classifier(
            docs.filter((F.col("doc_id") % 41).isin(1, 2))
            .withColumn("__y", F.when(F.col("doc_id") % 41 == 1, 1).otherwise(-1)),
            label_col="__y",
        )
    return _CURATION_MODEL_CACHE[key]


def q_lang_distribution(spark: SparkSession, sf: str) -> DataFrame:
    """Language-ID heuristic as an aggregation (corpus language census)."""
    docs = _t(spark, sf, "documents")
    return docs.groupBy(T.lang_id(F.col("text")).alias("lang_guess")).agg(
        F.count("*").alias("n_docs")
    )


# ---------------------------------------------------------------------------
# event streams (batch twins of the streaming operators)
# ---------------------------------------------------------------------------


def q_events_sessionize(spark: SparkSession, sf: str) -> DataFrame:
    from architxt_spark.streaming import sessionize

    out = sessionize(_events(spark, sf), gap_minutes=30)
    return out.select(
        "user_id",
        "session_seq",
        F.date_format("session_start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        F.date_format("session_end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
        "n_events",
    )


def q_graph_extract(spark: SparkSession, sf: str) -> DataFrame:
    """Property-graph loader round-trip (``read_cypher`` parity,
    ``loader/cypher.py:17-135``): customer→nation→region as a graph with an
    attributed (reified) CITIZEN_OF edge and a plain IN_REGION edge, loaded
    into the meta-model; output = node census of the forest."""
    from architxt_spark.sources.graph import read_graph

    cus = _t(spark, sf, "customer").filter(F.col("c_acctbal").isNotNull())
    nat = _t(spark, sf, "nation")
    reg = _t(spark, sf, "region")
    nodes = (
        cus.select(
            F.concat(F.lit("C"), "c_custkey").alias("id"),
            F.lit("Customer").alias("label"),
            F.col("c_name").alias("name"),
            F.col("c_mktsegment").alias("detail"),
        )
        .unionByName(
            nat.select(
                F.concat(F.lit("N"), "n_nationkey").alias("id"),
                F.lit("Nation").alias("label"),
                F.col("n_name").alias("name"),
                F.lit(None).cast("string").alias("detail"),
            )
        )
        .unionByName(
            reg.select(
                F.concat(F.lit("R"), "r_regionkey").alias("id"),
                F.lit("Region").alias("label"),
                F.col("r_name").alias("name"),
                F.lit(None).cast("string").alias("detail"),
            )
        )
    )
    rels = cus.select(
        F.concat(F.lit("C"), "c_custkey").alias("src"),
        F.concat(F.lit("N"), "c_nationkey").alias("dst"),
        F.lit("CITIZEN_OF").alias("rel_type"),
        F.col("c_acctbal").cast("string").alias("balance"),
    ).unionByName(
        nat.select(
            F.concat(F.lit("N"), "n_nationkey").alias("src"),
            F.concat(F.lit("R"), "n_regionkey").alias("dst"),
            F.lit("IN_REGION").alias("rel_type"),
            F.lit(None).cast("string").alias("balance"),
        )
    )
    out = read_graph(nodes, rels, max_depth=4)
    return (
        out.groupBy(
            F.coalesce(
                "node_type", F.when(F.col("node_name").isNull(), "LEAF").otherwise("ROOT")
            ).alias("kind"),
            F.coalesce("node_name", F.lit("")).alias("name"),
        )
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") > 0)
    )


def q_typed_export_orders(spark: SparkSession, sf: str) -> DataFrame:
    """Export-time type recovery (``export/sql.py:262-300``): orders with
    every column stringified (the meta-model's value domain), then the
    inference pass must win back bigint/double/timestamp/string per column;
    aggregates over the re-typed frame prove the casts are real."""
    from architxt_spark.sinks import apply_typed_casts, infer_column_types

    raw = _t(spark, sf, "orders").select(
        *[F.col(c).cast("string").alias(c) for c in _t(spark, sf, "orders").columns]
    )
    # spread before the two regex/try_cast-heavy passes (inference agg +
    # the re-typed aggregate): the single-file scan would run ~7M parse
    # probes on one core (A/B at sf0.1: 2.99 s → 1.77 s, values equal;
    # no-op at real scale — functions/dedup.py:_spread)
    from architxt_spark.functions.dedup import _spread

    raw = _spread(raw)
    types = infer_column_types(raw)
    typed = apply_typed_casts(raw, types)
    sig = ",".join(f"{c}:{types[c]}" for c in sorted(types))
    return typed.agg(
        F.lit(sig).alias("schema_sig"),
        F.sum("o_orderkey").alias("sum_key"),
        F.round(F.sum(_dec("o_totalprice")), 2).cast("double").alias("sum_price"),
        F.date_format(F.min("o_orderdate"), "yyyy-MM-dd HH:mm:ss").alias("min_date"),
        F.date_format(F.max("o_orderdate"), "yyyy-MM-dd HH:mm:ss").alias("max_date"),
        F.countDistinct("o_orderstatus").alias("n_status"),
    )


def q_sampling_strata(spark: SparkSession, sf: str) -> DataFrame:
    """Stratified DOWN- and UP-sampling tagged in one frame: hash-based
    keep fractions (pure filter — the predicate rides the parquet scan)
    and fractional-epoch upsampling (narrow explode, copy_n index); both
    share the deterministic per-(id, salt) decision rule."""
    from architxt_spark.functions import sampling as S

    docs = _t(spark, sf, "documents")
    down = S.stratified_sample(
        docs,
        "lang",
        {"en": 0.5, "es": 0.25, "de": 0.25},
        "doc_id",
        default_fraction=0.1,
        salt="r2",
    ).select(
        F.lit("down").alias("variant"),
        "doc_id",
        "lang",
        F.lit(None).cast("int").alias("copy_n"),
    )
    up = S.upsample_stratified(
        docs, "lang", {"en": 2.5, "fr": 0.5}, "doc_id", salt="up"
    ).select(F.lit("up").alias("variant"), "doc_id", "lang", "copy_n")
    return down.unionByName(up)


def q_sampling_mixture(spark: SparkSession, sf: str) -> DataFrame:
    """Mixture take, both ways a pretraining mix is specified, tagged in
    one frame: 'count' = exact per-stratum top-N documents by hash
    order; 'tokens' (r9) = exact per-stratum take until a TOKEN budget
    (running-sum prefix, never exceeds the budget).  Both run the
    scale-safe two-phase shape (threshold pre-filter, then bounded
    window) and must equal the oracle's plain windowed forms."""
    from architxt_spark.functions import sampling as S

    docs = _t(spark, sf, "documents")
    count = S.mixture_take(
        docs, "lang", {"en": 50, "fr": 20, "zh": 10}, "doc_id", salt="mix"
    ).select(F.lit("count").alias("variant"), "doc_id", "lang")
    tokens = S.mixture_take_tokens(
        docs, "lang", {"en": 30000, "fr": 8000, "zh": 2500}, "doc_id",
        "n_chars", salt="mix",
    ).select(F.lit("tokens").alias("variant"), "doc_id", "lang")
    return count.unionByName(tokens)


def q_sampling_temperature(spark: SparkSession, sf: str) -> DataFrame:
    """Temperature-scaled mixture (probability ∝ size^alpha, the standard
    multilingual rebalancing): exact integer largest-remainder allocation
    over fixed-point weights, then the hash-order mixture take.  The
    oracle recomputes the whole allocation in SQL."""
    from architxt_spark.functions import sampling as S

    docs = _t(spark, sf, "documents")
    counts = S.temperature_counts(docs, "lang", _TEMP_STRATA, total=120, alpha=0.5)
    return S.mixture_take(docs, "lang", counts, "doc_id", salt="temp").select(
        "doc_id", "lang"
    )


_TEMP_STRATA = ["en", "fr", "zh", "de", "es"]


def q_sampling_weighted(spark: SparkSession, sf: str) -> DataFrame:
    """Length-proportional document sampling (token-budget curation):
    keep probability ∝ n_chars, decided by exact decimal-integer
    comparison against the one-row weight total — a pure scan filter."""
    from architxt_spark.functions import sampling as S

    return S.weighted_sample(
        _t(spark, sf, "documents").select("doc_id", "lang", "n_chars"),
        "n_chars",
        "doc_id",
        target=100,
        salt="wt",
    )


def q_sampling_pack(spark: SparkSession, sf: str) -> DataFrame:
    """Concat-and-chunk sequence packing: deterministic layout (hash
    bucket, hash order), per-bucket cumsum windows — never one global
    window task."""
    from architxt_spark.functions import sampling as S

    docs = _t(spark, sf, "documents")
    out = S.pack_sequences(docs, "doc_id", "n_chars", 4096, n_buckets=8, salt="pk")
    return out.select("doc_id", "pack_bucket", "pack_seq", "pack_offset")


# ---------------------------------------------------------------------------
# registry folds (round 7): families of per-operator entries collapsed into
# one tagged frame each — zero coverage loss (every constituent's rows are
# present under a variant/section tag), fewer rows for the ~50-row driver
# gate so the whole registry rotates through a verdict every ≤2 rounds.
# The constituent q_* functions remain the operator API; the folds only
# re-shape their output into a union-compatible schema.
# ---------------------------------------------------------------------------


def q_ann_suite(spark: SparkSession, sf: str) -> DataFrame:
    """Fold of ann_topk + ann_ivf_topk + ann_pq_adc: every ANN top-k path
    (brute/lsh/ivf_first/ivf_trained/pq) tagged in one frame with a
    unified ``score`` column (cosine sim or ADC dot-score, both value-
    hashed doubles)."""
    def shape(df: DataFrame, variant, score_col: str) -> DataFrame:
        return df.select(
            variant.alias("variant"),
            "query_id",
            "rank",
            "neighbor_id",
            F.col(score_col).cast("double").alias("score"),
        )

    return (
        shape(q_ann_topk(spark, sf), F.col("variant"), "sim")
        .unionByName(
            shape(
                q_ann_ivf_topk(spark, sf),
                F.concat(F.lit("ivf_"), F.col("variant")),
                "sim",
            )
        )
        .unionByName(shape(q_ann_pq_adc(spark, sf), F.lit("pq"), "adc"))
    )


def q_window_grouping(spark: SparkSession, sf: str) -> DataFrame:
    """Fold of window_orders + grouping_orders: ranking/running windows
    and the grouping-sets family in one generic tagged frame
    ``(variant, k1, k2, n, val)``."""
    w = q_window_orders(spark, sf).select(
        F.lit("window").alias("variant"),
        F.col("o_custkey").cast("string").alias("k1"),
        F.col("o_orderkey").cast("string").alias("k2"),
        F.col("rank").cast("long").alias("n"),
        F.col("running_total").alias("val"),
    )
    g = q_grouping_orders(spark, sf).select(
        "variant",
        F.col("o_orderstatus").alias("k1"),
        F.col("o_orderpriority").alias("k2"),
        "n",
        F.col("total").alias("val"),
    )
    return w.unionByName(g)


def q_corpus_health(spark: SparkSession, sf: str) -> DataFrame:
    """Fold of corpus_report + corpus_drift: the corpus datasheet plus
    the snapshot-drift screen as extra ``drift_*`` sections of the same
    ``(section, key, value)`` stats card."""
    rep = q_corpus_report(spark, sf)
    drift = q_corpus_drift(spark, sf).selectExpr(
        "stack(3, "
        " 'drift_count_a', token, CAST(c_a AS DOUBLE),"
        " 'drift_count_b', token, CAST(c_b AS DOUBLE),"
        " 'drift_jeffreys', token, jeffreys"
        ") AS (section, key, value)"
    )
    return rep.unionByName(drift)


def q_scalar_funcs(spark: SparkSession, sf: str) -> DataFrame:
    """Fold of string_funcs_parts + date_math_orders + json_props_events:
    the scalar-function surface (string/regex/levenshtein, date
    extraction arithmetic, JSON property access) in one generic tagged
    frame ``(variant, k1, k2, n1, n2)`` — all values integer/string, so
    the fold stays hash-exact."""
    s = q_string_funcs_parts(spark, sf).select(
        F.lit("string").alias("variant"),
        F.col("p_partkey").cast("string").alias("k1"),
        F.col("first_word").alias("k2"),
        F.col("name_len").cast("long").alias("n1"),
        F.col("brand_type_dist").cast("long").alias("n2"),
    )
    d = q_date_math_orders(spark, sf).select(
        F.lit("date").alias("variant"),
        F.col("yr").cast("string").alias("k1"),
        F.col("mo").cast("string").alias("k2"),
        F.col("n_orders").alias("n1"),
        F.lit(None).cast("long").alias("n2"),
    )
    j = q_json_props_events(spark, sf).select(
        F.lit("json").alias("variant"),
        F.col("event_type").alias("k1"),
        F.lit(None).cast("string").alias("k2"),
        F.col("n").alias("n1"),
        F.col("k_sum").alias("n2"),
    )
    return s.unionByName(d).unionByName(j)


def q_doc_quality_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Fold of gopher_quality_flags + doc_fingerprint_winnow: both are
    per-document integer stat frames over ``documents`` — joined on
    doc_id into one wide row per document."""
    return q_gopher_quality_flags(spark, sf).join(
        q_doc_fingerprint_winnow(spark, sf), "doc_id"
    )


def q_bpe_suite(spark: SparkSession, sf: str) -> DataFrame:
    """Fold of bpe_tokenizer + bpe_train_merges: encode/vocab/fertility
    sections plus the trained merge table as ``merges`` rows (step and
    frequency packed into one exact BIGINT, ``step*1e9 + freq``)."""
    merges = q_bpe_train_merges(spark, sf).select(
        F.lit("merges").alias("part"),
        F.col("merged").alias("token"),
        F.concat_ws(" ", "left", "right").alias("kind"),
        (F.col("step").cast("long") * F.lit(1000000000) + F.col("freq")).alias("n"),
    )
    return q_bpe_tokenizer(spark, sf).unionByName(merges)


def q_events_funnel(spark: SparkSession, sf: str) -> DataFrame:
    """Fold of funnel_signup_view_purchase + retention_cohorts: both
    behavioral-log rollups, tagged ``(variant, k, n1, n2)`` (cohort week
    rendered as its ISO date so the key is engine-stable text)."""
    f = q_funnel_signup_view_purchase(spark, sf).select(
        F.lit("funnel").alias("variant"),
        F.col("stage").alias("k"),
        F.lit(None).cast("long").alias("n1"),
        F.col("n_users").alias("n2"),
    )
    r = q_retention_cohorts(spark, sf).select(
        F.lit("retention").alias("variant"),
        F.date_format("cohort_week", "yyyy-MM-dd").alias("k"),
        F.col("week_n").alias("n1"),
        F.col("n_users").alias("n2"),
    )
    return f.unionByName(r)


def q_export_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Fold of export_sql_ddl + export_cypher_stats: both exporter
    surfaces (DDL text, Cypher merge statement counts) in one tagged
    frame ``(variant, k, n, s)``."""
    s = q_export_sql_ddl(spark, sf).select(
        F.lit("sql").alias("variant"),
        F.col("stmt_no").cast("string").alias("k"),
        F.lit(None).cast("long").alias("n"),
        F.col("ddl").alias("s"),
    )
    c = q_export_cypher_stats(spark, sf).select(
        F.lit("cypher").alias("variant"),
        F.col("kind").alias("k"),
        F.col("n"),
        F.lit(None).cast("string").alias("s"),
    )
    return s.unionByName(c)


def q_temporal_joins(spark: SparkSession, sf: str) -> DataFrame:
    """Fold of asof_events + range_join_signup_clicks: the temporal join
    surface (backward/forward as-of, bounded interval range join) in one
    tagged frame ``(variant, id1, id2, v1, v2)``."""
    a = q_asof_events(spark, sf).select(
        F.lit("asof").alias("variant"),
        F.col("user_id").alias("id1"),
        F.col("event_id").alias("id2"),
        F.col("prev_purchase").alias("v1"),
        F.col("next_purchase").alias("v2"),
    )
    r = q_range_join_signup_clicks(spark, sf).select(
        F.lit("range").alias("variant"),
        F.col("signup_event").alias("id1"),
        F.lit(None).cast("long").alias("id2"),
        F.col("n_clicks").alias("v1"),
        F.lit(None).cast("long").alias("v2"),
    )
    return a.unionByName(r)


def q_dedup_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """Fold of dedup_minhash_lsh + dedup_ngram_jaccard: the candidate-
    pair generators (banded MinHash estimate, DF-capped n-gram inverted
    index) in one tagged pair frame.

    The jaccard and minhash generators key off the SAME distinct
    word-3-gram md5s (15-hex vs 7-hex prefixes), so one shared persisted
    ``(id, md5)`` frame feeds both — the corpus is tokenized, shingled
    and hashed ONCE per fold instead of once per generator (r15,
    ``dedup.shingle_md5_rows``).  The winnow screen keeps its own base
    (it needs the ORDERED hash sequence, not the distinct set).  Values
    identical: each generator applies the same substring/conv it always
    derived from the same md5."""
    docs = _t(spark, sf, "documents")
    shared, _n = dedup.shingle_md5_rows(docs, "text", "doc_id")
    try:
        jac = dedup.ngram_jaccard_pairs(
            docs, "text", "doc_id", threshold=0.2, md5_rows=shared
        ).select(
            F.lit("jaccard").alias("variant"),
            "id_a",
            "id_b",
            F.col("jaccard").alias("score"),
        )
        win = dedup.winnow_pairs(docs, "text", "doc_id").select(
            F.lit("winnow").alias("variant"),
            "id_a",
            "id_b",
            F.col("n_common").cast("double").alias("score"),
        )
        m = dedup.minhash_lsh_pairs(
            docs, "text", "doc_id", max_band_df=1000, md5_rows=shared
        ).select(
            F.lit("minhash").alias("variant"),
            "id_a",
            "id_b",
            F.col("est_jaccard").alias("score"),
        )
    finally:
        # both consumers are materialized by now (the jaccard pair frame
        # is stage-barriered inside its builder; the minhash signature
        # frame is eagerly persisted) — the shared md5 cache can go
        shared.unpersist()
    return jac.unionByName(win).unionByName(m)


# ---------------------------------------------------------------------------
# contract surface
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the Q5-flavor multi-join
    revenue rollup (scan → joins incl. broadcast dims → decimal agg)."""
    return q_join_revenue_by_nation(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q = _all_queries()
    # The driver gate records verdicts for roughly the FIRST 50 registry
    # entries per round.  Keep the registry prefix-robust: queries whose
    # last driver verdict is oldest (r4-only after round 5), plus every
    # entry folded/renamed or code-touched this round, go FIRST so any
    # prefix the gate takes maximizes newly-verified coverage.
    first = [
        # Entries whose EXECUTED CODE changed in round 15 (optimization
        # round 2) and that are not already in the r13-stale block below —
        # the gate prefix reaches these first so the changed code gets a
        # driver verdict the same round:
        # quality_classifier: classifier_score single-scan explode_outer
        #   + labelled single-scan training (classifier.py);
        # lm_perplexity / ppl_buckets: short-doc rows fused into the
        #   scoring explode (lm.py);
        # dsir: one-scan scoring with the left-join replay (dsir.py);
        # contamination_screen: signatures ride the cross-pair band rows
        #   (dedup.py minhash_cross_pairs);
        # graph_extract: BFS level barrier + emptiness probe fused to one
        #   job (sources/graph.py);
        # link_pagerank: lazily-chained iterations with interval barriers
        #   (linkgraph.py);
        # dedup_pairs / dedup_filtered / stream_minhash_dedup /
        # stream_curate: memo-key + signature-lifecycle changes in their
        #   executed path (text.py/_memo_expr, dedup.py, curation.py).
        "quality_classifier",
        "lm_perplexity",
        "ppl_buckets",
        "dsir",
        "contamination_screen",
        "graph_extract",
        "link_pagerank",
        "dedup_pairs",
        "dedup_filtered",
        "stream_minhash_dedup",
        "stream_curate",
        # Entries whose newest driver verdict is round 13 — the ≤2-round
        # rotation contract requires the r15 gate to renew all 36.  This
        # block also covers the r14-opt rewrites that shipped without an
        # r14 verdict (VERDICT r14 #1: curation_pipeline, crawl_to_corpus,
        # c4_clean, text_profile, pii_redaction, lang_distribution,
        # doc_quality_stats) and the r15 curation fusion (curation_pipeline,
        # crawl_to_corpus inherit curation.py + classifier.py changes).
        "curation_pipeline",
        "crawl_to_corpus",
        "c4_clean",
        "text_profile",
        "pii_redaction",
        "lang_distribution",
        "doc_quality_stats",
        "bm25_batch",
        "bpe_suite",
        "chunk_pipeline",
        "corpus_delta",
        "crawl_media_dedup",
        "dataset_extract_nation",
        "dedup_components",
        "doc_chunking",
        "embedding_near_dup",
        "events_funnel",
        "events_rollup_streaming",
        "events_sessionize_streaming",
        "export_stats",
        "extract_vocab",
        "forest_stats_documents",
        "gen_instance",
        "join_salted_revenue",
        "llm_rewrite_stub",
        "nlp_parse_forest",
        "sampling_mixture",
        "sampling_strata",
        "scalar_funcs",
        "schema_groups_nation",
        "simple_rewrite_documents",
        "sketch_suite",
        "temporal_joins",
        "unicode_split",
        "unpivot_orders",
        "window_grouping",
    ]
    return {**{k: q[k] for k in first}, **{k: v for k, v in q.items() if k not in first}}


def _all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "scan_filter_project": q_scan_filter_project,
        "agg_pricing_summary": q_agg_pricing_summary,
        "join_revenue_by_nation": q_join_revenue_by_nation,
        "join_filtered_customers": q_join_filtered_customers,
        "sort_limit_top_orders": q_sort_limit_top_orders,
        "setop_nations_cust_minus_supp": q_setop_nations_cust_minus_supp,
        "percentile_orders": q_percentile_orders,
        "unpivot_orders": q_unpivot_orders,
        "join_salted_revenue": q_join_salted_revenue,
        "events_rollup_streaming": q_events_rollup_streaming,
        "events_sessionize_streaming": q_events_sessionize_streaming,
        "stream_minhash_dedup": q_stream_minhash_dedup,
        "stream_curate": q_stream_curate,
        "stream_url_seen": q_stream_url_seen,
        "distinct_parts_per_brand": q_distinct_parts_per_brand,
        "dataset_extract_nation": q_dataset_extract_nation,
        "schema_groups_nation": q_schema_groups_nation,
        "forest_stats_documents": q_forest_stats_documents,
        "metrics_customer": q_metrics_customer,
        "text_profile": q_text_profile,
        "pii_redaction": q_pii_redaction,
        "contamination_screen": q_contamination_screen,
        "doc_loader_json_props": q_doc_loader_json_props,
        "simple_rewrite_documents": q_simple_rewrite_documents,
        "rewrite_documents": q_rewrite_documents,
        "cluster_documents": q_cluster_documents,
        "cluster_instance_documents": q_cluster_instance_documents,
        "llm_label_schema": q_llm_label_schema,
        "tree_leaves_nation": q_tree_leaves_nation,
        "extract_valid_trees": q_extract_valid_trees,
        "coverage_metric": q_coverage_metric,
        "multimodal_profile": q_multimodal_profile,
        "multimodal_dedup": q_multimodal_dedup,
        "crawl_media_dedup": q_crawl_media_dedup,
        "doc_loader_files": q_doc_loader_files,
        "gen_instance": q_gen_instance,
        "llm_rewrite_stub": q_llm_rewrite_stub,
        "extract_vocab": q_extract_vocab,
        "nlp_parse_forest": q_nlp_parse_forest,
        "bm25_topk": q_bm25_topk,
        "bm25_batch": q_bm25_batch,
        "lm_perplexity": q_lm_perplexity,
        "doc_chunking": q_doc_chunking,
        "ngram_stats": q_ngram_stats,
        "semantic_dedup": q_semantic_dedup,
        "dsir": q_dsir,
        "sketch_suite": q_sketch_suite,
        "curation_pipeline": q_curation_pipeline,
        "quality_classifier": q_quality_classifier,
        "domain_profile": q_domain_profile,
        "link_pagerank": q_link_pagerank,
        "unicode_split": q_unicode_split,
        "collocations": q_collocations,
        "corpus_delta": q_corpus_delta,
        "tfidf_terms": q_tfidf_terms,
        "random_project": q_random_project,
        "ann_recall": q_ann_recall,
        "ppl_buckets": q_ppl_buckets,
        "warc_split_roundtrip": q_warc_split_roundtrip,
        "crawl_to_corpus": q_crawl_to_corpus,
        "lang_distribution": q_lang_distribution,
        "dedup_components": q_dedup_components,
        "dedup_exact_spans": q_dedup_exact_spans,
        "chunk_pipeline": q_chunk_pipeline,
        "dedup_simhash": q_dedup_simhash,
        "dedup_filtered": q_dedup_filtered,
        "embedding_near_dup": q_embedding_near_dup,
        "events_sessionize": q_events_sessionize,
        "graph_extract": q_graph_extract,
        "typed_export_orders": q_typed_export_orders,
        "sampling_strata": q_sampling_strata,
        "sampling_mixture": q_sampling_mixture,
        "sampling_temperature": q_sampling_temperature,
        "sampling_weighted": q_sampling_weighted,
        "sampling_pack": q_sampling_pack,
        "c4_clean": q_c4_clean,
        "ann_suite": q_ann_suite,
        "window_grouping": q_window_grouping,
        "corpus_health": q_corpus_health,
        "scalar_funcs": q_scalar_funcs,
        "doc_quality_stats": q_doc_quality_stats,
        "bpe_suite": q_bpe_suite,
        "events_funnel": q_events_funnel,
        "export_stats": q_export_stats,
        "temporal_joins": q_temporal_joins,
        "dedup_pairs": q_dedup_pairs,
    }


def _stream_url_seen_sql() -> str:
    from architxt_spark.functions.sketch import bloom_membership_sql

    url = "'http://' || source || '/p' || CAST(doc_id % 40 AS VARCHAR)"
    k2_src = (
        "(SELECT url, MIN(doc_id) AS doc_id FROM"
        f" (SELECT doc_id, {url} AS url FROM documents WHERE doc_id % 2 = 1)"
        " GROUP BY url)"
    )
    mem = bloom_membership_sql("__k1", "url", k2_src, "url", "url", n_bits=4096)
    return f"""
        WITH __k1 AS (
            SELECT url, MIN(doc_id) AS doc_id FROM
                (SELECT doc_id, {url} AS url FROM documents WHERE doc_id % 2 = 0)
            GROUP BY url
        ),
        __mem AS ({mem}),
        __k2 AS (
            SELECT b.url, b.doc_id FROM {k2_src} b
            JOIN __mem m ON m.url = b.url
            WHERE NOT m.maybe_member
        )
        SELECT url, doc_id FROM __k1
        UNION ALL
        SELECT url, doc_id FROM __k2
    """


def _c4_clean_sql() -> str:
    page = (
        "regexp_replace(text, ' (table|line) ', '.' || chr(10), 'g')"
        " || CASE WHEN doc_id % 7 = 0 THEN chr(10) || 'you must enable javascript to view this page.' ELSE '' END"
        " || CASE WHEN doc_id % 13 = 0 THEN chr(10) || 'we have updated our privacy policy today.' ELSE '' END"
        " || CASE WHEN doc_id % 11 = 0 THEN chr(10) || 'lorem ipsum dolor sit amet consectetur.' ELSE '' END"
        " || CASE WHEN doc_id % 17 = 0 THEN ' {' ELSE '' END"
        " || CASE WHEN doc_id % 19 = 0 THEN chr(10) || 'le chat est dans le jardin et la maison.' ELSE '' END"
    )
    return f"""
        WITH staged AS (SELECT doc_id, {page} AS page FROM documents),
        cleaned AS (
            SELECT doc_id, page, {T.c4_clean_sql('page')} AS clean FROM staged
        )
        SELECT doc_id,
               CAST(len(string_split(page, chr(10))) AS BIGINT) AS n_lines,
               CAST(CASE WHEN clean = '' THEN 0
                         ELSE len(string_split(clean, chr(10))) END AS BIGINT) AS n_kept,
               CAST(len(regexp_extract_all(clean, '[.!?]')) AS BIGINT) AS n_sent,
               CAST({T.c4_keep_sql('page', 'clean')} AS BIGINT) AS keep,
               md5(clean) AS clean_fp,
               md5({T.dedup_lines_sql('page')}) AS dedup_fp,
               CAST(({T.line_lang_profile_sql('page')}).n_known AS BIGINT) AS n_lang_known,
               ({T.line_lang_profile_sql('page')}).dominant_lang AS dominant_lang,
               CAST(({T.line_lang_profile_sql('page')}).mixed AS BIGINT) AS lang_mixed
        FROM cleaned
    """


def _bpe_sql() -> str:
    from architxt_spark.functions import bpe

    return bpe.train_bpe_merges_sql("documents", n_merges=6)


def _bpe_encode_sql() -> str:
    from architxt_spark.functions import bpe

    return bpe.bpe_encode_counts_sql("documents", n_merges=6)


def _dsir_sql() -> str:
    from architxt_spark.functions import dsir

    return dsir.dsir_scores_sql("documents", "doc_id < 25")


def _bpe_vocab_sql() -> str:
    from architxt_spark.functions import bpe

    return bpe.vocab_from_merges_sql("documents", n_merges=6)


def _dsir_select_sql() -> str:
    from architxt_spark.functions import dsir

    return dsir.dsir_select_sql("documents", "doc_id < 25", k=50, salt="ds")


def _dsir_fold_sql() -> str:
    return (
        "SELECT 'score' AS part, doc_id, CAST(n_feats AS DOUBLE) AS a, dsir_score AS b FROM ("
        + _dsir_sql()
        + ") UNION ALL SELECT 'select', doc_id, sel_key, CAST(sel_rank AS DOUBLE) FROM ("
        + _dsir_select_sql()
        + ")"
    )


def _fm_sql() -> str:
    from architxt_spark.functions import sketch

    inner = sketch.fm_count_distinct_sql(
        f"(SELECT unnest({T.tokens_sql('text')}) AS tok FROM documents)", "tok", m=256
    )
    return f"""
        SELECT s.m, s.est_distinct, e.exact_distinct FROM ({inner}) s CROSS JOIN (
            SELECT CAST(count(DISTINCT tok) AS BIGINT) AS exact_distinct
            FROM (SELECT unnest({T.tokens_sql('text')}) AS tok FROM documents)
        ) e
    """


def _kmv_sql() -> str:
    from architxt_spark.functions import sketch

    even = f"(SELECT unnest({T.tokens_sql('text')}) AS tok FROM documents WHERE doc_id % 2 = 0)"
    odd = f"(SELECT unnest({T.tokens_sql('text')}) AS tok FROM documents WHERE doc_id % 2 = 1)"
    est = sketch.kmv_estimates_sql(
        sketch.kmv_sketch_sql(even, "tok", k=64),
        sketch.kmv_sketch_sql(odd, "tok", k=64),
        k=64,
    )
    return f"""
        SELECT e.*, x.exact_jaccard FROM ({est}) e CROSS JOIN (
            SELECT round(CAST(i.c AS DOUBLE) / u.c, 4) AS exact_jaccard FROM
                (SELECT count(*) AS c FROM
                    (SELECT tok FROM {even} INTERSECT SELECT tok FROM {odd})) i
                CROSS JOIN
                (SELECT count(*) AS c FROM
                    (SELECT tok FROM {even} UNION SELECT tok FROM {odd})) u
        ) x
    """


def _bloom_sql() -> str:
    from architxt_spark.functions import sketch

    bench = f"(SELECT unnest({T.tokens_sql('text')}) AS tok FROM documents WHERE doc_id < 25)"
    vocab = f"(SELECT DISTINCT tok FROM (SELECT unnest({T.tokens_sql('text')}) AS tok FROM documents))"
    return sketch.bloom_membership_sql(
        bench, "tok", vocab, "tok", "tok", n_bits=2048, n_hashes=3
    )


def _stream_fm_sql() -> str:
    # merge-invariance: the streamed two-batch state bit_or-merges to the
    # SAME bitmaps as one batch pass over the whole corpus, so the oracle
    # is simply the batch FM estimate over every document token
    from architxt_spark.functions import sketch

    return sketch.fm_count_distinct_sql(
        f"(SELECT unnest({T.tokens_sql('text')}) AS tok FROM documents)", "tok", m=256
    )


def _cms_sql() -> str:
    from architxt_spark.functions import sketch

    stream = f"(SELECT unnest({T.tokens_sql('text')}) AS tok FROM documents)"
    vocab = (
        f"(SELECT DISTINCT tok FROM (SELECT unnest({T.tokens_sql('text')}) AS tok"
        f" FROM documents WHERE doc_id < 25))"
    )
    est = sketch.cms_estimates_sql(stream, "tok", vocab, "tok", "tok", width=1024, depth=4)
    return f"""
        SELECT e.tok, e.est_count,
               CAST(coalesce(x.exact_count, 0) AS BIGINT) AS exact_count
        FROM ({est}) e LEFT JOIN (
            SELECT tok, count(*) AS exact_count FROM {stream} GROUP BY 1
        ) x USING (tok)
    """


def _sketch_suite_sql() -> str:
    def melt(tag: str, src: str, key_expr: str, metrics: list[tuple[str, str]]) -> str:
        return " UNION ALL ".join(
            f"SELECT '{tag}' AS sketch, {key_expr} AS k, '{name}' AS metric,"
            f" CAST({expr} AS DOUBLE) AS value FROM {src}"
            for name, expr in metrics
        )

    branches = " UNION ALL ".join([
        melt("fm", "__fm", "''", [("m", "m"), ("est_distinct", "est_distinct"), ("exact_distinct", "exact_distinct")]),
        melt("kmv", "__kmv", "''", [(c, c) for c in ("est_a", "est_b", "est_union", "est_jaccard", "exact_jaccard")]),
        melt("bloom", "__bloom", "CAST(tok AS VARCHAR)", [("member", "CAST(maybe_member AS INT)")]),
        melt("cms", "__cms", "CAST(tok AS VARCHAR)", [("est_count", "est_count"), ("exact_count", "exact_count")]),
    ])
    return f"""
        WITH __fm AS ({_fm_sql()}),
             __kmv AS ({_kmv_sql()}),
             __bloom AS ({_bloom_sql()}),
             __cms AS ({_cms_sql()})
        {branches}
    """


def _bpe_tokenizer_sql() -> str:
    from architxt_spark.functions import bpe

    fert = bpe.bpe_fertility_sql("documents", "lang", n_merges=6)
    return f"""
        SELECT 'encode' AS part, token, '' AS kind, CAST(cnt AS BIGINT) AS n
        FROM ({_bpe_encode_sql()})
        UNION ALL
        SELECT 'vocab', token, kind, CAST(token_id AS BIGINT)
        FROM ({_bpe_vocab_sql()})
        UNION ALL
        SELECT 'fertility', lang, 'n_words', n_words FROM ({fert})
        UNION ALL
        SELECT 'fertility', lang, 'n_tokens', n_tokens FROM ({fert})
    """


def _chunk_pipeline_sql() -> str:
    detect = dedup.chunk_dedup_sql("documents", "text", "doc_id", chunk_tokens=32)
    strip = dedup.strip_duplicate_chunks_sql("documents", "text", "doc_id", chunk_tokens=32)
    return f"""
        SELECT 'detect' AS part, doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
               chunk_md5 AS h, CAST(n_occ AS BIGINT) AS a, CAST(kept AS BIGINT) AS b
        FROM ({detect})
        UNION ALL
        SELECT 'strip', doc_id, CAST(-1 AS BIGINT), md5(clean_text),
               CAST(n_chunks AS BIGINT), CAST(n_kept AS BIGINT)
        FROM ({strip})
    """


def _domains_sql() -> str:
    from architxt_spark.functions.domains import domain_profile_sql

    return domain_profile_sql("documents", blocklist=("src3", "src7"))


def _ppl_buckets_sql() -> str:
    from architxt_spark.functions.lm import ppl_buckets_sql

    return ppl_buckets_sql("documents")


def _corpus_report_sql() -> str:
    from architxt_spark.functions.report import corpus_report_sql

    return corpus_report_sql("documents", source_col="source")


def _unicode_split_sql() -> str:
    from architxt_spark.functions.sampling import hash_split_sql
    from architxt_spark.functions.text import clean_unicode_sql

    marker = " || ".join(f"chr({ord(c)})" for c in _UNICODE_MARKER)
    return (
        f"SELECT doc_id, {clean_unicode_sql(f'(text || {marker})')} AS text, "
        f"{hash_split_sql('doc_id', _SPLITS, 'v1')} AS split FROM documents"
    )


def _link_pagerank_sql() -> str:
    from architxt_spark.functions.linkgraph import pagerank_sql

    edges = """
        SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS w
        FROM (
            SELECT CAST(props->>'k' AS BIGINT) AS src,
                   LEAD(CAST(props->>'k' AS BIGINT))
                       OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dst
            FROM events
        )
        WHERE dst IS NOT NULL AND src <> dst
        GROUP BY src, dst
    """
    return (
        "SELECT 'drop' AS variant, node AS page, rank_units FROM ("
        + pagerank_sql(edges)
        + ") UNION ALL SELECT 'dangling', node, rank_units FROM ("
        + pagerank_sql(edges, redistribute_dangling=True)
        + ")"
    )


def _classifier_sql() -> str:
    from architxt_spark.functions.classifier import quality_classifier_sql

    return quality_classifier_sql("documents", "doc_id < 25", "doc_id >= 25")


def _contam_screen_sql() -> str:
    ngram = f"""
        WITH grams AS (
            SELECT doc_id, unnest(list_distinct({T.shingles_sql("text", 3)})) AS gram
            FROM documents
        ), bench AS (
            SELECT DISTINCT gram FROM grams WHERE doc_id < 25
        ), hits AS (
            SELECT g.doc_id,
                   sum(CASE WHEN b.gram IS NOT NULL THEN 1 ELSE 0 END) * 1.0 / count(*) AS frac
            FROM grams g LEFT JOIN bench b USING (gram)
            WHERE g.doc_id >= 25
            GROUP BY g.doc_id
        )
        SELECT doc_id AS id_a, ROUND(frac, 5) AS score FROM hits WHERE frac >= 0.3
    """
    cross = dedup.minhash_cross_pairs_sql(
        "(SELECT * FROM documents WHERE doc_id >= 25)",
        "(SELECT * FROM documents WHERE doc_id < 25)",
        "text",
        "doc_id",
        max_band_df=1000,
    )
    return (
        "SELECT 'ngram' AS variant, id_a, CAST(NULL AS BIGINT) AS id_b, score FROM ("
        + ngram
        + ") UNION ALL SELECT 'doc', corpus_id, bench_id, est_jaccard FROM ("
        + cross
        + ")"
    )


def _curation_sql() -> str:
    from architxt_spark.functions.curation import curation_census_sql

    return curation_census_sql(
        "documents",
        domain_col="source",
        domain_blocklist=("src13",),
        decontam_bench_table="(SELECT doc_id, text FROM documents WHERE doc_id % 37 = 0)",
        ppl_drop_tail=True,
        ppl_train_table="(SELECT doc_id, text FROM documents WHERE doc_id % 29 = 3)",
        quality_pos_src="(SELECT doc_id, text FROM documents WHERE doc_id % 41 = 1)",
        quality_neg_src="(SELECT doc_id, text FROM documents WHERE doc_id % 41 = 2)",
        mixture_col="lang",
        mixture_counts=_CURATE_MIX,
        pack_token_col="n_chars",
        pack_budget=4096,
        pack_buckets=8,
        salt="cur",
    )


def _crawl_to_corpus_sql() -> str:
    """Replay of the crawl composite from the documents table (the WARC
    parse + HTML extraction is exact identity on this corpus — gated by
    the 'crawl' variant's per-lang text-hash XOR): the census through
    the shared curation SQL, the manifest through the same CTE chain's
    kept-set + hash-split + manifest twin."""
    from architxt_spark.functions.curation import curation_census_sql
    from architxt_spark.functions.sampling import hash_split_sql
    from architxt_spark.sinks.corpus import corpus_manifest_sql

    base = "(SELECT doc_id, text, lang, source FROM documents)"
    bench = "(SELECT doc_id, text FROM documents WHERE doc_id % 23 = 5)"
    census = curation_census_sql(base, decontam_bench_table=bench, salt="crawl")
    kept = curation_census_sql(
        base, decontam_bench_table=bench, salt="crawl",
        final_select="SELECT * FROM {kept}",
    )
    split_expr = hash_split_sql("doc_id", {"train": 0.9, "valid": 0.1}, "crawl")
    manifest = corpus_manifest_sql(
        f"(SELECT *, {split_expr} AS split FROM ({kept}))", ["split"]
    )
    lang_census = corpus_manifest_sql("documents", ["lang"])
    return f"""
        SELECT 'crawl' AS variant, lang AS s, n_docs AS a,
               CAST(NULL AS BIGINT) AS b, content_hash AS c
        FROM ({lang_census})
        UNION ALL
        SELECT 'census', stage, n_docs, CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)
        FROM ({census})
        UNION ALL
        SELECT 'manifest', split, n_docs, n_chars, content_hash
        FROM ({manifest})
    """


def _lm_sql() -> str:
    from architxt_spark.functions import lm

    return lm.bigram_lm_perplexity_sql("documents")


def _doc_loader_files_sql() -> str:
    """Replay of the file-reader round trip: the writers are exact on
    the cleaned text, so the readback equals the cleaned string (PDF:
    ASCII-projected + right-trimmed, matching the extractor's final
    strip); per-format census through the manifest twin."""
    from architxt_spark.sinks.corpus import corpus_manifest_sql

    rb = r"""(
        SELECT CASE d % 5 WHEN 0 THEN (CASE WHEN d % 4 = 3
                                            THEN 'ods' ELSE 'xls' END)
                          WHEN 1 THEN 'docx'
                          WHEN 2 THEN 'odt' WHEN 3 THEN 'pdf'
                          ELSE 'pptx' END AS fmt,
               CASE WHEN d % 5 = 3
                    THEN rtrim(regexp_replace(clean, '[^ -~]', '?', 'g'))
                    ELSE clean END AS back
        FROM (
            SELECT doc_id AS d,
                   'd' || CAST(doc_id AS VARCHAR) || ': ' ||
                   regexp_replace(COALESCE(text, ''),
                                  '[\x00-\x1f\x7f]', ' ', 'g') AS clean
            FROM documents WHERE doc_id % 3 = 1
        )
    )"""
    return corpus_manifest_sql(rb, ["fmt"], text_col="back")


#: image near-dup oracle CTEs, shared verbatim by `multimodal_dedup` and
#: the crawl-media composite (same fixture formula → same hash replay)
_IMG_DEDUP_WITH = """
            WITH zc AS (
              SELECT doc_id AS d, r, c,
                     (doc_id // 4) * 73 + r * 9 + c AS z
              FROM documents, range(0, 8) t1(r), range(0, 9) t2(c)
            ),
            cells AS (
              SELECT d, r, c,
                     CAST(
                       (((z * z + 3 * z) % 7919) % 192)
                       + CASE WHEN d % 4 = 2 THEN 8 ELSE 0 END
                       + CASE WHEN d % 4 = 3
                                   AND r = (d // 4) % 8
                                   AND c = (d // 4) % 7 + 1
                              THEN (((((z * z + 3 * z) % 7919) % 192) + 96) % 192)
                                   - (((z * z + 3 * z) % 7919) % 192)
                              ELSE 0 END
                     AS BIGINT) AS v
              FROM zc
            ),
            dh AS (
              SELECT a.d,
                     SUM(CASE WHEN b.v > a.v
                              THEN CAST(1 AS HUGEINT) << (a.r * 8 + a.c)
                              ELSE 0 END) AS u
              FROM cells a JOIN cells b
                ON b.d = a.d AND b.r = a.r AND b.c = a.c + 1
              WHERE a.c < 8
              GROUP BY a.d
            ),
            ah AS (
              SELECT d,
                     SUM(CASE WHEN v * 64 > tot
                              THEN CAST(1 AS HUGEINT) << (r * 8 + c)
                              ELSE 0 END) AS u
              FROM (SELECT *, SUM(v) OVER (PARTITION BY d) AS tot
                    FROM cells WHERE c < 8) t
              GROUP BY d
            ),
            hashes AS (
              SELECT dh.d,
                     CAST(CASE WHEN dh.u >= 9223372036854775808
                               THEN dh.u - 18446744073709551616
                               ELSE dh.u END AS BIGINT) AS dhash,
                     CAST(CASE WHEN ah.u >= 9223372036854775808
                               THEN ah.u - 18446744073709551616
                               ELSE ah.u END AS BIGINT) AS ahash
              FROM dh JOIN ah ON ah.d = dh.d
            )"""

_IMG_DEDUP_SELECTS = """
            SELECT 'hash' AS variant, CAST(d AS VARCHAR) AS s,
                   dhash AS a, ahash AS b
            FROM hashes
            UNION ALL
            SELECT 'pairs',
                   CAST(x.d AS VARCHAR) || '|' || CAST(y.d AS VARCHAR),
                   CAST(bit_count(xor(x.dhash, y.dhash)) AS BIGINT),
                   CAST(NULL AS BIGINT)
            FROM hashes x JOIN hashes y
              ON CAST(x.d AS VARCHAR) < CAST(y.d AS VARCHAR)
            WHERE bit_count(xor(x.dhash, y.dhash)) <= 3"""


def oracle_sql() -> dict[str, str]:
    """Driver contract: per-operator oracle parts from
    :func:`_oracle_parts`, with the round-7 registry folds assembled as
    the EXACT union of their constituents' SQL — the folded twin runs
    the same per-operator SQL, only re-shaped into the tagged schema."""
    o = _oracle_parts()

    o["ann_suite"] = (
        "SELECT variant, query_id, rank, neighbor_id, CAST(sim AS DOUBLE) AS score FROM ("
        + o.pop("ann_topk")
        + ") UNION ALL SELECT 'ivf_' || variant, query_id, rank, neighbor_id, CAST(sim AS DOUBLE) FROM ("
        + o.pop("ann_ivf_topk")
        + ") UNION ALL SELECT 'pq', query_id, rank, neighbor_id, CAST(adc AS DOUBLE) FROM ("
        + o.pop("ann_pq_adc")
        + ")"
    )
    o["window_grouping"] = (
        "SELECT 'window' AS variant, CAST(o_custkey AS VARCHAR) AS k1,"
        " CAST(o_orderkey AS VARCHAR) AS k2, CAST(rank AS BIGINT) AS n,"
        " running_total AS val FROM ("
        + o.pop("window_orders")
        + ") UNION ALL SELECT variant, o_orderstatus, o_orderpriority, n, total FROM ("
        + o.pop("grouping_orders")
        + ")"
    )
    o["corpus_health"] = (
        "SELECT * FROM ("
        + o.pop("corpus_report")
        + ") UNION ALL SELECT s.section, d.token AS key,"
        " CASE s.section WHEN 'drift_count_a' THEN CAST(d.c_a AS DOUBLE)"
        " WHEN 'drift_count_b' THEN CAST(d.c_b AS DOUBLE)"
        " ELSE d.jeffreys END AS value FROM ("
        + o.pop("corpus_drift")
        + ") d CROSS JOIN (VALUES ('drift_count_a'), ('drift_count_b'),"
        " ('drift_jeffreys')) s(section)"
    )
    o["scalar_funcs"] = (
        "SELECT 'string' AS variant, CAST(p_partkey AS VARCHAR) AS k1,"
        " first_word AS k2, CAST(name_len AS BIGINT) AS n1,"
        " CAST(brand_type_dist AS BIGINT) AS n2 FROM ("
        + o.pop("string_funcs_parts")
        + ") UNION ALL SELECT 'date', CAST(yr AS VARCHAR), CAST(mo AS VARCHAR),"
        " n_orders, CAST(NULL AS BIGINT) FROM ("
        + o.pop("date_math_orders")
        + ") UNION ALL SELECT 'json', event_type, CAST(NULL AS VARCHAR), n, k_sum FROM ("
        + o.pop("json_props_events")
        + ")"
    )
    o["doc_quality_stats"] = (
        "SELECT g.*, w.n_grams, w.n_winnowed FROM ("
        + o.pop("gopher_quality_flags")
        + ") g JOIN ("
        + o.pop("doc_fingerprint_winnow")
        + ") w USING (doc_id)"
    )
    o["bpe_suite"] = (
        o.pop("bpe_tokenizer")
        + " UNION ALL SELECT 'merges', merged, \"left\" || ' ' || \"right\","
        " CAST(step AS BIGINT) * 1000000000 + freq FROM ("
        + o.pop("bpe_train_merges")
        + ")"
    )
    o["events_funnel"] = (
        "SELECT 'funnel' AS variant, stage AS k, CAST(NULL AS BIGINT) AS n1,"
        " n_users AS n2 FROM ("
        + o.pop("funnel_signup_view_purchase")
        + ") UNION ALL SELECT 'retention', strftime(cohort_week, '%Y-%m-%d'),"
        " week_n, n_users FROM ("
        + o.pop("retention_cohorts")
        + ")"
    )
    o["export_stats"] = (
        "SELECT 'sql' AS variant, CAST(stmt_no AS VARCHAR) AS k,"
        " CAST(NULL AS BIGINT) AS n, ddl AS s FROM ("
        + o.pop("export_sql_ddl")
        + ") UNION ALL SELECT 'cypher', kind, n, CAST(NULL AS VARCHAR) FROM ("
        + o.pop("export_cypher_stats")
        + ")"
    )
    o["temporal_joins"] = (
        "SELECT 'asof' AS variant, user_id AS id1, event_id AS id2,"
        " prev_purchase AS v1, next_purchase AS v2 FROM ("
        + o.pop("asof_events")
        + ") UNION ALL SELECT 'range', signup_event, CAST(NULL AS BIGINT),"
        " n_clicks, CAST(NULL AS BIGINT) FROM ("
        + o.pop("range_join_signup_clicks")
        + ")"
    )
    o["dedup_pairs"] = (
        o.pop("dedup_ngram_jaccard")
        + " UNION ALL SELECT 'minhash' AS variant, id_a, id_b, est_jaccard AS score FROM ("
        + o.pop("dedup_minhash_lsh")
        + ")"
    )
    fm_stream = o.pop("stream_fm_distinct")
    o["sketch_suite"] = (
        o["sketch_suite"]
        + " UNION ALL SELECT 'fm_stream', '', 'm', CAST(m AS DOUBLE) FROM ("
        + fm_stream
        + ") UNION ALL SELECT 'fm_stream', '', 'est_distinct',"
        " CAST(est_distinct AS DOUBLE) FROM ("
        + fm_stream
        + ")"
    )
    return o


def _oracle_parts() -> dict[str, str]:
    decimal_rev = (
        "SUM(CAST(l_extendedprice AS DECIMAL(18,4))"
        " * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))))"
    )
    return {
        "scan_filter_project": """
            SELECT l_orderkey, l_linenumber, l_quantity
            FROM lineitem
            WHERE l_quantity > 45 AND l_shipdate >= TIMESTAMP '1997-01-01'
        """,
        "agg_pricing_summary": f"""
            SELECT l_returnflag, l_linestatus,
                   CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_qty,
                   CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_base_price,
                   CAST(ROUND({decimal_rev}, 2) AS DOUBLE) AS sum_disc_price,
                   CAST(ROUND(AVG(CAST(l_quantity AS DECIMAL(18,4))), 4) AS DOUBLE) AS avg_qty,
                   CAST(COUNT(*) AS BIGINT) AS count_order
            FROM lineitem
            GROUP BY l_returnflag, l_linestatus
        """,
        "join_revenue_by_nation": f"""
            SELECT n_name, CAST(ROUND({decimal_rev}, 2) AS DOUBLE) AS revenue
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'EUROPE'
            GROUP BY n_name
        """,
        "join_filtered_customers": """
            SELECT 'anti' AS variant, c_custkey, c_name AS detail
            FROM customer
            WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
            UNION ALL
            SELECT 'semi' AS variant, c_custkey, c_mktsegment AS detail
            FROM customer
            WHERE EXISTS (
                SELECT 1 FROM orders
                WHERE o_custkey = c_custkey AND o_totalprice > 100000
            )
        """,
        "window_orders": """
            SELECT o_custkey, o_orderkey, CAST(rank AS INT) AS rank, running_total
            FROM (
                SELECT o_custkey, o_orderkey,
                       ROW_NUMBER() OVER (PARTITION BY o_custkey
                                          ORDER BY o_totalprice DESC, o_orderkey) AS rank,
                       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
                            PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS DOUBLE) AS running_total
                FROM orders
            )
            WHERE rank <= 3
        """,
        "sort_limit_top_orders": """
            SELECT o_orderkey,
                   CAST(ROUND(CAST(o_totalprice AS DECIMAL(18,4)), 2) AS DOUBLE) AS o_totalprice
            FROM orders
            ORDER BY o_totalprice DESC, o_orderkey
            LIMIT 10
        """,
        "setop_nations_cust_minus_supp": """
            SELECT DISTINCT nationkey FROM (
                SELECT c_nationkey AS nationkey FROM customer
                EXCEPT
                SELECT s_nationkey AS nationkey FROM supplier
            )
        """,
        "grouping_orders": """
            SELECT 'rollup' AS variant, o_orderstatus, o_orderpriority,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS total
            FROM orders
            GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
            UNION ALL
            SELECT 'cube', o_orderstatus, o_orderpriority,
                   CAST(COUNT(*) AS BIGINT),
                   CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE)
            FROM orders
            GROUP BY CUBE (o_orderstatus, o_orderpriority)
            UNION ALL
            SELECT 'gsets', o_orderstatus, o_orderpriority,
                   CAST(COUNT(*) AS BIGINT),
                   CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE)
            FROM orders
            GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """,
        "percentile_orders": """
            SELECT o_orderpriority,
                   ROUND(quantile_cont(CAST(o_totalprice AS DOUBLE), 0.5), 4) AS p50,
                   ROUND(quantile_cont(CAST(o_totalprice AS DOUBLE), 0.9), 4) AS p90,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM orders
            GROUP BY o_orderpriority
        """,
        "asof_events": """
            WITH s AS (
                SELECT user_id, event_id, ts FROM events WHERE event_type = 'signup'
            ), p AS (
                SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase'
            ), back AS (
                SELECT s.user_id, s.event_id, p.event_id AS pe
                FROM s ASOF LEFT JOIN p
                  ON s.user_id = p.user_id AND s.ts >= p.ts
            ), fwd AS (
                SELECT s.user_id, s.event_id, p.event_id AS pe,
                       ROW_NUMBER() OVER (
                           PARTITION BY s.user_id, s.event_id
                           ORDER BY p.ts, p.event_id
                       ) AS rk
                FROM s JOIN p ON p.user_id = s.user_id
                            AND p.ts >= s.ts AND p.ts <= s.ts + INTERVAL 7 DAY
            )
            SELECT s.user_id, s.event_id,
                   back.pe AS prev_purchase, fwd.pe AS next_purchase
            FROM s
            LEFT JOIN back USING (user_id, event_id)
            LEFT JOIN (SELECT user_id, event_id, pe FROM fwd WHERE rk = 1) fwd
                 USING (user_id, event_id)
        """,
        "range_join_signup_clicks": """
            SELECT s.event_id AS signup_event, CAST(COUNT(*) AS BIGINT) AS n_clicks
            FROM (SELECT user_id, ts FROM events WHERE event_type = 'click') c
            JOIN (SELECT user_id, event_id, ts AS s_start, ts + INTERVAL 1 HOUR AS s_end
                  FROM events WHERE event_type = 'signup') s
              ON c.user_id = s.user_id AND c.ts >= s.s_start AND c.ts < s.s_end
            GROUP BY 1
        """,
        "string_funcs_parts": """
            SELECT p_partkey,
                   UPPER(regexp_extract(p_name, '^(\\w+)', 1)) AS first_word,
                   CAST(LENGTH(p_name) AS INT) AS name_len,
                   CAST(levenshtein(p_brand, p_type) AS INT) AS brand_type_dist
            FROM part
        """,
        "date_math_orders": """
            SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS yr,
                   CAST(EXTRACT(month FROM o_orderdate) AS INT) AS mo,
                   CAST(COUNT(*) AS BIGINT) AS n_orders
            FROM orders
            GROUP BY 1, 2
        """,
        "json_props_events": """
            SELECT event_type,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS k_sum
            FROM events
            GROUP BY event_type
        """,
        "distinct_parts_per_brand": """
            SELECT p_brand,
                   CAST(COUNT(DISTINCT p_type) AS BIGINT) AS n_types,
                   MAX(p_size) AS max_size
            FROM part
            GROUP BY p_brand
        """,
        "dataset_extract_nation": """
            SELECT DISTINCT CAST(n_name AS VARCHAR) AS n_name,
                            CAST(n_nationkey AS VARCHAR) AS n_nationkey
            FROM nation
        """,
        "schema_groups_nation": """
            SELECT * FROM (VALUES
                ('nation', 'n_name'), ('nation', 'n_nationkey'),
                ('region', 'r_name'), ('region', 'r_regionkey'),
                ('__metric__:group_overlap', '0.000000'),
                ('__metric__:group_balance', '1.000000')
            ) AS t(group_name, entity)
        """,
        "forest_stats_documents": """
            WITH e AS (
                SELECT COUNT(doc_id) + COUNT(text) + COUNT(lang)
                       + COUNT(source) + COUNT(n_chars) AS n_ents,
                       COUNT(*) AS n_docs
                FROM documents
            ),
            -- num_productions: the ROOT -> group rule plus one
            -- group -> ordered-entity rule per distinct non-null
            -- column pattern (entity leaves are not producers)
            p AS (
                SELECT COUNT(*) AS n_patterns FROM (
                    SELECT DISTINCT doc_id IS NOT NULL AS c1,
                                    text IS NOT NULL AS c2,
                                    lang IS NOT NULL AS c3,
                                    source IS NOT NULL AS c4,
                                    n_chars IS NOT NULL AS c5
                    FROM documents
                )
            )
            SELECT CAST(n_docs AS BIGINT) AS n_trees,
                   CAST(2 * n_docs + n_ents AS BIGINT) AS n_nodes,
                   CAST(n_ents AS BIGINT) AS n_entities,
                   CAST(n_docs AS BIGINT) AS n_groups,
                   2 AS max_depth,
                   ROUND((0.0 * n_docs + 1.0 * n_docs + 2.0 * n_ents)
                         / (2 * n_docs + n_ents), 6) AS avg_depth,
                   CAST(5 AS BIGINT) AS n_entity_labels,
                   CAST(1 + p.n_patterns AS BIGINT) AS n_productions,
                   0.0 AS ratio_unlabelled
            FROM e, p
        """,
        "metrics_customer": """
            SELECT 'confidence' AS metric, (
                SELECT ROUND(SUM(m) / CAST((SELECT COUNT(*) FROM customer) AS DOUBLE), 6)
                FROM (
                    SELECT MAX(c) AS m
                    FROM (
                        SELECT c_nationkey, c_acctbal, c_mktsegment, COUNT(*) AS c
                        FROM customer GROUP BY 1, 2, 3
                    )
                    GROUP BY c_nationkey, c_acctbal
                )
            ) AS value
            UNION ALL
            SELECT 'dependency', (
                WITH t AS (SELECT c_nationkey, c_acctbal, c_mktsegment FROM customer),
                n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS total FROM t),
                g AS (SELECT c_nationkey, c_acctbal, c_mktsegment, COUNT(*) AS c
                      FROM t GROUP BY 1, 2, 3),
                c1 AS (SELECT SUM(m) AS s FROM (SELECT MAX(c) AS m FROM g GROUP BY c_acctbal, c_mktsegment)),
                c2 AS (SELECT SUM(m) AS s FROM (SELECT MAX(c) AS m FROM g GROUP BY c_nationkey, c_mktsegment)),
                c3 AS (SELECT SUM(m) AS s FROM (SELECT MAX(c) AS m FROM g GROUP BY c_nationkey, c_acctbal))
                SELECT ROUND(GREATEST(c1.s / n.total, c2.s / n.total, c3.s / n.total), 6)
                FROM c1, c2, c3, n
            )
            UNION ALL
            SELECT 'redundancy', (
                WITH c AS (SELECT c_nationkey, c_mktsegment, c_acctbal FROM customer),
                marked AS (
                    SELECT
                        (COUNT(*) OVER (PARTITION BY c_nationkey, c_mktsegment) > 1
                         OR COUNT(*) OVER (PARTITION BY c_nationkey, c_acctbal) > 1
                         OR COUNT(*) OVER (PARTITION BY c_mktsegment, c_acctbal) > 1) AS dup
                    FROM c
                )
                SELECT ROUND(SUM(CASE WHEN dup THEN 1 ELSE 0 END)
                             / CAST(COUNT(*) AS DOUBLE), 6)
                FROM marked
            )
            UNION ALL
            SELECT 'cluster_ami', (
                -- AMI with sklearn's arithmetic normalization; the
                -- expected-MI hypergeometric sum replayed via
                -- lgamma + generate_series (metrics.py:139-190)
                WITH l AS (SELECT c_mktsegment AS a,
                                  CAST(c_nationkey % 3 AS VARCHAR) AS b
                           FROM customer),
                nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM l),
                ac AS (SELECT a, CAST(COUNT(*) AS DOUBLE) AS ai FROM l GROUP BY a),
                bc AS (SELECT b, CAST(COUNT(*) AS DOUBLE) AS bj FROM l GROUP BY b),
                jc AS (SELECT a, b, CAST(COUNT(*) AS DOUBLE) AS c FROM l GROUP BY a, b),
                mi AS (SELECT SUM((c/n) * LN((c/n) / ((ai/n)*(bj/n)))) AS v
                       FROM jc JOIN ac USING (a) JOIN bc USING (b), nn),
                ha AS (SELECT -SUM((ai/n)*LN(ai/n)) AS v FROM ac, nn),
                hb AS (SELECT -SUM((bj/n)*LN(bj/n)) AS v FROM bc, nn),
                terms AS (
                    SELECT ai, bj, n,
                           UNNEST(GENERATE_SERIES(
                               CAST(GREATEST(1, ai + bj - n) AS BIGINT),
                               CAST(LEAST(ai, bj) AS BIGINT))) AS nij
                    FROM ac, bc, nn
                ),
                emi AS (
                    SELECT COALESCE(SUM(
                        EXP( (LGAMMA(bj+1) - LGAMMA(nij+1) - LGAMMA(bj-nij+1))
                           + (LGAMMA(n-bj+1) - LGAMMA(ai-nij+1)
                              - LGAMMA(n-bj-ai+nij+1))
                           - (LGAMMA(n+1) - LGAMMA(ai+1) - LGAMMA(n-ai+1)) )
                        * (nij/n) * LN((n*nij)/(ai*bj))), 0) AS v
                    FROM terms WHERE nij > 0
                )
                SELECT CASE WHEN (ha.v + hb.v)/2 - emi.v = 0
                            THEN CASE WHEN mi.v = emi.v THEN 1.0 ELSE 0.0 END
                            ELSE ROUND((mi.v - emi.v)
                                       / ((ha.v + hb.v)/2 - emi.v), 6) END
                FROM mi, ha, hb, emi
            )
            UNION ALL
            SELECT 'cluster_completeness', (
                -- 1 − H(B|A)/H(B) (metrics.py:196-216)
                WITH l AS (SELECT c_mktsegment AS a,
                                  CAST(c_nationkey % 3 AS VARCHAR) AS b
                           FROM customer),
                nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM l),
                ac AS (SELECT a, CAST(COUNT(*) AS DOUBLE) AS ai FROM l GROUP BY a),
                bc AS (SELECT b, CAST(COUNT(*) AS DOUBLE) AS bj FROM l GROUP BY b),
                jc AS (SELECT a, b, CAST(COUNT(*) AS DOUBLE) AS c FROM l GROUP BY a, b),
                hb AS (SELECT -SUM((bj/n)*LN(bj/n)) AS v FROM bc, nn),
                hba AS (SELECT -SUM((c/n)*LN(c/ai)) AS v
                        FROM jc JOIN ac USING (a), nn)
                SELECT CASE WHEN hb.v = 0 THEN 1.0
                            ELSE ROUND(1 - hba.v/hb.v, 6) END
                FROM hb, hba
            )
        """,
        "text_profile": f"""
            SELECT doc_id,
                   CAST({T.token_count_sql('text')} AS INT) AS n_tokens,
                   ROUND({T.distinct_token_ratio_sql('text')}, 5) AS distinct_ratio,
                   {T.lang_id_sql('text')} AS lang_guess,
                   {T.fingerprint_sql('text')} AS fingerprint,
                   ROUND({T.quality_score_sql('text')}, 5) AS quality,
                   ROUND({T.dup_ngram_fraction_sql('text', 2)}, 5) AS rep_bigram,
                   ROUND({T.dup_ngram_fraction_sql('text', 3)}, 5) AS rep_trigram
            FROM documents
        """,
        "pii_redaction": f"""
            WITH p AS (SELECT doc_id, {_PII_INJECT_SQL} AS text FROM documents)
            SELECT doc_id,
                   CAST({T.pii_count_sql('text', 'email')} AS BIGINT) AS n_email,
                   CAST({T.pii_count_sql('text', 'ipv4')} AS BIGINT) AS n_ip,
                   CAST({T.pii_count_sql('text', 'phone')} AS BIGINT) AS n_phone,
                   md5({T.redact_pii_sql('text')}) AS redacted_md5
            FROM p
            WHERE doc_id % 7 = 0 OR doc_id % 11 = 0 OR doc_id % 13 = 0
        """,
        "contamination_screen": _contam_screen_sql(),
        "doc_loader_json_props": """
            SELECT DISTINCT CAST(props->>'k' AS VARCHAR) AS k FROM events
        """,
        "simple_rewrite_documents": """
            SELECT '1' AS group_id, CAST(COUNT(*) AS BIGINT) AS n_trees FROM documents
        """,
        "rewrite_documents": """
            WITH n AS (SELECT COUNT(*) AS c FROM (SELECT * FROM documents LIMIT 200))
            SELECT 'COLL' AS node_type, CAST(c AS BIGINT) AS n_nodes FROM n
            UNION ALL SELECT 'GROUP', CAST(c AS BIGINT) FROM n
            UNION ALL SELECT 'ENT', CAST(3 * c AS BIGINT) FROM n
            UNION ALL SELECT 'UNTYPED', CAST(3 * c AS BIGINT) FROM n
        """,
        "cluster_documents": """
            SELECT CAST(2 * COUNT(*) AS BIGINT) AS support,
                   CAST(2 * COUNT(*) AS BIGINT) AS n_assigned,
                   CAST(1 AS BIGINT) AS n_clusters,
                   1.0 AS min_score, 1.0 AS max_score,
                   CAST(2 * COUNT(*) AS BIGINT) AS n_fuzzy,
                   CAST(1 AS BIGINT) AS n_fuzzy_clusters,
                   ROUND(2.0 / 3.0, 6) AS fuzzy_score,
                   CAST(3 * COUNT(*) AS BIGINT) AS n_ent_labeled,
                   CAST(1 AS BIGINT) AS n_label_clusters
            FROM documents
        """,
        "llm_label_schema": """
            WITH c AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nation)
            SELECT 'GROUP' AS node_type, 'N_NAME_N_NATIONKEY' AS node_name,
                   CAST(2 * n AS BIGINT) AS n FROM c
            UNION ALL
            SELECT 'GROUP', 'R_NAME_R_REGIONKEY', CAST(2 * n AS BIGINT) FROM c
            UNION ALL
            SELECT 'REL', 'N_NAME_N_NATIONKEY_R_NAME_R_REGIONKEY', CAST(n AS BIGINT) FROM c
        """,
        "cluster_instance_documents": """
            WITH c AS (
                SELECT
                    CAST(SUM(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS DOUBLE) AS e,
                    CAST(SUM(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END) AS DOUBLE) AS o
                FROM documents
            ),
            toks AS (
                SELECT DISTINCT unnest(str_split(text, ' ')) AS tok
                FROM documents WHERE text IS NOT NULL
            ),
            t2 AS (SELECT tok FROM toks WHERE tok <> ''),
            pairs AS (
                SELECT
                    list_distinct(str_split(x.tok, '')) AS ca,
                    list_distinct(str_split(y.tok, '')) AS cb,
                    array_to_string(list_sort(list_distinct(str_split(x.tok, ''))), '') AS sa,
                    array_to_string(list_sort(list_distinct(str_split(y.tok, ''))), '') AS sb,
                    array_to_string(list_sort(list_distinct(str_split(substr(x.tok, 1, 2), ''))), '') AS pa,
                    array_to_string(list_sort(list_distinct(str_split(substr(y.tok, 1, 2), ''))), '') AS pb
                FROM t2 x JOIN t2 y ON x.tok < y.tok
            ),
            sums AS (
                SELECT
                    -- Levenshtein.ratio on sorted distinct sequences = Dice
                    ROUND(SUM(2.0 * len(list_distinct(list_intersect(ca, cb)))
                              / (len(list_distinct(ca)) + len(list_distinct(cb)))), 6) AS lev,
                    ROUND(SUM(jaro_winkler_similarity(sa, sb)), 6) AS jw,
                    ROUND(SUM(CAST(len(list_distinct(list_intersect(ca, cb))) AS DOUBLE)
                              / len(list_distinct(list_concat(ca, cb)))), 6) AS jac,
                    -- context_similarity: decay-2 weighted mean over
                    -- (full charset, 2-char-prefix charset) levels with
                    -- the disjoint-first-level shortcut
                    ROUND(SUM(CASE WHEN len(list_intersect(ca, cb)) = 0 THEN 0.0
                              ELSE (jaro_winkler_similarity(sa, sb)
                                    + jaro_winkler_similarity(pa, pb) / 2.0) / 1.5 END), 6) AS ctx
                FROM pairs
            )
            SELECT DISTINCT 'support' AS tag, support AS value FROM (
                SELECT e AS support FROM c
                UNION ALL SELECT o FROM c
                UNION ALL SELECT 3 * e FROM c
                UNION ALL SELECT 2 * o FROM c
            )
            UNION ALL SELECT 'metric_lev_pairs', lev FROM sums
            UNION ALL SELECT 'metric_jw_pairs', jw FROM sums
            UNION ALL SELECT 'metric_jaccard_pairs', jac FROM sums
            UNION ALL SELECT 'metric_ctx_pairs', ctx FROM sums
            UNION ALL SELECT 'kat_jw_martha_marhta', 0.961111
            UNION ALL SELECT 'kat_jw_below_boost', 0.466667
            UNION ALL SELECT 'kat_lev_kitten_sitting', 0.615385
            UNION ALL SELECT 'kat_jaccard_abc_bcd', 0.5
            UNION ALL SELECT 'kat_jaccard_empty', 1.0
            UNION ALL SELECT 'kat_ctx_disjoint', 0.0
        """,
        "tree_leaves_nation": """
            SELECT CAST(n_nationkey AS VARCHAR) || ' ' || n_name || ' ' ||
                   CAST(n_nationkey AS VARCHAR) || ' ' || n_name || ' ' ||
                   CAST(r_regionkey AS VARCHAR) || ' ' || r_name || ' ' ||
                   CAST(r_regionkey AS VARCHAR) || ' ' || r_name AS text
            FROM nation JOIN region ON n_regionkey = r_regionkey
        """,
        "extract_valid_trees": """
            WITH c AS (SELECT COUNT(*) AS n FROM nation)
            SELECT 'UNTYPED' AS node_type, '' AS node_name, CAST(4 * n AS BIGINT) AS n FROM c
            UNION ALL SELECT 'UNTYPED', 'ROOT', CAST(n AS BIGINT) FROM c
            UNION ALL SELECT 'GROUP', 'nation', CAST(2 * n AS BIGINT) FROM c
            UNION ALL SELECT 'ENT', 'n_name', CAST(2 * n AS BIGINT) FROM c
            UNION ALL SELECT 'ENT', 'n_nationkey', CAST(2 * n AS BIGINT) FROM c
        """,
        "coverage_metric": """
            SELECT ROUND(
                CAST(2 * (SELECT COUNT(*) FROM nation) AS DOUBLE)
                / (2 * (SELECT COUNT(*) FROM nation) + 2 * (SELECT COUNT(*) FROM region)),
            6) AS coverage
        """,
        "export_sql_ddl": """
            SELECT * FROM (VALUES
                (0, 'CREATE TABLE "nation" ("_architxt_oid" VARCHAR PRIMARY KEY, "n_name" VARCHAR, "n_nationkey" VARCHAR, "region_architxt_oid" VARCHAR REFERENCES "region" ("_architxt_oid"))'),
                (1, 'CREATE TABLE "region" ("_architxt_oid" VARCHAR PRIMARY KEY, "r_name" VARCHAR, "r_regionkey" VARCHAR)')
            ) AS t(stmt_no, ddl)
        """,
        "export_cypher_stats": """
            SELECT 'node_merge' AS kind,
                   CAST((SELECT COUNT(*) FROM nation) + (SELECT COUNT(*) FROM region) AS BIGINT) AS n
            UNION ALL
            SELECT 'edge_merge', CAST((SELECT COUNT(*) FROM nation) AS BIGINT)
        """,
        "multimodal_profile": """
            SELECT 'plumbing' AS variant, CAST(doc_id AS VARCHAR) AS media_id,
                   md5(text) AS s,
                   CAST(strlen(text) AS BIGINT) AS a,
                   CAST(1 AS BIGINT) AS b,
                   CAST(NULL AS BIGINT) AS c
            FROM documents
            UNION ALL
            SELECT 'decoded', CAST(doc_id AS VARCHAR),
                   CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'wav' END,
                   CAST(CASE WHEN doc_id % 2 = 0 THEN doc_id % 64 + 1
                             ELSE (doc_id // 2) % 2 + 1 END AS BIGINT),
                   CAST(CASE WHEN doc_id % 2 = 0 THEN (doc_id * 7) % 64 + 1
                             ELSE 8000 END AS BIGINT),
                   CAST(CASE WHEN doc_id % 2 = 0 THEN NULL
                             ELSE (doc_id % 50 + 1) * 10 END AS BIGINT)
            FROM documents
            UNION ALL
            SELECT 'pixels', CAST(doc_id AS VARCHAR),
                   CASE doc_id % 4
                        WHEN 0 THEN CASE WHEN doc_id % 8 = 0
                                         THEN 'png_i' ELSE 'png' END
                        WHEN 1 THEN CASE WHEN doc_id % 16 = 13 THEN 'tiff_g4'
                                         WHEN doc_id % 8 = 5 THEN 'tiff'
                                         ELSE 'gif' END
                        WHEN 2 THEN CASE WHEN doc_id % 8 = 2
                                         THEN 'jpeg_prog' ELSE 'jpeg' END
                        ELSE CASE WHEN doc_id % 32 = 19
                                  THEN 'wav_ulaw' ELSE 'wav' END END,
                   CAST(CASE doc_id % 4
                     WHEN 0 THEN list_sum(list_transform(
                         range(0, (doc_id % 8 + 2) * ((doc_id * 3) % 6 + 2) * 3),
                         i -> ((doc_id * 31 + i * 7) % 256) * (i + 1)))
                     WHEN 1 THEN CASE WHEN doc_id % 16 = 13
                       THEN list_sum(list_transform(
                         range(0, (doc_id % 8 + 2) * ((doc_id * 3) % 6 + 2)),
                         i -> (255 - 255 * (((doc_id + i) % 4) % 2)) * (i + 1)))
                       ELSE list_sum(list_transform(
                         range(0, (doc_id % 8 + 2) * ((doc_id * 3) % 6 + 2) * 3),
                         j -> ((doc_id * 13 + (3 * ((doc_id + j // 3) % 4) + (j % 3)) * 29) % 256) * (j + 1))) END
                     WHEN 2 THEN list_sum(list_transform(
                         range(0, 64 * (doc_id % 3 + 1) * (doc_id % 2 + 1)),
                         p -> ((doc_id * 37
                                + (((p // (8 * (doc_id % 3 + 1))) // 8) * (doc_id % 3 + 1)
                                   + ((p % (8 * (doc_id % 3 + 1))) // 8)) * 11) % 256) * (p + 1)))
                     ELSE CASE WHEN doc_id % 32 = 19
                       -- G.711 µ-law residue: replay the companding
                       -- round-trip closed-form (14-bit floor shift,
                       -- segment CASE, mantissa reconstruction —
                       -- audioop-pinned; single-element list_transform
                       -- binds the intermediates)
                       THEN list_sum(list_transform(
                         range(0, ((doc_id // 2) % 2 + 1) * (doc_id % 50 + 8)),
                         p -> list_transform(
                           [(((doc_id * 11 + (p % (doc_id % 50 + 8)) * 3) % 2001) - 1000
                             + (p // (doc_id % 50 + 8)))], r ->
                           list_transform(
                             [LEAST(CASE WHEN r >= 0 THEN r // 4
                                         ELSE (-r + 3) // 4 END, 8158) + 33], m ->
                             list_transform(
                               [CASE WHEN m < 64 THEN 0 WHEN m < 128 THEN 1
                                     WHEN m < 256 THEN 2 WHEN m < 512 THEN 3
                                     WHEN m < 1024 THEN 4 WHEN m < 2048 THEN 5
                                     WHEN m < 4096 THEN 6 ELSE 7 END], e ->
                               (CASE WHEN r >= 0 THEN 1 ELSE -1 END) *
                               ((((m >> (e + 1)) & 15) * 8 + 132) * (1 << e) - 132)
                             )[1]
                           )[1]
                         )[1] * (p + 1)))
                       ELSE list_sum(list_transform(
                         range(0, ((doc_id // 2) % 2 + 1) * (doc_id % 50 + 8)),
                         p -> (((doc_id * 11 + (p % (doc_id % 50 + 8)) * 3) % 2001) - 1000
                               + (p // (doc_id % 50 + 8))) * (p + 1))) END
                   END AS BIGINT),
                   CAST(CASE doc_id % 4
                     WHEN 2 THEN 64 * (doc_id % 3 + 1) * (doc_id % 2 + 1)
                     WHEN 3 THEN ((doc_id // 2) % 2 + 1) * (doc_id % 50 + 8)
                     ELSE (doc_id % 8 + 2) * ((doc_id * 3) % 6 + 2)
                          * (CASE WHEN doc_id % 16 = 13 THEN 1 ELSE 3 END)
                   END AS BIGINT),
                   CAST(NULL AS BIGINT)
            FROM documents
            UNION ALL
            SELECT 'frames', CAST(doc_id AS VARCHAR), 'avi',
                   CAST(((doc_id * 53) % 256) * 1
                        + ((doc_id * 53 + 38) % 256) * 3 AS BIGINT),
                   CAST(2 AS BIGINT),
                   CAST(NULL AS BIGINT)
            FROM documents WHERE doc_id % 16 = 0
        """,
        # closed-form replay of the r11 image near-dup fixture: the 8x8
        # blocks are constant, so block means == the formula values and
        # dhash/ahash are pure-integer expressions; the banded Spark join
        # is exact at max_hamming = bands-1, so an ALL-PAIRS scan here is
        # the honest verification of it
        "multimodal_dedup": _IMG_DEDUP_WITH + """,
            aen AS (
              -- audio frame energies: 65 frames x 16 samples, the same
              -- formula the fixture WAV encoder writes; member transforms
              -- (3x amplitude, one-sample bump at f=170) applied inline
              SELECT d, i,
                     SUM(ABS(
                       CASE WHEN d % 3 = 1 THEN b * 3
                            WHEN d % 3 = 2 AND fi = 170 THEN b + 4000
                            ELSE b END)) AS e
              FROM (
                SELECT doc_id AS d, i, i * 16 + f AS fi,
                       ((((doc_id // 3) * 131 + i * 16 + f)
                         * ((doc_id // 3) * 131 + i * 16 + f)
                         + 3 * ((doc_id // 3) * 131 + i * 16 + f)) % 2001)
                       - 1000 AS b
                FROM documents, range(0, 65) t1(i), range(0, 16) t2(f)
              )
              GROUP BY d, i
            ),
            afp AS (
              SELECT a.d,
                     CAST(CASE WHEN u >= 9223372036854775808
                               THEN u - 18446744073709551616
                               ELSE u END AS BIGINT) AS fp
              FROM (
                SELECT a.d,
                       SUM(CASE WHEN n.e > a.e
                                THEN CAST(1 AS HUGEINT) << a.i
                                ELSE 0 END) AS u
                FROM aen a JOIN aen n ON n.d = a.d AND n.i = a.i + 1
                WHERE a.i < 64
                GROUP BY a.d
              ) a(d, u)
            )
        """ + _IMG_DEDUP_SELECTS + """
            UNION ALL
            SELECT 'afp', CAST(d AS VARCHAR), fp, CAST(1040 AS BIGINT)
            FROM afp
            UNION ALL
            SELECT 'apairs',
                   CAST(x.d AS VARCHAR) || '|' || CAST(y.d AS VARCHAR),
                   CAST(bit_count(xor(x.fp, y.fp)) AS BIGINT),
                   CAST(NULL AS BIGINT)
            FROM afp x JOIN afp y
              ON CAST(x.d AS VARCHAR) < CAST(y.d AS VARCHAR)
            WHERE bit_count(xor(x.fp, y.fp)) <= 3
        """,
        "crawl_media_dedup": _IMG_DEDUP_WITH + _IMG_DEDUP_SELECTS,
        "doc_loader_files": _doc_loader_files_sql(),
        "gen_instance": """
            SELECT * FROM (VALUES
                ('UNTYPED', 'ROOT', CAST(300 AS BIGINT)),
                ('UNTYPED', '', CAST(600 AS BIGINT)),
                ('COLL', 'person', CAST(100 AS BIGINT)),
                ('COLL', 'city', CAST(100 AS BIGINT)),
                ('GROUP', 'person', CAST(200 AS BIGINT)),
                ('GROUP', 'city', CAST(200 AS BIGINT)),
                ('REL', 'person<->city', CAST(100 AS BIGINT)),
                ('ENT', 'name', CAST(200 AS BIGINT)),
                ('ENT', 'age', CAST(200 AS BIGINT)),
                ('ENT', 'zip', CAST(200 AS BIGINT))
            ) AS t(node_type, node_name, n)
        """,
        "llm_rewrite_stub": """
            SELECT 'DOCUMENTS' AS group_name, CAST(COUNT(*) AS BIGINT) AS n FROM documents
        """,
        "extract_vocab": """
            SELECT 'documents' AS label, CAST(COUNT(*) AS BIGINT) AS support FROM documents
            UNION ALL
            SELECT 'nation', CAST(COUNT(*) AS BIGINT) FROM nation
        """,
        "nlp_parse_forest": f"""
            SELECT s.doc_id, s.sent_idx, s.sent_start, s.sent_end, s.n_tokens,
                   c.n_trees, c.n_nodes, c.n_leaves,
                   -- _coord_enrich_golden() pinned: fix_all_coord +
                   -- enrich (REL::nested unnest, overlap duplication)
                   CAST(22 AS BIGINT) AS golden_nodes,
                   CAST(11 AS BIGINT) AS golden_leaves,
                   CAST(3 AS BIGINT) AS golden_ents,
                   CAST(247446111533113227 AS BIGINT) AS golden_shape_hash
            FROM (
                SELECT doc_id,
                       0 AS sent_idx,
                       0 AS sent_start,
                       CAST(strlen(text) AS INT) AS sent_end,
                       CAST({T.token_count_sql('text')} AS INT) AS n_tokens
                FROM documents
                WHERE trim(text) <> ''
            ) s CROSS JOIN (
                SELECT CAST(COUNT(*) AS BIGINT) AS n_trees,
                       CAST(SUM({T.token_count_sql('text')}) + COUNT(*) AS BIGINT) AS n_nodes,
                       CAST(SUM({T.token_count_sql('text')}) AS BIGINT) AS n_leaves
                FROM documents
                WHERE trim(text) <> ''
            ) c
        """,
        "ann_ivf_topk": (
            "SELECT 'first' AS variant, * FROM ("
            + ann.ivf_topk_sql("embeddings", k=5, n_cells=16, nprobe=4, max_query_id=10)
            + ") UNION ALL SELECT 'trained' AS variant, * FROM ("
            + ann.ivf_topk_sql(
                "embeddings", k=5, n_cells=16, nprobe=4, max_query_id=10,
                codebook_ctes=ann.train_codebook_ctes("embeddings", n_cells=16, iterations=2),
            )
            # the persisted-index path answers identically to 'trained'
            # for the same codebook (partition pruning changes I/O, not
            # results) — the twin re-tags the trained SQL
            + ") UNION ALL SELECT 'indexed' AS variant, * FROM ("
            + ann.ivf_topk_sql(
                "embeddings", k=5, n_cells=16, nprobe=4, max_query_id=10,
                codebook_ctes=ann.train_codebook_ctes("embeddings", n_cells=16, iterations=2),
            )
            + ")"
        ),
        "semantic_dedup": ann.semantic_dedup_sql(
            "embeddings",
            n_cells=16,
            threshold=0.35,
            codebook_ctes=ann.train_codebook_ctes("embeddings", n_cells=16, iterations=2),
        ),
        "lang_distribution": f"""
            SELECT {T.lang_id_sql('text')} AS lang_guess,
                   CAST(COUNT(*) AS BIGINT) AS n_docs
            FROM documents
            GROUP BY 1
        """,
        "dedup_minhash_lsh": dedup.minhash_lsh_pairs_sql(
            "documents", "text", "doc_id", max_band_df=1000
        ),
        "events_rollup_streaming": """
            SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
                   event_type,
                   CAST(COUNT(*) AS BIGINT) AS n_events,
                   CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS value_sum
            FROM events
            GROUP BY 1, 2
        """,
        "join_salted_revenue": """
            SELECT o.o_orderstatus,
                   ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
                   CAST(COUNT(*) AS BIGINT) AS n_lines
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
            GROUP BY o.o_orderstatus
        """,
        "retention_cohorts": """
            WITH first AS (
                SELECT user_id, MIN(date_trunc('week', ts)) AS cohort_week
                FROM events WHERE event_type = 'signup' GROUP BY user_id
            ), active AS (
                SELECT DISTINCT e.user_id, f.cohort_week,
                       CAST(FLOOR((epoch(e.ts) - epoch(f.cohort_week)) / (7 * 86400)) AS BIGINT) AS week_n
                FROM events e JOIN first f USING (user_id)
                WHERE e.ts >= f.cohort_week
            )
            SELECT cohort_week, week_n, CAST(COUNT(*) AS BIGINT) AS n_users
            FROM active GROUP BY cohort_week, week_n
        """,
        "unpivot_orders": """
            WITH long AS (
                SELECT 'o_totalprice' AS metric, o_totalprice AS value FROM orders
                UNION ALL
                SELECT 'o_custkey', o_custkey FROM orders
            )
            SELECT metric, ROUND(AVG(value), 4) AS avg_value,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM long GROUP BY metric
        """,
        "funnel_signup_view_purchase": """
            WITH su AS (
                SELECT user_id, MIN(ts) AS st FROM events
                WHERE event_type = 'signup' GROUP BY user_id
            ), vi AS (
                SELECT e.user_id, MIN(e.ts) AS vt FROM events e JOIN su USING (user_id)
                WHERE e.event_type = 'view' AND e.ts >= su.st GROUP BY e.user_id
            ), pu AS (
                SELECT e.user_id, MIN(e.ts) AS pt FROM events e JOIN vi USING (user_id)
                WHERE e.event_type = 'purchase' AND e.ts >= vi.vt GROUP BY e.user_id
            ), stages AS (
                SELECT '1_signup' AS stage, user_id FROM su
                UNION ALL SELECT '2_view', user_id FROM vi
                UNION ALL SELECT '3_purchase', user_id FROM pu
            )
            SELECT stage, CAST(COUNT(*) AS BIGINT) AS n_users
            FROM stages GROUP BY stage
        """,
        "doc_fingerprint_winnow": f"""
            SELECT doc_id,
                   CAST(len({T.shingle_fingerprints_sql('text', 3)}) AS BIGINT) AS n_grams,
                   CAST(len({T.winnow_fingerprints_sql('text', 3, 4)}) AS BIGINT) AS n_winnowed
            FROM documents
        """,
        "gopher_quality_flags": f"""
            WITH q AS (
                SELECT doc_id,
                       {T.token_count_sql('text')} AS n_tok,
                       length(regexp_replace(text, '\\s+', '', 'g'))
                           / greatest({T.token_count_sql('text')}, 1) AS mean_wl,
                       {T.dup_ngram_fraction_sql('text', 2)} AS rep,
                       {T.stopword_ratio_sql('text')} AS stopr,
                       {T.bpe_token_count_sql('text')} AS bpe
                FROM documents
            )
            SELECT doc_id,
                   CAST(bpe AS BIGINT) AS bpe_tokens,
                   CAST(n_tok BETWEEN 20 AND 100000 AS BIGINT) AS f_words,
                   CAST(mean_wl BETWEEN 3.0 AND 10.0 AS BIGINT) AS f_wordlen,
                   CAST(rep <= 0.2 AS BIGINT) AS f_rep,
                   CAST(stopr >= 0.02 AS BIGINT) AS f_stop,
                   CAST((n_tok BETWEEN 20 AND 100000) AND (mean_wl BETWEEN 3.0 AND 10.0)
                        AND rep <= 0.2 AND stopr >= 0.02 AS BIGINT) AS keep
            FROM q
        """,
        "chunk_pipeline": _chunk_pipeline_sql(),
        "dedup_exact_spans": dedup.exact_span_pairs_sql(
            "documents", "text", "doc_id", min_tokens=12
        ),
        "dedup_components": dedup.connected_components_sql(
            dedup.minhash_lsh_pairs_sql("documents", "text", "doc_id", max_band_df=1000)
        ),
        "dedup_ngram_jaccard": (
            "SELECT 'jaccard' AS variant, id_a, id_b, jaccard AS score FROM ("
            + dedup.ngram_jaccard_pairs_sql("documents", "text", "doc_id", threshold=0.2)
            + ") UNION ALL SELECT 'winnow' AS variant, id_a, id_b,"
            " CAST(n_common AS DOUBLE) AS score FROM ("
            + dedup.winnow_pairs_sql("documents", "text", "doc_id")
            + ")"
        ),
        "dedup_simhash": dedup.simhash_buckets_sql("documents", "text", "doc_id"),
        "dedup_filtered": f"""
            SELECT id AS doc_id FROM ({dedup.dedup_filter_sql('documents', 'text', 'doc_id')})
        """,
        "stream_minhash_dedup": dedup.stream_minhash_dedup_sql(
            "documents", "text", "doc_id"
        ),
        "stream_curate": (
            "SELECT s.doc_id FROM ("
            + dedup.stream_minhash_dedup_sql(
                "("
                + dedup.decontaminate_filter_sql(
                    f"(SELECT * FROM documents WHERE {T.gopher_keep_sql('text')})",
                    "(SELECT doc_id, text FROM documents WHERE doc_id % 37 = 0)",
                    "text",
                    "doc_id",
                    threshold=0.5,
                )
                + ")",
                "text",
                "doc_id",
            )
            + ") s JOIN documents d ON d.doc_id = s.doc_id"
            + f" WHERE {sampling.sample_key_sql('d.doc_id')} < (CASE d.lang "
            + " ".join(
                f"WHEN '{lang}' THEN {thr}"
                for lang, thr in sorted(STREAM_MIX_THRESHOLDS.items())
            )
            + " ELSE 0 END)"
        ),
        "embedding_near_dup": (
            "SELECT 'brute' AS variant, * FROM ("
            + ann.cosine_near_dup_pairs_sql(
                "(SELECT * FROM embeddings WHERE vec_id < 1000)", threshold=0.5
            )
            + ") UNION ALL SELECT 'lsh' AS variant, * FROM ("
            + ann.cosine_near_dup_pairs_lsh_sql("embeddings", dim=64, threshold=0.35)
            + ")"
        ),
        "ann_topk": (
            "SELECT 'brute' AS variant, * FROM ("
            + ann.brute_force_topk_sql("embeddings", k=5, max_query_id=10)
            + ") UNION ALL SELECT 'lsh' AS variant, * FROM ("
            + ann.lsh_topk_sql("embeddings", dim=64, k=5, max_query_id=10)
            + ")"
        ),
        "bm25_topk": search.bm25_topk_sql("documents", _BM25_TERMS, k=25),
        "bm25_batch": search.bm25_topk_batch_sql("documents", _BM25_BAGS, k=15),
        "ann_pq_adc": ann.pq_topk_sql("embeddings", k=5, max_query_id=10),
        "ann_recall": ann.ann_recall_sql(
            "embeddings", dim=64, k=5, max_query_id=10,
            methods=("lsh", "ivf", "indexed"),
        ),
        "ppl_buckets": _ppl_buckets_sql(),
        "warc_split_roundtrip": """
            SELECT r.reader, 'doc:' || CAST(d.doc_id AS VARCHAR) AS uri,
                   md5(d.text) AS payload_md5
            FROM documents d
            CROSS JOIN (VALUES ('split'), ('stream'), ('idx')) AS r(reader)
        """,
        "bpe_train_merges": _bpe_sql(),
        "bpe_tokenizer": _bpe_tokenizer_sql(),
        "dsir": _dsir_fold_sql(),
        "sketch_suite": _sketch_suite_sql(),
        "stream_fm_distinct": _stream_fm_sql(),
        "curation_pipeline": _curation_sql(),
        "crawl_to_corpus": _crawl_to_corpus_sql(),
        "c4_clean": _c4_clean_sql(),
        "stream_url_seen": _stream_url_seen_sql(),
        "quality_classifier": _classifier_sql(),
        "domain_profile": _domains_sql(),
        "link_pagerank": _link_pagerank_sql(),
        "unicode_split": _unicode_split_sql(),
        "collocations": T.collocations_sql("documents", min_count=8),
        "corpus_report": _corpus_report_sql(),
        "corpus_delta": dedup.delta_merge_kept_sql("documents", "text", "doc_id"),
        "tfidf_terms": T.tfidf_terms_sql("documents", min_df=3, min_tf=3),
        "corpus_drift": T.corpus_drift_sql(
            "(SELECT * FROM documents WHERE doc_id % 2 = 0)",
            "(SELECT * FROM documents WHERE doc_id % 2 = 1)",
            min_count=20,
        ),
        "random_project": f"""
            SELECT vec_id, CAST(j AS BIGINT) AS j, proj[j + 1] AS component
            FROM ({ann.random_project_sql("embeddings")}),
                 (SELECT unnest(range(0, 8)) AS j)
        """,
        "lm_perplexity": _lm_sql(),
        "doc_chunking": T.chunk_documents_sql("documents", chunk_tokens=64, overlap=16),
        "ngram_stats": T.ngram_stats_sql("documents", k=50),
        "events_sessionize": """
            WITH gaps AS (
                SELECT user_id, ts,
                       CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                                 > INTERVAL 30 MINUTE
                            OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                            THEN 1 ELSE 0 END AS new_session
                FROM events
            ),
            seq AS (
                SELECT user_id, ts,
                       SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                              ROWS UNBOUNDED PRECEDING) AS session_seq
                FROM gaps
            )
            SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
                   strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
                   strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
                   CAST(COUNT(*) AS BIGINT) AS n_events
            FROM seq
            GROUP BY user_id, session_seq
        """,
        # Streaming sessionizer: the stream emits (a) every session closed
        # by an in-batch gap = all but each user's last session, PLUS (b)
        # trailing sessions whose event-time timeout (session_end + gap)
        # fell strictly below the final watermark (max event ts - the 2h
        # watermark delay) — availableNow runs a last empty batch in which
        # those timeouts fire.  Only each user's last session that ended
        # within 2.5h of stream max stays open (unemitted).
        "events_sessionize_streaming": """
            WITH gaps AS (
                SELECT user_id, ts,
                       CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                                 > INTERVAL 30 MINUTE
                            OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                            THEN 1 ELSE 0 END AS new_session
                FROM events
            ),
            seq AS (
                SELECT user_id, ts,
                       SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                              ROWS UNBOUNDED PRECEDING) AS session_seq
                FROM gaps
            ),
            sessions AS (
                SELECT user_id, session_seq, MIN(ts) AS session_start,
                       MAX(ts) AS session_end,
                       CAST(COUNT(*) AS BIGINT) AS n_events,
                       (SELECT MAX(ts) FROM events) AS max_ts
                FROM seq
                GROUP BY user_id, session_seq
            )
            SELECT user_id,
                   strftime(session_start, '%Y-%m-%d %H:%M:%S') AS session_start,
                   strftime(session_end, '%Y-%m-%d %H:%M:%S') AS session_end,
                   n_events
            FROM sessions
            QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id
                                       ORDER BY session_seq DESC) > 1
                 OR session_end + INTERVAL 30 MINUTE < max_ts - INTERVAL 2 HOUR
        """,
        # graph_extract: closed-form census of the BFS forest.  Per customer
        # tree (root customer c -> nation -> region, CITIZEN_OF reified):
        # groups Customer×2 CITIZEN_OF×3 Nation×3 Region×2, three RELs,
        # ENT name×7 detail×2 balance×3.  Nations/regions never referenced
        # root their own smaller trees.
        "graph_extract": """
            WITH
            c AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                         CAST(COUNT(c_mktsegment) AS BIGINT) AS d
                  FROM customer WHERE c_acctbal IS NOT NULL),
            un AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nation nn
                   WHERE NOT EXISTS (SELECT 1 FROM customer cc
                                     WHERE cc.c_nationkey = nn.n_nationkey
                                       AND cc.c_acctbal IS NOT NULL)),
            ur AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM region rr
                   WHERE NOT EXISTS (SELECT 1 FROM nation nn
                                     WHERE nn.n_regionkey = rr.r_regionkey))
            SELECT kind, name, cnt FROM (
                SELECT 'ROOT' AS kind, 'ROOT' AS name, c.n + un.n + ur.n AS cnt FROM c, un, ur
                UNION ALL SELECT 'GROUP', 'Customer',   2 * n FROM c
                UNION ALL SELECT 'GROUP', 'CITIZEN_OF', 3 * n FROM c
                UNION ALL SELECT 'GROUP', 'Nation',     3 * c.n + 2 * un.n FROM c, un
                UNION ALL SELECT 'GROUP', 'Region',     2 * c.n + 2 * un.n + ur.n FROM c, un, ur
                UNION ALL SELECT 'REL', 'Customer<->CITIZEN_OF', n FROM c
                UNION ALL SELECT 'REL', 'CITIZEN_OF<->Nation',   n FROM c
                UNION ALL SELECT 'REL', 'Nation<->Region', c.n + un.n FROM c, un
                UNION ALL SELECT 'ENT', 'name',    7 * c.n + 4 * un.n + ur.n FROM c, un, ur
                UNION ALL SELECT 'ENT', 'detail',  2 * d FROM c
                UNION ALL SELECT 'ENT', 'balance', 3 * n FROM c
                UNION ALL SELECT 'LEAF', '',
                    10 * c.n + 2 * c.d + 4 * un.n + ur.n FROM c, un, ur
            ) WHERE cnt > 0
        """,
        # typed_export_orders: the inference must recover exactly these
        # column types from the stringified frame; the aggregates then run
        # on properly-typed values (sum on strings would fail / differ).
        "typed_export_orders": """
            SELECT
                'o_custkey:bigint,o_orderdate:timestamp,o_orderkey:bigint,'
                || 'o_orderpriority:string,o_orderstatus:string,o_totalprice:double'
                    AS schema_sig,
                CAST(SUM(o_orderkey) AS BIGINT) AS sum_key,
                CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_price,
                strftime(MIN(o_orderdate), '%Y-%m-%d %H:%M:%S') AS min_date,
                strftime(MAX(o_orderdate), '%Y-%m-%d %H:%M:%S') AS max_date,
                CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) AS n_status
            FROM orders
        """,
        "sampling_strata": (
            "SELECT 'down' AS variant, doc_id, lang, CAST(NULL AS INTEGER) AS copy_n FROM ("
            + sampling.stratified_sample_sql(
                "documents",
                "lang",
                {"en": 0.5, "es": 0.25, "de": 0.25},
                "doc_id",
                default_fraction=0.1,
                salt="r2",
            )
            + ") UNION ALL SELECT 'up' AS variant, doc_id, lang, CAST(copy_n AS INTEGER) AS copy_n FROM ("
            + sampling.upsample_stratified_sql(
                "documents", "lang", {"en": 2.5, "fr": 0.5}, "doc_id", salt="up"
            )
            + ")"
        ),
        "sampling_mixture": (
            "SELECT 'count' AS variant, doc_id, lang FROM ("
            + sampling.mixture_take_sql(
                "documents", "lang", {"en": 50, "fr": 20, "zh": 10}, "doc_id", salt="mix"
            )
            + ") UNION ALL SELECT 'tokens', doc_id, lang FROM ("
            + sampling.mixture_take_tokens_sql(
                "documents", "lang", {"en": 30000, "fr": 8000, "zh": 2500},
                "doc_id", "n_chars", salt="mix",
            )
            + ")"
        ),
        "sampling_temperature": (
            "SELECT doc_id, lang FROM ("
            + sampling.temperature_take_sql(
                "documents", "lang", _TEMP_STRATA, 120, "doc_id", alpha=0.5, salt="temp"
            )
            + ")"
        ),
        "sampling_weighted": (
            "SELECT doc_id, lang, n_chars FROM ("
            + sampling.weighted_sample_sql(
                "(SELECT doc_id, lang, n_chars FROM documents)",
                "n_chars",
                "doc_id",
                100,
                salt="wt",
            )
            + ")"
        ),
        "sampling_pack": (
            "SELECT doc_id, pack_bucket, pack_seq, pack_offset FROM ("
            + sampling.pack_sequences_sql(
                "documents", "doc_id", "n_chars", 4096, n_buckets=8, salt="pk"
            )
            + ")"
        ),
    }
