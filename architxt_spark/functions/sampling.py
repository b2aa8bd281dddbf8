"""Deterministic sampling / mixture operators for training-data curation.

Domain-mixture construction ("40% web, 30% code, ...") and stratified
downsampling are the first operations a 100-TB curation pipeline runs
after dedup.  Both are hash-based (md5 over the document id + salt) so:

- a document's keep/drop decision depends only on ``(id, salt)`` — never
  on partitioning, row order, or cluster size — making runs resumable and
  auditable, and letting the DuckDB oracle reproduce decisions exactly;
- re-sampling with a new salt draws an independent sample without
  reshuffling data.

Scale shapes:

- ``stratified_sample`` is a pure filter (no shuffle, pushdown-friendly —
  the predicate sits directly on the parquet scan).
- ``mixture_take`` needs exact per-stratum top-N by hash order.  A naive
  ``row_number() OVER (PARTITION BY stratum)`` sends EVERY row of a
  stratum to one task — a scale-killer when one stratum holds billions of
  rows.  Instead we pre-filter each stratum to ``~margin × target``
  survivors using the uniformity of the hash key (threshold =
  ``target / stratum_total × margin``), then window over the bounded
  survivor set.  The driver widens the threshold and retries in the
  (measure-zero at scale) case the margin under-shoots; the selected set
  is always the EXACT global top-N, matching the oracle's plain
  ``row_number``.

Each function has a Spark-Column form and a DuckDB-SQL form generated
from the same constants (md5 digit-position arithmetic mirrors
``dedup._shingle_ints_sql``).  No reference counterpart — this is one of
the beyond-reference pipeline operators.
"""

from __future__ import annotations

import logging
from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_LOG = logging.getLogger(__name__)

#: decision resolution — fractions are exact to 1e-6
HASH_MOD = 1_000_000


# ---------------------------------------------------------------------------
# Spark column forms
# ---------------------------------------------------------------------------


def sample_key(id_col: Column, salt: str = "") -> Column:
    """Uniform deterministic key in ``[0, HASH_MOD)`` from an id column.

    28-bit int from the first 7 hex digits of ``md5(id || salt)`` (same
    construction as the dedup shingle hash), reduced mod ``HASH_MOD``.
    """
    h = F.conv(
        F.substring(F.md5(F.concat(id_col.cast("string"), F.lit(salt))), 1, 7),
        16,
        10,
    ).cast("long")
    return h % HASH_MOD


def _threshold_expr(
    strata_col: Column,
    thresholds: Mapping[str, int],
    default_threshold: int,
) -> Column:
    expr = F.lit(default_threshold)
    for value, thr in sorted(thresholds.items()):
        expr = F.when(strata_col == value, F.lit(thr)).otherwise(expr)
    return expr


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: Mapping[str, float],
    id_col: str,
    *,
    default_fraction: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Keep each row with its stratum's probability, deterministically.

    Pure filter — no shuffle, no state; the sampling predicate is sargable
    and rides the parquet scan.  Unknown strata fall back to
    ``default_fraction``.
    """
    thresholds = {k: int(round(v * HASH_MOD)) for k, v in fractions.items()}
    thr = _threshold_expr(
        F.col(strata_col), thresholds, int(round(default_fraction * HASH_MOD))
    )
    return df.filter(sample_key(F.col(id_col), salt) < thr)


def mixture_take(
    df: DataFrame,
    strata_col: str,
    counts: Mapping[str, int],
    id_col: str,
    *,
    salt: str = "",
    margin: float = 1.5,
    max_rounds: int = 8,
) -> DataFrame:
    """EXACT per-stratum top-``counts[s]`` rows by hash order.

    Equivalent to ``row_number() OVER (PARTITION BY stratum ORDER BY
    key, id) <= counts[stratum]`` but scale-safe: a hash-threshold
    pre-filter bounds the windowed rows to ``~margin × target`` per
    stratum.  Strata not in ``counts`` are dropped.
    """
    strata = sorted(counts)
    key = sample_key(F.col(id_col), salt)
    pool = df.filter(F.col(strata_col).isin(strata)).withColumn("__key", key)

    # one small agg: stratum totals drive the pre-filter thresholds
    totals = {
        r[0]: r[1]
        for r in pool.groupBy(strata_col).agg(F.count("*").alias("n")).collect()
    }

    for attempt in range(max_rounds):
        thresholds = {}
        for s in strata:
            total = totals.get(s, 0)
            want = min(counts[s], total)
            if total == 0 or want >= total:
                thresholds[s] = HASH_MOD  # take everything there is
            else:
                thresholds[s] = min(
                    HASH_MOD, int(HASH_MOD * want / total * margin) + 1
                )
        thr = _threshold_expr(F.col(strata_col), thresholds, 0)
        survivors = pool.filter(F.col("__key") < thr)

        # exactness check: every stratum must have >= min(target, total)
        # survivors, else the uniformity margin under-shot — widen & retry
        got = {
            r[0]: r[1]
            for r in survivors.groupBy(strata_col)
            .agg(F.count("*").alias("n"))
            .collect()
        }
        if all(
            got.get(s, 0) >= min(counts[s], totals.get(s, 0)) for s in strata
        ):
            if attempt:
                # each widen-retry is a full pool re-scan — at 100 TB a
                # mis-set margin costs a corpus pass per retry, so make
                # the count visible to operators
                _LOG.warning(
                    "mixture_take: margin widened %d time(s) "
                    "(final margin %.2f) — each retry re-scans the pool; "
                    "raise the initial margin to avoid the extra passes",
                    attempt,
                    margin,
                )
            break
        margin *= 2.0
    else:  # pragma: no cover — uniform hash cannot miss 8 doublings
        survivors = pool

    from pyspark.sql import Window

    w = Window.partitionBy(strata_col).orderBy("__key", id_col)
    limit = _threshold_expr(F.col(strata_col), dict(counts), 0)
    return (
        survivors.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= limit)
        .drop("__key", "__rn")
    )


def mixture_take_tokens(
    df: DataFrame,
    strata_col: str,
    budgets: Mapping[str, int],
    id_col: str,
    token_col: str,
    *,
    salt: str = "",
    margin: float = 1.5,
    max_rounds: int = 8,
) -> DataFrame:
    """EXACT per-stratum take until a TOKEN budget — how pretraining
    mixes are actually specified ("500 B tokens of en, 80 B of fr"),
    where :func:`mixture_take` selects by document COUNT.

    A document is kept iff the running token sum over the stratum's
    hash-order prefix (inclusive of the document itself) is ≤ the
    stratum's budget — so the take never exceeds the budget and the
    boundary decision is an exact integer comparison.  Strata not in
    ``budgets`` are dropped.

    Scale shape, same as :func:`mixture_take`: a hash-threshold
    pre-filter bounds the windowed rows to ~``margin × budget`` worth
    of tokens per stratum before the cumulative-sum window runs, so the
    per-stratum sort never sees the whole corpus.  Because survivors of
    ``key < thr`` are a PREFIX of the hash order, the cumsum over
    survivors equals the cumsum over the full pool whenever the
    survivors' token total reaches the budget (checked; the margin
    doubles and retries otherwise — at most ``max_rounds`` small
    aggregate jobs, never a wide one).
    """
    strata = sorted(budgets)
    key = sample_key(F.col(id_col), salt)
    pool = df.filter(F.col(strata_col).isin(strata)).withColumn("__key", key)

    totals = {
        r[0]: r[1]
        for r in pool.groupBy(strata_col)
        .agg(F.sum(F.col(token_col).cast("long")).alias("t"))
        .collect()
    }

    for attempt in range(max_rounds):
        thresholds = {}
        for s in strata:
            total = int(totals.get(s) or 0)
            if total == 0 or budgets[s] >= total:
                thresholds[s] = HASH_MOD  # take everything there is
            else:
                thresholds[s] = min(
                    HASH_MOD, int(HASH_MOD * budgets[s] / total * margin) + 1
                )
        thr = _threshold_expr(F.col(strata_col), thresholds, 0)
        survivors = pool.filter(F.col("__key") < thr)

        got = {
            r[0]: int(r[1] or 0)
            for r in survivors.groupBy(strata_col)
            .agg(F.sum(F.col(token_col).cast("long")).alias("t"))
            .collect()
        }
        if all(
            got.get(s, 0) >= min(budgets[s], int(totals.get(s) or 0))
            for s in strata
        ):
            if attempt:
                _LOG.warning(
                    "mixture_take_tokens: margin widened %d time(s) "
                    "(final margin %.2f) — each retry re-scans the pool; "
                    "raise the initial margin to avoid the extra passes",
                    attempt,
                    margin,
                )
            break
        margin *= 2.0
    else:  # pragma: no cover — uniform hash cannot miss 8 doublings
        survivors = pool

    from pyspark.sql import Window

    w = (
        Window.partitionBy(strata_col)
        .orderBy("__key", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    budget = _threshold_expr(F.col(strata_col), dict(budgets), 0)
    return (
        survivors.withColumn(
            "__cum", F.sum(F.col(token_col).cast("long")).over(w)
        )
        .filter(F.col("__cum") <= budget)
        .drop("__key", "__cum")
    )


def mixture_token_thresholds(
    df: DataFrame,
    strata_col: str,
    budgets: Mapping[str, int],
    token_col: str,
    *,
    window_tokens: int | None = None,
) -> dict[str, int]:
    """Fixed per-stratum hash-key thresholds for the STREAMING form of
    :func:`mixture_take_tokens`: derive, from a reference corpus (a
    historical crawl slice), the ``sample_key < threshold`` gate that
    keeps an expected ``budgets[s]`` tokens per stratum out of every
    ``window_tokens``-token window of arriving data (default: the
    reference corpus's own per-stratum token total).

    The exact-budget take is inherently batch-only — it needs the
    global hash-order cumulative sum over the full pool, which a
    micro-batch never sees.  The streaming contract is the natural
    per-batch one: thresholds are FIXED up front, every micro-batch
    applies the same deterministic per-document gate (a document's
    keep/drop decision never depends on arrival order or batch
    boundaries), and each stratum's kept token RATE converges to
    ``budget / window`` by the uniformity of :func:`sample_key`.
    Strata not in ``budgets`` get threshold 0 (dropped), matching the
    batch take.  One bounded aggregate job on the reference corpus;
    the result dict is broadcast state, no per-batch derivation."""
    totals = {
        r[0]: int(r[1] or 0)
        for r in df.filter(F.col(strata_col).isin(sorted(budgets)))
        .groupBy(strata_col)
        .agg(F.sum(F.col(token_col).cast("long")).alias("t"))
        .collect()
    }
    out: dict[str, int] = {}
    for s in sorted(budgets):
        window = window_tokens if window_tokens is not None else totals.get(s, 0)
        if window <= 0 or budgets[s] >= window:
            out[s] = HASH_MOD
        else:
            out[s] = min(HASH_MOD, int(HASH_MOD * budgets[s] / window) + 1)
    return out


def mixture_take_tokens_sql(
    table: str,
    strata_col: str,
    budgets: Mapping[str, int],
    id_col: str,
    token_col: str,
    *,
    salt: str = "",
) -> str:
    """Plain windowed running-sum — the oracle shape
    :func:`mixture_take_tokens` must match exactly (the threshold
    pre-filter is a pure optimization)."""
    in_list = ", ".join(f"'{s}'" for s in sorted(budgets))
    case = _threshold_case_sql(strata_col, dict(budgets), 0)
    key = sample_key_sql(id_col, salt)
    return f"""
        SELECT * EXCLUDE (__key, __cum) FROM (
            SELECT *, {key} AS __key,
                   SUM(CAST({token_col} AS BIGINT)) OVER (
                       PARTITION BY {strata_col}
                       ORDER BY {key}, {id_col}
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS __cum
            FROM {table}
            WHERE {strata_col} IN ({in_list})
        )
        WHERE __cum <= {case}
    """


def proportional_counts(
    df: DataFrame,
    strata_col: str,
    weights: Mapping[str, float],
    total: int,
) -> dict[str, int]:
    """Turn mixture weights into per-stratum take counts, capped at each
    stratum's actual size (largest-remainder rounding).  One tiny agg —
    the result dict is the plan ``mixture_take`` executes."""
    sizes = {
        r[0]: r[1]
        for r in df.filter(F.col(strata_col).isin(sorted(weights)))
        .groupBy(strata_col)
        .agg(F.count("*").alias("n"))
        .collect()
    }
    wsum = sum(weights.values()) or 1.0
    raw = {s: total * w / wsum for s, w in weights.items()}
    counts = {s: min(int(raw[s]), sizes.get(s, 0)) for s in weights}
    remainders = sorted(
        ((raw[s] - int(raw[s]), s) for s in weights), reverse=True
    )
    short = total - sum(counts.values())
    for _, s in remainders:
        if short <= 0:
            break
        if counts[s] < sizes.get(s, 0):
            counts[s] += 1
            short -= 1
    return counts


#: fixed-point scale for temperature weights — ``floor(n^alpha * 1e6)``
#: turns the (libm-identical on both engines) ``pow`` into an integer, so
#: the whole largest-remainder allocation below is EXACT integer
#: arithmetic: no float summation order, no rounding-mode ambiguity,
#: bit-identical between the Python driver and the DuckDB oracle.
TEMP_WEIGHT_SCALE = 1_000_000


def temperature_counts(
    df: DataFrame,
    strata_col: str,
    strata: list[str],
    total: int,
    *,
    alpha: float = 0.5,
) -> dict[str, int]:
    """Per-stratum take counts for TEMPERATURE-scaled mixing: probability
    ∝ ``size^alpha`` (the standard multilingual/domain rebalancing —
    ``alpha=1`` is proportional, ``alpha=0`` uniform, ``alpha≈0.3–0.7``
    upweights small domains).

    One tiny aggregate (stratum sizes, vocab-bounded collect), then the
    EXACT cap-aware allocation by water-filling: sorted by ``size/weight``
    (the ratio at which a stratum saturates), the saturated strata form a
    prefix — each takes its full size; the rest split the remaining budget
    by largest remainder over fixed-point integer weights
    ``floor(size^alpha * 1e6)``.  All arithmetic past the ``pow`` is
    integer, so the DuckDB form (:func:`temperature_take_sql`) reproduces
    the allocation bit-for-bit.  Feed the result to :func:`mixture_take`.
    """
    import math

    sizes = {
        r[0]: r[1]
        for r in df.filter(F.col(strata_col).isin(sorted(strata)))
        .groupBy(strata_col)
        .agg(F.count("*").alias("n"))
        .collect()
    }
    counts = {s: 0 for s in strata}
    live = [s for s in strata if sizes.get(s, 0) > 0]
    wt = {s: math.floor(math.pow(sizes[s], alpha) * TEMP_WEIGHT_SCALE) for s in live}

    # water-filling: in size/weight order, a stratum saturates while its
    # cap is at or below its fair share of what remains (prefix property)
    order = sorted(live, key=lambda s: (sizes[s] / wt[s], s))
    budget, wsum = total, sum(wt.values())
    tail: list[str] = []
    for i, s in enumerate(order):
        if not tail and wsum > 0 and sizes[s] * wsum <= budget * wt[s]:
            counts[s] = sizes[s]
            budget -= sizes[s]
            wsum -= wt[s]
        else:
            tail.append(s)

    if tail and wsum > 0 and budget > 0:
        base = {s: budget * wt[s] // wsum for s in tail}
        rem = {s: budget * wt[s] % wsum for s in tail}
        short = budget - sum(base.values())
        # largest remainder first, stratum name desc on ties — matches the
        # SQL rank ORDER BY rem DESC, stratum DESC.  A non-saturated
        # stratum always has size >= base + 1, so no re-capping is needed.
        for _, s in sorted(((rem[s], s) for s in tail), reverse=True):
            if short <= 0:
                break
            base[s] += 1
            short -= 1
        counts.update(base)
    return counts


def temperature_take_sql(
    table: str,
    strata_col: str,
    strata: list[str],
    total: int,
    id_col: str,
    *,
    alpha: float = 0.5,
    salt: str = "",
) -> str:
    """DuckDB form: recomputes the water-filling allocation IN SQL (same
    integer arithmetic as :func:`temperature_counts` — saturation prefix
    via windowed cumulative sums, largest remainder on the tail) and takes
    the plain windowed per-stratum top-N — verifying both the weighting
    math and the selection."""
    in_list = ", ".join(f"'{s}'" for s in sorted(strata))
    key = sample_key_sql(id_col, salt)
    ratio_order = "ORDER BY __n * 1.0 / __w, __s"
    return f"""
        WITH __sizes AS (
            SELECT {strata_col} AS __s, count(*) AS __n
            FROM {table} WHERE {strata_col} IN ({in_list})
            GROUP BY 1
        ), __wt AS (
            SELECT __s, __n,
                   CAST(floor(pow(__n, {alpha}) * {TEMP_WEIGHT_SCALE}) AS BIGINT) AS __w
            FROM __sizes
        ), __ord AS (
            SELECT __s, __n, __w,
                   row_number() OVER ({ratio_order}) AS __pos,
                   COALESCE(sum(__n) OVER ({ratio_order}
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS __cn,
                   COALESCE(sum(__w) OVER ({ratio_order}
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS __cw,
                   (SELECT sum(__w) FROM __wt) AS __wsum
            FROM __wt
        ), __flag AS (
            SELECT *, (__n * (__wsum - __cw) <= ({total} - __cn) * __w) AS __sat
            FROM __ord
        ), __b AS (
            SELECT COALESCE(min(CASE WHEN NOT __sat THEN __pos END),
                            COALESCE(max(__pos), 0) + 1) AS __bpos
            FROM __flag
        ), __satset AS (
            SELECT __s, __n AS __take FROM __flag, __b WHERE __pos < __bpos
        ), __params AS (
            SELECT {total} - COALESCE((SELECT sum(__take) FROM __satset), 0) AS __r,
                   (SELECT COALESCE(sum(__w), 0) FROM __wt)
                   - COALESCE((SELECT sum(f.__w) FROM __flag f, __b
                               WHERE f.__pos < __bpos), 0) AS __wrem
        ), __tailbase AS (
            SELECT f.__s, p.__r * f.__w // p.__wrem AS __base,
                   p.__r * f.__w % p.__wrem AS __rem
            FROM __flag f, __b, __params p
            WHERE f.__pos >= __bpos AND p.__wrem > 0 AND p.__r > 0
        ), __deficit AS (
            SELECT (SELECT __r FROM __params) - COALESCE(sum(__base), 0) AS __d
            FROM __tailbase
        ), __tailtake AS (
            SELECT __s, __base + CASE WHEN
                       row_number() OVER (ORDER BY __rem DESC, __s DESC)
                       <= (SELECT __d FROM __deficit)
                   THEN 1 ELSE 0 END AS __take
            FROM __tailbase
        ), __take AS (
            SELECT * FROM __satset UNION ALL SELECT * FROM __tailtake
        )
        SELECT * EXCLUDE (__key, __rn, __s, __take) FROM (
            SELECT t.*, {key} AS __key,
                   ROW_NUMBER() OVER (
                       PARTITION BY {strata_col}
                       ORDER BY {key}, {id_col}
                   ) AS __rn,
                   tk.__s, tk.__take
            FROM {table} t JOIN __take tk ON t.{strata_col} = tk.__s
        )
        WHERE __rn <= __take
    """


def pack_sequences(
    df: DataFrame,
    id_col: str,
    token_col: str,
    budget: int,
    *,
    n_buckets: int = 64,
    salt: str = "",
) -> DataFrame:
    """Concat-and-chunk sequence packing: assign each document the id of
    the fixed-``budget`` training sequence its first token lands in.

    Documents are laid out deterministically — hash bucket, then hash
    order within the bucket — and chunked at ``budget`` boundaries, the
    standard concat-then-chunk pretraining layout.  Appends:

    - ``pack_bucket``  — which independent packing stream the doc is in
    - ``pack_seq``     — sequence index within the bucket
      (``floor(preceding-token-sum / budget)``)
    - ``pack_offset``  — the doc's first-token offset inside the stream

    Scale shape: the cumulative sum windows over ``pack_bucket``, never
    globally — one task per bucket, each bounded to ``~N/n_buckets``
    rows; raise ``n_buckets`` with cluster size.  Downstream chunkers
    read one bucket per task and slice locally.
    """
    key = sample_key(F.col(id_col), salt)
    bucket = key % n_buckets

    from pyspark.sql import Window

    w = (
        Window.partitionBy("pack_bucket")
        .orderBy("__key", id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        df.withColumn("__key", key)
        .withColumn("pack_bucket", bucket)
        .withColumn(
            "pack_offset",
            F.coalesce(F.sum(token_col).over(w), F.lit(0)).cast("long"),
        )
        .withColumn(
            "pack_seq", (F.col("pack_offset") / F.lit(budget)).cast("long")
        )
        .drop("__key")
    )


def upsample_stratified(
    df: DataFrame,
    strata_col: str,
    factors: Mapping[str, float],
    id_col: str,
    *,
    salt: str = "",
) -> DataFrame:
    """Repeat each row of stratum ``s`` ``factors[s]`` times in
    expectation, deterministically — the mixture-weights-above-1 case
    ("2.5 epochs of code").

    Integer part: every row repeats ``floor(f)`` times.  Fractional
    part: one extra copy iff the row's hash key < ``frac(f)`` — the same
    per-(id, salt) decision rule as :func:`stratified_sample`, so an
    up-then-down-sampled corpus is reproducible end to end.  Appends
    ``copy_n`` (0-based copy index) so downstream packing/shuffling can
    distinguish repeats.  Strata not in ``factors`` pass through once.

    Scale shape: a narrow ``explode(sequence(...))`` — no shuffle, no
    window; output size is exactly the expected token multiple.
    """
    n_copies = F.lit(1)
    for value, f in sorted(factors.items()):
        whole = int(f)
        frac_thr = int(round((f - whole) * HASH_MOD))
        extra = (
            (sample_key(F.col(id_col), salt) < frac_thr).cast("int")
            if frac_thr
            else F.lit(0)
        )
        n_copies = F.when(
            F.col(strata_col) == value, F.lit(whole) + extra
        ).otherwise(n_copies)
    return (
        df.withColumn("__n", n_copies)
        .filter(F.col("__n") > 0)
        .withColumn(
            "copy_n", F.explode(F.sequence(F.lit(0), F.col("__n") - 1))
        )
        .drop("__n")
    )


def hash_split(
    df: DataFrame,
    id_col: str,
    splits: Mapping[str, float],
    *,
    salt: str = "",
    out_col: str = "split",
) -> DataFrame:
    """Leakage-safe deterministic train/valid/test assignment: each row
    gets the split whose cumulative-fraction interval contains its
    :func:`sample_key` — a pure map-side column, no shuffle, stable
    under re-runs, retries, and corpus growth (a document's split never
    changes when OTHER documents are added, the property random-split
    lacks).  Key by the deduplication identity (canonical URL, content
    fingerprint) rather than a row id when near-duplicates must not
    straddle the eval boundary.  Fractions are exact to 1/``HASH_MOD``
    and must sum to ≤ 1; any remainder falls in the LAST split of the
    (insertion-ordered) mapping."""
    total = sum(splits.values())
    if not 0 < total <= 1 + 1e-9:
        raise ValueError(f"split fractions must sum to (0, 1], got {total}")
    key = sample_key(F.col(id_col), salt)
    names = list(splits)
    bounds = []
    cum = 0
    for name in names:
        cum += int(round(splits[name] * HASH_MOD))
        bounds.append((name, cum))
    # ordered CASE: key < b1 -> s1 ELIF key < b2 -> s2 ... ELSE last
    expr = F.lit(names[-1])
    for name, bound in reversed(bounds[:-1]):
        expr = F.when(key < bound, F.lit(name)).otherwise(expr)
    return df.withColumn(out_col, expr)


# ---------------------------------------------------------------------------
# DuckDB SQL forms
# ---------------------------------------------------------------------------


def sample_key_sql(id_col: str, salt: str = "") -> str:
    """DuckDB twin of :func:`sample_key` — md5 digit-position arithmetic
    (DuckDB has no ``conv()``), equal to Spark's ``conv(substr(md5,1,7))``."""
    h = f"md5(CAST({id_col} AS VARCHAR) || '{salt}')"
    digit = f"(strpos('0123456789abcdef', substr({h}, {{d}}, 1)) - 1)"
    num = " + ".join(f"{digit.format(d=d + 1)} * {16 ** (6 - d)}" for d in range(7))
    return f"(CAST({num} AS BIGINT) % {HASH_MOD})"


def hash_split_sql(id_col: str, splits: Mapping[str, float], salt: str = "") -> str:
    """DuckDB twin of :func:`hash_split` (same cumulative boundaries over
    :func:`sample_key_sql`)."""
    key = sample_key_sql(id_col, salt)
    bounds = []
    cum = 0
    for name in splits:
        cum += int(round(splits[name] * HASH_MOD))
        bounds.append((name, cum))
    whens = " ".join(
        f"WHEN {key} < {bound} THEN '{name}'" for name, bound in bounds[:-1]
    )
    return f"(CASE {whens} ELSE '{bounds[-1][0]}' END)" if whens else f"'{bounds[-1][0]}'"


def _threshold_case_sql(
    strata_col: str, thresholds: Mapping[str, int], default_threshold: int
) -> str:
    whens = " ".join(
        f"WHEN '{v}' THEN {t}" for v, t in sorted(thresholds.items())
    )
    return f"CASE {strata_col} {whens} ELSE {default_threshold} END"


def stratified_sample_sql(
    table: str,
    strata_col: str,
    fractions: Mapping[str, float],
    id_col: str,
    *,
    default_fraction: float = 0.0,
    salt: str = "",
) -> str:
    thresholds = {k: int(round(v * HASH_MOD)) for k, v in fractions.items()}
    case = _threshold_case_sql(
        strata_col, thresholds, int(round(default_fraction * HASH_MOD))
    )
    return (
        f"SELECT * FROM {table} "
        f"WHERE {sample_key_sql(id_col, salt)} < {case}"
    )


def pack_sequences_sql(
    table: str,
    id_col: str,
    token_col: str,
    budget: int,
    *,
    n_buckets: int = 64,
    salt: str = "",
) -> str:
    """DuckDB twin of :func:`pack_sequences` (plain windowed cumsum)."""
    key = sample_key_sql(id_col, salt)
    return f"""
        SELECT * EXCLUDE (__key),
               CAST(FLOOR(pack_offset / {budget}) AS BIGINT) AS pack_seq
        FROM (
            SELECT *, {key} AS __key,
                   (__key % {n_buckets}) AS pack_bucket,
                   CAST(COALESCE(SUM({token_col}) OVER (
                       PARTITION BY (__key % {n_buckets})
                       ORDER BY __key, {id_col}
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) AS BIGINT) AS pack_offset
            FROM {table}
        )
    """


def upsample_stratified_sql(
    table: str,
    strata_col: str,
    factors: Mapping[str, float],
    id_col: str,
    *,
    salt: str = "",
) -> str:
    """DuckDB twin of :func:`upsample_stratified` — a static numbers
    table joined on ``copy_n < n`` stands in for Spark's
    ``explode(sequence(...))`` (DuckDB's ``generate_series`` cannot take
    lateral column arguments)."""
    key = sample_key_sql(id_col, salt)
    n = "1"
    max_n = 1
    for value, f in sorted(factors.items()):
        whole = int(f)
        frac_thr = int(round((f - whole) * HASH_MOD))
        extra = f" + CASE WHEN {key} < {frac_thr} THEN 1 ELSE 0 END" if frac_thr else ""
        n = f"CASE WHEN {strata_col} = '{value}' THEN {whole}{extra} ELSE {n} END"
        max_n = max(max_n, whole + (1 if frac_thr else 0))
    return f"""
        SELECT t.* EXCLUDE (__n), g.copy_n
        FROM (SELECT *, ({n}) AS __n FROM {table}) t
        JOIN (SELECT CAST(range AS INT) AS copy_n FROM range(0, {max_n})) g
          ON g.copy_n < t.__n
    """


def mixture_take_sql(
    table: str,
    strata_col: str,
    counts: Mapping[str, int],
    id_col: str,
    *,
    salt: str = "",
) -> str:
    """Plain windowed top-N — the oracle shape ``mixture_take`` must match
    exactly (the threshold pre-filter is a pure optimization)."""
    in_list = ", ".join(f"'{s}'" for s in sorted(counts))
    case = _threshold_case_sql(strata_col, dict(counts), 0)
    key = sample_key_sql(id_col, salt)
    return f"""
        SELECT * EXCLUDE (__key, __rn) FROM (
            SELECT *, {key} AS __key,
                   ROW_NUMBER() OVER (
                       PARTITION BY {strata_col}
                       ORDER BY {key}, {id_col}
                   ) AS __rn
            FROM {table}
            WHERE {strata_col} IN ({in_list})
        )
        WHERE __rn <= {case}
    """


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    id_col: str,
    target: int,
    *,
    salt: str = "",
) -> DataFrame:
    """Weight-proportional sampling without replacement: row ``i`` is kept
    with probability ``min(1, target * w_i / W)`` where ``W = sum(w)`` —
    e.g. length-proportional document sampling against a token budget
    (expected kept-token count ≈ ``target/W`` of the corpus, long docs
    proportionally more likely).

    Same determinism contract as the other samplers (keep/drop depends
    only on ``(id, salt)``), plus an EXACT decision rule: keep iff
    ``key(id) * W < HASH_MOD * target * w_i`` evaluated in DECIMAL(38,0)
    integer arithmetic — no float ratio, so the DuckDB oracle reproduces
    every decision bit-for-bit even when ``W`` is a 100-TB-scale sum.

    Scale shape: ``W`` is one aggregate row broadcast back; the decision
    is a pure per-row filter on the scan — no shuffle of data rows.
    """
    d38 = "decimal(38,0)"
    totals = df.agg(F.sum(F.col(weight_col)).cast(d38).alias("__w_total"))
    key = sample_key(F.col(id_col), salt).cast(d38)
    rhs = (
        F.lit(HASH_MOD).cast(d38)
        * F.lit(target).cast(d38)
        * F.col(weight_col).cast(d38)
    )
    return (
        df.crossJoin(F.broadcast(totals))
        .filter(key * F.col("__w_total") < rhs)
        .drop("__w_total")
    )


def weighted_sample_sql(
    table: str,
    weight_col: str,
    id_col: str,
    target: int,
    *,
    salt: str = "",
) -> str:
    """DuckDB twin of :func:`weighted_sample` — HUGEINT arithmetic holds
    the same exact products."""
    key = sample_key_sql(id_col, salt)
    return f"""
        SELECT * EXCLUDE (__w_total) FROM {table}, (
            SELECT CAST(sum({weight_col}) AS HUGEINT) AS __w_total FROM {table}
        )
        WHERE CAST({key} AS HUGEINT) * __w_total
              < CAST({HASH_MOD} AS HUGEINT) * {target} * CAST({weight_col} AS HUGEINT)
    """
