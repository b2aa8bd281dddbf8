"""Skew-handling join utilities.

AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`, on in
:mod:`architxt_spark.session`) handles most skew at runtime; explicit
SALTING is for the case AQE can't fix — a shuffled join where one key's
rows must still meet matching rows, and the hot key's build side is small
enough to replicate.  The pattern: explode the (small) right side
``n_salts``×, salt the left side's key randomly-but-deterministically,
join on (key, salt) — the hot key's rows spread over ``n_salts``
partitions instead of one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    *,
    n_salts: int = 16,
    how: str = "inner",
    salt_by: str | None = None,
) -> DataFrame:
    """Equi-join on ``on`` with the LEFT side's hot keys spread over
    ``n_salts`` sub-partitions and the RIGHT side replicated to meet them.

    The salt is a deterministic hash of ``salt_by`` (default: the whole
    left row via monotonically increasing id is NOT used — determinism
    matters for retries; pass a stable unique column when available,
    else the key itself degrades to unsalted).  Right-side replication
    multiplies its shuffle volume by ``n_salts`` — use for small-but-not-
    broadcastable right sides with skewed left keys."""
    salt_src = F.col(salt_by) if salt_by else F.spark_partition_id()
    l = left.withColumn("_salt", F.pmod(F.xxhash64(salt_src.cast("string")), F.lit(n_salts)))
    r = right.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = l.join(r, [on, "_salt"], how)
    return out.drop("_salt")
