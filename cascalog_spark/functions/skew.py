"""Skewed-key join handling.

First line of defense at scale is AQE's runtime skew-join splitting
(``spark.sql.adaptive.skewJoin.enabled``, on by default in our bench/test
configs) — it needs no code.  ``salted_join`` is the explicit fallback for
the cases AQE can't fix: a broadcast-ineligible dimension joined on a key
where a handful of values dominate (the classic null/`unknown`/celebrity
hot keys), or engines/versions where AQE is off.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(skewed: DataFrame, other: DataFrame, on: list[str],
                how: str = "inner", n_salt: int = 16,
                seed: int = 42) -> DataFrame:
    """Equi-join where ``skewed``'s join keys are heavily skewed.

    The skewed side gets a uniform random salt in [0, n_salt); the other
    side is replicated n_salt times (explode of a literal array — stays
    JVM-side, no shuffle of its own).  Joining on keys+salt splits each hot
    key's row group across n_salt reducers.  Result is identical to the
    unsalted join for 'inner' and 'left' (each skewed row pairs with every
    match exactly once, via its single salt value).

    Cost model: replicates ``other`` n_salt× — use when other is much
    smaller than the skewed side but too big (or too mid-plan) to
    broadcast.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports how='inner'|'left' "
                         "(right/full would need salting the other side)")
    salt_vals = F.array(*[F.lit(i) for i in range(n_salt)])
    skewed_s = skewed.withColumn(
        "__salt", (F.rand(seed) * n_salt).cast("int"))
    other_s = other.withColumn("__salt", F.explode(salt_vals))
    return skewed_s.join(other_s, on + ["__salt"], how).drop("__salt")


def skew_report(df: DataFrame, *key_cols: str, top: int = 10) -> dict:
    """Join/agg-key skew diagnostics BEFORE you pay for the shuffle:
    per-key row counts summarized to a driver-side dict —

    ``{rows, keys, p50, p90, p99, max, top: [(key..., count, share)],
       suggested_salt}``

    ``suggested_salt`` = ceil(max/p50) capped at 64 — the replication
    factor that would level the hottest key to a median-sized reducer
    (feed it to ``salted_join(n_salt=...)``), or 1 when the key is
    balanced.  Cost: one groupBy(keys).count() (the same shuffle a join
    on those keys would pay, but counting only) + two tiny jobs over the
    per-key counts; the counts table is persisted for the span of the
    call and everything returned is O(top)."""
    import math

    from pyspark import StorageLevel

    counts = (df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("__n"))
              .persist(StorageLevel.MEMORY_AND_DISK))
    try:
        stats = counts.agg(
            F.count(F.lit(1)).alias("keys"),
            F.sum("__n").alias("rows"),
            F.expr("percentile(__n, 0.5)").alias("p50"),
            F.expr("percentile(__n, 0.9)").alias("p90"),
            F.expr("percentile(__n, 0.99)").alias("p99"),
            F.max("__n").alias("max")).first()
        heavy = counts.orderBy(F.col("__n").desc(), *key_cols) \
            .limit(top).collect()
    finally:
        counts.unpersist()
    rows = stats["rows"] or 0
    p50 = stats["p50"] or 1.0
    salt = 1 if not stats["max"] else min(
        64, max(1, math.ceil(stats["max"] / max(p50, 1.0))))
    return {
        "rows": rows,
        "keys": stats["keys"],
        "p50": stats["p50"], "p90": stats["p90"], "p99": stats["p99"],
        "max": stats["max"],
        "top": [(tuple(r[k] for k in key_cols), r["__n"],
                 round(r["__n"] / rows, 6) if rows else 0.0)
                for r in heavy],
        "suggested_salt": salt,
    }
