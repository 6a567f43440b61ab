"""Distribution statistics over columns — corpus/data profiling ops.

Scale shape: fixed-width histograms are ONE aggregate keyed by the bucket
id (map-side partials collapse each partition to ≤ bins rows before the
shuffle); the optional min/max probe is a single cheap global aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def histogram(df: DataFrame, col: str, bins: int = 20,
              lo: float | None = None, hi: float | None = None,
              ) -> DataFrame:
    """Fixed-width histogram of a numeric column →
    ``(bucket, lo_edge, hi_edge, n)``; buckets 0..bins-1, the top edge
    inclusive (max lands in the last bucket, width_bucket convention
    clamped).  ``lo``/``hi`` default to the observed min/max (one extra
    scalar aggregate — pass them explicitly on repeated profiling of the
    same table).  Null values are ignored; empty input → 0 rows.
    """
    if bins <= 0:
        raise ValueError("histogram: bins must be > 0")
    if lo is None or hi is None:
        row = df.agg(F.min(F.col(col)).alias("lo"),
                     F.max(F.col(col)).alias("hi")).first()
        if row["lo"] is None:
            return df.sparkSession.createDataFrame(
                [], "bucket int, lo_edge double, hi_edge double, n long")
        lo = float(row["lo"]) if lo is None else lo
        hi = float(row["hi"]) if hi is None else hi
    if hi <= lo:
        hi = lo + 1.0  # degenerate range: single bucket holds everything
    width = (hi - lo) / bins
    c = F.col(col).cast("double")
    bucket = F.least(F.lit(bins - 1), F.greatest(F.lit(0), F.floor(
        (c - F.lit(lo)) / F.lit(width)).cast("int")))
    return (df.where(c.isNotNull())
            .groupBy(bucket.alias("bucket"))
            .agg(F.count(F.lit(1)).alias("n"))
            .withColumn("lo_edge",
                        F.round(F.lit(lo) + F.col("bucket") * F.lit(width),
                                6))
            .withColumn("hi_edge",
                        F.round(F.lit(lo)
                                + (F.col("bucket") + 1) * F.lit(width), 6))
            .select("bucket", "lo_edge", "hi_edge", "n"))
