"""As-of (time-travel) join — an extension operator the reference lacks.

For each left row, attach the single right row with the greatest
``right_ts <= left_ts`` within the same key (the point-in-time lookup of
feature stores, trade/quote matching, and event attribution).

Spark-first design: NOT a per-key ``merge_asof`` UDF.  The two sides are
unioned and sorted once per key partition (one shuffle on the key), and the
most recent right payload is carried forward with
``last_value(ignorenulls)`` over the running window — a native window
expression, whole-stage codegen'd, that scales to any number of rows per
key because nothing is ever materialized per group.  At 100 TB this is the
same plan a hand-tuned union-sort-carry SQL would produce.  A pathological
hot key is one window partition (AQE's skew splitting applies to joins,
not windows): it is bounded by the window's external sort — spills, never
OOMs — which is the price of exact per-key time ordering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, on: str | list,
              left_ts: str = "ts", right_ts: str = "ts",
              right_cols: list | None = None,
              tolerance=None, suffix: str = "_right",
              tiebreak: str | None = None) -> DataFrame:
    """Backward as-of join (pandas ``merge_asof`` semantics, inclusive):
    every left row keeps its columns plus each ``right_cols`` value from
    the latest right row at-or-before its timestamp (nulls when no such
    row).  ``tolerance`` (e.g. ``F.expr("INTERVAL 1 DAY")`` or a numeric
    delta) voids matches older than ``left_ts - tolerance``.

    Among right rows sharing (key, ts), the one greatest by ``tiebreak``
    (default: the first of ``right_cols``) wins — deterministic, unlike
    a last-arbitrary-row rule.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if right_cols is None:
        right_cols = [c for c in right.columns
                      if c not in keys and c != right_ts]
    tiebreak = tiebreak or right_cols[0]

    payload = F.struct(*[F.col(c) for c in right_cols])
    r = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("__ts"),
        F.col(tiebreak).alias("__tb"),
        payload.alias("__p"),
        F.lit(0).alias("__side"))
    l = left.select(
        *[F.col(k) for k in keys],
        F.col(left_ts).alias("__ts"),
        F.lit(None).cast(r.schema["__tb"].dataType).alias("__tb"),
        F.lit(None).cast(r.schema["__p"].dataType).alias("__p"),
        F.lit(1).alias("__side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__l"))
    r = r.withColumn("__l", F.lit(None).cast(l.schema["__l"].dataType))

    # sort (ts, side, tiebreak): right rows at ts==left_ts precede the left
    # row (inclusive match); among equal right ts the greatest tiebreak
    # sorts last and is what last_value picks up
    w = (Window.partitionBy(*keys)
         .orderBy(F.col("__ts").asc(), F.col("__side").asc(),
                  F.col("__tb").asc_nulls_first())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = (l.unionByName(r.select(*l.columns))
               .withColumn("__match", F.last("__p", ignorenulls=True).over(w))
               .withColumn("__mts", F.last(F.when(F.col("__side") == 0,
                                                  F.col("__ts")),
                                           ignorenulls=True).over(w))
               .where(F.col("__side") == 1))
    match = F.col("__match")
    if tolerance is not None:
        in_tol = F.col("__mts") >= (F.col("__ts") - tolerance)
        match = F.when(in_tol, match)
    out_cols = [F.col("__l").getField(c).alias(c) for c in left.columns]
    out_cols += [match.getField(c).alias(f"{c}{suffix}" if c in left.columns
                                         else c)
                 for c in right_cols]
    return carried.select(*out_cols)
