"""Type-2 slowly-changing-dimension (SCD2) history builder/merger — the
warehouse pattern for tracking attribute changes over time: each key holds
a chain of versions ``[eff_start, eff_end)``, the open version has
``eff_end = NULL``.

Scale shape: everything is one shuffle keyed by the dimension key plus
per-key window functions (lag/lead version chains are per-key,
partition-parallel; no global sort).  The merge touches only keys PRESENT IN THE
UPDATE BATCH — the untouched dimension majority passes through an
anti-join-free union (closed history never rewrites).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_history(updates: DataFrame, key_cols: list[str],
                 tracked_cols: list[str], ts_col: str = "ts",
                 eff_col: str = "eff_start",
                 end_col: str = "eff_end") -> DataFrame:
    """Collapse an update stream into SCD2 version chains: per key, order
    by ``ts_col``, drop consecutive updates whose tracked values did not
    change, then ``eff_start = ts`` and ``eff_end = next version's ts``
    (NULL for the open version).  Ties on ts keep the last row by tracked
    value order (deterministic)."""
    keys = list(key_cols)
    w = Window.partitionBy(*keys).orderBy(
        F.col(ts_col).asc(), *[F.col(c).asc() for c in tracked_cols])
    val = F.struct(*[F.col(c) for c in tracked_cols])
    changed = (F.lag(val).over(w).isNull()
               | (F.lag(val).over(w) != val))
    surv = (updates
            .select(*keys, *tracked_cols, F.col(ts_col))
            .withColumn("__chg", changed)
            .where(F.col("__chg")).drop("__chg"))
    w2 = Window.partitionBy(*keys).orderBy(
        F.col(ts_col).asc(), *[F.col(c).asc() for c in tracked_cols])
    return (surv
            .withColumn(eff_col, F.col(ts_col))
            .withColumn(end_col, F.lead(ts_col).over(w2))
            .drop(ts_col))


def scd2_merge(current: DataFrame | None, updates: DataFrame,
               key_cols: list[str], tracked_cols: list[str],
               ts_col: str = "ts", eff_col: str = "eff_start",
               end_col: str = "eff_end") -> DataFrame:
    """Merge an update batch into an SCD2 dimension.

    ``current`` rows (same schema: keys + tracked + eff_start/eff_end)
    with ``eff_end`` NULL are the open versions; for keys appearing in
    ``updates`` the open version is CLOSED at the first effective change
    ts and the new version chain appended.  A leading update identical to
    the key's open version is a no-op (no spurious version).  Keys absent
    from the batch pass through untouched; with ``current=None`` this is
    a pure history build.
    """
    keys = list(key_cols)
    hist = scd2_history(updates, keys, tracked_cols, ts_col,
                        eff_col, end_col)
    if current is None:
        return hist
    cols = [*keys, *tracked_cols, eff_col, end_col]
    open_rows = current.where(F.col(end_col).isNull()).select(*cols)
    closed_rows = current.where(F.col(end_col).isNotNull()).select(*cols)

    # drop each key's leading new version if it matches the open version
    first_w = Window.partitionBy(*keys).orderBy(F.col(eff_col).asc())
    h = hist.withColumn("__rn", F.row_number().over(first_w))
    val = F.struct(*[F.col(c) for c in tracked_cols])
    o = open_rows.select(
        *[F.col(k).alias(f"__ok_{k}") for k in keys],
        F.struct(*[F.col(c) for c in tracked_cols]).alias("__oval"),
        F.col(eff_col).alias("__ostart"))
    cond = None
    for k in keys:
        c = F.col(k) == F.col(f"__ok_{k}")
        cond = c if cond is None else (cond & c)
    h = h.join(o, cond, "left")
    h = (h.where(~((F.col("__rn") == 1) & F.col("__oval").isNotNull()
                   & (F.col("__oval") == val)))
         .select(*cols, "__rn",
                 *[F.col(f"__ok_{k}") for k in keys], "__oval"))
    # the open row closes at its key's first SURVIVING new version
    first_new = h.groupBy(*keys).agg(F.min(eff_col).alias("__close_ts"))
    closed_open = (open_rows.join(first_new, on=keys, how="left")
                   .withColumn(end_col, F.coalesce(F.col("__close_ts"),
                                                   F.col(end_col)))
                   .drop("__close_ts"))
    # a kept leading version inherits nothing; but if the leading version
    # was dropped as a no-op, the SECOND version's lag-end already points
    # at it -- recompute ends over the surviving set per key
    w2 = Window.partitionBy(*keys).orderBy(
        F.col(eff_col).asc(), *[F.col(c).asc() for c in tracked_cols])
    new_rows = (h.select(*keys, *tracked_cols, F.col(eff_col))
                .withColumn(end_col, F.lead(eff_col).over(w2)))
    return closed_rows.unionByName(closed_open).unionByName(new_rows)
