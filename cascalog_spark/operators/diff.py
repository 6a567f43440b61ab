"""Table reconciliation — the data-validation diff between two snapshots
of the same logical table (migration checks, replication audits, oracle
comparisons at table scale).

One full-outer join keyed on the primary key; the change classification is
a projection.  At 100 TB both sides shuffle once on the key (or zero times
if both are bucketed on it); the output is only the differing rows when
``changed_only`` — the common case where diffs are tiny relative to the
tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def table_diff(left: DataFrame, right: DataFrame, key_cols: list[str],
               compare_cols: list[str] | None = None,
               changed_only: bool = True) -> DataFrame:
    """Row-level diff of two tables sharing a primary key →
    ``(keys…, diff, …_l, …_r)`` with ``diff`` ∈
    {'added', 'removed', 'changed', 'same'} ('added' = present only in
    ``right``).  ``compare_cols`` defaults to all shared non-key columns;
    comparison is null-safe (NULL == NULL)."""
    keys = list(key_cols)
    if compare_cols is None:
        compare_cols = [c for c in left.columns
                        if c in right.columns and c not in keys]
    l = left.select(*keys, *[F.col(c).alias(f"{c}_l")
                             for c in compare_cols],
                    F.lit(1).alias("__in_l"))
    r = right.select(*keys, *[F.col(c).alias(f"{c}_r")
                              for c in compare_cols],
                     F.lit(1).alias("__in_r"))
    j = l.join(r, on=keys, how="full_outer")
    same = F.lit(True)
    for c in compare_cols:
        same = same & F.col(f"{c}_l").eqNullSafe(F.col(f"{c}_r"))
    diff = (F.when(F.col("__in_l").isNull(), F.lit("added"))
            .when(F.col("__in_r").isNull(), F.lit("removed"))
            .when(same, F.lit("same"))
            .otherwise(F.lit("changed")))
    out = j.withColumn("diff", diff).drop("__in_l", "__in_r")
    if changed_only:
        out = out.where(F.col("diff") != "same")
    return out.select(*keys, "diff",
                      *[f"{c}_l" for c in compare_cols],
                      *[f"{c}_r" for c in compare_cols])
