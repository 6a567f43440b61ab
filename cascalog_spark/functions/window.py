"""Windowed-projection helpers — SURVEY §2.5.

The reference has no window-function subsystem; its idioms are sorted
grouped buffers (api_test.clj:450-468 sessionization, 247-263 first-per-
group).  This pack offers the Spark-native forms directly: per-row window
projections that scale (one shuffle on the partition keys, streaming
evaluation inside each partition — no group materialization like a
buffer).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _window(keys: list[str], order: list):
    w = Window.partitionBy(*keys) if keys else Window.partitionBy()
    return w.orderBy(*order)


def with_lag(df: DataFrame, col: str, keys: list[str], order: list,
             out_col: Optional[str] = None, n: int = 1,
             default=None) -> DataFrame:
    """Previous row's value within each key group (time-sorted)."""
    w = _window(keys, order)
    return df.withColumn(out_col or f"{col}_lag{n}",
                         F.lag(col, n, default).over(w))


def with_lead(df: DataFrame, col: str, keys: list[str], order: list,
              out_col: Optional[str] = None, n: int = 1,
              default=None) -> DataFrame:
    w = _window(keys, order)
    return df.withColumn(out_col or f"{col}_lead{n}",
                         F.lead(col, n, default).over(w))


def with_cumulative(df: DataFrame, agg: Column, keys: list[str], order: list,
                    out_col: str) -> DataFrame:
    """Running aggregate from the group's start through the current row."""
    w = _window(keys, order).rowsBetween(Window.unboundedPreceding,
                                         Window.currentRow)
    return df.withColumn(out_col, agg.over(w))


def with_rolling(df: DataFrame, agg: Column, keys: list[str], order: list,
                 out_col: str, preceding: int = 3) -> DataFrame:
    """Aggregate over the current row and the ``preceding`` rows before it."""
    w = _window(keys, order).rowsBetween(-preceding, Window.currentRow)
    return df.withColumn(out_col, agg.over(w))


def with_rank(df: DataFrame, keys: list[str], order: list,
              out_col: str = "rank", dense: bool = False) -> DataFrame:
    """rank()/dense_rank() over (keys, order) — the limit-rank idiom
    (ops.clj:208-226) as a reusable window column."""
    fn = F.dense_rank if dense else F.rank
    return df.withColumn(out_col, fn().over(_window(keys, order)))


def with_ntile(df: DataFrame, n: int, keys: list[str], order: list,
               out_col: str = "bucket") -> DataFrame:
    """ntile(n) buckets over (keys, order) — equi-depth bucketing for
    quantile stratification (e.g. length-quartile corpus splits)."""
    return df.withColumn(out_col, F.ntile(n).over(_window(keys, order)))
