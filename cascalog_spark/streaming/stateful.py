"""Custom stateful streaming operators via ``applyInPandasWithState`` —
the extension seam for operators Structured Streaming lacks natively
(SURVEY §2.9: the reference has no streaming at all; this is the
platform-third-slot story carried to streams).

State is per-key, partition-distributed, checkpointed by Spark — nothing
driver-side, so a 1000-executor cluster shards keys horizontally.
"""

from __future__ import annotations

from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def running_counts(stream_df: DataFrame, key_col: str,
                   out_col: str = "n_total") -> DataFrame:
    """Cumulative per-key event count across micro-batches — the minimal
    custom stateful op: state = one counter per key."""

    def fn(key, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        n = state.get[0] if state.exists else 0
        for pdf in pdfs:
            n += len(pdf)
        state.update((n,))
        yield pd.DataFrame({key_col: [key[0]], out_col: [n]})

    key_t = stream_df.schema[key_col].dataType.simpleString()
    return (stream_df.groupBy(key_col).applyInPandasWithState(
        fn, f"{key_col} {key_t}, {out_col} bigint", "n bigint",
        "update", GroupStateTimeout.NoTimeout))


def stateful_op(stream_df: DataFrame, key_cols: list[str], fn: Callable,
                output_schema: str, state_schema: str,
                output_mode: str = "update",
                timeout: str = GroupStateTimeout.NoTimeout) -> DataFrame:
    """Generic escape hatch: ``fn(key, batches_iter, state)`` with an
    arbitrary state tuple — sessionization with custom expiry, CDC merge,
    per-entity model state, …"""
    return (stream_df.groupBy(*key_cols).applyInPandasWithState(
        fn, output_schema, state_schema, output_mode, timeout))


def stream_frequent_items(stream_df: DataFrame, col: str, phi: float,
                          n_buckets: int = 64) -> DataFrame:
    """Streaming heavy-hitter CANDIDATES: bucketed Misra-Gries state.

    The batch :func:`~cascalog_spark.functions.stats.frequent_items` is
    two-pass; a stream gets one look, so this maintains the classic
    one-pass sketch instead and guarantees a SUPERSET: every value whose
    cumulative count reaches ``phi * N`` (N = rows seen so far) is
    present in the emitted summary.  Exactify against the at-rest data
    with ``frequent_items``'s recount idiom when the exact counts matter.

    Sharding: rows are hash-bucketed on the value, so ALL occurrences of
    a value land in ONE bucket's state — per-bucket MG with
    ``k = ceil(1/phi) + 1`` counters then guarantees survival even if
    the bucket degenerates to the whole stream (count >= phi*N >=
    phi*n_b > n_b/k).  State is ``n_buckets * k`` (item, count) pairs
    TOTAL — independent of stream length and vocabulary — and buckets
    shard horizontally across executors.

    Per micro-batch the update is one vectorized merge (pandas
    value_counts + counter add, then the mergeable-summaries MG
    reduction: subtract the (k+1)-th largest, keep positive) — O(batch
    distinct), never per-row Python.

    Emits the full bucket summary each trigger (update mode):
    ``(__hh_bucket, item, mg_count, n_seen)``; ``mg_count``
    underestimates the true count by at most ``n_seen/k``.  ``n_seen``
    (rows the bucket has absorbed) is monotone — the final summary per
    bucket is its max-``n_seen`` emission.
    """
    if not (0.0 < phi <= 1.0):
        raise ValueError(f"stream_frequent_items: phi must be in (0, 1], "
                         f"got {phi}")
    import math

    k = math.ceil(1.0 / phi) + 1
    item_t = stream_df.schema[col].dataType.simpleString()

    def fn(key, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        if state.exists:
            items, cnts, n = state.get
            summary = pd.Series(list(cnts), index=list(items),
                                dtype="int64")
        else:
            summary, n = pd.Series(dtype="int64"), 0
        for pdf in pdfs:
            vals = pdf[col].dropna()
            n += len(vals)
            summary = summary.add(vals.value_counts(), fill_value=0)
            if len(summary) > k:
                # mergeable-summaries MG reduction: subtracting the
                # (k+1)-th largest from everything and dropping <= 0
                # keeps <= k counters and adds <= n_b/(k+1) error
                t = summary.nlargest(k + 1).iloc[-1]
                summary = summary[summary > t] - t
        state.update((summary.index.tolist(),
                      [int(x) for x in summary.tolist()], int(n)))
        yield pd.DataFrame({
            "__hh_bucket": key[0],
            "item": summary.index,
            "mg_count": summary.astype("int64").values,
            "n_seen": int(n),
        })

    bucketed = stream_df.withColumn(
        "__hh_bucket",
        F.pmod(F.xxhash64(F.col(col).cast("string")),
               F.lit(n_buckets)).cast("int"))
    return (bucketed.groupBy("__hh_bucket").applyInPandasWithState(
        fn,
        f"__hh_bucket int, item {item_t}, mg_count bigint, n_seen bigint",
        f"items array<{item_t}>, cnts array<bigint>, n bigint",
        "update", GroupStateTimeout.NoTimeout))


def latest_bucket_summary(df: DataFrame, bucket_col: str = "__hh_bucket",
                          n_col: str = "n_seen") -> DataFrame:
    """Final per-bucket summary from an update-mode emission log (memory
    sink of :func:`stream_frequent_items`): ``n_seen`` is monotone per
    bucket, so the rows carrying each bucket's max are its last — and
    therefore current — summary."""
    from pyspark.sql import Window

    return (df.withColumn("__lbs_mx", F.max(n_col).over(
        Window.partitionBy(bucket_col)))
        .where(F.col(n_col) == F.col("__lbs_mx"))
        .drop("__lbs_mx"))
