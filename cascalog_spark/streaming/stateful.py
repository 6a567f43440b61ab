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
