"""Structured Streaming extension tier.

The reference is strictly batch (SURVEY §2.9) — its platform seam
(cascading/platform.clj:75-78 anticipates Spark/Storm backends) is exactly
where this module plugs in: generators are source-agnostic, so a streaming
DataFrame flows through the same operator surface.  Watermarks + windowed
aggregations handle late data; ``session_windows`` covers the reference's
sessionization-style sorted-buffer idiom (api_test.clj:450-468) in a way
that scales past a single group's memory.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def stream_tap(spark: SparkSession, fmt: str, path: Optional[str] = None,
               schema=None, **options) -> DataFrame:
    """readStream wrapper — the streaming generator (tap analog)."""
    reader = spark.readStream.format(fmt).options(**options)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(path) if path else reader.load()


def tumbling_agg(df: DataFrame, ts_col: str, window: str, aggs: list,
                 keys: Optional[list] = None,
                 watermark: Optional[str] = None) -> DataFrame:
    """Tumbling-window aggregation with optional watermark for late data."""
    if watermark:
        df = df.withWatermark(ts_col, watermark)
    group = [F.window(F.col(ts_col), window)] + [F.col(k) for k in (keys or [])]
    return df.groupBy(*group).agg(*aggs)


def sliding_counts(df: DataFrame, ts_col: str, window: str, slide: str,
                   keys: Optional[list] = None,
                   watermark: Optional[str] = None) -> DataFrame:
    if watermark:
        df = df.withWatermark(ts_col, watermark)
    group = ([F.window(F.col(ts_col), window, slide)]
             + [F.col(k) for k in (keys or [])])
    return df.groupBy(*group).agg(F.count(F.lit(1)).alias("n"))


def session_windows(df: DataFrame, ts_col: str, gap: str, keys: list,
                    aggs: Optional[list] = None,
                    watermark: Optional[str] = None) -> DataFrame:
    """Sessionization via native session_window — the streaming-scale
    answer to the reference's time-sorted buffer idiom."""
    if watermark:
        df = df.withWatermark(ts_col, watermark)
    group = [F.session_window(F.col(ts_col), gap)] + [F.col(k) for k in keys]
    return df.groupBy(*group).agg(
        *(aggs or [F.count(F.lit(1)).alias("n_events")]))


def write_stream(df: DataFrame, fmt: str, path: Optional[str] = None,
                 checkpoint: Optional[str] = None,
                 output_mode: str = "append", trigger: Optional[dict] = None,
                 query_name: Optional[str] = None, **options):
    """writeStream wrapper (streaming sink tap)."""
    writer = df.writeStream.format(fmt).outputMode(output_mode) \
        .options(**options)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    if query_name:
        writer = writer.queryName(query_name)
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start(path) if path else writer.start()


def stream_to_memory(df: DataFrame, name: str, output_mode: str = "append"):
    """Memory-sink execution with availableNow trigger — drains everything
    currently available, then stops (the test harness pattern)."""
    query = (df.writeStream.format("memory").queryName(name)
             .outputMode(output_mode)
             .trigger(availableNow=True).start())
    query.awaitTermination()
    return query


def stream_dedup(df: DataFrame, keys: list, ts_col: Optional[str] = None,
                 watermark: Optional[str] = None) -> DataFrame:
    """Streaming exact dedup on ``keys`` — the streaming face of the batch
    ``dedup.exact_dedup`` pack for continuous ingestion pipelines.

    With ``ts_col`` + ``watermark``, uses dropDuplicatesWithinWatermark so
    per-key state is EVICTED once the key falls behind the watermark —
    bounded state on an unbounded stream (a plain dropDuplicates would
    accumulate every key ever seen).  Without a watermark, falls back to
    unbounded dropDuplicates (testing/finite streams only).
    """
    if ts_col and watermark:
        return df.withWatermark(ts_col, watermark) \
                 .dropDuplicatesWithinWatermark(keys)
    return df.dropDuplicates(keys)
