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


def stage_file_batches(dfs: list, path: Optional[str] = None,
                       prefix: str = "batch",
                       stop_timeout: Optional[str] = "60s") -> str:
    """Write each DataFrame as exactly ONE parquet file under ``path``,
    mtime-ordered, so a file-source stream with ``maxFilesPerTrigger=1``
    replays them as deterministic micro-batches — the fixture harness for
    watermark/late-data semantics (the file source orders by modification
    time, so distinct synthetic mtimes pin the batch order).

    SESSION-CONF SIDE EFFECT (documented contract): when the session's
    ``spark.sql.streaming.stopTimeout`` is the unbounded default (0 =
    ``stop()`` waits forever), it is set to ``stop_timeout`` so a replay
    that wedges under host load raises a catchable TimeoutException in
    the harness instead of deadlocking inside a Python ``foreachBatch``
    callback (observed r8).  This changes ``stop()`` semantics for ALL
    streaming queries in the session; pass ``stop_timeout=None`` to
    leave the session conf untouched, or pre-set the conf yourself
    (tests/conftest.py does) — an explicitly configured value is never
    overridden.

    Returns the directory; read it back with::

        spark.readStream.schema(s).option("maxFilesPerTrigger", "1")
             .option("pathGlobFilter", "batch*.parquet").parquet(dir)
    """
    import glob
    import os
    import shutil
    import tempfile

    if dfs and stop_timeout is not None:
        conf = dfs[0].sparkSession.conf
        if conf.get("spark.sql.streaming.stopTimeout", "0") in ("0", "0ms"):
            conf.set("spark.sql.streaming.stopTimeout", stop_timeout)
    d = path or tempfile.mkdtemp(prefix="stream_batches_")
    os.makedirs(d, exist_ok=True)
    for i, b in enumerate(dfs):
        tmp = os.path.join(d, f"_stage{i}")
        b.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        dst = os.path.join(d, f"{prefix}{i}.parquet")
        shutil.move(part, dst)
        shutil.rmtree(tmp)
        os.utime(dst, (1_000_000 + i * 1000,) * 2)
    return d


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


def stream_interval_join(left: DataFrame, right: DataFrame, on: str | list,
                         left_ts: str, right_ts: str,
                         lower: str, upper: str,
                         left_watermark: str = "1 hour",
                         right_watermark: str = "1 hour",
                         how: str = "inner") -> DataFrame:
    """Stream-stream interval join: left rows match right rows with equal
    ``on`` keys whose ``right_ts`` lies in
    ``[left_ts - lower, left_ts + upper]`` — the streaming face of the
    batch ``operators.range_join`` (click↔purchase attribution on live
    streams).

    Uses Structured Streaming's NATIVE stream-stream join with an
    event-time range condition: the watermarks + the time bound let the
    engine EVICT join state once a row can no longer match (an unbounded
    stream-stream join would otherwise buffer both streams forever) —
    this is the supported pattern from the Spark streaming join guide,
    not a custom operator.  ``lower``/``upper`` are interval strings
    (e.g. ``"0 seconds"``, ``"1 hour"``).  Outer joins additionally
    require BOTH watermarks so the engine knows when to emit unmatched
    rows.
    """
    keys = [on] if isinstance(on, str) else list(on)
    l = left.withWatermark(left_ts, left_watermark).alias("l")
    r = right.withWatermark(right_ts, right_watermark).alias("r")
    cond = None
    for k in keys:
        c = F.col(f"l.{k}") == F.col(f"r.{k}")
        cond = c if cond is None else (cond & c)
    lo = F.expr(f"l.{left_ts} - INTERVAL {lower}")
    hi = F.expr(f"l.{left_ts} + INTERVAL {upper}")
    cond = cond & (F.col(f"r.{right_ts}") >= lo) \
                & (F.col(f"r.{right_ts}") <= hi)
    return l.join(r, cond, how)


def trapped_stream_map(df: DataFrame, fn, in_cols: list,
                       out_cols: list, returns: list) -> DataFrame:
    """Apply a Python fn to a streaming DataFrame with ``:trap`` semantics
    (the streaming face of the batch compiler's trap split,
    operations.clj:617-644): instead of failing the query, a row whose fn
    throws carries the error in ``__error`` and its outputs as null.

    Pair with ``write_stream_trapped`` to divert errored rows to a trap
    sink per micro-batch while clean rows flow to the main sink — the
    poison record never kills the stream.
    """
    from pyspark.sql import types as T

    struct_t = T.StructType(
        [T.StructField(f"_{i}", t) for i, t in enumerate(returns)]
        + [T.StructField("__error", T.StringType())])
    n_out = len(out_cols)

    def wrapped(*vals):
        try:
            r = fn(*vals)
            r = tuple(r) if n_out > 1 else (r,)
            return r + (None,)
        except Exception as e:  # diverted, not fatal
            return tuple([None] * n_out) + (f"{type(e).__name__}: {e}",)

    # asNondeterministic for the same reason as the batch trap: Catalyst
    # must not re-evaluate the fn per branch (double-draw could land a row
    # in both the trap and the output)
    udf = F.udf(wrapped, struct_t).asNondeterministic()
    tmp = "__trapout"
    out = df.withColumn(tmp, udf(*[F.col(c) for c in in_cols]))
    for i, name in enumerate(out_cols):
        out = out.withColumn(name, F.col(tmp).getField(f"_{i}"))
    return out.withColumn("__error", F.col(tmp).getField("__error")) \
              .drop(tmp)


def write_stream_to_tap(df: DataFrame, tap,
                        checkpoint: Optional[str] = None,
                        trigger: Optional[dict] = None,
                        query_name: Optional[str] = None):
    """Stream into a batch Tap via foreachBatch — every micro-batch goes
    through ``tap.save_df``, so the whole tap matrix (parquet/orc/csv/
    jdbc/bucketed, partition_by templates) is a streaming sink too.

    The interesting composition is ``sinkmode='update_partitions'``: each
    micro-batch overwrites exactly the partitions it touches (the
    streaming upsert into a partitioned lake — late re-deliveries of a
    day REWRITE that day idempotently instead of appending duplicates).
    ``sinkmode='update'`` appends.  ``replace``/``keep`` are rejected
    loudly — per-micro-batch overwrite would clobber previous batches,
    per-micro-batch ignore would drop them."""
    if getattr(tap, "sinkmode", None) in ("replace", "keep"):
        raise ValueError(
            "write_stream_to_tap: sinkmode must be 'update' or "
            "'update_partitions' — per-micro-batch "
            f"'{tap.sinkmode}' would clobber or drop earlier batches")

    def process(batch_df, batch_id):
        tap.save_df(batch_df)

    writer = df.writeStream.foreachBatch(process)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    if query_name:
        writer = writer.queryName(query_name)
    writer = writer.trigger(**(trigger or {"availableNow": True}))
    return writer.start()


def write_stream_trapped(df: DataFrame, main_sink, trap_sink,
                         error_col: str = "__error",
                         checkpoint: Optional[str] = None,
                         trigger: Optional[dict] = None,
                         query_name: Optional[str] = None):
    """foreachBatch sink with error diversion: each micro-batch is split
    ONCE on ``error_col`` — errored rows (with the error message) go to
    ``trap_sink``, clean rows (error column dropped) to ``main_sink``.

    Sinks are batch sinks: a Tap (``save_df``) or a callable(DataFrame).
    The batch is persisted for the span of the split so the UDF that
    produced the error column runs once per row, not once per branch —
    exactly the batch trap's persist-at-the-split-point rule.
    """
    def _sink(batch_df, sink):
        if hasattr(sink, "save_df"):
            sink.save_df(batch_df)
        elif callable(sink):
            sink(batch_df)
        else:  # pragma: no cover - arg error
            raise TypeError(f"not a sink: {sink!r}")

    err = F.col(error_col)

    def process(batch_df, batch_id):
        batch_df = batch_df.persist()
        try:
            _sink(batch_df.filter(err.isNotNull()), trap_sink)
            _sink(batch_df.filter(err.isNull()).drop(error_col), main_sink)
        finally:
            batch_df.unpersist()

    writer = df.writeStream.foreachBatch(process)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    if query_name:
        writer = writer.queryName(query_name)
    writer = writer.trigger(**(trigger or {"availableNow": True}))
    return writer.start()
