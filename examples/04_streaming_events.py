"""Streaming pipeline over the events table: watermarked dedup →
tumbling-window counts, drained with an availableNow trigger so the same
script works on a finite snapshot (swap the source for kafka/files in
production — the operators are source-agnostic).

Run: python examples/04_streaming_events.py [sf_dir]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql import SparkSession

from cascalog_spark.streaming import (stream_dedup, stream_tap,
                                      stream_to_memory, tumbling_agg)

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
spark = (SparkSession.builder.master("local[*]")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.ui.enabled", "false")
         .config("spark.sql.legacy.parquet.nanosAsLong", "true")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

# file stream sources take a DIRECTORY; glob-filter to the events table
schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
events = stream_tap(spark, "parquet", sf_dir, schema=schema,
                    pathGlobFilter="events.parquet")
if dict(events.dtypes)["ts"] in ("bigint", "long"):  # nanos-as-long generation
    events = events.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
else:
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))

# drop replayed event ids (state evicted once past the watermark), then
# count per type per day — partial aggregation + watermark-bounded state
deduped = stream_dedup(events, ["event_id"], ts_col="ts", watermark="1 day")
# the watermark set for dedup carries downstream (redefining one is an
# analysis error), so the windowed agg just inherits it
counts = tumbling_agg(deduped, "ts", "1 day",
                      [F.count(F.lit(1)).alias("n_events")],
                      keys=["event_type"])

stream_to_memory(counts, "daily", output_mode="complete")
spark.sql("""SELECT window.start AS day, event_type, n_events
             FROM daily ORDER BY day, event_type LIMIT 20""").show(truncate=False)
spark.stop()
