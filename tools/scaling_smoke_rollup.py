"""Scaling smoke for incremental_rollup — gated (exits nonzero on a
blown ratio).

The claim under test: folding a FIXED delta into the standing
aggregate costs the same whether the aggregate summarizes 1x or 64x of
history — history row count must be invisible to the fold.  We build
the standing (event_type, day) aggregate from sf0.1 events replicated
1x and 64x (disjoint event_id spaces, ids shifted so the key
cardinality stays fixed), checkpoint both, then time
incremental_rollup of the same ~17%% delta against each.

Gate: wall(fold vs 64x history) / wall(fold vs 1x history) <= 2
(the standing aggregates have IDENTICAL row counts — only the history
behind them differs — so anything above ~1 is noise).

Run: python tools/scaling_smoke_rollup.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession, functions as F

SF = "/root/testdata/sf0.1"
CUT = "2024-01-25"

spark = (SparkSession.builder.master("local[32]")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.driver.memory", "48g")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

from cascalog_spark.functions import (aggregate_rollup,  # noqa: E402
                                      incremental_rollup)

SPEC = {"n": ("count",), "sum_value": ("sum", "value"),
        "min_value": ("min", "value"), "max_value": ("max", "value"),
        "users": ("hll", "user_id")}
KEYS = ["event_type", "day"]


def with_day(df):
    return df.withColumn("day", F.date_trunc("day", F.col("ts")))


ev = spark.read.parquet(f"{SF}/events.parquet")
hist1 = with_day(ev.where(F.col("ts") < CUT))
delta = with_day(ev.where(F.col("ts") >= CUT)).repartition(32).persist()
delta.count()

big = hist1
for i in range(1, 64):
    big = big.unionByName(hist1.withColumn(
        "event_id", F.col("event_id") + F.lit(i * 100_000_000)))

t0 = time.perf_counter()
old1 = aggregate_rollup(hist1, KEYS, SPEC).localCheckpoint(eager=True)
build1 = time.perf_counter() - t0
t0 = time.perf_counter()
old64 = aggregate_rollup(big, KEYS, SPEC).localCheckpoint(eager=True)
build64 = time.perf_counter() - t0
assert old1.count() == old64.count()  # same key space


def fold(old, n=3):
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter()
        incremental_rollup(old, delta, KEYS, SPEC).write.format("noop") \
            .mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return best


f1 = fold(old1)
f64 = fold(old64)
ratio = f64 / f1
print(f"standing-agg build: 1x={build1:.2f}s 64x={build64:.2f}s "
      f"(one-time, scan-bound)")
print(f"fold fixed delta:   vs 1x history={f1:.2f}s "
      f"vs 64x history={f64:.2f}s ratio={ratio:.2f}")
if ratio > 2.0:
    print("GATE FAIL: fold cost grew with history size")
    sys.exit(1)
print("GATE OK: fold cost independent of history size")
