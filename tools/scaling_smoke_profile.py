"""Scaling smoke for the profiling/drift family — gated (exits nonzero
on a blown ratio).

64x replication of sf0.1 orders (disjoint keys).  All four ops are
single-aggregate-pass shapes whose shuffles are bounded (1-row
partials, <= bins rows, <= buckets rows), so wall should grow roughly
with the scan, never superlinearly.

Gate: wall(64x)/wall(1x) <= 96 per op (scan grows 64x; the gate allows
1.5x overhead on top of linear).

Run: python tools/scaling_smoke_profile.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession, functions as F

SF = "/root/testdata/sf0.1"

spark = (SparkSession.builder.master("local[32]")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.driver.memory", "48g")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

from cascalog_spark.functions import (dataset_fingerprint,  # noqa: E402
                                      histogram, psi_report,
                                      table_profile)

orders = spark.read.parquet(f"{SF}/orders.parquet").select(
    "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
big = orders
for i in range(1, 64):
    big = big.unionByName(orders.withColumn(
        "o_orderkey", F.col("o_orderkey") + F.lit(i * 100_000_000)))
small = orders.repartition(32).persist()
big = big.repartition(256).persist()
small.count(), big.count()


def timeit(fn, n=2):
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


OPS = {
    "table_profile": lambda df: table_profile(df).write
    .format("noop").mode("overwrite").save(),
    "dataset_fingerprint": lambda df: dataset_fingerprint(
        df.select("o_orderkey", "o_orderstatus")).write
    .format("noop").mode("overwrite").save(),
    "histogram": lambda df: histogram(df, "o_totalprice", bins=50,
                                      lo=0.0, hi=600000.0).write
    .format("noop").mode("overwrite").save(),
    "psi_report": lambda df: psi_report(
        df.where("o_orderkey % 2 = 0"), df.where("o_orderkey % 2 = 1"),
        "o_totalprice", bins=20, lo=0.0, hi=600000.0).write
    .format("noop").mode("overwrite").save(),
}

fail = False
for name, fn in OPS.items():
    t1 = timeit(lambda: fn(small))
    t64 = timeit(lambda: fn(big))
    ratio = t64 / t1
    status = "OK" if ratio <= 96 else "GATE FAIL"
    print(f"{name}: 1x={t1:.2f}s 64x={t64:.2f}s ratio={ratio:.1f} "
          f"{status}")
    fail |= ratio > 96
sys.exit(1 if fail else 0)
