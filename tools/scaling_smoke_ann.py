"""Scaling smoke for ann_recall_report — gated (exits nonzero on a
blown ratio).

8x replication of sf0.1 embeddings with disjoint vec_id spaces (the
replicas keep the vector DISTRIBUTION identical, so per-bucket/per-cell
candidate fractions are unchanged while the index is 8x).  The report's
cost = a FIXED driver-side part (Catalyst analysis/codegen of the
plane/centroid expression trees + the q*k ground-truth checkpoint) plus
index-linear candidate work; at sf0.1 sizes the fixed part dominates,
so the 8x wall ratio must stay far below linear.

Gate: wall(8x)/wall(1x) <= 4 on fixed cores (an all-pairs or per-config
re-scan regression would push it toward 8+).

Run: python tools/scaling_smoke_ann.py
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

from cascalog_spark.functions import ann_recall_report  # noqa: E402

emb = spark.read.parquet(f"{SF}/embeddings.parquet")
big = emb
for i in range(1, 8):
    big = big.unionByName(emb.withColumn(
        "vec_id", F.col("vec_id") + F.lit(i * 10_000_000)))
big = big.repartition(32).persist()
emb1 = emb.repartition(32).persist()
big.count(), emb1.count()


def report(df):
    qs = (df.orderBy("vec_id").limit(8)
          .select(F.col("vec_id").alias("query_id"), "embedding"))
    return ann_recall_report(df, qs, k=10, lsh_planes=(4, 8),
                             ivf_probes=(1, 2, 4), n_centroids=16,
                             lsh_multi_probe=1)


def timeit(df, n=2):
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter()
        report(df).write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return round(best, 2)


t1 = timeit(emb1)
t8 = timeit(big)
ratio = round(t8 / t1, 2)
print(f"ann_recall_report: 1x {t1}s  8x {t8}s  ratio {ratio}x")
if ratio > 4:
    print("GATE BLOWN: ratio > 4")
    sys.exit(1)
print("smoke OK")
