"""Scaling smoke for frequent_tokens (exact two-pass heavy hitters) —
gated (exits nonzero on a blown ratio).

8x replication of sf0.1 documents with disjoint doc_id spaces.  Note the
replication keeps the token DISTRIBUTION identical, so the heavy-hitter
set is unchanged while the token stream is 8x — exactly the scale-up
shape the candidate pass must absorb (its shuffle grows with #batches,
not with tokens).

Gate: wall(8x)/wall(1x) <= 6 on fixed cores.

Run: python tools/scaling_smoke_freq.py
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

from cascalog_spark.functions import frequent_tokens  # noqa: E402

docs = spark.read.parquet(f"{SF}/documents.parquet")
big = docs
for i in range(1, 8):
    big = big.unionByName(docs.withColumn(
        "doc_id", F.col("doc_id") + F.lit(i * 10_000_000)))
big = big.repartition(32).persist()
docs1 = docs.repartition(32).persist()
big.count(), docs1.count()


def timeit(df, n=2):
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter()
        frequent_tokens(df, phi=0.002).write.format("noop") \
            .mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return round(best, 2)


t1 = timeit(docs1)
t8 = timeit(big)
ratio = round(t8 / t1, 2)
print(f"frequent_tokens: 1x {t1}s  8x {t8}s  ratio {ratio}x")
if ratio > 6:
    print("GATE BLOWN: ratio > 6")
    sys.exit(1)
print("smoke OK")
