"""8x scaling smoke for the round-4 operators: exact-substring span
dedup and the semantic_dedup 'auto' default.  Same protocol as the r3
smokes — replicate sf0.1 tables 8x with disjoint id spaces, compare
min-of-2 wall times.  A wall ratio well under 8 on fixed cores means
the plan is partition-parallel.

NOTE on exact_substring at 8x-by-replication: replicating docs 8x with
new ids makes EVERY copy a full duplicate of the original, so the span
tables are 8x denser than a natural corpus — this smoke is an upper
bound on the scaling cost, not an average case.

Run: python tools/scaling_smoke_r4.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession, functions as F

SF = "/root/testdata/sf0.1"


def rep8(df, id_col):
    k = spark.range(8).select(F.col("id").alias("__k"))
    n = 10_000_000
    return (df.crossJoin(F.broadcast(k))
            .withColumn(id_col, F.col(id_col) + F.col("__k") * n)
            .drop("__k"))


def timeit(fn, n=2):
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter()
        fn().write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return round(best, 2)


spark = (SparkSession.builder.master("local[32]")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.driver.memory", "48g")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

docs1 = spark.read.parquet(f"{SF}/documents.parquet") \
    .repartition(32).persist()
emb1 = spark.read.parquet(f"{SF}/embeddings.parquet") \
    .repartition(32).persist()
docs8 = rep8(docs1, "doc_id").repartition(64).persist()
emb8 = rep8(emb1, "vec_id").repartition(64).persist()
for d in (docs1, emb1, docs8, emb8):
    d.count()

from cascalog_spark.functions import (exact_substring_dedup,  # noqa: E402
                                      exact_substring_spans, semantic_dedup)


failures = []


def bench_pair(name, fn1, fn8, gate=6.0):
    """gate: fail if 8x-data wall ratio exceeds it (sublinear-in-wall
    requirement; measured ratios are ~2-4 with headroom for host noise)."""
    t1, t8 = timeit(fn1), timeit(fn8)
    ratio = round(t8 / max(t1, 1e-9), 1)
    print(f"{name}: 1x={t1}s 8x={t8}s ratio={ratio}")
    if ratio > gate:
        failures.append(f"{name} ratio {ratio} > gate {gate}")


bench_pair("exact_substring_spans",
           lambda: exact_substring_spans(docs1, k=8),
           lambda: exact_substring_spans(docs8, k=8))
bench_pair("exact_substring_dedup",
           lambda: exact_substring_dedup(docs1, k=8),
           lambda: exact_substring_dedup(docs8, k=8))
# the DEFAULT semantic_dedup path (method='auto'): both scales are under
# AUTO_LSH_THRESHOLD here, so force the big side over the threshold to
# measure what the default does at scale
from cascalog_spark.functions import dedup as dd  # noqa: E402

dd.AUTO_LSH_THRESHOLD = 1  # every call routes to the lsh scale path
bench_pair("semantic_dedup_auto(scale=lsh)",
           lambda: semantic_dedup(emb1, threshold=0.35,
                                  n_planes=8, bands=4, dim=64),
           lambda: semantic_dedup(emb8, threshold=0.35,
                                  n_planes=11, bands=4, dim=64))
spark.stop()
if failures:
    sys.exit("SCALING GATE FAILED: " + "; ".join(failures))
print("all scaling gates passed")
