"""8x scaling smoke for the round-3-continued operators: replicate the
sf0.1 documents/embeddings/events tables 8x with disjoint id spaces,
pre-materialize both scales in memory, and compare min-of-2 wall times.
A wall ratio well under 8 on fixed cores means the plan is
partition-parallel (throughput scales with cores, not data size).

Run: python tools/scaling_smoke_r3b.py
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

from cascalog_spark.functions import (linear_text_classifier, mix_corpora,
                                      quantization_stats,
                                      quantize_embeddings, semantic_dedup,
                                      tf_idf, unigram_nll)
from cascalog_spark.functions.similarity import ivf_centroids

W = [((-1) ** i) * (i % 5) / 10.0 for i in range(16)]


def bench_pair(name, fn1, fn8):
    t1, t8 = timeit(fn1), timeit(fn8)
    print(f"{name}: 1x={t1}s 8x={t8}s ratio={round(t8 / max(t1, 1e-9), 1)}")


cents1 = ivf_centroids(emb1, n_centroids=16)
cents8 = ivf_centroids(emb8, n_centroids=128)  # k grows with corpus
# method='cells' is the SemDeDup-literal path — O(n·k) assignment +
# Σ|cell|² scoring BOTH go superlinear once k tracks n (measured 12.9x
# at 8x).  method='lsh' (banded hyperplane blocking, n_planes grown
# log-with-corpus) is the scale path — measured 3.8x at 8x data.
bench_pair("semantic_dedup_cells",
           lambda: semantic_dedup(emb1, threshold=0.35, centroids=cents1),
           lambda: semantic_dedup(emb8, threshold=0.35, centroids=cents8))
bench_pair("semantic_dedup_lsh",
           lambda: semantic_dedup(emb1, threshold=0.35, method="lsh",
                                  n_planes=8, bands=4, dim=64),
           lambda: semantic_dedup(emb8, threshold=0.35, method="lsh",
                                  n_planes=11, bands=4, dim=64))
bench_pair("tf_idf_top3",
           lambda: tf_idf(docs1, top_k=3),
           lambda: tf_idf(docs8, top_k=3))
bench_pair("unigram_nll",
           lambda: unigram_nll(docs1),
           lambda: unigram_nll(docs8))
bench_pair("classifier",
           lambda: linear_text_classifier(docs1, W, bias=-0.5),
           lambda: linear_text_classifier(docs8, W, bias=-0.5))
bench_pair("quantize",
           lambda: quantize_embeddings(
               emb1, stats=quantization_stats(emb1, dim=64)),
           lambda: quantize_embeddings(
               emb8, stats=quantization_stats(emb8, dim=64)))
bench_pair("mix_corpora",
           lambda: mix_corpora(
               {"a": (docs1.where("doc_id % 2 = 0"), 2.5),
                "b": (docs1.where("doc_id % 2 = 1"), 0.3)}),
           lambda: mix_corpora(
               {"a": (docs8.where("doc_id % 2 = 0"), 2.5),
                "b": (docs8.where("doc_id % 2 = 1"), 0.3)}))
spark.stop()
