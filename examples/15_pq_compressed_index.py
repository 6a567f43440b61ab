"""Product-quantized ANN index — compress, measure, search, rescore:

    embeddings → pq_codebooks (seed, then Lloyd-refined) →
    pq_reconstruction_report (is the codebook healthy? mse + code
    entropy) → ann_recall_report(pq_m=...) (what does the compression
    COST in recall?) → pq_encode once (the 32x-smaller stored index) →
    pq_knn_join over the stored codes (lookup-table batch search,
    never decompressing the corpus) → exact rescoring of the
    PQ-shortlisted candidates against raw vectors.

This is the standard two-stage retrieval layout at 100 TB: the PQ
codes fit hot storage where float32 vectors cannot, the ADC pass is m
table lookups per row, and only the tiny shortlist ever touches raw
vectors again.

Run: python examples/15_pq_compressed_index.py [sf_dir]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from cascalog_spark.functions import (ann_recall_report, knn_join,
                                      pq_codebooks, pq_encode,
                                      pq_knn_join,
                                      pq_reconstruction_report)

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
spark = (SparkSession.builder.master("local[*]")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

# 1. train: deterministic seeds, then bounded-sample Lloyd refinement
books = pq_codebooks(emb, m=8, n_codes=16, kmeans_iters=5)

# 2. codebook health: mse should drop vs the raw seeds; entropy near
#    log2(n_codes) means every code pulls its weight
print("reconstruction report (Lloyd-refined codebook):")
pq_reconstruction_report(emb, books).show()

# 3. what does 32x compression cost in recall@10?
queries = (emb.orderBy("vec_id").limit(4)
           .select(F.col("vec_id").alias("query_id"), "embedding"))
print("recall report (pq vs one exact ground-truth pass):")
ann_recall_report(emb, queries, k=10, lsh_planes=(), ivf_probes=(),
                  pq_m=(8,), pq_kmeans_iters=5).show()

# 4. encode ONCE — this is the stored index (8 small ints per vector)
index = pq_encode(emb, books).select("vec_id", "embedding", "pq_codes")

# 5. batch ADC search over the stored codes
shortlist = pq_knn_join(index, queries, books, k=20,
                        codes_col="pq_codes")
print("PQ shortlist (top-3 of 20 per query):")
(shortlist.withColumn("rank", F.row_number().over(
    Window.partitionBy("query_id").orderBy(F.col("sim").desc(),
                                           "vec_id")))
 .where("rank <= 3").drop("rank").orderBy("query_id", F.col("sim").desc())
 .show())

# 6. exact rescoring: only the shortlist touches raw vectors again
#    (the union of per-query shortlists — a superset of each query's
#    own candidates, so the per-query exact top-3 is unaffected)
cands = index.join(shortlist.select("query_id", "vec_id"), on="vec_id")
print("exact rescore of the PQ shortlist (top-3 per query):")
rescored = knn_join(cands.select("vec_id", "embedding").distinct(),
                    queries, k=3)
rescored.orderBy("query_id", F.col("sim").desc()).show()
spark.stop()
