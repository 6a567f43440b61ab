"""Mixture assembly + retrieval index build: TF-IDF keywording →
semantic dedup of the embedding space → SQ8 index quantization →
weighted epoch mixture → interval-join click attribution — the
round-3-continued operator pack on the driver testdata.

Run: python examples/08_mixture_and_index.py [sf_dir]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from cascalog_spark.functions import (mix_corpora, quantization_stats,
                                      quantize_embeddings, semantic_dedup,
                                      tf_idf)
from cascalog_spark.functions.text import release_tfidf_cache
from cascalog_spark.operators import range_join

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
spark = (SparkSession.builder.master("local[*]")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
events = spark.read.parquet(f"{sf_dir}/events.parquet") \
    .withColumn("ts", F.col("ts").cast("timestamp"))

# 1. keyword the corpus: top-2 TF-IDF terms per doc
kw = tf_idf(docs, top_k=2)
print("top TF-IDF terms (sample):")
kw.orderBy("doc_id", "rank").show(6, truncate=False)
release_tfidf_cache(kw)

# 2. semantically dedup the embedding space before indexing
kept = semantic_dedup(emb, threshold=0.35, n_clusters=8)
print(f"semantic dedup: {emb.count()} -> {kept.count()} vectors")

# 3. quantize the surviving index 4x (int8 codes)
stats = quantization_stats(kept)
codes = quantize_embeddings(kept, stats=stats).select("vec_id", "codes")
print("quantized index (sample):")
codes.show(3)

# 4. assemble the training mixture: upsample short docs 2x, sample the rest
short = docs.where(F.col("n_chars") < 500)
long_ = docs.where(F.col("n_chars") >= 500)
mix = mix_corpora({"short": (short, 2.0), "long": (long_, 0.5)})
mix.groupBy("mix_source", "epoch").count().orderBy("mix_source",
                                                   "epoch").show()

# 5. attribute clicks to purchase windows (interval join)
clicks = events.where("event_type = 'click'") \
    .select(F.col("event_id").alias("click_id"), "user_id", "ts")
purch = events.where("event_type = 'purchase'") \
    .select(F.col("event_id").alias("purchase_id"), "user_id",
            F.col("ts").alias("lo"),
            (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("hi"))
attributed = range_join(clicks, purch, "ts", "lo", "hi", on="user_id",
                        bucket=3600.0)
print(f"clicks inside a 1h purchase window: {attributed.count()}")

spark.stop()
print("example 08 OK")
