"""End-to-end training-data pipeline over the documents table:

    clean → quality gate → exact + near dedup → PII redaction →
    context-window chunking → token accounting

Every stage is partition-parallel DataFrame ops (no driver-side loops), so
the same script shape runs on a 1000-executor cluster — only the paths and
the session config change.

Run: python examples/06_training_data_pipeline.py [sf_dir]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql import SparkSession

from cascalog_spark.functions import (chunk_text, minhash_lsh_candidates,
                                      redact_pii)
from cascalog_spark.functions.dedup import dedup_clusters, exact_dedup
from cascalog_spark.functions.text import clean_text, quality_score

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
spark = (SparkSession.builder.master("local[*]")
         .config("spark.sql.shuffle.partitions", "16")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
n0 = docs.count()

# 1. normalize + quality gate (native regexp chains, no UDF)
docs = clean_text(docs, out_col="text")
docs = quality_score(docs).where(F.col("quality") >= 0.5).drop("quality")

# 2. exact dedup: keep the lowest doc_id per normalized fingerprint
keep = exact_dedup(docs.withColumn("fp", F.md5("text")), ["fp"], "doc_id") \
    .select(F.col("keep_id").alias("doc_id"))
docs = docs.join(keep, "doc_id", "left_semi")

# 3. near dedup: MinHash-LSH candidates → connected components → keep the
#    cluster representative (min id); non-clustered docs pass through
pairs = minhash_lsh_candidates(docs, "doc_id", num_perm=8, bands=4)
clusters = dedup_clusters(pairs)
drop = clusters.where(F.col("node") != F.col("cluster")) \
               .select(F.col("node").alias("doc_id"))
docs = docs.join(drop, "doc_id", "left_anti")

# 4. PII scrubbing (RE2-safe masks), then context-window chunking
docs = redact_pii(docs).drop("text") \
    .withColumnRenamed("redacted", "text")
chunks = chunk_text(docs, max_tokens=128, overlap=16)

# 5. accounting
stats = chunks.agg(
    F.count(F.lit(1)).alias("n_chunks"),
    F.sum("n_tokens").alias("total_tokens"),
    F.round(F.avg("n_tokens"), 1).alias("avg_chunk_tokens")).collect()[0]
n_docs = docs.count()
print(f"{n0} raw docs -> {n_docs} kept after quality+dedup")
print(f"chunks: {stats['n_chunks']}, tokens: {stats['total_tokens']}, "
      f"avg chunk: {stats['avg_chunk_tokens']} tokens")
spark.stop()
