"""Corpus curation end-to-end: quality/repetition filters → domain quota
capping → stratified mixture sampling → as-of event attribution → batch
k-NN retrieval — the round-3 operator pack on the driver testdata.

Run: python examples/07_corpus_curation.py [sf_dir]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from cascalog_spark.functions import (cap_per_stratum, frequent_tokens,
                                      knn_join, near_dedup,
                                      repetition_signals,
                                      stratified_sample, top_ngrams)
from cascalog_spark.operators import asof_join

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
spark = (SparkSession.builder.master("local[*]")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

# 1. repetition filter: drop docs dominated by repeated n-grams
rep = repetition_signals(docs)
clean = (docs.join(rep, "doc_id")
         .where(F.col("dup_ngram_char_frac") < 0.5)
         .drop("top_ngram_char_frac", "dup_ngram_char_frac"))
print("after repetition filter:", clean.count(), "/", docs.count())

# 2. corpus audit: the dominant bigrams (boilerplate candidates)
top_ngrams(clean, n=2, k=5).show(truncate=False)

# 2a. vocabulary heavy hitters, EXACT at any corpus size: the two-pass
# candidate+recount plan never shuffles one row per distinct token
hh = frequent_tokens(clean, phi=0.005)
print("tokens above 0.5% of all occurrences:", hh.count())

# 2b. near-duplicate removal: keep one representative per LSH cluster
deduped = near_dedup(clean, num_perm=8, bands=4)
print("after near-dedup:", deduped.count(), "/", clean.count())
clean = deduped

# 3. domain quota: no source may contribute more than 30 docs...
capped = cap_per_stratum(clean, 30, "source")
# 4. ...then mixture weights: favor src0/src1, downsample the rest
mix = stratified_sample(
    capped, {f"src{i}": (1.0 if i < 2 else 0.5) for i in range(20)},
    "source")
mix.groupBy("source").count().orderBy("source").show(5)

# 5. as-of attribution: each click joined to the user's latest purchase
ev = spark.read.parquet(f"{sf_dir}/events.parquet")
if dict(ev.dtypes)["ts"] in ("bigint", "long"):
    ev = ev.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
clicks = ev.where("event_type = 'click'").select("event_id", "user_id", "ts")
purchases = ev.where("event_type = 'purchase'") \
              .select("user_id", "ts", "event_id", "value")
attributed = asof_join(clicks, purchases, on="user_id",
                       right_cols=["value"], tiebreak="value",
                       tolerance=F.expr("INTERVAL 7 DAYS"))
print("clicks with an attributable purchase:",
      attributed.where("value is not null").count(), "/", clicks.count())

# 6. batch k-NN: retrieve 3 neighbors for each of 4 query embeddings
emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
queries = (emb.where("vec_id < 4")
           .select(F.col("vec_id").alias("query_id"), "embedding"))
knn_join(emb, queries, k=3).orderBy("query_id", F.desc("sim")).show()

spark.stop()
