"""Embedding-space curation end-to-end: corpus moments → PCA
whitening/reduction → semantic dedup in the REDUCED space → bigram
perplexity-proxy scoring → token-budget final cut — the round-5 linalg +
budget-selection operators composed the way a training-data pipeline
would actually chain them (reduce the space first, dedup there, then
spend the token budget on the least-surprising survivors).

Run: python examples/10_embedding_curation.py [sf_dir]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from cascalog_spark.functions import (bigram_nll, moments, pca_fit,
                                      pca_project, select_by_budget,
                                      semantic_dedup)
from cascalog_spark.functions.text import release_tfidf_cache, token_count

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
spark = (SparkSession.builder.master("local[*]")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

# 1. corpus moments (distributed one-pass; driver holds only d x d)
n, mu, cov = moments(emb)
import numpy as np
print(f"corpus: n={n} dim={len(mu)} trace(cov)={np.trace(cov):.4f}")

# 2. PCA-reduce 64 -> 8 dims (eigh on the d x d covariance, driver-side;
#    projection is a native Column expression — no Python in the pass)
mean, comps, ev = pca_fit(emb, k=8)
var_kept = float(ev.sum() / np.trace(cov))
print(f"top-8 components keep {var_kept:.1%} of variance")
reduced = pca_project(emb, mean, comps, out_col="pca") \
    .select("vec_id", F.col("pca").cast("array<float>").alias("embedding"))

# 3. semantic dedup in the REDUCED space (8x fewer dot-product flops
#    per comparison at corpus scale)
losers = semantic_dedup(reduced, threshold=0.35, n_clusters=8)
kept_ids = emb.join(losers, "vec_id", "left_anti").select("vec_id")
print(f"semantic dedup in PCA space: {emb.count()} -> {kept_ids.count()}")

# 4. score the surviving docs by bigram surprise (vec_id == doc_id in
#    the testdata contract)
surv_docs = docs.join(kept_ids.withColumnRenamed("vec_id", "doc_id"),
                      "doc_id")
scored = bigram_nll(surv_docs)
toks = token_count(surv_docs).select("doc_id", "n_tokens")
ranked = scored.join(toks, "doc_id")

# 5. spend 60% of the surviving token budget on the LEAST surprising
#    docs (ascending NLL = most natural text first)
total = ranked.agg(F.sum("n_tokens")).first()[0]
final = select_by_budget(ranked, total * 3 // 5, "n_tokens",
                         "bigram_nll", ascending=True,
                         method="histogram", bins=64)
picked = final.count()
spent = final.agg(F.sum("n_tokens")).first()[0]
release_tfidf_cache(scored)
print(f"budget cut: {picked} docs / {spent} of {total} tokens "
      f"({spent / total:.1%})")

spark.stop()
print("example 10 OK")
