"""Targeted-selection pipeline (the round-5 eighth-wave pack): Gopher
rule filtering → URL dedup → n-gram AND embedding-space decontamination
→ classifier fit + scoring → DSIR importance resampling toward a target
corpus → token-budget cut → sequence packing.

Every stage is a native DataFrame composition; the pipeline runs
unchanged on a 1000-executor cluster — broadcast benchmark/ratio
tables, bucket-capped aggregates, no driver-side data.

Run: python examples/11_targeted_selection.py [sf_dir]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from cascalog_spark.functions import (dsir_sample, fit_linear_classifier,
                                      gopher_rules, linear_text_classifier,
                                      pack_sequences, select_by_budget,
                                      semantic_decontaminate, url_dedup)
from cascalog_spark.functions.text import token_count

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
spark = (SparkSession.builder.master("local[*]")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

# 0. know your data: one-row corpus profile before any decision
from cascalog_spark.functions import corpus_report

corpus_report(docs).show(truncate=False)

# 1. Gopher A1.1 rule bundle: keep flag + reasons, one native pass.
# The synthetic testdata has no English stopwords, so tolerate that one
# failure and enforce the rest (length, symbol/ellipsis ratios, ...).
g = gopher_rules(docs)
ok = g.where(F.col("keep")
             | (F.col("fail_reasons") == F.array(F.lit("stopwords"))))
kept = docs.join(ok.select("doc_id"), "doc_id")
print("gopher keep:", kept.count(), "/", docs.count())

# 2. URL dedup (synthesized URLs: docs have none) — canonical-key owner
urls = kept.select("doc_id", F.concat(
    F.lit("https://www.src"), (F.col("doc_id") % 9).cast("string"),
    F.lit(".org/d/"), (F.col("doc_id") % 40).cast("string"),
    F.lit("?utm_source=feed")).alias("url"))
owners = url_dedup(urls)
kept = kept.join(owners.select(F.col("keep_id").alias("doc_id")), "doc_id")
print("after url dedup:", kept.count())

# 3. embedding-space decontamination vs a benchmark slice
bench_vecs = embs.where(F.col("vec_id") % 97 == 0)
clean_ids = semantic_decontaminate(
    embs, bench_vecs, threshold=0.9, id_col="vec_id").select(
    F.col("vec_id").alias("doc_id"))
kept = kept.join(clean_ids, "doc_id", "left_semi")
print("after semantic decontamination:", kept.count())

# 4. fit the quality classifier on parity labels, score the corpus
fit = fit_linear_classifier(
    kept.withColumn("y", (F.col("doc_id") % 2 == 0).cast("double")),
    "y", dim=64, iters=5)
scored = linear_text_classifier(kept, fit["weights"], bias=fit["bias"])
print("classifier scored:", scored.count())

# 5. DSIR: resample toward the high-scoring half as the "target"
target = kept.join(scored.where("score > 0.5"), "doc_id", "left_semi")
picked = dsir_sample(kept, target, n=200, n_buckets=4096)
print("dsir picked:", picked.count())

# 5b. fuse the classifier score with a length prior in RANK space
# (no calibration needed) and expand from the known-good seed set via
# personalized PageRank over the near-dup graph (find-more-like-these)
from cascalog_spark.functions import (minhash_lsh_candidates, pagerank,
                                      rank_fusion)

sig = (scored.join(kept.select("doc_id", "text"), "doc_id")
       .withColumn("n_chars", F.length("text").cast("double")))
fused = rank_fusion(sig, {"score": "desc", "n_chars": "desc"},
                    keep_ranks=True)
fused.orderBy(F.col("rrf_score").desc()).select(
    "doc_id", "score_rank", "n_chars_rank", "rrf_score").show(5)
seeds = scored.where("score > 0.7").select("doc_id")
ppr = pagerank(minhash_lsh_candidates(kept, "doc_id", num_perm=8),
               src_col="id_a", dst_col="id_b", undirected=True,
               nodes=kept.select("doc_id"), iters=3, reset=seeds,
               materialize=False)
print("seed-expanded (rank > 0):",
      ppr.where("rank > 0").count(), "of", kept.count())

# 6. token-budget cut, then pack into 512-token training sequences
t = token_count(picked).select("doc_id", "n_tokens")
budget = t.agg(F.sum("n_tokens")).first()[0] * 3 // 4
sel = select_by_budget(t.join(picked.select("doc_id", "text", "source"),
                              "doc_id"),
                       budget, "n_tokens", "n_tokens",
                       method="histogram", bins=16)
packed = pack_sequences(sel, max_tokens=512)
packed.groupBy("seq_id").count().orderBy("seq_id").show(5)
print("packed sequences:",
      packed.select("seq_id").distinct().count())

# 7. export: equal-token-mass shards, written in a deterministic
# global-random order (the on-disk order IS the training order)
from cascalog_spark.functions import balanced_shards, write_shuffled

shards = balanced_shards(sel.select("doc_id", "n_tokens"),
                         4, "n_tokens", bins=32)
shards.groupBy("shard").agg(F.sum("n_tokens").alias("mass")) \
      .orderBy("shard").show()
write_shuffled(sel, "/tmp/example11_export", "doc_id", n_files=4, seed=3)
print("export rows:",
      spark.read.parquet("/tmp/example11_export").count())
spark.stop()
