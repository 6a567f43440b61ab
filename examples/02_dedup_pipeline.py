"""Near-duplicate detection pipeline over the driver testdata:
MinHash-LSH candidates → exact-verify → connected-component clusters.

Run: python examples/02_dedup_pipeline.py [sf_dir]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

from cascalog_spark.functions import (containment_dedup, containment_pairs,
                                      dedup_clusters, minhash_lsh_candidates,
                                      near_dedup, ngram_jaccard_pairs)

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
spark = (SparkSession.builder.master("local[*]")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
cands = minhash_lsh_candidates(docs, "doc_id", num_perm=8, bands=4)
print(f"LSH candidate pairs: {cands.count()}")

verified = ngram_jaccard_pairs(docs, "doc_id", n=3, threshold=0.2,
                               prefilter=False)
print(f"verified (jaccard >= 0.2) pairs: {verified.count()}")

clusters = dedup_clusters(verified.select("id_a", "id_b"))
clusters.groupBy("cluster").count().orderBy("count", ascending=False) \
    .show(10)

# directed containment: the fragments symmetric Jaccard misses — a short
# doc quoted inside a long one has tiny Jaccard but containment ~1
contained = containment_pairs(docs, "doc_id", threshold=0.7)
print(f"directed containment pairs (C >= 0.7): {contained.count()}")
kept = containment_dedup(docs, "doc_id", threshold=0.7)
print(f"corpus after containment dedup: {kept.count()} / {docs.count()}")

# which copy to keep?  min-id is arbitrary; keep='central' keeps the
# cluster member most similar to the other copies (argmax PageRank over
# the candidate-pair graph) — the template's median variant
central = near_dedup(docs, num_perm=8, bands=4, keep="central")
print(f"corpus after centrality-kept near-dedup: "
      f"{central.count()} / {docs.count()}")
spark.stop()
