"""Embedding-model training-data pipeline — the thirteenth-wave
operators as one flow:

    corpus → cluster map (know your embedding space) → LSH blocking
    quality check (measure, don't guess) → contrastive triplet mining
    (anchors/positives from near-dups, deterministic negatives) →
    curriculum staging by document quality → per-stage shuffled export.

Every stage is the 100 TB pattern at toy scale: clustering is one
native expression pass; the quality report full-joins two bounded pair
sets; mining adds two range-bin rank windows; staging ranks without a
single-partition sort; the export shuffle is deterministic.

Run: python examples/13_embedding_training_data.py [sf_dir]
"""
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from cascalog_spark.functions import (cluster_profile, curriculum_stages,
                                      dedup_quality_report,
                                      mine_contrastive_pairs,
                                      write_shuffled)
from cascalog_spark.functions.text import quality_score

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
spark = (SparkSession.builder.master("local[*]")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
work = tempfile.mkdtemp(prefix="embtrain13_")

docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

# 1) cluster map of the embedding space (per-cluster mass + cohesion)
cluster_profile(emb, n_clusters=8).orderBy("cluster").show()

# 2) is the LSH blocking good enough to mine from?  measure it
q = dedup_quality_report(docs, threshold=0.8, num_perm=8, bands=4,
                         prefilter=False).first()
print(f"LSH blocking: precision={q['precision']} recall={q['recall']} "
      f"(candidates={q['n_candidates']}, truth={q['n_truth']})")
assert q["recall"] >= 0.5, "blocking misses too many true pairs"

# 3) mine contrastive triplets (deterministic under seed+partitioning)
triplets = mine_contrastive_pairs(docs, num_perm=8, bands=4)
print(f"mined {triplets.count()} (anchor, positive, negative) triplets")
triplets.show(5)

# 4) curriculum: stage documents easy→hard by quality score
scored = quality_score(docs)
staged = curriculum_stages(scored, "quality", n_stages=3,
                           ascending=False)  # best-quality first
staged.groupBy("stage").count().orderBy("stage").show()

# 5) per-stage shuffled export for the training loader
for stage in range(3):
    write_shuffled(staged.where(F.col("stage") == stage)
                   .select("doc_id", "text"),
                   f"{work}/stage={stage}", id_col="doc_id",
                   n_files=4, seed=stage)
print("exported under", work)
