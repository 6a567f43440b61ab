"""Similarity search over embeddings: brute-force baseline vs IVF with a
persisted partition-pruned index.

Run: python examples/03_ann_search.py [sf_dir]
"""
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from cascalog_spark.functions.similarity import (brute_force_topk,
                                                 ivf_query_index,
                                                 ivf_write_index)

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
spark = (SparkSession.builder.master("local[*]")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
qvec = [float(x) for x in
        emb.where(F.col("vec_id") == 7).select("embedding").first()[0]]

print("exact top-5:")
brute_force_topk(emb, qvec, k=5).show()

with tempfile.TemporaryDirectory() as d:
    path = os.path.join(d, "ivf")
    cents = ivf_write_index(emb, path, n_centroids=16)
    print("IVF top-5 (probing 4/16 cells — partition-pruned scan):")
    ivf_query_index(spark, path, cents, qvec, k=5, n_probe=4).show()
spark.stop()
