"""Round-7 features: the in-memory execution platform (run queries with
NO Spark session — the reference's dual-platform design) and the IVF-PQ
composite ANN index (coarse-cell pruning x residual-PQ compression).

Run: python examples/16_local_platform_and_ivfpq.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cascalog_spark import c, q
from cascalog_spark.sources import ParquetTap

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

# ---------------------------------------------------------------------------
# 1. The in-memory platform: no SparkSession anywhere in this section.
#    Same query API, same planner, pure-Python execution — unit-test your
#    queries in milliseconds, then run them unchanged on the cluster.

FOLLOWS = [("alice", "bob"), ("alice", "carol"), ("bob", "carol"),
           ("carol", "alice"), ("dave", "alice")]

popular = q(["?who", "?n"],
            (FOLLOWS, "_", "?who"),
            (c.count, "?n"),
            (c.gte, "?n", 2))
print("popular (local, no JVM):", sorted(popular.run(platform="local")))

# file taps work too — pyarrow reads the parquet, still no JVM
nations = ParquetTap(path=f"{SF}/nation.parquet")
per_region = q(["?rk", "?n"],
               (nations, {"n_regionkey": "?rk", "n_name": "?nm"}),
               (c.count, "?n"))
print("nations per region (local):",
      sorted(per_region.run(platform="local")))

# ---------------------------------------------------------------------------
# 2. IVF-PQ: the billion-scale ANN layout — now with Spark.

from pyspark.sql import SparkSession  # noqa: E402

spark = (SparkSession.builder.master("local[*]")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

from cascalog_spark.functions import (ann_recall_report,  # noqa: E402
                                      ivfpq_index, ivfpq_topk)

emb = spark.read.parquet(f"{SF}/embeddings.parquet")

# fit once (centroids + residual codebooks are the persistable model),
# encode the corpus to ~32x-compressed codes, probe 4 of 16 cells
cents, books, codes = ivfpq_index(emb, n_centroids=16, m=8, n_codes=16)
query_vec = [float(x) for x in emb.where("vec_id = 0").first()["embedding"]]
print("ivfpq top-5:")
ivfpq_topk(codes, query_vec, cents, books, k=5, n_probe=4).show()

# the tuning report puts pruning loss (ivf) and pruning+compression loss
# (ivfpq) against the same exact ground truth
queries = (emb.orderBy("vec_id").limit(4)
           .select(emb.vec_id.alias("query_id"), "embedding"))
ann_recall_report(emb, queries, k=5, lsh_planes=(), ivf_probes=(2, 4),
                  ivfpq_probes=(2, 4), n_centroids=16).show()

# the same query API can also early-stop PageRank now:
from cascalog_spark.functions import pagerank  # noqa: E402

edges = spark.createDataFrame(FOLLOWS, "src string, dst string")
pr = pagerank(edges, tol=1e-8, iters=50)
print(f"pagerank converged in {pr._pagerank_iters} rounds")
pr.orderBy(pr.rank.desc()).show(3)

spark.stop()
print("OK")
