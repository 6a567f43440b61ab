"""Scaling smoke for graph.pagerank — gated (exits nonzero on a blown
ratio).

8x replication of the sf0.1 minhash near-dup graph with disjoint node
id spaces (8 identical components — per-iteration shuffle volume grows
8x, topology per component unchanged).  PageRank's cost is
iters x (edge-join shuffle + node-sized aggregate), all linear in
|E|+|V|; at these sizes the fixed driver part (plan analysis per
iteration) dominates, so the 8x wall ratio must stay far below linear.

Gate: wall(8x)/wall(1x) <= 4 on fixed cores (a quadratic edge blowup
or per-iteration recompute regression pushes it toward 8+).

Run: python tools/scaling_smoke_graph.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession, functions as F

SF = "/root/testdata/sf0.1"

spark = (SparkSession.builder.master("local[32]")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.driver.memory", "48g")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

from cascalog_spark.functions import (minhash_lsh_candidates,  # noqa: E402
                                      pagerank,
                                      release_pagerank_cache)

docs = spark.read.parquet(f"{SF}/documents.parquet")
pairs = (minhash_lsh_candidates(docs, "doc_id", num_perm=8, bands=4)
         .persist())
nodes = docs.select("doc_id").persist()
pairs.count(), nodes.count()

big_pairs = pairs
big_nodes = nodes
for i in range(1, 8):
    off = F.lit(i * 10_000_000)
    big_pairs = big_pairs.unionByName(
        pairs.select((F.col("id_a") + off).alias("id_a"),
                     (F.col("id_b") + off).alias("id_b")))
    big_nodes = big_nodes.unionByName(
        nodes.select((F.col("doc_id") + off).alias("doc_id")))
big_pairs = big_pairs.repartition(32).persist()
big_nodes = big_nodes.repartition(32).persist()
big_pairs.count(), big_nodes.count()


def run(p, n):
    pr = pagerank(p, src_col="id_a", dst_col="id_b", nodes=n,
                  iters=5, undirected=True)
    pr.write.format("noop").mode("overwrite").save()
    release_pagerank_cache(pr)


def best_of(fn, *args, n=2):
    best = None
    for _ in range(n):
        t0 = time.perf_counter()
        fn(*args)
        el = time.perf_counter() - t0
        best = el if best is None else min(best, el)
    return best


run(pairs, nodes)  # warm (codegen/JIT)
t1 = best_of(run, pairs, nodes)
t8 = best_of(run, big_pairs, big_nodes)
ratio = t8 / t1
print(f"pagerank 5 iters: 1x {t1:.2f}s, 8x {t8:.2f}s, ratio {ratio:.2f}")
if ratio > 4:
    print("GATE BLOWN: pagerank scaling ratio > 4")
    sys.exit(1)
print("scaling smoke (graph): OK")
