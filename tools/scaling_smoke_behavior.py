"""Scaling smoke for the behavioral family (funnel_stages /
retention_cohorts / transition_matrix) + ngram_novelty — gated (exits
nonzero on a blown ratio).

8x replication of the sf0.1 tables with DISJOINT key spaces (8x users
for events, 8x doc ids for documents) — shuffle volume grows 8x,
per-key work per user/shingle unchanged:

- funnel/transitions: one user-keyed Exchange + windows, linear in
  events; a per-user buffer materialization or a second exchange per
  stage would push the ratio toward linear-or-worse.
- retention: window + distinct-count aggregate, linear.
- novelty: shingle-keyed groupBy + key-reusing join, linear in distinct
  (doc, shingle) pairs (the 8x copies have disjoint ids so the pair
  table really is 8x).

Gate: wall(8x)/wall(1x) <= 6 on fixed cores for each op (at these
sizes fixed plan/driver cost still amortizes; a quadratic blowup reads
8+).

Run: python tools/scaling_smoke_behavior.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession, functions as F

SF = "/root/testdata/sf0.1"
GATE = 6.0
STAGES = ["signup", "click", "purchase"]

spark = (SparkSession.builder.master("local[32]")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.driver.memory", "48g")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

from cascalog_spark.functions import (funnel_stages,  # noqa: E402
                                      ngram_novelty,
                                      retention_cohorts,
                                      transition_matrix)

ev1 = (spark.read.parquet(f"{SF}/events.parquet")
       .withColumn("ts", F.col("ts").cast("timestamp")).persist())
docs1 = spark.read.parquet(f"{SF}/documents.parquet").persist()
n_ev, n_docs = ev1.count(), docs1.count()

ev8 = ev1
docs8 = docs1
for i in range(1, 8):
    ev8 = ev8.unionByName(
        ev1.withColumn("user_id", F.col("user_id") + F.lit(i * 10_000))
           .withColumn("event_id", F.col("event_id") + F.lit(i * 10_000_000)))
    docs8 = docs8.unionByName(
        docs1.withColumn("doc_id", F.col("doc_id") + F.lit(i * 10_000_000)))
ev8 = ev8.persist()
docs8 = docs8.persist()
print("rows:", n_ev, "->", ev8.count(), "/", n_docs, "->", docs8.count())


def wall(fn, *args, **kw):
    t0 = time.time()
    fn(*args, **kw).write.format("noop").mode("overwrite").save()
    return time.time() - t0


OPS = {
    "funnel": lambda df: funnel_stages(df, "ts", "user_id", "event_type",
                                       STAGES, horizon=86400.0),
    "retention": lambda df: retention_cohorts(df, "ts", "user_id", "day"),
    "transitions": lambda df: transition_matrix(
        df, "ts", "user_id", "event_type", tie_cols=["event_id"]),
}

fail = False
for name, op in OPS.items():
    wall(op, ev1)  # warm
    w1 = min(wall(op, ev1) for _ in range(2))
    w8 = min(wall(op, ev8) for _ in range(2))
    r = w8 / max(w1, 1e-9)
    print(f"{name}: 1x={w1:.2f}s 8x={w8:.2f}s ratio={r:.2f}")
    if r > GATE:
        print(f"GATE BLOWN: {name} ratio {r:.2f} > {GATE}")
        fail = True

wall(ngram_novelty, docs1)  # warm
w1 = min(wall(ngram_novelty, docs1) for _ in range(2))
w8 = min(wall(ngram_novelty, docs8) for _ in range(2))
r = w8 / max(w1, 1e-9)
print(f"novelty: 1x={w1:.2f}s 8x={w8:.2f}s ratio={r:.2f}")
if r > GATE:
    print(f"GATE BLOWN: novelty ratio {r:.2f} > {GATE}")
    fail = True

sys.exit(1 if fail else 0)
