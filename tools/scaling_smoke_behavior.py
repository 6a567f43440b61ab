"""Scaling smoke for the behavioral family (funnel_stages /
retention_cohorts / transition_matrix) + ngram_novelty — gated (exits
nonzero on a blown ratio).

Three axes:

1. 8x replication of the sf0.1 tables with DISJOINT key spaces (8x
   users for events, 8x doc ids for documents) — shuffle volume grows
   8x, per-key work per user/shingle unchanged.  Gate: wall(8x)/wall(1x)
   <= 6 per op.
2. 64x events (r8, like the r6 graph smoke): the behavior ops are the
   newest shuffle shapes in the repo — funnel must stay one Exchange +
   k streaming windows, retention 2 shuffles, transitions 1 shuffle +
   |types|^2 agg, all linear.  Gate: the MARGINAL ratio
   wall(64x)/wall(8x) <= 12 — 8x more data, so linear reads ~8 and a
   quadratic shape reads ~64.  (The 1x wall is fixed-cost dominated:
   measured r8 curve funnel 0.70/0.74/2.19s, retention
   0.42/0.70/2.86s, transitions 0.50/0.73/5.78s at 1x/8x/64x — the
   8x->64x slopes are 3.0/4.1/7.9, all linear-or-better, while a
   64x/1x gate would just measure how small the fixed cost is.)
3. SKEWED 8x (r8): one bot user holding ~10% of all events — the
   window partition AQE cannot split.  Gate: wall(skewed 8x) /
   wall(uniform 8x) <= 3 for the default paths (the sorts spill and
   straggle but must not collapse), and the skew_safe=True variants
   (hash-aggregate formulation, tools for corpora where bots dominate)
   are timed alongside for the PLANS.md receipt.

Run: python tools/scaling_smoke_behavior.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession, functions as F

SF = "/root/testdata/sf0.1"
GATE8 = 6.0
GATE64_MARGINAL = 12.0  # 64x vs 8x: 8x more rows; linear ~8
GATE_SKEW = 3.0
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
U = ev1.agg(F.max("user_id")).first()[0] + 1
E = ev1.agg(F.max("event_id")).first()[0] + 1


def replicate(df, n):
    """n disjoint copies via one explode (no n-branch union plan)."""
    return (df.withColumn("__rep", F.explode(
        F.sequence(F.lit(0), F.lit(n - 1))))
        .withColumn("user_id", F.col("user_id") + F.col("__rep") * U)
        .withColumn("event_id", F.col("event_id") + F.col("__rep") * E)
        .drop("__rep"))


ev8 = replicate(ev1, 8).persist()
ev64 = replicate(ev1, 64).persist()
# skewed 8x: ~10% of all events collapse onto one bot user
evskew = (ev8.withColumn(
    "user_id",
    F.when(F.pmod(F.col("event_id"), F.lit(10)) == 0, F.lit(0))
    .otherwise(F.col("user_id")))).persist()

docs8 = docs1
for i in range(1, 8):
    docs8 = docs8.unionByName(
        docs1.withColumn("doc_id", F.col("doc_id") + F.lit(i * 10_000_000)))
docs8 = docs8.persist()
print("rows:", n_ev, "-> 8x", ev8.count(), "/ 64x", ev64.count(),
      "/ skew", evskew.count(), "/ docs", n_docs, "->", docs8.count())


def wall(fn, *args, **kw):
    t0 = time.time()
    fn(*args, **kw).write.format("noop").mode("overwrite").save()
    return time.time() - t0


OPS = {
    "funnel": lambda df, **kw: funnel_stages(
        df, "ts", "user_id", "event_type", STAGES, horizon=86400.0, **kw),
    "retention": lambda df, **kw: retention_cohorts(
        df, "ts", "user_id", "day", **kw),
    "transitions": lambda df, **kw: transition_matrix(
        df, "ts", "user_id", "event_type", tie_cols=["event_id"], **kw),
}

fail = False
for name, op in OPS.items():
    wall(op, ev1)  # warm
    w1 = min(wall(op, ev1) for _ in range(2))
    w8 = min(wall(op, ev8) for _ in range(2))
    w64 = min(wall(op, ev64) for _ in range(2))
    r8, r64 = w8 / max(w1, 1e-9), w64 / max(w8, 1e-9)
    print(f"{name}: 1x={w1:.2f}s 8x={w8:.2f}s ({r8:.2f}x) "
          f"64x={w64:.2f}s (marginal {r64:.2f}x vs 8x)")
    if r8 > GATE8:
        print(f"GATE BLOWN: {name} 8x ratio {r8:.2f} > {GATE8}")
        fail = True
    if r64 > GATE64_MARGINAL:
        print(f"GATE BLOWN: {name} 64x marginal ratio {r64:.2f} > "
              f"{GATE64_MARGINAL}")
        fail = True
    # skewed 8x vs uniform 8x (default path must straggle, not collapse)
    wsk = min(wall(op, evskew) for _ in range(2))
    rs = wsk / max(w8, 1e-9)
    line = f"{name} skewed8x: {wsk:.2f}s ({rs:.2f}x vs uniform 8x)"
    if name in ("funnel", "retention"):
        wss = min(wall(op, evskew, skew_safe=True) for _ in range(2))
        line += f"  skew_safe: {wss:.2f}s"
    print(line)
    if rs > GATE_SKEW:
        print(f"GATE BLOWN: {name} skewed ratio {rs:.2f} > {GATE_SKEW}")
        fail = True

wall(ngram_novelty, docs1)  # warm
w1 = min(wall(ngram_novelty, docs1) for _ in range(2))
w8 = min(wall(ngram_novelty, docs8) for _ in range(2))
r = w8 / max(w1, 1e-9)
print(f"novelty: 1x={w1:.2f}s 8x={w8:.2f}s ratio={r:.2f}")
if r > GATE8:
    print(f"GATE BLOWN: novelty ratio {r:.2f} > {GATE8}")
    fail = True

sys.exit(1 if fail else 0)
