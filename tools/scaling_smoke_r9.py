"""Round-9 scaling smokes — gated (exits nonzero on a blown ratio).

1. ngram_novelty at 64x (the r8 verdict's least-headroom family: the
   8x ratio measured 4.69 against a gate of 6).  64x docs with
   disjoint id spaces: the distinct-(shingle,doc) pass and the
   shingle-keyed min-owner join both scale with corpus shingles, so
   the MARGINAL ratio wall(64x)/wall(8x) must stay linear-ish.
   Gate: marginal <= 12 (8x more data; linear ~8, quadratic ~64 —
   same rationale as the behavior 64x gate).

2. embedding_drift_report at 8x (no smoke existed): one combined
   stats aggregate + one exploded (kind,key) groupBy per side — all
   linear, and at sf0.1 sizes fixed driver cost dominates, so the 8x
   ratio must sit far below linear.  Gate: wall(8x)/wall(1x) <= 4
   (the ann_recall_report rationale: a per-metric re-scan regression
   pushes it toward 8+).

Run: python tools/scaling_smoke_r9.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession, functions as F

SF = "/root/testdata/sf0.1"
GATE_NOVELTY_MARGINAL = 12.0
GATE_DRIFT_8X = 4.0

spark = (SparkSession.builder.master("local[32]")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.driver.memory", "48g")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

from cascalog_spark.functions import (embedding_drift_report,  # noqa: E402
                                      ngram_novelty)

docs1 = spark.read.parquet(f"{SF}/documents.parquet").persist()
emb1 = spark.read.parquet(f"{SF}/embeddings.parquet").persist()
n_docs, n_emb = docs1.count(), emb1.count()


def rep_docs(n):
    return (docs1.withColumn("__rep", F.explode(
        F.sequence(F.lit(0), F.lit(n - 1))))
        .withColumn("doc_id",
                    F.col("doc_id") + F.col("__rep") * 10_000_000)
        .drop("__rep"))


docs8 = rep_docs(8).repartition(32).persist()
docs64 = rep_docs(64).repartition(64).persist()
emb8 = (emb1.withColumn("__rep", F.explode(
    F.sequence(F.lit(0), F.lit(7))))
    .withColumn("vec_id", F.col("vec_id") + F.col("__rep") * 10_000_000)
    .drop("__rep").repartition(32).persist())
print("docs:", n_docs, "-> 8x", docs8.count(), "/ 64x", docs64.count(),
      "; emb:", n_emb, "-> 8x", emb8.count())


def wall(fn):
    t0 = time.time()
    fn().write.format("noop").mode("overwrite").save()
    return time.time() - t0


fail = False

# --- novelty 64x -----------------------------------------------------------
nov = lambda df: ngram_novelty(df)  # noqa: E731
wall(lambda: nov(docs1))  # warm
w1 = min(wall(lambda: nov(docs1)) for _ in range(2))
w8 = min(wall(lambda: nov(docs8)) for _ in range(2))
w64 = min(wall(lambda: nov(docs64)) for _ in range(2))
r8, r64 = w8 / max(w1, 1e-9), w64 / max(w8, 1e-9)
print(f"novelty: 1x={w1:.2f}s 8x={w8:.2f}s ({r8:.2f}x) "
      f"64x={w64:.2f}s (marginal {r64:.2f}x vs 8x)")
if r64 > GATE_NOVELTY_MARGINAL:
    print(f"GATE BLOWN: novelty 64x marginal {r64:.2f} > "
          f"{GATE_NOVELTY_MARGINAL}")
    fail = True

# --- drift 8x ---------------------------------------------------------------


def drift(df):
    return embedding_drift_report(df.where(F.col("vec_id") % 2 == 0),
                                  df.where(F.col("vec_id") % 2 == 1))


wall(lambda: drift(emb1))  # warm
d1 = min(wall(lambda: drift(emb1)) for _ in range(2))
d8 = min(wall(lambda: drift(emb8)) for _ in range(2))
rd = d8 / max(d1, 1e-9)
print(f"drift: 1x={d1:.2f}s 8x={d8:.2f}s ratio={rd:.2f}")
if rd > GATE_DRIFT_8X:
    print(f"GATE BLOWN: drift 8x ratio {rd:.2f} > {GATE_DRIFT_8X}")
    fail = True

sys.exit(1 if fail else 0)
