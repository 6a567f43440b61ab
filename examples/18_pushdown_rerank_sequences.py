"""Round-8 features end-to-end: cross-query pushdown below the fan-out
persist, IVF-PQ two-stage retrieval (ADC shortlist -> exact rerank),
skew-safe behavioral formulations, and k-order event-sequence patterns
(batch + streaming).

Run: python examples/18_pushdown_rerank_sequences.py
"""
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

from cascalog_spark import c, execute, q

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

# 1. Cross-query filter pushdown below the fan-out persist — the
#    reference's own declared unfinished priority (README.md:63-66).
#    TWO sinks share one expensive subquery; because BOTH filter it,
#    the persisted cache materializes only (o_totalprice < 5000 OR
#    o_totalprice > 200000) rows — check the InMemoryRelation.

orders = spark.read.parquet(f"{SF}/orders.parquet")
shared = q(["?ok", "?price"],
           (orders, {"o_orderkey": "?ok", "o_totalprice": "?price"}))
cheap = q(["?ok"], (shared, "?ok", "?price"), (c.lt, "?price", 5000.0))
big = q(["?ok"], (shared, "?ok", "?price"), (c.gt, "?price", 200000.0))
counts = {}
plans = []


def sink(name):
    def s(df):
        plans.append(df._jdf.queryExecution().optimizedPlan().toString())
        counts[name] = df.count()
    return s


execute(spark, (cheap, sink("cheap")), (big, sink("big")))
cached = plans[0][plans[0].index("InMemoryRelation"):]
assert " OR " in cached, "pushed disjunction missing"
# the disjunction travels all the way into the parquet reader
assert "Or(LessThan(o_totalprice" in cached, "OR not in PushedFilters"
print("pushdown: cheap", counts["cheap"], "big", counts["big"],
      "- cache holds only the OR of both filters, pushed to parquet")

# 2. IVF-PQ two-stage retrieval: ADC top-(k*r) shortlist, exact cosine
#    rescore of just those rows. Recall jumps toward exact at ADC cost.

from cascalog_spark.functions import (ann_recall_report, event_ngrams,
                                      funnel_stages, ivfpq_index)
from cascalog_spark.functions.pq import ivfpq_topk

emb = spark.read.parquet(f"{SF}/embeddings.parquet")
cents, books, codes = ivfpq_index(emb, n_centroids=16, m=8, n_codes=16)
qvec = [float(x) for x in emb.orderBy("vec_id").first()["embedding"]]
adc = ivfpq_topk(codes, qvec, cents, books, k=5, n_probe=4)
rr = ivfpq_topk(codes, qvec, cents, books, k=5, n_probe=4,
                rerank=4, vectors=emb)
print("ADC top-5:   ", [(r[0], r[1]) for r in adc.collect()])
print("rerank top-5:", [(r[0], r[1]) for r in rr.collect()])

qs8 = (emb.orderBy(F.col("vec_id").asc()).limit(8)
       .select(F.col("vec_id").alias("query_id"), "embedding"))
rep = {(r["method"], r["param"]): r["recall_at_k"]
       for r in ann_recall_report(
           emb, qs8, k=10, lsh_planes=(), ivf_probes=(),
           ivfpq_probes=(2,), ivfpq_rerank=5, centroids=cents,
           ivfpq_codebooks=books).collect()}
print(f"recall@10 at n_probe=2: ADC {rep[('ivfpq', 2)]}"
      f" -> rerank {rep[('ivfpq_rr', 2)]}")
assert rep[("ivfpq_rr", 2)] >= rep[("ivfpq", 2)]

# 3. Skew-safe funnel: identical results via hash aggregates +
#    AQE-splittable joins (for corpora where bot users dominate).

events = (spark.read.parquet(f"{SF}/events.parquet")
          .withColumn("ts", F.col("ts").cast("timestamp")))
STAGES = ["signup", "click", "purchase"]
w = funnel_stages(events, "ts", "user_id", "event_type", STAGES,
                  horizon=86400.0)
s = funnel_stages(events, "ts", "user_id", "event_type", STAGES,
                  horizon=86400.0, skew_safe=True)
assert sorted(map(tuple, w.collect())) == sorted(map(tuple, s.collect()))
print("skew_safe funnel == window funnel:", w.count(), "users")

# 4. k-order sequence patterns: trigrams of consecutive event types,
#    batch and STREAMING (suffix-state straddle fold) — same counts.

tri = event_ngrams(events, "ts", "user_id", "event_type", n=3,
                   tie_cols=["event_id"])
top = tri.orderBy(F.col("n_events").desc(), "gram").limit(5)
print("top trigram paths:")
top.show(truncate=False)

from cascalog_spark.streaming import (read_ngram_counts,
                                      stream_ngram_maintenance)
from cascalog_spark.streaming.stream import stage_file_batches

ev2 = events.select("event_id", "ts", "user_id", "event_type")
cut = "2024-01-16"
src = stage_file_batches([ev2.where(F.col("ts") < cut),
                          ev2.where(F.col("ts") >= cut)])
raw = (spark.readStream.schema(ev2.schema)
       .option("maxFilesPerTrigger", "1")
       .option("pathGlobFilter", "batch*.parquet").parquet(src))
base = tempfile.mkdtemp(prefix="ex18_")
sq = stream_ngram_maintenance(raw, f"{base}/agg", f"{base}/state",
                              "ts", "user_id", "event_type", n=3,
                              tie_cols=["event_id"],
                              checkpoint_dir=f"{base}/ckpt")
assert sq.awaitTermination(240)
streamed = read_ngram_counts(spark, f"{base}/agg")
assert (sorted(map(tuple, streamed.collect()))
        == sorted(map(tuple, tri.collect())))
print("streaming trigram fold == one-shot:", streamed.count(), "grams")

spark.stop()
print("example 18 OK")
