"""Round-7 session-2 features: behavioral event analytics (funnel /
retention / transitions), novelty gating for continuous ingest, and the
leakage-free train/test split.

The behavioral trio answers the product questions every event stream
gets asked (how far do users get? do cohorts stick? what follows
what?); novelty + leakage_free_split are the two selection gates a
training-data pipeline runs before and after near-dedup.

Run: python examples/17_behavior_and_splits.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

from cascalog_spark.functions import (funnel_report, funnel_stages,
                                      leakage_free_split,
                                      minhash_lsh_candidates,
                                      ngram_novelty,
                                      ngram_novelty_incremental,
                                      novelty_index, retention_cohorts,
                                      transition_matrix)

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

events = (spark.read.parquet(f"{SF}/events.parquet")
          .withColumn("ts", F.col("ts").cast("timestamp")))
docs = spark.read.parquet(f"{SF}/documents.parquet")

# ---------------------------------------------------------------------------
# 1. Funnel: signup -> click -> purchase, strictly ordered, within 1 day
#    of signup.  ONE user-keyed shuffle; k chained window minimums.

STAGES = ["signup", "click", "purchase"]
per_user = funnel_stages(events, "ts", "user_id", "event_type", STAGES,
                         horizon=86400.0)
print("== funnel: per-user progression ==")
per_user.orderBy("user_id").show(5)
print("== funnel: stage conversion report ==")
funnel_report(events, "ts", "user_id", "event_type", STAGES,
              horizon=86400.0).show()

# ---------------------------------------------------------------------------
# 2. Retention triangle (day cohorts) and the event-transition matrix.

print("== retention: day-cohort triangle (head) ==")
(retention_cohorts(events, "ts", "user_id", period="day")
 .orderBy("cohort", "period_offset").show(5))

print("== transitions: what follows what ==")
(transition_matrix(events, "ts", "user_id", "event_type",
                   tie_cols=["event_id"])
 .orderBy(F.col("p").desc()).show(5))

# ---------------------------------------------------------------------------
# 3. Novelty gate: how much of a new crawl batch is text we already
#    hold?  Cheap (shingle join) — run it before paying for near-dedup.

print("== one-shot novelty (first-seen fraction per doc) ==")
ngram_novelty(docs).orderBy("novelty").show(5)

history = docs.where(F.col("doc_id") % 4 != 0)
batch = docs.where(F.col("doc_id") % 4 == 0)
idx = novelty_index(history)
scored, idx2 = ngram_novelty_incremental(batch, idx)
stats = scored.agg(F.round(F.avg("novelty"), 4).alias("mean_novelty"),
                   F.count(F.lit(1)).alias("docs")).first()
print(f"incremental batch: {stats['docs']} docs, "
      f"mean novelty {stats['mean_novelty']} "
      f"(index grew {idx.count()} -> {idx2.count()} shingles)")

# ---------------------------------------------------------------------------
# 4. Leakage-free split: near-dup clusters are the unit of assignment,
#    so a test doc can never have a near-verbatim twin in train.

pairs = minhash_lsh_candidates(docs, "doc_id", num_perm=8, bands=4)
split = leakage_free_split(docs, pairs, {"train": 8, "val": 1, "test": 1})
print("== split sizes (cluster-aware) ==")
split.groupBy("split").count().orderBy("split").show()

# proof: no candidate pair straddles a split boundary
s = split.select("doc_id", "split")
straddle = (pairs
            .join(s.withColumnRenamed("doc_id", "id_a")
                   .withColumnRenamed("split", "sa"), on="id_a")
            .join(s.withColumnRenamed("doc_id", "id_b")
                   .withColumnRenamed("split", "sb"), on="id_b")
            .where(F.col("sa") != F.col("sb")).count())
print("near-dup pairs straddling a split boundary:", straddle)
assert straddle == 0

# ---------------------------------------------------------------------------
# 5. The streaming twins: the same answers maintained continuously.
#    Funnel state folds per micro-batch (reached stages frozen);
#    transition counts merge from |types|^2-sized partials.  Drained
#    state == the one-shot operators exactly (append-ordered batches).

import tempfile

from cascalog_spark.streaming import (read_funnel_state,
                                      stream_funnel_maintenance)
from cascalog_spark.streaming.stream import stage_file_batches

ev2 = events.select("event_id", "ts", "user_id", "event_type")
cut = "2024-01-16"
src = stage_file_batches([ev2.where(F.col("ts") < cut),
                          ev2.where(F.col("ts") >= cut)])
raw = (spark.readStream.schema(ev2.schema)
       .option("maxFilesPerTrigger", "1")
       .option("pathGlobFilter", "batch*.parquet").parquet(src))
base = tempfile.mkdtemp(prefix="ex17_")
sq = stream_funnel_maintenance(raw, f"{base}/fstate", "ts", "user_id",
                               "event_type", STAGES, horizon=86400.0,
                               checkpoint_dir=f"{base}/fckpt")
assert sq.awaitTermination(240)
stream_state = read_funnel_state(spark, f"{base}/fstate")
one_shot = funnel_stages(events, "ts", "user_id", "event_type", STAGES,
                         horizon=86400.0)
assert (sorted(map(tuple, stream_state.collect()))
        == sorted(map(tuple, one_shot.collect())))
print("streaming funnel state == one-shot:", stream_state.count(), "users")

# 6. Predicate-defined stages: mix equality stages with arbitrary
#    per-event conditions (here: only high-value purchases count).

stages_pred = ["signup", "click",
               ("big_purchase", (F.col("event_type") == "purchase")
                & (F.col("value") > 10))]
funnel_report(events, "ts", "user_id", "event_type", stages_pred,
              horizon=86400.0).show()

spark.stop()
print("example 17 OK")
