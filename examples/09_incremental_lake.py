"""Incremental lake ingestion — the round-5 plumbing as one pipeline:

    day-partitioned event stream → micro-batch upsert into a parquet
    lake (dynamic partition overwrite: re-delivered days rewrite
    themselves idempotently) → bucketed fact layout written ONCE →
    zero-Exchange recurring fact-fact join → incremental near-dup index
    append for the docs that arrived today → observe() ingest metrics
    with no extra pass.

Every stage is the 100 TB pattern at toy scale: the lake write costs
one shuffle per day, the recurring join costs none, the dedup index
grows by the batch (never recomputes the corpus).

Run: python examples/09_incremental_lake.py [sf_dir]
"""
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from cascalog_spark.functions.dedup import (exact_substring_dedup_incremental,
                                            exact_substring_index,
                                            minhash_index,
                                            minhash_lsh_candidates_incremental,
                                            semantic_dedup_incremental)
from cascalog_spark.functions.similarity import ivf_centroids
from cascalog_spark.plans import observed_stats
from cascalog_spark.sources import BucketedTap, ParquetTap
from cascalog_spark.streaming import stage_file_batches, write_stream_to_tap

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
spark = (SparkSession.builder.master("local[*]")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
work = tempfile.mkdtemp(prefix="lake09_")

# -- 1. events arrive as micro-batches; day re-delivery must be idempotent
spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
ev = spark.read.parquet(f"{sf_dir}/events.parquet")
if dict(ev.dtypes)["ts"] in ("bigint", "long"):
    ev = ev.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
ev = ev.withColumn("day", F.to_date("ts")).select(
    "event_id", "day", "user_id", "event_type", "value")
days = sorted(r.day for r in ev.select("day").distinct().collect())
d0, d1 = days[0], days[min(1, len(days) - 1)]
b0 = ev.where(F.col("day") == d0)
b1 = ev.where(F.col("day") == d1)
b1_again = b1.withColumn("value", F.round(F.col("value") * 2, 2))  # re-delivery
src = stage_file_batches([b0, b1, b1_again], path=os.path.join(work, "in"))

lake = ParquetTap(path=os.path.join(work, "lake"), partition_by=["day"],
                  sinkmode="update_partitions")
raw = (spark.readStream.schema(b0.schema)
       .option("maxFilesPerTrigger", "1")
       .option("pathGlobFilter", "batch*.parquet").parquet(src))
sq = write_stream_to_tap(raw, lake, checkpoint=os.path.join(work, "ckpt"))
assert sq.awaitTermination(300)
lake_df = spark.read.parquet(lake.path)
n_lake = lake_df.count()
# day d1 holds ONLY the re-delivered version — no duplicate append
assert lake_df.where(F.col("day") == d1).count() == b1.count()
print(f"lake: {n_lake} rows across {len(days[:2])} day partitions; "
      f"re-delivered day rewrote in place")

# -- 2. pay the layout shuffle once: bucketed facts, then a free join
orders = spark.read.parquet(f"{sf_dir}/orders.parquet") \
    .select("o_orderkey", "o_totalprice")
li = spark.read.parquet(f"{sf_dir}/lineitem.parquet") \
    .select("l_orderkey", "l_extendedprice")
t_ord = BucketedTap(table="lake09_orders", path=os.path.join(work, "ord"),
                    bucket_by=["o_orderkey"], n_buckets=8,
                    sinkmode="replace")
t_li = BucketedTap(table="lake09_li", path=os.path.join(work, "li"),
                   bucket_by=["l_orderkey"], n_buckets=8,
                   sinkmode="replace")
t_ord.save_df(orders)
t_li.save_df(li)
spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
joined = t_li.load_df(spark).join(
    t_ord.load_df(spark),
    F.col("l_orderkey") == F.col("o_orderkey"))
joined.count()
plan = joined._jdf.queryExecution().executedPlan().toString()
assert plan.count("Exchange") == 0, "bucketed join must not shuffle"
print(f"bucketed fact-fact join: SortMergeJoin with "
      f"{plan.count('Exchange')} Exchanges (layout paid once at write)")
spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")

# -- 3. incremental dedup, three modalities, corpus never rescanned:
#    near-dup candidates vs the minhash index, duplicated-span removal
#    vs the k-gram anchor index, semantic dedup vs the representatives
docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
standing = docs.where(F.col("doc_id") % 2 == 0)
today = docs.where(F.col("doc_id") % 2 == 1)
idx = minhash_index(standing, "doc_id", num_perm=8, bands=4)
pairs, new_idx = minhash_lsh_candidates_incremental(
    today, idx, "doc_id", num_perm=8, bands=4)
n_pairs = pairs.count()
span_idx = exact_substring_index(standing, k=8)
clean_today, span_idx2 = exact_substring_dedup_incremental(
    today, span_idx, k=8)
n_clean = clean_today.count()
emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
reps = emb.where(F.col("vec_id") % 2 == 0)
newv = emb.where(F.col("vec_id") % 2 == 1)
cents = ivf_centroids(reps, n_centroids=16)
kept_vecs, reps2 = semantic_dedup_incremental(
    newv, reps, threshold=0.35, centroids=cents)
print(f"incremental dedup: {n_pairs} near-dup candidate pairs; "
      f"{n_clean} span-cleaned docs; "
      f"{kept_vecs.count()}/{newv.count()} new vectors kept — "
      f"indexes grow by the batch, corpus never recomputed")

# -- 3b. the same contract as an ALWAYS-ON streaming job: micro-batches
# near-dedup against themselves + the standing representatives index,
# survivors append per-batch (idempotent batch=<id> overwrites)
from cascalog_spark.streaming import (read_ingest_corpus,  # noqa: E402
                                      stream_near_dedup_ingest)

docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
    .select("doc_id", "text", "source")
ing_src = stage_file_batches(
    [docs.where(F.col("doc_id") % 2 == 0),
     docs.where(F.col("doc_id") % 2 == 1)],
    path=os.path.join(work, "ing_src"))
raw = (spark.readStream.schema(docs.schema)
       .option("maxFilesPerTrigger", "1")
       .option("pathGlobFilter", "batch*.parquet").parquet(ing_src))
sq = stream_near_dedup_ingest(
    raw, os.path.join(work, "ing_out"), os.path.join(work, "ing_idx"),
    id_col="doc_id", num_perm=8, bands=4,
    checkpoint_dir=os.path.join(work, "ing_ckpt"))
sq.awaitTermination(240)
kept = read_ingest_corpus(spark, os.path.join(work, "ing_out"))
print(f"streaming ingest: kept {kept.count()}/{docs.count()} docs "
      f"across 2 micro-batches (first-seen representatives)")

# -- 4. observe(): ingest metrics ride the write action itself
gated, obs = observed_stats(
    lake_df, name="ingest",
    rows=F.count(F.lit(1)),
    null_users=F.count(F.when(F.col("user_id").isNull(), 1)),
    max_day=F.max("day"))
gated.write.format("noop").mode("overwrite").save()
print(f"ingest metrics (zero extra pass): {obs.get}")
spark.sql("DROP TABLE IF EXISTS lake09_orders")
spark.sql("DROP TABLE IF EXISTS lake09_li")
spark.stop()
print("ok")
