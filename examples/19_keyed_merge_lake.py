"""Round-9 features end-to-end: the keyed MERGE/upsert lake table —
whole-table crash-safe merge, the broadcast no-target-shuffle plan,
partition-pruned merge for the 100 TB case, and the StateDir crash
contract it shares with the streaming compactors.

Run: python examples/19_keyed_merge_lake.py
"""
import glob
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

from cascalog_spark.operators import MergeTap, merge_frames, merge_into

work = tempfile.mkdtemp(prefix="example19_")
orders = spark.read.parquet(f"{SF}/orders.parquet").select(
    "o_orderkey", "o_orderstatus", "o_totalprice")

# 1. A standing keyed table: bootstrap, upsert, keyed delete ---------------
tbl = os.path.join(work, "orders_lake")
tap = MergeTap(tbl, on="o_orderkey")
# deterministic key-predicate subsets (limit() without an ordering is
# not a stable row set): base keys are a strict subset of update keys,
# so every base row updates and the remainder inserts
merge_into(spark, tbl, orders.where(F.col("o_orderkey") % 4 == 0),
           "o_orderkey")
n0 = tap.to_df(spark).count()

upd = (orders.where(F.col("o_orderkey") % 4 <= 1)
       .withColumn("o_orderstatus", F.lit("M")))
nu = upd.count()
tap.merge(spark, upd)
n1 = tap.to_df(spark).count()
assert n1 == nu, (n1, nu)
print(f"1. upsert: {n0} rows -> {n1} ({n0} updated in place, "
      f"{n1 - n0} inserted)")

tomb = tap.to_df(spark).where(F.col("o_orderkey") % 2 == 0) \
    .select("o_orderkey", "o_orderstatus", "o_totalprice")
tap.merge(spark, tomb, when_matched="delete", when_not_matched="ignore")
print(f"   keyed delete: -> {tap.to_df(spark).count()} rows")

# 2. The broadcast strategy never shuffles the target ----------------------
m = merge_frames(orders, upd.limit(10), "o_orderkey",
                 strategy="broadcast", validate=False)
plan = m._jdf.queryExecution().executedPlan().toString()
kept_half = plan.split("BroadcastHashJoin")[0]
assert "Exchange" not in kept_half
print("2. broadcast merge plan: BroadcastHashJoin, zero Exchange on the "
      "table side (insert anti-join reads key columns only)")

# 3. Partition-pruned merge: only touched partitions are rewritten ---------
ptbl = os.path.join(work, "orders_by_bucket")
base = orders.withColumn("part",
                         (F.col("o_orderkey") % 4).cast("int"))
merge_into(spark, ptbl, base, ["o_orderkey", "part"],
           partition_by="part")
before = sorted(glob.glob(f"{ptbl}/part=2/*.parquet"))
hot = (base.where(F.col("part") == 1)
       .withColumn("o_totalprice", F.round(F.col("o_totalprice") * 2, 2)))
merge_into(spark, ptbl, hot, ["o_orderkey", "part"],
           partition_by="part")
after = sorted(glob.glob(f"{ptbl}/part=2/*.parquet"))
assert before == after  # untouched partition's files never rewritten
print("3. partition-pruned merge: only part=1 read + rewritten; "
      "part=0/2/3 files untouched")

# 4. Crash contract (StateDir): a wedged swap is loud, replay recovers -----
import shutil

from cascalog_spark.streaming import StateDir

shutil.copytree(tbl, tbl + ".compact.old")
shutil.rmtree(tbl)
try:
    tap.to_df(spark)
    raise AssertionError("crashed state must not read as empty")
except RuntimeError as e:
    print(f"4. crashed swap is loud: {str(e)[:60]}...")
StateDir(tbl, "merge_into").recover()
print(f"   recover() restored {tap.to_df(spark).count()} rows")

# 5. CDC: a change feed folds with latest-per-key-wins sequencing -----------
from cascalog_spark.operators import apply_changes_into

cdc = os.path.join(work, "cdc_tbl")
feed1 = spark.createDataFrame(
    [(1, 10.0, "I", 1), (2, 20.0, "I", 1)],
    "k int, v double, op string, seq int")
apply_changes_into(spark, cdc, feed1, "k", seq_col="seq")
feed2 = spark.createDataFrame(
    [(1, 99.0, "U", 2), (1, None, "D", 1),   # stale delete loses to U
     (2, None, "D", 2), (3, 30.0, "I", 2)],
    "k int, v double, op string, seq int")
apply_changes_into(spark, cdc, feed2, "k", seq_col="seq")
rows = sorted(map(tuple, spark.read.parquet(cdc).collect()))
assert rows == [(1, 99.0), (3, 30.0)], rows
print("5. CDC apply: stale delete lost to the later update, live delete "
      "removed, insert landed ->", rows)

# replay the same batch: value-absolute fold is idempotent (the crash
# recovery story — rerun, don't reconcile)
apply_changes_into(spark, cdc, feed2, "k", seq_col="seq")
assert sorted(map(tuple, spark.read.parquet(cdc).collect())) == rows
print("   replaying the batch is a no-op (crash recovery = rerun)")

# 6. OPTIMIZE: bin-pack merge-accumulated small files, Z-order cluster ----
from cascalog_spark.operators import optimize_table

frag = os.path.join(work, "frag_tbl")
orders.limit(4000).repartition(40).write.parquet(frag)
rep = optimize_table(spark, frag, target_file_mb=64,
                     zorder_by=["o_orderkey", "o_totalprice"])
print(f"6. OPTIMIZE ZORDER: {rep['files_before']} files -> "
      f"{rep['files_after']} (rows bit-identical, min/max prunable on "
      f"both clustered columns)")

# 7. (r10) File-level data skipping: merge touches files, not the table
fp = os.path.join(work, "orders_file_pruned")
orders.where(F.col("o_orderkey") % 10 < 8).write.parquet(fp)
optimize_table(spark, fp, target_file_mb=1, zorder_by=["o_orderkey"],
               min_files=8)  # narrow per-file key ranges
lo = orders.agg(F.min("o_orderkey")).first()[0]
small = (orders.where((F.col("o_orderkey") % 10 >= 5)
                      & (F.col("o_orderkey") <= lo + 999))
         .withColumn("o_orderstatus", F.lit("M")))
rep = merge_into(spark, fp, small, "o_orderkey", file_prune=True)
assert rep["files_linked"] >= 1, rep
print(f"7. file-pruned merge: {rep['files_touched']} of "
      f"{rep['files_total']} files rewritten, {rep['files_linked']} "
      f"hard-linked through byte-identical")

# 8. (r10) Time-travel: retained generations + restore
from cascalog_spark.operators import MergeTap as _MT

gt = os.path.join(work, "orders_gen")
gtap = _MT(gt, on="o_orderkey", retain=2)
gtap.merge(spark, orders.where(F.col("o_orderkey") % 4 == 0))
n_before = gtap.to_df(spark).count()
gtap.merge(spark, orders.where(F.col("o_orderkey") % 4 <= 1)
           .withColumn("o_orderstatus", F.lit("M")))
assert gtap.generations(), "merge should have snapshotted"
gtap.restore()  # roll back the last merge (hard-link copy, no data moved)
assert gtap.to_df(spark).count() == n_before
print(f"8. time-travel: generation snapshot + restore -> {n_before} "
      f"rows again (generations = {gtap.generations()})")

spark.stop()
print("example 19 OK")
