"""Round-10 scaling smoke — gated (exits nonzero on a blown ratio).

Partition-pruned merge: per-batch cost must track the TOUCHED
partitions, not the table size.  Two standing hive-partitioned tables
hold the same orders rows replicated 1x (8 partitions) and 8x (64
partitions, each partition the SAME size as in the 1x table); the
identical single-partition update batch folds into both via
``merge_into(partition_by=)``.  With pruning, both merges read and
rewrite one same-sized partition, so wall(8x)/wall(1x) must stay near
1; an accidental whole-table path pushes it toward 8.
Gate: wall(8x table)/wall(1x table) <= 3.

Run: python tools/scaling_smoke_r10.py
"""
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession, functions as F

SF = "/root/testdata/sf0.1"
GATE_PRUNED_MERGE_8X = 3.0

spark = (SparkSession.builder.master("local[32]")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.driver.memory", "48g")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

from cascalog_spark.operators import merge_into  # noqa: E402

orders = (spark.read.parquet(f"{SF}/orders.parquet")
          .select("o_orderkey", "o_totalprice").persist())
n0 = orders.count()
work = tempfile.mkdtemp(prefix="smoke_r10_")


def build(nrep: int, path: str) -> None:
    df = (orders.withColumn("__rep", F.explode(
        F.sequence(F.lit(0), F.lit(nrep - 1))))
        .select((F.col("o_orderkey")
                 + F.col("__rep") * 10_000_000).alias("k"),
                ((F.col("o_orderkey") % 8)
                 + F.col("__rep") * 8).cast("int").alias("part"),
                F.col("o_totalprice").alias("v")))
    merge_into(spark, path, df, ["k", "part"], partition_by="part",
               validate=False)


def batch():
    # touches ONLY part=1 (rep 0), same content for both tables
    return (orders.where((F.col("o_orderkey") % 8 == 1)
                         & (F.col("o_orderkey") % 10 == 5))
            .select(F.col("o_orderkey").alias("k"),
                    F.lit(1).cast("int").alias("part"),
                    F.round(F.col("o_totalprice") * 2, 2).alias("v")))


def timed_merge(path: str) -> float:
    best = float("inf")
    for _ in range(2):  # replay is idempotent -> safe to re-time
        t0 = time.time()
        merge_into(spark, path, batch(), ["k", "part"],
                   partition_by="part")
        best = min(best, time.time() - t0)
    return best


t1_dir, t8_dir = f"{work}/t1", f"{work}/t8"
build(1, t1_dir)
build(8, t8_dir)
print(f"tables built: 1x = {n0} rows / 8 partitions, "
      f"8x = {8 * n0} rows / 64 partitions")

w1 = timed_merge(t1_dir)
w8 = timed_merge(t8_dir)
ratio = w8 / max(w1, 1e-9)
print(f"pruned merge wall: 1x-table {w1:.2f}s, 8x-table {w8:.2f}s "
      f"-> ratio {ratio:.2f} (gate {GATE_PRUNED_MERGE_8X})")

ok = ratio <= GATE_PRUNED_MERGE_8X
print("SMOKE r10:", "PASS" if ok else "FAIL")
spark.stop()
sys.exit(0 if ok else 1)
