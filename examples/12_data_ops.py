"""Data-ops control loop — the tenth-wave operators as one pipeline:

    ingest batch → expectation gate (one-pass rule report) → fold into
    the standing materialized rollup (history never rescanned; HLL +
    t-digest ride along) → drift check vs the previous batch's value
    distribution (PSI) → order-invariant dataset fingerprint recorded
    for reproducibility → padded-batch geometry report for the
    training loader.

Every stage is the 100 TB pattern at toy scale: the gate and the
fingerprint are each ONE aggregate pass; the rollup fold reads only
the delta + the standing aggregate; PSI shuffles ≤ bins rows per side.

Run: python examples/12_data_ops.py [sf_dir]
"""
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from cascalog_spark.functions import (aggregate_rollup, check_expectations,
                                      dataset_fingerprint,
                                      incremental_rollup, length_buckets,
                                      psi_report, tdigest_quantile_col)
from cascalog_spark.functions.text import token_count

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
spark = (SparkSession.builder.master("local[*]")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
work = tempfile.mkdtemp(prefix="dataops12_")

ev = spark.read.parquet(f"{sf_dir}/events.parquet")
hist = ev.where(F.col("ts") < "2024-01-25")
delta = ev.where(F.col("ts") >= "2024-01-25")

# 1) gate the incoming batch before it touches anything downstream
gate = check_expectations(delta, {
    "value_positive": F.col("value") > 0,
    "known_type": "event_type IN ('click','view','purchase',"
                  "'signup','error')",
    "user_present": F.col("user_id").isNotNull(),
})
gate.show(truncate=False)
assert gate.where("NOT passed").count() == 0, "batch failed the gate"

# 2) fold the gated batch into the standing rollup (the standing
#    aggregate would live in parquet between runs; localCheckpoint
#    stands in for the read here)
SPEC = {"n": ("count",), "sum_value": ("sum", "value"),
        "users": ("hll", "user_id"), "val_td": ("tdigest", "value")}
standing = aggregate_rollup(hist, ["event_type"], SPEC).localCheckpoint()
standing = incremental_rollup(standing, delta, ["event_type"], SPEC)
(standing.select("event_type", "n",
                 F.hll_sketch_estimate("users").alias("distinct_users"),
                 F.round(tdigest_quantile_col(F.col("val_td"), 0.5), 2)
                 .alias("p50_value"))
 .orderBy("event_type").show())

# 3) drift gate: the new batch's value distribution vs history
drift = psi_report(hist, delta, "value", bins=20)
psi = drift.agg(F.sum("psi_term")).first()[0]
print(f"PSI(value, hist vs delta) = {psi:.4f} "
      f"({'stable' if psi < 0.1 else 'DRIFTING'})")

# 4) reproducibility fingerprint of the export (rerun-invariant)
fp = dataset_fingerprint(
    delta.select("event_id", "user_id", "event_type")).first()
print(f"export fingerprint: n={fp['n_rows']} xor={fp['xor_hash']:x}")

# 5) padded-batch geometry for the training loader
docs = token_count(spark.read.parquet(f"{sf_dir}/documents.parquet"))
length_buckets(docs).orderBy("bucket").show()

print("data-ops pipeline complete;", work)
