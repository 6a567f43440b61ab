"""Scaling smoke for the IVF-PQ composite index — gated (exits nonzero
on a blown ratio).

8x replication of sf0.1 embeddings with disjoint vec_id spaces
(identical vector distribution, so cell occupancy fractions are
unchanged while the corpus is 8x).  The pipeline under test is the
whole index lifecycle with a FIXED model (the train-once contract):
assign + residual-encode the corpus, then one ADC probe query.  Encode
is one map pass (linear, no shuffle); the probe scans only probed
cells' codes.  Cost = a fixed driver/JIT part + corpus-linear encode,
so the 8x wall ratio must stay well below linear at these sizes.

Gate: wall(8x)/wall(1x) <= 6 on fixed cores (a per-row re-fit, an
inlined-literal lambda regression, or an all-cells probe scan would
push it toward 8+; encode is the dominant linear term so the bound is
looser than the report smoke's).

Run: python tools/scaling_smoke_ivfpq.py
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

from cascalog_spark.functions import ivfpq_index, ivfpq_topk  # noqa: E402

emb = spark.read.parquet(f"{SF}/embeddings.parquet")
big = emb
for i in range(1, 8):
    big = big.unionByName(emb.withColumn(
        "vec_id", F.col("vec_id") + F.lit(i * 10_000_000)))
big = big.repartition(32).persist()
emb1 = emb.repartition(32).persist()
big.count(), emb1.count()

# fit the model ONCE on the 1x corpus (both sizes share it — the
# replicas don't change the distribution, and re-fitting inside the
# timed loop would measure the driver fit, not the corpus pipeline)
cents, books, _ = ivfpq_index(emb1, n_centroids=16, m=8, n_codes=16)
qv = [float(x) for x in emb1.where("vec_id = 0").first()["embedding"]]


def run(df):
    _, _, codes = ivfpq_index(df, n_centroids=16, m=8, n_codes=16,
                              centroids=cents, codebooks=books)
    (ivfpq_topk(codes, qv, cents, books, k=10, n_probe=4)
     .write.format("noop").mode("overwrite").save())


def timeit(df, n=2):
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter()
        run(df)
        best = min(best, time.perf_counter() - t0)
    return round(best, 2)


t1 = timeit(emb1)
t8 = timeit(big)
ratio = round(t8 / t1, 2)
print(f"ivfpq encode+probe: 1x {t1}s  8x {t8}s  ratio {ratio}x")
if ratio > 6:
    print("GATE BLOWN: ratio > 6")
    sys.exit(1)
print("smoke OK")
