"""Round-11 checkpoint right-sizing smoke (verdict item 6) — gated.

The two corpus-sized localCheckpoint defaults from r10 re-measured at
8x the document count (disjoint per-replica vocabularies, so per-replica
pair/shingle structure is preserved and work scales ~linearly):

- text.ngram_novelty(materialize=) — checkpoints the (id, shingle-array)
  frame once for its two consumers (r10 local receipt: 0.28x).
- dedup.ngram_jaccard_pairs(materialize=) — checkpoints the token-
  EXPLODED shingle table for its 3-4 consumers (r10 receipt: parity).

For each operator, both arms are timed at 1x and 8x.  The committed
default must still be the faster (or within-noise) arm AT 8x; a default
whose advantage inverts with scale fails the gate.
Gate: wall(default arm) <= 1.35 * wall(other arm) at 8x.

Run: python tools/scaling_smoke_r11.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession, functions as F

SF = "/root/testdata/sf0.1"
GATE = 1.35

spark = (SparkSession.builder.master("local[32]")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.driver.memory", "48g")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

from cascalog_spark.functions.dedup import ngram_jaccard_pairs  # noqa: E402
from cascalog_spark.functions.text import ngram_novelty  # noqa: E402

docs = (spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text"))
n0 = docs.count()


def corpus(nrep: int):
    """nrep disjoint-vocabulary replicas: every token is prefixed with
    its replica id, so shingles never match across replicas and the 1x
    pair/ownership structure repeats nrep times."""
    rep = (docs.withColumn("__rep", F.explode(
        F.sequence(F.lit(0), F.lit(nrep - 1))))
        .select((F.col("doc_id") + F.col("__rep") * 10_000_000)
                .alias("doc_id"),
                F.array_join(F.transform(
                    F.split(F.col("text"), " "),
                    lambda t: F.concat(F.lit("r"), F.col("__rep"), t)),
                    " ").alias("text")))
    return rep.localCheckpoint()  # input cost excluded from the timing


def timed(fn, reps=2):
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        fn().write.format("noop").mode("overwrite").save()
        best = min(best, time.time() - t0)
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
    return best


results = {}
for nrep in (1, 8):
    c = corpus(nrep)
    for mat in (True, False):
        results[("novelty", nrep, mat)] = timed(
            lambda: ngram_novelty(c, id_col="doc_id", materialize=mat))
        results[("jaccard", nrep, mat)] = timed(
            lambda: ngram_jaccard_pairs(c, "doc_id", threshold=0.8,
                                        prefilter=False,
                                        materialize=mat))
    c.unpersist()

# --- leave-alone re-justification at 8x (verdict item 10): drift and
# tfidf are untouched this round on a minimal-shape argument (drift =
# two fundamental corpus passes + O(1) probes; tfidf = one tokenization
# persisted for its two consumers).  Gate: near-linear scaling — 8x the
# rows must cost <= 16x the 1x wall (superlinear would mean a hidden
# quadratic/recompute the plan reading missed).
from cascalog_spark.functions import embedding_drift_report  # noqa: E402
from cascalog_spark.functions.text import (release_tfidf_cache,  # noqa: E402
                                           tf_idf)

emb = (spark.read.parquet(f"{SF}/embeddings.parquet")
       .select("vec_id", "embedding"))


def emb_rep(nrep: int):
    return (emb.withColumn("__rep", F.explode(
        F.sequence(F.lit(0), F.lit(nrep - 1))))
        .select((F.col("vec_id") + F.col("__rep") * 10_000_000)
                .alias("vec_id"), "embedding")).localCheckpoint()


def timed_tfidf(c):
    t0 = time.time()
    out = tf_idf(c, top_k=3)
    out.write.format("noop").mode("overwrite").save()
    el = time.time() - t0
    release_tfidf_cache(out)
    spark.catalog.clearCache()
    return el


scale = {}
for nrep in (1, 8):
    er = emb_rep(nrep)
    t0 = time.time()
    embedding_drift_report(er.where(F.col("vec_id") % 2 == 0),
                           er.where(F.col("vec_id") % 2 == 1)) \
        .write.format("noop").mode("overwrite").save()
    scale[("drift", nrep)] = time.time() - t0
    er.unpersist()
    c = corpus(nrep)
    scale[("tfidf", nrep)] = timed_tfidf(c)
    c.unpersist()

print(f"docs: 1x = {n0}, 8x = {8 * n0}")
ok = True
for op in ("drift", "tfidf"):
    r = scale[(op, 8)] / max(scale[(op, 1)], 1e-9)
    print(f"{op} leave-alone: 1x {scale[(op, 1)]:.2f}s  "
          f"8x {scale[(op, 8)]:.2f}s  ratio {r:.2f} (gate 16)")
    if r > 16:
        ok = False
DEFAULTS = {"novelty": True, "jaccard": True}
for op in ("novelty", "jaccard"):
    for nrep in (1, 8):
        t_t = results[(op, nrep, True)]
        t_f = results[(op, nrep, False)]
        print(f"{op} {nrep}x: materialize=True {t_t:.2f}s  "
              f"False {t_f:.2f}s  ratio T/F {t_t / t_f:.2f}")
    d = DEFAULTS[op]
    t_def = results[(op, 8, d)]
    t_oth = results[(op, 8, not d)]
    if t_def > GATE * t_oth:
        print(f"{op}: default materialize={d} is {t_def / t_oth:.2f}x "
              f"the other arm at 8x — default inverted with scale")
        ok = False

print("SMOKE r11:", "PASS" if ok else "FAIL")
spark.stop()
sys.exit(0 if ok else 1)
