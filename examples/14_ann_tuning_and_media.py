"""ANN tuning loop + real-pixel perceptual dedup — the round-6
operators as one flow:

    embeddings → ann_recall_report (which LSH/IVF setting clears the
    recall bar at the least scan cost?) → pick the cheapest passing
    config and run the production knn path with it → media pHash
    near-dup pass over REAL decoded pixels (stdlib PNG decoder through
    the pluggable codec seam).

The report is the measurement loop every ANN deployment needs before
committing to an index layout: the exact ground truth runs ONCE
(broadcast knn_join), every IVF probe setting shares one cell
equi-join (probes carry their rank), and the whole report is a single
job no matter how many configurations it scores.

Run: python examples/14_ann_tuning_and_media.py [sf_dir]
"""
import os
import struct
import sys
import zlib

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from cascalog_spark.functions import (ann_recall_report, ivf_ann_topk,
                                      media_phash_near_dups, png_gray32,
                                      register_codec)

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.ui.enabled", "false")
         .appName("ann_tuning_and_media").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")

# -- 1. tune: recall@10 vs scanned fraction per configuration ---------------
queries = (emb.orderBy("vec_id").limit(8)
           .select(F.col("vec_id").alias("query_id"), "embedding"))
report = ann_recall_report(emb, queries, k=10, lsh_planes=(4, 8),
                           ivf_probes=(1, 2, 4), n_centroids=16)
rows = report.collect()
print("config          recall@10  scan_frac")
for r in rows:
    print(f"{r['method']:>4} param={r['param']:<3}  "
          f"{r['recall_at_k']:.3f}      {r['scan_frac']:.3f}")

# -- 2. commit: cheapest IVF setting clearing a 0.85 recall bar --------------
passing = [r for r in rows if r["method"] == "ivf"
           and r["recall_at_k"] >= 0.85]
n_probe = min((r["param"] for r in passing), default=4)
print(f"\nchosen: ivf n_probe={n_probe} (cheapest above the 0.85 bar)")
qvec = [float(x) for x in
        emb.where(F.col("vec_id") == 0).first()["embedding"]]
top = ivf_ann_topk(emb, qvec, k=5, n_centroids=16, n_probe=n_probe)
print("top-5 for vec 0:", [(r["vec_id"], r["sim"]) for r in top.collect()])

# -- 3. media: perceptual near-dups over REAL pixels -------------------------
import numpy as np


def _png(gray):
    g = np.asarray(gray, dtype="uint8")
    h, w = g.shape
    raw = b"".join(b"\x00" + g[y].tobytes() for y in range(h))

    def chunk(t, d):
        return (struct.pack(">I", len(d)) + t + d
                + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF))

    return (b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))


rng = np.random.default_rng(3)
k9 = np.ones(9) / 9.0
blur = np.apply_along_axis(
    lambda r: np.convolve(r, k9, mode="same"), 1,
    rng.normal(0, 1, (64, 64)))
blur = np.apply_along_axis(
    lambda c: np.convolve(c, k9, mode="same"), 0, blur)
scene = ((blur - blur.min()) / (blur.ptp() or 1) * 180 + 20).astype("uint8")
media = spark.createDataFrame(
    [(1, _png(scene)),                                   # original
     (2, _png((scene + 35).clip(0, 255).astype("uint8"))),  # re-encode
     (3, _png(rng.integers(0, 256, (64, 64), dtype="uint8")))],  # unrelated
    "mid long, content binary")
register_codec("image_gray", png_gray32)   # REAL pixels, stdlib-only
pairs = media_phash_near_dups(media, "mid", max_hamming=10)
print("\nperceptual near-dup pairs (real pixels):",
      [(r["id_a"], r["id_b"], r["hamming"]) for r in pairs.collect()])

spark.stop()
