"""Multi-step workflow with restart markers (the cascalog-checkpoint
analog): build a doc-quality table, then fan out two dependent steps —
completed steps are skipped on re-run via marker files.

Run: python examples/05_checkpoint_workflow.py [sf_dir]
(run it twice to see steps skip)
"""
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql import SparkSession

from cascalog_spark.functions.text import quality_score, token_count
from cascalog_spark.plans import Workflow

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
work = os.path.join(tempfile.gettempdir(), "cascalog_spark_wf_example")

spark = (SparkSession.builder.master("local[*]")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

scored_path = f"{work}/scored"
wf = Workflow(work)


@wf.step("score")
def score():
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    scored = (quality_score(docs).select("doc_id", "quality")
              .join(token_count(docs).select("doc_id", "n_tokens"),
                    "doc_id"))
    scored.write.mode("overwrite").parquet(scored_path)


@wf.step("keep_list", deps=["score"])
def keep_list():
    scored = spark.read.parquet(scored_path)
    (scored.where(F.col("quality") >= 0.7).select("doc_id")
     .write.mode("overwrite").parquet(f"{work}/keep"))


@wf.step("stats", deps=["score"])
def stats():
    scored = spark.read.parquet(scored_path)
    scored.agg(F.round(F.avg("quality"), 4).alias("avg_quality"),
               F.sum("n_tokens").alias("total_tokens")).show()


wf.run()
kept = spark.read.parquet(f"{work}/keep").count()
print(f"kept {kept} high-quality docs; markers in {work} "
      "(delete to recompute)")
spark.stop()
