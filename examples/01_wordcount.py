"""Word count — the canonical first query, both surfaces.

Run: python examples/01_wordcount.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

from cascalog_spark import c, parse_query, q

spark = (SparkSession.builder.master("local[*]")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

sentences = spark.createDataFrame(
    [("the quick brown fox",), ("jumps over the lazy dog",),
     ("the fox sleeps",)], ["sentence"])

# predicate-tuple surface
wc = q(["?word", "?n"],
       (sentences, {"sentence": "?s"}),
       (c.split(), "?s", ":>", "?word"),
       (c.count, "?n"))
wc.to_df(spark).show()

# textual Datalog surface — same planner
parse_query("""
    [?word ?n]
    (sentences ?s)
    (split ?s :> ?word)
    (count ?n)
""", env={"sentences": sentences, "split": c.split()}).to_df(spark).show()

spark.stop()
