"""Exact two-pass heavy hitters (functions/stats.py frequent_items).

The contract under test: output == the naive exact plan
(groupBy.count + filter >= ceil(phi*N)) for EVERY input — the candidate
pass is a pure superset optimization, never visible in results.
"""

import math
import random

import pytest
from pyspark.sql import functions as F

from cascalog_spark.functions import frequent_items, frequent_tokens


def _naive(df, col, phi):
    n = df.where(F.col(col).isNotNull()).count()
    if n == 0:
        return set()
    cutoff = math.ceil(phi * n)
    rows = (df.where(F.col(col).isNotNull())
            .groupBy(col).count()
            .where(F.col("count") >= cutoff).collect())
    return {(r[0], r[1]) for r in rows}


def test_matches_naive_on_zipf(spark):
    rng = random.Random(7)
    # zipf-ish: value v appears ~ 3000/v times
    vals = []
    for v in range(1, 60):
        vals += [f"tok{v}"] * (3000 // v)
    rng.shuffle(vals)
    df = spark.createDataFrame([(x,) for x in vals], "w string") \
        .repartition(16)
    for phi in (0.005, 0.02, 0.1):
        got = {(r["item"], r["n"])
               for r in frequent_items(df, "w", phi).collect()}
        assert got == _naive(df, "w", phi), phi


def test_boundary_item_spread_thin_across_partitions(spark):
    # an item with count EXACTLY ceil(phi*N), spread perfectly evenly —
    # the worst case for the per-batch local threshold (>= must hold)
    phi = 0.1
    n_part = 8
    per_part = 100
    rows = []
    for p in range(n_part):
        rows += [("hot", p)] * int(phi * per_part)
        rows += [(f"cold{p}_{i}", p)
                 for i in range(per_part - int(phi * per_part))]
    df = spark.createDataFrame(rows, "w string, p int") \
        .repartition(n_part, "p")
    got = {r["item"] for r in frequent_items(df, "w", phi).collect()}
    assert "hot" in got
    assert got == {t[0] for t in _naive(df, "w", phi)}


def test_exact_counts_and_nulls_ignored(spark):
    df = spark.createDataFrame(
        [("a",)] * 50 + [("b",)] * 30 + [(None,)] * 100 + [("c",)] * 20,
        "w string").repartition(4)
    out = {(r["item"], r["n"])
           for r in frequent_items(df, "w", 0.3).collect()}
    assert out == {("a", 50), ("b", 30)}  # N=100 non-null, cutoff 30


def test_numeric_column_and_custom_names(spark):
    df = spark.createDataFrame([(1,)] * 10 + [(2,)] * 3, "k int")
    out = frequent_items(df, "k", 0.5, out_item="key", out_count="cnt")
    assert out.columns == ["key", "cnt"]
    assert [(r["key"], r["cnt"]) for r in out.collect()] == [(1, 10)]


def test_empty_and_all_null(spark):
    df = spark.createDataFrame([], "w string")
    assert frequent_items(df, "w", 0.1).count() == 0
    df2 = spark.createDataFrame([(None,), (None,)], "w string")
    assert frequent_items(df2, "w", 0.1).count() == 0


def test_phi_validation(spark):
    df = spark.createDataFrame([("a",)], "w string")
    for bad in (0.0, -0.1, 1.5):
        with pytest.raises(ValueError):
            frequent_items(df, "w", bad)


def test_frequent_items_by_group_matches_naive(spark):
    from cascalog_spark.functions import frequent_items_by_group

    rng = random.Random(11)
    rows = []
    for g in ("en", "fr", "de"):
        for v in range(1, 30):
            rows += [(g, f"{g}_tok{v}")] * (400 // v)
    # shared hot token across groups, plus null group/value noise
    rows += [("en", "common")] * 120 + [("fr", "common")] * 80
    rows += [(None, "x")] * 20 + [("en", None)] * 20
    rng.shuffle(rows)
    df = spark.createDataFrame(rows, "g string, w string").repartition(8)

    phi = 0.04
    got = {(r["g"], r["item"], r["n"])
           for r in frequent_items_by_group(df, "g", "w", phi).collect()}
    want = set()
    base = df.where(F.col("g").isNotNull() & F.col("w").isNotNull())
    for g_row in base.select("g").distinct().collect():
        g = g_row["g"]
        sub = base.where(F.col("g") == g)
        n_g = sub.count()
        cutoff = math.ceil(phi * n_g)
        want |= {(g, r["w"], r["count"]) for r in
                 sub.groupBy("w").count()
                 .where(F.col("count") >= cutoff).collect()}
    assert got == want and len(got) > 0
    assert ("en", "common", 120) in got


def test_frequent_bigrams_matches_top_ngrams_counts(spark, sf_dir):
    """n=2 heavy hitters must agree with the exact top_ngrams counts for
    every gram above the phi cutoff."""
    from cascalog_spark.functions import frequent_tokens
    from cascalog_spark.functions.text import top_ngrams

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    phi = 0.0012
    got = {(r["term"], r["n_occurrences"])
           for r in frequent_tokens(docs, phi, n=2).collect()}
    exact = top_ngrams(docs, n=2, k=1_000_000).collect()
    total = sum(r["n_occurrences"] for r in exact)
    cutoff = math.ceil(phi * total)
    want = {(r["ngram"], r["n_occurrences"]) for r in exact
            if r["n_occurrences"] >= cutoff}
    assert got == want and len(got) > 0


def test_frequent_tokens_matches_exact_token_counts(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    phi = 0.002
    got = {(r["term"], r["n_occurrences"])
           for r in frequent_tokens(docs, phi).collect()}
    from cascalog_spark.functions.text import tokens_col
    toks = docs.select(F.explode(tokens_col(F.col("text"))).alias("t"))
    want = _naive(toks, "t", phi)
    assert got == want and len(got) > 0
