"""Distributed BPE training (functions/bpe.py): differential vs a
pure-Python reference trainer (merge-for-merge), DuckDB oracle for the
pair counts, and the encode==training-segmentation contract."""

import re
from collections import Counter

import duckdb
import pytest
from pyspark.sql import functions as F

from cascalog_spark.functions import (bpe_encode, bpe_pair_counts,
                                      merges_df, train_bpe, word_freqs)


# -- pure-Python reference BPE (Sennrich-style), same tie-break ------------

def ref_word_freqs(texts):
    c = Counter()
    for t in texts:
        for w in re.split(r"[ \t\n\x0b\f\r]+", t.lower()):
            if w:
                c[w] += 1
    return c


def ref_pair_counts(vocab):
    c = Counter()
    for syms, f in vocab:
        for i in range(len(syms) - 1):
            c[(syms[i], syms[i + 1])] += f
    return c


def ref_apply(syms, a, b):
    out, pend = [], None
    for s in syms:
        if pend == a and s == b:
            out.append(a + b)
            pend = None
        else:
            if pend is not None:
                out.append(pend)
            pend = s
    if pend is not None:
        out.append(pend)
    return out


def ref_train(texts, num_merges, min_freq=2):
    vocab = [(list(w), f) for w, f in ref_word_freqs(texts).items()]
    merges = []
    for _ in range(num_merges):
        pc = ref_pair_counts(vocab)
        eligible = [(n, a, b) for (a, b), n in pc.items() if n >= min_freq]
        if not eligible:
            break
        # tie-break: count DESC, then a ASC, b ASC
        n, a, b = sorted(eligible, key=lambda t: (-t[0], t[1], t[2]))[0]
        merges.append((a, b, n))
        vocab = [(ref_apply(s, a, b), f) for s, f in vocab]
    return merges, vocab


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


@pytest.fixture(scope="module")
def corpus(spark):
    texts = ["the cat sat on the mat",
             "the cats chatter at the mats",
             "that hat is the cat hat",
             "low lower lowest newer newest",
             "low low low lower newer new"]
    return spark.createDataFrame([(t,) for t in texts], "text string"), texts


def test_word_freqs_matches_reference(corpus):
    df, texts = corpus
    got = {r["word"]: r["freq"] for r in word_freqs(df).collect()}
    assert got == dict(ref_word_freqs(texts))


def test_pair_counts_vs_duck(docs, sf_dir):
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * "
            f"FROM '{sf_dir}/documents.parquet'")
    got = sorted([(r["a"], r["b"], r["n"])
                  for r in bpe_pair_counts(docs).collect()])
    want = sorted([tuple(r) for r in con.sql(r"""
        WITH words AS (
          SELECT unnest(list_filter(
            regexp_split_to_array(lower(text), '\s+'), x -> x != '')) AS w
          FROM documents),
        wf AS (SELECT w, count(*) AS f FROM words GROUP BY w),
        p AS (SELECT unnest(list_transform(range(1, length(w)),
                i -> {'a': substring(w, i, 1),
                      'b': substring(w, i+1, 1), 'f': f})) AS s
              FROM wf)
        SELECT s['a'] AS a, s['b'] AS b, CAST(sum(s['f']) AS BIGINT) AS n
        FROM p GROUP BY 1, 2
        """).fetchall()])
    assert got == want


def test_train_matches_reference_merge_for_merge(corpus):
    df, texts = corpus
    merges, vocab = train_bpe(df, 12, min_freq=2, checkpoint_every=3,
                              return_vocab=True)
    ref_merges, ref_vocab = ref_train(texts, 12, min_freq=2)
    assert merges == ref_merges
    # the post-training segmentation matches word for word
    got = {r["word"]: r["syms"] for r in vocab.collect()}
    assert got == {"".join(s): s for s, _ in ref_vocab}


def test_encode_reproduces_training_segmentation(corpus):
    df, _ = corpus
    merges, vocab = train_bpe(df, 10, min_freq=2, return_vocab=True)
    enc = bpe_encode(vocab.selectExpr("word AS text"), merges,
                     out_col="bpe")
    got = {r["text"]: r["bpe"] for r in enc.collect()}
    for r in vocab.collect():
        assert got[r["word"]] == r["syms"], r["word"]


def test_encode_concat_identity_and_nulls(spark, corpus):
    df, _ = corpus
    merges = train_bpe(df, 6, min_freq=2)
    probe = spark.createDataFrame(
        [("The CAT sat",), (None,), ("",), ("zzz unseen-word",)],
        "text string")
    rows = bpe_encode(probe, merges).collect()
    by_text = {r["text"]: r["bpe_tokens"] for r in rows}
    assert by_text[None] is None
    assert by_text[""] == []
    # concatenating the symbols reproduces the lowercased words
    assert "".join(by_text["The CAT sat"]) == "thecatsat"
    assert "".join(by_text["zzz unseen-word"]) == "zzzunseen-word"


def test_encode_accepts_merges_df(spark, corpus):
    df, _ = corpus
    merges = train_bpe(df, 4, min_freq=2)
    mdf = merges_df(spark, merges)
    assert [(r["a"], r["b"], r["n"]) for r in
            mdf.orderBy("rank").collect()] == merges
    a = bpe_encode(df, merges).select("bpe_tokens").collect()
    b = bpe_encode(df, mdf).select("bpe_tokens").collect()
    assert a == b


def test_min_freq_stops_early(spark):
    df = spark.createDataFrame([("ab xy pq",)], "text string")
    # every pair occurs once — below min_freq=2, so zero merges
    assert train_bpe(df, 5, min_freq=2) == []


def test_merge_round_is_native(corpus):
    """The per-round vocab rewrite must stay JVM-side: no Python eval
    nodes in the plan of one apply_merge round."""
    df, _ = corpus
    from cascalog_spark.functions.bpe import apply_merge
    vocab = word_freqs(df).withColumn("syms", F.split("word", ""))
    plan = apply_merge(vocab, "t", "h")._jdf \
        .queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan
    assert "FlatMapGroupsInPandas" not in plan
