"""Distributed BPE vocabulary training — subword merges learned on-corpus.

A training-data pipeline that ships its own tokenizer needs the merge
table learned from the corpus itself (Sennrich et al. 2016, "Neural
Machine Translation of Rare Words with Subword Units").  Reference
analog: none — extension tier; `text.bpe_ish_token_count` estimates
token counts with a fixed regex, this module LEARNS the merges.

Scale shape — the classic BPE decomposition:

1. ONE corpus-sized pass builds the distinct-word frequency table
   (shuffle bounded by |vocab|, map-side combined).  Every later round
   touches ONLY that table — at 100 TB of text the word table is
   thousands of times smaller than the corpus, so training cost is
   independent of corpus size after pass 1.
2. Each merge round is a vocab-sized aggregate (adjacent-pair counts,
   shuffle bounded by distinct pairs) + ONE top-1 action + a native
   fold (`F.aggregate`) that rewrites only the words containing the
   winning pair.  No Python in the loop; lineage is cut by
   `localCheckpoint` every ``checkpoint_every`` rounds.
3. Encoding applies the frozen merge table with an Arrow-batched
   mapInPandas kernel (per-batch distinct-word memoization) — the one
   genuinely sequential per-word computation.

Determinism: ties in pair counts break on (count DESC, a ASC, b ASC);
words are whitespace-tokenized lowercase (text.tokens_col semantics)
and split to unicode characters with no end-of-word marker (merges
never cross word boundaries).
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from .text import tokens_col
from .util import explode_fast

MERGE_SCHEMA = "rank int, a string, b string, n long"


def word_freqs(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Distinct-word frequency table ``(word, freq)`` — the single
    corpus-sized pass of BPE training (map-side combined groupBy)."""
    toks = explode_fast(df.select(text_col),
                        tokens_col(F.col(text_col)), "word")
    return toks.groupBy("word").agg(F.count(F.lit(1)).alias("freq"))


def _adjacent_pairs(syms: Column) -> Column:
    """array<struct<a,b>> of adjacent symbol pairs (empty for 1-symbol
    words) — zip the array against itself shifted by one."""
    tail = F.slice(syms, 2, F.greatest(F.lit(0), F.size(syms) - 1))
    head = F.slice(syms, 1, F.greatest(F.lit(0), F.size(syms) - 1))
    return F.zip_with(head, tail,
                      lambda x, y: F.struct(x.alias("a"), y.alias("b")))


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """(a, b, n) adjacent-pair counts over a ``(syms, freq)`` vocab
    table, weighted by word frequency.  Shuffle = distinct pairs."""
    pairs = explode_fast(vocab.select("freq",
                                      _adjacent_pairs(F.col("syms"))
                                      .alias("__p")),
                         F.col("__p"), "pair")
    return (pairs.groupBy(F.col("pair.a").alias("a"),
                          F.col("pair.b").alias("b"))
            .agg(F.sum("freq").alias("n")))


def bpe_pair_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Round-1 adjacent character-pair counts over the corpus →
    ``(a, b, n)`` — the statistic the first BPE merge maximizes.
    One corpus pass (word freqs) + one vocab-sized aggregate."""
    vocab = word_freqs(df, text_col).withColumn(
        "syms", F.split(F.col("word"), ""))
    return _pair_counts(vocab)


def _has_adjacent(syms: Column, a: str, b: str) -> Column:
    return F.exists(_adjacent_pairs(syms),
                    lambda p: (p["a"] == F.lit(a)) & (p["b"] == F.lit(b)))


def _merge_fold(syms: Column, a: str, b: str) -> Column:
    """Greedy left-to-right non-overlapping merge of adjacent (a, b) →
    a·b, as ONE native fold (no Python).  Accumulator = (emitted prefix,
    pending symbol); '' marks no-pending (symbols are never empty)."""
    merged = a + b
    init = F.struct(F.array().cast("array<string>").alias("out"),
                    F.lit("").alias("pend"))

    def step(acc: Column, s: Column) -> Column:
        hit = (acc["pend"] == F.lit(a)) & (s == F.lit(b))
        flushed = F.when(acc["pend"] == "", acc["out"]).otherwise(
            F.concat(acc["out"], F.array(acc["pend"])))
        return F.struct(
            F.when(hit, F.concat(acc["out"], F.array(F.lit(merged))))
             .otherwise(flushed).alias("out"),
            F.when(hit, F.lit("")).otherwise(s).alias("pend"))

    def fin(acc: Column) -> Column:
        return F.when(acc["pend"] == "", acc["out"]).otherwise(
            F.concat(acc["out"], F.array(acc["pend"])))

    return F.aggregate(syms, init, step, fin)


def apply_merge(vocab: DataFrame, a: str, b: str,
                syms_col: str = "syms") -> DataFrame:
    """Apply one merge rule to a symbol-array column; words without the
    adjacent pair pass through untouched (cheap exists() guard skips
    the fold for them)."""
    s = F.col(syms_col)
    return vocab.withColumn(
        syms_col, F.when(_has_adjacent(s, a, b),
                         _merge_fold(s, a, b)).otherwise(s))


def train_bpe(df: DataFrame, num_merges: int, text_col: str = "text",
              min_freq: int = 2, checkpoint_every: int = 8,
              return_vocab: bool = False):
    """Learn ``num_merges`` BPE merge rules from the corpus.

    Returns a driver-side list of ``(a, b, n)`` tuples in rank order
    (``n`` = the pair's weighted count when chosen); with
    ``return_vocab=True`` returns ``(merges, vocab_df)`` where
    ``vocab_df`` is ``(word, freq, syms)`` after all merges — the
    training-side segmentation ``bpe_encode`` must reproduce.

    Stops early when no pair reaches ``min_freq``.  Each round costs
    one vocab-sized aggregate + one top-1 action; the corpus itself is
    read exactly once (pass 1).
    """
    if num_merges < 0:
        raise ValueError("train_bpe: num_merges must be >= 0")
    vocab = (word_freqs(df, text_col)
             .withColumn("syms", F.split(F.col("word"), ""))
             .localCheckpoint(eager=False))  # materialized by round 1's action
    merges: list[tuple[str, str, int]] = []
    for r in range(num_merges):
        top = (_pair_counts(vocab)
               .where(F.col("n") >= min_freq)
               .orderBy(F.desc("n"), F.asc("a"), F.asc("b"))
               .limit(1).collect())
        if not top:
            break
        a, b, n = top[0]["a"], top[0]["b"], top[0]["n"]
        merges.append((a, b, int(n)))
        vocab = apply_merge(vocab, a, b)
        if (r + 1) % checkpoint_every == 0:
            vocab = vocab.localCheckpoint(eager=False)
    return (merges, vocab) if return_vocab else merges


def merges_df(spark: SparkSession,
              merges: list[tuple[str, str, int]]) -> DataFrame:
    """Materialize a merge list as a ``(rank, a, b, n)`` DataFrame —
    the shippable tokenizer artifact (write it with any Tap)."""
    rows = [(i, a, b, n) for i, (a, b, n) in enumerate(merges)]
    return spark.createDataFrame(rows, MERGE_SCHEMA)


def bpe_encode(df: DataFrame, merges, text_col: str = "text",
               out_col: str = "bpe_tokens") -> DataFrame:
    """Encode text with a frozen merge table → ``out_col:
    array<string>`` of subword symbols (word boundaries never merged).

    Applies merges in RANK ORDER per word — bit-identical to the
    segmentation training itself produced (a min-rank-first encoder is
    NOT: a later merge can create an instance of an earlier pair that
    training never revisited).  Arrow-batched mapInPandas with
    per-batch distinct-word memoization; ``merges`` may be the
    ``train_bpe`` list or a ``merges_df`` DataFrame.
    """
    if isinstance(merges, DataFrame):
        merges = [(r["a"], r["b"], r["n"])
                  for r in merges.orderBy("rank").collect()]
    rules = [(a, b) for a, b, *_ in merges]
    fields = df.schema.fieldNames()
    out_schema = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema]
        + [f"`{out_col}` array<string>"])

    def encode_batches(it: Iterator) -> Iterator:
        import re
        split_ws = re.compile(r"[ \t\n\x0b\f\r]+")  # Java-regex \s parity
        memo: dict[str, list[str]] = {}

        def encode_word(w: str) -> list[str]:
            got = memo.get(w)
            if got is not None:
                return got
            syms = list(w)
            for a, b in rules:
                if len(syms) < 2:
                    break
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
                syms = out
            memo[w] = syms
            return syms

        for pdf in it:
            texts = pdf[text_col]
            pdf = pdf.copy()
            pdf[out_col] = [
                [s for w in split_ws.split(t.lower()) if w
                 for s in encode_word(w)]
                if t is not None else None
                for t in texts]
            yield pdf

    return df.mapInPandas(encode_batches, schema=out_schema)
