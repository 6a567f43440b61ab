"""Data-pipeline function packs, differentially tested against DuckDB on the
driver's documents/embeddings tables — the same oracle strategy the driver's
correctness gate uses."""

import duckdb
import pytest
from pyspark.sql import functions as F

from cascalog_spark.functions import (brute_force_topk, exact_dedup,
                                      lang_id, minhash_lsh_candidates,
                                      minhash_signature, ngram_jaccard_pairs,
                                      quality_score, simhash, token_count)
from cascalog_spark.functions.dedup import simhash_near_dups
from cascalog_spark.functions.similarity import lsh_ann_topk
from cascalog_spark.functions.text import (bpe_ish_token_count,
                                           doc_fingerprint,
                                           shingle_fingerprint)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'")
    con.sql(f"CREATE VIEW embeddings AS SELECT * FROM '{sf_dir}/embeddings.parquet'")
    return con


def _norm(t):
    import decimal

    return tuple(float(x) if isinstance(x, decimal.Decimal) else x for x in t)


def _match(spark_df, duck_rel, sort_cols):
    a = sorted([_norm(tuple(r)) for r in spark_df.collect()])
    b = sorted([_norm(tuple(r)) for r in duck_rel.fetchall()])
    assert len(a) == len(b), f"row counts differ: spark={len(a)} duck={len(b)}"
    assert a == b, f"first diff: {next(((x, y) for x, y in zip(a, b) if x != y), None)}"


def test_token_count_vs_duck(docs, duck):
    out = token_count(docs).select("doc_id", "n_tokens")
    oracle = duck.sql("""
        SELECT doc_id, len(list_filter(string_split(lower(text), ' '),
                                       x -> x != '')) AS n_tokens
        FROM documents""")
    _match(out, oracle, ["doc_id"])


def test_doc_fingerprint_vs_duck(docs, duck):
    out = doc_fingerprint(docs).select("doc_id", "fingerprint")
    oracle = duck.sql("""
        SELECT doc_id,
               md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fingerprint
        FROM documents""")
    _match(out, oracle, ["doc_id"])


def test_lang_id_runs(docs, duck):
    out = lang_id(docs).groupBy("lang_pred").count()
    rows = dict((r[0], r[1]) for r in out.collect())
    assert sum(rows.values()) == docs.count()


def test_quality_score_vs_duck(docs, duck):
    out = quality_score(docs).select("doc_id", "quality")
    oracle = duck.sql("""
        SELECT doc_id, round(
          (CASE WHEN length(text) BETWEEN 100 AND 5000 THEN 0.4 ELSE 0.0 END)
        + (CASE WHEN length(regexp_replace(text, '[^A-Za-z]', '', 'g'))::DOUBLE
                 / (CASE WHEN length(text) > 0 THEN length(text) ELSE 1 END)
                 >= 0.6 THEN 0.3 ELSE 0.0 END)
        + (CASE WHEN (length(regexp_replace(text, '\\s', '', 'g'))::DOUBLE
                 / (CASE WHEN len(list_filter(string_split(lower(text),' '), x -> x != '')) > 0
                         THEN len(list_filter(string_split(lower(text),' '), x -> x != ''))
                         ELSE 1 END)) BETWEEN 3 AND 12
                THEN 0.3 ELSE 0.0 END), 1) AS quality
        FROM documents""")
    _match(out, oracle, ["doc_id"])


def test_exact_dedup(spark):
    rows = [(1, "a b c"), (2, "a b c"), (3, "x y")]
    df = spark.createDataFrame(rows, ["id", "text"])
    out = exact_dedup(df, ["text"], "id")
    got = sorted([tuple(r) for r in out.collect()])
    assert got == [("a b c", 1, 2), ("x y", 3, 1)]


def test_minhash_signature_vs_duck(docs, duck):
    from __spark_entry__ import _minhash_sql

    out = minhash_signature(docs.limit(50), num_perm=4).select("doc_id", "minhash")
    oracle = duck.sql(f"""
        WITH toks AS (
          SELECT doc_id,
                 list_filter(string_split(lower(text), ' '), x -> x != '') AS tk
          FROM documents WHERE doc_id < 50),
        sh AS (
          SELECT doc_id,
                 list_distinct(list_transform(
                   range(0, greatest(len(tk)-3, 0)+1),
                   i -> array_to_string(list_slice(tk, i+1, i+3), ' '))) AS shingles
          FROM toks)
        SELECT doc_id, [{_minhash_sql(4)}] AS minhash
        FROM sh""")
    a = sorted([(r[0], list(r[1])) for r in out.collect()])
    b = sorted([(r[0], list(r[1])) for r in oracle.fetchall()])
    assert a == b


def test_embed_text_hashing(spark):
    from cascalog_spark.functions import embed_text
    from cascalog_spark.functions.similarity import cosine_similarity_col

    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(1, "the quick fox"), (2, "the quick fox"), (3, "entirely other")],
        ["id", "text"])
    emb = embed_text(docs, dim=32)
    rows = {r.id: r.embedding for r in emb.collect()}
    assert len(rows[1]) == 32
    assert rows[1] == rows[2]          # deterministic: same text, same vec
    assert rows[1] != rows[3]
    # unit-normalized
    assert abs(sum(x * x for x in rows[1]) - 1.0) < 1e-5
    # composes with the similarity ops
    a = emb.where(F.col("id") == 1).select(
        F.col("embedding").cast("array<double>").alias("v"))
    sim = (a.crossJoin(emb.where(F.col("id") == 2).select(
        F.col("embedding").cast("array<double>").alias("w")))
        .select(cosine_similarity_col(F.col("v"), F.col("w")).alias("s"))
        .first().s)
    assert abs(sim - 1.0) < 1e-6


def test_embed_text_custom_embedder(spark):
    from cascalog_spark.functions import embed_text, register_embedder

    register_embedder("twodim", lambda texts: [[float(len(t or "")), 1.0]
                                               for t in texts])
    docs = spark.createDataFrame([(1, "abc"), (2, "")], ["id", "text"])
    rows = {r.id: r.embedding
            for r in embed_text(docs, dim=2, embedder="twodim").collect()}
    assert rows[1] == [3.0, 1.0] and rows[2] == [0.0, 1.0]


def test_dedup_clusters_connected_components(spark):
    from cascalog_spark.functions import dedup_clusters

    # components: {1,2,3,4} (chain), {10,11}, {20,21,22} (triangle+tail)
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (20, 22)],
        ["id_a", "id_b"])
    got = {r.node: r.cluster
           for r in dedup_clusters(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10,
                   20: 20, 21: 20, 22: 20}


def test_near_dedup_keep_best(spark):
    """keep='best' keeps the max-score member per cluster (id tiebreak);
    singletons untouched; keep='min' unchanged; arg validation loud."""
    import pytest

    from cascalog_spark.functions import near_dedup

    base = "the quick brown fox jumps over the lazy dog "
    rows = [(1, base + "alpha", 10), (2, base + "alpha beta", 99),
            (3, base + "alpha", 50),  # cluster {1,2,3}: best = 2
            (7, "completely different short text here", 5)]  # singleton
    df = spark.createDataFrame(rows, "doc_id long, text string, score int")
    best = near_dedup(df, num_perm=8, bands=4, keep="best",
                      score_col="score")
    assert sorted(r.doc_id for r in best.collect()) == [2, 7]
    kept_min = near_dedup(df, num_perm=8, bands=4)
    assert sorted(r.doc_id for r in kept_min.collect()) == [1, 7]
    # score ties fall back to min id deterministically
    tied = spark.createDataFrame(
        [(1, base, 5), (2, base, 5), (7, "other words entirely", 1)],
        "doc_id long, text string, score int")
    got = near_dedup(tied, num_perm=8, bands=4, keep="best",
                     score_col="score")
    assert sorted(r.doc_id for r in got.collect()) == [1, 7]
    with pytest.raises(ValueError, match="score_col"):
        near_dedup(df, keep="best")
    with pytest.raises(ValueError, match="keep"):
        near_dedup(df, keep="median")


def test_cross_doc_line_dedup(spark):
    """First occurrence (by id, then position) keeps a line; later docs
    and later repeats in the SAME doc lose it; short lines exempt;
    whitespace/case-normalized matching; original text preserved."""
    from cascalog_spark.functions import cross_doc_line_dedup

    rows = [
        (1, "Common Header\nalpha body\ncommon header\n-"),
        (2, "common header  \nbeta body\n-"),
        (3, "gamma body\nBETA BODY\n-"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r.dedup_text
           for r in cross_doc_line_dedup(df, min_chars=2).collect()}
    # doc 1 keeps its first "Common Header", loses the in-doc repeat
    assert out[1] == "Common Header\nalpha body\n-"
    # doc 2 loses the header (normalized match incl. trailing spaces)
    assert out[2] == "beta body\n-"
    # doc 3 loses BETA BODY (case-normalized vs doc 2's line)
    assert out[3] == "gamma body\n-"
    # the "-" line is under min_chars → survives everywhere (3 copies)
    assert all(o.endswith("-") for o in out.values())
    # original column untouched
    cols = cross_doc_line_dedup(df).columns
    assert cols == ["doc_id", "text", "dedup_text"]


def test_dedup_clusters_long_chain_converges(spark):
    from cascalog_spark.functions import dedup_clusters

    n = 30  # diameter 30 chain — min-label still converges under max_iter
    pairs = spark.createDataFrame([(i, i + 1) for i in range(n)],
                                  ["id_a", "id_b"])
    got = dedup_clusters(pairs, max_iter=50).collect()
    assert all(r.cluster == 0 for r in got)
    assert len(got) == n + 1


def test_dedup_clusters_star_equivalence_random_graphs(spark):
    """Large-star/small-star contraction produces the same (node, cluster)
    map as min-label propagation on random graphs — same keep/drop
    decisions from either engine."""
    import random

    from cascalog_spark.functions import dedup_clusters

    rng = random.Random(7)
    for trial in range(3):
        n = 60
        edges = [(rng.randrange(n), rng.randrange(n))
                 for _ in range(rng.randrange(20, 80))]
        pairs = spark.createDataFrame(edges, ["id_a", "id_b"])
        lab = {r.node: r.cluster
               for r in dedup_clusters(pairs, max_iter=100).collect()}
        star = {r.node: r.cluster
                for r in dedup_clusters(pairs, method="star").collect()}
        assert lab == star, f"trial {trial}: {lab} != {star}"


def test_dedup_clusters_star_logarithmic_rounds_on_path(spark):
    """The scale property the star method exists for: a PATH graph (the
    adversarial chain-shaped dup cluster) converges in O(log n) rounds
    where label propagation needs O(n).  128-node path: star must finish
    in <= 12 rounds (observed ~7); label propagation provably needs >= 60
    rounds to move the min label 127 hops."""
    from cascalog_spark.functions import dedup_clusters

    n = 128
    pairs = spark.createDataFrame([(i, i + 1) for i in range(n - 1)],
                                  ["id_a", "id_b"])
    out = dedup_clusters(pairs, method="star", max_iter=20)
    got = out.collect()
    assert all(r.cluster == 0 for r in got) and len(got) == n
    assert out._cc_rounds <= 12, out._cc_rounds


def test_dedup_clusters_star_isolated_and_self_loops(spark):
    """Self-loop-only nodes form their own singleton cluster; mixed input
    keeps the contract (every input node labeled)."""
    from cascalog_spark.functions import dedup_clusters

    pairs = spark.createDataFrame([(5, 5), (1, 2), (2, 1)],
                                  ["id_a", "id_b"])
    got = {r.node: r.cluster
           for r in dedup_clusters(pairs, method="star").collect()}
    assert got == {5: 5, 1: 1, 2: 1}


def test_fuzzy_dup_pairs_exact_vs_bruteforce(spark):
    """FastSS deletion-neighborhood join finds EXACTLY the edit-distance
    <= 1 pairs — verified against the all-pairs levenshtein on random
    strings with injected insert/delete/substitute typos."""
    import random

    from cascalog_spark.functions import fuzzy_dup_pairs

    rng = random.Random(3)
    base = ["".join(rng.choice("abcdef") for _ in range(rng.randrange(3, 12)))
            for _ in range(25)]
    rows = []
    for i, s in enumerate(base):
        rows.append((3 * i, s))
        mut = list(s)
        op = rng.choice(["del", "ins", "sub", "none"])
        p = rng.randrange(len(mut))
        if op == "del":
            del mut[p]
        elif op == "ins":
            mut.insert(p, rng.choice("abcdef"))
        elif op == "sub":
            mut[p] = rng.choice("abcdef")
        rows.append((3 * i + 1, "".join(mut)))
    df = spark.createDataFrame(rows, "id long, name string")
    got = sorted((r.id_a, r.id_b, r.dist)
                 for r in fuzzy_dup_pairs(df, "id", "name").collect())

    def lev(a, b):
        if abs(len(a) - len(b)) > 1:
            return 2
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    want = sorted((x, y, lev(a, b))
                  for (x, a) in rows for (y, b) in rows
                  if x < y and lev(a, b) <= 1)
    assert got == want and len(got) >= 25 // 2  # 'none' mutations at d=0


def test_fuzzy_dup_pairs_no_cartesian(spark):
    from cascalog_spark.functions import fuzzy_dup_pairs

    df = spark.createDataFrame([(1, "abc"), (2, "abd")], "id long, s string")
    out = fuzzy_dup_pairs(df, "id", "s")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan
    assert [(r.id_a, r.id_b, r.dist) for r in out.collect()] == [(1, 2, 1)]


def test_minhash_lsh_candidates_runs(spark):
    rows = [(1, "the quick brown fox jumps over the lazy dog today"),
            (2, "the quick brown fox jumps over the lazy dog tonight"),
            (3, "completely different text with nothing shared here at all")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    pairs = minhash_lsh_candidates(df, "doc_id", num_perm=16, bands=8)
    got = [(r.id_a, r.id_b) for r in pairs.collect()]
    assert (1, 2) in got
    assert all(3 not in p for p in got)


def test_simhash_near_dups(spark):
    rows = [(1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy cat"),
            (3, "totally unrelated words appear in this sentence")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = simhash(df)
    vals = {r.doc_id: r.simhash for r in out.collect()}
    assert all(isinstance(v, int) for v in vals.values())
    dups = simhash_near_dups(df, "doc_id", max_hamming=16)
    got = [(r.id_a, r.id_b) for r in dups.collect()]
    assert (1, 2) in got


def test_ngram_jaccard_vs_duck(spark, duck):
    pairs = ngram_jaccard_pairs(
        spark.read.parquet(duck.sql("SELECT 1").fetchall() and
                           f"{SF}/documents.parquet") if False else None,
        "doc_id") if False else None
    # small controlled input instead — exact jaccard values
    rows = [(1, "a b c d e"), (2, "a b c d f"), (3, "z y x w v")]
    df = _spark_from(spark, rows)
    out = ngram_jaccard_pairs(df, "doc_id", threshold=0.1)
    got = {(r.id_a, r.id_b): r.jaccard for r in out.collect()}
    # doc1: shingles {abc,bcd,cde}; doc2: {abc,bcd,cdf}; common=2, union=4
    assert got == {(1, 2): 0.5}


def _spark_from(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_brute_force_topk_vs_duck(emb, duck, spark):
    qvec = emb.where(F.col("vec_id") == 0).select("embedding").first()[0]
    out = brute_force_topk(emb, qvec, k=5)
    qlit = "[" + ",".join(repr(float(x)) for x in qvec) + "]::DOUBLE[]"
    oracle = duck.sql(f"""
        SELECT vec_id, round(
            list_dot_product(embedding::DOUBLE[], {qlit})
            / (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
               * sqrt(list_dot_product({qlit}, {qlit}))), 6) AS sim
        FROM embeddings
        ORDER BY sim DESC, vec_id ASC LIMIT 5""")
    _match(out, oracle, ["vec_id"])


def test_lsh_ann_topk(emb):
    qvec = [float(x) for x in
            emb.where(F.col("vec_id") == 0).select("embedding").first()[0]]
    out = lsh_ann_topk(emb, qvec, k=5)
    rows = out.collect()
    assert 0 < len(rows) <= 5
    assert rows[0]["vec_id"] == 0  # the query vector itself is its own NN
    assert rows[0]["sim"] == 1.0


def test_bpe_ish_token_count(spark):
    df = spark.createDataFrame([(1, "hello, world! 123 foo_bar")], ["id", "text"])
    out = bpe_ish_token_count(df).select("n_bpe_tokens").first()[0]
    # hello , world ! 123 foo _ bar = 8
    assert out == 8


def test_shingle_fingerprint_stability(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f g"), (2, "a b c d e f g"), (3, "q r s t u v w")],
        ["id", "text"])
    out = {r.id: r.shingle_fp for r in shingle_fingerprint(df).collect()}
    assert out[1] == out[2] != out[3]


def test_simhash_near_dups_exact_match(spark):
    """max_hamming=0 is the single-chunk case: equi-join on the full hash
    (the 64-bit mask must not overflow LongType)."""
    from cascalog_spark.functions.dedup import simhash_near_dups

    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps"),
         (2, "the quick brown fox jumps"),
         (3, "a completely different sentence here")], ["doc_id", "text"])
    pairs = [tuple(r) for r in
             simhash_near_dups(docs, "doc_id", max_hamming=0).collect()]
    assert pairs == [(1, 2, 0)]


def test_cosine_pairs_empty_corpus(spark):
    from cascalog_spark.functions.similarity import cosine_pairs

    empty = spark.createDataFrame([], "vec_id bigint, embedding array<float>")
    assert cosine_pairs(empty).count() == 0


def test_exact_dedup_rejects_bad_keep(spark):
    from cascalog_spark.functions.dedup import exact_dedup

    docs = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="keep must be"):
        exact_dedup(docs, ["text"], "doc_id", keep="first")


def test_line_dup_ratio_regex_special_sep(spark):
    """A regex-special separator is treated literally."""
    from cascalog_spark.functions.text import line_dup_ratio

    d = spark.createDataFrame([("a.b.a",)], "text string")
    v = line_dup_ratio(d, sep=".").collect()[0]["line_dup_ratio"]
    assert abs(v - (1 - 2 / 3)) < 1e-6


def test_multiset_equal_bytes_vs_bytearray():
    from cascalog_spark.testing import multiset_equal

    assert multiset_equal([(b"png",)], [(bytearray(b"png"),)])


def test_chunk_text_overlap_and_edges(spark):
    from cascalog_spark.functions import chunk_text

    docs = spark.createDataFrame(
        [(1, "a b c d e f g h i j"),  # 10 tokens
         (2, "x y"),                  # shorter than one window
         (3, ""),                     # empty -> no rows
         ], "doc_id long, text string")
    rows = {(r.doc_id, r.chunk_idx): (r.chunk, r.n_tokens)
            for r in chunk_text(docs, max_tokens=4, overlap=2).collect()}
    # step=2: windows of 4 tokens starting at 0,2,4,6 -> ceil((10-2)/2)=4
    assert rows[(1, 0)] == ("a b c d", 4)
    assert rows[(1, 1)] == ("c d e f", 4)
    assert rows[(1, 3)] == ("g h i j", 4)
    assert rows[(2, 0)] == ("x y", 2)
    assert not any(k[0] == 3 for k in rows)
    with pytest.raises(ValueError, match="overlap"):
        chunk_text(docs, max_tokens=4, overlap=4)


def test_redact_pii_masks_and_counts(spark):
    from cascalog_spark.functions import redact_pii

    docs = spark.createDataFrame(
        [(1, "mail a@b.com or call +1 (555) 123-4567 from 10.0.0.1")],
        "doc_id long, text string")
    r = redact_pii(docs).collect()[0]
    assert (r.n_email, r.n_phone, r.n_ipv4) == (1, 1, 1)
    assert "[EMAIL]" in r.redacted and "[PHONE]" in r.redacted \
        and "[IPV4]" in r.redacted
    assert "a@b.com" not in r.redacted


def test_window_pack_lag_lead_rolling(spark):
    from pyspark.sql import functions as F

    from cascalog_spark.functions.window import (with_cumulative, with_lag,
                                                 with_lead, with_rolling)

    df = spark.createDataFrame(
        [(1, 1, 10.0), (1, 2, 20.0), (1, 3, 30.0), (2, 1, 5.0)],
        "k int, t int, v double")
    order = [F.col("t").asc()]
    out = with_lag(df, "v", ["k"], order, "prev")
    out = with_lead(out, "v", ["k"], order, "next")
    out = with_cumulative(out, F.sum("v"), ["k"], order, "run")
    out = with_rolling(out, F.avg("v"), ["k"], order, "avg2", preceding=1)
    rows = {(r.k, r.t): (r.prev, r.next, r.run, r.avg2)
            for r in out.collect()}
    assert rows[(1, 1)] == (None, 20.0, 10.0, 10.0)
    assert rows[(1, 2)] == (10.0, 30.0, 30.0, 15.0)
    assert rows[(1, 3)] == (20.0, None, 60.0, 25.0)
    assert rows[(2, 1)] == (None, None, 5.0, 5.0)


def test_contamination_and_decontaminate(spark):
    from pyspark.sql import functions as F

    from cascalog_spark.functions import contamination, decontaminate

    corpus = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "completely unrelated words here today friends"),
         (3, "quick brown fox is a common benchmark phrase")],
        "doc_id long, text string")
    bench = spark.createDataFrame(
        [(100, "we test the quick brown fox sentence")],
        "doc_id long, text string")
    hits = contamination(corpus, bench, k=3)
    got = {r.doc_id: r.n_hits for r in hits.collect()}
    # docs 1 and 3 share 3-gram "quick brown fox" (and doc 1 also
    # "the quick brown"); doc 2 shares nothing
    assert set(got) == {1, 3}
    assert got[1] >= 2 and got[3] >= 1
    clean = decontaminate(corpus, bench, k=3)
    assert [r.doc_id for r in clean.collect()] == [2]
    # scale shape: benchmark side is broadcast
    plan = hits._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" in plan


def test_contamination_bloom_equals_exact(spark, sf_dir):
    """Bloom-prefiltered contamination is bit-identical to the exact
    path at real data volume (FPs removed by the verify join), and the
    bloom itself admits every true shingle while rejecting most
    non-members."""
    from cascalog_spark.functions import (bloom_contains, contamination,
                                          contamination_bloom,
                                          shingle_bloom)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bench = docs.where("doc_id % 25 = 0")
    corp = docs.where("doc_id % 25 <> 0")
    exact = {(r.doc_id, r.n_hits)
             for r in contamination(corp, bench, k=3).collect()}
    blm = {(r.doc_id, r.n_hits)
           for r in contamination_bloom(corp, bench, k=3).collect()}
    assert exact == blm and exact

    # no false negatives: every benchmark shingle passes its own bloom
    from cascalog_spark.functions.corpus import with_shingles
    from cascalog_spark.functions.util import explode_fast
    from pyspark.sql import functions as F
    words = shingle_bloom(bench, k=3)
    bsh = (explode_fast(with_shingles(bench, "text", 3, "__sh"),
                        F.col("__sh"), "__s").select("__s").distinct())
    missed = bsh.where(~bloom_contains(words, F.col("__s"))).count()
    assert missed == 0
    # and the FP rate on non-member shingles is a real prefilter (<10%)
    csh = (explode_fast(with_shingles(corp, "text", 3, "__sh"),
                        F.col("__sh"), "__s").select("__s").distinct()
           .join(bsh, "__s", "left_anti"))
    n_non = csh.count()
    n_fp = csh.where(bloom_contains(words, F.col("__s"))).count()
    assert n_fp < 0.1 * n_non, (n_fp, n_non)


def test_remove_boilerplate_order_and_empty(spark):
    from cascalog_spark.functions import remove_boilerplate

    docs = spark.createDataFrame(
        [(1, "COOKIE\nreal content one\nCOOKIE\nmore text"),
         (2, "COOKIE\nother body"),
         (3, "COOKIE"),
         (4, "untouched doc")],
        "doc_id long, text string")
    out = {r.doc_id: (r.clean, r.n_kept, r.n_removed)
           for r in remove_boilerplate(docs, min_docs=3).collect()}
    # line order survives reassembly; doc 3 becomes empty, not dropped
    assert out[1] == ("real content one\nmore text", 2, 2)
    assert out[2] == ("other body", 1, 1)
    assert out[3] == ("", 0, 1)
    assert out[4] == ("untouched doc", 1, 0)


def test_stratified_sample_deterministic_no_shuffle(spark):
    from cascalog_spark.functions import stratified_sample

    df = spark.createDataFrame(
        [(i, "a" if i % 2 == 0 else "b") for i in range(2000)],
        "doc_id long, source string")
    s1 = stratified_sample(df, {"a": 1.0, "b": 0.25}, "source")
    s2 = stratified_sample(df, {"a": 1.0, "b": 0.25}, "source")
    r1 = sorted(r.doc_id for r in s1.collect())
    assert r1 == sorted(r.doc_id for r in s2.collect())  # deterministic
    n_a = sum(1 for r in s1.collect() if r.source == "a")
    n_b = sum(1 for r in s1.collect() if r.source == "b")
    assert n_a == 1000              # fraction 1.0 keeps everything
    assert 150 < n_b < 350          # ~25% of 1000
    # unlisted strata keep nothing
    assert stratified_sample(df, {"a": 1.0}, "source") \
        .where("source = 'b'").count() == 0
    # map-side only: no Exchange in the plan
    plan = s1._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_pack_sequences_budget_and_positions(spark):
    from cascalog_spark.functions import pack_sequences

    rows = [(i, "s", " ".join(["w"] * 40)) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = sorted((r.doc_id, r.seq_id, r.seq_pos)
                 for r in pack_sequences(df, max_tokens=100).collect())
    # 40-token docs: docs start at offsets 0,40,80,120... → seq changes
    # when offset crosses each 100-token boundary
    assert out[0] == (0, 0, 0) and out[1] == (1, 0, 1) and out[2] == (2, 0, 2)
    assert out[3] == (3, 1, 0)   # offset 120 → seq 1
    seqs = {}
    for d, s, p in out:
        seqs.setdefault(s, []).append(p)
    for ps in seqs.values():
        assert ps == list(range(len(ps)))  # dense positions per sequence


def test_exact_dedup_incremental_batches(spark):
    """Continuous-ingest dedup: batch 2 drops rows whose fingerprint was
    seen in batch 1 OR earlier in batch 2; the index accumulates one row
    per distinct key."""
    from cascalog_spark.functions.dedup import exact_dedup_incremental

    b1 = spark.createDataFrame(
        [(1, "aa"), (2, "bb"), (3, "aa")], "doc_id long, fp string")
    u1, idx1 = exact_dedup_incremental(b1, None, ["fp"], "doc_id")
    assert sorted(r.doc_id for r in u1.collect()) == [1, 2]  # 3 dups 1
    assert sorted((r.fp, r.keep_id) for r in idx1.collect()) == \
        [("aa", 1), ("bb", 2)]

    b2 = spark.createDataFrame(
        [(10, "bb"), (11, "cc"), (12, "cc"), (13, "dd")],
        "doc_id long, fp string")
    u2, idx2 = exact_dedup_incremental(b2, idx1, ["fp"], "doc_id")
    # bb already indexed; cc dedups within the batch; dd is novel
    assert sorted(r.doc_id for r in u2.collect()) == [11, 13]
    assert sorted((r.fp, r.keep_id) for r in idx2.collect()) == \
        [("aa", 1), ("bb", 2), ("cc", 11), ("dd", 13)]


def test_corpus_ops_invariants_random_docs(spark):
    """Invariant fuzz for the corpus pack on pseudo-random docs:

    - remove_boilerplate with an unreachable threshold is an identity on
      text; per-doc kept+removed always equals the line count
    - pack_sequences: token offsets of a sequence's docs all fall inside
      that sequence's budget window, positions are dense, and every doc
      appears exactly once
    - stratified_sample at fraction 1.0/0.0 keeps all/none; sampling is a
      subset of the input
    """
    import random

    from cascalog_spark.functions import (pack_sequences,
                                          remove_boilerplate,
                                          stratified_sample)

    rng = random.Random(123)
    vocab = [f"w{i}" for i in range(30)]
    rows = []
    for i in range(200):
        n = rng.randint(0, 40)
        rows.append((i, " ".join(rng.choice(vocab) for _ in range(n)),
                     f"s{i % 3}"))
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")

    # boilerplate identity below threshold
    out = {r.doc_id: r for r in
           remove_boilerplate(df, min_docs=10**6, sep=" ").collect()}
    for i, text, _ in rows:
        toks = [t for t in text.split(" ") if t]
        assert out[i].clean == " ".join(toks)
        assert out[i].n_removed == 0 and out[i].n_kept == len(toks)

    # packing invariants
    packed = pack_sequences(df, max_tokens=64, part_col="source").collect()
    assert sorted(r.doc_id for r in packed) == [r[0] for r in rows]
    by_shard = {}
    for r in packed:
        by_shard.setdefault(r.source, []).append(r)
    for src, rs in by_shard.items():
        rs.sort(key=lambda r: r.doc_id)
        offset = 0
        for r in rs:
            assert r.seq_id == offset // 64, (src, r)
            offset += r.n_tokens
        seqs = {}
        for r in rs:
            seqs.setdefault(r.seq_id, []).append(r.seq_pos)
        for ps in seqs.values():
            assert sorted(ps) == list(range(len(ps)))

    # sampling bounds
    assert stratified_sample(df, 1.0, "source").count() == 200
    assert stratified_sample(df, 0.0, "source").count() == 0
    some = stratified_sample(df, 0.4, "source")
    ids = {r.doc_id for r in some.collect()}
    assert ids <= set(range(200)) and 30 < len(ids) < 130


def test_stratified_sample_mixture_table_and_pack_shards(spark):
    from pyspark.sql import functions as F

    from cascalog_spark.functions import pack_sequences, stratified_sample

    df = spark.createDataFrame(
        [(i, "a" if i % 2 == 0 else "b", " ".join(["w"] * 20))
         for i in range(1000)],
        "doc_id long, source string, text string")

    # mixture-table form == dict form, row for row
    wtab = spark.createDataFrame([("a", 1.0), ("b", 0.25)],
                                 "source string, fraction double")
    via_tab = sorted(r.doc_id for r in
                     stratified_sample(df, wtab, "source").collect())
    via_dict = sorted(r.doc_id for r in
                      stratified_sample(df, {"a": 1.0, "b": 0.25},
                                        "source").collect())
    assert via_tab == via_dict
    # strata missing from the table keep nothing
    only_a = spark.createDataFrame([("a", 1.0)], "source string, fraction double")
    assert stratified_sample(df, only_a, "source") \
        .where("source = 'b'").count() == 0

    # sharded packing: every doc appears once; window partitions bounded
    packed = pack_sequences(df, max_tokens=100, n_shards=8)
    rows = packed.collect()
    assert sorted(r.doc_id for r in rows) == list(range(1000))
    assert set(r.shard for r in rows) <= set(range(8))
    # offsets and dense positions hold within each (source, shard)
    by_part = {}
    for r in rows:
        by_part.setdefault((r.source, r.shard), []).append(r)
    for rs in by_part.values():
        rs.sort(key=lambda r: r.doc_id)
        offset = 0
        for r in rs:
            assert r.seq_id == offset // 100
            offset += r.n_tokens


def _n_cached_rdds(spark):
    return len([i for i in
                spark.sparkContext._jsc.sc().getRDDStorageInfo()])


def test_cosine_pairs_cache_release(spark):
    """Repeated cosine_pairs calls must not accumulate persisted blocks
    once released — release_cosine_cache / cosine_pairs_scoped contract."""
    from cascalog_spark.functions import (cosine_pairs, cosine_pairs_scoped,
                                          release_cosine_cache)

    rows = [(i, [float(i % 5), float((i * 3) % 7), 1.0]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    # NB: comparing global RDDStorageInfo counts before/after is flaky in a
    # shared session (ContextCleaner reaps other tests' blocks concurrently)
    # — assert on the specific cache's storage level instead
    for _ in range(3):
        pairs = cosine_pairs(df, threshold=0.99, n_planes=4, dim=3)
        pairs.count()
        sig = pairs._cosine_sig_cache
        assert sig is not None and sig.storageLevel.useMemory
        assert release_cosine_cache(pairs) is True
        assert not (sig.storageLevel.useMemory or sig.storageLevel.useDisk)
        assert release_cosine_cache(pairs) is False  # idempotent
    with cosine_pairs_scoped(df, threshold=0.99, n_planes=4, dim=3) as p:
        p.count()
        sig = p._cosine_sig_cache
        assert sig is not None and sig.storageLevel.useMemory
    assert not (sig.storageLevel.useMemory or sig.storageLevel.useDisk)
    # materialize=False results have nothing to release
    p2 = cosine_pairs(df, threshold=0.99, n_planes=4, dim=3,
                      materialize=False)
    assert release_cosine_cache(p2) is False


def test_get_out_fields_dataframe(spark):
    """DataFrames are generators everywhere; IOutputFields must agree."""
    from cascalog_spark.api import get_out_fields, num_out_fields

    df = spark.createDataFrame([(1, "a")], ["k", "v"])
    assert get_out_fields(df) == ["k", "v"]
    assert num_out_fields(df) == 2


def test_execute_two_arg_rows_generator(spark, tmp_path):
    """A literal-rows generator (itself a list) in the 2-arg execute form
    must be treated as (query, sink), not misread as multi-sink pairs."""
    from cascalog_spark import execute

    got = []
    rows = [(1, "a"), (2, "b")]
    execute(spark, rows, lambda df: got.extend(df.collect()))
    assert sorted((r[0], r[1]) for r in got) == rows
    with pytest.raises(TypeError, match="neither"):
        execute(spark, rows, "not-a-sink")


def test_remove_boilerplate_no_broadcast_same_answer(spark):
    from cascalog_spark.functions import remove_boilerplate

    docs = spark.createDataFrame(
        [(1, "HOT\nbody one"), (2, "HOT\nbody two"), (3, "HOT\nbody three")],
        "doc_id long, text string")
    bc = {tuple(r) for r in remove_boilerplate(docs, min_docs=3).collect()}
    sj = {tuple(r) for r in
          remove_boilerplate(docs, min_docs=3, broadcast=False).collect()}
    assert bc == sj
    plan = (remove_boilerplate(docs, min_docs=3, broadcast=False)
            ._jdf.queryExecution().executedPlan().toString())
    # escape hatch really avoids the broadcast on the anti-join side
    assert "BroadcastHashJoin LeftAnti" not in plan


def test_ivf_centroids_kmeans_tiny_input(spark):
    """k must derive from the rows the fit sees: a tiny corpus with a
    fractional sample that could return < k rows still fits cleanly."""
    from cascalog_spark.functions.similarity import ivf_centroids_kmeans

    rows = [(i, [float(i), float(i * 2), 1.0]) for i in range(6)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = ivf_centroids_kmeans(df, n_centroids=4, sample_rows=2, seed=7)
    assert 1 <= len(cents) <= 4
    assert all(len(v) == 3 for _, v in cents)
    ids = [c for c, _ in cents]
    assert ids == list(range(len(ids)))


def test_gopher_rules_branches(spark):
    """Exercise every rule branch the synthetic corpus can't: bullets,
    ellipsis lines/chars, hash symbols, non-alpha tokens, empty doc."""
    from cascalog_spark.functions.text import gopher_rules

    good = ("the data and that table have rows with " * 8).strip()
    rows = [
        (1, good),                                    # passes everything
        (2, "short one"),                             # n_tokens
        (3, "- a\n- b\n- c\nthe of and that " + good),  # bullet_lines
        (4, ("so it goes...\nand on...\nmore...\nthe end\n" + good)),
        (5, "# ## ### #### " + good),                 # hash_ratio
        (6, ("12345 67890 11111 22222 33333 44444 " * 8 + good)),
        (7, ""),                                      # empty: n_tokens+…
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = gopher_rules(df, min_tokens=40, max_bullet_line_frac=0.2,
                       max_ellipsis_line_frac=0.3,
                       max_hash_word_ratio=0.05,
                       min_alpha_word_frac=0.9)
    got = {r.doc_id: (r.keep, list(r.fail_reasons)) for r in out.collect()}
    assert got[1] == (True, [])
    assert got[2][0] is False and "n_tokens" in got[2][1]
    assert "bullet_lines" in got[3][1]
    assert "ellipsis_lines" in got[4][1]
    assert "hash_ratio" in got[5][1]
    assert "alpha_words" in got[6][1]
    assert got[7][0] is False and "n_tokens" in got[7][1]
    # reasons are sorted + deduped-by-construction
    for _, reasons in got.values():
        assert reasons == sorted(reasons)


def test_repetition_signals_edges(spark):
    from cascalog_spark.functions import repetition_signals

    docs = spark.createDataFrame(
        [(1, "spam spam spam spam"),       # one repeated token
         (2, "all tokens here are unique"),
         (3, "ab"),                        # fewer than n tokens
         (4, "")],                         # empty doc
        "doc_id long, text string")
    out = {r.doc_id: (r.top_ngram_char_frac, r.dup_ngram_char_frac)
           for r in repetition_signals(docs, n_top=2, n_dup=2).collect()}
    assert len(out) == 4, "every doc keeps a row"
    # doc 1: 3x "spam spam" covers 3*8=24 > 16 chars -> clamped to 1.0
    assert out[1] == (1.0, 1.0)
    # doc 2: every 2-gram unique; top covers its own chars only
    assert out[2][1] == 0.0 and 0.0 < out[2][0] < 1.0
    assert out[3] == (0.0, 0.0) and out[4] == (0.0, 0.0)


def test_cap_per_stratum_deterministic(spark):
    from cascalog_spark.functions import cap_per_stratum

    rows = [(i, f"s{i % 3}") for i in range(90)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    a = sorted((r.doc_id, r.source)
               for r in cap_per_stratum(df, 5, "source", seed=1).collect())
    b = sorted((r.doc_id, r.source)
               for r in cap_per_stratum(df, 5, "source", seed=1).collect())
    assert a == b and len(a) == 15
    from collections import Counter
    assert set(Counter(s for _, s in a).values()) == {5}
    c = sorted((r.doc_id, r.source)
               for r in cap_per_stratum(df, 5, "source", seed=2).collect())
    assert c != a, "seed changes the kept set"
    # cap above the stratum size keeps everything
    assert cap_per_stratum(df, 100, "source").count() == 90


def test_asof_join_semantics(spark):
    from datetime import datetime as DT

    from cascalog_spark.operators import asof_join
    from pyspark.sql import functions as F

    t = lambda s: DT(2024, 1, s)
    left = spark.createDataFrame(
        [(1, "u1", t(5)), (2, "u1", t(10)), (3, "u2", t(3)), (4, "u3", t(7))],
        "lid long, user string, ts timestamp")
    right = spark.createDataFrame(
        [("u1", t(4), 100, 1.0),   # before both u1 rows
         ("u1", t(10), 200, 2.0),  # ties lid=2's ts -> inclusive match
         ("u1", t(10), 300, 3.0),  # same ts: greater tiebreak (rid) wins
         ("u2", t(9), 400, 4.0)],  # after u2's only left row -> no match
        "user string, ts timestamp, rid long, val double")
    out = {r.lid: (r.rid, r.val) for r in
           asof_join(left, right, on="user", right_cols=["rid", "val"],
                     tiebreak="rid").collect()}
    assert out[1] == (100, 1.0)
    assert out[2] == (300, 3.0)          # inclusive + deterministic tiebreak
    assert out[3] == (None, None)        # right is later than left
    assert out[4] == (None, None)        # key missing entirely
    # tolerance: a 12h window voids lid=1's 1-day-old match but keeps
    # lid=2's same-timestamp match
    tol = {r.lid: r.rid for r in
           asof_join(left, right, on="user", right_cols=["rid", "val"],
                     tiebreak="rid",
                     tolerance=F.expr("INTERVAL 12 HOURS")).collect()}
    assert tol[1] is None and tol[2] == 300


def test_asof_join_single_key_shuffle(spark):
    """The whole as-of join must cost ONE hash exchange on the key."""
    from cascalog_spark.operators import asof_join

    left = spark.createDataFrame([(1, 5, 10)], "lid long, k long, ts long")
    right = spark.createDataFrame([(5, 8, 7)], "k long, ts long, v long")
    plan = (asof_join(left, right, on="k", right_cols=["v"])
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("Exchange hashpartitioning") == 1
    assert "SinglePartition" not in plan


def test_knn_join_matches_per_query_bruteforce(spark):
    from cascalog_spark.functions import knn_join
    from cascalog_spark.functions.similarity import brute_force_topk

    rows = [(i, [float((i * 7 + j) % 11) for j in range(4)])
            for i in range(60)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = (emb.where("vec_id < 3")
               .withColumnRenamed("vec_id", "query_id"))
    got = {}
    for r in knn_join(emb, queries, k=4).collect():
        got.setdefault(r.query_id, []).append((r.vec_id, r.sim))
    assert set(got) == {0, 1, 2}
    for qid, vec in [(q, v) for q, v in rows[:3]]:
        expect = [(r.vec_id, r.sim)
                  for r in brute_force_topk(emb, vec, k=4).collect()]
        assert sorted(got[qid]) == sorted(expect), f"query {qid}"


def test_knn_join_plan_broadcasts_queries(spark):
    from cascalog_spark.functions import knn_join

    emb = spark.createDataFrame([(0, [1.0, 0.0])],
                                "vec_id long, embedding array<double>")
    q = emb.withColumnRenamed("vec_id", "query_id")
    plan = (knn_join(emb, q, k=2)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastNestedLoopJoin" in plan
    assert "SinglePartition" not in plan  # no global-window funnel


def test_top_ngrams_occurrence_vs_docfreq(spark):
    from cascalog_spark.functions import top_ngrams

    docs = spark.createDataFrame(
        [(1, "x y x y x y"),   # "x y" occurs 3x in one doc
         (2, "a b"), (3, "a b")],
        "doc_id long, text string")
    occ = {r.ngram: r.n_occurrences
           for r in top_ngrams(docs, n=2, k=10).collect()}
    assert occ["x y"] == 3 and occ["a b"] == 2
    df_ = {r.ngram: r.n_occurrences
           for r in top_ngrams(docs, n=2, k=10, by_doc_freq=True).collect()}
    assert df_["x y"] == 1 and df_["a b"] == 2
    # plan: top-k must be TakeOrderedAndProject, not a global sort
    plan = (top_ngrams(docs, n=2, k=10)
            ._jdf.queryExecution().executedPlan().toString())
    assert "TakeOrderedAndProject" in plan


def test_round3_ops_empty_inputs(spark):
    """Empty left/right/corpus inputs: every round-3 operator returns an
    empty (or left-padded) result with the right schema, never throws."""
    from cascalog_spark.functions import (cap_per_stratum, knn_join,
                                          repetition_signals, top_ngrams)
    from cascalog_spark.operators import asof_join

    docs0 = spark.createDataFrame([], "doc_id long, text string, source string")
    assert repetition_signals(docs0).count() == 0
    assert top_ngrams(docs0).count() == 0
    assert cap_per_stratum(docs0, 5, "source").count() == 0

    left = spark.createDataFrame([(1, 5, 10)], "lid long, k long, ts long")
    right0 = spark.createDataFrame([], "k long, ts long, v long")
    out = asof_join(left, right0, on="k", right_cols=["v"]).collect()
    assert [(r.lid, r.v) for r in out] == [(1, None)]  # left row padded
    left0 = spark.createDataFrame([], "lid long, k long, ts long")
    right = spark.createDataFrame([(5, 8, 7)], "k long, ts long, v long")
    assert asof_join(left0, right, on="k", right_cols=["v"]).count() == 0

    emb = spark.createDataFrame([(0, [1.0, 0.0])],
                                "vec_id long, embedding array<double>")
    q0 = spark.createDataFrame([], "query_id long, embedding array<double>")
    assert knn_join(emb, q0, k=3).count() == 0
    emb0 = spark.createDataFrame([], "vec_id long, embedding array<double>")
    qs = emb.withColumnRenamed("vec_id", "query_id")
    assert knn_join(emb0, qs, k=3).count() == 0


def test_ivf_knn_join_matches_per_query_ivf_topk(spark):
    """The batch IVF join must agree exactly with the single-query IVF
    path given the same centroids and probe count."""
    from cascalog_spark.functions import ivf_knn_join
    from cascalog_spark.functions.similarity import (ivf_ann_topk,
                                                     ivf_centroids)

    rows = [(i, [float((i * 13 + j * 7) % 23 - 11) for j in range(6)])
            for i in range(80)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = ivf_centroids(emb, n_centroids=8)
    queries = (emb.where("vec_id < 3")
               .withColumnRenamed("vec_id", "query_id"))
    got = {}
    for r in ivf_knn_join(emb, queries, cents, k=4, n_probe=3).collect():
        got.setdefault(r.query_id, []).append((r.vec_id, r.sim))
    assert set(got) == {0, 1, 2}
    for qid, vec in rows[:3]:
        expect = [(r.vec_id, r.sim) for r in
                  ivf_ann_topk(emb, vec, k=4, n_probe=3,
                               centroids=cents).collect()]
        assert sorted(got[qid]) == sorted(expect), f"query {qid}"
    # plan: candidates come from an equi-join on the cell id — never a
    # cartesian/nested-loop product of corpus x queries
    plan = (ivf_knn_join(emb, queries, cents, k=4, n_probe=3)
            ._jdf.queryExecution().executedPlan().toString())
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_knn_joins_ignore_null_vectors(spark):
    from cascalog_spark.functions import ivf_knn_join, knn_join
    from cascalog_spark.functions.similarity import ivf_centroids

    emb = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, None), (2, [0.9, 0.1]), (3, [0.0, 1.0])],
        "vec_id long, embedding array<double>")
    qs = spark.createDataFrame(
        [(100, [1.0, 0.0]), (101, None)],
        "query_id long, embedding array<double>")
    got = knn_join(emb, qs, k=2).collect()
    assert {r.query_id for r in got} == {100}
    assert all(r.vec_id != 1 for r in got)
    cents = ivf_centroids(emb.where("embedding is not null"), n_centroids=2)
    got2 = ivf_knn_join(emb, qs, cents, k=2, n_probe=2).collect()
    assert {r.query_id for r in got2} == {100}
    assert all(r.vec_id != 1 for r in got2)


def test_asof_join_multi_key(spark):
    from cascalog_spark.operators import asof_join

    left = spark.createDataFrame(
        [(1, "a", "x", 10), (2, "a", "y", 10), (3, "b", "x", 10)],
        "lid long, k1 string, k2 string, ts long")
    right = spark.createDataFrame(
        [("a", "x", 5, 100), ("a", "y", 7, 200), ("b", "z", 1, 300)],
        "k1 string, k2 string, ts long, v long")
    out = {r.lid: r.v for r in
           asof_join(left, right, on=["k1", "k2"],
                     right_cols=["v"]).collect()}
    assert out == {1: 100, 2: 200, 3: None}


def test_semantic_dedup_greedy_first_wins(spark):
    from cascalog_spark.functions import semantic_dedup, semantic_dedup_losers

    # vec 1 duplicates vec 0; vec 3 duplicates vec 2; vec 4 is alone.
    # Explicit centroids so each dup pair shares a cell (first-k-ids
    # seeding would make vec 1 its own centroid → boundary miss, the
    # documented approximation of cluster-blocked dedup).
    emb = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.999, 0.01]), (2, [0.0, 1.0]),
         (3, [0.01, 0.999]), (4, [-1.0, -1.0])],
        "vec_id long, embedding array<double>")
    cents = [(0, [1.0, 0.0]), (1, [0.0, 1.0]), (2, [-1.0, -1.0])]
    losers = {r.vec_id for r in
              semantic_dedup_losers(emb, threshold=0.95,
                                    centroids=cents).collect()}
    assert losers == {1, 3}
    kept = {r.vec_id for r in
            semantic_dedup(emb, threshold=0.95, centroids=cents).collect()}
    assert kept == {0, 2, 4}
    # empty input
    assert semantic_dedup(emb.limit(0), n_clusters=2).count() == 0


def test_semantic_dedup_join_is_cell_keyed(spark):
    """The candidate join must be an equi-join on the cluster id — a
    cartesian/BNL join here would be corpus² at scale."""
    from cascalog_spark.functions import semantic_dedup_losers

    emb = spark.createDataFrame(
        [(i, [float(i % 7), float((i * 3) % 5)]) for i in range(40)],
        "vec_id long, embedding array<double>")
    plan = semantic_dedup_losers(emb, n_clusters=4)._jdf \
        .queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_tf_idf_counts_and_topk(spark):
    from cascalog_spark.functions import tf_idf
    import math

    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "a c"), (3, "")],
        "doc_id long, text string")
    rows = {(r.doc_id, r.term): (r.tf, r.df, r.tfidf)
            for r in tf_idf(docs).collect()}
    # "a" appears in 2 docs, twice in doc 1
    assert rows[(1, "a")][0] == 2 and rows[(1, "a")][1] == 2
    assert rows[(2, "c")][0] == 1 and rows[(2, "c")][1] == 1
    exp = round(2 * (math.log((1 + 3) / (1 + 2)) + 1.0), 6)
    assert abs(rows[(1, "a")][2] - exp) < 1e-9
    # empty doc contributes no terms
    assert not any(d == 3 for d, _ in rows)
    top1 = tf_idf(docs, top_k=1).collect()
    assert {r.doc_id for r in top1} == {1, 2}
    assert all(r.rank == 1 for r in top1)


def test_tf_idf_single_explode(spark):
    """With materialize=True the df branch reads the persisted tf
    aggregate (InMemoryTableScan) — the corpus is tokenized once; the
    release helper drops the cache."""
    from cascalog_spark.functions import tf_idf
    from cascalog_spark.functions.text import release_tfidf_cache

    docs = spark.createDataFrame([(1, "x y"), (2, "y z")],
                                 "doc_id long, text string")
    out = tf_idf(docs)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # both the output branch and the df branch consume the SAME persisted
    # tf aggregate (the printer shows the cached definition under each
    # InMemoryTableScan; runtime computes it once)
    assert plan.count("InMemoryTableScan") == 2
    assert release_tfidf_cache(out) is True
    assert release_tfidf_cache(out) is False
    # opt-out path recomputes instead of caching
    plain = tf_idf(docs, materialize=False)
    p2 = plain._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" not in p2


def test_mix_corpora_weight_semantics(spark):
    import pytest
    from cascalog_spark.functions import mix_corpora

    a = spark.createDataFrame([(i, "a") for i in range(40)],
                              "doc_id long, text string")
    b = spark.createDataFrame([(i, "b") for i in range(100, 140)],
                              "doc_id long, text string")
    out = mix_corpora({"a": (a, 2.0), "b": (b, 1.0)})
    rows = out.groupBy("mix_source").count().collect()
    got = {r.mix_source: r["count"] for r in rows}
    assert got == {"a": 80, "b": 40}      # integer weights are exact
    eps = {r.epoch for r in out.where("mix_source = 'a'").collect()}
    assert eps == {0, 1}
    # fractional weight: deterministic subset, repeatable
    half = mix_corpora({"a": (a, 0.5)})
    n1 = half.count()
    assert 0 < n1 < 40
    assert mix_corpora({"a": (a, 0.5)}).count() == n1
    # weight 0 → source fully dropped
    assert mix_corpora({"a": (a, 0.0)}).count() == 0
    with pytest.raises(ValueError):
        mix_corpora({})
    with pytest.raises(ValueError):
        mix_corpora({"a": (a, -1.0)})


def test_mix_corpora_map_side_only(spark):
    """The mixture is filters + explode + union — NO shuffle."""
    from cascalog_spark.functions import mix_corpora

    a = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    b = spark.createDataFrame([(2, "y")], "doc_id long, text string")
    plan = mix_corpora({"a": (a, 1.5), "b": (b, 0.25)})._jdf \
        .queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_range_join_semantics(spark):
    from cascalog_spark.operators import range_join

    pts = spark.createDataFrame(
        [(1, "a", 5.0), (2, "a", 10.0), (3, "a", 15.0), (4, "b", 5.0),
         (5, "a", 99.0)],
        "pid long, k string, v double")
    iv = spark.createDataFrame(
        [(10, "a", 0.0, 10.0), (11, "a", 10.0, 20.0), (12, "b", 4.0, 6.0)],
        "iid long, k string, lo double, hi double")
    # half-open [lo, hi): v=10 matches interval 11 only
    got = sorted((r.pid, r.iid) for r in
                 range_join(pts, iv, "v", "lo", "hi", on="k",
                            bucket=7.0).collect())
    assert got == [(1, 10), (2, 11), (3, 11), (4, 12)]
    # inclusive hi: v=10 matches both
    got2 = sorted((r.pid, r.iid) for r in
                  range_join(pts, iv, "v", "lo", "hi", on="k", bucket=7.0,
                             hi_inclusive=True).collect())
    assert (2, 10) in got2 and (2, 11) in got2
    # left join keeps unmatched points
    got3 = sorted((r.pid, r.iid) for r in
                  range_join(pts, iv, "v", "lo", "hi", on="k", bucket=7.0,
                             how="left").collect())
    assert (5, None) in got3
    # without keys: cross-key containment
    got4 = sorted((r.pid, r.iid) for r in
                  range_join(pts, iv, "v", "lo", "hi", bucket=7.0).collect())
    assert (4, 10) in got4  # b-point in a-interval once keys are dropped


def test_interval_overlap_join_equiv_and_no_dups(spark):
    """interval_overlap_join == the naive overlap predicate on random
    intervals (multi-bucket spans, shared keys, touching endpoints) —
    each overlapping pair exactly once (bucket attribution, no
    distinct)."""
    import random

    from cascalog_spark.operators import interval_overlap_join

    rng = random.Random(5)
    L = [(i, rng.choice(["a", "b"]), lo := rng.uniform(0, 100),
          lo + rng.uniform(0, 30)) for i in range(60)]
    R = [(i, rng.choice(["a", "b"]), lo := rng.uniform(0, 100),
          lo + rng.uniform(0, 30)) for i in range(60)]
    ldf = spark.createDataFrame(L, "lid long, k string, lo double, hi double")
    rdf = spark.createDataFrame(R, "rid long, k string, lo double, hi double")
    got = [(r.lid, r.rid) for r in
           interval_overlap_join(ldf, rdf, "lo", "hi", "lo", "hi",
                                 on="k", bucket=8.0).collect()]
    want = [(a[0], b[0]) for a in L for b in R
            if a[1] == b[1] and a[2] < b[3] and b[2] < a[3]]
    assert sorted(got) == sorted(want) and len(got) == len(set(got))
    # half-open: touching endpoints do NOT overlap
    t1 = spark.createDataFrame([(1, 0.0, 5.0)], "lid long, lo double, hi double")
    t2 = spark.createDataFrame([(2, 5.0, 9.0)], "rid long, lo double, hi double")
    assert interval_overlap_join(t1, t2, "lo", "hi", "lo", "hi",
                                 bucket=4.0).count() == 0


def test_interval_overlap_join_plan_and_guard(spark):
    import pytest

    from cascalog_spark.operators import interval_overlap_join

    a = spark.createDataFrame([(1, 0.0, 10.0)], "lid long, lo double, hi double")
    b = spark.createDataFrame([(2, 5.0, 15.0)], "rid long, lo double, hi double")
    out = interval_overlap_join(a, b, "lo", "hi", "lo", "hi", bucket=2.0)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
    assert out.count() == 1
    with pytest.raises(Exception, match="spans more than"):
        interval_overlap_join(a, b, "lo", "hi", "lo", "hi", bucket=0.001,
                              max_buckets_per_interval=10).count()


def test_range_join_no_nested_loop_and_guard(spark):
    import pytest
    from cascalog_spark.operators import range_join

    pts = spark.createDataFrame([(1, 5.0)], "pid long, v double")
    iv = spark.createDataFrame([(1, 0.0, 10.0)], "iid long, lo double, hi double")
    plan = range_join(pts, iv, "v", "lo", "hi", bucket=1.0)._jdf \
        .queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
    # an interval spanning > max buckets fails loudly, never truncates
    wide = spark.createDataFrame([(1, 0.0, 1e9)], "iid long, lo double, hi double")
    with pytest.raises(Exception, match="spans more than"):
        range_join(pts, wide, "v", "lo", "hi", bucket=1.0,
                   max_buckets_per_interval=100).collect()


def test_range_join_timestamp_and_collisions(spark):
    from pyspark.sql import functions as F
    from cascalog_spark.operators import range_join

    ev = spark.createDataFrame(
        [(1, "u1", "2024-01-01 10:30:00"), (2, "u1", "2024-01-01 13:00:00")],
        "event_id long, user_id string, ts string") \
        .withColumn("ts", F.to_timestamp("ts"))
    win = spark.createDataFrame(
        [(7, "u1", "2024-01-01 10:00:00", "2024-01-01 11:00:00")],
        "event_id long, user_id string, lo string, hi string") \
        .withColumn("lo", F.to_timestamp("lo")).withColumn("hi", F.to_timestamp("hi"))
    out = range_join(ev, win, "ts", "lo", "hi", on="user_id", bucket=3600.0)
    rows = out.collect()
    assert [(r.event_id, r.event_id_r) for r in rows] == [(1, 7)]


def test_quantize_dequantize_roundtrip(spark):
    from cascalog_spark.functions import (dequantize_col, quantization_stats,
                                          quantize_embeddings)
    from pyspark.sql import functions as F

    emb = spark.createDataFrame(
        [(0, [0.0, -1.0, 5.0]), (1, [1.0, 1.0, 5.0]), (2, [0.5, 0.0, 5.0])],
        "vec_id long, embedding array<double>")
    stats = quantization_stats(emb)
    assert stats == ([0.0, -1.0, 5.0], [1.0, 1.0, 5.0])
    qz = quantize_embeddings(emb, stats=stats)
    codes = {r.vec_id: r.codes for r in qz.collect()}
    assert codes[0] == [0, 0, 0]          # mins → 0; zero-width dim → 0
    assert codes[1] == [255, 255, 0]      # maxs clamp to 255
    assert codes[2] == [128, 128, 0]
    # reconstruction error bounded by half a bucket
    rec = qz.withColumn("r", dequantize_col(F.col("codes"), stats))
    for row in rec.collect():
        for orig, approx, mn, mx in zip(row.embedding, row.r,
                                        stats[0], stats[1]):
            width = (mx - mn) if mx > mn else 1.0
            assert abs(orig - approx) <= width / 256.0 + 1e-12
    # quantization is a pure map — no shuffle
    plan = qz._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_linear_text_classifier(spark):
    import math
    import pytest
    from cascalog_spark.functions import linear_text_classifier

    docs = spark.createDataFrame([(1, "hello world"), (2, "")],
                                 "doc_id long, text string")
    # uniform weights: score depends only on token count
    out = {r.doc_id: r.score
           for r in linear_text_classifier(
               docs, [0.5] * 8, bias=-0.25).collect()}
    assert abs(out[1] - round(1 / (1 + math.exp(-(-0.25 + 1.0))), 6)) < 1e-9
    assert abs(out[2] - round(1 / (1 + math.exp(0.25)), 6)) < 1e-9
    with pytest.raises(ValueError):
        linear_text_classifier(docs, [])
    # pure map: no exchange, no python UDF
    plan = linear_text_classifier(docs, [0.1] * 4)._jdf \
        .queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan


def test_unigram_nll_math(spark):
    import math
    from cascalog_spark.functions import unigram_nll
    from cascalog_spark.functions.text import release_tfidf_cache

    docs = spark.createDataFrame([(1, "a a b"), (2, "b"), (3, "")],
                                 "doc_id long, text string")
    out = unigram_nll(docs, alpha=0.5)
    rows = {r.doc_id: r.nll for r in out.collect()}
    # corpus: a->2, b->2, total 4, vocab 2
    pa = (2 + 0.5) / (4 + 0.5 * 2)
    pb = (2 + 0.5) / (4 + 0.5 * 2)
    exp1 = round(-(2 * math.log(pa) + 1 * math.log(pb)) / 3, 6)
    exp2 = round(-math.log(pb), 6)
    assert abs(rows[1] - exp1) < 1e-9
    assert abs(rows[2] - exp2) < 1e-9
    assert 3 not in rows          # empty doc absent
    release_tfidf_cache(out)


def test_semantic_dedup_lsh_method(spark):
    """LSH-blocked semantic dedup: same keep-min-id semantics on a clear
    duplicate; cache handle propagated for release."""
    from cascalog_spark.functions import semantic_dedup, semantic_dedup_losers
    from cascalog_spark.functions.similarity import release_cosine_cache

    emb = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0]), (1, [0.999, 0.01, 0.0]),
         (2, [-1.0, 0.2, 0.4]), (3, [0.1, -0.9, 0.3])],
        "vec_id long, embedding array<double>")
    losers = semantic_dedup_losers(emb, threshold=0.95, method="lsh",
                                   n_planes=4, bands=2, dim=3)
    got = {r.vec_id for r in losers.collect()}
    assert got == {1}
    kept = {r.vec_id for r in
            semantic_dedup(emb, threshold=0.95, method="lsh",
                           n_planes=4, bands=2, dim=3).collect()}
    assert kept == {0, 2, 3}
    assert release_cosine_cache(losers) in (True, False)
    import pytest
    with pytest.raises(ValueError):
        semantic_dedup_losers(emb, method="nope")


def test_semantic_dedup_auto_selects_scale_path(spark, monkeypatch):
    """method='auto' (the default) picks the exact cells blocking below
    AUTO_LSH_THRESHOLD and the LSH scale path above it — the 100 TB
    default is the O(n·planes) path, not the superlinear Σ|cell|² one."""
    from cascalog_spark.functions import dedup as dd

    emb = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0]), (1, [0.999, 0.01, 0.0]),
         (2, [-1.0, 0.2, 0.4]), (3, [0.1, -0.9, 0.3])],
        "vec_id long, embedding array<double>")
    # below threshold → cells path (no LSH signature cache attached)
    small = dd.semantic_dedup_losers(emb, threshold=0.95, n_clusters=1)
    assert getattr(small, "_cosine_sig_cache", None) is None
    assert {r.vec_id for r in small.collect()} == {1}
    # force the corpus to look "big" → auto must route to lsh
    monkeypatch.setattr(dd, "AUTO_LSH_THRESHOLD", 2)
    big = dd.semantic_dedup_losers(emb, threshold=0.95,
                                   n_planes=4, bands=2, dim=3)
    assert hasattr(big, "_cosine_sig_cache")  # lsh path marker
    assert {r.vec_id for r in big.collect()} == {1}
    from cascalog_spark.functions.similarity import release_cosine_cache
    release_cosine_cache(big)


def test_semantic_dedup_threshold_inclusive_both_paths(spark):
    """sim == threshold drops the higher id on BOTH methods (>= parity)."""
    from cascalog_spark.functions import semantic_dedup_losers

    # identical vectors → sim exactly 1.0
    emb = spark.createDataFrame(
        [(0, [0.6, 0.8, 0.0]), (1, [0.6, 0.8, 0.0]), (2, [0.0, 0.0, 1.0])],
        "vec_id long, embedding array<double>")
    cells = {r.vec_id for r in
             semantic_dedup_losers(emb, threshold=1.0, n_clusters=1,
                                   method="cells").collect()}
    lsh = {r.vec_id for r in
           semantic_dedup_losers(emb, threshold=1.0, method="lsh",
                                 n_planes=4, bands=2, dim=3).collect()}
    assert cells == {1} and lsh == {1}


def test_scd2_history_and_merge(spark):
    from cascalog_spark.operators import scd2_history, scd2_merge

    ups = spark.createDataFrame(
        [("k1", "A", 1), ("k1", "A", 2), ("k1", "B", 3), ("k2", "X", 5)],
        "k string, v string, ts long")
    hist = {tuple(r) for r in scd2_history(ups, ["k"], ["v"]).collect()}
    assert hist == {("k1", "A", 1, 3), ("k1", "B", 3, None),
                    ("k2", "X", 5, None)}

    cur = spark.createDataFrame(
        [("k1", "Z", 0, 1),      # closed history — must pass untouched
         ("k1", "A", 1, None),   # open; batch's leading A@1,2 is a no-op
         ("k3", "Q", 0, None)],  # key absent from batch — stays open
        "k string, v string, eff_start long, eff_end long")
    merged = {tuple(r) for r in scd2_merge(cur, ups, ["k"], ["v"]).collect()}
    assert merged == {("k1", "Z", 0, 1),
                      ("k1", "A", 1, 3),     # closed at first real change
                      ("k1", "B", 3, None),  # new open version
                      ("k2", "X", 5, None),  # brand-new key
                      ("k3", "Q", 0, None)}  # untouched
    # merge with current=None is a pure history build
    again = {tuple(r) for r in scd2_merge(None, ups, ["k"], ["v"]).collect()}
    assert again == hist


def test_scd2_single_key_shuffle(spark):
    """scd2_history is windows over ONE key partitioning — exactly one
    exchange, no global sort."""
    from cascalog_spark.operators import scd2_history

    ups = spark.createDataFrame([("a", "x", 1), ("a", "y", 2)],
                                "k string, v string, ts long")
    plan = scd2_history(ups, ["k"], ["v"])._jdf \
        .queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Exchange rangepartitioning" not in plan


def test_histogram_edges_and_degenerate(spark):
    import pytest
    from cascalog_spark.functions import histogram

    df = spark.createDataFrame([(float(x),) for x in range(0, 101)],
                               "v double")
    h = {r.bucket: (r.lo_edge, r.hi_edge, r.n)
         for r in histogram(df, "v", bins=10).collect()}
    assert len(h) == 10
    assert h[0] == (0.0, 10.0, 10)
    assert h[9] == (90.0, 100.0, 11)      # max clamps into last bucket
    assert sum(n for _, _, n in h.values()) == 101
    # explicit bounds: out-of-range values clamp, not drop
    h2 = {r.bucket: r.n for r in
          histogram(df, "v", bins=2, lo=40.0, hi=60.0).collect()}
    assert h2[0] == 50 and h2[1] == 51
    # single-value column (degenerate range) and empty input
    one = spark.createDataFrame([(5.0,), (5.0,)], "v double")
    ho = histogram(one, "v", bins=4).collect()
    assert len(ho) == 1 and ho[0].n == 2
    assert histogram(df.limit(0), "v", bins=4).count() == 0
    with pytest.raises(ValueError):
        histogram(df, "v", bins=0)


def test_sessionize_window_semantics(spark):
    from cascalog_spark.functions import sessionize

    rows = [(1, "u", 0.0), (2, "u", 100.0), (3, "u", 2000.0),
            (4, "u", 2100.0), (5, "u", 9999.0), (6, "w", 50.0)]
    df = spark.createDataFrame(rows, "eid long, user string, ts double")
    got = {r.eid: r.session_id
           for r in sessionize(df, "ts", ["user"], gap=1800.0).collect()}
    assert got == {1: 0, 2: 0, 3: 1, 4: 1, 5: 2, 6: 0}
    # no per-group UDF, exactly one key shuffle
    plan = sessionize(df, "ts", ["user"], gap=1800.0)._jdf \
        .queryExecution().executedPlan().toString()
    assert "Python" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_time_rollup_gap_fill(spark):
    from cascalog_spark.functions import time_rollup

    rows = [("u", 10.0), ("u", 3700.0), ("u", 11000.0)]
    df = spark.createDataFrame(rows, "user string, ts double")
    out = {(r.user, r.bucket_start): r.n
           for r in time_rollup(df, "ts", ["user"],
                                [F.count(F.lit(1)).alias("n")],
                                step=3600.0).collect()}
    # buckets 0, 3600 occupied; 7200 filled empty (NULL); 10800 occupied
    assert out[("u", 0)] == 1 and out[("u", 3600)] == 1
    assert out[("u", 7200)] is None
    assert out[("u", 10800)] == 1
    assert len(out) == 4
    nofill = time_rollup(df, "ts", ["user"],
                         [F.count(F.lit(1)).alias("n")],
                         step=3600.0, fill=False)
    assert nofill.count() == 3


def test_table_diff_classes(spark):
    from cascalog_spark.operators import table_diff

    a = spark.createDataFrame([(1, "x", 1.0), (2, "y", 2.0), (3, "z", 3.0)],
                              "k long, s string, v double")
    b = spark.createDataFrame([(1, "x", 1.0), (2, "y", 9.0), (4, "n", 4.0)],
                              "k long, s string, v double")
    got = {r.k: r.diff for r in table_diff(a, b, ["k"]).collect()}
    assert got == {2: "changed", 3: "removed", 4: "added"}
    full = {r.k: r.diff
            for r in table_diff(a, b, ["k"], changed_only=False).collect()}
    assert full[1] == "same"
    # null-safe compare: NULL == NULL is 'same'
    c = spark.createDataFrame([(1, None, 1.0)], "k long, s string, v double")
    d = spark.createDataFrame([(1, None, 1.0)], "k long, s string, v double")
    assert table_diff(c, d, ["k"]).count() == 0


def test_minhash_incremental_vs_full(spark):
    """Incremental (index + batch) candidates must equal the full-corpus
    candidate set restricted to pairs touching the batch."""
    from cascalog_spark.functions import minhash_lsh_candidates
    from cascalog_spark.functions.dedup import (
        minhash_index, minhash_lsh_candidates_incremental)

    rows = [(i, "the quick brown fox jumps over the lazy dog num " + str(i % 3))
            for i in range(12)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    full = {(r.id_a, r.id_b) for r in
            minhash_lsh_candidates(df, "doc_id", num_perm=8,
                                   bands=4).collect()}
    old = df.where("doc_id % 2 = 0")
    batch = df.where("doc_id % 2 = 1")
    idx = minhash_index(old, "doc_id", num_perm=8, bands=4)
    pairs, new_rows = minhash_lsh_candidates_incremental(
        batch, idx, "doc_id", num_perm=8, bands=4)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    batch_ids = {1, 3, 5, 7, 9, 11}
    want = {(a, b) for a, b in full if a in batch_ids or b in batch_ids}
    # normalize direction: cross pairs are (index_id, batch_id)
    norm = {tuple(sorted(p)) for p in got}
    assert norm == {tuple(sorted(p)) for p in want}
    # appended index rows cover every batch doc in every band
    assert new_rows.select("doc_id").distinct().count() == 6
    assert new_rows.count() == 6 * 4
    # index=None degenerates to the batch self-join
    p2, _ = minhash_lsh_candidates_incremental(
        batch, None, "doc_id", num_perm=8, bands=4)
    self_only = {(r.id_a, r.id_b) for r in p2.collect()}
    assert self_only == {(a, b) for a, b in full
                         if a in batch_ids and b in batch_ids}


def test_weighted_sample_properties(spark):
    import pytest
    from cascalog_spark.functions import weighted_sample

    rows = [(i, float(1 if i < 50 else 1000)) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    got = weighted_sample(df, 20, "w")
    ids = {r.doc_id for r in got.collect()}
    assert len(ids) == 20
    # heavy-weight rows dominate the sample
    assert sum(1 for i in ids if i >= 50) >= 15
    # deterministic across runs
    again = {r.doc_id for r in weighted_sample(df, 20, "w").collect()}
    assert again == ids
    # zero/negative weights never selected when positives suffice
    z = spark.createDataFrame(
        [(1, 0.0), (2, -5.0), (3, 2.0), (4, 1.0)],
        "doc_id long, w double")
    assert {r.doc_id for r in
            weighted_sample(z, 2, "w").collect()} == {3, 4}
    with pytest.raises(ValueError):
        weighted_sample(df, 0, "w")
    # top-n must be TakeOrderedAndProject, never a global sort
    plan = weighted_sample(df, 5, "w")._jdf \
        .queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_zorder_key_morton_math(spark):
    import pytest
    from cascalog_spark.functions import zorder_key

    df = spark.createDataFrame([(x, y) for x in range(4) for y in range(4)],
                               "x int, y int")
    stats = {"x": (0.0, 4.0), "y": (0.0, 4.0)}
    got = {(r.x, r.y): r.z for r in df.withColumn(
        "z", zorder_key(df, ["x", "y"], bits=2, stats=stats)).collect()}
    # classic 4x4 Morton curve: z = interleave(bits(x), bits(y))
    def morton(x, y):
        z = 0
        for b in range(2):
            z |= ((x >> b) & 1) << (2 * b)
            z |= ((y >> b) & 1) << (2 * b + 1)
        return z
    # cell = floor(v/4 * 4) = v for ints 0..3 with these stats
    assert got == {(x, y): morton(x, y)
                   for x in range(4) for y in range(4)}
    with pytest.raises(ValueError):
        zorder_key(df, [], bits=2)
    with pytest.raises(ValueError):
        zorder_key(df, ["x", "y"], bits=32)


def test_write_zordered_clusters_both_dims(spark, tmp_path):
    """Z-ordered files carry tight per-file min/max on BOTH clustered
    columns — the property multi-dimensional data skipping needs (a
    1-column range layout only bounds its own column)."""
    from pyspark.sql import functions as F
    from cascalog_spark.functions import write_zordered

    n = 40_000
    df = spark.range(n).selectExpr("id % 200 AS a",
                                   "CAST(id / 200 AS LONG) AS b")
    path = str(tmp_path / "zordered")
    write_zordered(df, path, ["a", "b"], bits=8, n_files=16)
    back = spark.read.parquet(path)
    assert back.count() == n
    per_file = (back.groupBy(F.input_file_name().alias("f"))
                .agg((F.max("a") - F.min("a")).alias("spana"),
                     (F.max("b") - F.min("b")).alias("spanb"))
                .collect())
    assert len(per_file) > 4
    avg_a = sum(r.spana for r in per_file) / len(per_file)
    avg_b = sum(r.spanb for r in per_file) / len(per_file)
    # each file covers a small fraction of both global spans (200 each)
    assert avg_a < 200 * 0.6
    assert avg_b < 200 * 0.6


def test_ivf_kmeans_centroids_bound_cells_under_id_skew(spark):
    """centroids='kmeans' keeps Voronoi cells balanced when the id space
    is skewed (low ids all in one region of embedding space — the
    first-k-ids seed then packs near-identical centroids there and one
    far cell swallows the rest of the corpus)."""
    import math
    import random

    from pyspark.sql import functions as F
    from cascalog_spark.functions.similarity import (
        _resolve_centroids, ivf_assign_col)

    rnd = random.Random(11)

    def around(base, eps=0.05):
        v = [b + rnd.uniform(-eps, eps) for b in base]
        n = math.sqrt(sum(x * x for x in v))
        return [x / n for x in v]

    # ids 0..7: tight cluster at e0; ids 8..199: spread over 6 other
    # well-separated directions
    dirs = [[1.0, 0, 0, 0], [0, 1.0, 0, 0], [0, 0, 1.0, 0],
            [0, 0, 0, 1.0], [-1.0, 0, 0, 0], [0, -1.0, 0, 0]]
    # exactly duplicated low-id vectors: the first-k-ids "centroids" are
    # k copies of one point, every row ties and collapses into cell 0
    rows = [(i, [1.0, 0.0, 0.0, 0.0]) for i in range(8)]
    rows += [(8 + j, around(dirs[j % 6])) for j in range(192)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    def cell_ratio(cents):
        counts = (emb.select(ivf_assign_col(
                      F.col("embedding").cast("array<double>"), cents)
                      .alias("c"))
                  .groupBy("c").count().collect())
        sizes = [r["count"] for r in counts]
        return max(sizes) / (sum(sizes) / k)  # mean over ALL k cells

    k = 8
    det = _resolve_centroids(None, emb, "vec_id", "embedding", k)
    km = _resolve_centroids("kmeans", emb, "vec_id", "embedding", k)
    assert len(km) == k
    r_det, r_km = cell_ratio(det), cell_ratio(km)
    # first-k-ids: 8 centroids in one cluster -> one cell holds ~all 192
    # spread rows (ratio ~ k * 192/200); kmeans finds the real structure
    assert r_det > 4.0          # documents the degenerate mode
    assert r_km < 2.5           # bounded max/mean under skew
    # and the kmeans table drives the same downstream API
    from cascalog_spark.functions.similarity import ivf_ann_topk
    got = ivf_ann_topk(emb, around([0, 1.0, 0, 0]), k=3,
                       centroids="kmeans", n_probe=2)
    assert got.count() == 3


def test_exact_substring_spans_and_dedup(spark):
    """Lee et al.-style duplicated-span removal: the lower-id doc keeps
    the shared span, later docs lose exactly those tokens; overlapping
    k-gram runs merge into one maximal span."""
    from cascalog_spark.functions import (exact_substring_dedup,
                                          exact_substring_spans)

    shared = "the quick brown fox jumps over the lazy dog again and again"
    df = spark.createDataFrame(
        [(0, "intro A " + shared + " tail of doc zero"),
         (1, "doc one starts here " + shared + " and ends differently"),
         (2, "no duplicated run here at all whatsoever nothing shared")],
        "doc_id long, text string")
    spans = exact_substring_spans(df, k=5).collect()
    assert len(spans) == 1
    s = spans[0]
    # shared span sits at token offsets 4..15 in doc 1 (12 tokens)
    assert (s.doc_id, s.span_start, s.span_end, s.span_tokens) \
        == (1, 4, 15, 12)
    out = exact_substring_dedup(df, k=5).collect()
    clean = {r.doc_id: r.clean_text for r in out}
    assert clean[0] == ("intro a " + shared + " tail of doc zero")
    assert clean[1] == "doc one starts here and ends differently"
    assert "nothing shared" in clean[2]
    # default preserves the original text column (lossy rewrite is opt-in)
    assert {r.doc_id: r.text for r in out}[0].startswith("intro A ")


def test_exact_substring_edge_cases(spark):
    """Docs shorter than k produce no anchors; identical docs strip the
    whole later copy to empty text; non-text columns pass through."""
    from cascalog_spark.functions import (exact_substring_dedup,
                                          exact_substring_spans,
                                          kgram_anchors)

    df = spark.createDataFrame(
        [(0, "a b c d e f g h", "en"),
         (1, "a b c d e f g h", "en"),      # exact copy -> fully removed
         (2, "tiny", "fr"),                 # < k tokens -> no anchors
         (3, "", "de")],                    # empty
        "doc_id long, text string, lang string")
    assert kgram_anchors(df.where("doc_id >= 2"), k=5).count() == 0
    spans = exact_substring_spans(df, k=5).collect()
    assert len(spans) == 1 and spans[0].doc_id == 1
    assert (spans[0].span_start, spans[0].span_end) == (0, 7)
    clean = {r.doc_id: (r.clean_text, r.lang)
             for r in exact_substring_dedup(df, k=5).collect()}
    assert clean[0] == ("a b c d e f g h", "en")
    assert clean[1] == ("", "en")
    assert clean[2] == ("tiny", "fr")
    assert clean[3] == ("", "de")
    # in-place rewrite is opt-in via out_col=text_col
    inplace = exact_substring_dedup(df, k=5, out_col="text").collect()
    row1 = [r for r in inplace if r.doc_id == 1][0]
    assert row1.text == "" and "clean_text" not in inplace[0].asDict()


def test_split_corpus_deterministic_partition(spark, sf_dir):
    """Every doc gets exactly one split; proportions track the weights;
    assignment is a pure function of (id, seed) — stable across calls
    and independent of row order."""
    from cascalog_spark.functions import split_corpus

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    w = {"train": 8, "val": 1, "test": 1}
    a = {r.doc_id: r.split for r in split_corpus(docs, w).collect()}
    b = {r.doc_id: r.split
         for r in split_corpus(docs.orderBy("n_chars"), w).collect()}
    assert a == b and len(a) == docs.count()
    from collections import Counter
    c = Counter(a.values())
    n = len(a)
    assert 0.7 < c["train"] / n < 0.9          # ~0.8
    assert c["val"] + c["test"] > 0
    # different seed reshuffles, same seed does not
    c2 = {r.doc_id: r.split
          for r in split_corpus(docs, w, seed=7).collect()}
    assert c2 != a
    import pytest as _pt
    with _pt.raises(ValueError):
        split_corpus(docs, {})


def test_temperature_mixture_flattens_head(spark):
    """alpha=0 flattens every stratum toward the smallest; alpha=1 keeps
    the natural distribution; rates anchor at the smallest stratum (a
    filter cannot upsample)."""
    from collections import Counter

    from cascalog_spark.functions import temperature_mixture

    rows = ([(i, "head") for i in range(1000)]
            + [(10_000 + i, "mid") for i in range(200)]
            + [(20_000 + i, "tail") for i in range(50)])
    df = spark.createDataFrame(rows, "doc_id long, source string")

    flat = Counter(r.source for r in
                   temperature_mixture(df, "source", alpha=0.0).collect())
    # every stratum lands near the tail's 50 rows
    assert flat["tail"] == 50
    assert 25 <= flat["mid"] <= 80 and 25 <= flat["head"] <= 80

    natural = Counter(r.source for r in
                      temperature_mixture(df, "source", alpha=1.0).collect())
    assert natural == Counter({"head": 1000, "mid": 200, "tail": 50})

    mid = Counter(r.source for r in
                  temperature_mixture(df, "source", alpha=0.5).collect())
    assert flat["head"] < mid["head"] < natural["head"]


def test_exact_substring_dedup_incremental(spark):
    """Incremental span dedup == the batch variant when the index holds
    exactly the earlier (lower-id) docs; None-index = batch-internal
    only; the updated index covers corpus + batch grams."""
    from cascalog_spark.functions import (exact_substring_dedup,
                                          exact_substring_dedup_incremental,
                                          exact_substring_index)

    span = "one two three four five six seven eight"  # one 8-gram
    rows = [
        (1, f"{span} corpus tail words here"),
        (2, "completely unrelated early document text body"),
        (3, f"{span} later doc keeps its own suffix"),     # loses span
        (4, f"batch dup {span} and batch dup {span} x"),   # loses to 3? no: to corpus
        (5, "fresh text with no duplicated window at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    corpus = df.where("doc_id <= 2")
    batch = df.where("doc_id >= 3")

    idx = exact_substring_index(corpus, k=8)
    inc_clean, updated = exact_substring_dedup_incremental(batch, idx, k=8)
    batch_clean = exact_substring_dedup(df, k=8)
    got_inc = {r.doc_id: r.clean_text for r in inc_clean.collect()}
    got_all = {r.doc_id: r.clean_text
               for r in batch_clean.collect() if r.doc_id >= 3}
    assert got_inc == got_all  # identical decision for the batch docs
    assert "one two three" not in got_inc[3]  # span owned by the corpus
    assert got_inc[3].endswith("later doc keeps its own suffix")
    # updated index covers both corpus and batch grams
    n_idx = idx.count()
    assert updated.count() > n_idx
    # None index = batch-internal ownership only (doc 3 owns the span)
    only_batch, _ = exact_substring_dedup_incremental(batch, None, k=8)
    got = {r.doc_id: r.clean_text for r in only_batch.collect()}
    assert "one two three four five six seven eight" in got[3]
    assert "one two three" not in got[4]


def test_semantic_dedup_incremental(spark):
    """Batch-vs-representatives SemDeDup: reps always win, batch-internal
    greedy min-id matches the batch variant, survivors grow the rep set,
    None-reps bootstraps."""
    from cascalog_spark.functions import semantic_dedup_incremental

    def v(x, y):
        return [float(x), float(y)]

    reps = spark.createDataFrame(
        [(1, v(1, 0)), (2, v(0, 1))],
        "vec_id long, embedding array<double>")
    batch = spark.createDataFrame(
        [(10, v(1, 0.001)),   # ~dup of rep 1 → dropped
         (11, v(0.6, 0.8)),   # novel direction → kept
         (12, v(0.6, 0.8)),   # dup of 11 (lower batch id) → dropped
         (13, v(-1, 0.2))],   # novel → kept
        "vec_id long, embedding array<double>")
    cents = [(0, v(1, 0)), (1, v(0, 1)), (2, v(-1, 0)), (3, v(1, 1))]
    kept, updated = semantic_dedup_incremental(
        batch, reps, threshold=0.95, centroids=cents)
    assert sorted(r.vec_id for r in kept.collect()) == [11, 13]
    assert sorted(r.vec_id for r in updated.collect()) == [1, 2, 11, 13]
    # bootstrap: no reps yet → batch-internal only
    kept0, reps0 = semantic_dedup_incremental(
        batch, None, threshold=0.95, centroids=cents)
    assert sorted(r.vec_id for r in kept0.collect()) == [10, 11, 13]
    assert sorted(r.vec_id for r in reps0.collect()) == [10, 11, 13]
    # second batch against the grown rep set: 11's dup now rep-owned
    batch2 = spark.createDataFrame(
        [(20, v(0.6, 0.8))], "vec_id long, embedding array<double>")
    kept2, _ = semantic_dedup_incremental(
        batch2, updated, threshold=0.95, centroids=cents)
    assert kept2.count() == 0


# ---------------------------------------------------------------------------
# select_by_budget (token-budget corpus selection)


def test_select_by_budget_histogram_equals_window(spark):
    """The histogram two-pass scale path must be bit-identical to the
    exact global-window spelling, including boundary-bucket tie-breaks."""
    from cascalog_spark.functions import select_by_budget
    rows = [(i, (i * 37) % 100, 5 + (i * 13) % 20) for i in range(400)]
    df = spark.createDataFrame(rows, ["doc_id", "score", "w"])
    total = sum(r[2] for r in rows)
    for budget in (0, total // 3, total - 1, total + 10):
        for bins in (1, 4, 64):
            kw = select_by_budget(df, budget, "w", "score",
                                  method="window")
            kh = select_by_budget(df, budget, "w", "score",
                                  method="histogram", bins=bins)
            got_w = sorted(r["doc_id"] for r in kw.collect())
            got_h = sorted(r["doc_id"] for r in kh.collect())
            assert got_w == got_h, (budget, bins)


def test_select_by_budget_semantics_vs_python(spark):
    """Running-total semantics: greedy keep in (score desc, id) order
    while the cumulative weight fits; first overflowing row drops but
    later smaller rows do NOT back-fill (prefix-sum, not knapsack)."""
    from cascalog_spark.functions import select_by_budget
    rows = [(1, 9, 6), (2, 9, 3), (3, 8, 4), (4, 7, 1)]
    df = spark.createDataFrame(rows, ["doc_id", "score", "w"])
    kept = sorted(r["doc_id"] for r in
                  select_by_budget(df, 10, "w", "score",
                                   method="histogram", bins=8).collect())
    # order: 1 (cum 6), 2 (cum 9), 3 (cum 13 > 10 drop), 4 (cum 14 drop)
    assert kept == [1, 2]


def test_select_by_budget_one_giant_tie_falls_back(spark):
    """All-equal order column: no range to bin; exact window fallback."""
    from cascalog_spark.functions import select_by_budget
    df = spark.createDataFrame([(i, 5, 2) for i in range(10)],
                               ["doc_id", "score", "w"])
    kept = sorted(r["doc_id"] for r in
                  select_by_budget(df, 7, "w", "score",
                                   method="histogram").collect())
    assert kept == [0, 1, 2]   # ids break the tie: 2+2+2=6 <= 7


def test_select_by_budget_histogram_no_global_sort(spark):
    """The scale path must never produce a single-partition global sort:
    its only window partitions BY BUCKET."""
    from cascalog_spark.functions import select_by_budget
    df = spark.createDataFrame([(i, i % 50, 3) for i in range(500)],
                               ["doc_id", "score", "w"])
    kh = select_by_budget(df, 300, "w", "score", method="histogram")
    plan = kh._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
    kw = select_by_budget(df, 300, "w", "score", method="window")
    wplan = kw._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" in wplan   # the documented small-N path


# ---------------------------------------------------------------------------
# linalg: distributed Gram / covariance / PCA


def test_linalg_moments_match_numpy(spark):
    import numpy as np
    from cascalog_spark.functions import moments
    rng = [[float((i * 7 + j * 3) % 11) - 5.0 for j in range(6)]
           for i in range(200)]
    df = spark.createDataFrame([(i, v) for i, v in enumerate(rng)],
                               ["id", "vec"])
    n, mu, cov = moments(df, vec_col="vec")
    x = np.asarray(rng)
    assert n == 200
    assert np.abs(mu - x.mean(axis=0)).max() < 1e-12
    assert np.abs(cov - np.cov(x.T)).max() < 1e-9


def test_linalg_pca_projection_native_and_correct(spark):
    import numpy as np
    from cascalog_spark.functions import pca_fit, pca_project
    rng = [[float((i * 13 + j * 5) % 17) / 4.0 for j in range(8)]
           for i in range(150)]
    df = spark.createDataFrame([(i, v) for i, v in enumerate(rng)],
                               ["id", "vec"])
    mean, comps, ev = pca_fit(df, k=3, vec_col="vec")
    assert np.abs(comps @ comps.T - np.eye(3)).max() < 1e-9
    assert ev[0] >= ev[1] >= ev[2] >= -1e-12
    proj = pca_project(df, mean, comps, vec_col="vec")
    x = np.asarray(rng)
    want = (x - mean) @ comps.T
    got = np.asarray([r["pca"] for r in
                      proj.orderBy("id").select("pca").collect()])
    assert np.abs(got - want).max() < 1e-9
    # projection must stay native — no Python eval in the plan
    plan = proj._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "ArrowEval" not in plan


def test_linalg_moments_empty_raises(spark):
    import pytest as _pytest
    from cascalog_spark.functions import moments
    df = spark.createDataFrame([], "id long, vec array<double>")
    with _pytest.raises(ValueError):
        moments(df, vec_col="vec")


def test_bigram_nll_separates_repetition(spark):
    """A doc that endlessly repeats one bigram must score a LOWER
    bigram surprise than varied prose over the same vocabulary; short
    (<2 token) docs are absent."""
    from cascalog_spark.functions import bigram_nll
    from cascalog_spark.functions.text import release_tfidf_cache
    rows = [
        (1, "the cat sat on the mat while the dog ran to the gate"),
        (2, "buy now buy now buy now buy now buy now buy now"),
        (3, "one"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = bigram_nll(df)
    got = {r["doc_id"]: r["bigram_nll"] for r in out.collect()}
    release_tfidf_cache(out)
    assert set(got) == {1, 2}          # doc 3 has no bigrams
    assert got[2] < got[1]             # repetition = low bigram NLL


def test_linalg_whitened_projection_unit_variance(spark):
    import numpy as np
    from cascalog_spark.functions import pca_fit, pca_project
    rng = np.random.RandomState(7)
    x = rng.randn(300, 10) * np.linspace(1, 5, 10)
    df = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(x)],
        "id long, vec array<double>")
    mean, comps, ev = pca_fit(df, k=4, vec_col="vec")
    proj = pca_project(df, mean, comps, vec_col="vec",
                       explained_variance=ev)
    p = np.asarray([r["pca"] for r in
                    proj.orderBy("id").select("pca").collect()])
    # whitened components have ~unit sample variance
    assert np.abs(p.var(axis=0, ddof=1) - 1.0).max() < 1e-9


def test_linalg_incremental_partials_match_single_pass(spark, tmp_path):
    """Continuous ingest: per-batch moment partials appended to a
    standing parquet table reduce to EXACTLY the single-pass moments of
    the concatenated corpus (partials are plain sums — mergeable)."""
    import numpy as np
    from cascalog_spark.functions.linalg import (moments,
                                                 moments_from_partials,
                                                 write_moment_partials)
    rng = np.random.RandomState(3)
    a = rng.randn(120, 5)
    b = rng.randn(80, 5) + 2.0
    mk = lambda x, off: spark.createDataFrame(
        [(off + i, [float(v) for v in row]) for i, row in enumerate(x)],
        "id long, vec array<double>")
    path = str(tmp_path / "partials")
    write_moment_partials(mk(a, 0), path, vec_col="vec")
    write_moment_partials(mk(b, 1000), path, vec_col="vec")
    n_i, mu_i, cov_i = moments_from_partials(spark, path)
    both = mk(np.vstack([a, b]), 0)
    n_s, mu_s, cov_s = moments(both, vec_col="vec")
    assert n_i == n_s == 200
    assert np.abs(mu_i - mu_s).max() < 1e-12
    assert np.abs(cov_i - cov_s).max() < 1e-12


def test_skew_report_flags_hot_key(spark):
    from cascalog_spark.functions.skew import skew_report
    rows = [(0, i) for i in range(900)] + \
           [(k, 0) for k in range(1, 101)]
    df = spark.createDataFrame(rows, ["k", "v"])
    rep = skew_report(df, "k")
    assert rep["rows"] == 1000 and rep["keys"] == 101
    assert rep["top"][0] == ((0,), 900, 0.9)
    assert rep["max"] == 900 and rep["p50"] == 1.0
    assert rep["suggested_salt"] == 64       # ceil(900/1) capped
    flat = skew_report(spark.createDataFrame(
        [(i, i) for i in range(100)], ["k", "v"]), "k")
    assert flat["suggested_salt"] == 1


def _py_dsir(raw_rows, target_rows, n_buckets, alpha=0.5, seed=7):
    import hashlib
    import math
    import re as _re
    from collections import Counter

    def feats(t):
        tk = [w for w in _re.split(r"\s+", t.lower()) if w]
        return tk + [f"{a} {b}" for a, b in zip(tk, tk[1:])]

    def bucket(f):
        h = int(hashlib.md5(f"{f}_{seed}".encode()).hexdigest()[:15], 16)
        return h % n_buckets

    docb = {i: Counter(bucket(f) for f in feats(t)) for i, t in raw_rows}
    ct = Counter(bucket(f) for _, t in target_rows for f in feats(t))
    cr = Counter()
    for c in docb.values():
        cr.update(c)
    nt, nr, B = sum(ct.values()), sum(cr.values()), n_buckets

    def lr(b):
        return (math.log((ct.get(b, 0) + alpha) / (nt + alpha * B))
                - math.log((cr.get(b, 0) + alpha) / (nr + alpha * B)))

    return {i: sum(c * lr(b) for b, c in cb.items())
            for i, cb in docb.items() if cb}


def test_dsir_weights_match_python_model(spark):
    """dsir_weights must equal the straight-line hashed-ngram
    importance model bucket-for-bucket (md5 bucketing is engine-exact;
    only float summation order may differ)."""
    from cascalog_spark.functions import dsir_weights
    from cascalog_spark.functions.text import release_tfidf_cache
    raw = [(i, f"alpha beta w{i % 7} gamma w{i % 3} delta") for i in range(20)]
    raw += [(100, "python code review loop"), (101, "   "), (102, "")]
    tgt = [(0, "python code"), (1, "code review python loop")]
    rdf = spark.createDataFrame(raw, ["doc_id", "text"])
    tdf = spark.createDataFrame(tgt, ["doc_id", "text"])
    out = dsir_weights(rdf, tdf, n_buckets=512)
    got = {r["doc_id"]: r["dsir_logw"] for r in out.collect()}
    release_tfidf_cache(out)
    want = _py_dsir(raw, tgt, 512)
    assert set(got) == set(want)            # token-less docs absent
    assert 101 not in got and 102 not in got
    for k in want:
        assert abs(got[k] - want[k]) < 2e-6, k
    # target-like doc outranks generic filler
    assert got[100] > max(got[i] for i in range(20))


def test_dsir_sample_is_gumbel_topk(spark):
    """dsir_sample == deterministic Gumbel-top-k over the same weights
    (md5 uniforms), selecting without replacement toward the target."""
    import hashlib
    import math
    from cascalog_spark.functions import dsir_sample, dsir_weights
    from cascalog_spark.functions.text import release_tfidf_cache
    raw = [(i, ("python code " if i % 4 == 0 else "misc filler ")
            + f"w{i % 5} tail") for i in range(40)]
    tgt = [(0, "python code python code")]
    rdf = spark.createDataFrame(raw, ["doc_id", "text"])
    tdf = spark.createDataFrame(tgt, ["doc_id", "text"])
    w = dsir_weights(rdf, tdf, n_buckets=256)
    logw = {r["doc_id"]: r["dsir_logw"] for r in w.collect()}
    release_tfidf_cache(w)

    def key(i):
        h = int(hashlib.md5(f"{i}_gum7".encode()).hexdigest()[:15], 16)
        u = (h % 1000000 + 0.5) / 1000000.0
        return logw[i] - math.log(-math.log(u))

    want = sorted(sorted(logw), key=lambda i: (-key(i), i))[:10]
    out = dsir_sample(rdf, tdf, 10, n_buckets=256)
    got = [r["doc_id"] for r in out.collect()]
    release_tfidf_cache(out)
    assert sorted(got) == sorted(want)
    # the selection leans toward target-like docs
    assert sum(1 for i in got if i % 4 == 0) >= 7


def test_canonical_url_cases(spark):
    """Canonicalization folds scheme/host case, www., default ports,
    fragments, tracking params, param order, and trailing slashes."""
    from cascalog_spark.functions import canonical_url_col
    import pyspark.sql.functions as F
    cases = [
        ("https://WWW.Example.com:443/path/?utm_source=x&b=2&a=1#frag",
         "example.com/path?a=1&b=2"),
        ("http://example.com/path?b=2&a=1",
         "example.com/path?a=1&b=2"),
        ("http://www.foo.org/", "foo.org"),
        ("https://foo.org:80", "foo.org"),
        ("https://foo.org/x?utm_campaign=z&fbclid=1&gclid=2", "foo.org/x"),
        ("http://A.B.com/Case/Sensitive/Path", "a.b.com/Case/Sensitive/Path"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], ["url"])
    got = [r[0] for r in
           df.select(canonical_url_col(F.col("url"))).collect()]
    assert got == [w for _, w in cases]


def test_url_dedup_collapses_spellings(spark):
    """Different spellings of one resource share a canonical key; the
    min doc id owns it."""
    from cascalog_spark.functions import url_dedup
    rows = [(1, "https://www.ex.com/a?utm_source=t&k=1"),
            (2, "http://EX.com/a/?k=1"),
            (3, "https://ex.com/b")]
    df = spark.createDataFrame(rows, ["doc_id", "url"])
    got = {r["canonical_url"]: (r["keep_id"], r["n_dups"])
           for r in url_dedup(df).collect()}
    assert got == {"ex.com/a?k=1": (1, 2), "ex.com/b": (3, 1)}


def test_fit_linear_classifier_matches_numpy_gd(spark):
    """The distributed full-batch GD must track a straight-line numpy
    implementation over identical hashed features, update for update."""
    import hashlib
    import math
    import numpy as np
    from collections import Counter
    from cascalog_spark.functions import fit_linear_classifier
    dim, iters, lr = 32, 15, 0.5
    rows = [(i, 1.0 if i % 2 == 0 else 0.0,
             ("spam offer spam now w%d" % (i % 3)) if i % 2 == 0
             else ("ham note w%d calm" % (i % 3))) for i in range(60)]
    df = spark.createDataFrame(rows, ["doc_id", "y", "text"])
    got = fit_linear_classifier(df, "y", dim=dim, iters=iters, lr=lr)

    def bucket(t):
        return int(hashlib.md5(t.encode()).hexdigest()[:15], 16) % dim

    X = np.zeros((len(rows), dim))
    y = np.array([r[1] for r in rows])
    for k, (_, _, txt) in enumerate(rows):
        for bkt, c in Counter(bucket(t) for t in txt.split()).items():
            X[k, bkt] = c
    w, b = np.zeros(dim), 0.0
    for _ in range(iters):
        r = 1.0 / (1.0 + np.exp(-(X @ w + b))) - y
        w -= lr / len(rows) * (X.T @ r)
        b -= lr / len(rows) * r.sum()
    assert got["n_docs"] == 60
    assert abs(got["bias"] - b) < 1e-9
    assert np.abs(np.array(got["weights"]) - w).max() < 1e-9
    # fit -> inference round trip separates the classes
    from cascalog_spark.functions import linear_text_classifier
    scores = {r["doc_id"]: r["score"] for r in linear_text_classifier(
        df, got["weights"], bias=got["bias"]).collect()}
    assert all(scores[i] > 0.5 for i in range(0, 60, 2))
    assert all(scores[i] < 0.5 for i in range(1, 60, 2))


def test_semantic_decontamination(spark):
    """Identical and near-parallel vectors to a benchmark are dropped;
    orthogonal ones survive with their full rows intact."""
    from cascalog_spark.functions import (semantic_contamination_score,
                                          semantic_decontaminate)
    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0], "dup"), (2, [0.999, 0.04], "near"),
         (3, [0.0, 1.0], "orth"), (4, [0.7, 0.7], "diag")],
        ["doc_id", "embedding", "tag"])
    bench = spark.createDataFrame([([2.0, 0.0],)], ["embedding"])
    scores = {r["doc_id"]: r["max_sim"] for r in
              semantic_contamination_score(corpus, bench).collect()}
    assert scores[1] == 1.0 and scores[3] == 0.0
    assert scores[2] > 0.99 and 0.70 < scores[4] < 0.71
    kept = semantic_decontaminate(corpus, bench, threshold=0.95)
    assert sorted(r["doc_id"] for r in kept.collect()) == [3, 4]
    assert set(kept.columns) == {"doc_id", "embedding", "tag"}


def test_write_shuffled_total_order_and_determinism(spark, tmp_path):
    """Files hold disjoint, internally-sorted shuffle-key spans (the
    on-disk order IS a global permutation), the permutation is
    reproducible for a seed and different across seeds."""
    import hashlib
    import pyspark.sql.functions as F
    from cascalog_spark.functions import write_shuffled
    df = spark.range(500).select(F.col("id").alias("doc_id"),
                                 (F.col("id") * 3).alias("v"))
    p1, p2, p3 = (str(tmp_path / d) for d in ("a", "b", "c"))
    write_shuffled(df, p1, "doc_id", n_files=8, seed=42)
    write_shuffled(df, p2, "doc_id", n_files=8, seed=42)
    write_shuffled(df, p3, "doc_id", n_files=8, seed=7)

    def key(i, seed):
        return hashlib.md5(f"{i}_shuf{seed}".encode()).hexdigest()

    def order(path, seed):
        rows = (spark.read.parquet(path)
                .select("doc_id", F.input_file_name().alias("f"))
                .collect())
        per_file = {}
        for r in rows:
            per_file.setdefault(r["f"], []).append(r["doc_id"])
        # within-file arrival order must equal the md5-key order
        spans = []
        for f, ids in per_file.items():
            ks = [key(i, seed) for i in ids]
            assert ks == sorted(ks), "file not key-sorted"
            spans.append((min(ks), max(ks), f))
        spans.sort()
        for (lo1, hi1, _), (lo2, hi2, _) in zip(spans, spans[1:]):
            assert hi1 < lo2, "file key spans overlap"
        return [i for _, _, f in spans for i in per_file[f]]

    o1, o2, o3 = order(p1, 42), order(p2, 42), order(p3, 7)
    assert o1 == o2                       # same seed -> same permutation
    assert o1 != o3                       # new seed -> new permutation
    assert sorted(o1) == list(range(500)) # it IS a permutation
    assert o1 != list(range(500))         # and not the identity


def test_global_running_total_equals_window_spelling(spark):
    """Histogram-binned running total must be BIT-IDENTICAL to the
    global window spelling, across duplicates, negative orders, and
    bucket boundaries."""
    import random
    from pyspark.sql import Window
    import pyspark.sql.functions as F
    from cascalog_spark.functions import global_running_total
    rng = random.Random(5)
    rows = [(i, rng.randint(-50, 50), rng.randint(1, 9))
            for i in range(300)]
    df = spark.createDataFrame(rows, ["doc_id", "k", "w"])
    got = {r["doc_id"]: r["rt"] for r in global_running_total(
        df, "w", "k", "doc_id", bins=16, out_col="rt").collect()}
    w = Window.orderBy(F.col("k").asc(), F.col("doc_id").asc())
    want = {r["doc_id"]: r["rt"] for r in
            df.withColumn("rt", F.sum("w").over(w)).collect()}
    assert got == want
    # descending + one-giant-tie degenerate path
    tie = spark.createDataFrame([(i, 3, 2) for i in range(20)],
                                ["doc_id", "k", "w"])
    got2 = {r["doc_id"]: r["rt"] for r in global_running_total(
        tie, "w", "k", "doc_id", bins=8, ascending=False,
        out_col="rt").collect()}
    assert got2 == {i: 2 * (i + 1) for i in range(20)}


def test_balanced_shards_equal_token_mass(spark):
    """Every shard's token mass stays within one max-row-weight of the
    target; assignment is deterministic and keeps all rows."""
    import pyspark.sql.functions as F
    from cascalog_spark.functions import balanced_shards
    rows = [(i, 1 + (i * 7) % 13) for i in range(400)]
    df = spark.createDataFrame(rows, ["doc_id", "w"])
    out = balanced_shards(df, 8, "w", bins=32)
    got = out.groupBy("shard").agg(F.sum("w").alias("t"),
                                   F.count("*").alias("n")).collect()
    total = sum(w for _, w in rows)
    target = -(-total // 8)
    assert sorted(r["shard"] for r in got) == list(range(8))
    assert sum(r["n"] for r in got) == 400
    for r in got:
        assert r["t"] <= target + 13
    # deterministic
    again = {(r["doc_id"], r["shard"]) for r in
             balanced_shards(df, 8, "w", bins=32).collect()}
    assert again == {(r["doc_id"], r["shard"]) for r in out.collect()}


def test_filter_by_domain_suffix_aware(spark):
    """Blocklist drops the listed domain AND its subdomains; allowlist
    mode inverts; unrelated lookalike domains survive."""
    from cascalog_spark.functions import filter_by_domain
    rows = [(1, "https://ads.example.com/x"),
            (2, "http://EXAMPLE.com/y"),
            (3, "https://www.notexample.com/z"),
            (4, "http://ok.org/")]
    df = spark.createDataFrame(rows, ["doc_id", "url"])
    kept = sorted(r["doc_id"] for r in
                  filter_by_domain(df, ["example.com"]).collect())
    assert kept == [3, 4]
    allow = sorted(r["doc_id"] for r in
                   filter_by_domain(df, ["example.com"], keep=True)
                   .collect())
    assert allow == [1, 2]


def test_corpus_report_one_row_profile(spark):
    """Counts, dup rate, and dominant language come out exactly on a
    corpus with known composition."""
    from cascalog_spark.functions import corpus_report
    rows = [(1, "the cat and the dog that it was"),
            (2, "the cat and the dog that it was"),      # exact dup
            (3, "der hund und die katze ist nicht da"),
            (4, "completely different filler words here")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    r = corpus_report(df).collect()[0]
    assert r["n_docs"] == 4 and r["total_tokens"] == 29
    assert r["dup_rate"] == 0.25
    assert r["top_lang"] == "en" and r["top_lang_frac"] == 0.5
    assert r["p50_tokens"] == 8.0   # sorted [5,8,8,8]


def test_compact_parquet_collapses_small_files(spark, tmp_path):
    """200 one-row files compact to the computed count with identical
    rows; the swap leaves no temp directories behind."""
    import os
    from cascalog_spark.functions import compact_parquet
    p = str(tmp_path / "tiny")
    spark.range(200).repartition(200).write.parquet(p)
    before = len([f for f in os.listdir(p) if f.endswith(".parquet")])
    assert before >= 50          # AQE may coalesce some of the 200
    n = compact_parquet(spark, p, target_bytes=1 << 30)
    after = [f for f in os.listdir(p) if f.endswith(".parquet")]
    assert n == 1 and len(after) == 1
    assert sorted(r["id"] for r in
                  spark.read.parquet(p).collect()) == list(range(200))
    assert not os.path.exists(p + "__compact_tmp")
    assert not os.path.exists(p + "__compact_bak")


def test_dsir_weights_column_target_equals_dataframe_target(spark):
    """Passing the target as a boolean Column over raw must be
    bit-identical to passing raw.where(col) — the rollup path shares
    the per-doc aggregate instead of re-exploding."""
    import pyspark.sql.functions as F
    from cascalog_spark.functions import dsir_weights
    from cascalog_spark.functions.text import release_tfidf_cache
    rows = [(i, f"alpha w{i % 5} beta w{i % 3}") for i in range(30)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    pred = F.col("doc_id") % 4 == 0
    a = dsir_weights(df, df.where(pred), n_buckets=256)
    b = dsir_weights(df, pred, n_buckets=256)
    ra = sorted(tuple(r) for r in a.collect())
    rb = sorted(tuple(r) for r in b.collect())
    release_tfidf_cache(a)
    release_tfidf_cache(b)
    assert ra == rb


def test_length_buckets_power_of_two_default(spark):
    from cascalog_spark.functions import length_buckets

    df = spark.createDataFrame(
        [(1,), (16,), (17,), (100,), (1024,), (1025,)], "n_tokens int")
    rows = {r["bucket"]: r for r in length_buckets(df).collect()}
    # 1 and 16 clamp to the 16 ceiling; 17 and 100 → 32/128; 1025 → 2048
    assert rows[16]["n_docs"] == 2
    assert rows[32]["n_docs"] == 1 and rows[128]["n_docs"] == 1
    assert rows[1024]["n_docs"] == 1 and rows[2048]["n_docs"] == 1
    # mass conservation + waste arithmetic
    assert sum(r["total_tokens"] for r in rows.values()) \
        == 1 + 16 + 17 + 100 + 1024 + 1025
    r = rows[128]
    assert r["padded_tokens"] == 128
    assert r["waste_frac"] == pytest.approx(1 - 100 / 128, abs=1e-6)


def test_length_buckets_explicit_ceilings_and_overflow(spark):
    from cascalog_spark.functions import length_buckets

    df = spark.createDataFrame([(10,), (512,), (600,)], "n_tokens int")
    rows = {r["bucket"]: r
            for r in length_buckets(df, ceilings=[128, 512]).collect()}
    assert rows[128]["n_docs"] == 1 and rows[512]["n_docs"] == 1
    # 600 exceeds the top ceiling → NULL overflow bucket, NULL padding
    assert rows[None]["n_docs"] == 1
    assert rows[None]["padded_tokens"] is None
    with pytest.raises(ValueError, match="ascending"):
        length_buckets(df, ceilings=[512, 128])


def test_psi_report_null_drift_and_shift(spark, sf_dir):
    from pyspark.sql import Row

    from cascalog_spark.functions import psi_report

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    # identical distribution halves → PSI ~ 0
    stable = psi_report(o.where("o_orderkey % 2 = 0"),
                        o.where("o_orderkey % 2 = 1"), "o_totalprice")
    psi = stable.agg(F.sum("psi_term")).first()[0]
    assert abs(psi) < 0.1, psi
    # counts conserved per side
    tot = stable.agg(F.sum("n_expected").alias("e"),
                     F.sum("n_actual").alias("a")).first()
    assert tot["e"] == o.where("o_orderkey % 2 = 0").count()
    assert tot["a"] == o.where("o_orderkey % 2 = 1").count()
    # a genuinely shifted distribution must cross the 0.25 bar
    a = spark.createDataFrame([Row(v=float(i % 100)) for i in range(2000)])
    b = spark.createDataFrame([Row(v=float(i % 100) + 80.0)
                               for i in range(2000)])
    psi = (psi_report(a, b, "v", bins=20)
           .agg(F.sum("psi_term")).first()[0])
    assert psi > 0.25, psi
    # empty input contract
    empty = a.where("v > 1e9")
    assert psi_report(empty, empty, "v").count() == 0


def test_cluster_embeddings_assignment(spark, sf_dir):
    from cascalog_spark.functions import cluster_embeddings, cluster_profile
    from cascalog_spark.functions.similarity import ivf_centroids

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = emb.count()
    prof = cluster_profile(emb, n_clusters=8)
    rows = prof.collect()
    assert sum(r["n"] for r in rows) == n  # every row assigned
    assert all(-1.0 <= r["min_sim"] <= r["avg_sim"] <= 1.0 for r in rows)
    # a centroid row must be assigned to itself with cosine ~ 1
    cents = ivf_centroids(emb, n_centroids=8)
    assigned = cluster_embeddings(emb, 8, sim_col="sim")
    own = {r["vec_id"]: r for r in assigned
           .where(F.col("vec_id").isin([c for c, _ in cents]))
           .collect()}
    for i, (cid, _) in enumerate(cents):
        assert own[cid]["cluster"] == i or own[cid]["sim"] > 0.999999
        if own[cid]["cluster"] == i:
            assert own[cid]["sim"] == pytest.approx(1.0, abs=1e-9)


def test_table_profile(spark):
    from pyspark.sql import Row

    from cascalog_spark.functions import table_profile

    df = spark.createDataFrame(
        [Row(k=1, s="a", v=[1.0]), Row(k=2, s=None, v=[2.0]),
         Row(k=2, s="b", v=None)])
    prof = {r["column"]: r
            for r in table_profile(df, exact_distinct=True).collect()}
    assert prof["k"]["n_rows"] == 3 and prof["k"]["n_null"] == 0
    assert prof["k"]["n_distinct"] == 2
    assert prof["k"]["min_repr"] == "1" and prof["k"]["max_repr"] == "2"
    assert prof["s"]["n_null"] == 1
    assert prof["s"]["null_frac"] == pytest.approx(1 / 3, abs=1e-6)
    # complex-typed column profiles nulls only
    assert prof["v"]["n_null"] == 1 and prof["v"]["n_distinct"] is None
    assert prof["v"]["min_repr"] is None
    # approx default also runs (values approximate, counts exact)
    approx = {r["column"]: r for r in table_profile(df).collect()}
    assert approx["k"]["n_null"] == 0 and approx["k"]["n_rows"] == 3
    with pytest.raises(ValueError, match="no columns"):
        table_profile(df, [])


def test_table_profile_single_scan(spark, sf_dir):
    from cascalog_spark.functions import table_profile

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    plan = table_profile(o)._jdf.queryExecution() \
        .executedPlan().toString()
    # approximate mode: ONE scan, one global agg, no Expand/joins
    assert plan.count("Scan parquet") == 1
    assert "Join" not in plan and "Expand" not in plan


def test_dedup_quality_report(spark, sf_dir):
    from cascalog_spark.functions import dedup_quality_report

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    r = dedup_quality_report(docs, threshold=0.8, num_perm=8,
                             bands=4, prefilter=False).first()
    # arithmetic identities
    assert r["tp"] + r["fp"] == r["n_candidates"]
    assert r["tp"] + r["fn"] == r["n_truth"]
    assert 0.0 <= r["precision"] <= 1.0 and 0.0 <= r["recall"] <= 1.0
    # testdata plants real near-dups: truth is non-empty and banding
    # at r=2 rows/band must surface a decent share of it
    assert r["n_truth"] > 0
    assert r["recall"] >= 0.5, r


def test_curriculum_stages_exact_quantiles(spark):
    from pyspark.sql import Row

    from cascalog_spark.functions import curriculum_stages

    df = spark.createDataFrame(
        [Row(doc_id=i, score=float((i * 37) % 101)) for i in range(103)])
    out = curriculum_stages(df, "score", n_stages=4).collect()
    sizes = {}
    for r in out:
        sizes[r["stage"]] = sizes.get(r["stage"], 0) + 1
    # equal-size stages up to rounding
    assert set(sizes) == {0, 1, 2, 3}
    assert max(sizes.values()) - min(sizes.values()) <= 1
    # stage boundaries respect the score order
    by_stage = {}
    for r in out:
        by_stage.setdefault(r["stage"], []).append(r["score"])
    for s in range(3):
        assert max(by_stage[s]) <= min(by_stage[s + 1])
    # hard-first ordering flips the ends
    desc = curriculum_stages(df, "score", n_stages=4,
                             ascending=False).collect()
    hard0 = [r["score"] for r in desc if r["stage"] == 0]
    assert min(hard0) >= max(by_stage[0])
    with pytest.raises(ValueError, match="n_stages"):
        curriculum_stages(df, "score", n_stages=0)


def test_mine_contrastive_pairs(spark, sf_dir):
    from cascalog_spark.functions.corpus import mine_contrastive_pairs
    from cascalog_spark.functions.dedup import minhash_lsh_candidates

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = mine_contrastive_pairs(docs, num_perm=8, bands=4).collect()
    assert len(out) > 0
    pairs = {(r["id_a"], r["id_b"]) for r in
             minhash_lsh_candidates(docs, "doc_id", num_perm=8,
                                    bands=4).collect()}
    sym = pairs | {(b, a) for a, b in pairs}
    for r in out:
        # every (anchor, positive) is a real LSH pair
        assert (r["anchor_id"], r["positive_id"]) in pairs
        # negatives never collide with the pair nor LSH-neighbor the anchor
        assert r["negative_id"] not in (r["anchor_id"], r["positive_id"])
        assert (r["anchor_id"], r["negative_id"]) not in sym
    # deterministic under repartitioning
    again = mine_contrastive_pairs(docs.repartition(7), num_perm=8,
                                   bands=4).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_normalize_unicode(spark):
    import unicodedata

    from pyspark.sql import Row

    from cascalog_spark.functions.text import normalize_unicode

    decomposed = "á ë fiﬁ"  # á, ë, + the fi ligature
    df = spark.createDataFrame([Row(text=decomposed), Row(text=None)])
    nfc = normalize_unicode(df, form="NFC").collect()
    nfkc = normalize_unicode(df, form="NFKC").collect()
    got_nfc = [r["norm_text"] for r in nfc]
    assert got_nfc[0] == unicodedata.normalize("NFC", decomposed)
    assert "́" not in got_nfc[0]          # composed
    assert "ﬁ" in got_nfc[0]              # NFC keeps the ligature
    assert "ﬁ" not in [r["norm_text"] for r in nfkc][0]  # NFKC folds
    assert got_nfc[1] is None                  # NULL passes through
    import pytest as _pytest
    with _pytest.raises(ValueError, match="bad form"):
        normalize_unicode(df, form="NFX")


def test_ann_recall_report_flags_weak_configs(emb):
    """The tuning loop: exact ground truth vs LSH/IVF configs.  A
    too-small n_probe (or too many planes) must be VISIBLY flagged —
    recall collapses alongside scan_frac — and adding probes can only
    help (candidate sets are nested by construction)."""
    from cascalog_spark.functions import ann_recall_report

    qs = (emb.orderBy(F.col("vec_id").asc()).limit(4)
          .select(F.col("vec_id").alias("query_id"), "embedding"))
    rep = {(r["method"], r["param"]): r
           for r in ann_recall_report(
               emb, qs, k=5, lsh_planes=(4, 10), ivf_probes=(1, 4, 16),
               n_centroids=16, lsh_multi_probe=1).collect()}
    assert len(rep) == 7
    for r in rep.values():
        assert 0.0 <= r["recall_at_k"] <= 1.0
        assert 0.0 <= r["scan_frac"] <= 1.0
    # probing ALL 16 cells IS brute force — recall must be exactly 1
    assert rep[("ivf", 16)]["recall_at_k"] == 1.0
    assert rep[("ivf", 16)]["scan_frac"] == 1.0
    # nested candidate sets: recall and scan_frac monotone in n_probe
    assert (rep[("ivf", 1)]["recall_at_k"]
            <= rep[("ivf", 4)]["recall_at_k"]
            <= rep[("ivf", 16)]["recall_at_k"])
    assert (rep[("ivf", 1)]["scan_frac"]
            < rep[("ivf", 4)]["scan_frac"]
            < rep[("ivf", 16)]["scan_frac"])
    # the weak config is visible: 10 planes shrink the probed bucket to
    # ~1/1024 of the index and recall drops below the 4-plane setting
    assert rep[("lsh", 10)]["scan_frac"] < rep[("lsh", 4)]["scan_frac"]
    assert rep[("lsh", 10)]["recall_at_k"] <= rep[("lsh", 4)]["recall_at_k"]
    # every query finds itself in its own signature bucket, so even the
    # weak config keeps recall strictly positive (queries ⊂ index)
    assert rep[("lsh", 10)]["recall_at_k"] > 0.0
    # hamming-1 multi-probe DOMINATES its base config (superset
    # candidates); on this corpus the 4-plane repair is strict (0.25 →
    # 0.4 recall) while at 10 planes the neighbor buckets are too
    # sparse to add hits — the report showing exactly that trade is
    # the point
    for p in (4, 10):
        assert (rep[("lsh_mp", p)]["recall_at_k"]
                >= rep[("lsh", p)]["recall_at_k"])
        assert (rep[("lsh_mp", p)]["scan_frac"]
                >= rep[("lsh", p)]["scan_frac"])
    assert (rep[("lsh_mp", 4)]["recall_at_k"]
            > rep[("lsh", 4)]["recall_at_k"])


def test_lsh_ann_topk_multi_probe_superset(emb):
    """multi_probe=1 scores the union of the exact bucket and every
    hamming-1 bucket, so its top-k is drawn from a SUPERSET of the
    plain config's candidates: any plain hit at rank r keeps sim-rank
    <= r, and the query still finds itself first."""
    import pytest as _p

    from cascalog_spark.functions.similarity import lsh_ann_topk

    qvec = [float(x) for x in
            emb.where(F.col("vec_id") == 0).select("embedding").first()[0]]
    plain = lsh_ann_topk(emb, qvec, k=10, n_planes=8)
    mp = lsh_ann_topk(emb, qvec, k=10, n_planes=8, multi_probe=1)
    p_rows = [(r["vec_id"], r["sim"]) for r in plain.collect()]
    m_rows = [(r["vec_id"], r["sim"]) for r in mp.collect()]
    assert m_rows[0][0] == 0 and m_rows[0][1] == 1.0
    assert len(m_rows) >= len(p_rows)
    # superset candidates: the multi-probe top-k sims dominate pointwise
    for i, (_, psim) in enumerate(p_rows):
        assert m_rows[i][1] >= psim
    with _p.raises(ValueError, match="multi_probe"):
        lsh_ann_topk(emb, qvec, k=5, n_planes=8, multi_probe=2)


def test_cluster_vectorized_matches_expression_path(emb, spark):
    """The BLAS assignment kernel must agree with the native expression
    path row for row on real data (cells AND rounded sims), handle null
    vectors like the expression path (null cell), and respect the
    min-cid tie rule on an exact tie."""
    from cascalog_spark.functions import cluster_embeddings
    from cascalog_spark.functions.similarity import (
        assign_cells_vectorized, ivf_centroids)

    exact = {r["vec_id"]: (r["cluster"], r["s"])
             for r in cluster_embeddings(
                 emb, 16, sim_col="s").collect()}
    fast = {r["vec_id"]: (r["cluster"], r["s"])
            for r in cluster_embeddings(
                emb, 16, sim_col="s", vectorized=True).collect()}
    assert set(exact) == set(fast)
    mism = [(k, exact[k], fast[k]) for k in exact
            if exact[k][0] != fast[k][0]
            or abs((exact[k][1] or 0) - (fast[k][1] or 0)) > 1e-6]
    assert mism == []
    # null vector -> null cell, like the expression path
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, None)],
        "vec_id long, embedding array<double>")
    cents = [(0, [1.0, 0.0]), (5, [0.0, 1.0])]
    got = {r["vec_id"]: r["cluster"]
           for r in assign_cells_vectorized(df, cents).collect()}
    assert got[1] == 0 and got[2] is None
    # exact tie between two centroids -> the smaller cid wins
    tie = spark.createDataFrame([(9, [1.0, 1.0])],
                                "vec_id long, embedding array<double>")
    r = assign_cells_vectorized(tie, cents).first()
    assert r["cluster"] == 0


def test_knn_join_vectorized_matches_expression_path(emb, spark):
    """The BLAS knn kernel must return EXACTLY the expression path's
    (query_id, vec_id, rounded sim) set — per-batch top-k under the
    same total order preserves the global top-k — and time it: the
    kernel's matmul replaces per-pair interpreted fold lambdas."""
    from pyspark.sql import functions as F

    from cascalog_spark.functions import knn_join

    qs = (emb.orderBy("vec_id").limit(6)
          .select(F.col("vec_id").alias("query_id"), "embedding"))
    exact = {(r["query_id"], r["vec_id"], r["sim"])
             for r in knn_join(emb, qs, k=7).collect()}
    fast = {(r["query_id"], r["vec_id"], r["sim"])
            for r in knn_join(emb, qs, k=7, vectorized=True).collect()}
    assert fast == exact
    # empty query set -> empty result with the right columns
    empty = knn_join(emb, qs.where("query_id < 0"), k=3,
                     vectorized=True)
    assert empty.columns == ["query_id", "vec_id", "sim"]
    assert empty.count() == 0


def test_semantic_dedup_cells_vectorized_matches_cells(emb, spark):
    """The BLAS cells kernel must drop EXACTLY the ids the expression
    cells path drops on real data, and survive a null vector and a
    threshold <= 0 edge (everything pairs -> only min ids survive)."""
    from cascalog_spark.functions import semantic_dedup
    from cascalog_spark.functions.dedup import semantic_dedup_losers

    want = {r["vec_id"] for r in semantic_dedup_losers(
        emb, threshold=0.35, method="cells").collect()}
    got = {r["vec_id"] for r in semantic_dedup_losers(
        emb, threshold=0.35, method="cells_vectorized").collect()}
    assert got == want
    kept = semantic_dedup(emb, threshold=0.35,
                          method="cells_vectorized")
    assert kept.count() == emb.count() - len(want)
    # null vectors never pair (same as the expression path's null sim)
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [1.0, 0.0]), (3, None)],
        "vec_id long, embedding array<double>")
    cents = [(0, [1.0, 0.0])]
    got = {r["vec_id"] for r in semantic_dedup_losers(
        df, threshold=0.9, method="cells_vectorized",
        centroids=cents).collect()}
    assert got == {2}
    # threshold <= 0: every same-cell pair matches -> all but min drop
    got = {r["vec_id"] for r in semantic_dedup_losers(
        df.where("embedding is not null"), threshold=-1.0,
        method="cells_vectorized", centroids=cents).collect()}
    assert got == {2}


def test_cosine_ops_zero_norm_contract(spark):
    """Zero-norm vectors have no cosine: under ANSI mode the division
    is an error, so every cosine-ranking op EXCLUDES them explicitly —
    knn_join on both paths (no crash, no phantom 0.0-sim row), the
    vectorized cells dedup (can't drop or be dropped), and
    assign_cells_vectorized (assigns like the argmax — all dots zero →
    min cid — with a NULL sim)."""
    from cascalog_spark.functions import knn_join
    from cascalog_spark.functions.dedup import semantic_dedup_losers
    from cascalog_spark.functions.similarity import \
        assign_cells_vectorized

    idx = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 0.0]), (3, [0.0, 1.0])],
        "vec_id long, embedding array<double>")
    qs = spark.createDataFrame(
        [(10, [1.0, 0.0]), (11, [0.0, 0.0])],
        "query_id long, embedding array<double>")
    for vec in (False, True):
        rows = {(r["query_id"], r["vec_id"])
                for r in knn_join(idx, qs, k=5, vectorized=vec).collect()}
        assert rows == {(10, 1), (10, 3)}, vec
    cents = [(0, [1.0, 0.0]), (5, [0.0, 1.0])]
    losers = {r["vec_id"] for r in semantic_dedup_losers(
        idx, threshold=-1.0, method="cells_vectorized",
        centroids=cents).collect()}
    assert 2 not in losers            # zero vector never pairs
    asg = {r["vec_id"]: (r["cluster"], r["s"])
           for r in assign_cells_vectorized(
               idx, cents, sim_col="s").collect()}
    assert asg[2] == (0, None)        # min cid, no cosine
    assert asg[1][0] == 0 and asg[1][1] == 1.0
    # the expression cells path (the oracle surface) must tolerate the
    # same data the vectorized kernel does
    losers = {r["vec_id"] for r in semantic_dedup_losers(
        idx, threshold=-1.0, method="cells", centroids=cents).collect()}
    assert 2 not in losers
    # incremental (the streaming-ingest kernel) likewise
    from cascalog_spark.functions import semantic_dedup_incremental
    kept, _ = semantic_dedup_incremental(
        idx, None, "vec_id", threshold=0.99, centroids=cents)
    assert {r["vec_id"] for r in kept.select("vec_id").collect()}         == {1, 2, 3}
    # single-query rankers: zero-norm corpus rows fall out, never crash
    from cascalog_spark.functions.similarity import (brute_force_topk,
                                                     cosine_pairs,
                                                     ivf_knn_join,
                                                     lsh_ann_topk)
    got = {r["vec_id"] for r in brute_force_topk(
        idx, [1.0, 0.0], k=5).collect()}
    assert got == {1, 3}
    got = {r["vec_id"] for r in lsh_ann_topk(
        idx, [1.0, 0.0], k=5, n_planes=2).collect()}
    assert 2 not in got and 1 in got
    pairs = cosine_pairs(idx, threshold=-1.0, exact=True).collect()
    assert all(2 not in (r["id_a"], r["id_b"]) for r in pairs)
    got = {(r["query_id"], r["vec_id"]) for r in ivf_knn_join(
        idx, qs, cents, k=5, n_probe=2).collect()}
    assert got == {(10, 1), (10, 3)}
    # the recall report runs end-to-end with the zero rows present
    from cascalog_spark.functions import ann_recall_report
    rep = ann_recall_report(idx, qs, k=2, lsh_planes=(2,),
                            ivf_probes=(2,), n_centroids=2,
                            centroids=cents).collect()
    assert len(rep) == 2
    import pytest as _p
    with _p.raises(ValueError, match="at least one"):
        ann_recall_report(idx, qs, lsh_planes=(), ivf_probes=())
    with _p.raises(ValueError, match="lsh_multi_probe"):
        ann_recall_report(idx, qs, lsh_planes=(2,), lsh_multi_probe=2)
    # k=0 vectorized knn: empty, cheaply (no whole-batch candidates)
    from cascalog_spark.functions import knn_join
    assert knn_join(idx, qs, k=0, vectorized=True).count() == 0


def test_cosine_pairs_vectorized_matches_expression(emb):
    """The BLAS in-bucket pair kernel must emit EXACTLY the expression
    path's (id_a, id_b, sim) set, including the first-matching-band
    suppression, and refuse exact=True (one all-pairs group)."""
    import pytest as _p

    from cascalog_spark.functions.similarity import (cosine_pairs,
                                                     release_cosine_cache)

    kw = dict(threshold=0.35, bands=4, n_planes=8, dim=64)
    expr = cosine_pairs(emb, **kw)
    want = {(r["id_a"], r["id_b"], r["sim"]) for r in expr.collect()}
    release_cosine_cache(expr)
    fast = cosine_pairs(emb, vectorized=True, **kw)
    got = {(r["id_a"], r["id_b"], r["sim"]) for r in fast.collect()}
    release_cosine_cache(fast)
    assert got == want and len(want) > 0
    with _p.raises(ValueError, match="vectorized"):
        cosine_pairs(emb, exact=True, vectorized=True)


def test_containment_pairs_directed_semantics(spark, sf_dir):
    """Containment catches the quoted-inside case Jaccard misses, with
    EXACT recall at the threshold: brute-force all-pairs containment on
    a small corpus must equal the prefix-filtered result; direction
    matters (small ⊂ big, not the reverse); the prefix filter never
    drops a qualifying pair."""
    import itertools

    import pytest as _p

    from cascalog_spark.functions import (containment_pairs,
                                          ngram_jaccard_pairs)

    big = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
           "lam mu nu xi omicron pi rho sigma tau upsilon")
    small = "alpha beta gamma delta epsilon zeta"      # prefix of big
    other = "one two three four five six seven eight nine ten"
    rows = [(1, big), (2, small), (3, other), (4, big + " extra tail")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r["doc_id"], r["container_id"]): r["containment"]
           for r in containment_pairs(df, "doc_id",
                                      threshold=0.8).collect()}
    assert got[(2, 1)] == 1.0          # small fully inside big
    assert (1, 2) not in got           # big is NOT inside small
    assert (2, 4) in got and (1, 4) in got
    assert all(3 not in pair for pair in got)
    # Jaccard misses the small-in-big pair at the same bar
    jac = {(r["id_a"], r["id_b"])
           for r in ngram_jaccard_pairs(df, "doc_id",
                                        threshold=0.8).collect()}
    assert (1, 2) not in jac and (2, 1) not in jac

    # exact-recall property on real data: prefix-filtered == brute force
    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .limit(120).collect())
    from cascalog_spark.functions.text import tokens_col  # noqa: F401
    def shingles(text):
        toks = text.lower().split()
        if len(toks) == 0:
            return {""}
        return {" ".join(toks[i:i + 3])
                for i in range(max(len(toks) - 3, 0) + 1)}
    sets = {r["doc_id"]: shingles(r["text"]) for r in docs}
    t = 0.7
    want = set()
    for a, b in itertools.permutations(sets, 2):
        if sets[a] and len(sets[a] & sets[b]) / len(sets[a]) >= t:
            want.add((a, b))
    sub = spark.createDataFrame([(r["doc_id"], r["text"]) for r in docs],
                                "doc_id long, text string")
    got = {(r["doc_id"], r["container_id"])
           for r in containment_pairs(sub, "doc_id",
                                      threshold=t).collect()}
    assert got == want
    with _p.raises(ValueError, match="threshold"):
        containment_pairs(df, "doc_id", threshold=0.0)


def test_containment_dedup_keeps_containers(spark):
    """Containers survive, contained fragments drop, mutual
    (near-exact) groups keep their min id, unrelated docs untouched."""
    from cascalog_spark.functions import containment_dedup

    big = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
           "lam mu nu xi omicron pi rho sigma tau upsilon")
    rows = [(1, big),
            (2, "alpha beta gamma delta epsilon zeta"),  # ⊂ 1
            (3, "one two three four five six seven"),
            (7, big),                                    # mutual with 1
            (9, "theta iota kappa lam mu nu")]           # ⊂ 1
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kept = {r["doc_id"] for r in containment_dedup(
        df, "doc_id", threshold=0.8).collect()}
    assert kept == {1, 3}


def test_kn_bigram_nll_math(spark):
    """Hand-computed interpolated Kneser-Ney on a 2-doc corpus: every
    count table (c12, c1, N1+ fwd/bwd, N1+(..)) and the per-doc NLL."""
    import math
    from cascalog_spark.functions import kn_bigram_nll
    from cascalog_spark.functions.text import release_tfidf_cache

    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a c"), (3, "x")],
        "doc_id long, text string")
    out = kn_bigram_nll(docs, discount=0.75)
    rows = {r.doc_id: r.kn_nll for r in out.collect()}
    release_tfidf_cache(out)
    # bigrams: doc1 = ab, ba, ab ; doc2 = ac
    # c12: ab=2 ba=1 ac=1 ; c1: a=3 b=1 ; n1f: a=2 b=1
    # n1b: b=1 a=1 c=1 ; npairs=3
    D = 0.75

    def p(c12, c1, n1f, n1b):
        return (c12 - D) / c1 + D * n1f / c1 * (n1b / 3.0)

    p_ab = p(2, 3, 2, 1)
    p_ba = p(1, 1, 1, 1)
    p_ac = p(1, 3, 2, 1)
    exp1 = round(-(2 * math.log(p_ab) + math.log(p_ba)) / 3, 6)
    exp2 = round(-math.log(p_ac), 6)
    assert abs(rows[1] - exp1) < 1e-9
    assert abs(rows[2] - exp2) < 1e-9
    assert 3 not in rows  # single-token doc has no bigrams


def test_kn_bigram_probabilities_sum_to_one(spark, sf_dir):
    """The KN distribution must sum to EXACTLY 1 per history over the
    full vocabulary: sum over seen continuations of p(t2|t1) plus the
    backoff mass D*N1+(t1,.)/c(t1,.) * (1 - sum of seen P_cont) — the
    algebraic identity that distinguishes true Kneser-Ney from an
    ad-hoc discount.  Checked on real corpus text."""
    from collections import Counter, defaultdict

    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .where("doc_id < 40"))
    texts = [r["text"] for r in docs.select("text").collect()]
    c12 = Counter()
    for t in texts:
        toks = [w for w in t.lower().split() if w]
        c12.update(zip(toks, toks[1:]))
    c1, n1f, n1b = Counter(), Counter(), Counter()
    for (t1, t2), c in c12.items():
        c1[t1] += c
        n1f[t1] += 1
        n1b[t2] += 1
    npairs = float(len(c12))
    D = 0.75
    seen_p = defaultdict(float)
    seen_cont = defaultdict(float)
    for (t1, t2), c in c12.items():
        seen_p[t1] += (c - D) / c1[t1] + D * n1f[t1] / c1[t1] \
            * (n1b[t2] / npairs)
        seen_cont[t1] += n1b[t2] / npairs
    for t1 in list(c1)[:200]:
        backoff = D * n1f[t1] / c1[t1] * (1.0 - seen_cont[t1])
        assert abs(seen_p[t1] + backoff - 1.0) < 1e-9


def test_kn_bigram_nll_differential(spark, sf_dir):
    """Distributed KN NLL == single-process numpy/python replica on
    real corpus text (fit-on-self, same tokenization)."""
    import math
    from collections import Counter
    from cascalog_spark.functions import kn_bigram_nll
    from cascalog_spark.functions.text import release_tfidf_cache

    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .where("doc_id < 60").select("doc_id", "text"))
    out = kn_bigram_nll(docs, discount=0.75)
    got = {r.doc_id: r.kn_nll for r in out.collect()}
    release_tfidf_cache(out)

    rows = [(r["doc_id"], r["text"]) for r in docs.collect()]
    c12, per_doc = Counter(), {}
    for did, t in rows:
        toks = [w for w in t.lower().split() if w]
        bgs = list(zip(toks, toks[1:]))
        if bgs:
            per_doc[did] = Counter(bgs)
            c12.update(bgs)
    c1, n1f, n1b = Counter(), Counter(), Counter()
    for (t1, t2), c in c12.items():
        c1[t1] += c
        n1f[t1] += 1
        n1b[t2] += 1
    npairs = float(len(c12))
    D = 0.75
    assert set(got) == set(per_doc)
    for did, bc in per_doc.items():
        tot = sum(bc.values())
        s = 0.0
        for (t1, t2), tfv in bc.items():
            p = (c12[(t1, t2)] - D) / c1[t1] \
                + D * n1f[t1] / c1[t1] * (n1b[t2] / npairs)
            s += tfv * math.log(p)
        assert abs(got[did] - round(-s / tot, 6)) < 1e-6


def test_kn_bigram_discount_validation(spark):
    import pytest as _pytest
    from cascalog_spark.functions import kn_bigram_nll

    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    for bad in (0.0, 1.0, -0.5, 1.5):
        with _pytest.raises(ValueError, match="discount"):
            kn_bigram_nll(docs, discount=bad)


def test_rank_fusion_math_and_edges(spark):
    """RRF on a 4-doc frame: hand-computed ranks and fused scores,
    weights, null-signal drop, validation."""
    import pytest as _pytest
    from cascalog_spark.functions import rank_fusion

    df = spark.createDataFrame(
        [(1, 10.0, 0.9), (2, 30.0, 0.1), (3, 20.0, None),
         (4, 40.0, 0.5)],
        "doc_id long, quality double, nll double")
    out = rank_fusion(df, {"quality": "desc", "nll": "asc"},
                      k=60, keep_ranks=True)
    got = {r["doc_id"]: r for r in out.collect()}
    assert set(got) == {1, 2, 4}          # doc 3: null nll dropped
    # quality desc ranks: 4->1, 2->2, 1->3 ; nll asc: 2->1, 4->2, 1->3
    assert got[4]["quality_rank"] == 1 and got[4]["nll_rank"] == 2
    assert got[2]["quality_rank"] == 2 and got[2]["nll_rank"] == 1
    for d in (1, 2, 4):
        exp = 1.0 / (60 + got[d]["quality_rank"]) \
            + 1.0 / (60 + got[d]["nll_rank"])
        assert got[d]["rrf_score"] == _pytest.approx(exp, abs=1e-12)
    # weights scale their signal's term
    w = rank_fusion(df, {"quality": ("desc", 2.0), "nll": ("asc", 0.5)},
                    keep_ranks=True)
    gw = {r["doc_id"]: r for r in w.collect()}
    exp4 = 2.0 / (60 + gw[4]["quality_rank"]) \
        + 0.5 / (60 + gw[4]["nll_rank"])
    assert gw[4]["rrf_score"] == _pytest.approx(exp4, abs=1e-12)
    with _pytest.raises(ValueError, match="direction"):
        rank_fusion(df, {"quality": "down"})
    with _pytest.raises(ValueError, match="k must"):
        rank_fusion(df, {"quality": "desc"}, k=0)
    with _pytest.raises(ValueError, match="non-empty"):
        rank_fusion(df, {})


def test_rank_fusion_matches_single_partition_ranks(spark, sf_dir):
    """Fused ordering on real docs == a plain row_number reference
    (the scale-safe rank path must be EXACT, not approximate)."""
    from pyspark.sql import Window
    from cascalog_spark.functions import rank_fusion

    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .withColumn("n_toks", F.size(F.split(F.lower("text"),
                                                 r"\s+")).cast("double"))
            .withColumn("n_chars", F.length("text").cast("double")))
    out = rank_fusion(docs, {"n_toks": "desc", "n_chars": "asc"},
                      keep_ranks=True)
    got = {r["doc_id"]: (r["n_toks_rank"], r["n_chars_rank"],
                         r["rrf_score"]) for r in out.collect()}
    wt = Window.orderBy(F.col("n_toks").desc(), F.col("doc_id").asc())
    wc = Window.orderBy(F.col("n_chars").asc(), F.col("doc_id").asc())
    ref = {r["doc_id"]: (r["rt"], r["rc"]) for r in
           docs.select("doc_id", F.row_number().over(wt).alias("rt"),
                       F.row_number().over(wc).alias("rc")).collect()}
    assert got.keys() == ref.keys()
    for d, (rt, rc, score) in got.items():
        assert (rt, rc) == ref[d]
        assert score == 1.0 / (60 + rt) + 1.0 / (60 + rc)


def test_prefix_rescore_topk_matches_brute_force(spark, sf_dir):
    """shortlist = n must reproduce the exact brute-force top-k; a
    smaller shortlist is deterministic and its rescored sims are exact
    (every returned sim equals the brute-force sim for that id)."""
    from cascalog_spark.functions import (brute_force_topk,
                                          prefix_rescore_topk)

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qv = [float(x) for x in emb.where("vec_id = 0").first()["embedding"]]
    n = emb.count()
    exact = [(r["vec_id"], r["sim"])
             for r in brute_force_topk(emb, qv, k=10).collect()]
    full = [(r["vec_id"], r["sim"])
            for r in prefix_rescore_topk(emb, qv, k=10, d_prefix=16,
                                         shortlist=n).collect()]
    assert full == exact
    small = [(r["vec_id"], r["sim"])
             for r in prefix_rescore_topk(emb, qv, k=10, d_prefix=16,
                                          shortlist=50).collect()]
    again = [(r["vec_id"], r["sim"])
             for r in prefix_rescore_topk(emb, qv, k=10, d_prefix=16,
                                          shortlist=50).collect()]
    assert small == again
    exact_sims = dict(exact + [(r["vec_id"], r["sim"])
                               for r in brute_force_topk(emb, qv,
                                                         k=n).collect()])
    for vid, s in small:
        assert s == exact_sims[vid]  # rescore is EXACT full-dim cosine
    # the query row itself survives any prefilter (prefix sim = 1)
    assert small[0][0] == 0


def test_prefix_rescore_edges(spark, sf_dir):
    from cascalog_spark.functions import (prefix_rescore_topk,
                                          truncate_embeddings)

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qv = [float(x) for x in emb.where("vec_id = 0").first()["embedding"]]
    assert prefix_rescore_topk(emb, qv, k=0).count() == 0
    assert prefix_rescore_topk(emb, qv, shortlist=0).count() == 0
    import pytest as _pt
    with _pt.raises(ValueError):
        prefix_rescore_topk(emb, qv, d_prefix=65)
    t = truncate_embeddings(emb, 16)
    row = t.first()
    assert len(row["prefix_vec"]) == 16
    tn = truncate_embeddings(emb, 16, renormalize=True).first()
    norm = sum(x * x for x in tn["prefix_vec"]) ** 0.5
    assert abs(norm - 1.0) < 1e-9
    with _pt.raises(ValueError):
        truncate_embeddings(emb, 0)
    # oversized prefix: refuse (was a silent no-op), matching
    # prefix_rescore_topk's contract
    with _pt.raises(ValueError, match="exceeds"):
        truncate_embeddings(emb, 65)


def test_ann_recall_report_prefix_rows(spark, sf_dir):
    """prefix rows: full-dim prefix == exact ordering -> recall 1.0;
    scan_frac == shortlist/n; widths are present as params."""
    from cascalog_spark.functions import ann_recall_report

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qs = (emb.orderBy("vec_id").limit(4)
          .select(F.col("vec_id").alias("query_id"), "embedding"))
    n = emb.where(F.col("embedding").isNotNull()).count()
    rep = {r["param"]: r for r in
           ann_recall_report(emb, qs, k=5, lsh_planes=(),
                             ivf_probes=(), prefix_dims=(8, 64),
                             prefix_shortlist=20).collect()}
    assert set(rep) == {8, 64}
    assert all(r["method"] == "prefix" for r in rep.values())
    # d = dim: prefix ordering IS the exact ordering -> full recall
    assert rep[64]["recall_at_k"] == 1.0
    assert rep[8]["recall_at_k"] <= 1.0
    assert rep[64]["scan_frac"] == round(20 / n, 6)


def test_kcenter_sample_and_assign(spark):
    from cascalog_spark.functions import kcenter_assign, kcenter_sample

    # three tight clusters on distinct axes + a duplicate of the seed
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]), (1, [0.99, 0.01, 0.0, 0.0]),
        (2, [0.0, 1.0, 0.0, 0.0]), (3, [0.01, 0.99, 0.0, 0.0]),
        (4, [0.0, 0.0, 1.0, 0.0]), (5, [1.0, 0.0, 0.0, 0.0]),
        (6, None), (7, [0.0, 0.0, 0.0, 0.0]),  # null + zero-norm drop
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    sel = kcenter_sample(emb, k=3)
    assert [s[0] for s in sel] == [0, 1, 2]
    assert sel[0][1] == 0 and sel[0][3] is None  # seed = min id
    # farthest from axis-x is an orthogonal axis (distance 1.0)
    assert sel[1][1] in (2, 4) and abs(sel[1][3] - 1.0) < 1e-9
    # third pick = the remaining orthogonal axis
    picked = {sel[1][1], sel[2][1]}
    assert picked == {2, 4}
    # radii are non-increasing
    assert sel[2][3] <= sel[1][3] + 1e-12
    # determinism
    assert kcenter_sample(emb, k=3) == sel

    asg = {r["vec_id"]: (r["center"], r["sim"])
           for r in kcenter_assign(emb, sel).collect()}
    assert set(asg) == {0, 1, 2, 3, 4, 5}  # null/zero-norm dropped
    assert asg[0] == (0, 1.0) and asg[5] == (0, 1.0)
    assert asg[1][0] == 0 and asg[3][0] in picked
    assert asg[4][0] == 4

    # k exceeding distinct rows stops early
    tiny = spark.createDataFrame(rows[:2],
                                 "vec_id long, embedding array<double>")
    assert len(kcenter_sample(tiny, k=10)) <= 2
    assert kcenter_sample(emb, k=0) == []
    import pytest as _pt
    with _pt.raises(ValueError):
        kcenter_assign(emb, [])
