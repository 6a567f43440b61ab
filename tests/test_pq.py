"""Product-quantization family: codebook training, encode (expression vs
BLAS kernel equivalence), decode/ADC identities, quality report, edges."""

import math

import pytest
from pyspark.sql import functions as F

from cascalog_spark.functions import (pq_adc_topk, pq_codebooks,
                                      pq_decode_col, pq_encode,
                                      pq_reconstruction_report)
from cascalog_spark.functions.pq import _adc_lut


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


@pytest.fixture(scope="module")
def books(emb):
    return pq_codebooks(emb, m=8, n_codes=16)


def test_codebook_shape_and_determinism(emb, books):
    assert len(books) == 8
    assert all(len(cb) == 16 for cb in books)
    assert all(len(c) == 8 for cb in books for c in cb)
    again = pq_codebooks(emb, m=8, n_codes=16)
    assert books == again
    # seed rule: subspace s of code j == seed row j's s-th subvector
    seeds = (emb.where(F.col("embedding").isNotNull())
             .orderBy("vec_id").limit(16).collect())
    v0 = [float(x) for x in seeds[3]["embedding"]]
    assert books[2][3] == v0[16:24]


def test_dim_not_divisible_raises(emb):
    with pytest.raises(ValueError, match="divisible"):
        pq_codebooks(emb, m=7, n_codes=16)


def test_encode_expression_matches_kernel(emb, books):
    expr = {r["vec_id"]: r["pq_codes"]
            for r in pq_encode(emb, books).select("vec_id",
                                                  "pq_codes").collect()}
    kern = {r["vec_id"]: r["pq_codes"]
            for r in pq_encode(emb, books,
                               vectorized=True).select(
                "vec_id", "pq_codes").collect()}
    assert expr == kern
    codes = next(c for c in expr.values() if c is not None)
    assert len(codes) == 8 and all(0 <= c < 16 for c in codes)


def test_seed_rows_encode_to_their_own_code(emb, books):
    # a seed row is distance-0 from its own subvectors -> code j in
    # every subspace (unless another seed duplicates a subvector)
    seeds = (emb.where(F.col("embedding").isNotNull())
             .orderBy("vec_id").limit(16).collect())
    sid = seeds[5]["vec_id"]
    row = (pq_encode(emb.where(F.col("vec_id") == sid), books)
           .first())
    assert row["pq_codes"] == [5] * 8


def test_null_vector_encodes_null(spark, books):
    df = spark.createDataFrame([(1, None)],
                               "vec_id long, embedding array<float>")
    assert pq_encode(df, books).first()["pq_codes"] is None
    out = pq_adc_topk(df, [0.0] * 64, books, k=5)
    assert out.count() == 0


def test_decode_adc_identity(emb, books):
    """ADC('ip') score == dot(query, decode(codes)) — the identity the
    lookup table implements; verified against a native recompute."""
    q = [float(x) for x in
         emb.where(F.col("vec_id") == 0).first()["embedding"]]
    enc = pq_encode(emb.where(F.col("vec_id") < 30), books)
    qlit = F.array(*[F.lit(x) for x in q])
    recon_dot = F.aggregate(
        F.zip_with(pq_decode_col(F.col("pq_codes"), books), qlit,
                   lambda a, b: a * b),
        F.lit(0.0), lambda acc, x: acc + x)
    rows = enc.select("vec_id", F.round(recon_dot, 6).alias("d")).collect()
    truth = {r["vec_id"]: r["d"] for r in rows if r["d"] is not None}
    adc = pq_adc_topk(emb.where(F.col("vec_id") < 30), q, books, k=30)
    for r in adc.collect():
        assert r["score"] == pytest.approx(truth[r["vec_id"]], abs=2e-6)


def test_adc_l2_prefers_self(emb, books):
    """Under the l2 metric a seed row's own vector has reconstruction
    distance 0 -> it must rank first for itself as the query."""
    seeds = (emb.where(F.col("embedding").isNotNull())
             .orderBy("vec_id").limit(16).collect())
    q = [float(x) for x in seeds[7]["embedding"]]
    top = pq_adc_topk(emb, q, books, k=1, metric="l2").first()
    assert top["score"] == pytest.approx(0.0, abs=1e-9)


def test_adc_topk_order_and_k(emb, books):
    q = [float(x) for x in
         emb.where(F.col("vec_id") == 0).first()["embedding"]]
    out = pq_adc_topk(emb, q, books, k=10).collect()
    assert len(out) == 10
    scores = [r["score"] for r in out]
    assert scores == sorted(scores, reverse=True)
    assert pq_adc_topk(emb, q, books, k=0).count() == 0
    with pytest.raises(ValueError, match="metric"):
        pq_adc_topk(emb, q, books, k=5, metric="euclid")


def test_adc_ranking_close_to_exact(emb, books):
    """PQ is lossy — on this synthetic near-random corpus the exact-IP
    top-10 scores are tightly clustered, so recall@10 of 4-5 is the
    honest reading (measured: 4 at iters=0, 5 at iters=10).  The floor
    pins that ADC ranking stays correlated with exact IP; the MSE test
    below pins that training improves the codebook."""
    q = [float(x) for x in
         emb.where(F.col("vec_id") == 0).first()["embedding"]]
    qlit = F.array(*[F.lit(x) for x in q])
    vec = F.col("embedding").cast("array<double>")
    exact = (emb.where(F.col("embedding").isNotNull())
             .select("vec_id",
                     F.aggregate(F.zip_with(vec, qlit, lambda a, b: a * b),
                                 F.lit(0.0), lambda acc, x: acc + x)
                     .alias("ip"))
             .orderBy(F.col("ip").desc(), F.col("vec_id").asc())
             .limit(10).collect())
    truth = {r["vec_id"] for r in exact}
    approx = {r["vec_id"]
              for r in pq_adc_topk(emb, q, books, k=10).collect()}
    assert len(truth & approx) >= 3


def test_kmeans_refinement_reduces_mse(emb):
    b0 = pq_codebooks(emb, m=8, n_codes=16, kmeans_iters=0)
    b5 = pq_codebooks(emb, m=8, n_codes=16, kmeans_iters=5)
    mse0 = pq_reconstruction_report(emb, b0).first()["mse"]
    mse5 = pq_reconstruction_report(emb, b5).first()["mse"]
    assert mse5 < mse0
    again = pq_codebooks(emb, m=8, n_codes=16, kmeans_iters=5)
    assert b5 == again  # bounded-sample Lloyd is deterministic


def test_reconstruction_report_shape(emb, books):
    row = pq_reconstruction_report(emb, books).first()
    n = emb.where(F.col("embedding").isNotNull()).count()
    assert row["n_rows"] == n
    assert row["mse"] > 0 and row["rms"] == pytest.approx(
        math.sqrt(row["mse"]), rel=1e-3)
    assert 0 < row["code_entropy_bits"] <= row["max_entropy_bits"] == 4.0


def test_encode_plan_is_native(emb, books):
    plan = pq_encode(emb, books)._jdf.queryExecution().executedPlan() \
        .toString()
    assert "EvalPython" not in plan  # expression path: no Python on rows
    adc = pq_adc_topk(emb, [0.1] * 64, books, k=5,
                      vec_col="embedding")
    aplan = adc._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in aplan
    assert "TakeOrderedAndProject" in aplan  # top-k, not a full sort


def test_adc_cosine_equals_decoded_cosine(emb, books):
    """metric='cosine' (ip-lut / norm²-lut) == true cosine of the
    reconstruction — the identity the two lookup tables implement."""
    from cascalog_spark.functions.similarity import cosine_similarity_col

    q = [float(x) for x in
         emb.where(F.col("vec_id") == 1).first()["embedding"]]
    qlit = F.array(*[F.lit(x) for x in q])
    enc = pq_encode(emb.where(F.col("vec_id") < 40), books)
    truth = {r["vec_id"]: r["cs"] for r in enc.select(
        "vec_id",
        F.round(cosine_similarity_col(
            pq_decode_col(F.col("pq_codes"), books), qlit), 6).alias("cs"))
        .collect() if r["cs"] is not None}
    out = pq_adc_topk(emb.where(F.col("vec_id") < 40), q, books, k=40,
                      metric="cosine")
    got = {r["vec_id"]: r["score"] for r in out.collect()}
    assert set(got) == set(truth)
    for vid, s in got.items():
        assert s == pytest.approx(truth[vid], abs=2e-6)


def test_pq_knn_join_matches_adc_topk(emb, books):
    """The batch path must return the same per-query top-k as the
    single-query cosine ADC (same lut values, same op order, same
    tie rule)."""
    from cascalog_spark.functions import pq_knn_join

    queries = (emb.where(F.col("vec_id") < 3)
               .select(F.col("vec_id").alias("query_id"), "embedding"))
    got = pq_knn_join(emb, queries, books, k=5).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append((r["vec_id"], r["sim"]))
    assert set(by_q) == {0, 1, 2}
    for qid, rows in by_q.items():
        q = [float(x) for x in
             emb.where(F.col("vec_id") == qid).first()["embedding"]]
        single = [(r["vec_id"], r["score"]) for r in
                  pq_adc_topk(emb, q, books, k=5,
                              metric="cosine").collect()]
        assert sorted(rows, key=lambda t: (-t[1], t[0])) == single


def test_pq_knn_join_edges(spark, emb, books):
    from cascalog_spark.functions import pq_knn_join

    queries = (emb.where(F.col("vec_id") < 2)
               .select(F.col("vec_id").alias("query_id"), "embedding"))
    assert pq_knn_join(emb, queries, books, k=0).count() == 0
    zq = spark.createDataFrame([(9, [0.0] * 64)],
                               "query_id long, embedding array<float>")
    assert pq_knn_join(emb, zq, books, k=5).count() == 0


def test_recall_report_pq_rows(emb, books):
    """PQ rows in the ANN tuning report: scan_frac is exactly 1.0
    (compression, not pruning) and recall is the quantization cost;
    a pq-only config list is accepted."""
    from cascalog_spark.functions import ann_recall_report

    queries = (emb.where(F.col("vec_id") < 5)
               .select(F.col("vec_id").alias("query_id"), "embedding"))
    rep = ann_recall_report(emb, queries, k=10, lsh_planes=(4,),
                            ivf_probes=(), pq_m=(8,)).collect()
    methods = {(r["method"], r["param"]) for r in rep}
    assert methods == {("lsh", 4), ("pq", 8)}
    pq_row = next(r for r in rep if r["method"] == "pq")
    assert pq_row["scan_frac"] == 1.0
    assert 0.0 < pq_row["recall_at_k"] <= 1.0
    only = ann_recall_report(emb, queries, k=10, lsh_planes=(),
                             ivf_probes=(), pq_m=(8,)).collect()
    assert len(only) == 1 and only[0]["method"] == "pq"


# ---- hypothesis fuzz: random vectors/codebook shapes, PQ identities ----

import os

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SET = settings(max_examples=int(os.environ.get("CSPARK_FUZZ", "5")),
                deadline=None,
                suppress_health_check=[
                    HealthCheck.function_scoped_fixture,
                    HealthCheck.too_slow])

_vals = st.floats(min_value=-4.0, max_value=4.0, allow_nan=False,
                  width=32)


@given(data=st.data(), m=st.sampled_from([1, 2, 4]),
       k=st.integers(min_value=1, max_value=5))
@_SET
def test_pq_fuzz_identities(spark, data, m, k):
    """Random float corpora, any (m, n_codes) shape: expression ==
    BLAS kernel codes, every code in range, seed rows self-code, and
    ADC(ip) == dot(query, decode(codes)) for a random query."""
    import numpy as np

    dim = m * 4
    n = data.draw(st.integers(min_value=k, max_value=12))
    rows = [(i, data.draw(st.lists(_vals, min_size=dim, max_size=dim)))
            for i in range(n)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    books = pq_codebooks(df, m=m, n_codes=k, dim=dim)
    expr = {r["vec_id"]: r["pq_codes"]
            for r in pq_encode(df, books).collect()}
    kern = {r["vec_id"]: r["pq_codes"]
            for r in pq_encode(df, books, vectorized=True).collect()}
    # kernel parity caveat (documented on _pq_encode_vectorized): its
    # ||c||^2 - 2x.c formulation can break EXACT ties differently than
    # the (x-c)^2 chain — hypothesis crafts such ties from denormals.
    # Where codes differ, the two chosen centroids must be equally near.
    byid = {vid: vec for vid, vec in rows}
    for vid, ec in expr.items():
        kc = kern[vid]
        for s, (a, b) in enumerate(zip(ec, kc)):
            if a == b:
                continue
            x = np.asarray(byid[vid][s * 4:(s + 1) * 4],
                           dtype=np.float64)
            da = ((x - np.asarray(books[s][a])) ** 2).sum()
            db = ((x - np.asarray(books[s][b])) ** 2).sum()
            assert da == pytest.approx(db, rel=1e-9, abs=1e-30)
    assert all(0 <= c < k for codes in expr.values() for c in codes)
    q = data.draw(st.lists(_vals, min_size=dim, max_size=dim))
    q = [float(x) for x in np.asarray(q, dtype=np.float32)]
    adc = {r["vec_id"]: r["score"]
           for r in pq_adc_topk(df, q, books, k=n).collect()}
    flat = {}
    for vid, codes in expr.items():
        recon = [x for s, c in enumerate(codes)
                 for x in books[s][c]]
        flat[vid] = sum(qq * rr for qq, rr in zip(q, recon))
    for vid, score in adc.items():
        assert score == pytest.approx(flat[vid], abs=2e-6)


# -- IVF-PQ composite index ---------------------------------------------------


@pytest.fixture(scope="module")
def ivfpq(emb):
    from cascalog_spark.functions import ivfpq_index

    cents, books_, codes = ivfpq_index(emb, n_centroids=8, m=8, n_codes=8)
    codes = codes.localCheckpoint()
    return cents, books_, codes


def test_ivfpq_codes_shape_and_cells(emb, ivfpq):
    cents, books_, codes = ivfpq
    n = emb.where(F.col("embedding").isNotNull()).count()
    assert codes.count() == n
    cells = {r["__cell"] for r in codes.select("__cell").distinct().collect()}
    assert cells <= {cid for cid, _ in cents}
    row = codes.first()
    assert len(row["codes"]) == 8
    assert all(0 <= c < 8 for c in row["codes"])


def test_ivfpq_residual_codebooks_not_degenerate(ivfpq):
    """The seed rows ARE the centroids (residual identically zero) — the
    nonzero-residual seed rule must produce codebooks with real spread,
    not 8 near-zero codes."""
    _, books_, _ = ivfpq
    for sub in books_:
        norms = [sum(x * x for x in code) for code in sub]
        assert max(norms) > 1e-6


def test_ivfpq_topk_self_and_determinism(emb, ivfpq):
    from cascalog_spark.functions import ivfpq_topk

    cents, books_, codes = ivfpq
    qv = [float(x)
          for x in emb.where("vec_id = 0").first()["embedding"]]
    a = ivfpq_topk(codes, qv, cents, books_, k=10, n_probe=3).collect()
    b = ivfpq_topk(codes, qv, cents, books_, k=10, n_probe=3).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    assert len(a) == 10
    # the query row itself lands in its own (probed-first) cell and its
    # ADC score must rank it; scores are descending
    scores = [r["score"] for r in a]
    assert scores == sorted(scores, reverse=True)
    assert any(r["vec_id"] == 0 for r in a)


def test_ivfpq_scan_bounded_by_probe(emb, ivfpq):
    """Candidates scanned = rows of probed cells only (the IVF contract)."""
    from cascalog_spark.functions.similarity import _probe_cells

    cents, books_, codes = ivfpq
    qv = [float(x)
          for x in emb.where("vec_id = 0").first()["embedding"]]
    probe = _probe_cells(cents, qv, 2)
    in_probe = codes.where(F.col("__cell").isin(probe)).count()
    assert in_probe < codes.count()  # pruning is real on this data


def test_ivfpq_write_query_roundtrip(emb, tmp_path, ivfpq):
    from cascalog_spark.functions import (ivfpq_query_index, ivfpq_topk,
                                          ivfpq_write_index)

    cents, books_, codes = ivfpq
    path = str(tmp_path / "ivfpq_idx")
    c2, b2 = ivfpq_write_index(emb, path, n_centroids=8, m=8, n_codes=8)
    assert c2 == cents and b2 == books_
    qv = [float(x)
          for x in emb.where("vec_id = 7").first()["embedding"]]
    direct = ivfpq_topk(codes, qv, cents, books_, k=5, n_probe=3)
    via_disk = ivfpq_query_index(emb.sparkSession, path, c2, b2, qv,
                                 k=5, n_probe=3)
    assert [tuple(r) for r in direct.collect()] \
        == [tuple(r) for r in via_disk.collect()]
    # the __cell IN probe predicate must prune partitions at the scan
    plan = via_disk._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan


def test_ivfpq_recall_report_rows(emb):
    from cascalog_spark.functions import ann_recall_report

    qs = (emb.orderBy(F.col("vec_id").asc()).limit(4)
          .select(F.col("vec_id").alias("query_id"), "embedding"))
    rep = ann_recall_report(emb, qs, k=5, lsh_planes=(), ivf_probes=(2,),
                            n_centroids=8, ivfpq_probes=(2, 8)).collect()
    rows = {(r["method"], r["param"]): r for r in rep}
    assert ("ivfpq", 2) in rows and ("ivfpq", 8) in rows
    # ivfpq candidates = ivf candidates at equal n_probe -> same scan_frac
    assert rows[("ivfpq", 2)]["scan_frac"] \
        == pytest.approx(rows[("ivf", 2)]["scan_frac"], abs=1e-9)
    # more probes never reduce recall or scan
    assert rows[("ivfpq", 8)]["recall_at_k"] \
        >= rows[("ivfpq", 2)]["recall_at_k"]
    assert rows[("ivfpq", 8)]["scan_frac"] \
        > rows[("ivfpq", 2)]["scan_frac"]
    for r in rep:
        assert 0.0 <= r["recall_at_k"] <= 1.0
        assert 0.0 < r["scan_frac"] <= 1.0


def test_ivfpq_append_index(emb, tmp_path, ivfpq):
    """Appending a batch with the ORIGINAL model: old cells' rows are
    untouched, new rows land in their cells, queries see both."""
    from cascalog_spark.functions import (ivfpq_append_index,
                                          ivfpq_query_index,
                                          ivfpq_write_index)

    cents, books_, _ = ivfpq
    path = str(tmp_path / "ivfpq_grow")
    base = emb.where(F.col("vec_id") < 400)
    batch = emb.where(F.col("vec_id") >= 400)
    ivfpq_write_index(base, path, n_centroids=8, m=8, n_codes=8,
                      centroids=cents, codebooks=books_)
    ivfpq_append_index(batch, path, cents, books_)
    spark = emb.sparkSession
    total = spark.read.parquet(path).count()
    assert total == emb.where(F.col("embedding").isNotNull()).count()
    # a query over the grown index equals one over a from-scratch index
    full_path = str(tmp_path / "ivfpq_full")
    ivfpq_write_index(emb, full_path, n_centroids=8, m=8, n_codes=8,
                      centroids=cents, codebooks=books_)
    qv = [float(x) for x in emb.where("vec_id = 3").first()["embedding"]]
    a = ivfpq_query_index(spark, path, cents, books_, qv, k=7, n_probe=3)
    b = ivfpq_query_index(spark, full_path, cents, books_, qv, k=7,
                          n_probe=3)
    assert [tuple(r) for r in a.collect()] == [tuple(r) for r in b.collect()]


def test_ivfpq_knn_join_matches_topk(emb, ivfpq):
    """The batch join must reproduce the single-query ADC path exactly:
    for each query id, its top-k rows/scores == ivfpq_topk's."""
    from cascalog_spark.functions import ivfpq_knn_join, ivfpq_topk

    cents, books_, codes = ivfpq
    qs = (emb.where(F.col("vec_id") < 4)
          .select(F.col("vec_id").alias("query_id"), "embedding"))
    got = {}
    for r in ivfpq_knn_join(codes, qs, cents, books_, k=5,
                            n_probe=3).collect():
        got.setdefault(r["query_id"], []).append(
            (r["vec_id"], r["score"]))
    assert set(got) == {0, 1, 2, 3}
    for qid in range(4):
        qv = [float(x) for x in
              emb.where(F.col("vec_id") == qid).first()["embedding"]]
        want = [(r["vec_id"], r["score"])
                for r in ivfpq_topk(codes, qv, cents, books_, k=5,
                                    n_probe=3).collect()]
        assert sorted(got[qid], key=lambda t: (-t[1], t[0])) == want


def test_ivfpq_knn_join_edges(spark, emb, ivfpq):
    from cascalog_spark.functions import ivfpq_knn_join

    cents, books_, codes = ivfpq
    # zero-norm and NULL query vectors drop (no-cosine contract)
    qs = spark.createDataFrame(
        [(100, [0.0] * 64), (101, None),],
        "query_id long, embedding array<double>")
    assert ivfpq_knn_join(codes, qs, cents, books_, k=5).count() == 0
    real = (emb.where(F.col("vec_id") < 2)
            .select(F.col("vec_id").alias("query_id"), "embedding"))
    assert ivfpq_knn_join(codes, real, cents, books_, k=0).count() == 0


def test_ivfpq_knn_join_scan_shape(emb, ivfpq):
    """Plan shape: candidates come from a cell equi-join (no broadcast
    of the index, no cartesian), and the per-query LUT is built on the
    query side — the executed plan joins on the cell column."""
    from cascalog_spark.functions import ivfpq_knn_join

    cents, books_, codes = ivfpq
    qs = (emb.where(F.col("vec_id") < 4)
          .select(F.col("vec_id").alias("query_id"), "embedding"))
    plan = ivfpq_knn_join(codes, qs, cents, books_, k=5, n_probe=2) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "__cell" in plan


def test_ivfpq_single_encode_in_plan(emb, ivfpq):
    """Regression gate for the r7 pushed-filter double-encode fix: with
    a LAZY ivfpq_index input, the executed plan must contain the encode
    expression exactly ONCE (its argmin marker `array_position`) — a
    codes/score filter that gets pushed below the scoring would inline
    a full second copy per row (BASELINE.md r7 session-2)."""
    from cascalog_spark.functions import ivfpq_knn_join, ivfpq_topk

    cents, books_, codes = ivfpq
    lazy = codes  # module fixture checkpoints; rebuild the lazy plan
    from cascalog_spark.functions import ivfpq_index

    _, _, lazy = ivfpq_index(emb, n_centroids=8, m=8, n_codes=8,
                             centroids=cents, codebooks=books_)
    qs = (emb.where(F.col("vec_id") < 2)
          .select(F.col("vec_id").alias("query_id"), "embedding"))
    for df in (
        ivfpq_knn_join(lazy, qs, cents, books_, k=3, n_probe=2),
        ivfpq_topk(lazy, [1.0] * 64, cents, books_, k=3, n_probe=2),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert plan.count("array_position") == 1


def test_ivfpq_knn_join_dpp_on_written_index(emb, tmp_path, ivfpq):
    """Over the WRITTEN index layout, the cell equi-join triggers
    dynamic partition pruning: the codes scan carries a dynamicpruning
    PartitionFilter, so only the union of probed cells' files is read
    at runtime — the batch-join twin of ivfpq_query_index's static
    partition filter."""
    from cascalog_spark.functions import ivfpq_knn_join, ivfpq_write_index

    cents, books_, _ = ivfpq
    path = str(tmp_path / "ivfpq_dpp")
    ivfpq_write_index(emb, path, n_centroids=8, m=8, n_codes=8,
                      centroids=cents, codebooks=books_)
    idx = emb.sparkSession.read.parquet(path)
    qs = (emb.where(F.col("vec_id") < 2)
          .select(F.col("vec_id").alias("query_id"), "embedding"))
    out = ivfpq_knn_join(idx, qs, cents, books_, k=3, n_probe=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower()
    assert out.count() > 0


def test_ivfpq_rerank_two_stage(spark, sf_dir):
    """rerank=r: the ADC top-(k*r) shortlist rescored by exact cosine
    must (a) equal an independently computed exact rescore of that
    shortlist, (b) lift report recall to at-or-above plain ADC, and
    (c) demand a vectors frame."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from cascalog_spark.functions import ann_recall_report, ivfpq_index
    from cascalog_spark.functions.pq import ivfpq_topk
    from cascalog_spark.functions.similarity import (dot_col, norm_col,
                                                     _lit_arr)

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents, books, codes = ivfpq_index(emb, n_centroids=16, m=8,
                                      n_codes=16)
    codes = codes.localCheckpoint()
    qvec = [float(x) for x in emb.orderBy("vec_id").first()["embedding"]]

    with _pytest.raises(ValueError, match="vectors"):
        ivfpq_topk(codes, qvec, cents, books, k=5, rerank=3)

    k, r = 5, 4
    short_ids = [row["vec_id"] for row in
                 ivfpq_topk(codes, qvec, cents, books, k=k * r,
                            n_probe=4).collect()]
    got = [(row["vec_id"], row["score"]) for row in
           ivfpq_topk(codes, qvec, cents, books, k=k, n_probe=4,
                      rerank=r, vectors=emb).collect()]
    # independent exact rescore of the same shortlist
    import math
    from functools import reduce
    qn = math.sqrt(reduce(lambda a, b: a + b, [x * x for x in qvec]))
    v = F.col("embedding").cast("array<double>")
    ref = (emb.where(F.col("vec_id").isin(short_ids))
           .select("vec_id",
                   F.round(F.try_divide(
                       dot_col(v, _lit_arr(qvec)),
                       norm_col(v) * F.lit(qn)), 6).alias("score"))
           .orderBy(F.col("score").desc(), F.col("vec_id").asc())
           .limit(k).collect())
    assert got == [(row["vec_id"], row["score"]) for row in ref]

    qs = (emb.orderBy(F.col("vec_id").asc()).limit(8)
          .select(F.col("vec_id").alias("query_id"), "embedding"))
    rep = {(row["method"], row["param"]): row["recall_at_k"] for row in
           ann_recall_report(emb, qs, k=10, lsh_planes=(),
                             ivf_probes=(), ivfpq_probes=(1, 2, 4),
                             ivfpq_rerank=5).collect()}
    for p in (1, 2, 4):
        assert rep[("ivfpq_rr", p)] >= rep[("ivfpq", p)]


def test_lazy_cell_marker_survives_transforms(emb, ivfpq):
    """r11 gate for the lazy-cell marker: the r10 form was a Python
    attribute on the DataFrame object, silently lost on ANY intervening
    transformation — reverting ivfpq_topk to pushing isin(probe) (with
    the whole assignment chain inlined, a 52 KB Filter) below the scan
    Exchange with no test tripping.  The marker now rides as __cell
    COLUMN METADATA, surviving select/where/localCheckpoint; this gate
    is red if it is ever lost again."""
    from cascalog_spark.functions import ivfpq_index
    from cascalog_spark.functions.pq import _is_lazy_cell, ivfpq_topk

    cents, books_, codes = ivfpq
    _, _, lazy = ivfpq_index(emb, n_centroids=8, m=8, n_codes=8,
                             centroids=cents, codebooks=books_)
    transformed = (lazy.where(F.col("vec_id") >= 0)
                   .select("vec_id", "__cell", "codes"))
    # the legacy attribute IS lost here — the metadata must survive
    assert not getattr(transformed, "_ivfpq_lazy_cell", False)
    assert _is_lazy_cell(transformed, "__cell")
    # the checkpointed module fixture keeps it too (the r10 attribute
    # did not survive the checkpoint)
    assert _is_lazy_cell(codes, "__cell")
    qv = [float(x) for x in emb.where("vec_id = 0").first()["embedding"]]
    out = ivfpq_topk(transformed, qv, cents, books_, k=5, n_probe=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # plan gate: no Filter operator may carry an inlined assignment
    # chain (the pathology is tens of KB on one line)
    for line in plan.splitlines():
        if line.lstrip().startswith(("Filter ", "+- Filter ",
                                     "*(1) Filter ")) or " Filter (" in line:
            assert len(line) < 1024, f"oversized Filter: {line[:200]}..."
    base = ivfpq_topk(codes, qv, cents, books_, k=5, n_probe=2)
    assert [tuple(r) for r in out.collect()] \
        == [tuple(r) for r in base.collect()]


def test_materialized_index_read_is_not_lazy(emb, tmp_path, ivfpq):
    """A written index read back reconstructs __cell from partition
    directories (no metadata), so ivfpq_topk must keep the isin
    PARTITION filter there — losing it would scan every cell's files."""
    from cascalog_spark.functions import ivfpq_write_index
    from cascalog_spark.functions.pq import _is_lazy_cell

    cents, books_, _ = ivfpq
    path = str(tmp_path / "ivfpq_meta_rt")
    ivfpq_write_index(emb, path, n_centroids=8, m=8, n_codes=8,
                      centroids=cents, codebooks=books_)
    idx = emb.sparkSession.read.parquet(path)
    assert not _is_lazy_cell(idx, "__cell")
