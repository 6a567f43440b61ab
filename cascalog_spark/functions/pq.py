"""Product quantization (PQ) for the embedding index tier.

The third leg of the ANN compression family next to SQ8
(``quantize_embeddings``) and IVF (``ivf_*``), in the faiss-PQ shape:
split each d-dim vector into ``m`` subvectors, learn a tiny per-subspace
codebook (``n_codes`` centroids of d/m dims), and store each vector as
``m`` small integer codes — a 32x storage cut at m=8/k=16 over float32,
which at 100 TB is the difference between an index that fits hot storage
and one that doesn't.  Search never decompresses the corpus: a query
builds one ``m x n_codes`` lookup table of partial dot products and each
row's approximate score is ``m`` table lookups (ADC — asymmetric distance
computation).

Scale shape: codebook training is a bounded-sample driver fit (same
contract as ``ivf_centroids_kmeans``); encode is one native Column
expression per row (zero shuffle, whole-stage codegen) with an
Arrow-batched BLAS kernel as the opt-in throughput path; ADC scoring is a
pure literal-lookup expression + global top-k (TakeOrderedAndProject —
no full sort, no UDF on the hot path).

Determinism contract (the oracle surface): ``kmeans_iters=0`` codebooks
are the subvectors of the ``n_codes`` smallest-id rows (same seed rule as
``ivf_centroids``), every distance/score is a LEFT-ASSOCIATIVE add chain
(bit-identical to the same chain written in ANSI SQL), and argmin ties
break to the smallest code.  The reference engine has no vector ops —
this module is part of the LLM-pipeline extension tier (SURVEY.md §2
extension packs).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DoubleType

from .similarity import _lit_arr, ivf_centroids

Codebooks = list  # list[m] of list[n_codes] of list[dsub] floats


def _pq_dims(codebooks: Codebooks) -> tuple[int, int, int]:
    m = len(codebooks)
    if m == 0 or not codebooks[0]:
        raise ValueError("pq: empty codebooks")
    n_codes, dsub = len(codebooks[0]), len(codebooks[0][0])
    for cb in codebooks:
        if len(cb) != n_codes or any(len(c) != dsub for c in cb):
            raise ValueError("pq: ragged codebooks (every subspace needs "
                             f"{n_codes} centroids of {dsub} dims)")
    return m, n_codes, dsub


def _pq_flat(codebooks: Codebooks) -> list[float]:
    """Flatten to one literal array indexed ``(s*n_codes + j)*dsub + d``."""
    return [float(x) for cb in codebooks for cent in cb for x in cent]


def pq_codebooks(df: DataFrame, id_col: str = "vec_id",
                 vec_col: str = "embedding", m: int = 8,
                 n_codes: int = 16, dim: int | None = None,
                 kmeans_iters: int = 0, sample_rows: int = 100_000,
                 seed: int = 42) -> Codebooks:
    """Train per-subspace PQ codebooks.

    ``kmeans_iters=0`` (the deterministic/oracle mode): the codebook of
    subspace ``s`` is the s-th subvector of each of the ``n_codes``
    smallest-id rows with a non-null vector — exactly
    ``ivf_centroids``'s seed rule, so a DuckDB oracle can rebuild the
    codebooks from the table.  ``kmeans_iters>0`` refines each subspace
    with Lloyd iterations on a BOUNDED sample (``sample_rows`` hard cap,
    same contract as ``ivf_centroids_kmeans``): fit cost is
    O(sample·n_codes·dim·iters) regardless of corpus size and the model
    is O(m·n_codes·d/m) = O(n_codes·dim) driver state.  Empty clusters
    keep their previous centroid (the standard Lloyd degeneracy rule),
    so the codebook shape is stable."""
    vec = F.col(vec_col).cast("array<double>")
    if dim is None:
        row = (df.where(F.col(vec_col).isNotNull())
               .select(F.size(vec).alias("d")).first())
        if row is None:
            raise ValueError("pq_codebooks: no non-null vectors")
        dim = int(row["d"])
    if dim % m != 0:
        raise ValueError(f"pq_codebooks: dim {dim} not divisible by m={m}")
    dsub = dim // m
    seeds = ivf_centroids(df, id_col=id_col, vec_col=vec_col,
                          n_centroids=n_codes)
    if len(seeds) < n_codes:
        raise ValueError(f"pq_codebooks: only {len(seeds)} non-null rows "
                         f"for {n_codes} codes")
    books = [[list(sv[s * dsub:(s + 1) * dsub]) for _, sv in seeds]
             for s in range(m)]
    if kmeans_iters <= 0:
        return books

    import numpy as np

    n = df.where(F.col(vec_col).isNotNull()).count()
    frac = min(1.0, (sample_rows * 1.25) / max(n, 1))
    sample = df.where(F.col(vec_col).isNotNull()).select(vec.alias("__v"))
    if frac < 1.0:
        sample = sample.sample(fraction=frac, seed=seed)
    rows = sample.limit(sample_rows).collect()
    X = np.asarray([r["__v"] for r in rows], dtype=np.float64)
    for s in range(m):
        Xs = X[:, s * dsub:(s + 1) * dsub]
        C = np.asarray(books[s], dtype=np.float64)
        for _ in range(kmeans_iters):
            d2 = ((Xs[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for j in range(n_codes):
                members = Xs[assign == j]
                if len(members):
                    C[j] = members.mean(axis=0)
        books[s] = [[float(x) for x in c] for c in C]
    return books


def pq_encode_col(vec: Column, codebooks: Codebooks) -> Column:
    """Per-row PQ codes as a native Column expression (array<int>, one
    code per subspace): for each subspace the squared L2 distance to
    every centroid is a LEFT-FOLD (``F.aggregate``) over the ``dsub``
    squared diffs — bit-identical to the same left-associative add
    chain in SQL, because squared terms are never ``-0.0`` so the
    ``0.0`` fold seed is exact — and the code is the FIRST index
    attaining the minimum (ties -> smallest code).  Higher-order
    functions keep the expression tree CONSTANT-SIZE in (m, n_codes,
    dsub) — an unrolled spelling at 8x16x8 is ~2k add-chains and OOMs
    the driver's optimizer; the interpreted-lambda cost per row is the
    price of the oracle surface, and ``pq_encode(vectorized=True)`` is
    the corpus-scale throughput path.  Null vectors encode to NULL."""
    m, n_codes, dsub = _pq_dims(codebooks)
    flat = _lit_arr(_pq_flat(codebooks))

    def _dist(s: Column, j: Column) -> Column:
        base = (s * n_codes + j) * dsub
        # cast the EXTRACTED element, never the array: an interpreted
        # element_at(cast(arr), i) re-casts all dim floats per fold step
        # (jstack showed Cast.castArray dominating — ~dim x m x n_codes x
        # dsub casts per row once projections collapse), where the
        # scalar cast is O(1) and float->double is exact either way
        def _v(d):
            return F.element_at(vec, s * dsub + d).cast("double")

        return F.aggregate(
            F.sequence(F.lit(1), F.lit(dsub)), F.lit(0.0),
            lambda acc, d: acc + ((_v(d) - F.element_at(flat, base + d))
                                  * (_v(d)
                                     - F.element_at(flat, base + d))))

    def _code(s: Column) -> Column:
        dists = F.transform(F.sequence(F.lit(0), F.lit(n_codes - 1)),
                            lambda j: _dist(s, j))
        return (F.array_position(dists, F.array_min(dists)) - 1) \
            .cast("int")

    codes = F.transform(F.sequence(F.lit(0), F.lit(m - 1)), _code)
    return F.when(vec.isNotNull(), codes)


def _pq_encode_vectorized(df: DataFrame, codebooks: Codebooks,
                          vec_col: str, out_col: str) -> DataFrame:
    """Arrow-batched BLAS spelling of ``pq_encode`` — the THROUGHPUT
    path for corpus-scale encode passes: per Arrow batch, one
    ``(rows x dsub) @ (dsub x n_codes)`` expansion per subspace instead
    of per-row interpreted expression trees.  Same argmin/tie rule as
    the expression path under exact float equality (numpy argmin keeps
    the first minimum); accumulation order differs from the sequential
    chain, so distances within one double ulp can code differently —
    the expression path stays the default and the oracle surface;
    equivalence on real data is pinned in tests."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    m, n_codes, dsub = _pq_dims(codebooks)
    books = [np.asarray(cb, dtype=np.float64) for cb in codebooks]

    def _enc(s):
        vals = s.to_numpy()
        mask = np.array([v is not None for v in vals])
        out = np.empty(len(vals), dtype=object)
        out[:] = None
        if mask.any():
            M = np.stack([np.asarray(v, dtype=np.float64)
                          for v in vals[mask]])
            codes = np.empty((M.shape[0], m), dtype=np.int32)
            for sub in range(m):
                Xs = M[:, sub * dsub:(sub + 1) * dsub]
                C = books[sub]
                # ||x-c||^2 = ||x||^2 - 2 x.c + ||c||^2; the ||x||^2 term
                # is constant per row so the argmin drops it
                d2 = (C * C).sum(axis=1)[None, :] - 2.0 * (Xs @ C.T)
                codes[:, sub] = d2.argmin(axis=1)  # first min: ties -> j asc
            lists = np.empty(codes.shape[0], dtype=object)
            lists[:] = [c.tolist() for c in codes]
            out[mask] = lists
        return pd.Series(out)

    _enc.__annotations__ = {"s": pd.Series, "return": pd.Series}
    kernel = pandas_udf(_enc, T.ArrayType(T.IntegerType()))
    return df.withColumn(out_col,
                         kernel(F.col(vec_col).cast("array<double>")))


def pq_encode(df: DataFrame, codebooks: Codebooks,
              vec_col: str = "embedding", out_col: str = "pq_codes",
              vectorized: bool = False) -> DataFrame:
    """Append PQ codes (array<int>, ``m`` entries of ``0..n_codes-1``) —
    the 32x-compressed index representation.  ``vectorized=True`` swaps
    in the Arrow/BLAS kernel (see ``_pq_encode_vectorized``); the
    expression default is the deterministic oracle surface."""
    if vectorized:
        return _pq_encode_vectorized(df, codebooks, vec_col, out_col)
    # raw column, NOT .cast("array<double>"): the encode expression casts
    # per extracted element — a whole-array cast here would be re-run by
    # every interpreted element_at once projections collapse
    return df.withColumn(out_col,
                         pq_encode_col(F.col(vec_col), codebooks))


def pq_decode_col(codes: Column, codebooks: Codebooks) -> Column:
    """Reconstruct the approximate vector from PQ codes (concatenation
    of each subspace's looked-up centroid) — for exact-rescoring a
    candidate set that was ranked on quantized codes, same role as
    ``dequantize_col`` in the SQ8 path."""
    m, n_codes, dsub = _pq_dims(codebooks)
    flat = _lit_arr(_pq_flat(codebooks))
    parts = []
    for s in range(m):
        base = (F.lit(s * n_codes) + codes[s]) * dsub
        parts.append(F.array(*[F.element_at(flat, base + d + 1)
                               for d in range(dsub)]))
    return F.when(codes.isNotNull(), F.concat(*parts))


def _adc_lut(query_vec: list[float], codebooks: Codebooks,
             metric: str) -> list[float]:
    """Driver-side ``m x n_codes`` lookup table, flattened
    ``s*n_codes + j``.  Partial sums are LEFT-ASSOCIATIVE Python-float
    chains — bit-identical to the same chain in SQL, so an oracle can
    rebuild the table from the seed rows."""
    m, n_codes, dsub = _pq_dims(codebooks)
    if len(query_vec) != m * dsub:
        raise ValueError(f"pq: query dim {len(query_vec)} != {m * dsub}")
    lut = []
    for s in range(m):
        q = [float(x) for x in query_vec[s * dsub:(s + 1) * dsub]]
        for cent in codebooks[s]:
            if metric in ("ip", "cosine"):
                terms = [q[d] * float(cent[d]) for d in range(dsub)]
            else:  # l2: negated squared distance (higher = closer)
                terms = [-(q[d] - float(cent[d]))
                         * (q[d] - float(cent[d])) for d in range(dsub)]
            lut.append(reduce(lambda a, b: a + b, terms))
    return lut


def _norm2_lut(codebooks: Codebooks) -> list[float]:
    """``||c_{s,j}||²`` per codebook entry, flattened ``s*n_codes + j``:
    a PQ reconstruction is the concat of its subspace centroids, so its
    squared norm is the SUM of these m lookups — no decompression needed
    to normalize an ADC score into a cosine."""
    _, _, dsub = _pq_dims(codebooks)
    return [reduce(lambda a, b: a + b,
                   [float(c[d]) * float(c[d]) for d in range(dsub)])
            for cb in codebooks for c in cb]


def pq_adc_topk(df: DataFrame, query_vec: list[float],
                codebooks: Codebooks, k: int = 10,
                id_col: str = "vec_id", vec_col: str = "embedding",
                codes_col: str | None = None,
                metric: str = "ip") -> DataFrame:
    """Approximate top-k by ADC: the query precomputes one
    ``m x n_codes`` partial-score table (driver-side, O(n_codes·dim));
    each corpus row's score is ``m`` literal-array lookups summed in a
    left-associative chain — no decompression, no UDF, no shuffle
    before the global top-k (TakeOrderedAndProject).  ``metric='ip'``
    scores inner product; ``'l2'`` negated squared distance;
    ``'cosine'`` divides the ADC inner product by the RECONSTRUCTION
    norm (a second m-lookup table of per-centroid ``||c||²``, see
    ``_norm2_lut``) and the query norm, so the ranking is comparable to
    the exact-cosine ops without decompressing anything.  Rows are
    ranked on the ROUNDED score (6 dp) with ids breaking ties, so the
    result is stable cross-engine.  ``codes_col`` reuses a
    pre-encoded index (the 100 TB path: encode once, search many)."""
    import math

    if k <= 0:
        return (df.select(F.col(id_col),
                          F.lit(0.0).alias("score")).limit(0))
    if metric not in ("ip", "l2", "cosine"):
        raise ValueError(f"pq_adc_topk: unknown metric {metric!r}")
    m, n_codes, _ = _pq_dims(codebooks)
    lut = _lit_arr(_adc_lut(query_vec, codebooks, metric))
    # rows with no codes are filtered BEFORE the lookup: pyspark 4's
    # F.element_at with a NULL column index silently returns the LAST
    # array element (SQL element_at / try_element_at return NULL), so a
    # null code reaching the lut would score garbage instead of dropping
    if codes_col is None:
        # bind codes as a NAMED column — the score below references
        # them m times, and an inlined encode expression would be
        # re-evaluated per term (measured 8x the encode cost)
        df = (df.where(F.col(vec_col).isNotNull())
              .withColumn("__pq_c",
                          pq_encode_col(F.col(vec_col), codebooks)))
        codes = F.col("__pq_c")
    else:
        df = df.where(F.col(codes_col).isNotNull())
        codes = F.col(codes_col)
    terms = [F.element_at(lut, F.lit(s * n_codes + 1) + codes[s])
             for s in range(m)]
    score = reduce(lambda a, b: a + b, terms)
    if metric == "cosine":
        n2 = _lit_arr(_norm2_lut(codebooks))
        nterms = [F.element_at(n2, F.lit(s * n_codes + 1) + codes[s])
                  for s in range(m)]
        qnorm = math.sqrt(sum(float(x) * float(x) for x in query_vec))
        # try_divide: an all-zero-centroid reconstruction has no cosine
        # (NULL, dropped below) — same zero-norm contract as the exact ops
        score = F.try_divide(
            score, F.sqrt(reduce(lambda a, b: a + b, nterms))
            * F.lit(qnorm))
    scored = df.select(F.col(id_col), F.round(score, 6).alias("score"))
    if not (codes_col is None and metric in ("ip", "l2")):
        # the null-score guard only matters when a score CAN be null:
        # a zero-norm reconstruction under 'cosine' (try_divide), or
        # caller-supplied codes with out-of-range entries.  For the
        # inline-encode ip/l2 path the codes are argmin indices in
        # [0, n_codes) by construction, every LUT lookup hits, and the
        # filter is a provable no-op — but Spark pushes it below the
        # projection (and below the parallelizing Exchange), inlining
        # the ENTIRE encode+LUT expression a second time into a Filter
        # evaluated on the narrow scan side (plan-verified: the before
        # plan's Filter carried the full literal-codebook chain).
        # Skipping the no-op filter halves the expression tree and
        # keeps the heavy projection above the Exchange (guide §4.4's
        # duplicated-evaluation disease, native-expression edition).
        scored = scored.where(F.col("score").isNotNull())
    return (scored
            .orderBy(F.col("score").desc(), F.col(id_col).asc())
            .limit(k))


def pq_knn_join(index: DataFrame, queries: DataFrame,
                codebooks: Codebooks, k: int = 10,
                id_col: str = "vec_id", vec_col: str = "embedding",
                query_id_col: str = "query_id",
                query_vec_col: str = "embedding",
                codes_col: str | None = None,
                n_salt: int = 32) -> DataFrame:
    """Batch approximate k-NN over a PQ-encoded index — the compressed
    twin of ``knn_join``: for each query row, the ``k`` index rows with
    the highest ADC-cosine → ``(query_id_col, id_col, sim)``.

    The query batch (an inference/eval set — the same bounded contract
    ``knn_join`` makes) is collected driver-side into ONE flattened
    ``q x m x n_codes`` lookup-table literal, each table pre-divided by
    its query norm; a tiny ``(qid, table offset)`` frame is broadcast
    and every (row, query) score is ``m`` lookups + a reconstruction
    norm from the shared ``||c||²`` table — 8 adds/row/query instead of
    a dim-length dot product, and the corpus is NEVER decompressed or
    shuffled before the salted two-stage per-query top-k (same exact
    reduction shape as ``knn_join``).  ``codes_col`` reuses a stored
    encode (the 100 TB path); otherwise rows are encoded on the fly.
    Zero-norm queries and zero-norm reconstructions have no cosine and
    drop, per the family-wide zero-norm contract."""
    import math

    m, n_codes, _ = _pq_dims(codebooks)
    if k <= 0:
        return (index.select(
            F.col(id_col).alias(query_id_col), F.col(id_col),
            F.lit(0.0).alias("sim")).limit(0))
    qrows = (queries.where(F.col(query_vec_col).isNotNull())
             .select(query_id_col, query_vec_col).collect())
    luts: list[float] = []
    qnorms: list[float] = []
    qids = []
    for r in qrows:
        qv = [float(x) for x in r[1]]
        qn = math.sqrt(sum(x * x for x in qv))
        if qn == 0:
            continue  # zero-norm query: no cosine
        luts.extend(_adc_lut(qv, codebooks, "ip"))
        qnorms.append(qn)
        qids.append(r[0])
    if not qids:
        return (index.select(
            F.col(id_col).alias(query_id_col), F.col(id_col),
            F.lit(0.0).alias("sim")).limit(0))
    spark = index.sparkSession
    qframe = spark.createDataFrame(
        [(qid, i) for i, qid in enumerate(qids)],
        schema=queries.select(query_id_col).schema.add("__qi", "long"))
    lut_lit = _lit_arr(luts)
    n2 = _lit_arr(_norm2_lut(codebooks))
    if codes_col is None:
        idx = (index.where(F.col(vec_col).isNotNull())
               .withColumn("__pq_c",
                           pq_encode_col(F.col(vec_col), codebooks)))
        codes = F.col("__pq_c")
    else:
        idx = index.where(F.col(codes_col).isNotNull())
        codes = F.col(codes_col)
    block = m * n_codes
    ip = reduce(lambda a, b: a + b,
                [F.element_at(lut_lit, (F.col("__qi") * block
                                        + F.lit(s * n_codes + 1)
                                        + codes[s]).cast("int"))
                 for s in range(m)])
    rn = F.sqrt(reduce(lambda a, b: a + b,
                       [F.element_at(n2,
                                     F.lit(s * n_codes + 1) + codes[s])
                        for s in range(m)]))
    # ip/(rn*qn) in exactly pq_adc_topk(metric='cosine')'s op order, so
    # the batch path and the single-query path agree bit-for-bit
    qn = F.element_at(_lit_arr(qnorms), (F.col("__qi") + 1).cast("int"))
    scored = (idx.join(F.broadcast(qframe))
              .select(query_id_col, F.col(id_col),
                      F.round(F.try_divide(ip, rn * qn), 6).alias("sim"))
              .where(F.col("sim").isNotNull()))
    salt = F.pmod(F.hash(F.col(id_col)), F.lit(n_salt))
    w1 = (Window.partitionBy(query_id_col, salt)
          .orderBy(F.col("sim").desc(), F.col(id_col).asc()))
    w2 = (Window.partitionBy(query_id_col)
          .orderBy(F.col("sim").desc(), F.col(id_col).asc()))
    return (scored
            .withColumn("__rn1", F.row_number().over(w1))
            .where(F.col("__rn1") <= k)
            .withColumn("__rn2", F.row_number().over(w2))
            .where(F.col("__rn2") <= k)
            .drop("__rn1", "__rn2"))


def pq_reconstruction_report(df: DataFrame, codebooks: Codebooks,
                             vec_col: str = "embedding") -> DataFrame:
    """Quantization-quality tuning report (the PQ twin of
    ``ann_recall_report``'s knob loop): ONE aggregate pass over the
    encoded corpus -> 1 row of ``(n_rows, mse, rms, code_entropy_bits)``.
    ``mse`` is the mean per-dimension squared reconstruction error —
    compare codebook settings (m, n_codes, kmeans_iters) before
    committing a 100 TB encode; ``code_entropy_bits`` is the mean
    per-subspace Shannon entropy of code usage (log2(n_codes) = every
    code pulls its weight; near 0 = collapsed codebook, retrain)."""
    import math

    m, n_codes, dsub = _pq_dims(codebooks)
    vec = F.col(vec_col).cast("array<double>")
    # bind codes as a named column so the decode below references the
    # encoded ARRAY, not 64 inlined copies of the encode expression
    coded = (df.where(F.col(vec_col).isNotNull())
             .select(vec.alias("__v"),
                     pq_encode_col(F.col(vec_col),
                                   codebooks).alias("__c")))
    recon = pq_decode_col(F.col("__c"), codebooks)
    err = F.aggregate(F.zip_with(F.col("__v"), recon, lambda a, b:
                                 (a - b) * (a - b)),
                      F.lit(0.0), lambda acc, x: acc + x)
    enc = coded.select(err.alias("__e"), F.col("__c"))
    # per-subspace code usage -> entropy: explode the m codes with their
    # subspace tag (m·n rows, but reduced map-side to m·n_codes counts)
    usage = (enc.select(F.posexplode("__c").alias("s", "j"))
             .groupBy("s", "j").agg(F.count(F.lit(1)).alias("ct")))
    p = F.col("ct") / F.sum("ct").over(Window.partitionBy("s"))
    ent = (usage.withColumn("__p", p)
           .groupBy("s")
           .agg((-F.sum(F.col("__p") * F.log2("__p"))).alias("h")))
    totals = enc.agg(F.count(F.lit(1)).alias("n_rows"),
                     F.avg(F.col("__e") / F.lit(float(m * dsub)))
                     .alias("__mse"))
    mean_ent = ent.agg(F.avg("h").alias("__ent"))
    return (totals.crossJoin(F.broadcast(mean_ent))
            .select("n_rows", F.round("__mse", 8).alias("mse"),
                    F.round(F.sqrt("__mse"), 8).alias("rms"),
                    F.round("__ent", 4).alias("code_entropy_bits"),
                    F.lit(round(math.log2(n_codes), 4))
                    .alias("max_entropy_bits")))


# ---------------------------------------------------------------------------
# IVF-PQ composite index — the standard billion-scale ANN layout (coarse
# quantizer prunes the scan to probed cells; a residual product quantizer
# compresses what remains ~32x; ADC scans the probed cells' codes only).



def ivfpq_index(df: DataFrame, id_col: str = "vec_id",
                vec_col: str = "embedding", n_centroids: int = 16,
                m: int = 8, n_codes: int = 16,
                centroids: list[tuple[int, list[float]]] | str | None
                = None, kmeans_iters: int = 0,
                codebooks: Codebooks | None = None
                ) -> tuple[list, list, DataFrame]:
    """Build the IVF-PQ index: returns ``(centroids, codebooks,
    codes_df)`` where ``codes_df`` is ``(id, __cell, codes)`` — the
    compressed index (one small int array per row, ~32x smaller than
    the vectors).

    Layout: each row is assigned its nearest coarse centroid (cosine,
    ``ivf_assign_col``), the RESIDUAL ``v − centroid`` is product-
    quantized (per-subspace codebooks trained on residuals — residuals
    concentrate near zero, so the same code budget buys much finer
    resolution than PQ on raw vectors), and codes are stored per cell
    so an ADC scan touches only probed cells.  ``kmeans_iters=0`` keeps
    the deterministic smallest-id seed rule end-to-end (centroids AND
    residual codebooks), making the whole index oracle-reconstructable;
    ``centroids='kmeans'``/``kmeans_iters>0`` are the balanced-cell
    scale path.

    100 TB shape: one pass assigns+encodes (no shuffle — the partitioned
    WRITE in ``ivfpq_write_index`` is the only movement); driver state
    is O(n_centroids·dim + m·n_codes·dim/m) — centroid table plus
    codebooks — independent of corpus size."""
    from .similarity import _lit_arr_sql, _resolve_centroids, \
        assign_cell_nonnull

    cents = _resolve_centroids(centroids, df, id_col, vec_col,
                               n_centroids)
    ordered = sorted(cents, key=lambda cv: cv[0])
    dim = len(ordered[0][1])
    rank_sql = ("CASE __cell " + " ".join(
        f"WHEN {int(cid)} THEN {r}"
        for r, (cid, _) in enumerate(ordered)) + " END")
    # the row's centroid is selected ONCE (element_at on a top-level
    # nested literal — constant-folded), then the residual is a plain
    # zip_with.  Embedding the flat centroid literal inside a transform
    # lambda instead re-builds the k·dim array PER ELEMENT PER ROW
    # (ConstantFolding does not descend into lambda bodies — the same
    # interpreted-HOF trap pq_encode_col documents; measured 48s -> 0.5s
    # on the sf0.01 seed collect)
    cent_arrs = "array(" + ",".join(
        _lit_arr_sql([float(x) for x in cv]) for _, cv in ordered) + ")"
    # non-nullable cell (similarity.assign_cell_nonnull): __cell is the
    # equi-join key of every consumer (ivfpq_topk's probe frame,
    # ivfpq_knn_join's qside/n2f joins); a nullable derived key makes
    # the optimizer push an isnotnull copy of this whole centroid chain
    # below the scan-side Exchange (single-task at bench scale, double
    # work at any scale)
    assigned = (df.where(F.col(vec_col).isNotNull())
                .select(F.col(id_col),
                        F.col(vec_col).cast("array<double>").alias("__v"))
                .withColumn("__cell", assign_cell_nonnull("__v", cents))
                .withColumn("__cent", F.expr(
                    f"element_at({cent_arrs}, ({rank_sql}) + 1)"))
                .withColumn("__r", F.zip_with(F.col("__v"),
                                              F.col("__cent"),
                                              lambda x, y: x - y))
                .drop("__cent"))
    # codebooks train on NON-ZERO residuals only: the deterministic seed
    # rule takes the smallest-id rows, and the smallest ids ARE the
    # centroid seeds (plus their exact duplicates), whose residuals are
    # identically zero — seeding from them collapses every codebook to
    # near-zero codes and the index loses all resolution (measured:
    # recall 0.25 -> 0.55 at full probe on the test embeddings).  The
    # filter is the left-fold residual norm², oracle-replicable.
    if codebooks is not None:
        # pre-trained model (the train-once / encode-search-many path:
        # a prior ivfpq_index/ivfpq_write_index call, persisted beside
        # the index) — skip the fit entirely
        books = codebooks
    else:
        nonzero = F.aggregate(F.zip_with(F.col("__r"), F.col("__r"),
                                         lambda a, b: a * b),
                              F.lit(0.0), lambda acc, x: acc + x) > 0
        books = pq_codebooks(assigned.where(nonzero), id_col=id_col,
                             vec_col="__r", m=m, n_codes=n_codes,
                             dim=dim, kmeans_iters=kmeans_iters)
    # marker for ivfpq_topk: on this LAZY frame the cell column is a
    # derived expression, so an isin(probe) filter would be pushed (and
    # the whole assignment inlined) below the scan Exchange — the probe
    # broadcast join alone prunes identically there.  Carried as COLUMN
    # METADATA (r11): a plain Python attribute is silently lost on any
    # intervening transformation (select/where/localCheckpoint), which
    # reverted consumers to the 52 KB pushed-filter pathology with no
    # test tripping.  Metadata rides the __cell column through
    # pass-through transformations; the materialized-index read path
    # (ivfpq_query_index) never sees it because __cell is reconstructed
    # there from partition directories, so partition-pruning isin stays.
    codes = assigned.select(
        F.col(id_col),
        F.col("__cell").alias("__cell",
                              metadata={"ivfpq_lazy_cell": True}),
        pq_encode_col(F.col("__r"), books).alias("codes"))
    codes._ivfpq_lazy_cell = True  # legacy attribute, kept for callers
    return cents, books, codes


def ivfpq_write_index(df: DataFrame, path: str, id_col: str = "vec_id",
                      vec_col: str = "embedding", n_centroids: int = 16,
                      m: int = 8, n_codes: int = 16,
                      mode: str = "overwrite",
                      centroids=None, kmeans_iters: int = 0,
                      codebooks: Codebooks | None = None
                      ) -> tuple[list, list]:
    """Materialize the IVF-PQ index: ``(id, codes)`` parquet partitioned
    by ``__cell`` — a probe reads n_probe/n_centroids of the FILES and
    each file holds codes, not vectors (~32x less IO than the raw IVF
    layout).  Returns ``(centroids, codebooks)`` — persist both beside
    the index; together they are the O(k·dim + n_codes·dim) model."""
    cents, books, codes = ivfpq_index(df, id_col, vec_col, n_centroids,
                                      m, n_codes, centroids, kmeans_iters,
                                      codebooks=codebooks)
    codes.write.partitionBy("__cell").mode(mode).parquet(path)
    return cents, books


def ivfpq_append_index(df: DataFrame, path: str,
                       centroids: list[tuple[int, list[float]]],
                       codebooks: Codebooks, id_col: str = "vec_id",
                       vec_col: str = "embedding") -> None:
    """Continuous-ingest IVF-PQ: assign + residual-encode a NEW batch
    against the EXISTING model (centroids + codebooks — the pair
    ``ivfpq_write_index`` returned) and append partition-wise into the
    index layout.  Existing cells' files are never read or rewritten;
    ingest cost is one map over the batch + a partitioned append,
    independent of corpus size.  The model MUST be the one the index
    was built with (re-fitting would silently strand old rows in stale
    cells / stale code space) — same contract as ``ivf_append_index``."""
    cents = sorted((int(c), [float(x) for x in v]) for c, v in centroids)
    _, _, codes = ivfpq_index(df, id_col=id_col, vec_col=vec_col,
                              n_centroids=len(cents), centroids=cents,
                              codebooks=codebooks,
                              m=len(codebooks), n_codes=len(codebooks[0]))
    codes.write.partitionBy("__cell").mode("append").parquet(path)


def _is_lazy_cell(index: DataFrame, cell_col: str) -> bool:
    """True when ``cell_col`` is a derived (lazy ``ivfpq_index``)
    assignment rather than a materialized partition column: the marker
    rides as column metadata (survives select/where/localCheckpoint),
    with the legacy frame attribute accepted too."""
    if getattr(index, "_ivfpq_lazy_cell", False):
        return True
    try:
        field = index.schema[cell_col]
    except KeyError:
        return False
    return bool((field.metadata or {}).get("ivfpq_lazy_cell", False))


def ivfpq_topk(index: DataFrame, query_vec: list[float],
               centroids: list[tuple[int, list[float]]],
               codebooks: Codebooks, k: int = 10,
               id_col: str = "vec_id", codes_col: str = "codes",
               cell_col: str = "__cell", n_probe: int = 4,
               rerank: int = 0, vectors: DataFrame | None = None,
               vec_col: str = "embedding") -> DataFrame:
    """ADC top-k over an IVF-PQ index frame (``ivfpq_index`` output or
    an ``ivfpq_write_index`` read): probe the ``n_probe`` cells nearest
    the query, score only their rows by reconstruction cosine —
    ``cos(q, centroid_cell + residual_codes)`` — using lookups only:

    - ``ip(q, centroid)``: one scalar per probed cell (driver-side),
    - ``ip(q, residual_code)``: one GLOBAL m x n_codes table (residual
      codebooks are cell-independent),
    - ``||centroid_sub + residual_code||²``: one (probed-cell, s, code)
      table — O(n_probe·n_codes·dim) driver floats.

    Per row: 2m lookups + adds, no decompression, no shuffle before the
    global top-k (TakeOrderedAndProject).  All partial sums are
    left-associative chains, so a DuckDB oracle reproduces scores
    bit-for-bit.  Zero-norm reconstructions (and a zero query) have no
    cosine and drop, per the family-wide contract.

    ``rerank=r`` (with ``vectors`` = a raw-vector frame keyed by
    ``id_col``) is the standard two-stage retrieval: take the ADC
    top-``k·r`` shortlist, rescore EXACT cosine against the raw
    vectors (the join touches only k·r rows — ``r/k``-th of nothing at
    corpus scale), return the exact top-k.  Recall approaches exact
    search at ADC scan cost; the returned ``score`` is the exact
    cosine (deterministic, oracle-checkable)."""
    if rerank and rerank > 0:
        if vectors is None:
            raise ValueError("ivfpq_topk: rerank needs a raw-vector "
                             "frame via vectors=")
        short = ivfpq_topk(index, query_vec, centroids, codebooks,
                           k=k * int(rerank), id_col=id_col,
                           codes_col=codes_col, cell_col=cell_col,
                           n_probe=n_probe)
        return _exact_rescore_topk(short, vectors, query_vec, k,
                                   id_col, vec_col)
    import math

    from .similarity import _lit_arr, _probe_cells

    m, n_codes, dsub = _pq_dims(codebooks)
    if k <= 0:
        return (index.select(F.col(id_col),
                             F.lit(0.0).alias("score")).limit(0))
    q = [float(x) for x in query_vec]
    if len(q) != m * dsub:
        raise ValueError(f"ivfpq_topk: query dim {len(q)} != {m * dsub}")
    qnorm = math.sqrt(reduce(lambda a, b: a + b, [x * x for x in q]))
    probe = _probe_cells(centroids, q, n_probe)
    cmap = dict(centroids)
    # per-probed-cell driver scalars/tables, flattened by probe rank
    qc_ip, n2 = [], []
    for cell in probe:
        cv = [float(x) for x in cmap[cell]]
        qc_ip.append(reduce(lambda a, b: a + b,
                            [q[d] * cv[d] for d in range(len(q))]))
        for s in range(m):
            for code in codebooks[s]:
                rec = [cv[s * dsub + d] + float(code[d])
                       for d in range(dsub)]
                n2.append(reduce(lambda a, b: a + b,
                                 [x * x for x in rec]))
    ip_lut = _lit_arr(_adc_lut(q, codebooks, "ip"))
    n2_lut = _lit_arr(n2)
    spark = index.sparkSession
    pframe = spark.createDataFrame(
        [(cell, rank, qc_ip[rank]) for rank, cell in enumerate(probe)],
        schema=index.select(cell_col).schema
        .add("__prank", "long").add("__qcip", "double"))
    codes = F.col(codes_col)
    block = m * n_codes
    ip_terms = [F.element_at(ip_lut, F.lit(s * n_codes + 1) + codes[s])
                for s in range(m)]
    num = reduce(lambda a, b: a + b, [F.col("__qcip")] + ip_terms)
    n2_terms = [F.element_at(n2_lut, (F.col("__prank") * block
                                      + F.lit(s * n_codes + 1)
                                      + codes[s]).cast("int"))
                for s in range(m)]
    den = F.sqrt(reduce(lambda a, b: a + b, n2_terms)) * F.lit(qnorm)
    # NULL codes / zero-norm reconstructions score NULL and are dropped
    # AFTER the top-k (desc puts NULLS LAST, so they never displace a
    # real score): filtering before it would push the predicate below
    # the select, inlining a full copy of the scoring (and, for a lazy
    # ivfpq_index input, the whole interpreted encode) per row
    #
    # cell pruning: on a MATERIALIZED index (ivfpq_query_index read) the
    # isin is the PARTITION filter that skips unprobed cells' files; on
    # the LAZY ivfpq_index frame (marker below) the same isin is pushed
    # below the scan Exchange with the full assignment chain inlined
    # (52 KB Filter in the before-plan, evaluated on the unparallelized
    # side) — there the inner probe join alone prunes identically (a
    # probed cell matches exactly one pframe row, anything else matches
    # none, exactly like isin)
    pruned = (index if _is_lazy_cell(index, cell_col)
              else index.where(F.col(cell_col).isin(probe)))
    return (pruned
            .join(F.broadcast(pframe), on=cell_col)
            .select(F.col(id_col),
                    F.round(F.try_divide(num, den), 6).alias("score"))
            .orderBy(F.col("score").desc(), F.col(id_col).asc())
            .limit(k)
            .where(F.col("score").isNotNull()))


def _exact_rescore_topk(short: DataFrame, vectors: DataFrame,
                        query_vec: list[float], k: int,
                        id_col: str, vec_col: str) -> DataFrame:
    """Stage 2 of two-stage retrieval: exact-cosine rescore of a
    driver-query shortlist.  The shortlist (k·r ids) broadcasts into
    the raw-vector frame, so the corpus is touched only at those ids;
    same cosine chain/round/tie-break as the exact family ops."""
    import math

    from .similarity import _lit_arr, dot_col, norm_col

    q = [float(x) for x in query_vec]
    qn = math.sqrt(reduce(lambda a, b: a + b, [x * x for x in q]))
    v = F.col(vec_col).cast("array<double>")
    vex = (vectors.where(F.col(vec_col).isNotNull())
           .select(F.col(id_col), v.alias("__v"),
                   norm_col(v).alias("__vn"))
           .where(F.col("__vn") > 0))
    sim = F.round(F.try_divide(dot_col(F.col("__v"), _lit_arr(q)),
                               F.col("__vn") * F.lit(qn)), 6)
    return (vex.join(F.broadcast(short.select(id_col)), on=id_col)
            .select(F.col(id_col), sim.alias("score"))
            .orderBy(F.col("score").desc(), F.col(id_col).asc())
            .limit(k)
            .where(F.col("score").isNotNull()))


def ivfpq_query_index(spark, path: str,
                      centroids: list[tuple[int, list[float]]],
                      codebooks: Codebooks, query_vec: list[float],
                      k: int = 10, id_col: str = "vec_id",
                      n_probe: int = 4, rerank: int = 0,
                      vectors: DataFrame | None = None,
                      vec_col: str = "embedding") -> DataFrame:
    """ADC top-k against an ``ivfpq_write_index`` layout: ``__cell IN
    probe`` is a PARTITION filter (only probed cells' code files are
    read — check PartitionFilters in the scan), and those files hold
    ~32x-compressed codes, so the IO per query is
    ``n_probe/n_centroids x 1/32`` of a full-corpus exact scan.
    ``rerank=``/``vectors=`` forward to :func:`ivfpq_topk`'s two-stage
    exact rescore (vectors = the raw-vector table stored beside the
    index)."""
    idx = spark.read.parquet(path)
    return ivfpq_topk(idx, query_vec, centroids, codebooks, k=k,
                      id_col=id_col, n_probe=n_probe, rerank=rerank,
                      vectors=vectors, vec_col=vec_col)


def _norm2_lut_ivfpq(centroids: list[tuple[int, list[float]]],
                     codebooks: Codebooks) -> list[float]:
    """``||centroid_sub + residual_code||²`` per (dense cell rank, s,
    code), flattened ``rank*m*n_codes + s*n_codes + j`` — the
    reconstruction-norm table an IVF-PQ cosine needs (O(k·n_codes·dim)
    driver floats).  Left-associative chains, oracle-replicable."""
    m, n_codes, dsub = _pq_dims(codebooks)
    out = []
    for _, cv in sorted(centroids, key=lambda c: c[0]):
        cv = [float(x) for x in cv]
        for s in range(m):
            for code in codebooks[s]:
                rec = [cv[s * dsub + d] + float(code[d])
                       for d in range(dsub)]
                out.append(reduce(lambda a, b: a + b,
                                  [x * x for x in rec]))
    return out


def _resid_ip_lut_expr(qvec_name: str, codebooks: Codebooks) -> Column:
    """``ip(q_sub, residual_code)`` lookup table as an EXPRESSION over a
    query-vector column (for batch paths where the query is a column,
    not a driver value): an array of m·n_codes left-fold dot products —
    evaluated once per QUERY row, then candidates read it with
    ``element_at``.  Flattened ``s*n_codes + j`` like ``_adc_lut``."""
    m, n_codes, dsub = _pq_dims(codebooks)
    terms = []
    for s in range(m):
        for code in codebooks[s]:
            chain = " + ".join(
                f"element_at({qvec_name}, {s * dsub + d + 1}) * "
                f"({repr(float(code[d]))}D)" for d in range(dsub))
            terms.append(f"({chain})")
    return F.expr("array(" + ",".join(terms) + ")")


def ivfpq_knn_join(index: DataFrame, queries: DataFrame,
                   centroids: list[tuple[int, list[float]]],
                   codebooks: Codebooks, k: int = 10, n_probe: int = 4,
                   id_col: str = "vec_id", codes_col: str = "codes",
                   cell_col: str = "__cell",
                   query_id_col: str = "query_id",
                   query_vec_col: str = "embedding",
                   n_salt: int = 32,
                   rerank: int = 0,
                   vectors: DataFrame | None = None,
                   vec_col: str = "embedding") -> DataFrame:
    """Corpus-scale batch retrieval over the IVF-PQ index: top-k ADC
    neighbors for EACH query row, both sides distributed — the
    compressed-index counterpart of ``similarity.ivf_knn_join`` (which
    rescores raw vectors) and the batch counterpart of ``ivfpq_topk``
    (which takes one driver-side query).  This is the layout/path pair
    a billion-vector corpus actually serves: codes are ~32x smaller
    than vectors, and a query touches ``n_probe/n_centroids`` of them.

    Per QUERY row (before any join): its ``n_probe`` nearest cells
    (cosine against unit centroids, id tie-break — same rule as
    ``_probe_cells``), the exact ``ip(q, centroid)`` scalar per probed
    cell, and the m·n_codes residual-ip lookup table
    (``_resid_ip_lut_expr`` — one array build per query, NOT per
    candidate).  Per CANDIDATE pair after the cell equi-join: 2m
    ``element_at`` lookups — numerator ``qcip + Σ lut[codes[s]]``,
    denominator from the global ``||centroid_sub + code||²`` literal
    (O(cells·m·n_codes) driver floats) — no decompression, no
    per-pair dot products.  Top-k by the same salted two-stage window
    as ``knn_join``; shuffle volume: index codes once (by cell),
    query rows n_probe times.

    Deterministic end-to-end (argmax/argmin/topk all tie-break on
    ids; score chains left-associative) → SQL-oracle-checkable.
    Zero-norm queries and NULL codes drop per the family contract.

    ``rerank=r`` (with ``vectors`` = the raw-vector frame keyed by
    ``id_col``) takes the ADC top-``k·r`` per query, joins ONLY those
    q·k·r pairs back to the raw vectors + query vectors, rescores
    exact cosine, and returns the exact top-k — recall≈exact at ADC
    scan cost (the missing rung between plain ADC and
    ``ivf_knn_join``'s full-probed-cell exact rescoring)."""
    from .similarity import _lit_arr, dot_col, norm_col
    from .util import explode_fast

    if rerank and rerank > 0:
        if vectors is None:
            raise ValueError("ivfpq_knn_join: rerank needs a raw-vector "
                             "frame via vectors=")
        short = ivfpq_knn_join(index, queries, centroids, codebooks,
                               k=k * int(rerank), n_probe=n_probe,
                               id_col=id_col, codes_col=codes_col,
                               cell_col=cell_col,
                               query_id_col=query_id_col,
                               query_vec_col=query_vec_col,
                               n_salt=n_salt)
        v = F.col(vec_col).cast("array<double>")
        vex = (vectors.where(F.col(vec_col).isNotNull())
               .select(F.col(id_col), v.alias("__v"),
                       norm_col(v).alias("__vn"))
               .where(F.col("__vn") > 0))
        qv2 = F.col(query_vec_col).cast("array<double>")
        qex = (queries.where(F.col(query_vec_col).isNotNull())
               .select(F.col(query_id_col), qv2.alias("__qv2"),
                       norm_col(qv2).alias("__qn2"))
               .where(F.col("__qn2") > 0))
        sim = F.round(F.try_divide(dot_col(F.col("__v"),
                                           F.col("__qv2")),
                                   F.col("__vn") * F.col("__qn2")), 6)
        wex = Window.partitionBy(query_id_col).orderBy(
            F.col("score").desc(), F.col(id_col).asc())
        return (short.select(query_id_col, id_col)
                .join(vex, on=id_col)
                .join(qex, on=query_id_col)
                .select(F.col(query_id_col), F.col(id_col),
                        sim.alias("score"))
                .withColumn("__rn", F.row_number().over(wex))
                .where((F.col("__rn") <= k)
                       & F.col("score").isNotNull())
                .drop("__rn"))

    m, n_codes, dsub = _pq_dims(codebooks)
    if k <= 0:
        # schema-faithful empty frame (same id/query-id types as the
        # normal path, not a hardcoded long)
        return (queries.limit(0).select(F.col(query_id_col))
                .crossJoin(index.limit(0).select(F.col(id_col)))
                .withColumn("score", F.lit(0.0)))
    ordered = sorted(
        (int(c), [float(x) for x in v]) for c, v in centroids)
    block = m * n_codes
    # reconstruction-norm table as a BROADCAST FRAME keyed by cell (one
    # 128-double slice per cell), not a 2048-literal expression: a
    # literal embedded in per-candidate terms is re-analyzed per
    # reference, and the frame rides the existing cell join for free
    n2flat = _norm2_lut_ivfpq(ordered, codebooks)
    spark = index.sparkSession
    n2f = spark.createDataFrame(
        [(cid, n2flat[r * block:(r + 1) * block])
         for r, (cid, _) in enumerate(ordered)],
        schema=index.select(cell_col).schema
        .add("__n2s", ArrayType(DoubleType())))

    def _unit(v):
        n = sum(x * x for x in v) ** 0.5 or 1.0
        return [x / n for x in v]

    # Query-side constants ride as BOUND COLUMNS (one-call literal
    # arrays materialized once per query row), and the probe entries /
    # residual-ip LUT are HOF loops over them — NOT unrolled expression
    # trees.  The unrolled form (16x2 dot folds + the 1024-term LUT
    # expr) costs ~7s of Catalyst analysis PER ACTION at any data size;
    # this form is a ~300-node tree (measured 8.5s -> well under 1s at
    # sf0.1).  Arithmetic is unchanged: same left-associative chains
    # over the same doubles, so scores stay bit-identical to
    # ``ivfpq_topk`` and the SQL oracle (pinned by the equivalence
    # test).  The interpreted-HOF trap does not apply — the lambdas
    # reference bound attributes, never rebuild literals per element.
    dim = m * dsub
    qv = F.col(query_vec_col).cast("array<double>")
    qs = (queries.where(F.col(query_vec_col).isNotNull())
          .select(F.col(query_id_col).alias("__qid"),
                  qv.alias("__qv"), norm_col(qv).alias("__qnrm"))
          .where(F.col("__qnrm") > 0)
          .withColumn("__cvf", _lit_arr([x for _, cv in ordered
                                         for x in cv]))
          .withColumn("__uf", _lit_arr([x for _, cv in ordered
                                        for x in _unit(cv)]))
          .withColumn("__cbf", _lit_arr(_pq_flat(codebooks)))
          .withColumn("__cids", F.lit([cid for cid, _ in ordered])))

    def _dot_slice(flat, r):
        return F.aggregate(
            F.zip_with(F.slice(flat, r * dim + 1, dim), F.col("__qv"),
                       lambda a, b: a * b),
            F.lit(0.0), lambda acc, x: acc + x)

    entries = F.transform(
        F.sequence(F.lit(0), F.lit(len(ordered) - 1)),
        lambda r: F.struct(
            (-_dot_slice(F.col("__uf"), r)).alias("negsim"),
            F.element_at(F.col("__cids"), r + 1).alias("cid"),
            _dot_slice(F.col("__cvf"), r).alias("qcip")))
    lut = F.transform(
        F.sequence(F.lit(0), F.lit(block - 1)),
        lambda i: reduce(
            lambda a, b: a + b,
            [F.element_at(F.col("__qv"),
                          F.floor(i / F.lit(n_codes)).cast("int")
                          * dsub + (d + 1))
             * F.element_at(F.col("__cbf"), i * dsub + (d + 1))
             for d in range(dsub)]))
    probes = F.slice(F.array_sort(entries), 1, n_probe)
    qside = explode_fast(
        qs.withColumn("__lut", lut)
          .select("__qid", "__qnrm", "__lut", probes.alias("__p")),
        F.col("__p"), "__pr").select(
            "__qid", "__qnrm", "__lut",
            F.col("__pr.cid").alias(cell_col),
            F.col("__pr.qcip").alias("__qcip"))

    # Score by iterating over the CODES ARRAY (zip_with + aggregate), so
    # the codes expression is evaluated ONCE per candidate row: when the
    # caller passes the LAZY ivfpq_index plan (encode not yet
    # materialized), per-subspace ``codes[s]`` references would re-run
    # the whole interpreted encode per term — measured 16x the row cost.
    # Fold seeds (qcip for the numerator, 0.0 for the norm chain) keep
    # the exact left-associative chains of ``ivfpq_topk``/the oracle.
    codes = F.col(codes_col)
    seq_m = F.sequence(F.lit(0), F.lit(m - 1))
    num = F.aggregate(
        F.zip_with(codes, seq_m,
                   lambda cv, s: F.element_at(F.col("__lut"),
                                              s * n_codes + cv + 1)),
        F.col("__qcip"), lambda a, x: a + x)
    den = F.sqrt(F.aggregate(
        F.zip_with(codes, seq_m,
                   lambda cv, s: F.element_at(F.col("__n2s"),
                                              s * n_codes + cv + 1)),
        F.lit(0.0), lambda a, x: a + x)) * F.col("__qnrm")
    # NO explicit codes-null filter: predicate pushdown would inline a
    # FULL COPY of the (interpreted) encode expression into the scan
    # filter when the caller passes the lazy ivfpq_index plan — a
    # second whole encode per row (measured: the pushed filter carried
    # 272 aggregate() nodes).  NULL codes propagate to a NULL score
    # through zip_with/aggregate and drop at the score filter below,
    # which only duplicates the cheap ADC lookups when pushed.
    scored = (index
              .join(qside, on=cell_col)
              .join(F.broadcast(n2f), on=cell_col)
              .select(F.col("__qid"), F.col(id_col),
                      F.round(F.try_divide(num, den), 6).alias("score")))
    # the null-score drop (undefined cosine: NULL codes / zero-norm
    # reconstruction) happens AFTER the top-k windows: a filter directly
    # on the select would be pushed below it, inlining the whole scoring
    # expression a second time per row; desc ordering puts NULLs last,
    # so they never displace a real score and the final filter removes
    # any that trail in under-filled groups — same result set
    salt = F.pmod(F.hash(F.col(id_col)), F.lit(n_salt))
    w1 = (Window.partitionBy("__qid", salt)
          .orderBy(F.col("score").desc(), F.col(id_col).asc()))
    w2 = (Window.partitionBy("__qid")
          .orderBy(F.col("score").desc(), F.col(id_col).asc()))
    return (scored
            .withColumn("__rn1", F.row_number().over(w1))
            .where(F.col("__rn1") <= k)
            .withColumn("__rn2", F.row_number().over(w2))
            .where(F.col("__rn2") <= k)
            .where(F.col("score").isNotNull())
            .select(F.col("__qid").alias(query_id_col), F.col(id_col),
                    "score"))
