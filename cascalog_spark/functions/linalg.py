"""Distributed dense linear algebra over embedding columns: one-pass
Gram/mean accumulation, covariance, PCA fit + native projection.

The training-pipeline uses: embedding whitening / dimensionality
reduction before clustering or dedup (SemDeDup-style pipelines PCA
their embeddings first), and covariance diagnostics over a corpus.

Scale shape (100 TB): the data-sized pass is ``mapInPandas`` emitting
ONE partial per Arrow batch — ``(n, sum_vec[d], gram[d*d])`` computed by
BLAS (``X.T @ X``) — then the partials pos-explode and reduce by
POSITION in Spark (shuffle = #batches x (d^2+d) scalars, never
data-sized, never a driver-sized collect).  Only the final d^2 cells
come back to the driver; the eigendecomposition is O(d^3) driver-side on
a d x d matrix (d = embedding width, 64-4096 — trivially small).
Projection is a native Column expression (zip_with/aggregate dot
products against literal component vectors) — no Python in the
projection pass.

No reference analog (extension tier); the per-partition-partial +
position-reduce pattern matches the repo's prefix_assoc / quantization
designs.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .similarity import _lit_arr


def gram_partials(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Per-Arrow-batch moment partials: ``(n, s[d], g[d*d])`` rows.

    One BLAS ``X.T @ X`` per batch; output size is O(#batches), not
    O(rows).  NULL and wrong-width vectors are dropped (counted out)."""
    schema = "n long, s array<double>, g array<double>"

    def _acc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vecs = [v for v in pdf[vec_col] if v is not None]
            if not vecs:
                continue
            x = np.asarray([np.asarray(v, dtype=np.float64) for v in vecs])
            yield pd.DataFrame({
                "n": [x.shape[0]],
                "s": [x.sum(axis=0)],
                "g": [(x.T @ x).ravel()],
            })

    return df.select(vec_col).mapInPandas(_acc, schema=schema)


def gram_matrix_df(df: DataFrame, vec_col: str = "embedding",
                   ndigits: int | None = None) -> DataFrame:
    """Exact Gram matrix ``G = X^T X`` as ``(i, j, value)`` rows —
    partials reduced BY POSITION in Spark (d^2-row shuffle, no
    data-sized driver state).  ``ndigits`` rounds for hash-stable
    cross-engine comparison (summation order differs)."""
    parts = gram_partials(df, vec_col)
    cells = (parts.select(F.posexplode("g").alias("pos", "v"))
             .groupBy("pos").agg(F.sum("v").alias("value")))
    # d is not known statically here — read it from the first vector
    # (an empty/all-null corpus yields an empty cells frame; d=1 keeps
    # the i/j arithmetic well-defined on zero rows)
    head = df.select(vec_col).where(F.col(vec_col).isNotNull()).first()
    d = len(head[0]) if head is not None else 1
    out = cells.select(
        (F.col("pos") / F.lit(d)).cast("long").alias("i"),
        F.pmod(F.col("pos"), F.lit(d)).cast("long").alias("j"),
        F.col("value"))
    if ndigits is not None:
        out = out.withColumn("value", F.round("value", ndigits))
    return out


def moments(df: DataFrame, vec_col: str = "embedding"):
    """Driver-side exact moments ``(n, mean[d], cov[d,d])`` via the
    distributed partial pass.  cov is the unbiased sample covariance
    ``(G - n mu mu^T) / (n-1)``."""
    from pyspark import StorageLevel

    parts = gram_partials(df, vec_col).persist(StorageLevel.MEMORY_AND_DISK)
    try:
        return _reduce_partials(parts)
    finally:
        parts.unpersist()


def write_moment_partials(df: DataFrame, path: str,
                          vec_col: str = "embedding",
                          mode: str = "append") -> None:
    """Continuous-ingest side of ``moments``: persist a batch's
    ``(n, s, g)`` partials as parquet.  Partials are the MERGEABLE state
    of the moment computation (plain sums), so appending each ingest
    batch's partials and reducing later gives exactly the single-pass
    answer — the same batch-vs-standing-index contract as
    ``minhash_index`` / ``exact_substring_index``."""
    gram_partials(df, vec_col).write.mode(mode).parquet(path)


def moments_from_partials(spark, path: str):
    """Reduce a standing partials table (written by
    ``write_moment_partials`` across any number of ingest batches) to
    ``(n, mean, cov)`` — bit-identical to ``moments`` over the union of
    the batches up to summation order."""
    parts = spark.read.parquet(path)
    return _reduce_partials(parts)


def _reduce_partials(parts: DataFrame):
    n = parts.agg(F.sum("n")).first()[0]
    if not n:
        raise ValueError("moments over an empty/all-null vector column")
    s_rows = (parts.select(F.posexplode("s").alias("pos", "v"))
              .groupBy("pos").agg(F.sum("v").alias("v")).collect())
    g_rows = (parts.select(F.posexplode("g").alias("pos", "v"))
              .groupBy("pos").agg(F.sum("v").alias("v")).collect())
    d = max(r["pos"] for r in s_rows) + 1
    s = np.zeros(d)
    for r in s_rows:
        s[r["pos"]] = r["v"]
    g = np.zeros(d * d)
    for r in g_rows:
        g[r["pos"]] = r["v"]
    g = g.reshape(d, d)
    mu = s / n
    cov = (g - n * np.outer(mu, mu)) / max(n - 1, 1)
    return n, mu, cov


def pca_fit(df: DataFrame, k: int, vec_col: str = "embedding"):
    """Fit a k-component PCA: returns ``(mean[d], components[k,d],
    explained_variance[k])`` — symmetric eigendecomposition of the d x d
    covariance on the driver (the only non-distributed step, O(d^3) on a
    matrix whose size is independent of the corpus).

    Sign convention: each component's largest-|coefficient| entry is
    made positive, so the fit is deterministic across BLAS builds."""
    _, mu, cov = moments(df, vec_col)
    w, v = np.linalg.eigh(cov)          # ascending eigenvalues
    order = np.argsort(w)[::-1][:k]
    comps = v[:, order].T               # (k, d)
    for i in range(comps.shape[0]):
        pivot = np.argmax(np.abs(comps[i]))
        if comps[i, pivot] < 0:
            comps[i] = -comps[i]
    return mu, comps, w[order]


def pca_project(df: DataFrame, mean, components,
                vec_col: str = "embedding",
                out_col: str = "pca",
                explained_variance=None,
                eps: float = 1e-12) -> DataFrame:
    """Project vectors onto fitted components: ``out = C (x - mu)`` as a
    NATIVE Column expression — one zip_with/aggregate dot product per
    component against literal arrays; no Python in the projection pass
    (same idiom as similarity.cosine_to_query_col).

    Pass ``explained_variance`` (from ``pca_fit``) to WHITEN: each
    output dim is scaled by ``1/sqrt(var)`` so components have unit
    variance — the usual preprocessing before cosine-based semantic
    dedup/clustering (folded into the literal component vectors; the
    runtime expression is unchanged)."""
    comps = np.asarray(components, dtype=np.float64)
    if explained_variance is not None:
        scale = 1.0 / np.sqrt(np.maximum(
            np.asarray(explained_variance, dtype=np.float64), eps))
        comps = comps * scale[:, None]
    mu = _lit_arr([float(x) for x in mean])
    centered = F.zip_with(F.col(vec_col).cast("array<double>"), mu,
                          lambda x, m: x - m)
    outs = []
    for ci in comps:
        c = _lit_arr([float(x) for x in ci])
        outs.append(F.aggregate(F.zip_with(centered, c,
                                           lambda x, w: x * w),
                                F.lit(0.0), lambda a, b: a + b))
    return df.withColumn(out_col, F.array(*outs))
