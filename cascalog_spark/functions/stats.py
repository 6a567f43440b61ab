"""Distribution statistics over columns — corpus/data profiling ops.

Scale shape: fixed-width histograms are ONE aggregate keyed by the bucket
id (map-side partials collapse each partition to ≤ bins rows before the
shuffle); the optional min/max probe is a single cheap global aggregate.
"""

from __future__ import annotations

import math
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F


def histogram(df: DataFrame, col: str, bins: int = 20,
              lo: float | None = None, hi: float | None = None,
              ) -> DataFrame:
    """Fixed-width histogram of a numeric column →
    ``(bucket, lo_edge, hi_edge, n)``; buckets 0..bins-1, the top edge
    inclusive (max lands in the last bucket, width_bucket convention
    clamped).  ``lo``/``hi`` default to the observed min/max (one extra
    scalar aggregate — pass them explicitly on repeated profiling of the
    same table).  Null values are ignored; empty input → 0 rows.
    """
    if bins <= 0:
        raise ValueError("histogram: bins must be > 0")
    if lo is None or hi is None:
        row = df.agg(F.min(F.col(col)).alias("lo"),
                     F.max(F.col(col)).alias("hi")).first()
        if row["lo"] is None:
            return df.sparkSession.createDataFrame(
                [], "bucket int, lo_edge double, hi_edge double, n long")
        lo = float(row["lo"]) if lo is None else lo
        hi = float(row["hi"]) if hi is None else hi
    if hi <= lo:
        hi = lo + 1.0  # degenerate range: single bucket holds everything
    width = (hi - lo) / bins
    c = F.col(col).cast("double")
    bucket = F.least(F.lit(bins - 1), F.greatest(F.lit(0), F.floor(
        (c - F.lit(lo)) / F.lit(width)).cast("int")))
    return (df.where(c.isNotNull())
            .groupBy(bucket.alias("bucket"))
            .agg(F.count(F.lit(1)).alias("n"))
            .withColumn("lo_edge",
                        F.round(F.lit(lo) + F.col("bucket") * F.lit(width),
                                6))
            .withColumn("hi_edge",
                        F.round(F.lit(lo)
                                + (F.col("bucket") + 1) * F.lit(width), 6))
            .select("bucket", "lo_edge", "hi_edge", "n"))


def frequent_items(df: DataFrame, col: str, phi: float,
                   out_item: str = "item",
                   out_count: str = "n") -> DataFrame:
    """EXACT heavy hitters at unbounded scale: every value of ``col``
    whose global occurrence count is ``>= ceil(phi * N)`` (N = non-null
    rows) → ``(item, n)``.  Exact set AND exact counts — no sketch error
    reaches the output.

    The naive exact plan (``groupBy(col).count()`` then filter) shuffles
    one row per DISTINCT value — at 100 TB of tokens that shuffle is
    itself data-sized.  This runs the classic two-pass heavy-hitters
    scheme instead:

    1. **Candidate pass** (``mapInPandas``, Arrow-batched): each batch
       emits only the values whose LOCAL count ``>= phi * batch_len``
       (at most ``floor(1/phi)`` rows per batch).  Pigeonhole guarantee:
       a value with global count ``>= phi*N`` must reach that local
       density in at least one batch — ``sum(count_b) >= phi*sum(len_b)``
       forces ``count_b >= phi*len_b`` somewhere — so the candidate set
       is a SUPERSET of the true heavy hitters.  Shuffle: ``<= batches /
       phi`` rows, independent of the number of distinct values.
    2. **Recount pass**: broadcast-semi-join the deduped candidates back
       onto the data and count exactly; filter ``>= ceil(phi*N)`` drops
       the false positives.

    TWO passes over ``df`` (r11; was three): N rides the candidate scan
    as one counter row per PARTITION (``__fi_v`` NULL, the partition's
    row count) instead of a separate ``count()`` action — the candidate
    frame is materialized once (localCheckpoint, ≤ batches/phi
    candidate rows + one row per partition) and both the candidate set
    and N read off it.  ``cutoff = ceil(phi*N)`` is the identical
    driver-side arithmetic, so the output is bit-identical.  Persist
    upstream if the input is an expensive derived plan
    (``frequent_tokens`` does exactly that for the exploded token
    stream).  Nulls are ignored.  Reference analog: none (extension
    tier — corpus vocabulary / boilerplate auditing at scale).
    """
    if not (0.0 < phi <= 1.0):
        raise ValueError(f"frequent_items: phi must be in (0, 1], "
                         f"got {phi}")
    spark = df.sparkSession
    src = df.select(F.col(col).alias("__fi_v")).where(
        F.col("__fi_v").isNotNull())
    in_schema = src.schema
    out_field = in_schema["__fi_v"].dataType.simpleString()
    cand_schema = f"__fi_v {out_field}, __fi_bn long"

    def _candidates(batches: Iterator) -> Iterator:
        import pandas as pd

        n_part = 0
        for pdf in batches:
            n_local = len(pdf)
            if n_local == 0:
                continue
            n_part += n_local
            vc = pdf["__fi_v"].value_counts()
            keep = vc[vc >= phi * n_local]
            if len(keep):
                out = keep.index.to_frame(index=False, name="__fi_v")
                out["__fi_bn"] = 0
                yield out
        if n_part:
            # one counter row per partition: src rows are non-null by
            # construction, so __fi_v IS NULL identifies it
            yield pd.DataFrame(
                {"__fi_v": pd.Series([None], dtype="object"),
                 "__fi_bn": pd.Series([n_part], dtype="int64")})

    # candidate rows + per-partition counts in ONE pass, materialized
    # once (tiny: bounded by batches/phi + partitions)
    scan = src.mapInPandas(_candidates, schema=cand_schema) \
              .localCheckpoint()
    n_total = scan.agg(F.sum("__fi_bn")).first()[0] or 0
    if n_total == 0:
        return spark.createDataFrame([], f"{out_item} {out_field}, "
                                         f"{out_count} long")
    cutoff = math.ceil(phi * n_total)
    cands = (scan.where(F.col("__fi_v").isNotNull())
             .select("__fi_v").distinct())
    return (src.join(F.broadcast(cands), on="__fi_v", how="inner")
            .groupBy("__fi_v").agg(F.count(F.lit(1)).alias(out_count))
            .where(F.col(out_count) >= F.lit(cutoff))
            .select(F.col("__fi_v").alias(out_item), out_count))


def frequent_items_by_group(df: DataFrame, group_col: str, col: str,
                            phi: float, out_item: str = "item",
                            out_count: str = "n") -> DataFrame:
    """Per-group exact heavy hitters: for every group g, the values of
    ``col`` with count ``>= ceil(phi * N_g)`` (N_g = the group's non-null
    rows) → ``(group_col, item, n)`` — the per-language / per-source
    vocabulary-audit form of :func:`frequent_items`.

    Same two-pass scheme, applied per group: the candidate pass emits,
    per Arrow batch AND group, the values at local density ``>= phi``
    (the pigeonhole argument holds within each group's row slice), so
    the candidate shuffle is ``<= batches * groups_per_batch / phi``
    rows; the recount joins candidates back on (group, value) and
    filters against the per-group totals (both map-side combined).
    Rows with a NULL group or NULL value are ignored.  TWO passes over
    ``df`` (r11; was three): the per-group totals ride the candidate
    scan as one counter row per (partition, group) — identical counts,
    one fewer full pass.  Persist upstream if ``df`` is an expensive
    derived plan."""
    if not (0.0 < phi <= 1.0):
        raise ValueError(f"frequent_items_by_group: phi must be in "
                         f"(0, 1], got {phi}")
    src = (df.select(F.col(group_col).alias("__fg_g"),
                     F.col(col).alias("__fg_v"))
           .where(F.col("__fg_g").isNotNull()
                  & F.col("__fg_v").isNotNull()))
    g_field = src.schema["__fg_g"].dataType.simpleString()
    v_field = src.schema["__fg_v"].dataType.simpleString()

    def _candidates(batches: Iterator) -> Iterator:
        part_counts: dict = {}
        for pdf in batches:
            if not len(pdf):
                continue
            outs = []
            for g, sub in pdf.groupby("__fg_g", sort=False):
                part_counts[g] = part_counts.get(g, 0) + len(sub)
                vc = sub["__fg_v"].value_counts()
                keep = vc[vc >= phi * len(sub)]
                if len(keep):
                    outs.append(keep.index.to_frame(
                        index=False, name="__fg_v").assign(__fg_g=g))
            if outs:
                yield pd.concat(outs)[["__fg_g", "__fg_v"]] \
                    .assign(__fg_bn=0)
        if part_counts:
            # one counter row per (partition, group): src values are
            # non-null by construction, so __fg_v IS NULL marks them
            yield pd.DataFrame(
                {"__fg_g": list(part_counts.keys()),
                 "__fg_v": pd.Series([None] * len(part_counts),
                                     dtype="object"),
                 "__fg_bn": list(part_counts.values())})

    scan = (src.mapInPandas(
        _candidates,
        schema=f"__fg_g {g_field}, __fg_v {v_field}, __fg_bn long")
        .localCheckpoint())
    cands = (scan.where(F.col("__fg_v").isNotNull())
             .select("__fg_g", "__fg_v").distinct())
    totals = (scan.where(F.col("__fg_v").isNull())
              .groupBy("__fg_g").agg(F.sum("__fg_bn").alias("__fg_n")))
    return (src.join(F.broadcast(cands), on=["__fg_g", "__fg_v"],
                     how="inner")
            .groupBy("__fg_g", "__fg_v")
            .agg(F.count(F.lit(1)).alias(out_count))
            .join(F.broadcast(totals), on="__fg_g")
            .where(F.col(out_count)
                   >= F.ceil(F.lit(phi) * F.col("__fg_n")))
            .select(F.col("__fg_g").alias(group_col),
                    F.col("__fg_v").alias(out_item), out_count))


def frequent_tokens(df: DataFrame, phi: float, text_col: str = "text",
                    n: int = 1) -> DataFrame:
    """Corpus-level exact frequent TERMS: token n-grams making up
    ``>= phi`` of all n-gram occurrences → ``(term, n_occurrences)``.
    Tokenization is the repo-wide convention (``text.tokens_col``:
    lowercase, whitespace split, empties dropped); ``n > 1`` counts
    n-grams (``text.char_ngrams_col``, the ``top_ngrams`` transform) —
    the boilerplate-audit case where the exact-groupBy shuffle of
    ``top_ngrams`` is most data-sized and the bounded candidate pass
    matters most.  The gram stream is exploded once and persisted
    across :func:`frequent_items`'s three actions."""
    from pyspark import StorageLevel

    from .text import char_ngrams_col, tokens_col
    from .util import ensure_parallelism, explode_fast

    arr = tokens_col(F.col(text_col))
    if n > 1:
        arr = char_ngrams_col(arr, n)
    toks = explode_fast(ensure_parallelism(df.select(text_col)),
                        arr, "term")
    toks = toks.select("term").persist(StorageLevel.MEMORY_AND_DISK)
    try:
        out = frequent_items(toks, "term", phi, out_item="term",
                             out_count="n_occurrences")
        # materialize before releasing the token stream both passes read
        out = out.localCheckpoint(eager=True)
    finally:
        toks.unpersist()
    return out


# ---------------------------------------------------------------------------
# Mergeable quantile sketch: t-digest (k0 linear scale)
#
# The quantile counterpart of the HLL distinct sketch (builtin.hll_*):
# a bounded summary (<= compression+1 weighted centroids) that merges
# associatively, so per-day/per-shard sketches union into the exact same
# kind of sketch — the piece functions/rollup.py needs to maintain
# quantiles incrementally without rescanning history.  Reference analog:
# none (the reference's combiner algebra, logic/def.clj:137-164, has no
# persisted cross-job state); design follows Dunning & Ertl's t-digest
# with the k0 (uniform-capacity) scale function: after any compress,
# every centroid carries <= total_weight/compression mass, so a quantile
# read is off by at most ~1/compression in RANK.
#
# Sketch wire format: array<array<double>> = [means, weights], parallel
# arrays sorted by mean.  Chosen over array<struct<..>> because grouped
# -agg pandas UDFs accept nested plain arrays for both input and return.
# ---------------------------------------------------------------------------

def _td_compress(ms, ws, compression: int):
    """Compress centroids to <= compression+1 clusters (numpy, fully
    vectorized): sort by mean, bucket by cumulative-weight-before /
    capacity, weighted-average each bucket.  Deterministic for a given
    multiset of centroids: the lexsort on (mean, weight) is the
    canonical order — tied-mean centroids with unequal weights are NOT
    interchangeable under the cumweight bucketing, so a plain mean
    sort would make results depend on input order."""
    import numpy as np

    ms = np.asarray(ms, dtype=np.float64)
    ws = np.asarray(ws, dtype=np.float64)
    if ms.size == 0:
        return [], []
    # lexsort on (mean, weight): tied-mean centroids with UNEQUAL
    # weights are not interchangeable under the cumweight bucketing
    # (verified: swapping their order changes the merged buckets), so
    # the tie-break must be part of the canonical order or merges
    # become partitioning-dependent; (mean, weight) duplicates ARE
    # interchangeable
    order = np.lexsort((ws, ms))
    ms, ws = ms[order], ws[order]
    total = float(ws.sum())
    cap = total / compression
    if cap <= 0:
        return list(ms), list(ws)
    cum_before = np.cumsum(ws) - ws
    bucket = np.minimum(np.floor(cum_before / cap).astype(np.int64),
                        compression)
    out_w = np.bincount(bucket, weights=ws)
    out_mw = np.bincount(bucket, weights=ws * ms)
    keep = out_w > 0
    out_w = out_w[keep]
    out_m = out_mw[keep] / out_w
    return [float(x) for x in out_m], [float(x) for x in out_w]


def _td_quantiles(ms, ws, qs):
    """Interpolated quantile estimates from one sketch (midpoint rule:
    centroid i sits at cumulative rank cum_i - w_i/2)."""
    import numpy as np

    ms = np.asarray(ms, dtype=np.float64)
    ws = np.asarray(ws, dtype=np.float64)
    if ms.size == 0:
        return [None for _ in qs]
    total = ws.sum()
    pos = np.cumsum(ws) - ws / 2.0
    targets = np.asarray(qs, dtype=np.float64) * total
    return [float(x) for x in np.interp(targets, pos, ms)]


def tdigest_agg_col(col, compression: int = 100):
    """Grouped-agg Column building a t-digest sketch from raw numeric
    values — use inside ``groupBy(...).agg(...)``.

    Scale caveat (same as every grouped-agg pandas UDF / the reference's
    defaggregatefn path): each GROUP's values materialize as one pandas
    Series on an executor, so this is for grouped rollups with bounded
    groups.  For global sketches or mega-groups use
    :func:`tdigest_sketch`, whose per-batch partial pass bounds memory
    by the Arrow batch size.  Cannot share an ``agg()`` with native
    aggregate functions (Spark INVALID_PANDAS_UDF_PLACEMENT) —
    functions/rollup.py splits its spec and joins for exactly this
    reason."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<array<double>>")
    def _agg(v: pd.Series) -> list:
        vals = v.dropna().to_numpy(dtype="float64")
        import numpy as np
        m, w = _td_compress(vals, np.ones_like(vals), compression)
        return [m, w]

    return _agg(col)


def tdigest_merge_col(col, compression: int = 100):
    """Grouped-agg Column merging sketch values (the ``[means,
    weights]`` wire format) into one sketch: concatenate all centroids,
    re-compress.  Order-insensitive: the compress re-sorts the
    concatenated centroids into the canonical (mean, weight) order, so
    the merge is a pure function of the centroid multiset.  Input
    rows are sketches (<= compression+1 centroids each), never raw
    data, so a year of daily sketches per key is ~36k doubles."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<array<double>>")
    def _merge(s: pd.Series) -> list:
        import numpy as np
        ms, ws = [], []
        for sk in s:
            if sk is None or len(sk) != 2 or len(sk[0]) == 0:
                continue
            ms.append(np.asarray(sk[0], dtype="float64"))
            ws.append(np.asarray(sk[1], dtype="float64"))
        if not ms:
            return [[], []]
        m, w = _td_compress(np.concatenate(ms), np.concatenate(ws),
                            compression)
        return [m, w]

    return _merge(col)


def tdigest_quantile_col(sketch, q: float):
    """Scalar Column: estimated ``q``-quantile from a sketch column.
    Arrow-batched; sketch rows are per-key summaries, never data-sized.
    Rank error <= ~1/compression of the sketched mass."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _q(s: pd.Series) -> pd.Series:
        out = []
        for sk in s:
            if sk is None or len(sk) != 2 or len(sk[0]) == 0:
                out.append(None)
            else:
                out.append(_td_quantiles(sk[0], sk[1], [q])[0])
        return pd.Series(out, dtype="float64")

    return _q(sketch)


def tdigest_sketch(df: DataFrame, col: str, keys: list[str] | None = None,
                   compression: int = 100,
                   out_col: str = "sketch") -> DataFrame:
    """Scale-path sketch build: per-Arrow-batch partial digests
    (mapInPandas — memory bounded by the batch, O(compression) rows out
    per batch per key) merged by ONE groupBy.  The shuffle carries
    sketches, not values: #batches x #keys-per-batch rows regardless of
    table size.  Works for the global case (``keys=None``) where
    :func:`tdigest_agg_col` would materialize the whole column in one
    task."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import (ArrayType, DoubleType, StructField,
                                   StructType)

    keys = list(keys or [])
    fields = [df.schema[k] for k in keys]
    schema = StructType(
        fields + [StructField(out_col,
                              ArrayType(ArrayType(DoubleType())))])

    def gen(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            if keys:
                for kv, g in pdf.groupby(keys, dropna=False, sort=False):
                    vals = g[col].dropna().to_numpy(dtype="float64")
                    if vals.size == 0:
                        continue
                    m, w = _td_compress(vals, np.ones_like(vals),
                                        compression)
                    kv = kv if isinstance(kv, tuple) else (kv,)
                    rows.append([*kv, [m, w]])
            else:
                vals = pdf[col].dropna().to_numpy(dtype="float64")
                if vals.size:
                    m, w = _td_compress(vals, np.ones_like(vals),
                                        compression)
                    rows.append([[m, w]])
            if rows:
                yield pd.DataFrame(rows, columns=keys + [out_col])

    partials = df.select(*keys, col).mapInPandas(gen, schema)
    grouped = partials.groupBy(*keys) if keys else partials.groupBy()
    return grouped.agg(
        tdigest_merge_col(F.col(out_col), compression).alias(out_col))


# ---------------------------------------------------------------------------
# Distribution drift: population stability index between two snapshots
# ---------------------------------------------------------------------------

def psi_term_cols(n_expected, n_actual, te, ta,
                  eps: float = 1e-6):
    """The one PSI arithmetic shared by the batch gate
    (:func:`psi_report`) and the streaming monitor
    (``streaming.ingest.stream_drift_monitor``): proportions with a
    guard against empty sides, eps-clamped log term.  Returns
    ``(p_expected, p_actual, psi_term)`` Columns — keep BOTH callers on
    this helper so a smoothing change can never diverge them."""
    pe = n_expected / F.greatest(te, F.lit(1))
    pa = n_actual / F.greatest(ta, F.lit(1))
    term = (pe - pa) * F.log(F.greatest(pe, F.lit(eps))
                             / F.greatest(pa, F.lit(eps)))
    return pe, pa, term


def psi_report(expected: DataFrame, actual: DataFrame, col: str,
               bins: int = 20, lo: float | None = None,
               hi: float | None = None, eps: float = 1e-6) -> DataFrame:
    """Population Stability Index between two snapshots of a numeric
    column (the corpus-drift gate between crawls / training exports) →
    one row per shared fixed-width bin:
    ``(bucket, lo_edge, hi_edge, n_expected, n_actual, p_expected,
    p_actual, psi_term)``; ``sum(psi_term)`` is the PSI
    (rule of thumb: < 0.1 stable, 0.1-0.25 drifting, > 0.25 shifted).

    Bin edges are shared: ``lo``/``hi`` default to the min/max over
    BOTH snapshots (one cheap union aggregate — pass them explicitly on
    repeated monitoring).  Empty bins are clamped at ``eps`` inside the
    log, the standard PSI smoothing.  Each side is one
    map-side-combined groupBy on its bucket (≤ bins rows shuffle); the
    join is bins x bins — never data-sized.
    """
    if bins <= 0:
        raise ValueError("psi_report: bins must be > 0")
    c = F.col(col).cast("double")
    if lo is None or hi is None:
        both = (expected.select(c.alias("__v"))
                .unionByName(actual.select(c.alias("__v"))))
        row = both.agg(F.min("__v").alias("lo"),
                       F.max("__v").alias("hi")).first()
        if row["lo"] is None:
            return expected.sparkSession.createDataFrame(
                [], "bucket int, lo_edge double, hi_edge double, "
                    "n_expected long, n_actual long, p_expected double, "
                    "p_actual double, psi_term double")
        lo = float(row["lo"]) if lo is None else lo
        hi = float(row["hi"]) if hi is None else hi
    if hi <= lo:
        hi = lo + 1.0

    def side(df, name):
        h = histogram(df, col, bins=bins, lo=lo, hi=hi)
        return h.select("bucket", F.col("n").alias(name))

    e = side(expected, "n_expected")
    a = side(actual, "n_actual")
    j = (e.join(a, on="bucket", how="full")
         .withColumn("n_expected", F.coalesce("n_expected", F.lit(0)))
         .withColumn("n_actual", F.coalesce("n_actual", F.lit(0))))
    # totals via window-free broadcast: two 1-row aggregates
    tot = j.agg(F.sum("n_expected").alias("te"),
                F.sum("n_actual").alias("ta"))
    j = j.crossJoin(F.broadcast(tot))
    pe, pa, term = psi_term_cols(F.col("n_expected"), F.col("n_actual"),
                                 F.col("te"), F.col("ta"), eps)
    width = (hi - lo) / bins
    return (j.withColumn("lo_edge",
                         F.round(F.lit(lo) + F.col("bucket")
                                 * F.lit(width), 6))
            .withColumn("hi_edge",
                        F.round(F.lit(lo) + (F.col("bucket") + 1)
                                * F.lit(width), 6))
            .withColumn("p_expected", F.round(pe, 6))
            .withColumn("p_actual", F.round(pa, 6))
            .withColumn("psi_term", F.round(term, 6))
            .select("bucket", "lo_edge", "hi_edge", "n_expected",
                    "n_actual", "p_expected", "p_actual", "psi_term"))


# ---------------------------------------------------------------------------
# Whole-table column profile
# ---------------------------------------------------------------------------

def table_profile(df: DataFrame, cols: list[str] | None = None,
                  exact_distinct: bool = False) -> DataFrame:
    """Generic know-your-data profile → one row per column:
    ``(column, n_rows, n_null, null_frac, n_distinct, min_repr,
    max_repr)``.

    The whole profile is ONE aggregate pass over the table (every
    metric folds into the same global agg; partials are one row per
    partition).  ``n_distinct`` is HLL-approximate by default — with
    ``exact_distinct=True`` Spark plans the multi-column distinct via
    Expand (one logical pass, #cols-fold row expansion before the
    partial agg; exact, but pay it knowingly on wide tables).
    ``min_repr``/``max_repr`` are the column's own min/max rendered as
    strings (numeric columns compare numerically BEFORE the cast).
    Complex-typed columns (arrays/maps/structs) profile nulls only.
    """
    cols = list(df.columns if cols is None else cols)
    if not cols:
        raise ValueError("table_profile: no columns")
    simple = {f.name: f.dataType.typeName() for f in df.schema.fields}
    aggs = [F.count(F.lit(1)).alias("__n")]
    nd_aggs = []
    for i, c in enumerate(cols):
        col = F.col(c)
        aggs.append(F.sum(F.when(col.isNull(), 1).otherwise(0))
                    .alias(f"__null{i}"))
        kind = simple.get(c, "")
        complex_t = kind in ("array", "map", "struct", "binary")
        if complex_t:
            aggs.append(F.lit(None).cast("long").alias(f"__nd{i}"))
            aggs.append(F.lit(None).cast("string").alias(f"__mn{i}"))
            aggs.append(F.lit(None).cast("string").alias(f"__mx{i}"))
        else:
            nd = (F.count_distinct(col) if exact_distinct
                  else F.approx_count_distinct(col))
            if exact_distinct:
                # exact distincts go in a SEPARATE aggregate: combined
                # with min/max(string) they force every phase of the
                # Expand-based multi-distinct rewrite into SortAggregate
                # (string agg buffers are not HashAggregate-compatible),
                # i.e. a full sort of the #cols-fold expanded rows.  A
                # distinct-only aggregate plans as pure HashAggregate
                # (phase 1 is a grouping-key-only dedup, phase 2 counts
                # longs), and the scalar stats pass stays a one-row
                # global agg.  Two scans of a column-pruned table beat
                # one sort of 6x its rows (guide §2.4; identical counts
                # — same count_distinct over the same rows).
                nd_aggs.append(nd.alias(f"__nd{i}"))
            else:
                aggs.append(nd.alias(f"__nd{i}"))
            aggs.append(F.min(col).cast("string").alias(f"__mn{i}"))
            aggs.append(F.max(col).cast("string").alias(f"__mx{i}"))
    row = df.agg(*aggs)
    if nd_aggs:
        row = row.crossJoin(F.broadcast(df.agg(*nd_aggs)))
    entries = F.array(*[
        F.struct(F.lit(c).alias("column"),
                 F.col(f"__null{i}").alias("n_null"),
                 F.col(f"__nd{i}").alias("n_distinct"),
                 F.col(f"__mn{i}").alias("min_repr"),
                 F.col(f"__mx{i}").alias("max_repr"))
        for i, c in enumerate(cols)])
    out = (row.select(F.col("__n").alias("n_rows"),
                      F.explode(entries).alias("p"))
           .select("p.column", "n_rows",
                   F.coalesce("p.n_null", F.lit(0)).alias("n_null"),
                   "p.n_distinct", "p.min_repr", "p.max_repr"))
    frac = F.when(F.col("n_rows") == 0, F.lit(0.0)).otherwise(
        F.col("n_null") / F.col("n_rows"))
    return (out.withColumn("null_frac", F.round(frac, 6))
            .select("column", "n_rows", "n_null", "null_frac",
                    "n_distinct", "min_repr", "max_repr"))


def tdigest_merge2_col(a, b, compression: int = 100):
    """Scalar two-sketch merge (Arrow-batched): the join-based rollup
    merge path needs a per-row combine of exactly two sketches (one
    from the standing aggregate, one from the delta) rather than a
    grouped aggregate.  NULL on either side passes the other through."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<array<double>>")
    def _merge2(x: pd.Series, y: pd.Series) -> pd.Series:
        import numpy as np
        out = []
        for sa, sb in zip(x, y):
            parts = [s for s in (sa, sb)
                     if s is not None and len(s) == 2 and len(s[0])]
            if not parts:
                out.append(None)
            elif len(parts) == 1:
                out.append([list(parts[0][0]), list(parts[0][1])])
            else:
                m, w = _td_compress(
                    np.concatenate([np.asarray(p[0], dtype="float64")
                                    for p in parts]),
                    np.concatenate([np.asarray(p[1], dtype="float64")
                                    for p in parts]),
                    compression)
                out.append([m, w])
        return pd.Series(out, dtype="object")

    return _merge2(a, b)


def _drift_side(df: DataFrame, vec_col: str) -> DataFrame:
    from .similarity import norm_col

    v = F.col(vec_col).cast("array<double>")
    return (df.where(F.col(vec_col).isNotNull())
            .select(v.alias("__v"), norm_col(v).alias("__nrm"))
            .where(F.col("__nrm") > 0))


def _drift_mean(side: DataFrame, dim: int) -> list:
    row = side.agg(F.expr(
        "array(" + ",".join(f"avg(__v[{i}])"
                            for i in range(dim)) + ")").alias("m")).first()
    return [float(x) for x in row["m"]]


def _drift_two_side_stats(e: DataFrame, a: DataFrame, dim: int):
    """Both sides' mean vector + norm bounds in ONE aggregate job (the
    same ``avg(__v[i])`` / ``min``/``max`` expressions the separate
    passes ran, grouped by a side tag — one collect instead of four
    scans)."""
    u = (e.select(F.lit(0).alias("__side"), "__v", "__nrm")
         .unionByName(a.select(F.lit(1).alias("__side"), "__v",
                               "__nrm")))
    got = {int(r["__side"]): r for r in u.groupBy("__side").agg(
        F.expr("array(" + ",".join(f"avg(__v[{i}])"
                                   for i in range(dim)) + ")").alias("m"),
        F.min("__nrm").alias("lo"),
        F.max("__nrm").alias("hi")).collect()}

    def _unpack(r):
        if r is None:  # empty side: no group row
            return None, None, None
        return ([float(x) for x in r["m"]], float(r["lo"]),
                float(r["hi"]))

    return _unpack(got.get(0)), _unpack(got.get(1))


def _drift_cells(side: DataFrame, cents, name: str) -> DataFrame:
    from .similarity import ivf_assign_col

    return (side.select(ivf_assign_col("__v", cents).alias("cell"))
            .groupBy("cell").agg(F.count(F.lit(1)).alias(name)))


def embedding_drift_reference(df: DataFrame,
                              vec_col: str = "embedding",
                              id_col: str = "vec_id",
                              n_centroids: int = 16,
                              centroids=None, bins: int = 20) -> dict:
    """FROZEN reference model for repeated / streaming drift checks:
    the expected-side state ``embedding_drift_report`` needs, computed
    ONCE — mean vector, norm histogram (counts + frozen ``[lo, hi)``
    bounds), centroid table, per-cell counts.  Driver-sized
    (O(dim + bins + n_centroids·dim)); pass it as ``ref_model=`` so
    monitoring never rescans the reference corpus."""
    from .similarity import _resolve_centroids

    side = _drift_side(df, vec_col)
    dim_row = side.select(F.size("__v").alias("d")).first()
    if dim_row is None:
        raise ValueError("embedding_drift_reference: empty reference")
    dim = dim_row["d"]
    mean = _drift_mean(side, dim)
    b = side.agg(F.min("__nrm").alias("lo"),
                 F.max("__nrm").alias("hi")).first()
    lo, hi = float(b["lo"]), float(b["hi"])
    if hi <= lo:
        hi = lo + 1.0  # histogram()'s degenerate-range convention
    counts = [0] * bins
    for r in histogram(side.select(F.col("__nrm").alias("norm")),
                       "norm", bins=bins, lo=lo, hi=hi).collect():
        counts[r["bucket"]] = int(r["n"])
    cents = _resolve_centroids(
        centroids, df.where(F.col(vec_col).isNotNull()),
        id_col, vec_col, n_centroids)
    cells = {int(r["cell"]): int(r["n"])
             for r in _drift_cells(side, cents, "n").collect()}
    return {"dim": dim, "mean": mean, "bins": bins, "lo": lo, "hi": hi,
            "norm_counts": counts, "cents": cents,
            "cell_counts": cells}


def embedding_drift_report(expected: DataFrame | None,
                           actual: DataFrame,
                           vec_col: str = "embedding",
                           id_col: str = "vec_id",
                           n_centroids: int = 16,
                           centroids=None, bins: int = 20,
                           eps: float = 1e-6,
                           ref_model: dict | None = None) -> DataFrame:
    """Drift between two EMBEDDING snapshots — the vector-space sibling
    of :func:`psi_report` (which gates scalar columns).  One row per
    metric, ``(metric, value)``:

    - ``mean_cosine``: cosine between the two snapshots' mean vectors
      (1.0 = direction unchanged; the single cheapest re-embedding /
      upstream-model-change alarm).
    - ``mean_l2_shift``: ``||mean_e − mean_a||₂`` (magnitude drift the
      cosine normalizes away).
    - ``norm_psi``: PSI over the vector L2-norm distributions (catches
      scale/normalization regressions even when direction holds).
    - ``cell_psi``: PSI over IVF cell-assignment frequencies —
      distributional drift in embedding SPACE (clusters growing or
      emptying) that per-dimension moments can't see.  Centroids come
      from the EXPECTED snapshot (deterministic first-k-ids seed, or
      pass ``centroids=`` / ``'kmeans'``), so the comparison frame is
      frozen on the reference side.

    Scale shape: the mean vectors are one 1-row aggregate per side
    (d ``avg`` terms in a single expression — O(dim) driver state);
    norms/cells are each one map-side-combined groupBy per side with a
    ≤ bins/≤ n_centroids join.  Everything is deterministic and
    rounded to 6 — SQL-oracle-checkable.

    ``ref_model=`` (an :func:`embedding_drift_reference` dict) replaces
    the ``expected`` DataFrame with FROZEN reference state — the
    monitoring semantics: norm bounds come from the reference (an
    actual-side outlier clamps into the edge bins instead of re-binning
    history), and the reference corpus is never rescanned.  With the
    actual side inside the reference's norm range, the metrics equal
    the two-DataFrame form (pinned by test).
    """
    from functools import reduce as _reduce

    from .similarity import _resolve_centroids

    a = _drift_side(actual, vec_col)
    spark = actual.sparkSession
    lo = hi = None
    if ref_model is None:
        if expected is None:
            raise ValueError("embedding_drift_report: need expected= "
                             "or ref_model=")
        e = _drift_side(expected, vec_col)
        dim_row = e.select(F.size("__v").alias("d")).first()
        if dim_row is None:
            raise ValueError("embedding_drift_report: empty expected "
                             "side")
        dim = dim_row["d"]
        # ONE aggregate collect per side: mean array + norm bounds in
        # the same job (the r9 fixed-cost fold — previously mean,
        # union-min/max and the dim probe were separate scans).  The
        # avg/min/max expressions are unchanged, and the shared
        # [lo, hi) = min/max over both sides equals the old union
        # aggregate exactly, so every downstream value is bit-identical.
        (me, elo, ehi), (ma, alo, ahi) = _drift_two_side_stats(e, a,
                                                               dim)
        bnds = [b for b in (elo, alo) if b is not None]
        lo = min(bnds) if bnds else None
        bnds = [b for b in (ehi, ahi) if b is not None]
        hi = max(bnds) if bnds else None
        cents = _resolve_centroids(
            centroids, expected.where(F.col(vec_col).isNotNull()),
            id_col, vec_col, n_centroids)
    else:
        dim = ref_model["dim"]
        me = ref_model["mean"]
        cents = ref_model["cents"]
        bins = ref_model["bins"]
        ma = _drift_mean(a, dim)
    dot = _reduce(lambda x, y: x + y,
                  [me[i] * ma[i] for i in range(dim)])
    ne = math.sqrt(_reduce(lambda x, y: x + y, [x * x for x in me]))
    na = math.sqrt(_reduce(lambda x, y: x + y, [x * x for x in ma]))
    mean_cos = dot / (ne * na) if ne > 0 and na > 0 else None
    l2 = math.sqrt(_reduce(lambda x, y: x + y,
                           [(me[i] - ma[i]) ** 2 for i in range(dim)]))

    if ref_model is None:
        # ONE scan + ONE shuffle per side for BOTH distributions: each
        # row explodes into a ('h', norm_bucket) and a ('c', ivf_cell)
        # pair, aggregated by (kind, key) — previously the final action
        # scanned each side twice (histogram + cells).  The bucket
        # expression, counts, totals and psi arithmetic are exactly
        # psi_report's, so both PSI values are unchanged.
        from .similarity import ivf_assign_col

        hi_eff = (lo + 1.0) if (hi is not None and hi <= lo) else hi

        def _kv(side, name):
            if lo is None:  # no non-null rows on either side
                return spark.createDataFrame(
                    [], f"kind string, key long, {name} long")
            width = (hi_eff - lo) / bins
            bucket = F.least(F.lit(bins - 1), F.greatest(F.lit(0), F.floor(
                (F.col("__nrm") - F.lit(lo)) / F.lit(width)).cast("int")))
            return (side.select(F.explode(F.array(
                F.struct(F.lit("h").alias("kind"),
                         bucket.cast("long").alias("key")),
                F.struct(F.lit("c").alias("kind"),
                         ivf_assign_col("__v", cents).cast("long")
                         .alias("key")))).alias("kv"))
                .groupBy(F.col("kv.kind").alias("kind"),
                         F.col("kv.key").alias("key"))
                .agg(F.count(F.lit(1)).alias(name)))

        # materialized once (localCheckpoint, ≤ bins+n_centroids rows):
        # the frame feeds FOUR consumers (rows + broadcast totals for
        # each PSI) — left lazy, the two corpus scans re-executed per
        # consumer inside one action
        j2 = (_kv(e, "n_expected")
              .join(_kv(a, "n_actual"), on=["kind", "key"], how="full")
              .withColumn("n_expected", F.coalesce("n_expected",
                                                   F.lit(0)))
              .withColumn("n_actual", F.coalesce("n_actual", F.lit(0)))
              .localCheckpoint())

        def _psi(kind, inner_round):
            rows = j2.where(F.col("kind") == kind)
            tot = rows.agg(F.sum("n_expected").alias("te"),
                           F.sum("n_actual").alias("ta"))
            _, _, t = psi_term_cols(F.col("n_expected"),
                                    F.col("n_actual"),
                                    F.col("te"), F.col("ta"), eps)
            t = F.round(t, 6) if inner_round else t
            return (rows.crossJoin(F.broadcast(tot))
                    .agg(F.round(F.sum(t), 6).alias("v")))

        # psi_report rounds each term to 6 before the sum; the cell
        # path never did — preserved exactly
        norm_psi = _psi("h", inner_round=True)
        cell_psi = _psi("c", inner_round=False)
    else:
        # frozen bounds + counts ride as bins-row literal frames; the
        # arithmetic (psi_term_cols, per-term round, sum round) is the
        # same as psi_report's so the two forms can never diverge
        lo, hi = ref_model["lo"], ref_model["hi"]
        h = (histogram(a.select(F.col("__nrm").alias("norm")), "norm",
                       bins=bins, lo=lo, hi=hi)
             .select("bucket", F.col("n").alias("n_actual")))
        spine = spark.createDataFrame(
            [(i, int(n)) for i, n in enumerate(ref_model["norm_counts"])],
            "bucket int, n_expected long")
        nj = (spine.join(h, on="bucket", how="full")
              .withColumn("n_expected", F.coalesce("n_expected",
                                                   F.lit(0)))
              .withColumn("n_actual", F.coalesce("n_actual", F.lit(0))))
        ntot = nj.agg(F.sum("n_expected").alias("te"),
                      F.sum("n_actual").alias("ta"))
        _, _, nterm = psi_term_cols(F.col("n_expected"),
                                    F.col("n_actual"),
                                    F.col("te"), F.col("ta"), eps)
        norm_psi = (nj.crossJoin(F.broadcast(ntot))
                    .agg(F.round(F.sum(F.round(nterm, 6)), 6)
                         .alias("v")))
        ecells = spark.createDataFrame(
            [(int(c), int(n)) for c, n in
             sorted(ref_model["cell_counts"].items())],
            "cell long, n_expected long")
        j = (ecells
             .join(_drift_cells(a, cents, "n_actual"), on="cell",
                   how="full")
             .withColumn("n_expected", F.coalesce("n_expected",
                                                  F.lit(0)))
             .withColumn("n_actual", F.coalesce("n_actual", F.lit(0))))
        tot = j.agg(F.sum("n_expected").alias("te"),
                    F.sum("n_actual").alias("ta"))
        _, _, term = psi_term_cols(F.col("n_expected"),
                                   F.col("n_actual"),
                                   F.col("te"), F.col("ta"), eps)
        cell_psi = (j.crossJoin(F.broadcast(tot))
                    .agg(F.round(F.sum(term), 6).alias("v")))
    # round IN-PLAN (Spark's BigDecimal HALF_UP — the family-wide
    # oracle-matching convention), not with Python's banker's round
    head = (spark.createDataFrame(
        [("mean_cosine", mean_cos), ("mean_l2_shift", l2)],
        "metric string, value double")
        .select("metric", F.round(F.col("value"), 6).alias("value")))
    return (head
            .unionByName(norm_psi.select(F.lit("norm_psi").alias("metric"),
                                         F.col("v").alias("value")))
            .unionByName(cell_psi.select(F.lit("cell_psi").alias("metric"),
                                         F.col("v").alias("value")))
            .orderBy("metric"))
