"""Incremental materialized-aggregate maintenance (rollup merge).

The 100 TB pattern: a pipeline keeps a small materialized aggregate
(hourly/daily rollups, per-domain corpus profiles) and folds each new
ingest batch into it WITHOUT rescanning history.  That only works for
aggregates with a merge function — count/sum merge by summing, min/max
by min/max, HLL sketches by sketch-union (and avg/var derive from the
mergeable pieces at read time).  The reference's combiner layer has the
same algebra per job (SURVEY.md §2.4 defparallelagg: init/combine —
cascalog-core/src/clj/cascalog/logic/def.clj:107,137-164); persisting
the combined state across jobs is this module's extension.

Scale shape: ``incremental_rollup`` touches ONLY the delta rows and the
old aggregate — history row count is irrelevant.  The merge itself is a
single groupBy over (old_agg ∪ delta_agg); map-side combine collapses
each side to one row per key before the shuffle, so the shuffle is
bounded by distinct keys, never by data size.  A standing aggregate
stored bucketed on the keys (sources.taps.BucketedTap) folds with ZERO
Exchange on its side via :func:`merge_rollup_joined` /
``incremental_rollup(via='join')`` — the union+groupBy spelling cannot
exploit bucketing (Union erases output partitioning).

Spec grammar — ``spec`` maps output column → agg kind:

    spec = {"n":         ("count",),          # row count
            "sum_value": ("sum", "value"),    # sum of a column
            "min_ts":    ("min", "ts"),
            "max_ts":    ("max", "ts"),
            "users":     ("hll", "user_id"),  # mergeable distinct sketch
            "val_td":    ("tdigest", "value")}  # mergeable quantiles

Derived metrics (avg, rates) are one ``withColumn`` on the merged frame:
``F.col("sum_value") / F.col("n")`` — never stored, so they stay exact
under merging.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .stats import tdigest_agg_col, tdigest_merge_col

#: agg kind → (base aggregate over raw rows, merge aggregate over partials)
_KINDS: dict[str, tuple] = {
    "count": (lambda c: F.count(F.lit(1)),
              lambda c: F.sum(c)),
    "sum": (lambda c: F.sum(c),
            lambda c: F.sum(c)),
    "min": (lambda c: F.min(c),
            lambda c: F.min(c)),
    "max": (lambda c: F.max(c),
            lambda c: F.max(c)),
    # mergeable distinct-count sketch; estimate at read time with
    # F.hll_sketch_estimate (builtin.hll_estimate)
    "hll": (lambda c: F.hll_sketch_agg(c),
            lambda c: F.hll_union_agg(c)),
    # mergeable quantile sketch (stats.tdigest_*); query at read time
    # with stats.tdigest_quantile_col
    "tdigest": (lambda c: tdigest_agg_col(c),
                lambda c: tdigest_merge_col(c)),
}


#: kinds whose aggregates are grouped-agg pandas UDFs — Spark refuses to
#: mix these with native aggregate functions in one agg()
#: (INVALID_PANDAS_UDF_PLACEMENT), so specs mixing the two families run
#: as two grouped passes joined null-safely on the keys
_PANDAS_KINDS = frozenset({"tdigest"})


def _check_spec(spec: dict) -> None:
    if not spec:
        raise ValueError("rollup: spec must be non-empty")
    for out, kind in spec.items():
        if not kind or kind[0] not in _KINDS:
            raise ValueError(
                f"rollup: unknown agg kind {kind!r} for {out!r} "
                f"(supported: {sorted(_KINDS)})")
        if kind[0] != "count" and len(kind) < 2:
            raise ValueError(f"rollup: kind {kind[0]!r} for {out!r} "
                             f"needs a source column")


def _grouped(df: DataFrame, keys: list[str]):
    return df.groupBy(*keys) if keys else df.groupBy()


def _apply_split(df: DataFrame, keys: list[str], spec: dict[str, tuple],
                 which: int) -> DataFrame:
    """Apply spec aggregates (which=0 base over raw rows, which=1 merge
    over partials), splitting native vs pandas families when mixed.
    A mixed spec costs two grouped passes over ``df`` joined on the
    keys (null-safe — groupBy keeps NULL keys, a plain equi-join would
    drop them); persist the input first if it is expensive to
    recompute, or keep sketch kinds in a rollup of their own."""
    native, pandas_ = [], []
    for out, kind in spec.items():
        fns = _KINDS[kind[0]]
        # base aggs (which=0) read the raw source column; merge aggs
        # (which=1) read the partial frame's own output column
        src = F.col(kind[1]) if which == 0 and len(kind) > 1 \
            else F.col(out)
        expr = fns[which](src).alias(out)
        (pandas_ if kind[0] in _PANDAS_KINDS else native).append(expr)
    if not native or not pandas_:
        return _grouped(df, keys).agg(*(native or pandas_))
    a = _grouped(df, keys).agg(*native)
    b = _grouped(df, keys).agg(*pandas_)
    if not keys:
        joined = a.crossJoin(b)  # two 1-row global aggregates
    else:
        cond = None
        for k in keys:
            eq = a[k].eqNullSafe(b[k])
            cond = eq if cond is None else (cond & eq)
        joined = a.join(b, cond, "inner").drop(*[b[k] for k in keys])
    return joined.select(*keys, *spec)


def aggregate_rollup(df: DataFrame, keys: list[str],
                     spec: dict[str, tuple]) -> DataFrame:
    """Materialize the rollup from raw rows: one groupBy(keys) whose
    every aggregate is mergeable under :func:`merge_rollups`.  Empty
    ``keys`` builds a one-row global rollup."""
    _check_spec(spec)
    return _apply_split(df, keys, spec, which=0)


def merge_rollups(parts: list[DataFrame], keys: list[str],
                  spec: dict[str, tuple]) -> DataFrame:
    """Merge rollup frames (yesterday's standing aggregate + today's,
    or 365 daily rollups) into one, exactly: a bag union followed by a
    single groupBy(keys) applying each kind's merge function.  The
    result is bit-identical to :func:`aggregate_rollup` over the
    concatenated raw inputs for count/sum/min/max (for sketches:
    merge-order-independent summaries with the same error bound)."""
    _check_spec(spec)
    if not parts:
        raise ValueError("merge_rollups: parts must be non-empty")
    cols = keys + list(spec)
    unioned = parts[0].select(*cols)
    for p in parts[1:]:
        unioned = unioned.unionByName(p.select(*cols))
    return _apply_split(unioned, keys, spec, which=1)


def incremental_rollup(old_agg: DataFrame, delta: DataFrame,
                       keys: list[str], spec: dict[str, tuple],
                       via: str = "union") -> DataFrame:
    """Fold a raw delta batch into a standing materialized aggregate.
    Cost is O(|delta| + |old_agg|) — history rows are never read.  The
    returned frame replaces the standing aggregate (overwrite, or
    partition-overwrite when ``keys`` include the partition column).

    ``via='join'`` merges with :func:`merge_rollup_joined` instead of
    union+groupBy — use it when the standing aggregate is stored
    bucketed on the keys, where it folds with zero Exchange on the
    old side (one Exchange total)."""
    dagg = aggregate_rollup(delta, keys, spec)
    if via == "join":
        return merge_rollup_joined(old_agg, dagg, keys, spec)
    if via != "union":
        raise ValueError(f"incremental_rollup: via must be union|join, "
                         f"got {via!r}")
    return merge_rollups([old_agg, dagg], keys, spec)


def merge_rollup_joined(old: DataFrame, delta_agg: DataFrame,
                        keys: list[str], spec: dict[str, tuple],
                        tdigest_compression: int = 100) -> DataFrame:
    """Two-frame merge as a FULL OUTER JOIN on the keys with per-kind
    scalar combines (sum-with-identity, least/greatest, two-arg
    ``hll_union``, two-sketch t-digest merge).

    Why it exists: the union+groupBy merge ERASES the standing
    aggregate's physical layout (Union has no output partitioning), so
    a standing aggregate stored bucketed on the keys still pays an
    Exchange.  The join path preserves it — the bucketed old side joins
    with ZERO Exchange, and the delta aggregate's own groupBy output
    partitioning is reused for the join, so the whole fold costs
    exactly ONE Exchange (the delta's partial→final agg).  Plan-gated
    in tests/test_plan_quality.py.

    Semantics vs :func:`merge_rollups`: identical for non-NULL key
    values, including the all-NULL-group measure edge (a NULL stored
    sum combines to the other side's value; NULL+NULL stays NULL, as
    an aggregate over no non-null values would be).  One deliberate
    narrowing: a NULL KEY VALUE does not merge across the two frames
    (it emits one row per side) — the join must stay a plain equality
    join, because Spark lowers ``eqNullSafe`` keys to
    ``(coalesce(k,''), isnull(k))`` expressions that disable bucketed
    reads and partitioning reuse, i.e. the entire point of this path.
    Standing-rollup keys are dimension values; keep them non-NULL
    (coalesce to a sentinel at aggregate time if the domain has
    NULLs)."""
    from .stats import tdigest_merge2_col

    _check_spec(spec)
    if not keys:
        raise ValueError("merge_rollup_joined: needs grouping keys "
                         "(global rollups: use merge_rollups)")
    cols = keys + list(spec)
    o = old.select(*cols).alias("__ro")
    d = delta_agg.select(*cols).alias("__rd")
    # USING-form join: plain equality on the raw key columns (bucketing
    # and the delta agg's output partitioning stay usable) with
    # auto-coalesced output keys
    j = o.join(d, on=keys, how="full")
    outs = [F.col(k) for k in keys]
    for out, kind in spec.items():
        a, b = o[out], d[out]
        k0 = kind[0]
        if k0 in ("count", "sum"):
            e = (F.when(a.isNull() & b.isNull(), F.lit(None))
                 .otherwise(F.coalesce(a, F.lit(0))
                            + F.coalesce(b, F.lit(0))))
        elif k0 == "min":
            e = F.least(a, b)  # least/greatest skip NULLs
        elif k0 == "max":
            e = F.greatest(a, b)
        elif k0 == "hll":
            e = (F.when(a.isNull(), b).when(b.isNull(), a)
                 .otherwise(F.hll_union(a, b)))
        else:  # tdigest
            e = tdigest_merge2_col(a, b, tdigest_compression)
        outs.append(e.alias(out))
    return j.select(*outs)
