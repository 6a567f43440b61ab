"""Range (interval) join — a point-in-interval join Spark has no native
operator for: without help, `l.v BETWEEN r.lo AND r.hi` plans as a
BroadcastNestedLoopJoin / CartesianProduct, which is O(|L|·|R|) and a
100 TB non-starter.

The standard scale rewrite (bucketized band join, as used by interval-join
implementations in stream processors): pick a bucket width, explode each
right interval into the buckets it covers, assign each left point to its
bucket, equi-join on (keys…, bucket), then apply the exact bound predicate.
Cost is one shuffle keyed by (keys, bucket) — partition-parallel — plus a
fan-out factor of ceil(span/bucket) on the right side only.

Choosing ``bucket``: close to the typical interval span ⇒ fan-out ~1-2
rows per interval and candidate lists stay small.  Intervals wildly larger
than ``bucket`` fan out proportionally — guarded by
``max_buckets_per_interval`` (hard error via raise_error, not silent
truncation).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, functions as F


def _to_num(col: Column, dtype: str) -> Column:
    """Timestamps → epoch seconds (fractional); numerics pass through.
    TIMESTAMP_NTZ casts through TIMESTAMP first (unix_micros requires it;
    both join sides get the same session-zone interpretation, so bucket
    assignment and bound comparisons stay consistent)."""
    if dtype.startswith("timestamp"):
        if "ntz" in dtype:
            col = col.cast("timestamp")
        return F.unix_micros(col) / F.lit(1_000_000.0)
    if dtype == "date":
        return F.unix_date(col).cast("double")
    return col.cast("double")


def range_join(left: DataFrame, right: DataFrame, left_val: str,
               right_lo: str, right_hi: str, on: str | list | None = None,
               bucket: float = 1.0, how: str = "inner",
               lo_inclusive: bool = True, hi_inclusive: bool = False,
               suffix: str = "_r",
               max_buckets_per_interval: int = 10_000) -> DataFrame:
    """Join each left row (point ``left_val``) to the right rows whose
    interval [``right_lo``, ``right_hi``] contains it, optionally
    restricted to equal ``on`` keys.  Bound inclusivity is configurable
    (default half-open [lo, hi)); ``how`` is 'inner' or 'left' (left keeps
    unmatched points with nulls).

    ``bucket`` is in the value's units — SECONDS for timestamp columns,
    DAYS·86400 if you want day buckets on dates, the raw unit for
    numerics.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"range_join: how must be inner|left, got {how!r}")
    b = float(bucket)
    if b <= 0:
        raise ValueError("range_join: bucket must be > 0")
    keys = [] if on is None else ([on] if isinstance(on, str) else list(on))

    # resolve output-name collisions before the join (keys join by name)
    collide = (set(right.columns) - set(keys)) & set(left.columns)
    r = right
    for c in sorted(collide):
        r = r.withColumnRenamed(c, c + suffix)
    r_lo = right_lo + suffix if right_lo in collide else right_lo
    r_hi = right_hi + suffix if right_hi in collide else right_hi

    rdts, ldts = dict(r.dtypes), dict(left.dtypes)
    lo_num = _to_num(F.col(r_lo), rdts[r_lo])
    hi_num = _to_num(F.col(r_hi), rdts[r_hi])
    val_num = _to_num(F.col(left_val), ldts[left_val])

    lo_b = F.floor(lo_num / F.lit(b)).cast("long")
    hi_b = F.floor(hi_num / F.lit(b)).cast("long")
    hi_b_guarded = F.when(
        hi_b - lo_b + 1 > F.lit(max_buckets_per_interval),
        F.raise_error(F.lit(
            "range_join: interval spans more than "
            f"{max_buckets_per_interval} buckets — raise `bucket` or "
            "max_buckets_per_interval")).cast("long")).otherwise(hi_b)

    rb = r.withColumn("__bkt", F.explode(F.sequence(lo_b, hi_b_guarded)))
    lb = left.withColumn("__bkt", F.floor(val_num / F.lit(b)).cast("long"))

    lo_cmp = lo_num <= val_num if lo_inclusive else lo_num < val_num
    hi_cmp = val_num <= hi_num if hi_inclusive else val_num < hi_num
    conds = ([lb["__bkt"] == rb["__bkt"]]
             + [lb[k] == rb[k] for k in keys]
             + [lo_cmp, hi_cmp])
    joined = lb.join(rb, reduce(lambda a, c: a & c, conds), how)
    return joined.drop(rb["__bkt"]).drop(lb["__bkt"]) \
                 .drop(*[rb[k] for k in keys])


def interval_overlap_join(left: DataFrame, right: DataFrame,
                          left_lo: str, left_hi: str,
                          right_lo: str, right_hi: str,
                          on: str | list | None = None,
                          bucket: float = 1.0, suffix: str = "_r",
                          max_buckets_per_interval: int = 10_000
                          ) -> DataFrame:
    """Interval × interval OVERLAP join (the sibling of ``range_join``'s
    point-in-interval): pairs where ``[left_lo, left_hi)`` and
    ``[right_lo, right_hi)`` intersect, optionally restricted to equal
    ``on`` keys.  Native `l_lo < r_hi AND r_lo < l_hi` would plan as a
    nested-loop cartesian — a 100 TB non-starter.

    Scale rewrite: BOTH sides explode into the buckets they cover and
    equi-join on (keys…, bucket); a pair overlapping several shared
    buckets is ATTRIBUTED to exactly one — the bucket containing the
    overlap start ``max(l_lo, r_lo)`` — so no post-join distinct is
    needed (the dedup is a codegen predicate, not a shuffle).  Cost: one
    shuffle keyed by (keys, bucket), fan-out ceil(span/bucket) per side,
    guarded by ``max_buckets_per_interval``.
    """
    b = float(bucket)
    if b <= 0:
        raise ValueError("interval_overlap_join: bucket must be > 0")
    keys = [] if on is None else ([on] if isinstance(on, str) else list(on))

    collide = (set(right.columns) - set(keys)) & set(left.columns)
    r = right
    for c in sorted(collide):
        r = r.withColumnRenamed(c, c + suffix)
    r_lo = right_lo + suffix if right_lo in collide else right_lo
    r_hi = right_hi + suffix if right_hi in collide else right_hi

    rdts, ldts = dict(r.dtypes), dict(left.dtypes)
    llo = _to_num(F.col(left_lo), ldts[left_lo])
    lhi = _to_num(F.col(left_hi), ldts[left_hi])
    rlo = _to_num(F.col(r_lo), rdts[r_lo])
    rhi = _to_num(F.col(r_hi), rdts[r_hi])

    def buckets(df, lo, hi, side):
        lo_b = F.floor(lo / F.lit(b)).cast("long")
        hi_b = F.floor(hi / F.lit(b)).cast("long")
        hi_g = F.when(
            hi_b - lo_b + 1 > F.lit(max_buckets_per_interval),
            F.raise_error(F.lit(
                f"interval_overlap_join: {side} interval spans more than "
                f"{max_buckets_per_interval} buckets — raise `bucket` or "
                "max_buckets_per_interval")).cast("long")).otherwise(hi_b)
        return df.withColumn("__bkt", F.explode(F.sequence(lo_b, hi_g)))

    lb = buckets(left, llo, lhi, "left")
    rb = buckets(r, rlo, rhi, "right")
    # half-open overlap + one-bucket attribution at the overlap start
    overlap = (llo < rhi) & (rlo < lhi)
    attrib = (F.floor(F.greatest(llo, rlo) / F.lit(b)).cast("long")
              == lb["__bkt"])
    conds = ([lb["__bkt"] == rb["__bkt"]]
             + [lb[k] == rb[k] for k in keys]
             + [overlap, attrib])
    joined = lb.join(rb, reduce(lambda a, c: a & c, conds), "inner")
    return joined.drop(rb["__bkt"]).drop(lb["__bkt"]) \
                 .drop(*[rb[k] for k in keys])
