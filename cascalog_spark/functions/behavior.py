"""Behavioral event-sequence analytics: funnel conversion, cohort
retention, and event-transition statistics.

The reference expresses these as sorted-buffer queries — a defbufferfn
over per-user ``(?time ?action)`` tuples with ``:sort`` (cascalog-core
src/clj/cascalog/logic/def.clj buffer ops; the sessionization /
lag-style tests in api_test.clj) — which materializes every user's
history in one reducer.  Here each is a pure Window/groupBy rewrite:

- ``funnel_stages``: k chained ``min(CASE …) OVER (PARTITION BY user)``
  passes over the SAME partitioning — Catalyst plans one Exchange and
  k streaming Window operators, so a million-event user never
  materializes in Python memory (vs. the collect_list fold, which
  carries the whole history per user).
- ``retention_cohorts`` / ``transition_matrix``: one analytic window +
  one aggregate each.

100 TB shape: everything keys by ``user_col`` (high-cardinality,
near-uniform for event data — no salt needed); funnel pre-filters to
stage events only, so the shuffled volume is the funnel-relevant slice,
not the full stream.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["cohort_offset_cols", "decayed_agg", "event_ngrams",
           "funnel_report",
           "funnel_stages", "retention_cohorts", "transition_matrix"]


def _seconds(col: Column, dtype: str) -> Column:
    if dtype.startswith("timestamp"):
        # NTZ cast is a no-op for plain timestamps and makes unix_micros
        # legal for timestamp_ntz columns
        return F.unix_micros(col.cast("timestamp")) / F.lit(1_000_000.0)
    return col.cast("double")


def funnel_stages(df: DataFrame, ts_col: str, user_col: str,
                  stage_col: str, stages: list[str | tuple],
                  horizon: float | None = None,
                  prior: DataFrame | None = None,
                  skew_safe: bool = False) -> DataFrame:
    """Per-user funnel progression through the ordered ``stages``:
    stage i is reached at the EARLIEST event of type ``stages[i]``
    that is STRICTLY LATER than the time stage i-1 was reached
    (stage 0 is the user's earliest ``stages[0]`` event); with
    ``horizon``, stages beyond the first must also fall within
    ``horizon`` seconds of the stage-0 time (the "converted within N
    days" business definition).

    Output: one row per user having at least one funnel-stage event —
    ``(user_col, ts_<stage>… , stage_reached)`` where ``ts_<stage>`` is
    the reach timestamp (NULL once the chain breaks) and
    ``stage_reached`` counts completed stages (0..k).

    The strict ``>`` chaining makes each reach time a closed-form
    chained minimum — ``t_i = min(ts | stage=s_i ∧ ts > t_{i-1})`` —
    so a SQL oracle reproduces it with k nested aggregates, and the
    result is independent of any tie-break among equal timestamps.

    ``prior`` folds a STANDING per-user state (a previous
    ``funnel_stages`` output — same columns) into the computation:
    already-reached stages are frozen (``coalesce(old, batch min)``)
    and the chaining conditions compare batch events against the
    coalesced reach times, so feeding time-ordered batches one at a
    time reproduces the one-shot result exactly (pinned by test; the
    append-ordered-ingestion contract — a late event older than a
    frozen stage time can no longer improve it).  Users with no batch
    events keep their prior row.

    Each stage is either a value of ``stage_col`` (equality match) or a
    ``(name, Column)`` pair with an arbitrary per-event predicate —
    e.g. ``("big_purchase", (col("event_type") == "purchase")
    & (col("value") > 100))``; the two forms mix freely and the pair
    form is what ``funnel_report`` passes through.

    Scale: pre-filter to stage events, ONE shuffle on ``user_col``,
    k unordered-frame window minimums over that single partitioning
    (no sort, no per-user buffer), then a duplicate-drop that reuses
    the partitioning.  Reference shape: the sorted-buffer fold this
    replaces is api_test.clj's defbufferfn-with-:sort idiom.

    ``skew_safe=True`` swaps the window formulation for k sequential
    ``groupBy(user).min`` passes with a join back per stage — more
    shuffles, but every one is either a partial-aggregating hash
    aggregate (map-side combine makes a bot user with 10⁶ events
    harmless) or an equi-join AQE's skew-join splitting can cut; the
    window form's per-user partition is the one thing AQE cannot
    split.  Results are identical (pinned by test + the skewed smoke
    in tools/scaling_smoke_behavior.py).  Use it when a handful of
    users dominate event volume.
    """
    if not stages:
        raise ValueError("funnel_stages: stages must be non-empty")
    # a stage is either a value of ``stage_col`` (equality match) or a
    # ``(name, Column)`` pair with an arbitrary per-event predicate —
    # e.g. ("big_purchase", (col("event_type") == "purchase")
    # & (col("value") > 100))
    named = [(s, None) if not isinstance(s, tuple) else s
             for s in stages]
    names = [n for n, _ in named]
    if len(set(names)) != len(names):
        raise ValueError("funnel_stages: stages must be distinct")
    dt = dict(df.dtypes)[ts_col]
    plain = [n for n, c in named if c is None]
    pre = F.col(stage_col).isin(plain) if plain else F.lit(False)
    for _, c in named:
        if c is not None:
            pre = pre | c
    ev = df.where(pre)
    if skew_safe:
        return _funnel_stages_agg(ev, ts_col, user_col, stage_col,
                                  named, horizon, prior, dt)
    if prior is not None:
        # eqNullSafe: a NULL user key is ONE group to the window
        # partitioning below, so its standing state must fold too
        old = prior.select(
            F.col(user_col).alias("__prior_u"),
            *[F.col(f"ts_{n}").alias(f"__old_{n}") for n in names])
        ev = (ev.join(old, on=[F.col(user_col).eqNullSafe(
                  F.col("__prior_u"))], how="left")
              .drop("__prior_u"))
    w = Window.partitionBy(user_col)
    num = _seconds(F.col(ts_col), dt)
    out = ev
    prev: Column | None = None
    first_num: Column | None = None
    cols = []
    for i, (s, custom) in enumerate(named):
        name = f"ts_{s}"
        cond = (custom if custom is not None
                else F.col(stage_col) == F.lit(s))
        if i > 0:
            cond = cond & prev.isNotNull() & (F.col(ts_col) > prev)
            if horizon is not None:
                cond = cond & (num - first_num <= F.lit(float(horizon)))
        wmin = F.min(F.when(cond, F.col(ts_col))).over(w)
        reach = (F.coalesce(F.col(f"__old_{s}"), wmin)
                 if prior is not None else wmin)
        out = out.withColumn(name, reach)
        prev = F.col(name)
        if i == 0:
            first_num = _seconds(prev, dt)
        cols.append(name)
    reached = reduce(lambda a, b: a + b,
                     [F.col(c).isNotNull().cast("int") for c in cols])
    res = (out.select(user_col, *cols)
           .withColumn("stage_reached", reached)
           .dropDuplicates([user_col]))
    if prior is not None:
        res = res.unionByName(_funnel_untouched(prior, res, user_col))
    return res


def _funnel_untouched(prior: DataFrame, res: DataFrame,
                      user_col: str) -> DataFrame:
    """Prior rows whose user had no batch events (null-safe: a standing
    NULL-user row must not re-enter every batch as a duplicate)."""
    keys = res.select(F.col(user_col).alias("__res_u"))
    return (prior.join(keys, on=[prior[user_col].eqNullSafe(
                F.col("__res_u"))], how="left_anti"))


def _funnel_stages_agg(ev: DataFrame, ts_col: str, user_col: str,
                       stage_col: str, named: list, horizon,
                       prior: DataFrame | None, dt: str) -> DataFrame:
    """``funnel_stages(skew_safe=True)`` body: the chained minima as k
    sequential hash aggregates.  Stage 0 is a plain
    ``groupBy(user).agg(min(when(...)))``; each later stage joins the
    per-user reach frame (1 row/user) back onto the stage events and
    takes the next conditional min.  Partial aggregation absorbs
    per-user row skew; the joins are equi-joins AQE can skew-split."""
    names = [n for n, _ in named]
    if prior is not None:
        old = prior.select(
            F.col(user_col).alias("__prior_u"),
            *[F.col(f"ts_{n}").alias(f"__old_{n}") for n in names])

    def _nsjoin(left, right, rkey, how="inner"):
        # all per-user joins null-safe: the window formulation groups a
        # NULL user key as ONE partition, so this path must too
        return (left.join(right, on=[F.col(user_col).eqNullSafe(
                    F.col(rkey))], how=how).drop(rkey))

    reach: DataFrame | None = None
    for i, (s, custom) in enumerate(named):
        cond = (custom if custom is not None
                else F.col(stage_col) == F.lit(s))
        if i == 0:
            src = ev
        else:
            rsel = reach.select(
                F.col(user_col).alias("__reach_u"),
                F.col(f"ts_{names[i - 1]}"),
                *([F.col(f"ts_{names[0]}")]
                  if horizon is not None and i > 1 else []))
            src = _nsjoin(ev, rsel, "__reach_u")
            prev = F.col(f"ts_{names[i - 1]}")
            cond = cond & prev.isNotNull() & (F.col(ts_col) > prev)
            if horizon is not None:
                first = (prev if i == 1 else F.col(f"ts_{names[0]}"))
                cond = cond & (_seconds(F.col(ts_col), dt)
                               - _seconds(first, dt)
                               <= F.lit(float(horizon)))
        batch_min = F.min(F.when(cond, F.col(ts_col))).alias("__bm")
        nxt = src.groupBy(user_col).agg(batch_min)
        if prior is not None:
            nxt = (_nsjoin(nxt, old.select("__prior_u", f"__old_{s}"),
                           "__prior_u", how="left")
                   .select(F.col(user_col),
                           F.coalesce(F.col(f"__old_{s}"), F.col("__bm"))
                           .alias(f"ts_{s}")))
        else:
            nxt = nxt.select(F.col(user_col),
                             F.col("__bm").alias(f"ts_{s}"))
        if reach is None:
            reach = nxt
        else:
            reach = _nsjoin(
                reach, nxt.withColumnRenamed(user_col, "__nxt_u"),
                "__nxt_u")

    cols = [f"ts_{n}" for n in names]
    reached = reduce(lambda a, b: a + b,
                     [F.col(c).isNotNull().cast("int") for c in cols])
    res = reach.withColumn("stage_reached", reached)
    if prior is not None:
        res = res.unionByName(_funnel_untouched(prior, res, user_col))
    return res


def funnel_report(df: DataFrame, ts_col: str, user_col: str,
                  stage_col: str, stages: list[str | tuple],
                  horizon: float | None = None,
                  skew_safe: bool = False) -> DataFrame:
    """Stage-level funnel summary over ``funnel_stages``: one row per
    stage with the distinct-user reach count, conversion from the
    previous stage, and conversion from stage 0 (both ratios rounded
    to 6, NULL when the denominator is 0).  The k per-stage counts
    collapse into ONE aggregate row (k conditional counts), then
    explode into the report — no second pass over users."""
    per_user = funnel_stages(df, ts_col, user_col, stage_col, stages,
                             horizon=horizon, skew_safe=skew_safe)
    names = [s[0] if isinstance(s, tuple) else s for s in stages]
    agg = per_user.agg(*[
        F.count(F.col(f"ts_{s}")).alias(f"__n{i}")
        for i, s in enumerate(names)])
    rows = F.array(*[
        F.struct(F.lit(i).alias("stage_idx"), F.lit(s).alias("stage"),
                 F.col(f"__n{i}").alias("n_users"),
                 F.round(F.try_divide(
                     F.col(f"__n{i}"),
                     F.col(f"__n{max(i - 1, 0)}")), 6)
                 .alias("conv_from_prev"),
                 F.round(F.try_divide(F.col(f"__n{i}"), F.col("__n0")), 6)
                 .alias("conv_from_first"))
        for i, s in enumerate(names)])
    return (agg.select(F.explode(rows).alias("r"))
            .select("r.stage_idx", "r.stage", "r.n_users",
                    "r.conv_from_prev", "r.conv_from_first"))


def cohort_offset_cols(first_ts: Column, ts: Column,
                       period: str) -> tuple[Column, Column]:
    """(cohort, period_offset) expressions shared by the batch and
    streaming retention paths — ``date_trunc`` semantics, int offsets
    (day: datediff; week: datediff/7, exact because both ends are
    Monday-truncated; month: months_between)."""
    if period not in ("day", "week", "month"):
        raise ValueError(f"retention: period must be day/week/month, "
                         f"got {period!r}")
    cohort = F.date_trunc(period, first_ts)
    bucket = F.date_trunc(period, ts)
    if period == "day":
        off = F.datediff(bucket, cohort)
    elif period == "week":
        off = (F.datediff(bucket, cohort) / F.lit(7)).cast("int")
    else:
        off = F.months_between(bucket, cohort).cast("int")
    return cohort, off.cast("int")


def retention_cohorts(df: DataFrame, ts_col: str, user_col: str,
                      period: str = "week",
                      skew_safe: bool = False) -> DataFrame:
    """Cohort retention: cohort = the ``period`` (``'day'``/``'week'``/
    ``'month'``, ``date_trunc`` semantics — weeks start Monday) of each
    user's FIRST event; a user is retained at offset j when they have
    any event in the cohort period + j.  Output: ``(cohort,
    period_offset, n_active)`` with distinct-user counts — the classic
    triangle matrix, one row per non-empty (cohort, offset) cell.

    Scale: one window min on ``user_col`` (analytic, no row reduction),
    one distinct-count aggregate keyed by (cohort, offset) — two
    shuffles total; no per-user state beyond the window frame.

    ``skew_safe=True`` replaces the window min with a partial-
    aggregating ``groupBy(user).min`` + join back: one more shuffle,
    but immune to a bot user dominating a window partition (the
    aggregate combines map-side; the join AQE can skew-split).
    Identical output."""
    if skew_safe:
        # eqNullSafe join back: the window form treats NULL user keys
        # as ONE partition and still emits their (cohort, offset)
        # cells, so a plain equi-join here would silently drop them
        # and break the "identical output" contract.
        firsts = (df.groupBy(user_col)
                  .agg(F.min(F.col(ts_col)).alias("__first"))
                  .withColumnRenamed(user_col, "__first_u"))
        src = (df.join(firsts, on=[F.col(user_col).eqNullSafe(
                   F.col("__first_u"))])
               .drop("__first_u"))
        first_ts = F.col("__first")
    else:
        src = df
        first_ts = F.min(F.col(ts_col)).over(Window.partitionBy(user_col))
    cohort, off = cohort_offset_cols(first_ts, F.col(ts_col), period)
    return (src.select(F.col(user_col).alias("__u"),
                       cohort.alias("cohort"),
                       off.alias("period_offset"))
            .groupBy("cohort", "period_offset")
            .agg(F.count_distinct(F.col("__u")).alias("n_active"))
            .select("cohort", "period_offset", "n_active"))


def transition_matrix(df: DataFrame, ts_col: str, user_col: str,
                      type_col: str, tie_cols: list[str] | None = None,
                      normalize: bool = True) -> DataFrame:
    """First-order transition statistics over each user's event
    sequence: count consecutive ``(type → next_type)`` pairs in
    ``(ts_col, *tie_cols)`` order, optionally with the per-source
    transition probability (rounded to 6) — the Markov-chain view of
    user behavior (next-action prediction, anomaly baselines).

    ``tie_cols`` must make the per-user order TOTAL (pass the event id;
    without it, equal timestamps would make ``lead`` nondeterministic).

    Scale: one shuffle on ``user_col`` + an ordered window ``lead``,
    then an aggregate on the (|types|²)-sized key space; the probability
    window runs over that tiny aggregate, not the data.

    Skew bound: consecutive-pair semantics need each user's FULL
    ordered sequence in one partition, so a bot user with 10⁶ events is
    one sort partition — there is no salt that preserves ``lead``
    across chunk boundaries without a handover pass.  The window sort
    spills (UnsafeExternalSorter), so the cost is a wall-clock
    straggler, not an OOM; the gated skewed smoke in
    tools/scaling_smoke_behavior.py pins that a user holding ~10% of
    an 8x corpus stays within the scaling gate.  If stragglers bite,
    pre-filter bot users (they poison transition statistics anyway)."""
    order = [F.col(ts_col).asc()] + [F.col(c).asc()
                                     for c in (tie_cols or [])]
    w = Window.partitionBy(user_col).orderBy(*order)
    pairs = (df.withColumn("__next", F.lead(F.col(type_col)).over(w))
             .where(F.col("__next").isNotNull())
             .groupBy(F.col(type_col).alias("from_type"),
                      F.col("__next").alias("to_type"))
             .agg(F.count(F.lit(1)).alias("n")))
    if not normalize:
        return pairs
    tot = Window.partitionBy("from_type")
    return pairs.withColumn(
        "p", F.round(F.col("n") / F.sum("n").over(tot), 6))


def event_ngrams(df: DataFrame, ts_col: str, user_col: str,
                 type_col: str, n: int = 3,
                 tie_cols: list[str] | None = None,
                 min_count: int = 1, sep: str = "->") -> DataFrame:
    """Frequent n-grams of CONSECUTIVE event types per user sequence —
    the k-order generalization of :func:`transition_matrix` (which is
    the ``n=2`` pair view): count every run of ``n`` consecutive
    events in ``(ts_col, *tie_cols)`` order, keyed by the joined type
    string ``t1->t2->…->tn``.  The sequence-pattern miner for behavior
    modeling: which 3-step paths dominate, which never happen.

    ``tie_cols`` must make the per-user order TOTAL (pass the event
    id).  Rows with a NULL type are dropped first (a NULL inside a
    gram would be ambiguous under the string join).  ``min_count``
    prunes the tail (HAVING count >= min_count).

    Output: ``(gram, n_events)`` — the joined gram string and its
    corpus-wide count, deterministic and SQL-oracle-checkable.

    Scale: same shape as ``transition_matrix`` — one shuffle on
    ``user_col``, n−1 ``lead``s over ONE ordered window (one sort),
    then an aggregate on the (|types|^n)-sized key space; the same
    per-user-sequence skew bound applies (see transition_matrix)."""
    if n < 2:
        raise ValueError("event_ngrams: n must be >= 2")
    order = [F.col(ts_col).asc()] + [F.col(c).asc()
                                     for c in (tie_cols or [])]
    w = Window.partitionBy(user_col).orderBy(*order)
    src = df.where(F.col(type_col).isNotNull())
    parts = [F.col(type_col)] + [F.lead(F.col(type_col), i).over(w)
                                 for i in range(1, n)]
    out = src.select(*[p.alias(f"__g{i}")
                       for i, p in enumerate(parts)])
    for i in range(1, n):
        out = out.where(F.col(f"__g{i}").isNotNull())
    counted = (out.groupBy(F.concat_ws(sep, *[F.col(f"__g{i}")
                                              for i in range(n)])
                           .alias("gram"))
               .agg(F.count(F.lit(1)).alias("n_events")))
    if min_count > 1:
        counted = counted.where(F.col("n_events") >= min_count)
    return counted


def decayed_agg(df: DataFrame, ts_col: str, keys: list[str],
                value_col: str | None = None,
                half_life: float = 86400.0,
                at=None, out_col: str = "decayed",
                round_out: bool = True) -> DataFrame:
    """Exponentially time-decayed aggregate per key:
    ``Σ value · 2^(−(T − t)/half_life)`` — the recency-weighted
    engagement/feature signal (a click yesterday counts half as much as
    one today at half_life=1d).  ``value_col=None`` decays a count
    (value 1 per event).  ``T`` is the evaluation instant: pass ``at``
    (datetime or epoch seconds) for reproducible features, or leave
    None for the corpus max timestamp (one 1-row broadcast — NOT now(),
    which would make reruns disagree).

    Scale: one groupBy on ``keys`` — the weight is a pure map-side
    expression, so this composes with incremental maintenance: decayed
    sums SCALE under time shift (``S(T') = S(T)·2^(−(T'−T)/h)``), so a
    standing value folds with a new batch by rescaling, no history
    rescan.  Output rounded to 6 (sum order independence at the
    comparison precision)."""
    if half_life <= 0:
        raise ValueError("decayed_agg: half_life must be > 0")
    dt = dict(df.dtypes)[ts_col]
    num = _seconds(F.col(ts_col), dt)
    val = (F.col(value_col).cast("double") if value_col
           else F.lit(1.0))
    if at is None:
        mx = df.agg(F.max(F.col(ts_col)).alias("__mx"))
        src = df.crossJoin(F.broadcast(mx))
        tref = _seconds(F.col("__mx"), dt)
    else:
        import datetime as _dt

        if isinstance(at, _dt.datetime):
            at = at.timestamp()
        src = df
        tref = F.lit(float(at))
    import math

    lam = math.log(2.0) / float(half_life)
    w = F.exp(F.lit(-lam) * (tref - num))
    total = F.sum(val * w)
    # round_out=False is the STREAMING-FOLD surface: partials must stay
    # unrounded so rescale-and-add folding matches the one-shot sum
    # (round once at read)
    out = F.round(total, 6) if round_out else total
    return (src.groupBy(*[F.col(k) for k in keys])
            .agg(out.alias(out_col)))
