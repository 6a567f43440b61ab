"""Aggregator flavors, secondary sort, buffers, top-k — mirrors
api_test.clj:137-263,450-524,721-783 and the def-op surface
(logic/def.clj, SURVEY.md §2.4/§2.10)."""

import pandas as pd
import pytest

from cascalog_spark import (c, combine, defaggregatefn, defbufferfn,
                            deffilterfn, defmapcatfn, defmapfn, first_n, q,
                            union)
from cascalog_spark.testing import assert_produces

PAIR = [("a", 1), ("a", 3), ("a", 2), ("b", 10), ("b", 5), ("c", 7)]

GENDER_FUZZY = [("alice", "f", 1000), ("alice", "m", 2000),
                ("bob", "m", 1000), ("bob", "m", 3000),
                ("carol", "f", 500)]


@pytest.fixture(autouse=True)
def _dual_strict(monkeypatch):
    """api_test.clj:11-16 fixture analog: every assert_produces in this
    file must ACTUALLY run on both platforms — the silent local-leg skip
    becomes a failure, so a builtin losing its Python mirror (or a new
    Spark-only surface creeping into core coverage) fails loudly."""
    monkeypatch.setenv("CASCALOG_DUAL_STRICT", "1")


def test_avg_and_distinct_count(spark):
    NUM1 = [(1,), (2,), (2,), (3,), (3,), (3,)]
    query = q(["?avg", "?dc"],
              (NUM1, "?n"),
              (c.avg, "?n", ":>", "?avg"),
              (c.distinct_count, "?n", ":>", "?dc"))
    assert_produces(query, spark, [(14 / 6, 3)])


def test_min_max_multi(spark):
    query = q(["?label", "?min", "?max"],
              (PAIR, "?label", "?n"),
              (c.min_agg, "?n", ":>", "?min"),
              (c.max_agg, "?n", ":>", "?max"))
    assert_produces(query, spark,
                    [("a", 1, 3), ("b", 5, 10), ("c", 7, 7)])


def test_limit_per_group_with_sort(spark):
    # c/limit: top-2 smallest n per label (ops.clj:172-206)
    query = q(["?label", "?top"],
              (PAIR, "?label", "?n"),
              (c.limit(2), "?n", ":>", "?top"),
              sort=["?n"])
    assert_produces(query, spark,
                    [("a", 1), ("a", 2), ("b", 5), ("b", 10), ("c", 7)])


def test_limit_rank(spark):
    query = q(["?label", "?top", "?rank"],
              (PAIR, "?label", "?n"),
              (c.limit_rank(1), "?n", ":>", "?top", "?rank"),
              sort=["?n"], reverse=True)
    assert_produces(query, spark,
                    [("a", 3, 1), ("b", 10, 1), ("c", 7, 1)])


def test_buffer_with_secondary_sort(spark):
    # latest-record dedup (gender-fuzzy fixture, api_test.clj:247-263):
    # buffer sees the group sorted by timestamp descending, emits first row
    @defbufferfn(returns=["string"], n_out=1)
    def latest_gender(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"g": [pdf.iloc[0, 0]]})

    query = q(["?person", "?gender"],
              (GENDER_FUZZY, "?person", "?g", "?ts"),
              (latest_gender, "?g", ":>", "?gender"),
              sort=["?ts"], reverse=True)
    assert_produces(query, spark,
                    [("alice", "m"), ("bob", "m"), ("carol", "f")])


def test_sequential_aggregator(spark):
    # defaggregatefn: evens-vs-odds style custom fold (api_test.clj:172-191)
    sum_of_squares = defaggregatefn(
        init=lambda: 0,
        step=lambda acc, n: acc + n * n,
        final=lambda acc: acc,
        returns="bigint", name="sum-sq")
    query = q(["?label", "?ssq"],
              (PAIR, "?label", "?n"),
              (sum_of_squares, "?n", ":>", "?ssq"))
    assert_produces(query, spark,
                    [("a", 14), ("b", 125), ("c", 49)])


def test_mixed_native_and_sequential_agg(spark):
    squares = defaggregatefn(
        init=lambda: 0, step=lambda acc, n: acc + n * n,
        returns="bigint", name="sum-sq")
    query = q(["?label", "?ssq", "?cnt"],
              (PAIR, "?label", "?n"),
              (squares, "?n", ":>", "?ssq"),
              (c.count, "?cnt"))
    assert_produces(query, spark,
                    [("a", 14, 3), ("b", 125, 2), ("c", 49, 1)])


def test_global_buffer(spark):
    @defbufferfn(returns=["bigint"], n_out=1)
    def total(pdf):
        return pd.DataFrame({"t": [int(pdf.iloc[:, 0].sum())]})

    query = q(["?total"],
              (PAIR, "?label", "?n"),
              (total, "?n", ":>", "?total"))
    assert_produces(query, spark, [(28,)])


def test_defmapfn_custom_udf(spark):
    @defmapfn(returns="bigint")
    def square(n):
        return n * n

    query = q(["?label", "?sq"],
              (PAIR, "?label", "?n"),
              (square, "?n", ":>", "?sq"))
    assert_produces(query, spark,
                    [(l, n * n) for l, n in PAIR])


def test_defmapcatfn_custom_udtf(spark):
    @defmapcatfn(returns="string")
    def chars(s):
        return list(s)

    query = q(["?ch", "?cnt"],
              ([("ab",), ("bc",)], "?s"),
              (chars, "?s", ":>", "?ch"),
              (c.count, "?cnt"))
    assert_produces(query, spark, [("a", 1), ("b", 2), ("c", 1)])


def test_deffilterfn_custom(spark):
    @deffilterfn
    def is_vowel_start(s):
        return s[0] in "aeiou"

    query = q(["?label"],
              (PAIR, "?label", "_"),
              (is_vowel_start, "?label"), distinct=True)
    assert_produces(query, spark, [("a",)])


def test_multi_out_mapfn(spark):
    @defmapfn(returns=["bigint", "bigint"], n_out=2)
    def minmax2(a, b):
        return (min(a, b), max(a, b))

    query = q(["?mn", "?mx"],
              ([(3, 1), (2, 5)], "?a", "?b"),
              (minmax2, "?a", "?b", ":>", "?mn", "?mx"))
    assert_produces(query, spark, [(1, 3), (2, 5)])


def test_combine_and_union(spark):
    A = [(1,), (2,)]
    B = [(2,), (3,)]
    qa = q(["?n"], (A, "?n"))
    qb = q(["?n"], (B, "?n"))
    both = q(["?n"], (combine(qa, qb), "?n"))
    assert_produces(both, spark, [(1,), (2,), (2,), (3,)])
    uni = q(["?n"], (union(qa, qb), "?n"))
    assert_produces(uni, spark, [(1,), (2,), (3,)])
    # run-union-combine-tests (cascading_api_test.clj:228-258) verbatim:
    # raw vectors as inputs, 1/2/3-ary forms
    v1, v2, v3 = [(1,), (2,), (3,)], [(3,), (4,), (5,)], [(2,), (4,), (6,)]
    assert_produces(q(["?n"], (union(v1, v2), "?n")), spark,
                    [(1,), (2,), (3,), (4,), (5,)])
    assert_produces(q(["?n"], (union(v1, v2, v3), "?n")), spark,
                    [(1,), (2,), (3,), (4,), (5,), (6,)])
    assert_produces(q(["?n"], (union(v2), "?n")), spark,
                    [(3,), (4,), (5,)])
    assert_produces(q(["?n"], (combine(v1, v3), "?n")), spark,
                    [(1,), (2,), (3,), (2,), (4,), (6,)])
    assert_produces(q(["?n"], (combine(v1, v2, v3), "?n")), spark,
                    [(1,), (2,), (3,), (3,), (4,), (5,), (2,), (4,), (6,)])


def test_first_n(spark):
    src = q(["?label", "?n"], (PAIR, "?label", "?n"))
    top = first_n(src, 2, sort="?n", reverse=True)
    query = q(["?label", "?n"], (top, "?label", "?n"))
    assert_produces(query, spark, [("b", 10), ("c", 7)])


def test_fixed_sample(spark):
    query = q(["?l2", "?n2"],
              (PAIR, "?label", "?n"),
              (c.fixed_sample(3), "?label", "?n", ":>", "?l2", "?n2"))
    # global sample of 3 rows, values must come from PAIR
    rows = query.run(spark)
    assert len(rows) == 3
    assert all(r in PAIR for r in rows)


def test_var_stats(spark):
    NUM1 = [(1.0,), (2.0,), (3.0,), (4.0,)]
    query = q(["?var", "?svar"],
              (NUM1, "?n"),
              (c.var_pop, "?n", ":>", "?var"),
              (c.var_samp, "?n", ":>", "?svar"))
    assert_produces(query, spark, [(1.25, 5 / 3)], approx=True)


def test_post_agg_division(spark):
    # c/avg as predmacro composition: count+sum+div (ops.clj:228-240)
    query = q(["?label", "?mean"],
              (PAIR, "?label", "?n"),
              (c.sum_agg, "?n", ":>", "?s"),
              (c.count, "?cnt"),
              (c.div, "?s", "?cnt", ":>", "?mean"))
    assert_produces(query, spark,
                    [("a", 2.0), ("b", 7.5), ("c", 7.0)])


def test_mixed_sequential_and_expr_agg(spark):
    """Hybrid grouping: a Python sequential agg + expr-only builtins
    (collect_list has no pandas fallback) in ONE grouping — native side
    keeps partial aggregation, results joined on the group key."""
    from cascalog_spark.ops import defaggregatefn

    agg_sum = defaggregatefn(init=lambda: 0, step=lambda a, x: a + x,
                             final=lambda a: a, returns=["bigint"],
                             name="mysum")
    data = [(1, 10), (1, 20), (2, 30)]
    res = q(["?k", "?s", "?lst"], (data, "?k", "?v"),
            (agg_sum, "?v", ":>", "?s"),
            (c.collect_list, "?v", ":>", "?lst")).run(spark)
    assert sorted((k, s, sorted(l)) for k, s, l in res) == \
        [(1, 30, [10, 20]), (2, 30, [30])]


def test_mixed_agg_null_group_key(spark):
    """Hybrid join must be null-safe: a null !x group key is a real group."""
    from cascalog_spark.ops import defaggregatefn

    agg_sum = defaggregatefn(init=lambda: 0, step=lambda a, x: a + x,
                             final=lambda a: a, returns=["bigint"],
                             name="mysum")
    data = [(None, 1), (None, 2), (3, 9)]
    res = q(["!k", "?s", "?mn"],
            (spark.createDataFrame(data, "k int, v int"),
             {"k": "!k", "v": "?v"}),
            (agg_sum, "?v", ":>", "?s"),
            (c.min_agg, "?v", ":>", "?mn")).run(spark)
    assert sorted(res, key=lambda t: (t[0] is not None, t)) == \
        [(None, 3, 1), (3, 9, 9)]


def test_sequential_agg_constant_infield(spark):
    """Constants in aggregator input position reach the step fn
    (operations.clj:684-707 with-constants)."""
    from cascalog_spark.ops import defaggregatefn

    addk = defaggregatefn(init=lambda: 0, step=lambda a, x, k: a + x * k,
                          final=lambda a: a, returns=["bigint"], name="addk")
    data = [(1, 10), (1, 20), (2, 30)]
    res = q(["?k", "?s"], (data, "?k", "?v"),
            (addk, "?v", 2, ":>", "?s")).run(spark)
    assert sorted(res) == [(1, 60), (2, 60)]


# ---------------------------------------------------------------------------
# general defparallelbuf (reference logic/def.clj:109-135, ParallelBuffer)


def _spread_pbuf():
    from cascalog_spark.ops import defparallelbuf

    return defparallelbuf(
        init=lambda v: (v, v, 1),
        combine=lambda a, b: (min(a[0], b[0]), max(a[1], b[1]), a[2] + b[2]),
        buffer=lambda inters: [(
            max(i[1] for i in inters) - min(i[0] for i in inters),
            sum(i[2] for i in inters))],
        inter_returns=["double", "double", "long"],
        returns=["double", "long"], n_out=2, name="spread")


def test_parallelbuf_grouped(spark):
    rows = [("a", 1.0), ("a", 5.0), ("a", 2.0), ("b", 10.0), ("b", 4.0)]
    res = q(["?k", "?spread", "?cnt"], (rows, "?k", "?v"),
            (_spread_pbuf(), "?v", ":>", "?spread", "?cnt")).run(spark)
    assert sorted(res) == [("a", 4.0, 3), ("b", 6.0, 2)]


def test_parallelbuf_global(spark):
    rows = [("a", 1.0), ("a", 5.0), ("b", 10.0), ("b", 4.0)]
    res = q(["?spread", "?cnt"], (rows, "?k", "?v"),
            (_spread_pbuf(), "?v", ":>", "?spread", "?cnt")).run(spark)
    assert res == [(9.0, 4)]


def test_parallelbuf_present_and_multirow_buffer(spark):
    """present runs map-side after the partition fold (the reference's
    extract fn); the buffer may emit multiple rows (limit-style)."""
    from cascalog_spark.ops import defparallelbuf

    top2 = defparallelbuf(
        init=lambda v: ([v],),
        combine=lambda a, b: (sorted(a[0] + b[0], reverse=True)[:2],),
        present=lambda a: (sorted(a[0], reverse=True)[:2],),
        buffer=lambda inters: [(x,) for x in
                               sorted((v for i in inters for v in i[0]),
                                      reverse=True)[:2]],
        inter_returns=["array<double>"], returns=["double"], name="top2")
    rows = [("a", 1.0), ("a", 5.0), ("a", 2.0), ("b", 10.0), ("b", 4.0)]
    res = q(["?k", "?t"], (rows, "?k", "?v"),
            (top2, "?v", ":>", "?t")).run(spark)
    assert sorted(res) == [("a", 2.0), ("a", 5.0), ("b", 4.0), ("b", 10.0)]


def test_parallelbuf_cannot_mix_with_aggs():
    import pytest

    with pytest.raises(ValueError, match="aggregators and buffers"):
        q(["?k", "?s", "?n"], ([("a", 1.0)], "?k", "?v"),
          (_spread_pbuf(), "?v", ":>", "?s", "_"),
          (c.count, "?n"))


def test_parallelbuf_shuffle_is_partial(spark):
    """The exchange carries stage-1 intermediates (one row per partition ×
    key), not input rows — check the plan shuffles AFTER the first
    mapInPandas."""
    rows = [("k%d" % (i % 3), float(i)) for i in range(1000)]
    df = q(["?k", "?spread", "?cnt"], (rows, "?k", "?v"),
           (_spread_pbuf(), "?v", ":>", "?spread", "?cnt")).to_df(spark)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # two python map stages: partial (MapInPandas) then grouped buffer
    assert "MapInPandas" in plan and "FlatMapGroupsInPandas" in plan
    rows_out = [tuple(r) for r in df.collect()]
    assert len(rows_out) == 3


# ---------------------------------------------------------------------------
# defbufferiterfn (logic/def.clj:86-88; api_test.clj:453-468 iterator spec)


def test_bufferiter_streaming_running_sum(spark):
    from cascalog_spark.ops import defbufferiterfn

    @defbufferiterfn(returns=["double"], name="running_sum")
    def running_sum(rows):
        acc = 0.0
        for (v,) in rows:
            acc += v
            yield (acc,)

    rows = [("a", 3.0), ("a", 1.0), ("a", 2.0), ("b", 10.0), ("b", 4.0)]
    res = q(["?k", "?rs"], (rows, "?k", "?v"),
            (running_sum, "?v", ":>", "?rs"), sort=["?v"]).run(spark)
    assert sorted(res) == [("a", 1.0), ("a", 3.0), ("a", 6.0),
                           ("b", 4.0), ("b", 14.0)]


def test_bufferiter_null_group_key(spark):
    from cascalog_spark.ops import defbufferiterfn

    @defbufferiterfn(returns=["bigint"], name="cnt")
    def cnt(rows):
        yield (sum(1 for _ in rows),)

    rows = [(None, 1.0), (None, 2.0), ("x", 5.0)]
    res = q(["!k", "?n"], (rows, "!k", "?v"),
            (cnt, "?v", ":>", "?n")).run(spark)
    assert sorted(res, key=str) == sorted([(None, 2), ("x", 1)], key=str)


def test_bufferiter_group_spanning_arrow_batches(spark):
    """A group larger than one Arrow batch streams through — the iterator
    spans batch boundaries without materializing the group (the reference
    iterator-leak regression, api_test.clj:453-468)."""
    from cascalog_spark.ops import defbufferiterfn

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "100")
    try:
        @defbufferiterfn(returns=["bigint", "double"], n_out=2, name="cl")
        def cnt_last(rows):
            n, last = 0, None
            for (v,) in rows:
                n += 1
                last = v
            yield (n, last)

        big = [("g", float(i)) for i in range(1000)] + [("h", 1.0)]
        res = q(["?k", "?n", "?last"], (big, "?k", "?v"),
                (cnt_last, "?v", ":>", "?n", "?last"),
                sort=["?v"]).run(spark)
        assert sorted(res) == [("g", 1000, 999.0), ("h", 1, 1.0)]
    finally:
        if old is not None:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)


def test_bufferiter_prefix_assoc_equivalence(spark):
    """prefix_assoc=True (two-pass parallel prefix scan) produces exactly
    the exact streaming path's output — incl. null group keys, ties on
    the first sort column, and negative increments."""
    import random

    from cascalog_spark.ops import defbufferiterfn

    def mk(prefix):
        @defbufferiterfn(returns=["bigint", "bigint"], n_out=2,
                         name="rsum", prefix_assoc=prefix)
        def rsum(rows):
            acc = 0
            for i, v in rows:
                acc += v
                yield (i, acc)
        return rsum

    rng = random.Random(11)
    rows = [(rng.choice(["a", "b", None]), i, rng.randrange(-50, 100))
            for i in range(3000)]
    # heavy first-sort-key ties: i // 10 collides 10 rows per value
    rows = [(k, i // 10, i, v) for k, (i, v) in
            ((k, (i, v)) for (k, i, v) in rows for _ in [0])]

    def run(prefix):
        return q(["!k", "?i2", "?rs"],
                 (rows, "!k", "?t", "?i", "?v"),
                 (mk(prefix), "?i", "?v", ":>", "?i2", "?rs"),
                 sort=["?t", "?i"]).run(spark)

    assert sorted(run(False), key=str) == sorted(run(True), key=str)


def test_bufferiter_prefix_assoc_global_group(spark):
    """Global (no group vars) prefix scan — one logical group split
    across blocks, carry chain across all of them."""
    from cascalog_spark.ops import defbufferiterfn

    @defbufferiterfn(returns=["bigint", "bigint"], n_out=2,
                     name="gsum", prefix_assoc=True)
    def gsum(rows):
        acc = 0
        for (i, v) in rows:
            acc += v
            yield (i, acc)

    rows = [(i, 1) for i in range(500)]
    res = q(["?i2", "?rs"], (rows, "?i", "?v"),
            (gsum, "?i", "?v", ":>", "?i2", "?rs"),
            sort=["?i"]).run(spark)
    assert sorted(res) == [(i, i + 1) for i in range(500)]


def test_bufferiter_prefix_assoc_requires_sort(spark):
    from cascalog_spark.ops import defbufferiterfn

    @defbufferiterfn(returns=["bigint"], name="c", prefix_assoc=True)
    def c_(rows):
        yield (sum(1 for _ in rows),)

    import pytest as _pt
    with _pt.raises(ValueError, match="requires :sort"):
        q(["?k", "?n"], ([("a", 1.0)], "?k", "?v"),
          (c_, "?v", ":>", "?n")).to_df(spark)


def test_bufferiter_plan_has_no_grouped_map(spark):
    """The streaming path is mapInPandas after an explicit repartition —
    no FlatMapGroupsInPandas (whole-group materialization) in the plan."""
    from cascalog_spark.ops import defbufferiterfn

    @defbufferiterfn(returns=["bigint"], name="cnt")
    def cnt(rows):
        yield (sum(1 for _ in rows),)

    df = q(["?k", "?n"], ([("a", 1.0)], "?k", "?v"),
           (cnt, "?v", ":>", "?n")).to_df(spark)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan
    assert "FlatMapGroupsInPandas" not in plan


def test_megagroup_skewed_agg_and_buffers(spark):
    """VERDICT r1 #9: one group holds >50% of all rows (the megagroup).
    Native aggs must stay partial (map-side combine bounds the skewed
    reducer's input to one partial per map partition); the streaming
    buffer-iter path must walk the megagroup across many small Arrow
    batches without materializing it.  200k rows, 60% under one key."""
    from cascalog_spark.ops import defbufferiterfn

    n = 200_000
    df = (spark.range(n)
          .selectExpr("CASE WHEN id % 10 < 6 THEN 'mega' "
                      "ELSE concat('k', id % 10) END AS k",
                      "CAST(id AS BIGINT) AS v"))

    # native agg over the skewed key: count + sum, partial-agg plan
    agg = q(["?k", "?cnt", "?sum"], (df, "?k", "?v"),
            (c.count, "?cnt"), (c.sum_agg, "?v", ":>", "?sum"))
    adf = agg.to_df(spark)
    plan = adf._jdf.queryExecution().executedPlan().toString()
    assert "partial" in plan.lower()  # map-side combine survives the skew
    rows = {r[0]: (r[1], r[2]) for r in adf.collect()}
    mega_n = sum(1 for i in range(10) if i < 6) * (n // 10)
    assert rows["mega"][0] == mega_n == 120_000
    assert sum(v[0] for v in rows.values()) == n

    # streaming buffer-iter over the same skew: the 120k-row megagroup
    # spans many 1k-row Arrow batches; the op sees ONE lazy iterator
    @defbufferiterfn(returns=["bigint", "bigint"], n_out=2)
    def count_and_last(it):
        cnt, last = 0, None
        for (v,) in it:
            cnt += 1
            last = v
        yield (cnt, last)

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "1000")
    try:
        bq = q(["?k", "?cnt", "?last"], (df, "?k", "?v"),
               (count_and_last, "?v", ":>", "?cnt", "?last"),
               sort=["?v"])
        brows = {r[0]: (r[1], r[2]) for r in bq.to_df(spark).collect()}
    finally:
        if old is None:
            spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
        else:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    assert brows["mega"][0] == 120_000
    # secondary sort: last value of the ascending walk is the group max
    assert brows["mega"][1] == max(i for i in range(n) if (i % 10) < 6)
    assert sum(v[0] for v in brows.values()) == n


def test_reference_name_agg_aliases(spark):
    """c.sum/c.min/c.max are the Cascalog op names (ops.clj); Python's own
    max/min builtins as predicates still lift to scalar greatest/least."""
    res = q(["?label", "?s", "?lo", "?hi"],
            (PAIR, "?label", "?n"),
            (c.sum, "?n", ":>", "?s"),
            (c.min, "?n", ":>", "?lo"),
            (c.max, "?n", ":>", "?hi")).run(spark)
    assert sorted(res) == [("a", 6, 1, 3), ("b", 15, 5, 10), ("c", 7, 7, 7)]

    scalar = q(["?m"], ([(1, 5), (7, 2)], "?x", "?y"),
               (max, "?x", "?y", ":>", "?m")).run(spark)
    assert sorted(scalar) == [(5,), (7,)]


def test_percentile_aggregator(spark):
    """c.percentile: exact interpolated order statistic as a DSL agg,
    multi-agg-compatible with the monoid set."""
    data = [("a", float(v)) for v in range(1, 5)] + [("b", 10.0)]
    res = q(["?k", "?med", "?n"],
            (data, "?k", "?v"),
            (c.percentile(0.5), "?v", ":>", "?med"),
            (c.count, "?n")).run(spark)
    assert sorted(res) == [("a", 2.5, 4), ("b", 10.0, 1)]

    import pytest as _pytest
    with _pytest.raises(ValueError, match="must be in"):
        c.percentile(1.5)


def test_fixed_sample_deterministic_global_and_grouped(spark):
    rows = [(f"g{i % 3}", i) for i in range(60)]
    def run_once(seed):
        query = q(["?l2", "?n2"],
                  (rows, "?label", "?n"),
                  (c.fixed_sample_deterministic(5, seed=seed),
                   "?label", "?n", ":>", "?l2", "?n2"))
        return sorted(query.run(spark))
    a, b = run_once(7), run_once(7)
    assert a == b, "same seed must select the same set"
    assert len(a) == 5 and all(tuple(r) in rows for r in a)
    assert run_once(8) != a, "different seed draws a different set"
    # grouped: n per group, still deterministic
    grouped = q(["?label", "?s"],
                (rows, "?label", "?n"),
                (c.fixed_sample_deterministic(4, seed=3), "?n", ":>", "?s"))
    g1, g2 = sorted(grouped.run(spark)), sorted(grouped.run(spark))
    assert g1 == g2
    from collections import Counter
    per = Counter(l for l, _ in g1)
    assert per == {"g0": 4, "g1": 4, "g2": 4}


def test_approx_percentile_bounds_exact(spark):
    """GK-sketch percentile stays within rank-error bounds of the exact
    aggregator on a skewed value distribution, per group and globally."""
    rows = [(f"g{i % 2}", float(i * i % 997)) for i in range(2000)]
    query = q(["?g", "?exact", "?approx"],
              (rows, "?g", "?v"),
              (c.percentile(0.9), "?v", ":>", "?exact"),
              (c.approx_percentile(0.9), "?v", ":>", "?approx"))
    for g, exact, approx in query.run(spark):
        # rank error 1/accuracy -> value error bounded by neighborhood;
        # generous tolerance still catches a broken sketch wiring
        assert abs(approx - exact) <= 50.0, (g, exact, approx)
    import pytest
    with pytest.raises(ValueError, match="p must be"):
        c.approx_percentile(1.5)


def test_hll_sketch_merge_pipeline(spark):
    """Mergeable HLL distinct-count sketches through the DSL: per-day
    sketches union to the same estimate as a one-shot sketch over the
    full data — the store-sketches-not-rescans pattern."""
    from cascalog_spark import c, q

    rows = [(d, u) for d in (1, 2, 3) for u in range(d * 10, d * 10 + 20)]
    df = spark.createDataFrame(rows, "day int, user int")
    # exact distinct across days: users 10..49 → 40
    daily = q(["?day", "?sk"],
              (df, {"day": "?day", "user": "?u"}),
              (c.hll_sketch, "?u", ":>", "?sk"))
    merged = q(["?n"],
               (daily, "?day", "?sk"),
               (c.hll_union, "?sk", ":>", "?m"),
               (c.hll_estimate, "?m", ":>", "?n"))
    est = merged.run(spark)[0][0]
    exact = df.select("user").distinct().count()
    assert exact == 40
    assert abs(est - exact) <= max(2, exact * 0.05)
    # one-shot sketch agrees with the merged-sketch estimate
    oneshot = q(["?n"],
                (df, {"user": "?u"}),
                (c.hll_sketch, "?u", ":>", "?sk"),
                (c.hll_estimate, "?sk", ":>", "?n")).run(spark)[0][0]
    assert oneshot == est


def test_complex_noncomplex_agg_mix_reference_parity(spark):
    """api_test.clj:172-191 verbatim: TWO native combiner aggs (count,
    sum) and one sequential defaggregatefn (evens-vs-odds fold) in the
    SAME grouping — the hybrid compilation path."""
    from cascalog_spark.ops import defaggregatefn

    evens_vs_odds = defaggregatefn(
        init=lambda: 0,
        step=lambda ctx, v: ctx - 1 if v % 2 == 1 else ctx + 1,
        final=lambda ctx: (ctx,),
        returns="bigint", name="evens-vs-odds")

    num = [("a", 1), ("a", 2), ("a", 5), ("c", 6), ("d", 9), ("a", 12),
           ("c", 16), ("e", 16)]
    res = q(["?a", "?c", "?e", "?s"],
            (num, "?a", "?n"),
            (c.count, "?c"),
            (c.sum_agg, "?n", ":>", "?s"),
            (evens_vs_odds, "?n", ":>", "?e")).run(spark)
    assert sorted(res) == [("a", 4, 0, 20), ("c", 2, 2, 22),
                           ("d", 1, -1, 9), ("e", 1, 1, 16)]


def test_defops_reference_cases(spark):
    """defops_test.clj + def_test.clj ported: decorated ops stay callable
    as plain Python fns (def_test.clj:23-31), higher-order op factories
    close over params (ident-stateful, defops_test.clj:28-45), identity
    map ops are transparent (defops-arg-parsing-test), and a multi-input
    parallel agg fuses to one native expression (agg-test,
    defops_test.clj:68-87)."""
    from pyspark.sql import functions as F

    from cascalog_spark.ops import defparallelagg

    @defmapfn(returns="bigint", name="plus-two")
    def plus_two(x):
        return x + 2

    # "operations defined with def*fn work as normal functions."
    assert plus_two(2) == 4

    # "Higher order mapfns work normally" / ident-stateful closure
    def ident_stateful(y):
        state = 3

        @defmapfn(returns="bigint", name="ident-stateful")
        def fn(x):
            return x + y + state

        return fn

    assert ident_stateful(2)(4) == 9  # callable as a plain fn too
    src = [(1,), (2,)]
    query = q(["?y"], (src, "?x"), (ident_stateful(1), "?x", ":>", "?y"))
    assert_produces(query, spark, [(5,), (6,)])

    # identity op is a transparent transformation (ident/-doc/-meta/-both)
    @defmapfn(returns="bigint", name="ident")
    def ident(x):
        """Identity operation."""
        return x

    assert ident.py_fn.__doc__ == "Identity operation."  # doc preserved
    assert_produces(q(["?y"], (src, "?x"), (ident, "?x", ":>", "?y")),
                    spark, src)

    # agg-test: init 5-arg → state, combine → one ?sum; natively ONE
    # fused agg expression (map-side partials for free)
    @defparallelagg(pandas_fn=lambda pdf: int(
        (pdf["_0"] + pdf["_1"] + pdf["_2"]).sum()
        + (pdf["_3"] + pdf["_4"]).sum()))
    def multi_combine(a, b, c_, d, e):
        return F.sum(a + b + c_) + F.sum(d + e)

    srcw = [(1, 2, 3, 4, 5), (5, 6, 7, 8, 9)]
    query = q(["?sum"],
              (srcw, "?a", "?b", "?c", "?d", "?e"),
              (multi_combine, "?a", "?b", "?c", "?d", "?e", ":>", "?sum"))
    assert_produces(query, spark, [(50,)])


def test_nullable_agg_and_multi_parallel_agg(spark):
    """api_test.clj:526-531 (nullable agg output var) and :553-565
    (multi-in/multi-out defparallelagg, alone and mixed with a
    sequential fold in one grouping)."""
    from pyspark.sql import functions as F

    from cascalog_spark import defaggregatefn
    from cascalog_spark.ops import ParallelAgg

    follows = [("a", "b"), ("b", "c"), ("a", "c")]
    qr = q(["?p", "!c"], (follows, "?p", "_"), (c.count, "!c"))
    assert_produces(qr, spark, [("a", 2), ("b", 1)])

    # multipagg: init (v1,v2,v3)->(v1, v2+v3); combine col-wise (+, *)
    multipagg = ParallelAgg(
        name="multipagg", n_out=2,
        expr_fn=lambda a, b, cc: [F.sum(a), F.product(b + cc)])
    vals = [(1, 2, 3), (4, 5, 6), (7, 8, 9)]
    qr = q(["?d", "?e", "?count"],
           (vals, "?a", "?b", "?c"),
           (multipagg, "?a", "?b", "?c", ":>", "?d", "?e"),
           (c.count, "?count"))
    got = qr.run(spark)
    assert [(int(d), int(e), n) for d, e, n in got] == [(12, 935, 3)]

    slow_count = defaggregatefn(
        init=lambda: 0, step=lambda acc, v: acc + 1,
        final=lambda acc: acc, returns="bigint", name="slow-count")
    qr = q(["?d", "?e", "?count2"],
           (vals, "?a", "?b", "?c"),
           (multipagg, "?a", "?b", "?c", ":>", "?d", "?e"),
           (slow_count, "?c", ":>", "?count2"))
    got = qr.run(spark)
    assert [(int(d), int(e), n) for d, e, n in got] == [(12, 935, 3)]


def test_variance_numerically_stable_on_shifted_data(spark):
    """Port of cascalog-math stats_test.clj:33-58: the reference's naive
    E[x2]-E[x]2 `variance` catastrophically cancels on uniform samples
    in [1e9, 1e9+1] (it documents 256.0 against a true ~0.0996!) and
    ships `sample-variance-parallel` as the stable alternative.  Spark's
    var_pop/var_samp are single-pass STABLE (Welford-style merge), so
    the engine's one variance surface must nail the adversarial case the
    reference's default gets wrong."""
    import random
    import statistics
    rng = random.Random(1234)
    vals = [(1_000_000_000 + rng.random(),) for _ in range(100)]
    query = q(["?var", "?svar"],
              (vals, "?n"),
              (c.var_pop, "?n", ":>", "?var"),
              (c.var_samp, "?n", ":>", "?svar"))
    rows = [tuple(r) for r in query.run(spark)]
    got_pop, got_samp = rows[0]
    data = [v[0] for v in vals]
    want_samp = statistics.variance(data)
    want_pop = statistics.pvariance(data)
    assert abs(got_samp - want_samp) / want_samp < 1e-6
    assert abs(got_pop - want_pop) / want_pop < 1e-6
    # the single-element edge cases from the reference battery
    one = q(["?v"], ([(0.0,)], "?n"), (c.var_pop, "?n", ":>", "?v"))
    assert [tuple(r) for r in one.run(spark)] == [(0.0,)]
    two = q(["?v"], ([(0.0,), (1.0,)], "?n"),
            (c.var_samp, "?n", ":>", "?v"))
    assert [tuple(r) for r in two.run(spark)] == [(0.5,)]
