"""Core query semantics — mirrors the reference's golden-output suite
(cascalog-core/test/cascalog/api_test.clj).  Expected tuples are taken from
the same scenarios; comparison is multiset + doublify, exactly like
logic/testing.clj.
"""

import pytest

from cascalog_spark import c, q
from cascalog_spark.testing import assert_produces

AGE = [("alice", 28), ("bob", 33), ("chris", 40), ("david", 25),
       ("emily", 25), ("george", 31), ("gary", 28), ("kumar", 27),
       ("luanne", 36)]

PERSON = [("alice",), ("bob",), ("chris",), ("david",), ("emily",),
          ("gary",), ("george",), ("harold",), ("kumar",), ("luanne",)]

FOLLOWS = [("alice", "david"), ("alice", "bob"), ("alice", "emily"),
           ("bob", "david"), ("bob", "george"), ("bob", "luanne"),
           ("david", "alice"), ("david", "luanne"),
           ("emily", "alice"), ("emily", "bob"), ("emily", "george"),
           ("emily", "gary"), ("george", "gary"),
           ("harold", "bob"), ("luanne", "harold"), ("luanne", "gary")]

GENDER = [("alice", "f"), ("bob", "m"), ("chris", "m"), ("david", "m"),
          ("emily", "f"), ("george", "m"), ("gary", "m"), ("harold", "m"),
          ("luanne", "f")]

SENTENCE = [("this is a sentence",), ("sentence with this is words",)]

INTEGER = [(-1,), (0,), (1,), (2,), (3,), (4,), (5,), (6,), (7,), (8,), (9,)]

NUM_PAIR = [(1, 1), (1, 2), (2, 2), (3, 4)]


@pytest.fixture(autouse=True)
def _dual_strict(monkeypatch):
    """api_test.clj:11-16 fixture analog: every assert_produces in this
    file must ACTUALLY run on both platforms — the silent local-leg skip
    becomes a failure, so a builtin losing its Python mirror (or a new
    Spark-only surface creeping into core coverage) fails loudly."""
    monkeypatch.setenv("CASCALOG_DUAL_STRICT", "1")


def test_young_people(spark):
    # api_test.clj:42-52 "young people" — filter by comparison
    query = q(["?person", "?age"],
              (AGE, "?person", "?age"),
              (c.lt, "?age", 30))
    assert_produces(query, spark,
                    [("alice", 28), ("david", 25), ("emily", 25),
                     ("gary", 28), ("kumar", 27)])


def test_wordcount(spark):
    # api_test.clj:121-135 word count: mapcat split + count
    query = q(["?word", "?count"],
              (SENTENCE, "?s"),
              (c.split(), "?s", ":>", "?word"),
              (c.count, "?count"))
    assert_produces(query, spark,
                    [("this", 2), ("is", 2), ("a", 1), ("sentence", 2),
                     ("with", 1), ("words", 1)])


def test_map_op_native(spark):
    query = q(["?person", "?double_age"],
              (AGE, "?person", "?age"),
              (c.mult, "?age", 2, ":>", "?double_age"))
    assert_produces(query, spark, [(p, a * 2) for p, a in AGE])


def test_implicit_join(spark):
    # join age × gender on ?person (api_test.clj:66-84)
    query = q(["?person", "?age", "?gender"],
              (AGE, "?person", "?age"),
              (GENDER, "?person", "?gender"),
              (c.lt, "?age", 30))
    assert_produces(query, spark,
                    [("alice", 28, "f"), ("david", 25, "m"),
                     ("emily", 25, "f"), ("gary", 28, "m")])


def test_three_way_join_and_agg(spark):
    # follower counts of the people someone follows
    query = q(["?person", "?num_follows"],
              (FOLLOWS, "?person", "_"),
              (c.count, "?num_follows"))
    expected = {}
    for a, _ in FOLLOWS:
        expected[a] = expected.get(a, 0) + 1
    assert_produces(query, spark, list(expected.items()))


def test_self_join(spark):
    # mutual follows (cascading_api_test.clj:147-161 self-join)
    query = q(["?p1", "?p2"],
              (FOLLOWS, "?p1", "?p2"),
              (FOLLOWS, "?p2", "?p1"))
    fset = set(FOLLOWS)
    expected = [(a, b) for a, b in fset if (b, a) in fset]
    assert_produces(query, spark, expected)


def test_multi_agg_same_grouping(spark):
    # api_test.clj:137-145 multiple aggregators share one grouping +
    # post-agg op over agg outputs
    VALUE = [("a", 1), ("a", 2), ("b", 10), ("c", 3), ("b", 2), ("a", 41)]
    query = q(["?label", "?sum", "?count", "?s2"],
              (VALUE, "?label", "?n"),
              (c.sum_agg, "?n", ":>", "?sum"),
              (c.count, "?count"),
              (c.add, "?sum", "?count", ":>", "?s2"))
    assert_produces(query, spark,
                    [("a", 44, 3, 47), ("b", 12, 2, 14), ("c", 3, 1, 4)])


def test_global_agg(spark):
    # api_test.clj:159-170 global aggregation (no group keys)
    query = q(["?sum"],
              (INTEGER, "?n"),
              (c.sum_agg, "?n", ":>", "?sum"))
    assert_produces(query, spark, [(44,)])


def test_distinct_option(spark):
    DUP = [(1, 2), (1, 2), (3, 4)]
    query = q(["?a", "?b"], (DUP, "?a", "?b"), distinct=True)
    assert_produces(query, spark, [(1, 2), (3, 4)])
    query2 = q(["?a", "?b"], (DUP, "?a", "?b"))
    assert_produces(query2, spark, [(1, 2), (1, 2), (3, 4)])


def test_duplicate_var_equality(spark):
    # api_test.clj:816-828 (num-pair ?n ?n) — implicit self-equality
    query = q(["?n"], (NUM_PAIR, "?n", "?n"))
    assert_produces(query, spark, [(1,), (2,)])


def test_constant_in_generator_position(spark):
    # constants in generator fields filter (pushed to scan)
    query = q(["?person"], (AGE, "?person", 25))
    assert_produces(query, spark, [("david",), ("emily",)])


def test_constant_output_filter(spark):
    # (* ?n ?n :> 81) — constant in output position filters (parse.clj:565-589)
    query = q(["?n"],
              (INTEGER, "?n"),
              (c.mult, "?n", "?n", ":>", 81))
    assert_produces(query, spark, [(9,)])


def test_null_filtering_nonnullable(spark):
    # ?age filters null rows; !age keeps them (api_test.clj:43 dirty data)
    DIRTY = [("alice", 28), ("bob", None), ("chris", 40)]
    query = q(["?person", "?age"], (DIRTY, "?person", "?age"))
    assert_produces(query, spark, [("alice", 28), ("chris", 40)])
    query2 = q(["?person", "!age"], (DIRTY, "?person", "!age"))
    assert_produces(query2, spark,
                    [("alice", 28), ("bob", None), ("chris", 40)])


def test_cross_join(spark):
    A = [(1,), (2,)]
    B = [("x",), ("y",)]
    query = q(["?a", "?b"], (A, "?a"), (B, "?b"))
    assert_produces(query, spark,
                    [(1, "x"), (1, "y"), (2, "x"), (2, "y")])


def test_filter_as_value_capture(spark):
    # predicate.clj:170-187: filter with :> captures boolean
    query = q(["?n", "?odd"],
              (INTEGER, "?n"),
              (c.odd, "?n", ":>", "?odd"))
    assert_produces(query, spark, [(n[0], n[0] % 2 != 0) for n in INTEGER])


def test_subquery_as_generator(spark):
    sub = q(["?person", "?age"],
            (AGE, "?person", "?age"),
            (c.lt, "?age", 30))
    outer = q(["?person"],
              (sub, "?person", "?age"),
              (c.gt, "?age", 26))
    assert_produces(outer, spark, [("alice",), ("gary",), ("kumar",)])


def test_python_filter_fn(spark):
    # arbitrary Python callable auto-lifted as filter (predicate.clj:87-98)
    query = q(["?person", "?age"],
              (AGE, "?person", "?age"),
              (lambda a: a % 2 == 0, "?age"))
    assert_produces(query, spark,
                    [(p, a) for p, a in AGE if a % 2 == 0])


def test_set_as_filter(spark):
    query = q(["?person"], (PERSON, "?person"),
              ({"alice", "bob"}, "?person"))
    assert_produces(query, spark, [("alice",), ("bob",)])


def test_shared_subquery_fanout_persisted(spark):
    """A subquery generator referenced by TWO branches compiles once and is
    persisted (SURVEY §4 common-subplan sharing: zip.clj:47-59 memoized walk
    -> persist() on fan-out), so the action computes it once."""
    sub = q(["?person", "?age"],
            (AGE, "?person", "?age"),
            (c.lt, "?age", 40))
    # self-join of the shared subquery: pairs of same-age people
    outer = q(["?p1", "?p2", "?age"],
              (sub, "?p1", "?age"),
              (sub, "?p2", "?age"),
              (c.lt, "?p1", "?p2"))
    df = outer.to_df(spark)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" in plan  # both branches read the persisted sub
    young = [(p, a) for p, a in AGE if a < 40]
    expected = [(p1, p2, a1) for p1, a1 in young for p2, a2 in young
                if a1 == a2 and p1 < p2]
    rows = [tuple(r) for r in df.collect()]
    assert sorted(rows) == sorted(expected)


def test_wildcard_and_none_in_output_position(spark):
    """`_` output position is ignored (vars.clj:81-83); binding an output
    to None keeps exactly the rows where the op returns null."""
    from cascalog_spark.builtin import juxt
    from cascalog_spark.ops import defmapfn

    two = juxt(c.add, c.sub)
    res = q(["?a"], ([(1, 2), (3, 4)], "?x", "?y"),
            (two, "?x", "?y", ":>", "?a", "_")).run(spark)
    assert sorted(res) == [(3,), (7,)]

    nullify = defmapfn(returns="int")(lambda v: None if v == 1 else v)
    res = q(["?x"], ([(1,), (2,)], "?x"),
            (nullify, "?x", ":>", None)).run(spark)
    assert sorted(res) == [(1,)]


def test_prune_keeps_op_unifying_with_generator_var(spark):
    """ADVICE r1 (high): an op whose output var unifies with a
    generator-bound var is an implicit equality constraint and must NOT be
    pruned (parse.clj:660-682 includes generator outvars in needed-fields)."""
    res = q(["?a"], ([(1, 2), (1, 3)], "?a", "?b"),
            (c.add, "?a", 1, ":>", "?b")).run(spark)
    assert sorted(res) == [(1,)]
    # named-binding generators too
    src = spark.createDataFrame([(1, 2), (1, 3)], ["x", "y"])
    res = q(["?a"], (src, {"x": "?a", "y": "?b"}),
            (c.add, "?a", 1, ":>", "?b")).run(spark)
    assert sorted(res) == [(1,)]


def test_prune_disabled_by_zero_input_filter_and_agg():
    """Pruning is disabled when ANY zero-input op/filter/aggregator exists
    (parse.clj:669-676), not just zero-input map ops."""
    from cascalog_spark.ops import deffilterfn
    from cascalog_spark.planner import prune_operations
    from cascalog_spark.predicates import normalize_query

    always = deffilterfn()(lambda: True)
    nq = normalize_query(["?a"], [([(1,)], "?a"),
                                  (always,),
                                  (c.add, "?a", 1, ":>", "?dead")], {})
    assert len(prune_operations(nq)) == len(nq.operations)

    nq2 = normalize_query(["?a", "?n"], [([(1,)], "?a"),
                                         (c.count, ":>", "?n"),
                                         (c.add, "?a", 1, ":>", "?dead")], {})
    assert len(prune_operations(nq2)) == len(nq2.operations)


def test_eq_ne_null_semantics(spark):
    """ADVICE r1 (low): c.eq/c.ne are null-safe for !vars —
    (= nil nil) is true in Clojure."""
    rows = [(None, None), (1, None), (2, 2), (2, 3)]
    res = q(["!x", "!y"], (rows, "!x", "!y"), (c.eq, "!x", "!y")).run(spark)
    assert sorted(res, key=str) == sorted([(2, 2), (None, None)], key=str)
    res = q(["!x", "!y"], (rows, "!x", "!y"), (c.ne, "!x", "!y")).run(spark)
    assert sorted(res, key=str) == sorted([(1, None), (2, 3)], key=str)


def test_limit_option(spark):
    """ADVICE r1 (low): `limit` option caps rows after final projection
    instead of silently no-opping."""
    res = q(["?a"], ([(i,) for i in range(10)], "?a"), limit=3).run(spark)
    assert len(res) == 3


def test_filter_same_field_reference_cases(spark):
    """api_test.clj:218-245 test-filter-same-field verbatim: implicit
    equality through repeated vars — in generators, in op OUTPUTS
    unifying with bound vars (including an op's own input), chained
    self-unifying ops, cross-generator unification, and aggregation over
    a same-var-filtered stream."""
    nums = [(1, 1), (0, 0), (1, 2), (3, 7), (8, 64), (7, 1), (2, 4),
            (6, 6)]
    assert_produces(q(["?n"], (nums, "?n", "?n")), spark,
                    [(1,), (0,), (6,)])
    assert_produces(
        q(["?n", "?n2"], (nums, "?n", "?n2"),
          (c.mult, "?n", "?n", ":>", "?n2")),
        spark, [(1, 1), (0, 0), (8, 64), (2, 4)])
    assert_produces(
        q(["?n"], (nums, "?n", "?n"),
          (c.mult, "?n", "?n", ":>", "?n"),
          (c.add, "?n", "?n", ":>", "?n")),
        spark, [(0,)])
    assert_produces(
        q(["?n", "?n2"], (nums, "?n", "?n"), (nums, "?n", "?n2")),
        spark, [(1, 1), (1, 2), (0, 0), (6, 6)])
    assert_produces(
        q(["?s"], (nums, "?n", "?n"),
          (c.mult, 2, "?n", ":>", "?n2"),
          (c.sum_agg, "?n2", ":>", "?s")),
        spark, [(14,)])
    assert_produces(
        q(["?n2"], (nums, "?n", "?n"), (nums, "?n2", "?n2"),
          (c.mult, 6, "?n", ":>", "?n2")),
        spark, [(6,), (0,)])


def test_sort_reference_cases(spark):
    """api_test.clj:250-263 test-sort verbatim: :sort/:reverse inline
    options feeding a select-first buffer."""
    import pandas as pd

    from cascalog_spark import defbufferfn

    @defbufferfn(returns=["bigint"], name="select-first")
    def select_first(pdf):
        return pd.DataFrame({"v": [pdf.iloc[0, 0]]})

    pairs = [("a", 1), ("a", 2), ("a", 3), ("b", 10), ("b", 20)]
    qr = q(["?f1", "?f2"], (pairs, "?f1", "?v"),
           (":sort", "?v"),
           (select_first, "?v", ":>", "?f2"))
    assert_produces(qr, spark, [("a", 1), ("b", 10)])
    qr = q(["?f1", "?f2"], (pairs, "?f1", "?v"),
           (":sort", "?v"), (":reverse", True),
           (select_first, "?v", ":>", "?f2"))
    assert_produces(qr, spark, [("a", 3), ("b", 20)])


def test_constraint_and_capture_reference_cases(spark):
    """api_test.clj:567-709 ported: fn guards in generator BINDING and op
    OUTPUT positions, multi-output op outputs unifying to one var,
    constant substitution incl. aggregator outputs, sets as predicate
    ops, filter-capture variants, mapops as filters, and op params via
    higher-order factories (var-apply)."""
    from cascalog_spark import defmapfn

    def odd_py(x):
        return x % 2 != 0

    def even_py(x):
        return x % 2 == 0

    pairs = [(1, 2), (2, 4), (3, 3)]
    # complex constraints (clj:577-591)
    @defmapfn(returns=["bigint", "bigint"], n_out=2, name="double-times")
    def double_times(x, y):
        return (2 * x, y)

    qr = q(["?a", "?b"], (pairs, "?a", "?b"),
           (double_times, "?a", "?b", ":>", "?b", "?b"))
    assert_produces(qr, spark, [(1, 2), (2, 4)])
    qr = q(["?b"], (pairs, odd_py, "?b"),
           (c.mult, "?b", 3, ":>", even_py))
    assert_produces(qr, spark, [(2,)])

    # constant substitution (clj:593-609)
    pairs2 = [(1, 2), (1, 3), (2, 5)]
    qr = q(["?a", "?b"], (pairs2, "?a", "?b"),
           (c.mult, 2, "?b", ":>", 4))
    assert_produces(qr, spark, [(1, 2)])
    qr = q(["?a"], (pairs2, "?a", "?b"), (c.count, 2))
    assert_produces(qr, spark, [(1,)])
    # plain callables demand a declared return type when CAPTURED (our
    # documented narrowing) — the builtin odd filter captures fine
    qr = q(["?a"], (pairs2, "?a", "_"), (c.odd, "?a", ":>", False))
    assert_produces(qr, spark, [(2,)])

    # sets as predicate ops (clj:657-667)
    people = [("bob",), ("sam",)]
    qr = q(["?person"], (people, "?person"), ({"bob"}, "?person"))
    assert_produces(qr, spark, [("bob",)])

    # filter capture (clj:669-693)
    src = [(1,), (2,)]
    qr = q(["?x", "?z"], (src, "?x"), (c.odd, "?x", ":>", "?z"))
    assert_produces(qr, spark, [(1, True), (2, False)])
    qr = q(["?x"], (src, "?x"), (c.odd, "?x", ":>", False))
    assert_produces(qr, spark, [(2,)])
    qr = q(["?x"], (src, "?x"),
           (c.odd, "?x", ":>", lambda v: v is False))
    assert_produces(qr, spark, [(2,)])
    # a mapop with no output vars acts as a truthiness filter
    even_map = c.column_op("even-map", lambda x: x % 2 == 0,
                           py_fn=lambda x: x % 2 == 0)
    qr = q(["?x"], (src, "?x"), (even_map, "?x"))
    assert_produces(qr, spark, [(2,)])

    # var-apply (clj:628-650): op params through a factory closure
    def var_apply(fn):
        from cascalog_spark import mapfn

        @defmapfn(returns="bigint", name="var-apply")
        def applied(*xs):
            return fn(*xs)

        return applied

    import operator
    num_src = [(1, 2), (3, 4)]
    qr = q(["?x", "?y", "?z"], (num_src, "?x", "?y"),
           (var_apply(operator.mul), "?x", "?y", ":>", "?z"))
    assert_produces(qr, spark, [(1, 2, 2), (3, 4, 12)])


def test_select_fields_and_limit_reference_cases(spark):
    """api_test.clj:711-783 ported: select-fields over a subquery
    (single-name and reordered forms) and the c/limit + c/limit-rank
    battery under :sort/:reverse, grouped and ungrouped."""
    from cascalog_spark import select_fields

    wide = [(1, 2, 3, 4, 5, 6)]
    sq = q(["!f1", "!f4", "!f5", "?f6"],
           (wide, "!f1", "!f2", "!f3", "!f4", "!f5", "?f6"))
    assert select_fields(sq, "!f1").run(spark) == [(1,)]
    assert select_fields(sq, ["!f1", "?f6"]).run(spark) == [(1, 6)]
    assert select_fields(sq, ["!f5", "!f4", "?f6"]).run(spark) == [(5, 4, 6)]

    pair = [("a", 1), ("a", 3), ("a", 2), ("a", 4), ("b", 1), ("b", 6),
            ("b", 7), ("c", 0)]
    # global limit 2 ascending
    qr = q(["?n2"], (pair, "_", "?n"), (":sort", "?n"),
           (c.limit(2), "?n", ":>", "?n2"))
    assert_produces(qr, spark, [(0,), (1,)])
    # limit-rank 3 ascending with rank output
    qr = q(["?n2", "?r"], (pair, "_", "?n"), (":sort", "?n"),
           (c.limit_rank(3), "?n", ":>", "?n2", "?r"))
    assert_produces(qr, spark, [(0, 1), (1, 2), (1, 3)])
    # reverse limit over two sort keys, two captured fields
    qr = q(["?l2", "?n2"], (pair, "?l", "?n"),
           (":sort", "?l", "?n"), (":reverse", True),
           (c.limit(2), "?l", "?n", ":>", "?l2", "?n2"))
    assert_produces(qr, spark, [("c", 0), ("b", 7)])
    # limit 3 ascending keeps the duplicate 1s
    qr = q(["?n2"], (pair, "_", "?n"), (":sort", "?n"),
           (c.limit(3), "?n", ":>", "?n2"))
    assert_produces(qr, spark, [(0,), (1,), (1,)])
    # reverse global limit
    qr = q(["?n2"], (pair, "_", "?n"), (":sort", "?n"),
           (":reverse", True), (c.limit(2), "?n", ":>", "?n2"))
    assert_produces(qr, spark, [(6,), (7,)])
    qr = q(["?n2", "?r"], (pair, "_", "?n"), (":sort", "?n"),
           (":reverse", True),
           (c.limit_rank(2), "?n", ":>", "?n2", "?r"))
    assert_produces(qr, spark, [(6, 2), (7, 1)])
    # GROUPED limit: ?l in the output → per-group top 2
    qr = q(["?l", "?n2"], (pair, "?l", "?n"), (":sort", "?n"),
           (c.limit(2), "?n", ":>", "?n2"))
    assert_produces(qr, spark, [("a", 1), ("a", 2), ("b", 1), ("b", 6),
                                ("c", 0)])
