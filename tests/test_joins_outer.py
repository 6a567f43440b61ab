"""Outer-join (!!var) and existence-join semantics — mirrors
api_test.clj:277-394 and api_secondary_test.clj:115-188 (the reference spec
for ungrounding vars, null padding, !count, negation)."""

from cascalog_spark import c, q
from cascalog_spark.testing import assert_produces
import pytest

PERSON1 = [("a",), ("b",), ("c",), ("d",)]
FOLLOWS2 = [("a", "b"), ("a", "c"), ("b", "a"), ("c", "d")]
AGE4 = [("A", 20), ("B", 30), ("C", 27), ("D", 40)]
GENDER4 = [("A", "m"), ("B", "f"), ("E", "m"), ("F", "f")]
FOLLOWS = [("alice", "david"), ("alice", "bob"),
           ("bob", "david"), ("emily", "alice")]
AGE = [("alice", 28), ("bob", 33), ("david", 25), ("emily", 25),
       ("gary", 28)]


@pytest.fixture(autouse=True)
def _dual_strict(monkeypatch):
    """api_test.clj:11-16 fixture analog: every assert_produces in this
    file must ACTUALLY run on both platforms — the silent local-leg skip
    becomes a failure, so a builtin losing its Python mirror (or a new
    Spark-only surface creeping into core coverage) fails loudly."""
    monkeypatch.setenv("CASCALOG_DUAL_STRICT", "1")


def test_left_outer_join(spark):
    # every person; followed null-padded when no follows (api_test.clj:277-300)
    query = q(["?p", "!!f"],
              (PERSON1, "?p"),
              (FOLLOWS2, "?p", "!!f"))
    assert_produces(query, spark,
                    [("a", "b"), ("a", "c"), ("b", "a"), ("c", "d"),
                     ("d", None)])


def test_full_outer_join(spark):
    # age4 ⟗ gender4 (api_test.clj:330-360 style)
    query = q(["?p", "!!a", "!!g"],
              (AGE4, "?p", "!!a"),
              (GENDER4, "?p", "!!g"))
    assert_produces(query, spark,
                    [("A", 20, "m"), ("B", 30, "f"), ("C", 27, None),
                     ("D", 40, None), ("E", None, "m"), ("F", None, "f")])


def test_outer_join_with_count(spark):
    # follower count per person incl. zero — !!v + !count idiom
    # (api_test.clj:302-328)
    query = q(["?p", "?count"],
              (PERSON1, "?p"),
              (FOLLOWS2, "?p", "!!f"),
              (c.count_notnull, "!!f", ":>", "?count"))
    assert_produces(query, spark,
                    [("a", 2), ("b", 1), ("c", 1), ("d", 0)])


def test_existence_semi_join(spark):
    # (follows ?p _ :> true) — keep people who follow someone
    # (api_secondary_test.clj:115-140)
    query = q(["?p"],
              (PERSON1, "?p"),
              (FOLLOWS2, "?p", "_", ":>", True))
    assert_produces(query, spark, [("a",), ("b",), ("c",)])


def test_negation_anti_join(spark):
    # (follows ?p _ :> false) — people who follow nobody
    # (api_secondary_test.clj:123-127,181-188)
    query = q(["?p"],
              (PERSON1, "?p"),
              (FOLLOWS2, "?p", "_", ":>", False))
    assert_produces(query, spark, [("d",)])


def test_existence_flag_join(spark):
    # flag var: boolean column (api_secondary_test.clj:141-176)
    query = q(["?p", "?follows_any"],
              (PERSON1, "?p"),
              (FOLLOWS2, "?p", "_", ":>", "?follows_any"))
    assert_produces(query, spark,
                    [("a", True), ("b", True), ("c", True), ("d", False)])


def test_post_join_op_sees_nulls(spark):
    # ops after an outer join see null-padded values via !!vars — guard with
    # a nullable-aware op (api_test.clj:362-394)
    ages = [("a", 20), ("b", 30), ("c", 27)]  # no "d"
    query = q(["?p", "?has_age"],
              (PERSON1, "?p"),
              (ages, "?p", "!!a"),
              (c.not_null, "!!a", ":>", "?has_age"))
    assert_produces(query, spark,
                    [("a", True), ("b", True), ("c", True), ("d", False)])


def test_join_then_aggregate(spark):
    # count of follows per age bucket — join feeding an agg
    query = q(["?age", "?cnt"],
              (FOLLOWS, "?p", "_"),
              (AGE, "?p", "?age"),
              (c.count, "?cnt"))
    assert_produces(query, spark, [(28, 2), (33, 1), (25, 1)])


def test_op_feeding_only_genset_not_pruned(spark):
    """An op whose output exists solely to feed a genset's join key must
    survive dead-op pruning (parse.clj:640-682 + genset join vars)."""
    src = [("The",), ("quick",), ("Fox",)]
    stops = [("the",), ("a",)]
    res = q(["?w"], (src, "?w"),
            (c.lower, "?w", ":>", "?w2"),
            (stops, "?w2", ":>", False)).run(spark)
    assert sorted(res) == [("Fox",), ("quick",)]


def test_bloated_join_reference_parity(spark):
    """api_test.clj:104-119 verbatim: a 4-way join over nullable !vars with
    :distinct — null attribute values flow through every join."""
    gender = [("n", "male"), ("j", "male"), ("a", None), ("z", "female")]
    interest = [("n", "bball"), ("n", "dl"), ("j", "tennis"),
                ("z", "stuff"), ("a", "shoes")]
    friends = [("n", "j"), ("n", "m"), ("n", "a"),
               ("j", "a"), ("a", "z"), ("z", "a")]
    age = [("z", 20), ("a", 10), ("n", 15)]
    res = q(["!p", "!interest", "!age", "!gender"],
            (friends, "!p", "_"),
            (age, "!p", "!age"),
            (interest, "!p", "!interest"),
            (gender, "!p", "!gender"),
            distinct=True).run(spark)
    assert sorted(res, key=str) == sorted(
        [("n", "bball", 15, "male"), ("n", "dl", 15, "male"),
         ("a", "shoes", 10, None), ("z", "stuff", 20, "female")], key=str)


def test_multi_rule_composition_reference_parity(spark):
    """api_test.clj:193-216 verbatim: subqueries as generators composing
    three rules deep (agg rule -> self-join rule -> null-filter rule)."""
    age = [("n", 24), ("c", 40), ("j", 23), ("g", 50)]
    interest = [("n", "bb", None), ("n", "fb", 20),
                ("g", "ck", 30), ("j", "nz", 10),
                ("j", "hk", 1), ("jj", "ee", None)]
    follows = [("n", "j"), ("j", "n"), ("j", "a"), ("n", "a"), ("g", "q")]

    many_follow = q(["?p"], (follows, "?p", "_"),
                    (c.count, "?c"), (c.gt, "?c", 1))
    active_follows = q(["?p", "?p2"],
                       (many_follow, "?p"), (many_follow, "?p2"),
                       (follows, "?p", "?p2"))
    unknown_interest = q(["?p"],
                         (age, "?p", "?a"),
                         (interest, "?p", "_", "!i"),
                         (c.is_null, "!i"))
    weird_follows = q(["?p", "?p2"],
                      (active_follows, "?p", "?p2"),
                      (unknown_interest, "?p2"))
    assert sorted(active_follows.run(spark)) == [("j", "n"), ("n", "j")]
    assert sorted(unknown_interest.run(spark)) == [("n",)]
    assert sorted(weird_follows.run(spark)) == [("j", "n")]


def test_outer_join_complex_reference_parity(spark):
    """api_test.clj:310-323 verbatim: TWO ungrounding generators against a
    ground spine — rec2 additionally joins on ?a, so ("b",30) must NOT
    match rec2's ("b",100,16) row (the join key is (?p, ?a))."""
    age = [("a", 20), ("b", 30), ("c", 27), ("d", 40)]
    rec1 = [("a", 1, 2), ("b", 30, 16), ("e", 3, 4)]
    rec2 = [("a", 20, 6), ("c", 27, 25), ("c", 1, 11),
            ("f", 30, 1), ("b", 100, 16)]
    res = q(["?p", "?a", "!!f1", "!!f2", "!!f3"],
            (age, "?p", "?a"),
            (rec1, "?p", "!!f1", "!!f2"),
            (rec2, "?p", "?a", "!!f3")).run(spark)
    assert sorted(res, key=str) == sorted(
        [("a", 20, 1, 2, 6), ("c", 27, None, None, 25),
         ("d", 40, None, None, None), ("b", 30, 30, 16, None)], key=str)


def test_outer_join_anon_wildcard(spark):
    """api_test.clj:441-449 test-outer-join-anon verbatim: a wildcard
    rides along the !!var generator; unmatched left rows pad with
    null."""
    person = [("a",), ("b",), ("c",)]
    follows = [("a", "b", 1), ("c", "e", 2), ("c", "d", 3)]
    qr = q(["?p", "!!p2"], (person, "?p"), (follows, "?p", "!!p2", "_"))
    assert_produces(qr, spark,
                    [("a", "b"), ("c", "e"), ("c", "d"), ("b", None)])


def test_dynamic_vars_reference_cases(spark):
    """api_test.clj:415-439 test-dynamic-vars: out-vars held in a Python
    list, applied through :>> / :<< — queries built by ordinary
    functions."""
    from pyspark.sql import functions as F

    def lala_appended(source):
        outvars = ["?a"]
        suffix = c.column_op(
            "lala", lambda s: F.concat(s, F.lit("lalala")),
            py_fn=lambda s: s + "lalala")
        return q(outvars,
                 (source, "?line"),
                 (suffix, "?line", ":>>", outvars))

    sentence = [("nathan david",), ("chicken",)]
    qr = q(["?out"], (lala_appended(sentence), "?out"))
    assert_produces(qr, spark,
                    [("nathan davidlalala",), ("chickenlalala",)])

    append_a = c.column_op("append-a",
                           lambda s, a: F.concat(s, a.cast("string")),
                           py_fn=lambda s, a: s + str(a))
    qr = q(["?out"],
           (sentence, ":>>", ["?line"]),
           (append_a, ":<<", ["?line", "a"], ":>>", ["?out"]))
    assert_produces(qr, spark, [("nathan davida",), ("chickena",)])
