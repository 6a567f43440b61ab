"""Dynamic typing parity (SURVEY §1.2): the reference serializes ANY
value via Kryo (conf.clj:86-94) and its tests flow heterogeneous columns
through class-dispatching ops (api_test.clj:617-628), nested collections
as single field values (api_test.clj:636-645, 785-790).  The engine's
analog: mixed-type raw-collection columns and ``returns="object"`` op
outputs ride as pickled BinaryType, transparently decoded at Python-op
boundaries and in ``run()``."""

import sys
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from cascalog_spark import c, filterfn, mapcatfn, mapfn, q  # noqa: E402


def test_heterogeneous_column_type_dispatch(spark):
    """api_test.clj:617-628: [["word."] [1] [1.0]] through a multimethod
    dispatching on class — values must arrive TYPED, not string-coerced."""
    dispatch = mapfn(lambda v: v + "!" if isinstance(v, str)
                     else v + 1 if isinstance(v, int) else v * 2.0,
                     returns="object", name="dispatch")
    res = q(["?y"], ([("word.",), (1,), (1.5,)], "?x"),
            (dispatch, "?x", ":>", "?y")).run(spark)
    assert sorted(res, key=str) == [("word.!",), (2,), (3.0,)]


def test_object_chaining_and_extraction(spark):
    """object → object → typed extraction across two Python ops."""
    wrap = mapfn(lambda v: {"v": v}, returns="object", name="wrap")
    unwrap = mapfn(lambda m: str(m["v"]), returns="string", name="unwrap")
    res = q(["?s"], ([("a",), (2,)], "?x"),
            (wrap, "?x", ":>", "?m"),
            (unwrap, "?m", ":>", "?s")).run(spark)
    assert sorted(res) == [("2",), ("a",)]


def test_filter_on_heterogeneous_values(spark):
    is_num = filterfn(lambda v: isinstance(v, (int, float)), name="is_num")
    res = q(["?x"], ([("word.",), (1,), (2.5,)], "?x"),
            (is_num, "?x")).run(spark)
    assert sorted(res, key=str) == [(1,), (2.5,)]


def test_mapcat_emitting_objects(spark):
    """mapcat whose emitted elements are arbitrary objects."""
    pairs = mapcatfn(lambda v: [(v,), [v, v]], returns="object",
                     name="pairs")
    res = q(["?o"], ([(3,)], "?x"), (pairs, "?x", ":>", "?o")).run(spark)
    assert sorted(res, key=str) == [((3,),), ([3, 3],)]


def test_nested_collection_values_reduced_in_query(spark):
    """api_test.clj:636-645 / 785-790: vectors and nested maps as single
    field values, reduced/extracted in-query (homogeneous → native array/
    map columns, no pickling needed)."""
    total = mapfn(lambda v: sum(v), returns="bigint", name="total")
    res = q(["?s"], ([([1, 2, 3],), ([10, 20],)], "?v"),
            (total, "?v", ":>", "?s")).run(spark)
    assert sorted(res) == [(6,), (30,)]

    get_in = mapfn(lambda m: m["a"]["b"], returns="bigint", name="get_in")
    res2 = q(["?v"], ([({"a": {"b": 1}},), ({"a": {"b": 5}},)], "?m"),
             (get_in, "?m", ":>", "?v")).run(spark)
    assert sorted(res2) == [(1,), (5,)]


def test_homogeneous_columns_stay_native(spark):
    """No pickling for well-typed columns — the fast path is untouched
    and pure-numeric mixes widen to double (reference testing semantics
    normalizes numbers to doubles)."""
    df = q(["?x"], ([(1,), (2,)], "?x")).to_df(spark)
    assert dict(df.dtypes)[df.columns[0]] in ("bigint", "long")
    res = q(["?x"], ([(1,), (2.5,)], "?x")).run(spark)
    assert sorted(res) == [(1.0,), (2.5,)]


def test_join_on_pickled_values(spark):
    """Implicit equality across two heterogeneous generators — pickle
    bytes of equal simple values are byte-equal, so unification works."""
    lhs = [("a", 1), (2, 2), (3.5, 3)]
    rhs = [("a", 10), (2, 20)]
    res = q(["?k", "?l", "?r"],
            (lhs, "?k", "?l"),
            (rhs, "?k", "?r")).run(spark)
    assert sorted(res, key=str) == [("a", 1, 10), (2, 2, 20)]


def test_run_many_decodes_objects(spark):
    from cascalog_spark import run_many

    wrap = mapfn(lambda v: (v, v), returns="object", name="wrap2")
    q1 = q(["?o"], ([(1,), (2,)], "?x"), (wrap, "?x", ":>", "?o"))
    q2 = q(["?x"], ([(7,)], "?x"))
    r1, r2 = run_many(spark, q1, q2)
    assert sorted(r1) == [((1, 1),), ((2, 2),)]
    assert r2 == [(7,)]


def test_trap_with_object_values(spark):
    """:trap + pickled inputs: the poison value diverts, typed values
    continue decoded."""
    caught = []
    risky = mapfn(lambda v: v * 2, returns="object", name="risky")
    res = q(["?y"], ([(1,), ("oops",), (3.0,)], "?x"),
            (risky, "?x", ":>", "?y"),
            trap=lambda df: caught.extend(df.collect())).run(spark)
    # str*2 works in Python ("oopsoops") — use a genuinely failing value
    assert sorted(res, key=str) == [("oopsoops",), (2,), (6.0,)]

    def boom(v):
        if isinstance(v, str):
            raise ValueError("no strings")
        return v * 2
    risky2 = mapfn(boom, returns="object", name="risky2")
    caught2 = []
    res2 = q(["?y"], ([(1,), ("oops",), (3.0,)], "?x"),
             (risky2, "?x", ":>", "?y"),
             trap=lambda df: caught2.extend(df.collect())).run(spark)
    assert sorted(res2, key=str) == [(2,), (6.0,)]
    assert len(caught2) == 1 and "ValueError" in caught2[0]["__error"]

def test_trap_with_filterfn_on_pickled_column(spark):
    """:trap + filterfn over a heterogeneous column: inputs must be
    DECODED before the filter runs (the trap branch previously bypassed
    the pickled-object wrapper, silently dropping every row)."""
    caught = []
    is_num = filterfn(lambda v: isinstance(v, (int, float)), name="is_num_t")
    res = q(["?x"], ([("word.",), (1,), (2.5,)], "?x"),
            (is_num, "?x"),
            trap=lambda df: caught.extend(df.collect())).run(spark)
    assert sorted(res, key=str) == [(1,), (2.5,)]
    assert caught == []  # no errors — just a filter

    def picky(v):
        if isinstance(v, str):
            raise ValueError("no strings")
        return v > 1
    picky_f = filterfn(picky, name="picky")
    caught2 = []
    res2 = q(["?x"], ([("word.",), (1,), (2.5,)], "?x"),
             (picky_f, "?x"),
             trap=lambda df: caught2.extend(df.collect())).run(spark)
    assert sorted(res2, key=str) == [(2.5,)]
    assert len(caught2) == 1 and "ValueError" in caught2[0]["__error"]


def test_null_in_heterogeneous_column_still_drops(spark):
    """None in a mixed-type column stays a SQL NULL (not pickled bytes),
    so non-nullable ?-vars still drop it — reference nil semantics."""
    res = q(["?x"], ([(1,), ("a",), (None,)], "?x")).run(spark)
    assert len(res) == 2 and (1,) in res and ("a",) in res
    # and !-vars keep it as a real None
    res2 = q(["!x"], ([(1,), ("a",), (None,)], "!x")).run(spark)
    assert len(res2) == 3 and (None,) in res2 and (1,) in res2


def test_object_op_returning_none_is_null(spark):
    """A returns='object' op emitting None produces SQL NULL, so a
    downstream ?-var filters the row (the single-output encode path
    previously pickled None into non-null bytes)."""
    maybe = mapfn(lambda v: v * 2 if v != 2 else None,
                  returns="object", name="maybe_none")
    res = q(["?y"], ([(1,), (2,), (3,)], "?x"),
            (maybe, "?x", ":>", "?y")).run(spark)
    assert sorted(res, key=str) == [(2,), (6,)]
