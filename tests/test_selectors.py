"""Vararg / positional selector parsing — reference parse.clj:30-102
(``desugar-selectors``, ``expand-positional-selector``) and the
pred_macro_test.clj varargs usage."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cascalog_spark import c, q
from cascalog_spark.predicates import _split_selector


# ---------------------------------------------------------------------------
# pure parser unit tests (no Spark)


def test_plain_split_unchanged():
    assert _split_selector(["?a", "?b", ":>", "?c"]) == (["?a", "?b"], ["?c"])
    assert _split_selector(["?a", "?b"]) == (["?a", "?b"], [])
    assert _split_selector([":<", "?a", ":>", "?c"]) == (["?a"], ["?c"])


def test_vararg_input_nested_seq():
    # (desugar-selectors {:<< ([?b])} :< :<<) => {:<< [?b]}
    assert _split_selector([":<<", ["?a", "?b"], ":>", "?c"]) == \
        (["?a", "?b"], ["?c"])


def test_vararg_output_nested_seq():
    assert _split_selector(["?a", ":>>", ["?b", "?c"]]) == \
        (["?a"], ["?b", "?c"])


def test_vararg_flat_spelling_tolerated():
    assert _split_selector([":<<", "?a", "?b", ":>", "?c"]) == \
        (["?a", "?b"], ["?c"])


def test_positional_selector_expands_fresh_vars():
    ins, outs = _split_selector(["?a", ":#>", 3, {0: "?x", 2: "?z"}])
    assert ins == ["?a"]
    assert len(outs) == 3
    assert outs[0] == "?x" and outs[2] == "?z"
    # middle slot is a fresh nullable var
    assert outs[1].startswith("!") or outs[1].startswith("?")
    assert outs[1] not in ("?x", "?z")


def test_duplicate_selector_rejected():
    with pytest.raises(ValueError, match="duplicate selector"):
        _split_selector(["?a", ":>", "?b", ":>", "?c"])


def test_sugar_and_full_conflict_rejected():
    with pytest.raises(ValueError, match="':<' and ':<<'"):
        _split_selector([":<", "?a", ":<<", ["?b"], ":>", "?c"])
    with pytest.raises(ValueError, match="only one of"):
        _split_selector(["?a", ":>", "?b", ":>>", ["?c"]])


def test_positional_bad_payload_rejected():
    with pytest.raises(ValueError, match=":#>"):
        _split_selector(["?a", ":#>", {0: "?x"}])
    with pytest.raises(ValueError, match="out of range"):
        _split_selector(["?a", ":#>", 2, {5: "?x"}])


# ---------------------------------------------------------------------------
# end-to-end: dynamically-built arg vectors drive real queries


def test_vararg_input_sum(spark):
    rows = [(1, 2, 3), (10, 20, 30)]
    in_vars = ["?a", "?b", "?c"]  # built at runtime — the point of :<<
    qr = q(["?s"], (rows, *in_vars), (c.add, ":<<", in_vars, ":>", "?s"))
    assert sorted(qr.run(spark)) == [(6,), (60,)]


def test_vararg_output_multi(spark):
    from cascalog_spark.ops import defmapfn

    @defmapfn(returns=["bigint", "bigint"], n_out=2)
    def minmax(a, b):
        return (min(a, b), max(a, b))

    rows = [(3, 1), (5, 9)]
    qr = q(["?lo", "?hi"], (rows, "?a", "?b"),
           (minmax, "?a", "?b", ":>>", ["?lo", "?hi"]))
    assert sorted(qr.run(spark)) == [(1, 3), (5, 9)]


def test_positional_selector_query(spark):
    from cascalog_spark.ops import defmapfn

    @defmapfn(returns=["bigint", "bigint", "bigint"], n_out=3)
    def spread3(x):
        return (x, x * 10, x * 100)

    rows = [(1,), (2,)]
    # keep only positions 0 and 2 of a 3-field op output
    qr = q(["?x", "?h"], (rows, "?v"),
           (spread3, "?v", ":#>", 3, {0: "?x", 2: "?h"}))
    assert sorted(qr.run(spark)) == [(1, 100), (2, 200)]


def test_predmacro_with_varargs(spark):
    """pred_macro_test.clj varargs: a macro receiving a dynamic-arity input
    vector and emitting predicates over it."""
    from cascalog_spark.predicates import predmacro

    @predmacro
    def sum_all(invars, outvars):
        return [(c.add, ":<<", list(invars), ":>", outvars[0])]

    rows = [(1, 2, 3, 4)]
    qr = q(["?s"], (rows, "?a", "?b", "?c", "?d"),
           (sum_all, ":<<", ["?a", "?b", "?c", "?d"], ":>", "?s"))
    assert qr.run(spark) == [(10,)]
