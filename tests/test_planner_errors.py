"""Planner validation errors — the ``thrown?<-`` analog (logic/testing.clj:
42-43; api_test.clj:325-351).  All checked at q(...).plan() time, no Spark
session needed (parse.clj:104-154 validate-predicates!)."""

import os
import sys

import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cascalog_spark import c, defbufferfn, q

SRC = [(1, 2), (3, 4)]


def _plan(*args, **kw):
    return q(*args, **kw).plan()


def test_no_generator_rejected():
    with pytest.raises(ValueError, match="at least one generator"):
        _plan(["?x"], (c.lt, "?x", 3))


def test_empty_collection_generator_rejected(spark):
    with pytest.raises(ValueError, match="empty collection"):
        q(["?x"], ([], "?x")).to_df(spark)


def test_missing_output_field_rejected():
    with pytest.raises(ValueError, match="not produced"):
        _plan(["?x", "?nope"], (SRC, "?x", "?y"))


def test_unavailable_op_input_rejected():
    with pytest.raises(ValueError, match="unavailable fields"):
        _plan(["?x", "?z"], (SRC, "?x", "?y"),
              (c.add, "?ghost", 1, ":>", "?z"))


def test_multiple_buffers_rejected():
    @defbufferfn(returns="bigint")
    def buf(pdf: pd.DataFrame) -> pd.DataFrame:
        return pdf.head(1)

    with pytest.raises(ValueError, match="Multiple buffers"):
        _plan(["?x", "?a", "?b"], (SRC, "?x", "?y"),
              (buf, "?y", ":>", "?a"), (buf, "?y", ":>", "?b"))


def test_buffer_plus_aggregator_rejected():
    @defbufferfn(returns="bigint")
    def buf(pdf: pd.DataFrame) -> pd.DataFrame:
        return pdf.head(1)

    with pytest.raises(ValueError, match="aggregators and buffers"):
        _plan(["?x", "?n", "?b"], (SRC, "?x", "?y"),
              (c.count, "?n"), (buf, "?y", ":>", "?b"))


def test_ungrounding_var_in_two_generators_rejected():
    with pytest.raises(ValueError, match="ungrounding var"):
        _plan(["?x", "!!y"], (SRC, "?x", "!!y"), (SRC, "?z", "!!y"))


def test_double_output_selector_rejected():
    with pytest.raises(ValueError, match="':>'"):
        _plan(["?x", "?z"], (SRC, "?x", "?y"),
              (c.add, "?y", ":>", "?z", ":>", "?w"))


def test_genset_output_must_be_bool_or_var():
    with pytest.raises(ValueError, match="True/False/var"):
        _plan(["?x"], (SRC, "?x", "?y"),
              (SRC, {0: "?x"}, ":>", 42))


def test_option_predicate_in_body(spark):
    """Keyword option predicates inside the body are legal — extracted into
    the option map (options.clj:44-69 extract-options)."""
    dup = [(1, 1), (1, 1), (2, 2)]
    rows = q(["?x", "?y"], (dup, "?x", "?y"), (":distinct", True)).run(spark)
    assert sorted(rows) == [(1, 1), (2, 2)]


def test_bad_sort_var_clear_error():
    """:sort on an unavailable var fails at plan time with the logic-var
    name, not a downstream Spark UNRESOLVED_COLUMN."""
    import pandas as pd

    from cascalog_spark.ops import defbufferfn

    @defbufferfn(returns=["int"])
    def firstv(pdf):
        return pd.DataFrame({"x": [int(pdf.iloc[0, 0])]})

    with pytest.raises(ValueError, match=r":sort references unavailable"):
        q(["?k", "?f"], ([(1, 2)], "?k", "?v"),
          (firstv, "?v", ":>", "?f"), sort=["?typo"])


def test_unknown_option_rejected():
    """A typo'd option key errors at define time instead of being silently
    ignored (options.clj:44-69 conflicting/unknown handling)."""
    with pytest.raises(ValueError, match="unknown query option"):
        q(["?x"], ([(1,)], "?x"), distnct=True)


def test_outer_join_assertions_reference_cases():
    """api_test.clj:325-351 test-outer-join-assertions: all four illegal
    !!var placements are loud — two generators, op output, genset
    binding, genset flag."""
    age = [("a", 20), ("b", 30), ("c", 27), ("d", 40)]
    rec1 = [("a", 1, 2), ("b", 30, 16), ("e", 3, 4)]
    with pytest.raises(ValueError, match="ungrounding var"):
        _plan(["!!a", "?c"], (age, "!!a", "?b"),
              (rec1, "!!a", "?f1", "?f2"),
              (c.sub, "?b", 2, ":>", "?c"))
    with pytest.raises(ValueError, match="ungrounding var"):
        _plan(["!!a", "!!c"], (age, "!!a", "?b"),
              (c.sub, "?b", 2, ":>", "!!c"))
    with pytest.raises(ValueError, match="generators-as-sets"):
        _plan(["!!a"], (age, "!!a", "?b"),
              (rec1, "!!a", "_", "_", ":>", True))
    with pytest.raises(ValueError, match="generators-as-sets"):
        _plan(["?a", "!!c"], (age, "?a", "?b"),
              (rec1, "?a", "_", "_", ":>", "!!c"))
