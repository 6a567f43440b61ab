"""Textual Datalog-form parser tests (the ``<-`` macro surface)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cascalog_spark import c, parse_query


def test_vars_classification_reference_cases():
    """vars_test.clj ported verbatim (cascalog-core/test/cascalog/logic/
    vars_test.clj:5-49): var recognition, wildcard reservation,
    groundness, generated var families, sanitize munging."""
    from cascalog_spark import vars as V

    # "Strings work as vars" (vars_test.clj:5-7)
    assert all(V.is_var(v) for v in ["?a", "?face_two", "!!two", "!a"])
    # "The underscore is reserved but..." — here "_" IS a positional
    # wildcard var (vars.clj:81-83 replaces it with a fresh var)
    assert V.is_var("_") and V.is_wildcard("_")
    assert not V.is_var("plain") and not V.is_var(10)
    # "Unground vars begin with !!" (vars_test.clj:15-16)
    assert V.is_ungrounding("!!a")
    # "! and ? vars are ground." (vars_test.clj:18-19)
    assert V.is_ground(["!a", "?a"])
    # "Adding !!a causes the test to fail." (vars_test.clj:21-22)
    assert not V.is_ground(["!!a", "!a", "?a"])
    # "A sequence of vars is only fully ground if every var is ground."
    assert V.is_ground(["?b", "!a", "?a"])
    assert not V.is_ground(["!!b", "!a", "?a"])
    # nullable/non-nullable split is exclusive (vars_test.clj:36-48)
    nns = [V.gen_var("?") for _ in range(10)]
    ns = [V.gen_nullable_var() for _ in range(10)]
    assert all(V.is_non_nullable(v) and not V.is_nullable(v) for v in nns)
    assert all(V.is_nullable(v) and not V.is_non_nullable(v) for v in ns)
    assert len(set(nns + ns)) == 20  # generated vars are unique
    # sanitize strips sigils and munges non-word chars (vars_test.clj:51-55)
    assert V.sanitize_name("?a") == "a"
    assert V.sanitize_name("!!a") == "a"
    assert V.sanitize_name("?face-two") == "face_two"
    assert V.sanitize_name("?") == "_c"  # never an empty column name


def test_wordcount_textual(spark):
    sentences = spark.createDataFrame(
        [("the quick fox",), ("the lazy dog the",)], ["s"])
    qr = parse_query("""
        [?word ?n]
        (sentences ?s)
        (split ?s :> ?word)
        (count ?n)
    """, env={"sentences": sentences, "split": c.split()})
    got = dict(qr.run(spark))
    assert got == {"the": 3, "quick": 1, "fox": 1, "lazy": 1, "dog": 1}


def test_join_filter_constants_textual(spark):
    people = spark.createDataFrame(
        [("alice", 28), ("bob", 33), ("carol", 17)], ["p", "a"])
    follows = spark.createDataFrame(
        [("alice", "bob"), ("carol", "alice")], ["p", "o"])
    qr = parse_query("""
        [?p ?o]
        (people ?p ?a)
        (follows ?p ?o)
        (< ?a 30)
    """, env={"people": people, "follows": follows})
    assert sorted(qr.run(spark)) == [("alice", "bob"), ("carol", "alice")]


def test_option_predicate_and_literals(spark):
    data = spark.createDataFrame([(1, 1), (1, 1), (2, 4)], ["x", "y"])
    qr = parse_query("""
        [?x ?y]
        (data ?x ?y)
        (:distinct true)
    """, env={"data": data})
    assert sorted(qr.run(spark)) == [(1, 1), (2, 4)]


def test_parser_atom_fuzz():
    """Reader/atom fuzz: whitespace layout never changes the parse; every
    literal kind round-trips."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from cascalog_spark.dsl import _atom, _read, _tokenize

    @given(ws=st.lists(st.sampled_from([" ", "\n", "\t", "  "]),
                       min_size=6, max_size=6))
    @settings(max_examples=20, deadline=None)
    def check(ws):
        src = (f"[?x{ws[0]}?y]{ws[1]}(src{ws[2]}?x{ws[3]}?y){ws[4]}"
               f"(op ?x 3 -2.5 \"s\" true nil :> ?z){ws[5]}")
        forms = _read(_tokenize(src))
        assert forms[0] == ["?x", "?y"]
        assert forms[1] == ["src", "?x", "?y"]
        assert [(_atom(t) if isinstance(t, str) else t)
                for t in forms[2]] == \
            ["op", "?x", 3, -2.5, "s", True, None, ":>", "?z"]

    check()


def test_unresolved_symbol_error():
    with pytest.raises(ValueError, match="unresolved symbol"):
        parse_query("[?x] (ghost ?x)", env={})


def test_unbalanced_parens_error():
    with pytest.raises(ValueError, match="missing"):
        parse_query("[?x] (src ?x", env={"src": [(1,)]})


def test_textual_vararg_selector(spark):
    """Vararg ``:<<`` with a nested var vector in the textual form
    (pred_macro_test.clj varargs through the `<-` string surface);
    literals inside nested vectors atomize too."""
    from cascalog_spark import parse_query

    data = [(2.0, 3.0), (4.0, 5.0)]
    qr = parse_query("""
        [?prod]
        (pairs ?a ?b)
        (mult :<< [?a ?b 10] :> ?prod)
    """, env={"pairs": data})
    assert sorted(qr.run(spark)) == [(60.0,), (200.0,)]
