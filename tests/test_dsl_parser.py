"""Textual Datalog-form parser tests (the ``<-`` macro surface)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cascalog_spark import c, parse_query


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
