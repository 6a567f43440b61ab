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


def test_unresolved_symbol_error():
    with pytest.raises(ValueError, match="unresolved symbol"):
        parse_query("[?x] (ghost ?x)", env={})


def test_unbalanced_parens_error():
    with pytest.raises(ValueError, match="missing"):
        parse_query("[?x] (src ?x", env={"src": [(1,)]})
