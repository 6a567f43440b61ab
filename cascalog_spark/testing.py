"""Test harness — the analog of cascalog.logic.testing / midje-cascalog.

Reference semantics (logic/testing.clj:7-43):
- results compare as **multisets** (order-insensitive, duplicate-sensitive)
- all numerics normalize to double before comparison (``doublify``) —
  ``1 == 1.0`` in outputs
"""

from __future__ import annotations

import math
from collections import Counter


def doublify(t):
    """logic/testing.clj:7-15."""
    out = []
    for v in t:
        if isinstance(v, bool) or not isinstance(v, (int, float)):
            out.append(v)
        else:
            out.append(float(v))
    return tuple(out)


def _key(t):
    # bytearray (Spark's BinaryType collect form) must compare equal to bytes
    return tuple(repr(bytes(x) if isinstance(x, bytearray) else x)
                 for x in doublify(t))


def multiset_equal(expected, actual, approx: bool = False) -> bool:
    """logic/testing.clj:17-26 ``produces`` semantics."""
    if approx:
        return _approx_equal(expected, actual)
    return Counter(map(_key, expected)) == Counter(map(_key, actual))


def _approx_equal(expected, actual, rel=1e-9):
    if len(expected) != len(actual):
        return False
    es = sorted(map(doublify, expected), key=repr)
    as_ = sorted(map(doublify, actual), key=repr)
    for e, a in zip(es, as_):
        if len(e) != len(a):
            return False
        for x, y in zip(e, a):
            if isinstance(x, float) and isinstance(y, float):
                if not math.isclose(x, y, rel_tol=rel, abs_tol=1e-9):
                    return False
            elif x != y:
                return False
    return True


def _run(query, spark):
    if hasattr(query, "run"):
        return query.run(spark)
    if hasattr(query, "to_df"):
        return [tuple(r) for r in query.to_df(spark).collect()]
    return [tuple(r) for r in query.collect()]


def _diff_error(platform, expected, actual):
    ce, ca = Counter(map(_key, expected)), Counter(map(_key, actual))
    return AssertionError(
        f"query produced wrong result on the {platform} platform.\n"
        f" expected: {sorted(map(repr, expected))}\n"
        f" actual:   {sorted(map(repr, actual))}\n"
        f" missing:  {list(ce - ca)}\n extra:    {list(ca - ce)}")


def assert_produces(query, spark, expected, approx: bool = False,
                    platforms=("spark", "local")):
    """test?- analog: run query, compare as multiset, raise with diff.

    DUAL-PLATFORM like the reference's test harness (api_test.clj:11-16
    runs every assertion on Cascading AND the in-memory platform): the
    query also executes on the pure-Python platform (exec_local) and must
    produce the same multiset.  Queries using Spark-only features
    (DataFrame/Tap generators, Column-only ops) skip the local leg
    automatically; pass ``platforms=('spark',)`` to skip explicitly.

    ``CASCALOG_DUAL_STRICT=1`` (set by the core test files' autouse
    fixture) turns the automatic skip into a FAILURE: every implicit
    dual-platform assertion must actually run on both platforms, so a
    builtin losing its Python mirror can't silently shrink coverage."""
    import os

    actual = _run(query, spark)
    if not multiset_equal(expected, actual, approx=approx):
        raise _diff_error("spark", expected, actual)
    if "local" in platforms:
        from .exec_local import LocalPlatformUnsupported, run_local

        try:
            local = run_local(query)
        except LocalPlatformUnsupported:
            if os.environ.get("CASCALOG_DUAL_STRICT"):
                raise
            return  # Spark-only surface: single-platform assertion
        if not multiset_equal(expected, local, approx=approx):
            raise _diff_error("local (in-memory)", expected, local)


def produces_some(query, spark, expected) -> bool:
    """midje-cascalog ``produces-some`` (midje/cascalog.clj:39-97): every
    expected tuple appears in the result (subset as multiset)."""
    actual = Counter(map(_key, _run(query, spark)))
    want = Counter(map(_key, expected))
    return all(actual[k] >= n for k, n in want.items())


def produces_prefix(query, spark, expected) -> bool:
    """``produces-prefix``: result starts with the expected tuples in order
    (only meaningful for globally-ordered queries, e.g. first_n)."""
    actual = [_key(t) for t in _run(query, spark)]
    want = [_key(t) for t in expected]
    return actual[:len(want)] == want


def produces_suffix(query, spark, expected) -> bool:
    """``produces-suffix``: result ends with the expected tuples in order."""
    actual = [_key(t) for t in _run(query, spark)]
    want = [_key(t) for t in expected]
    return len(actual) >= len(want) and actual[-len(want):] == want


def produces_in_order(query, spark, expected, no_gaps: bool = False) -> bool:
    """``:in-order`` (+ ``:no-gaps``): expected tuples appear in this
    relative order; with no_gaps they must also be contiguous."""
    actual = [_key(t) for t in _run(query, spark)]
    want = [_key(t) for t in expected]
    if no_gaps:
        return any(actual[i:i + len(want)] == want
                   for i in range(len(actual) - len(want) + 1))
    it = iter(actual)
    return all(any(a == w for a in it) for w in want)
