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
    return tuple(repr(x) for x in doublify(t))


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


def assert_produces(query, spark, expected, approx: bool = False):
    """test?- analog: run query, compare as multiset, raise with diff."""
    actual = query.run(spark) if hasattr(query, "run") else \
        [tuple(r) for r in query.collect()]
    if not multiset_equal(expected, actual, approx=approx):
        ce, ca = Counter(map(_key, expected)), Counter(map(_key, actual))
        missing = ce - ca
        extra = ca - ce
        raise AssertionError(
            f"query produced wrong result.\n expected: {sorted(map(repr, expected))}\n"
            f" actual:   {sorted(map(repr, actual))}\n"
            f" missing:  {list(missing)}\n extra:    {list(extra)}")
