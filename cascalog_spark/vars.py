"""Logic variables — the heart of the Cascalog data model, re-expressed for Spark.

Reference semantics (cascalog-core/src/clj/cascalog/logic/vars.clj:8-36,92-117):

| prefix | kind          | semantics                                              |
|--------|---------------|--------------------------------------------------------|
| ``?x`` | non-nullable  | null tuples filtered wherever the var appears; joins   |
| ``!x`` | nullable      | nulls flow through; joins                              |
| ``!!x``| ungrounding   | demands outer-join semantics; generator-only           |
| ``_``  | wildcard      | ignore position (replaced by a fresh var)              |

A var is just a tagged string.  This module is pure Python — no Spark imports —
mirroring the reference's logic/physical split.
"""

from __future__ import annotations

import itertools
import re

_counter = itertools.count()


def gen_var(prefix: str = "?") -> str:
    """Fresh unique var (reference: vars.clj:44-57 ``gen-unique-suffix``)."""
    return f"{prefix}__gen_{next(_counter)}"


def gen_nullable_var() -> str:
    return gen_var("!")


def is_var(x: object) -> bool:
    """True for ``?x``, ``!x``, ``!!x``, ``_`` (vars.clj:92-117)."""
    if not isinstance(x, str):
        return False
    return x == "_" or x.startswith("?") or x.startswith("!")


def is_wildcard(x: object) -> bool:
    return x == "_"


def is_ungrounding(x: object) -> bool:
    """``!!x`` — demands outer join (vars.clj:104-108)."""
    return isinstance(x, str) and x.startswith("!!")


def is_nullable(x: object) -> bool:
    """``!x`` but not ``!!x`` — nulls flow through."""
    return isinstance(x, str) and x.startswith("!") and not x.startswith("!!")


def is_non_nullable(x: object) -> bool:
    """``?x`` — null-filtered at generators and projections."""
    return isinstance(x, str) and x.startswith("?")


def is_ground(fields) -> bool:
    """A field set is ground iff it contains no ungrounding vars (vars.clj:119-123).

    Groundness drives implicit join-type selection (SURVEY.md §2.3).
    """
    return not any(is_ungrounding(f) for f in fields)


def sanitize_name(var: str) -> str:
    """Strip sigils and non-word chars → a Spark-legal column name."""
    stripped = var.lstrip("?!")
    stripped = re.sub(r"\W", "_", stripped)
    return stripped or "_c"


class ColumnNamer:
    """Per-query registry mapping logic vars to unique Spark column names."""

    def __init__(self) -> None:
        self._names: dict[str, str] = {}
        self._used: set[str] = set()

    def col(self, var: str) -> str:
        if var in self._names:
            return self._names[var]
        base = sanitize_name(var)
        name = base
        i = 0
        while name in self._used:
            i += 1
            name = f"{base}__{i}"
        self._names[var] = name
        self._used.add(name)
        return name

    def cols(self, fields) -> list[str]:
        return [self.col(f) for f in fields]
