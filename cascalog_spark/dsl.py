"""Textual query form — an s-expression mini-parser for the Datalog-ish
surface (the reference's ``<-`` macro syntax, parse.clj Stage 1)::

    q = parse_query('''
        [?word ?n]
        (sentences ?s)
        (split ?s :> ?word)
        (count ?n)
    ''', env={"sentences": df, "split": c.split()})

Resolution order for head symbols: the ``env`` dict, then the ``c``
builtin namespace (so ``count``, ``sum_agg``, ``lt``… work unqualified).
Atoms: ``?x !x !!x _`` logic vars, ``:>``/``:<`` selectors, ints, floats,
``"strings"``, ``true/false/nil``.
"""

from __future__ import annotations

import re
from typing import Any, Optional

from .api import Query

_TOKEN = re.compile(r'"(?:[^"\\]|\\.)*"|[()\[\]]|[^\s()\[\]]+')


def _tokenize(src: str) -> list[str]:
    return _TOKEN.findall(src)


def _read(tokens: list[str], i: int = 0):
    """Recursive-descent reader → nested Python lists ('(' and '[' both
    read as lists; the first bracket form is the output vector)."""
    forms = []
    while i < len(tokens):
        t = tokens[i]
        if t in "([":
            close = ")" if t == "(" else "]"
            sub, i = _read_until(tokens, i + 1, close)
            forms.append(sub)
        elif t in ")]":
            raise ValueError(f"unbalanced {t!r} at token {i}")
        else:
            forms.append(t)
            i += 1
    return forms


def _read_until(tokens, i, close):
    out = []
    while True:
        if i >= len(tokens):
            raise ValueError(f"missing {close!r}")
        t = tokens[i]
        if t == close:
            return out, i + 1
        if t in "([":
            c2 = ")" if t == "(" else "]"
            sub, i = _read_until(tokens, i + 1, c2)
            out.append(sub)
        elif t in ")]":
            raise ValueError(f"mismatched {t!r}")
        else:
            out.append(t)
            i += 1


def _atom(tok: str) -> Any:
    """Literal / logic-var / selector resolution for argument position."""
    if tok.startswith('"'):
        return tok[1:-1].replace('\\"', '"')
    if tok in ("true", "True"):
        return True
    if tok in ("false", "False"):
        return False
    if tok in ("nil", "None"):
        return None
    if tok.startswith(("?", "!", ":")) or tok == "_":
        return tok  # logic var / selector — stays a string
    try:
        return int(tok)
    except ValueError:
        pass
    try:
        return float(tok)
    except ValueError:
        pass
    return tok


def _resolve_head(sym: str, env: dict) -> Any:
    if sym in env:
        return env[sym]
    from . import builtin as c

    if hasattr(c, sym):
        return getattr(c, sym)
    # common aliases for the reference's op names
    alias = {"count": c.count, "sum": c.sum_agg, "min": c.min_agg,
             "max": c.max_agg, "avg": c.avg, "+": c.add, "-": c.sub,
             "*": c.mult, "/": c.div, "<": c.lt, ">": c.gt, "<=": c.lte,
             ">=": c.gte, "=": c.eq, "!=": c.ne}
    if sym in alias:
        return alias[sym]
    raise ValueError(f"unresolved symbol {sym!r} — add it to env")


def parse_query(src: str, env: Optional[dict] = None, **options) -> Query:
    """Parse the textual Datalog-ish form into a Query (``<-`` analog)."""
    env = env or {}
    forms = _read(_tokenize(src))
    if not forms or not isinstance(forms[0], list):
        raise ValueError("query must start with an output vector [ ... ]")
    outfields = [str(f) for f in forms[0]]
    preds = []
    for form in forms[1:]:
        if not isinstance(form, list) or not form:
            raise ValueError(f"predicate must be a non-empty form: {form!r}")
        head_sym = form[0]
        if isinstance(head_sym, list):
            raise ValueError("predicate head must be a symbol")
        if head_sym.startswith(":"):  # option predicate, e.g. (:distinct true)
            preds.append((head_sym, *[_atom(a) for a in form[1:]]))
            continue
        head = _resolve_head(head_sym, env)
        preds.append((head, *[_resolve_arg(a) for a in form[1:]]))
    return Query(outfields, *preds, **options)


def _resolve_arg(a):
    """Atomize an argument, recursing into nested vectors (the ``:<<`` /
    ``:>>`` vararg payloads are written as ``[?a ?b]`` sub-vectors)."""
    if isinstance(a, list):
        return [_resolve_arg(x) for x in a]
    return _atom(a) if isinstance(a, str) else a
