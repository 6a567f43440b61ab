"""Built-in operation library — the analog of ``cascalog.logic.ops`` (the
``c/`` namespace, cascalog-core/src/clj/cascalog/logic/ops.clj) plus the
JCascalog op classes (src/java/jcascalog/op/*.java) and cascalog-math stats
(cascalog-math/src/cascalog/math/stats.clj:7-48).

Everything here is a native Column-expression op, so Catalyst sees through it
(predicate pushdown, codegen, partial aggregation all apply) — the single most
important perf decision vs the reference's opaque-JVM-closure ops (SURVEY §4).
"""

from __future__ import annotations

import operator as _pyop

from pyspark.sql import functions as F

from .ops import (BufferOp, FilterOp, LimitAgg, MapcatOp, MapOp, ParallelAgg,
                  column_filter, column_op)

# ---------------------------------------------------------------------------
# scalar map ops (JCascalog Plus/Minus/Multiply/Div + api.clj `div`)

def _ng(fn):
    """Python mirror with Spark NULL propagation: any NULL input -> NULL
    output (for filters, NULL is falsy so the row drops — same as a NULL
    boolean in a WHERE clause)."""
    def wrapped(*vals):
        if any(v is None for v in vals):
            return None
        return fn(*vals)
    return wrapped


def _jmod(a, b):
    """Java/Spark ``%``: remainder keeps the DIVIDEND's sign (Python ``%``
    follows the divisor)."""
    import math

    r = math.fmod(a, b)
    return int(r) if isinstance(a, int) and isinstance(b, int) else r


add = column_op("add", lambda *cs: _reduce_bin(lambda a, b: a + b, cs),
                py_fn=_ng(lambda *vs: _reduce_bin(lambda a, b: a + b, vs)))
sub = column_op("sub", lambda *cs: _reduce_bin(lambda a, b: a - b, cs) if len(cs) > 1 else -cs[0],
                py_fn=_ng(lambda *vs: _reduce_bin(lambda a, b: a - b, vs)
                          if len(vs) > 1 else -vs[0]))
mult = column_op("mult", lambda *cs: _reduce_bin(lambda a, b: a * b, cs),
                 py_fn=_ng(lambda *vs: _reduce_bin(lambda a, b: a * b, vs)))
# div coerces to double — reference: api.clj:237-242 (Ratio-safe division)
div = column_op("div", lambda *cs: _reduce_bin(lambda a, b: a.cast("double") / b, cs),
                py_fn=_ng(lambda *vs: _reduce_bin(
                    lambda a, b: float(a) / b, vs)))
mod = column_op("mod", lambda a, b: a % b, py_fn=_ng(_jmod))
negate_num = column_op("neg", lambda c: -c, py_fn=_ng(lambda v: -v))


def _reduce_bin(f, cols):
    acc = cols[0]
    for c in cols[1:]:
        acc = f(acc, c)
    return acc


# comparison filters (JCascalog LT/GT/LTE/GTE/Equals)
lt = column_filter("lt", lambda a, b: a < b, py_fn=_ng(_pyop.lt))
gt = column_filter("gt", lambda a, b: a > b, py_fn=_ng(_pyop.gt))
lte = column_filter("lte", lambda a, b: a <= b, py_fn=_ng(_pyop.le))
gte = column_filter("gte", lambda a, b: a >= b, py_fn=_ng(_pyop.ge))
eq = column_filter("eq", lambda *cs: _all_pairs_eq(cs),
                   py_fn=lambda *vs: all(_null_eq(vs[0], v)
                                         for v in vs[1:]))
# null-safe negation: Clojure (not= nil nil) is false; plain != drops
# rows where either side is null (ADVICE r1)
ne = column_filter("ne", lambda a, b: ~a.eqNullSafe(b),
                   py_fn=lambda a, b: not _null_eq(a, b))
odd = column_filter("odd", lambda c: c % 2 != 0,
                    py_fn=_ng(lambda v: _jmod(v, 2) != 0))
even = column_filter("even", lambda c: c % 2 == 0,
                     py_fn=_ng(lambda v: _jmod(v, 2) == 0))
is_null = column_filter("is_null", lambda c: c.isNull(),
                        py_fn=lambda v: v is None)
not_null = column_filter("not_null", lambda c: c.isNotNull(),
                         py_fn=lambda v: v is not None)


def _null_eq(a, b) -> bool:
    if a is None and b is None:
        return True
    if a is None or b is None:
        return False
    return a == b


def _all_pairs_eq(cs):
    # eqNullSafe: Clojure (= nil nil) is true, and the engine's implicit
    # dup-var equality uses null-safe compare — keep !var semantics
    # consistent (ADVICE r1)
    acc = cs[0].eqNullSafe(cs[1])
    for c in cs[2:]:
        acc = acc & cs[0].eqNullSafe(c)
    return acc


# string ops
str_concat = column_op(
    "str", lambda *cs: F.concat(*[c.cast("string") for c in cs]),
    py_fn=_ng(lambda *vs: "".join(_spark_str(v) for v in vs)))
lower = column_op("lower", F.lower, py_fn=_ng(str.lower))
upper = column_op("upper", F.upper, py_fn=_ng(str.upper))
trim = column_op("trim", F.trim, py_fn=_ng(lambda s: s.strip(" ")))
length = column_op("length", F.length, py_fn=_ng(len))
substring = column_op(
    "substring", lambda c, start, ln: F.substring(c, start, ln),
    py_fn=_ng(lambda s, start, ln: _substr(s, start, ln)))


def _spark_str(v) -> str:
    """CAST(x AS STRING) spelling — booleans lowercase, doubles via repr."""
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        return repr(v)
    return str(v)


def _substr(s: str, start: int, ln: int) -> str:
    """Spark ``substring``: 1-based, negative start counts from the end."""
    if start > 0:
        i = start - 1
    elif start < 0:
        i = max(len(s) + start, 0)
    else:
        i = 0
    return s[i:i + max(ln, 0)]

# c/re-parse (ops.clj:154-158): regex groups from string.
def re_parse(pattern: str) -> MapcatOp:
    """All regex matches of ``pattern`` in the input string, one row each
    (reference: ops.clj:154-158 uses re-seq = find-all)."""
    import re as _re

    return MapcatOp(name="re-parse",
                    column_fn=lambda c, _p=pattern: F.regexp_extract_all(c, F.lit(_p), 0),
                    py_fn=_ng(lambda s, _p=pattern:
                              [m.group(0) for m in _re.finditer(_p, s)]))


def re_extract(pattern: str, group: int = 1) -> MapOp:
    import re as _re

    def _py(s, _p=pattern, _g=group):
        m = _re.search(_p, s)
        return m.group(_g) if m else ""  # Spark: no match -> empty string

    return MapOp(name="re-extract",
                 column_fn=lambda c, _p=pattern, _g=group: F.regexp_extract(c, _p, _g),
                 py_fn=_ng(_py))


def split(pattern: str = r"\s+") -> MapcatOp:
    """Tokenize: 1 string row → n token rows.  Native split+explode, JVM-side."""
    import re as _re

    return MapcatOp(
        name="split",
        column_fn=lambda c, _p=pattern: F.filter(F.split(c, _p), lambda x: x != F.lit("")),
        py_fn=_ng(lambda s, _p=pattern:
                  [t for t in _re.split(_p, s) if t != ""]))


def _py_to_ts(v):
    """Python mirror of ``F.to_timestamp`` for the common ISO spellings."""
    import datetime as _dt

    if isinstance(v, _dt.datetime):
        return v
    if isinstance(v, _dt.date):
        return _dt.datetime(v.year, v.month, v.day)
    try:
        return _dt.datetime.fromisoformat(str(v))
    except ValueError:
        return None  # Spark to_timestamp: unparseable -> NULL


# date ops (Cascading DateParser analog — cascading_api_test.clj:43-76)
date_parse = column_op("date_parse", lambda c: F.to_timestamp(c),
                       py_fn=_ng(_py_to_ts))
year_of = column_op("year", F.year, py_fn=_ng(lambda d: d.year))
month_of = column_op("month", F.month, py_fn=_ng(lambda d: d.month))

identity_op = column_op("identity",
                        lambda *cs: list(cs) if len(cs) > 1 else cs[0],
                        py_fn=lambda *vs: vs if len(vs) > 1 else vs[0])


def round_to(n: int) -> MapOp:
    """Factory: round to n decimals (scale must be a Python int for F.round).
    Python mirror uses HALF_UP Decimal quantize on the exact binary double
    (matching Spark's BigDecimal rounding, not Python's banker's round)."""
    import decimal as _dec

    def _py(v, _n=n):
        q = _dec.Decimal(1).scaleb(-_n)
        return float(_dec.Decimal(v).quantize(q, rounding=_dec.ROUND_HALF_UP))

    return column_op(f"round{n}", lambda c_: F.round(c_, n), py_fn=_ng(_py))


def _py_json_get(s: str, path: str):
    """Python mirror of ``F.get_json_object`` for the ``$.a.b[i]`` subset:
    returns the value as Spark spells it (strings bare, booleans lowercase,
    objects/arrays as compact JSON), None on invalid JSON / missing path."""
    import json as _json
    import re as _re

    if s is None or not path.startswith("$"):
        return None
    try:
        cur = _json.loads(s)
    except (ValueError, TypeError):
        return None
    for tok in _re.findall(r"\.([^.\[\]]+)|\[(\d+)\]", path[1:]):
        key, idx = tok
        try:
            cur = cur[int(idx)] if idx else cur[key]
        except (KeyError, IndexError, TypeError):
            return None
    if cur is None or isinstance(cur, str):
        return cur
    if isinstance(cur, bool):
        return "true" if cur else "false"
    if isinstance(cur, (dict, list)):
        return _json.dumps(cur, separators=(",", ":"))
    return repr(cur) if isinstance(cur, float) else str(cur)


def json_get(path: str) -> MapOp:
    """Extract a JSON field (F.get_json_object) — the reference has no JSON
    lib; this is the 'host-language fns' extension point (SURVEY §2.8)."""
    return column_op("json_get", lambda c_: F.get_json_object(c_, path),
                     py_fn=_ng(lambda s: _py_json_get(s, path)))


# cast_to dtypes with faithful Python mirrors of Spark's ANSI CAST (the
# Spark 4 session default: malformed input RAISES, matching the Column
# behavior); anything else (timestamps, decimals, nested types) stays
# Spark-only
_PY_CASTS = {
    "int": lambda v: _py_int_cast(v, 32), "integer": lambda v: _py_int_cast(v, 32),
    "bigint": lambda v: _py_int_cast(v, 64), "long": lambda v: _py_int_cast(v, 64),
    "double": lambda v: float(v), "float": lambda v: float(v),
    "string": lambda v: _spark_str(v),
    "boolean": lambda v: _py_bool_cast(v),
}


def _py_int_cast(v, bits: int):
    if isinstance(v, bool):
        return int(v)
    # strings must be whole integers; numerics truncate toward zero
    n = int(v.strip()) if isinstance(v, str) else int(v)
    lo, hi = -(1 << (bits - 1)), (1 << (bits - 1)) - 1
    if not lo <= n <= hi:  # ANSI overflow errors like Spark's
        raise ValueError(f"cast overflow: {n} out of {bits}-bit range")
    return n


def _py_bool_cast(v):
    if isinstance(v, bool):
        return v
    if isinstance(v, str):
        t = v.strip().lower()
        if t in ("true", "t", "yes", "y", "1"):
            return True
        if t in ("false", "f", "no", "n", "0"):
            return False
        raise ValueError(f"cannot cast {v!r} to boolean")
    return bool(v)


def cast_to(dtype: str) -> MapOp:
    mirror = _PY_CASTS.get(dtype.lower())
    return column_op(f"cast_{dtype}", lambda c_: c_.cast(dtype),
                     py_fn=_ng(mirror) if mirror else None)


def sample(fraction: float, seed=None) -> FilterOp:
    """sample* (operations.clj:109-116): Bernoulli row sample, optional
    seed.  Zero-input filter: (c.sample(0.1, 42),)."""
    r = F.rand(seed) if seed is not None else F.rand()
    import random as _rnd

    rng = _rnd.Random(seed)
    return FilterOp(name="sample", column_fn=lambda *_: r < fraction,
                    py_fn=lambda *_: rng.random() < fraction)


def debug() -> FilterOp:
    """debug* (operations.clj:95-98): print tuples flowing through (executor
    stdout), pass everything."""

    def py_fn(*vals):
        print("DEBUG:", vals)
        return True

    return FilterOp(name="debug", py_fn=py_fn)


# ---------------------------------------------------------------------------
# aggregators (ops.clj:160-253; ops_impl.clj)

count = ParallelAgg("count", expr_fn=lambda *cs: F.count(F.lit(1)),
                    pandas_fn=lambda pdf: len(pdf), returns=("bigint",))
# c/!count — count of non-null values (ops.clj:170): F.count(col) is null-skipping
count_notnull = ParallelAgg("!count", expr_fn=lambda c: F.count(c),
                            pandas_fn=lambda pdf: int(pdf.iloc[:, 0].count()),
                            returns=("bigint",))
sum_agg = ParallelAgg("sum", expr_fn=lambda c: F.sum(c),
                      pandas_fn=lambda pdf: pdf.iloc[:, 0].sum())
min_agg = ParallelAgg("min", expr_fn=lambda c: F.min(c),
                      pandas_fn=lambda pdf: pdf.iloc[:, 0].min())
max_agg = ParallelAgg("max", expr_fn=lambda c: F.max(c),
                      pandas_fn=lambda pdf: pdf.iloc[:, 0].max())
avg = ParallelAgg("avg", expr_fn=lambda c: F.avg(c),
                  pandas_fn=lambda pdf: pdf.iloc[:, 0].mean())
distinct_count = ParallelAgg("distinct-count",
                             expr_fn=lambda *cs: F.count_distinct(*cs),
                             pandas_fn=lambda pdf: len(pdf.drop_duplicates()))
approx_distinct_count = ParallelAgg("approx-distinct-count",
                                    expr_fn=lambda *cs: F.approx_count_distinct(*cs))
# Mergeable distinct-count sketches (Datasketches HLL): build per-batch/
# partition sketches, store them as binary columns, union across batches
# later — the incremental-analytics pattern where re-scanning history for
# each day's distinct-users number is a 100 TB non-starter.
hll_sketch = ParallelAgg("hll-sketch",
                         expr_fn=lambda c: F.hll_sketch_agg(c))
hll_union = ParallelAgg("hll-union",
                        expr_fn=lambda c: F.hll_union_agg(c))
hll_estimate = column_op("hll-estimate", F.hll_sketch_estimate)
collect_list = ParallelAgg("collect-list", expr_fn=lambda c: F.collect_list(c),
                           pandas_fn=lambda pdf:
                           [v for v in pdf.iloc[:, 0] if v is not None])
collect_set = ParallelAgg("collect-set", expr_fn=lambda c: F.collect_set(c),
                          pandas_fn=lambda pdf: sorted(
                              {v for v in pdf.iloc[:, 0] if v is not None},
                              key=repr))
first_agg = ParallelAgg("first", expr_fn=lambda c: F.first(c, ignorenulls=False),
                        pandas_fn=lambda pdf: pdf.iloc[0, 0])

def percentile(p: float) -> ParallelAgg:
    """Exact interpolated percentile aggregator (order statistics beyond
    the reference's monoid set; Spark ``percentile`` ↔ DuckDB
    ``quantile_cont`` ↔ pandas ``quantile(interpolation='linear')``)."""
    if not 0.0 <= p <= 1.0:
        raise ValueError(f"percentile: p must be in [0,1], got {p}")
    return ParallelAgg(
        f"percentile-{p}",
        expr_fn=lambda c: F.percentile(c, F.lit(float(p))),
        pandas_fn=lambda pdf: pdf.iloc[:, 0].quantile(p,
                                                      interpolation="linear"),
        returns=("double",))


def median() -> ParallelAgg:
    return percentile(0.5)


def approx_percentile(p: float, accuracy: int = 10_000) -> ParallelAgg:
    """Approximate percentile (Greenwald-Khanna sketch,
    ``F.percentile_approx``) — the 100 TB path: the sketch merges
    map-side in O(accuracy) memory per group, where the exact
    ``c.percentile`` must shuffle and sort every value.  Error is bounded
    by ``1/accuracy`` rank fraction.  Approximation is engine-specific, so
    queries using it get rows-only oracle checks (like
    ``c.approx_distinct``); tests bound it against the exact aggregator."""
    if not 0.0 <= p <= 1.0:
        raise ValueError(f"approx_percentile: p must be in [0,1], got {p}")
    return ParallelAgg(
        f"approx-percentile-{p}",
        expr_fn=lambda c: F.percentile_approx(c, F.lit(float(p)),
                                              F.lit(int(accuracy))),
        returns=("double",))


# cascalog-math stats.clj:24-48 (+ Welford 1-pass variance, stats.clj:7-22 —
# Spark's var_pop/var_samp are already single-pass numerically stable)
var_pop = ParallelAgg("variance", expr_fn=lambda c: F.var_pop(c),
                      pandas_fn=lambda pdf: pdf.iloc[:, 0].var(ddof=0))
var_samp = ParallelAgg("sample-variance", expr_fn=lambda c: F.var_samp(c),
                       pandas_fn=lambda pdf: pdf.iloc[:, 0].var(ddof=1))
stddev_pop = ParallelAgg("stddev", expr_fn=lambda c: F.stddev_pop(c),
                         pandas_fn=lambda pdf: pdf.iloc[:, 0].std(ddof=0))
stddev_samp = ParallelAgg("sample-stddev", expr_fn=lambda c: F.stddev_samp(c),
                          pandas_fn=lambda pdf: pdf.iloc[:, 0].std(ddof=1))


def limit(n: int) -> LimitAgg:
    """Per-group top-n by the query's sort option (ops.clj:172-206).

    Compiled to Window+row_number — fully streaming, no 2n combiner buffer.
    """
    return LimitAgg(name="limit", n=n)


def limit_rank(n: int) -> LimitAgg:
    """Like limit but appends the 1-based rank (ops.clj:208-226)."""
    return LimitAgg(name="limit-rank", n=n, with_rank=True)


def fixed_sample(n: int, seed=None) -> LimitAgg:
    """Uniform random n-sample per group via random sort key + limit
    (ops.clj:255-269 + src/java/cascalog/ops/RandLong.java).
    Spark: Window ordered by rand(seed) + row_number <= n."""
    return LimitAgg(name="fixed-sample", n=n, random=True, seed=seed)


def fixed_sample_deterministic(n: int, seed: int = 42) -> LimitAgg:
    """``c/fixed-sample`` with a content-derived sort key: order by
    ``md5(concat(values, seed))`` and keep the first n.

    Same uniform-sample shape as ``fixed_sample`` (md5 of distinct inputs
    is uniform), but the selected set is a pure function of (data, seed) —
    stable across engines, retries, and partitionings, so it is
    oracle-checkable and safe to use in pipelines that must be
    reproducible (the `rand()`-keyed variant re-draws per task attempt).
    Global form compiles to TakeOrderedAndProject (per-partition heaps),
    never a single-partition sort."""
    return LimitAgg(name="fixed-sample-det", n=n, random=True, seed=seed,
                    deterministic=True)


# ---------------------------------------------------------------------------
# operator combinators (ops.clj:14-150).  Column-expression members compose
# into one Column expression (stays JVM-side); Python-fn members compose
# into one Python fn (ONE UDF instead of n).  Mixing the two kinds in a
# single combinator is rejected — a Column fn can't run on Python values
# nor vice versa; use separate predicates instead.

def _combine_mode(ops, what: str) -> str:
    if all(getattr(o, "column_fn", None) is not None for o in ops):
        return "column"
    if all(getattr(o, "py_fn", None) is not None for o in ops):
        return "py"
    raise ValueError(
        f"{what}: cannot combine JVM-expression ops with Python-fn ops in "
        "one combinator; compose same-kind ops or use separate predicates")


def comp(*ops):
    """Compose map ops right-to-left (c/comp, ops.clj:34-44)."""
    ops = [o for o in ops]
    if _combine_mode(ops, "comp") == "py":
        def py_fn(*vals):
            vals = list(vals)
            for op in reversed(ops):
                out = op.py_fn(*vals)
                vals = list(out) if op.n_out > 1 else [out]
            return tuple(vals) if len(vals) > 1 else vals[0]

        first = ops[0]
        return MapOp(name="comp", py_fn=py_fn,
                     returns=list(first.returns) or ["string"],
                     n_out=first.n_out)

    def column_fn(*cs):
        vals = list(cs)
        for op in reversed(ops):
            out = op.column_fn(*vals)
            vals = out if isinstance(out, list) else [out]
        return vals if len(vals) > 1 else vals[0]

    return MapOp(name="comp", column_fn=column_fn)


def juxt(*ops):
    """Apply n ops to same inputs producing n outputs (c/juxt, ops.clj:46-55)."""
    if _combine_mode(ops, "juxt") == "py":
        return MapOp(name="juxt",
                     py_fn=lambda *vals: tuple(op.py_fn(*vals) for op in ops),
                     returns=[
                         (list(op.returns) or ["string"])[0] for op in ops],
                     n_out=len(ops))

    def column_fn(*cs):
        return [op.column_fn(*cs) for op in ops]

    return MapOp(name="juxt", column_fn=column_fn, n_out=len(ops))


def each(op):
    """Apply a 1-in/1-out op to every input var (c/each, ops.clj:57-70).
    Column-expression ops only (output arity is the input arity, which a
    Python UDF's fixed return schema can't express)."""
    if getattr(op, "column_fn", None) is None:
        raise ValueError(f"each({op.name}): requires a Column-expression op")

    def column_fn(*cs):
        return [op.column_fn(c) for c in cs]

    m = MapOp(name=f"each-{op.name}", column_fn=column_fn)
    m.dynamic_n_out = True  # type: ignore[attr-defined]
    return m


def partial(op, *consts):
    """Partially apply leading args with constants (c/partial, ops.clj:72-84).
    Preserves the op's kind, return types and arity."""
    import dataclasses

    if isinstance(op, ParallelAgg):
        return ParallelAgg(
            name=f"partial-{op.name}",
            expr_fn=lambda *cs: op.expr_fn(*[F.lit(k) for k in consts], *cs),
            n_out=op.n_out, returns=op.returns)
    kwargs = {}
    if op.column_fn is not None:
        cfn = op.column_fn
        kwargs["column_fn"] = \
            lambda *cs: cfn(*[F.lit(k) for k in consts], *cs)
    if op.py_fn is not None:
        pfn = op.py_fn
        kwargs["py_fn"] = lambda *vals: pfn(*consts, *vals)
    return dataclasses.replace(op, name=f"partial-{op.name}", **kwargs)


def negate(filter_op: FilterOp) -> FilterOp:
    """c/negate (ops.clj:98-107)."""
    if filter_op.column_fn is not None:
        return FilterOp(name=f"not-{filter_op.name}",
                        column_fn=lambda *cs: ~filter_op.column_fn(*cs))
    return FilterOp(name=f"not-{filter_op.name}",
                    py_fn=lambda *vals: not filter_op.py_fn(*vals))


def all_filters(*fops) -> FilterOp:
    """c/all — conjunction of filters (ops.clj:109-129)."""
    if _combine_mode(fops, "all_filters") == "py":
        return FilterOp(name="all",
                        py_fn=lambda *v: all(f.py_fn(*v) for f in fops))

    def column_fn(*cs):
        acc = fops[0].column_fn(*cs)
        for f in fops[1:]:
            acc = acc & f.column_fn(*cs)
        return acc

    return FilterOp(name="all", column_fn=column_fn)


def any_filters(*fops) -> FilterOp:
    """c/any — disjunction of filters (ops.clj:131-150)."""
    if _combine_mode(fops, "any_filters") == "py":
        return FilterOp(name="any",
                        py_fn=lambda *v: any(f.py_fn(*v) for f in fops))

    def column_fn(*cs):
        acc = fops[0].column_fn(*cs)
        for f in fops[1:]:
            acc = acc | f.column_fn(*cs)
        return acc

    return FilterOp(name="any", column_fn=column_fn)


# ---------------------------------------------------------------------------
# auto-lift table for common Python callables used directly as predicates
# (reference: any Clojure fn is a predicate — predicate.clj:87-98; tests use
# str, +, *, <, odd? directly.  The Python analogs map to native Column ops.)

KNOWN_CALLABLES = {
    _pyop.add: add,
    _pyop.sub: sub,
    _pyop.mul: mult,
    _pyop.truediv: div,
    _pyop.mod: mod,
    _pyop.lt: lt,
    _pyop.gt: gt,
    _pyop.le: lte,
    _pyop.ge: gte,
    _pyop.eq: eq,
    _pyop.ne: ne,
    str: MapOp(name="str",
               column_fn=lambda *cs: F.concat(*[c.cast("string") for c in cs]),
               py_fn=_ng(lambda *vs: "".join(_spark_str(v) for v in vs))),
    len: column_op("len", F.length, py_fn=_ng(len)),
    abs: column_op("abs", F.abs, py_fn=_ng(abs)),
    # Spark greatest/least skip NULL args (NULL only when ALL are NULL).
    # _pymax/_pymin bind the BUILTINS: the module later rebinds max/min to
    # the c/max / c/min aggregator aliases, which a late global lookup
    # inside the lambda would pick up instead
    max: column_op("greatest", lambda *cs: F.greatest(*cs),
                   py_fn=lambda *vs, _pymax=max: _pymax(
                       (v for v in vs if v is not None), default=None)),
    min: column_op("least", lambda *cs: F.least(*cs),
                   py_fn=lambda *vs, _pymin=min: _pymin(
                       (v for v in vs if v is not None), default=None)),
}


# Reference-name aliases, LAST so they can't shadow Python builtins anywhere
# above: Cascalog spells the aggregators c/sum, c/min, c/max (ops.clj
# def-aggregateops), while the Python builtins max/min passed directly as
# predicates keep their scalar greatest/least lifting via PY_FN_MAP.
sum = sum_agg
min = min_agg
max = max_agg
