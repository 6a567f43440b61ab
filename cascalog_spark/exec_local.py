"""In-memory execution platform — runs a Query WITHOUT Spark.

The reference engine is dual-platform: the same query AST executes on
Cascading or on a pure-Clojure in-memory interpreter selected at runtime
(cascalog-core/src/clj/cascalog/api.clj:142-149 ``with-platform``;
in_memory/platform.clj:100-260), and the whole API test suite runs on
both.  This module is that second platform for the Spark engine: a pure
Python interpreter over the SAME logical plan the Spark compiler
consumes (planner.py IR), so user queries built from in-memory data and
Python ops can be unit-tested with zero JVM/Spark dependency —
``q(...).run(platform="local")`` — and the two platforms cross-check
each other (tests/test_dual_platform.py; the hypothesis differential
suite fuzzes the same equivalence).

Semantics mirror the Spark compiler rule-for-rule (compiler.py is the
authority; each rule cites the behavior it reproduces):

- ``?``-var null filtering at generators and projections
- constant bindings -> pushed equality (null-safe), dup vars -> implicit
  null-safe equality
- joins: plain-equality keys (nulls never match), USING-style key
  coalescing, inner/left/right/full from groundness, cross join
- existence joins: semi / anti / boolean flag (null keys never match)
- grouping: null group keys form a group; secondary sort (pandas
  ``sort_values`` convention: None last both directions — the
  applyInPandas path) for sequential/buffer aggs; Spark sort convention
  (nulls first asc / last desc) for bufferiter and c/limit
- global aggregate over zero rows: one row for pure ParallelAgg
  groupings (count-like -> 0, else NULL — Spark's agg-on-empty), no rows
  once any sequential/buffer agg participates (reduce-side semantics)

Supported ops: anything with a Python implementation — ``py_fn`` map /
mapcat / filter ops (the builtins carry Python mirrors of their Column
expressions), ``pandas_fn`` ParallelAggs, SequentialAgg, BufferOp,
BufferIterOp, ParallelBufOp, LimitAgg (including the deterministic
md5-keyed sample, value-identical to the Spark compilation).  Ops that
exist only as Column expressions raise ``LocalPlatformUnsupported`` with
the op name — the caller should run those on the Spark platform.
"""

from __future__ import annotations

import hashlib
import itertools
from typing import Any

from . import vars as V
from .ops import (BufferIterOp, BufferOp, FilterOp, LimitAgg, MapcatOp,
                  MapOp, ParallelAgg, ParallelBufOp, SequentialAgg)
from .planner import (ApplicationNode, EqualityFilterNode, ExistenceJoinNode,
                      FilterNode, GeneratorNode, GroupingNode, JoinNode,
                      MergeNode, Node, ProjectionNode, UniqueNode)


class LocalPlatformUnsupported(TypeError):
    """The query uses a feature only the Spark platform can execute."""


# -- scalar helpers ----------------------------------------------------------

def _eq_nullsafe(a, b) -> bool:
    """Spark ``eqNullSafe``: NULL <=> NULL is true."""
    if a is None and b is None:
        return True
    if a is None or b is None:
        return False
    return a == b


def spark_str(v) -> str:
    """Spark's CAST(x AS STRING) for the scalar types the engine moves —
    booleans are lowercase, floats use Java's shortest form (Python repr
    matches for doubles)."""
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        return repr(v)
    return str(v)


def _norm_scalar(v):
    """numpy/pandas scalars -> plain Python (what Spark's Arrow boundary
    would hand back)."""
    item = getattr(v, "item", None)
    if item is not None and not isinstance(v, (bytes, str)):
        try:
            return v.item()
        except (ValueError, AttributeError):
            return v
    return v


def _sort_rows(rows, cols, ascending: bool, nulls: str):
    """Stable multi-column sort.  ``nulls='last'`` = the pandas
    ``sort_values`` convention (applyInPandas grouping path);
    ``nulls='spark'`` = ORDER BY convention (first asc / last desc)."""
    out = list(rows)
    for c in reversed(cols):
        nonnull = [r for r in out if r[c] is not None]
        null = [r for r in out if r[c] is None]
        nonnull.sort(key=lambda r: r[c], reverse=not ascending)
        if nulls == "spark" and ascending:
            out = null + nonnull
        else:
            out = nonnull + null
    return out


def _group_rows(rows, keys):
    """Group rows by key tuple; None is a legal key value (one group),
    insertion-ordered like Spark's hash aggregate is order-agnostic."""
    groups: dict[tuple, list] = {}
    for r in rows:
        k = tuple(r[c] for c in keys)
        groups.setdefault(k, []).append(r)
    return groups


def _op_py_fn(op, what: str):
    fn = getattr(op, "py_fn", None)
    if fn is None:
        raise LocalPlatformUnsupported(
            f"op '{getattr(op, 'name', op)}' has no Python implementation "
            f"({what} is Column-expression-only); run this query on the "
            "Spark platform: query.run(spark)")
    return fn


# -- the interpreter ---------------------------------------------------------

class LocalExecutor:
    """Post-order walk over the planner IR producing list-of-dict rows
    (var name -> value) — the in-memory analog of compiler.Compiler."""

    def __init__(self):
        self._memo: dict[str, list[dict]] = {}

    def run_query(self, query) -> list[tuple]:
        opts = getattr(query, "options", {}) or {}
        if opts.get("trap") is not None:
            raise LocalPlatformUnsupported(
                ":trap diverts rows to a Spark sink; run on the Spark "
                "platform")
        rows = self.execute(query.plan())
        out = [tuple(r[f] for f in query.outfields) for r in rows]
        limit = opts.get("limit")
        return out[: int(limit)] if limit is not None else out

    def execute(self, node: Node) -> list[dict]:
        got = self._memo.get(node.node_id)
        if got is None:
            m = getattr(self, f"_exec_{type(node).__name__}", None)
            if m is None:
                raise LocalPlatformUnsupported(
                    f"no local rule for {type(node).__name__}")
            got = m(node)
            self._memo[node.node_id] = got
        return got

    # -- sources --------------------------------------------------------

    def _source_rows(self, source) -> tuple[list[str] | None, list[tuple]]:
        """-> (field names | None for positional, list of value tuples)."""
        if isinstance(source, (list, tuple)):
            if len(source) == 0:
                raise ValueError(
                    "can't use an empty collection as a generator")
            return None, [tuple(r) if isinstance(r, (tuple, list)) else (r,)
                          for r in source]
        if hasattr(source, "rows") and hasattr(source, "fields") \
                and source.rows is not None:
            # MemoryTap
            return list(source.fields), [tuple(r) for r in source.rows]
        if hasattr(source, "source") and hasattr(source, "sink"):
            # CascalogTap: read side of the pair
            return self._source_rows(source.source)
        if hasattr(source, "load_rows"):
            # file taps: the Spark-free reader (pyarrow/pandas)
            try:
                return source.load_rows()
            except TypeError as e:
                raise LocalPlatformUnsupported(str(e)) from e
        if hasattr(source, "local_rows"):
            # generator wrappers (first_n, ...) that can transform their
            # inner generator's rows without Spark: they receive this
            # method so nested subqueries still execute through the memo
            return source.local_rows(self._source_rows)
        if hasattr(source, "__cascalog_generator__"):
            if hasattr(source, "gens"):  # _MergedGen (combine/union)
                fields, rows = self._source_rows(source.gens[0])
                for g in source.gens[1:]:
                    _, more = self._source_rows(g)
                    rows = rows + more
                if source.distinct:
                    rows = list(dict.fromkeys(rows))
                return fields, rows
            if hasattr(source, "plan") and hasattr(source, "outfields"):
                # subquery-as-generator: its columns are the sanitized
                # out_names (what to_df would expose)
                from .api import out_names

                sub = self.execute(source.plan())
                names = out_names(source.outfields)
                return names, [tuple(r[f] for f in source.outfields)
                               for r in sub]
        raise LocalPlatformUnsupported(
            f"generator {type(source).__name__} needs Spark (only "
            "lists, MemoryTap, subqueries and combine/union run locally)")

    def _exec_GeneratorNode(self, node: GeneratorNode) -> list[dict]:
        names, rows = self._source_rows(node.source)

        def idx(colref):
            if isinstance(colref, int):
                return colref
            if names is None:
                raise LocalPlatformUnsupported(
                    f"named binding {colref!r} on a positional generator")
            return names.index(colref)

        for colref, const in node.const_filters:
            i = idx(colref)
            rows = [r for r in rows if _eq_nullsafe(r[i], const)]
        out = []
        for r in rows:
            d = {v: r[idx(colref)] for v, colref in node.col_bindings.items()}
            if all(_eq_nullsafe(d[kept], d[extra])
                   for kept, extra in node.dup_filters):
                out.append({v: d[v] for v in node.fields})
        return _null_filter(out, node.fields)

    # -- row ops --------------------------------------------------------

    def _args(self, row: dict, infields) -> list:
        return [row[f] if V.is_var(f) else f for f in infields]

    def _exec_ApplicationNode(self, node: ApplicationNode) -> list[dict]:
        rows = self.execute(node.source)
        op, outs = node.op, node.outfields
        out = []
        if isinstance(op, MapOp):
            fn = _op_py_fn(op, "map op")
            for r in rows:
                res = fn(*self._args(r, node.infields))
                vals = tuple(res) if op.n_out > 1 else (res,)
                out.append({**r, **dict(zip(outs, map(_norm_scalar, vals)))})
        elif isinstance(op, MapcatOp):
            fn = _op_py_fn(op, "mapcat op")
            for r in rows:
                for res in (fn(*self._args(r, node.infields)) or []):
                    vals = (tuple(res) if op.n_out > 1 else
                            (res if not isinstance(res, (tuple, list))
                             else tuple(res)[0],))
                    out.append(
                        {**r, **dict(zip(outs, map(_norm_scalar, vals)))})
        else:
            raise LocalPlatformUnsupported(
                f"cannot apply {op!r} as a map operation")
        return _null_filter(out, outs)

    def _exec_FilterNode(self, node: FilterNode) -> list[dict]:
        rows = self.execute(node.source)
        fn = _op_py_fn(node.op, "filter op")
        return [r for r in rows if fn(*self._args(r, node.infields))]

    def _exec_EqualityFilterNode(self, node: EqualityFilterNode) -> list[dict]:
        rows = self.execute(node.source)
        out = []
        for r in rows:
            if _eq_nullsafe(r[node.left], r[node.right]):
                out.append({k: v for k, v in r.items() if k != node.right})
        return out

    # -- joins ----------------------------------------------------------

    def _exec_JoinNode(self, node: JoinNode) -> list[dict]:
        left = self.execute(node.left)
        right = self.execute(node.right)
        if not node.join_fields:
            return [{**l, **r} for l in left for r in right]
        keys = node.join_fields
        lf = _fields_of(left, node.left)
        rf = _fields_of(right, node.right)
        r_only = [f for f in rf if f not in keys]
        l_only = [f for f in lf if f not in keys]

        def key_of(row):
            k = tuple(row[c] for c in keys)
            return None if any(v is None for v in k) else k  # nulls no-match

        rindex: dict[tuple, list] = {}
        for r in right:
            k = key_of(r)
            if k is not None:
                rindex.setdefault(k, []).append(r)
        out, matched_r = [], set()
        for l in left:
            k = key_of(l)
            matches = rindex.get(k, []) if k is not None else []
            if matches:
                if node.how in ("inner", "left", "right", "full"):
                    for r in matches:
                        matched_r.add(id(r))
                        out.append({**{c: l[c] for c in keys},
                                    **{c: l[c] for c in l_only},
                                    **{c: r[c] for c in r_only}})
            elif node.how in ("left", "full"):
                out.append({**{c: l[c] for c in keys},
                            **{c: l[c] for c in l_only},
                            **{c: None for c in r_only}})
        if node.how in ("right", "full"):
            for r in right:
                if id(r) not in matched_r:
                    out.append({**{c: r[c] for c in keys},
                                **{c: None for c in l_only},
                                **{c: r[c] for c in r_only}})
        return out

    def _exec_ExistenceJoinNode(self, node: ExistenceJoinNode) -> list[dict]:
        rows = self.execute(node.source)
        sub = self.execute(node.sub)
        keys = node.join_fields
        sub_keys = {tuple(r[c] for c in keys) for r in sub
                    if not any(r[c] is None for c in keys)}

        def match(r):
            k = tuple(r[c] for c in keys)
            return not any(v is None for v in k) and k in sub_keys

        if node.mode == "semi":
            return [r for r in rows if match(r)]
        if node.mode == "anti":
            return [r for r in rows if not match(r)]
        return [{**r, node.flag_var: match(r)} for r in rows]

    # -- set ops / projection --------------------------------------------

    def _exec_UniqueNode(self, node: UniqueNode) -> list[dict]:
        rows = self.execute(node.source)
        seen, out = set(), []
        for r in rows:
            k = tuple(_hashable(r[f]) for f in node.fields)
            if k not in seen:
                seen.add(k)
                out.append({f: r[f] for f in node.fields})
        return out

    def _exec_ProjectionNode(self, node: ProjectionNode) -> list[dict]:
        rows = _null_filter(self.execute(node.source), node.fields)
        return [{f: r[f] for f in node.fields} for r in rows]

    def _exec_MergeNode(self, node: MergeNode) -> list[dict]:
        out = []
        for s in node.sources:
            out.extend(self.execute(s))
        return out

    # -- grouping ---------------------------------------------------------

    def _exec_GroupingNode(self, node: GroupingNode) -> list[dict]:
        rows = self.execute(node.source)
        aggs = node.aggs
        if len(aggs) == 1 and isinstance(aggs[0].op, LimitAgg):
            return self._exec_limit(rows, node, aggs[0])
        if len(aggs) == 1 and isinstance(aggs[0].op, BufferIterOp):
            return self._exec_buffer_iter(rows, node, aggs[0])

        groups = _group_rows(rows, node.group_fields)
        # Spark agg-on-empty: ONE row for a global all-ParallelAgg
        # grouping, no rows once applyInPandas participates
        if not node.group_fields and not rows:
            if all(isinstance(a.op, ParallelAgg) for a in aggs):
                row = {}
                for a in aggs:
                    vals = _agg_empty(a.op)
                    row.update(zip(a.outfields, vals))
                return [row]
            return []

        out = []
        for key, grows in groups.items():
            row = dict(zip(node.group_fields, key))
            buffer_rows = None
            for a in aggs:
                op = a.op
                if isinstance(op, ParallelAgg):
                    vals = self._run_parallel_agg(op, a.infields, grows)
                elif isinstance(op, SequentialAgg):
                    vals = self._run_sequential_agg(op, a.infields, grows,
                                                    node)
                elif isinstance(op, BufferOp):
                    buffer_rows = self._run_buffer(op, a, grows, node, row)
                    continue
                elif isinstance(op, ParallelBufOp):
                    buffer_rows = self._run_parallel_buf(op, a, grows, row)
                    continue
                else:
                    raise LocalPlatformUnsupported(
                        f"aggregator {getattr(op, 'name', op)} not runnable "
                        "locally")
                row.update(zip(a.outfields, vals))
            if buffer_rows is not None:
                out.extend({**row, **b} for b in buffer_rows)
            else:
                out.append(row)
        return out

    def _agg_pdf(self, infields, grows):
        import pandas as pd

        if not infields:  # zero-input aggs (c/count): row count only
            return pd.DataFrame(index=range(len(grows)))
        cols = {f"_{i}": [r[f] if V.is_var(f) else f for r in grows]
                for i, f in enumerate(infields)}
        return pd.DataFrame(cols)

    def _run_parallel_agg(self, op: ParallelAgg, infields, grows):
        if op.pandas_fn is None:
            raise LocalPlatformUnsupported(
                f"aggregator '{op.name}' has no pandas fallback "
                "(Spark-native expression only)")
        res = op.pandas_fn(self._agg_pdf(infields, grows))
        vals = tuple(res) if isinstance(res, tuple) else (res,)
        return tuple(_norm_scalar(v) for v in vals)

    def _sorted_group(self, grows, node: GroupingNode, nulls: str):
        if not node.sort:
            return grows
        return _sort_rows(grows, node.sort, not node.reverse, nulls)

    def _run_sequential_agg(self, op: SequentialAgg, infields, grows, node):
        acc = op.init_fn()
        for r in self._sorted_group(grows, node, "last"):
            acc = op.step_fn(acc, *[r[f] if V.is_var(f) else f
                                    for f in infields])
        res = op.final_fn(acc) if op.final_fn else acc
        return tuple(res) if isinstance(res, tuple) else (res,)

    def _run_buffer(self, op: BufferOp, a, grows, node, keyrow):
        pdf = self._agg_pdf(a.infields,
                            self._sorted_group(grows, node, "last"))
        res = op.pandas_fn(pdf.reset_index(drop=True))
        outs = list(a.outfields)
        return [dict(zip(outs, map(_norm_scalar, row)))
                for row in res.itertuples(index=False, name=None)]

    def _run_parallel_buf(self, op: ParallelBufOp, a, grows, keyrow):
        inter = None
        for r in grows:
            cur = tuple(op.init_fn(*[r[f] if V.is_var(f) else f
                                     for f in a.infields]))
            inter = cur if inter is None else tuple(op.combine_fn(inter, cur))
        inters = []
        if inter is not None:
            if op.present_fn is not None:
                inter = tuple(op.present_fn(inter))
            inters.append(inter)
        outs = list(a.outfields)
        return [dict(zip(outs, (tuple(t) if isinstance(t, (tuple, list))
                                else (t,))))
                for t in op.buffer_fn(inters)]

    def _exec_limit(self, rows, node: GroupingNode, rp) -> list[dict]:
        """Mirror of compiler._compile_limit, value-identical for the
        deterministic md5-keyed sample (concat_ws skips NULLs; cast
        AS STRING spelled by ``spark_str``)."""
        op: LimitAgg = rp.op

        def det_key(r):
            parts = [spark_str(r[f] if V.is_var(f) else f)
                     for f in rp.infields
                     if (r[f] if V.is_var(f) else f) is not None]
            parts.append(str(op.seed))
            return hashlib.md5("_".join(parts).encode()).hexdigest()

        if op.random and op.deterministic:
            ordered = lambda g: sorted(g, key=det_key)  # noqa: E731
        elif op.random:
            import random

            rng = random.Random(op.seed)
            ordered = lambda g: sorted(  # noqa: E731
                g, key=lambda _: rng.random())
        elif node.sort:
            ordered = lambda g: _sort_rows(  # noqa: E731
                g, node.sort, not node.reverse, "spark")
        else:
            ordered = list  # arrival order
        invars, outs = rp.infields, list(rp.outfields)
        rank_var = None
        if op.with_rank:
            rank_var, outs = outs[-1], outs[:-1]
        result = []
        groups = (_group_rows(rows, node.group_fields)
                  if node.group_fields else {(): rows})
        for key, grows in groups.items():
            top = ordered(grows)[: op.n]
            for rank, r in enumerate(top, start=1):
                o = dict(zip(node.group_fields, key))
                o.update({out: (r[i] if V.is_var(i) else i)
                          for i, out in zip(invars, outs)})
                if rank_var:
                    o[rank_var] = rank
                result.append(o)
        return result

    def _exec_buffer_iter(self, rows, node: GroupingNode, rp) -> list[dict]:
        op: BufferIterOp = rp.op
        groups = (_group_rows(rows, node.group_fields)
                  if node.group_fields else ({(): rows} if rows else {}))
        out = []
        for key, grows in groups.items():
            ordered = _sort_rows(grows, node.sort, not node.reverse,
                                 "spark") if node.sort else grows
            it = ((tuple(r[f] if V.is_var(f) else f for f in rp.infields))
                  for r in ordered)
            keyrow = dict(zip(node.group_fields, key))
            for t in op.iter_fn(iter(it)):
                vals = tuple(t) if isinstance(t, (tuple, list)) else (t,)
                out.append({**keyrow, **dict(zip(rp.outfields, vals))})
        return out


def _fields_of(rows: list[dict], node: Node) -> list[str]:
    if rows:
        return list(rows[0].keys())
    # empty relation: derive fields from the plan node
    for attr in ("fields", "outfields"):
        f = getattr(node, attr, None)
        if f:
            return list(f)
    if isinstance(node, GroupingNode):
        return list(node.group_fields) + [o for a in node.aggs
                                          for o in a.outfields]
    if isinstance(node, (ApplicationNode,)):
        return _fields_of([], node.source) + list(node.outfields)
    if isinstance(node, ExistenceJoinNode):
        base = _fields_of([], node.source)
        return base + ([node.flag_var] if node.flag_var else [])
    if isinstance(node, JoinNode):
        lf = _fields_of([], node.left)
        rf = _fields_of([], node.right)
        return list(dict.fromkeys(lf + rf))
    src = getattr(node, "source", None)
    return _fields_of([], src) if src is not None else []


def _null_filter(rows: list[dict], fields) -> list[dict]:
    subset = [f for f in fields if V.is_non_nullable(f)]
    if not subset:
        return rows
    return [r for r in rows if all(r[f] is not None for f in subset)]


def _hashable(v):
    if isinstance(v, (list, dict, set, bytearray)):
        return repr(v)
    return v


def _agg_empty(op: ParallelAgg):
    """Spark's native aggregate over ZERO rows (global grouping)."""
    zero_names = {"count", "!count", "distinct-count",
                  "approx-distinct-count"}
    if op.name in zero_names:
        vals = (0,)
    elif op.name in ("collect-list", "collect-set"):
        vals = ([],)
    else:
        vals = tuple([None] * op.n_out)
    return vals


def run_local(query) -> list[tuple]:
    """Execute a Query on the in-memory platform; returns tuples in
    outfield order (the ``??-`` analog without a SparkSession).  Also
    accepts bare ``combine``/``union`` merged generators."""
    if hasattr(query, "gens"):  # _MergedGen from combine/union
        _, rows = LocalExecutor()._source_rows(query)
        return rows
    return LocalExecutor().run_query(query)
