"""Logical planner — Stage 2 of the query lifecycle (SURVEY.md §3).

Ports the reference's planning rules (cascalog-core/src/clj/cascalog/logic/
parse.clj:685-709 ``build-rule`` and friends) nearly 1:1: this Spark-agnostic
logic (variable unification, groundness, implicit joins, agg tails) is the
hard-won semantics.  Physical choices (join strategy, partial agg, pushdown)
are deliberately NOT made here — Catalyst owns them (SURVEY.md §4).

IR: immutable-ish dataclass node tree rooted at a TailStruct, mirroring
parse.clj:166-255 (Merge/TailStruct/ExistenceNode/Application/Rename/
Projection/FilterApplication/Join/Unique/Grouping).
"""

from __future__ import annotations

import uuid
from dataclasses import dataclass, field as dfield
from typing import Any, Optional

from . import vars as V
from .ops import BufferOp, FilterOp, LimitAgg, MapcatOp, MapOp
from .predicates import NormalizedQuery, RawPredicate, normalize_query

# ---------------------------------------------------------------------------
# plan nodes


@dataclass
class Node:
    def __post_init__(self):
        self.node_id = uuid.uuid4().hex  # DAG sharing (predicate.clj:106-125)


@dataclass
class GeneratorNode(Node):
    """A relation bound to logic vars (predicate.clj:128).

    ``fields`` are the bound vars (post constant/dup expansion);
    ``col_bindings`` maps var -> source column name or positional index;
    ``const_filters`` are (col_binding, constant) equality filters pushed into
    the scan (they reach parquet as PushedFilters);
    ``dup_filters`` are (var_kept, extra_col) equality pairs from repeated vars
    (parse.clj:308-336 implicit equality)."""

    source: Any = None
    fields: list = dfield(default_factory=list)
    col_bindings: dict = dfield(default_factory=dict)
    const_filters: list = dfield(default_factory=list)
    dup_filters: list = dfield(default_factory=list)


@dataclass
class ApplicationNode(Node):
    """map/mapcat op application (parse.clj:202-207)."""

    source: Node = None
    op: Any = None
    infields: list = dfield(default_factory=list)  # vars or constants
    outfields: list = dfield(default_factory=list)


@dataclass
class FilterNode(Node):
    """FilterApplication (parse.clj:224-229)."""

    source: Node = None
    op: Any = None
    infields: list = dfield(default_factory=list)


@dataclass
class EqualityFilterNode(Node):
    """Implicit equality between two existing fields (dup var semantics)."""

    source: Node = None
    left: str = ""
    right: str = ""


@dataclass
class JoinNode(Node):
    """Implicit equi-join on shared vars (parse.clj:233-240).

    ``how`` per Spark: inner/left/right/full — derived from branch groundness
    (parse.clj:448-456: ground branch → required, unground → optional)."""

    left: Node = None
    right: Node = None
    join_fields: list = dfield(default_factory=list)
    how: str = "inner"


@dataclass
class ExistenceJoinNode(Node):
    """GeneratorSet semi/anti/flag join (parse.clj:194-199,591-612;
    CascalogJoiner.java:27-91 ``:exists`` semantics)."""

    source: Node = None
    sub: Node = None  # the set-side generator plan
    join_fields: list = dfield(default_factory=list)
    mode: str = "semi"  # semi | anti | flag
    flag_var: Optional[str] = None


@dataclass
class GroupingNode(Node):
    """groupBy + aggregators (+ secondary sort) (parse.clj:250-255)."""

    source: Node = None
    group_fields: list = dfield(default_factory=list)
    aggs: list = dfield(default_factory=list)  # RawPredicate kind=agg
    sort: list = dfield(default_factory=list)
    reverse: bool = False
    # :reducers option (options.clj:19-28, operations.clj:220-233) —
    # explicit reduce-side parallelism for this grouping
    reducers: Optional[int] = None


@dataclass
class UniqueNode(Node):
    source: Node = None
    fields: list = dfield(default_factory=list)


@dataclass
class ProjectionNode(Node):
    source: Node = None
    fields: list = dfield(default_factory=list)


@dataclass
class MergeNode(Node):
    """Bag union of tails (parse.clj:166-171)."""

    sources: list = dfield(default_factory=list)


# ---------------------------------------------------------------------------
# tails


@dataclass
class Tail:
    """TailStruct (parse.clj:173-186): plan node + available fields + ground?.

    Groundness propagation matches parse.clj:434-464: a join result is ground
    if ANY branch is ground; the final surviving tail is forced ground
    (parse.clj:531) so !!var-consuming ops apply post-join, where null
    padding is visible."""

    node: Node
    fields: list
    ground: bool = True


# ---------------------------------------------------------------------------
# generator expansion


def _expand_generator(rp: RawPredicate) -> GeneratorNode:
    """Bind a generator's columns to vars; expand constants (→ pushed-down
    equality filters) and duplicate vars (→ implicit equality filters)."""
    bindings = rp.bindings
    named = len(bindings) == 1 and isinstance(bindings[0], dict)
    fields: list[str] = []
    col_bindings: dict[str, Any] = {}
    const_filters: list = []
    dup_filters: list = []
    seen: dict[str, str] = {}

    items = (list(bindings[0].items()) if named
             else list(enumerate(bindings)))
    for colref, b in items:
        if V.is_wildcard(b):
            continue
        if not V.is_var(b):
            const_filters.append((colref, b))
            continue
        if b in seen:
            extra = V.gen_var("?")
            col_bindings[extra] = colref
            dup_filters.append((b, extra))
            continue
        seen[b] = b
        fields.append(b)
        col_bindings[b] = colref
    return GeneratorNode(source=rp.source, fields=fields,
                         col_bindings=col_bindings,
                         const_filters=const_filters, dup_filters=dup_filters)


def _generator_tail(rp: RawPredicate) -> Tail:
    g = _expand_generator(rp)
    return Tail(node=g, fields=list(g.fields), ground=V.is_ground(g.fields))


# ---------------------------------------------------------------------------
# op application


def _apply_op(tail: Tail, rp: RawPredicate) -> Tail:
    """Apply one op to a tail; outvars that already exist become implicit
    equality filters (parse.clj:308-336 ``apply-equality-ops``)."""
    if rp.kind == "filter":
        node = FilterNode(source=tail.node, op=rp.op, infields=rp.infields)
        return Tail(node=node, fields=tail.fields, ground=tail.ground)

    outfields, eq_pairs = [], []
    for o in rp.outfields:
        if o in tail.fields:
            fv = V.gen_var("?")
            outfields.append(fv)
            eq_pairs.append((o, fv))
        else:
            outfields.append(o)
    node: Node = ApplicationNode(source=tail.node, op=rp.op,
                                 infields=rp.infields, outfields=outfields)
    fields = tail.fields + [o for o in outfields]
    for a, b in eq_pairs:
        node = EqualityFilterNode(source=node, left=a, right=b)
        fields = [f for f in fields if f != b]
    return Tail(node=node, fields=fields, ground=tail.ground)


def _op_applicable(tail: "Tail | set", rp: RawPredicate) -> bool:
    """parse.clj:276-295 ``op-allowed?``: inputs available AND (all input
    vars ground (?x/!x) OR the tail itself is ground) — !!var consumers wait
    for the outer join so they see null padding."""
    if isinstance(tail, set):  # post-agg path: fields only, always ground
        fields, ground = tail, True
    else:
        fields, ground = set(tail.fields), tail.ground
    invars = {f for f in rp.infields if V.is_var(f)}
    if not invars <= fields:
        return False
    return ground or all(not V.is_ungrounding(v) for v in invars)


# ---------------------------------------------------------------------------
# joins


def _join_two(a: Tail, b: Tail, join_fields: list) -> Tail:
    # ground branch → required; unground (carries !!vars) → optional
    # (parse.clj:448-456).  Required+required → inner; required+optional →
    # left; optional+required → right; optional+optional → full.
    if a.ground and b.ground:
        how = "inner"
    elif a.ground and not b.ground:
        how = "left"
    elif not a.ground and b.ground:
        how = "right"
    else:
        how = "full"
    node = JoinNode(left=a.node, right=b.node, join_fields=join_fields, how=how)
    fields = list(a.fields) + [f for f in b.fields if f not in a.fields]
    return Tail(node=node, fields=fields, ground=a.ground or b.ground)


def _attempt_join(tails: list[Tail]) -> list[Tail]:
    """Greedy maximal-shared-field pair selection (parse.clj:416-464).

    The reference author flags this greedy strategy as "unoptimal"; we keep it
    for plan-shape parity — Catalyst/AQE reorders the physical join anyway."""
    best, best_pair = None, None
    for i in range(len(tails)):
        for j in range(i + 1, len(tails)):
            shared = [f for f in tails[i].fields if f in set(tails[j].fields)]
            if best is None or len(shared) > len(best):
                best, best_pair = shared, (i, j)
    if best_pair is None:
        raise ValueError("cannot join: no tails")
    i, j = best_pair
    if not best:
        # no shared vars → cartesian product (api.clj:63-64 cross-join idiom)
        pass
    joined = _join_two(tails[i], tails[j], best)
    rest = [t for k, t in enumerate(tails) if k not in (i, j)]
    return rest + [joined]


# ---------------------------------------------------------------------------
# main build (parse.clj:685-709 build-rule)


def _binding_vars(bindings) -> set:
    """Vars bound by a generator/genset binding list (dict or positional)."""
    vals = (bindings[0].values()
            if len(bindings) == 1 and isinstance(bindings[0], dict)
            else bindings)
    return {b for b in vals if V.is_var(b)}


def prune_operations(nq: NormalizedQuery) -> list:
    """Dead-operation elimination (parse.clj:640-682): fixed-point removal of
    map ops whose outputs reach no output field / op input / agg input / sort
    field.  Disabled when any zero-input op is present (same caveat as the
    reference).  Catalyst prunes dead Column exprs anyway — this exists to
    skip planning unused *UDF* applications, which Catalyst can't see into."""
    ops = list(nq.operations)
    # parse.clj:669-676 — pruning is disabled when ANY zero-input op, filter,
    # or aggregator exists (e.g. c/count), not just zero-input map ops.
    if any(not rp.infields for rp in ops) or \
            any(not a.infields for a in nq.aggregators):
        return ops
    while True:
        needed = set(nq.outfields)
        needed |= set(nq.options.get("sort") or [])
        for g in nq.generators:
            # parse.clj:660-682 includes generator outvars: an op output that
            # unifies with a generator-bound var IS an implicit equality
            # constraint and must not be pruned.
            needed |= _binding_vars(g.bindings)
        for rp in ops:
            needed |= {f for f in rp.infields if V.is_var(f)}
        for a in nq.aggregators:
            needed |= {f for f in a.infields if V.is_var(f)}
        for gs in nq.gensets:
            # genset join vars (parse.clj:441-447): an op may exist solely
            # to feed the semi/anti-join key
            needed |= _binding_vars(gs.bindings)
        removable = [rp for rp in ops
                     if rp.kind == "op" and rp.outfields
                     and not (set(rp.outfields) & needed)]
        if not removable:
            return ops
        for rp in removable:
            ops.remove(rp)


def build_plan(nq: NormalizedQuery) -> Node:
    tails = [_generator_tail(g) for g in nq.generators]
    pending_ops = prune_operations(nq)
    pending_sets = [(rp, _expand_generator_set(rp)) for rp in nq.gensets]

    # merge-tails fixed point (parse.clj:523-533): absorb every applicable op
    # (filters first, parse.clj:371-385), join when stuck.
    while True:
        progress = True
        while progress:
            progress = False
            pending_ops.sort(key=lambda rp: 0 if rp.kind == "filter" else 1)
            for rp in list(pending_ops):
                target = _pick_tail(tails, rp)
                if target is not None:
                    idx = tails.index(target)
                    tails[idx] = _apply_op(target, rp)
                    pending_ops.remove(rp)
                    progress = True
            for item in list(pending_sets):
                rp, (sub_node, join_fields, mode, flag) = item
                target = next((t for t in tails
                               if set(join_fields) <= set(t.fields)), None)
                if target is not None:
                    idx = tails.index(target)
                    node = ExistenceJoinNode(source=target.node, sub=sub_node,
                                             join_fields=join_fields,
                                             mode=mode, flag_var=flag)
                    new_fields = target.fields + ([flag] if flag else [])
                    tails[idx] = Tail(node=node, fields=new_fields,
                                      ground=target.ground)
                    pending_sets.remove(item)
                    progress = True
        if len(tails) == 1:
            if not tails[0].ground and (pending_ops or pending_sets):
                # parse.clj:531 — final tail is forced ground so that
                # remaining !!var-consuming ops / gensets can now apply
                tails[0] = Tail(node=tails[0].node, fields=tails[0].fields,
                                ground=True)
                continue
            break
        tails = _attempt_join(tails)

    tail = tails[0]
    if pending_sets:
        raise ValueError("generator-set join fields never became available")

    # aggregation tail (parse.clj:499-521 build-agg-tail)
    if nq.aggregators:
        tail = _build_agg_tail(nq, tail, pending_ops)
        # post-agg ops fixed point (parse.clj:701-709)
        remaining = [rp for rp in pending_ops]
        progress = True
        while progress and remaining:
            progress = False
            for rp in list(remaining):
                if _op_applicable(set(tail.fields) | set(), rp):
                    tail = _apply_op(tail, rp)
                    remaining.remove(rp)
                    progress = True
        if remaining:
            names = [getattr(rp.op, "name", str(rp.op)) for rp in remaining]
            raise ValueError(f"unconsumed operations after aggregation: {names}")
    elif pending_ops:
        names = [getattr(rp.op, "name", str(rp.op)) for rp in pending_ops]
        raise ValueError(f"operations reference unavailable fields: {names}")

    # validate-projection! (parse.clj:552-563)
    missing = [f for f in nq.outfields if f not in tail.fields]
    if missing:
        raise ValueError(f"output fields {missing} not produced by the query; "
                         f"available: {tail.fields}")

    node: Node = tail.node
    if not nq.aggregators and nq.options.get("distinct"):
        node = UniqueNode(source=node, fields=list(nq.outfields))
    node = ProjectionNode(source=node, fields=list(nq.outfields))
    return node


def _pick_tail(tails: list[Tail], rp: RawPredicate) -> Optional[Tail]:
    for t in tails:
        if _op_applicable(t, rp):
            return t
    return None


def _expand_generator_set(rp: RawPredicate):
    """GeneratorSet → (sub plan, join fields, mode, flag var)
    (parse.clj:591-612; join-field selection 441-447)."""
    sub_rp = RawPredicate(kind="generator", op=None, source=rp.source,
                          bindings=rp.bindings)
    sub = _expand_generator(sub_rp)
    join_fields = list(sub.fields)
    flag = rp.flag
    if flag is True:
        mode, flag_var = "semi", None
    elif flag is False:
        mode, flag_var = "anti", None
    elif V.is_var(flag):
        mode, flag_var = "flag", flag
    else:
        raise ValueError(f"generator-set output must be True/False/var, got {flag!r}")
    return sub, join_fields, mode, flag_var


def _build_agg_tail(nq: NormalizedQuery, tail: Tail,
                    pending_ops: list) -> Tail:
    aggs = nq.aggregators
    agg_outs = [o for a in aggs for o in a.outfields]
    # grouping fields = query output vars that aren't aggregator outputs and
    # are available pre-agg (parse.clj:701-705)
    group_fields = [f for f in nq.outfields
                    if f not in agg_outs and f in tail.fields]
    for a in aggs:
        missing = [f for f in a.infields
                   if V.is_var(f) and f not in tail.fields]
        if missing:
            raise ValueError(
                f"aggregator {getattr(a.op, 'name', a.op)} references "
                f"unavailable fields {missing}; available: {tail.fields}")
    sort = [s for s in (nq.options.get("sort") or [])]
    bad_sort = [s for s in sort if s not in tail.fields]
    if bad_sort:
        raise ValueError(
            f":sort references unavailable fields {bad_sort}; "
            f"available: {tail.fields}")
    # pre-grouping projection to (group ∪ agg-input ∪ sort) (parse.clj:472-497)
    needed = list(dict.fromkeys(
        group_fields + [f for a in aggs for f in a.infields if V.is_var(f)]
        + sort))
    proj = ProjectionNode(source=tail.node, fields=needed)
    g = GroupingNode(source=proj, group_fields=group_fields, aggs=aggs,
                     sort=sort, reverse=bool(nq.options.get("reverse")),
                     reducers=nq.options.get("reducers"))
    fields = group_fields + agg_outs
    return Tail(node=g, fields=fields)


def plan_query(outfields, predicates, options=None) -> Node:
    nq = normalize_query(outfields, predicates, options)
    return build_plan(nq)
