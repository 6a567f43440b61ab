"""Property-based differential tests (hypothesis): random small relations
through the engine vs an executable pure-Python model of Cascalog semantics
— the analog of the reference's dual-platform fixture (api_test.clj:11-16,
in-memory platform as oracle).  Covers the subtle parts: ?-var null
dropping, !x null flow, !!x outer-join padding, genset semi/anti joins,
duplicate-sensitive aggregation.
"""

import os
import sys
from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cascalog_spark import c, q

# CSPARK_FUZZ=N deepens the differential fuzz (default 4 examples/property
# for suite wall-time; tools/ci.sh runs the deep sweep at 8)
SET = settings(max_examples=int(os.environ.get("CSPARK_FUZZ", "4")),
               deadline=None,
               suppress_health_check=[HealthCheck.function_scoped_fixture,
                                      HealthCheck.too_slow])

keys = st.one_of(st.integers(min_value=0, max_value=5), st.none())
vals = st.one_of(st.integers(min_value=-10, max_value=10), st.none())
rows = st.lists(st.tuples(keys, vals), min_size=0, max_size=12)


def _df(spark, data, cols):
    return spark.createDataFrame(data, f"{cols[0]} int, {cols[1]} int")


def _multiset(rows_):
    return Counter(tuple(r) for r in rows_)


@given(data=rows)
@SET
def test_nonnullable_var_drops_nulls(spark, data):
    """?-vars filter null rows at the generator (operations.clj:716-722)."""
    res = q(["?k", "?v"], (_df(spark, data, ["k", "v"]),
                           {"k": "?k", "v": "?v"})).run(spark)
    expected = [(k, v) for k, v in data if k is not None and v is not None]
    assert _multiset(res) == _multiset(expected)


@given(data=rows)
@SET
def test_nullable_var_keeps_nulls(spark, data):
    """!x vars let nulls flow through (vars.clj:8-36)."""
    res = q(["?k", "!v"], (_df(spark, data, ["k", "v"]),
                           {"k": "?k", "v": "!v"})).run(spark)
    expected = [(k, v) for k, v in data if k is not None]
    assert _multiset(res) == _multiset(expected)


@given(left=rows, right=rows)
@SET
def test_implicit_inner_join(spark, left, right):
    """Shared ?var across generators = inner equi-join, duplicate-sensitive
    (parse.clj:387-464)."""
    res = q(["?k", "?a", "?b"],
            (_df(spark, left, ["k", "a"]), {"k": "?k", "a": "?a"}),
            (_df(spark, right, ["k", "b"]), {"k": "?k", "b": "?b"}),
            ).run(spark)
    expected = [(k, a, b)
                for k, a in left if k is not None and a is not None
                for k2, b in right if k2 == k and b is not None]
    assert _multiset(res) == _multiset(expected)


@given(left=rows, right=rows)
@SET
def test_outer_join_ungrounding_var(spark, left, right):
    """!!b demands LEFT OUTER padding with nulls (api_test.clj:277-394)."""
    res = q(["?k", "?a", "!!b"],
            (_df(spark, left, ["k", "a"]), {"k": "?k", "a": "?a"}),
            (_df(spark, right, ["k", "b"]), {"k": "?k", "b": "!!b"}),
            ).run(spark)
    lkeep = [(k, a) for k, a in left if k is not None and a is not None]
    rkeep = [(k, b) for k, b in right if k is not None]
    expected = []
    for k, a in lkeep:
        matches = [b for k2, b in rkeep if k2 == k]
        if matches:
            expected += [(k, a, b) for b in matches]
        else:
            expected.append((k, a, None))
    assert _multiset(res) == _multiset(expected)


@given(left=rows, right=rows)
@SET
def test_genset_semi_and_anti(spark, left, right):
    """(right ?k :> True) = semi join; :> False = anti join
    (api_secondary_test.clj:115-188) — first-match-only, no row multiply."""
    ldf = _df(spark, left, ["k", "a"])
    rdf = _df(spark, right, ["k", "b"])
    semi = q(["?k", "?a"], (ldf, {"k": "?k", "a": "?a"}),
             (rdf, {"k": "?k"}, ":>", True)).run(spark)
    anti = q(["?k", "?a"], (ldf, {"k": "?k", "a": "?a"}),
             (rdf, {"k": "?k"}, ":>", False)).run(spark)
    lkeep = [(k, a) for k, a in left if k is not None and a is not None]
    rkeys = {k for k, _ in right if k is not None}
    assert _multiset(semi) == _multiset([r for r in lkeep if r[0] in rkeys])
    assert _multiset(anti) == _multiset(
        [r for r in lkeep if r[0] not in rkeys])


@given(data=rows)
@SET
def test_agg_count_sum_per_key(spark, data):
    """Grouped count + sum over duplicate keys; grouping keys = non-agg
    output vars (parse.clj:701-705)."""
    res = q(["?k", "?n", "?s"],
            (_df(spark, data, ["k", "v"]), {"k": "?k", "v": "?v"}),
            (c.count, "?n"), (c.sum_agg, "?v", ":>", "?s")).run(spark)
    keep = [(k, v) for k, v in data if k is not None and v is not None]
    expected = []
    for k in {k for k, _ in keep}:
        vs = [v for k2, v in keep if k2 == k]
        expected.append((k, len(vs), sum(vs)))
    assert _multiset(res) == _multiset(expected)


@given(data=rows)
@SET
def test_distinct_option(spark, data):
    """:distinct true dedupes full tuples (operations.clj:301-316)."""
    res = q(["?k", "?v"], (_df(spark, data, ["k", "v"]),
                           {"k": "?k", "v": "?v"}),
            distinct=True).run(spark)
    keep = {(k, v) for k, v in data if k is not None and v is not None}
    assert _multiset(res) == _multiset(keep)


@given(left=rows, mid=rows, right=rows)
@SET
def test_three_way_join(spark, left, mid, right):
    """Three generators chained on two different shared vars — the planner
    must fuse to two joins with correct intermediate fields."""
    res = q(["?k", "?a", "?b", "?c"],
            (_df(spark, left, ["k", "a"]), {"k": "?k", "a": "?a"}),
            (_df(spark, mid, ["a", "b"]), {"a": "?a", "b": "?b"}),
            (_df(spark, right, ["k", "c"]), {"k": "?k", "c": "?c"}),
            ).run(spark)
    lk = [(k, a) for k, a in left if k is not None and a is not None]
    mk = [(a, b) for a, b in mid if a is not None and b is not None]
    rk = [(k, c) for k, c in right if k is not None and c is not None]
    expected = [(k, a, b, c)
                for k, a in lk
                for a2, b in mk if a2 == a
                for k2, c in rk if k2 == k]
    assert _multiset(res) == _multiset(expected)


@given(left=rows, right=rows)
@SET
def test_genset_flag_var(spark, left, right):
    """(right ?k :> ?flag) projects existence as a boolean column
    (api_secondary_test.clj:115-176)."""
    res = q(["?k", "?a", "?flag"],
            (_df(spark, left, ["k", "a"]), {"k": "?k", "a": "?a"}),
            (_df(spark, right, ["k", "b"]), {"k": "?k"}, ":>", "?flag"),
            ).run(spark)
    lkeep = [(k, a) for k, a in left if k is not None and a is not None]
    rkeys = {k for k, _ in right if k is not None}
    expected = [(k, a, k in rkeys) for k, a in lkeep]
    assert _multiset(res) == _multiset(expected)


@given(data=rows)
@SET
def test_post_agg_operation(spark, data):
    """Operations applied AFTER aggregation (api_test.clj:137-145):
    planner's second fixed-point over agg outputs."""
    res = q(["?k", "?n2"],
            (_df(spark, data, ["k", "v"]), {"k": "?k", "v": "?v"}),
            (c.count, "?n"), (c.add, "?n", 100, ":>", "?n2")).run(spark)
    keep = [(k, v) for k, v in data if k is not None and v is not None]
    expected = [(k, sum(1 for k2, _ in keep if k2 == k) + 100)
                for k in {k for k, _ in keep}]
    assert _multiset(res) == _multiset(expected)


@given(data=rows)
@SET
def test_mapcat_multiplies_rows(spark, data):
    """mapcat: 1 row → n rows (split-style) with correct multiset counts."""
    from cascalog_spark import mapcatfn

    rep = mapcatfn(lambda v: [v] * (abs(v) % 3), returns="bigint",
                   name="rep")
    res = q(["?k", "?r"],
            (_df(spark, data, ["k", "v"]), {"k": "?k", "v": "?v"}),
            (rep, "?v", ":>", "?r")).run(spark)
    expected = [(k, v) for k, v in data
                if k is not None and v is not None
                for _ in range(abs(v) % 3)]
    assert _multiset(res) == _multiset(expected)


@given(left=rows, right=rows)
@SET
def test_combine_bag_union(spark, left, right):
    """combine keeps duplicates across both branches (api.clj:178-186)."""
    from cascalog_spark import combine

    q1 = q(["?k", "?v"], (_df(spark, left, ["k", "v"]),
                          {"k": "?k", "v": "?v"}))
    q2 = q(["?k", "?v"], (_df(spark, right, ["k", "v"]),
                          {"k": "?k", "v": "?v"}))
    res = [tuple(r) for r in combine(q1, q2).to_df(spark).collect()]
    keep = [(k, v) for k, v in left + right
            if k is not None and v is not None]
    assert _multiset(res) == _multiset(keep)


skeys = st.one_of(st.none(), st.text(
    alphabet=st.characters(codec="utf-8",
                           blacklist_categories=("Cs", "Cc")),
    min_size=0, max_size=4))
srows = st.lists(st.tuples(skeys, vals), min_size=0, max_size=10)


@given(left=srows, right=srows)
@SET
def test_inner_join_string_keys_unicode(spark, left, right):
    """Join keys as arbitrary unicode strings (incl. empty) — the dynamic
    any-type field contract (§1.2) must survive non-ASCII."""
    ldf = spark.createDataFrame(left, "k string, a int")
    rdf = spark.createDataFrame(right, "k string, b int")
    res = q(["?k", "?a", "?b"],
            (ldf, {"k": "?k", "a": "?a"}),
            (rdf, {"k": "?k", "b": "?b"})).run(spark)
    expected = [(k, a, b)
                for k, a in left if k is not None and a is not None
                for k2, b in right if k2 == k and b is not None]
    assert _multiset(res) == _multiset(expected)


@given(data=rows)
@SET
def test_implicit_equality_dup_var(spark, data):
    """(src ?n ?n) keeps rows where both columns are equal
    (parse.clj:308-336, api_test.clj:816-828)."""
    res = q(["?n"], (_df(spark, data, ["k", "v"]),
                     {"k": "?n", "v": "?n"})).run(spark)
    expected = [(k,) for k, v in data
                if k is not None and v is not None and k == v]
    assert _multiset(res) == _multiset(expected)


# unique values so top-k order is total (row_number ties would otherwise be
# tie-broken arbitrarily by both engines)
uniq_rows = st.lists(
    st.tuples(st.integers(min_value=0, max_value=3),
              st.integers(min_value=-50, max_value=50)),
    min_size=0, max_size=12,
    unique_by=lambda t: t[1])


@given(data=uniq_rows)
@SET
def test_limit_rank_per_group_topk(spark, data):
    """c/limit-rank (ops.clj:208-226): per-group top-2 by value desc with
    rank, vs the sorted-python model — exercises the Window+row_number
    compilation path."""
    if not data:
        data = [(0, 0)]
    res = q(["?k", "?v2", "?r"],
            (_df(spark, data, ["k", "v"]), {"k": "?k", "v": "?v"}),
            (c.limit_rank(2), "?v", ":>", "?v2", "?r"),
            sort=["?v"], reverse=True).run(spark)
    expected = []
    for k in {k for k, _ in data}:
        vs = sorted((v for kk, v in data if kk == k), reverse=True)[:2]
        expected += [(k, v, i + 1) for i, v in enumerate(vs)]
    assert _multiset(res) == _multiset(expected)


@given(data=uniq_rows)
@SET
def test_buffer_with_secondary_sort(spark, data):
    """defbufferfn + :sort (operations.clj:251-264): the buffer sees each
    group's tuples in sorted order — first-row-per-group vs model."""
    import pandas as pd

    from cascalog_spark.ops import defbufferfn

    if not data:
        data = [(0, 0)]

    @defbufferfn(returns=["int"])
    def first_val(pdf):
        return pd.DataFrame({"x": [int(pdf.iloc[0, 0])]})

    res = q(["?k", "?first"],
            (_df(spark, data, ["k", "v"]), {"k": "?k", "v": "?v"}),
            (first_val, "?v", ":>", "?first"),
            sort=["?v"]).run(spark)
    expected = [(k, min(v for kk, v in data if kk == k))
                for k in {k for k, _ in data}]
    assert _multiset(res) == _multiset(expected)


# -- asof_join vs pandas merge_asof (the reference model for point-in-time
#    joins); right (key, ts) pairs kept unique so both tie-rules coincide

_asof_left = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 50)),
    min_size=0, max_size=12)
_asof_right = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 50),
              st.integers(-100, 100)),
    min_size=0, max_size=12,
    unique_by=lambda r: (r[0], r[1]))


@given(left=_asof_left, right=_asof_right,
       tol=st.one_of(st.none(), st.integers(1, 20)))
@SET
def test_asof_join_matches_pandas_merge_asof(spark, left, right, tol):
    import pandas as pd

    from cascalog_spark.operators import asof_join

    if not left or not right:
        return
    ldf = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(left)],
        "lid long, k long, ts long")
    rdf = spark.createDataFrame(right, "k long, ts long, v long")
    got = {r.lid: r.v for r in
           asof_join(ldf, rdf, on="k", right_cols=["v"],
                     tolerance=tol).collect()}

    lp = pd.DataFrame([(i, k, t) for i, (k, t) in enumerate(left)],
                      columns=["lid", "k", "ts"]).sort_values("ts",
                                                              kind="stable")
    rp = pd.DataFrame(right, columns=["k", "ts", "v"]).sort_values(
        "ts", kind="stable")
    kwargs = {"tolerance": tol} if tol is not None else {}
    exp = pd.merge_asof(lp, rp, on="ts", by="k", direction="backward",
                        **kwargs)
    expect = {int(r.lid): (None if pd.isna(r.v) else int(r.v))
              for r in exp.itertuples()}
    assert got == expect


# -- range_join vs a brute-force interval containment model

_rj_pts = st.lists(st.tuples(st.integers(0, 2), st.integers(-30, 30)),
                   min_size=0, max_size=10)
_rj_ivs = st.lists(
    st.tuples(st.integers(0, 2), st.integers(-30, 30), st.integers(0, 15)),
    min_size=0, max_size=10)


@given(pts=_rj_pts, ivs=_rj_ivs,
       bucket=st.sampled_from([1.0, 3.0, 7.0, 50.0]),
       hi_inc=st.booleans())
@SET
def test_range_join_matches_bruteforce(spark, pts, ivs, bucket, hi_inc):
    from cascalog_spark.operators import range_join

    if not pts or not ivs:
        return
    ldf = spark.createDataFrame(
        [(i, k, float(v)) for i, (k, v) in enumerate(pts)],
        "pid long, k long, v double")
    rdf = spark.createDataFrame(
        [(j, k, float(lo), float(lo + span))
         for j, (k, lo, span) in enumerate(ivs)],
        "iid long, k long, lo double, hi double")
    got = {(r.pid, r.iid) for r in
           range_join(ldf, rdf, "v", "lo", "hi", on="k",
                      bucket=bucket, hi_inclusive=hi_inc).collect()}
    expect = {(i, j)
              for i, (pk, v) in enumerate(pts)
              for j, (ik, lo, span) in enumerate(ivs)
              if pk == ik and lo <= v
              and (v <= lo + span if hi_inc else v < lo + span)}
    assert got == expect


# -- scd2_merge vs a pure-python SCD2 model

_scd_cur = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 3)),  # (key, open value)
    min_size=0, max_size=3, unique_by=lambda r: r[0])
_scd_ups = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 3), st.integers(10, 20)),
    min_size=0, max_size=8, unique_by=lambda r: (r[0], r[2]))


def _scd2_model(cur_open, ups):
    """cur_open: {key: value} open rows at eff_start=0; ups: (k, v, ts)."""
    out = []
    keys = {k for k, _ in cur_open.items()} | {k for k, _, _ in ups}
    for k in sorted(keys):
        chain = sorted([(ts, v) for kk, v, ts in ups if kk == k])
        surv = []
        prev = None
        for ts, v in chain:
            if prev is None or v != prev:
                surv.append((ts, v))
            prev = v
        if k in cur_open:
            ov = cur_open[k]
            if surv and surv[0][1] == ov:
                surv = surv[1:]
            end = surv[0][0] if surv else None
            out.append((k, ov, 0, end))
        for i, (ts, v) in enumerate(surv):
            end = surv[i + 1][0] if i + 1 < len(surv) else None
            out.append((k, v, ts, end))
    return sorted(out, key=lambda r: (r[0], r[2]))


@given(cur=_scd_cur, ups=_scd_ups)
@SET
def test_scd2_merge_matches_model(spark, cur, ups):
    from cascalog_spark.operators import scd2_merge

    if not ups:
        return
    cur_open = dict(cur)
    cdf = None
    if cur_open:
        cdf = spark.createDataFrame(
            [(k, v, 0, None) for k, v in sorted(cur_open.items())],
            "k long, v long, eff_start long, eff_end long")
    udf_ = spark.createDataFrame(ups, "k long, v long, ts long")
    got = sorted(((r.k, r.v, r.eff_start, r.eff_end)
                  for r in scd2_merge(cdf, udf_, ["k"], ["v"]).collect()),
                 key=lambda r: (r[0], r[2]))
    assert got == _scd2_model(cur_open, ups)


# -- interval_overlap_join vs the naive all-pairs overlap model --------------

_iv = st.lists(
    st.tuples(st.integers(min_value=0, max_value=3),          # key
              st.integers(min_value=0, max_value=40),          # lo
              st.integers(min_value=0, max_value=25)),         # span
    min_size=0, max_size=10)


@given(left=_iv, right=_iv,
       bucket=st.sampled_from([1.0, 3.0, 7.0, 50.0]))
@SET
def test_interval_overlap_join_matches_model(spark, left, right, bucket):
    """Bucketized overlap join == naive half-open overlap predicate for
    arbitrary interval sets (zero-width intervals, heavy bucket-boundary
    ties, spans larger and smaller than the bucket)."""
    from cascalog_spark.operators import interval_overlap_join

    if not left or not right:
        return
    L = [(i, k, float(lo), float(lo + sp))
         for i, (k, lo, sp) in enumerate(left)]
    R = [(i, k, float(lo), float(lo + sp))
         for i, (k, lo, sp) in enumerate(right)]
    ldf = spark.createDataFrame(L, "lid long, k long, lo double, hi double")
    rdf = spark.createDataFrame(R, "rid long, k long, lo double, hi double")
    got = sorted((r.lid, r.rid) for r in
                 interval_overlap_join(ldf, rdf, "lo", "hi", "lo", "hi",
                                       on="k", bucket=bucket).collect())
    want = sorted((a[0], b[0]) for a in L for b in R
                  if a[1] == b[1] and a[2] < b[3] and b[2] < a[3])
    assert got == want


# ---------------------------------------------------------------------------
# select_by_budget vs a pure-Python prefix-sum model


_budget_rows = st.lists(
    st.tuples(st.integers(min_value=0, max_value=30),    # score (dense ties)
              st.integers(min_value=1, max_value=9)),     # weight
    min_size=0, max_size=25)


@given(data=_budget_rows, budget=st.integers(min_value=0, max_value=80),
       bins=st.sampled_from([1, 3, 16]))
@SET
def test_select_by_budget_matches_python_model(spark, data, budget, bins):
    """Histogram path == greedy prefix-sum in (score desc, id) order,
    for arbitrary tie structure, budgets, and bin counts."""
    from cascalog_spark.functions import select_by_budget
    rows_ = [(i, s, w) for i, (s, w) in enumerate(data)]
    # the contract is the window spelling: the cumulative total INCLUDES
    # dropped rows' weights (prefix-sum cut, not greedy knapsack)
    expected, cum = [], 0
    for i, s, w in sorted(rows_, key=lambda r: (-r[1], r[0])):
        cum += w
        if cum <= budget:
            expected.append(i)
    if not rows_:
        return
    df = spark.createDataFrame(rows_, "id long, score long, w long")
    got = sorted(r["id"] for r in
                 select_by_budget(df, budget, "w", "score", id_col="id",
                                  method="histogram", bins=bins).collect())
    assert got == sorted(expected)


_host = st.from_regex(r"[a-z][a-z0-9]{0,6}(\.[a-z]{2,4}){1,2}",
                      fullmatch=True)
_path = st.lists(st.from_regex(r"[A-Za-z0-9]{1,5}", fullmatch=True),
                 min_size=0, max_size=3)
_params = st.lists(st.tuples(st.from_regex(r"[a-z]{1,4}", fullmatch=True),
                             st.from_regex(r"[A-Za-z0-9]{1,4}",
                                           fullmatch=True)),
                   min_size=0, max_size=3, unique_by=lambda kv: kv[0])


@given(host=_host, path=_path, params=_params,
       scheme_up=st.booleans(), www=st.booleans(),
       port=st.sampled_from(["", ":80", ":443"]),
       shuffle_seed=st.integers(0, 5), utm=st.booleans(),
       slash=st.booleans(), frag=st.booleans())
@SET
def test_canonical_url_variant_invariance(spark, host, path, params,
                                          scheme_up, www, port,
                                          shuffle_seed, utm, slash, frag):
    """Every cosmetic spelling of one resource — scheme, WWW, host
    case, default port, param order, tracking params, trailing slash,
    fragment — must collapse to the SAME canonical key, and that key
    must differ from a genuinely different resource's."""
    import random
    import pyspark.sql.functions as F
    from cascalog_spark.functions import canonical_url_col

    p = "/" + "/".join(path) if path else ""
    qs = list(params)
    random.Random(shuffle_seed).shuffle(qs)
    if utm:
        qs.insert(len(qs) // 2, ("utm_medium", "x"))
    q = ("?" + "&".join(f"{k}={v}" for k, v in qs)) if qs else ""
    base = f"http://{host}{p}" + q
    variant = (("HTTPS://" if scheme_up else "https://")
               + ("www." if www else "") + host.upper() + port
               + p + ("/" if slash and p else "") + q
               + ("#frag" if frag else ""))
    other = f"http://{host}{p}/zz" + q     # a genuinely different path
    df = spark.createDataFrame([(base,), (variant,), (other,)], ["url"])
    got = [r[0] for r in df.select(
        canonical_url_col(F.col("url"))).collect()]
    assert got[0] == got[1]
    assert got[0] != got[2]


_grt_rows = st.lists(
    st.tuples(st.integers(min_value=-20, max_value=20),   # order key (dup-heavy)
              st.integers(min_value=-5, max_value=9)),    # weight (negatives ok)
    min_size=0, max_size=40)


@given(data=_grt_rows, bins=st.sampled_from([1, 2, 7, 32]),
       ascending=st.booleans())
@SET
def test_global_running_total_matches_window(spark, data, bins, ascending):
    """Range-binned exact cumsum == the global window spelling for any
    duplicate structure, sign mix, bin count, and direction."""
    from cascalog_spark.functions import global_running_total
    rows = [(i, k, w) for i, (k, w) in enumerate(data)]
    if not rows:
        return
    df = spark.createDataFrame(rows, ["doc_id", "k", "w"])
    got = {r["doc_id"]: r["rt"] for r in global_running_total(
        df, "w", "k", "doc_id", bins=bins, ascending=ascending,
        out_col="rt").collect()}
    order = sorted(rows, key=lambda r: (r[1] if ascending else -r[1], r[0]))
    cum, want = 0, {}
    for i, _, w in order:
        cum += w
        want[i] = cum
    assert got == want


_hh_vals = st.lists(st.integers(min_value=0, max_value=8),
                    min_size=0, max_size=40)
_phi = st.sampled_from([0.05, 0.2, 0.5, 1.0])


@given(data=_hh_vals, phi=_phi, parts=st.sampled_from([1, 3, 7]))
@SET
def test_frequent_items_matches_naive_filter(spark, data, phi, parts):
    """Two-pass heavy hitters == groupBy-count + >= ceil(phi*N) filter
    for any multiset, threshold, and partitioning — the candidate pass
    is never visible in the result."""
    import math

    from pyspark.sql import functions as F

    from cascalog_spark.functions import frequent_items

    df = spark.createDataFrame([(v,) for v in data], "w int") \
        .repartition(parts)
    got = {(r["item"], r["n"])
           for r in frequent_items(df, "w", phi).collect()}
    n = len(data)
    if n == 0:
        assert got == set()
        return
    cutoff = math.ceil(phi * n)
    cnt = Counter(data)
    want = {(v, c) for v, c in cnt.items() if c >= cutoff}
    assert got == want


# ---------------------------------------------------------------------------
# dedup-family winner rules (r9): full pure-Python pipeline replays —
# every stage (tokens, shingles, md5 hashes, minhash/LSH, components,
# PageRank) is deterministic by design, so the whole winner rule is
# modelable, not just the final join
# ---------------------------------------------------------------------------

import hashlib as _hl
import math as _math

_MP = 2147483647  # dedup.MINHASH_P


def _pd_md5(s):
    return _hl.md5(s.encode()).hexdigest()


def _pd_toks(text):
    return [t for t in text.lower().split() if t]


def _pd_shingles(toks, k):
    out, seen = [], set()
    for i in range(max(len(toks) - k, 0) + 1):
        s = " ".join(toks[i:i + k])
        if s not in seen:
            seen.add(s)
            out.append(s)
    return out


def _pd_components(ids, pairs):
    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    comps = {}
    for i in ids:
        comps.setdefault(find(i), set()).add(i)
    return [c for c in comps.values() if len(c) > 1]


_vocab = st.sampled_from(["aa", "bb", "cc"])
_doc = st.lists(_vocab, min_size=0, max_size=8)
_corpus = st.lists(_doc, min_size=1, max_size=8)
_thresh = st.sampled_from([0.5, 0.8, 1.0])


@given(docs=_corpus, t=_thresh)
@SET
def test_containment_pairs_matches_model(spark, docs, t):
    """Directed containment (one-directional AND mutual rows) ==
    brute-force |S(A)∩S(B)|/|S(A)| over distinct 2-shingles; the
    prefix-filtered candidate join must have exact recall at t."""
    from cascalog_spark.functions import containment_pairs

    df = spark.createDataFrame(
        [(i, " ".join(d)) for i, d in enumerate(docs)],
        "doc_id int, text string")
    got = {(r["doc_id"], r["container_id"], r["containment"])
           for r in containment_pairs(df, "doc_id", n=2,
                                      threshold=t).collect()}
    sh = {i: set(_pd_shingles(_pd_toks(" ".join(d)), 2))
          for i, d in enumerate(docs)}
    sh = {i: s for i, s in sh.items() if len(s) > 0}
    want = set()
    for a, sa in sh.items():
        for b, sb in sh.items():
            if a == b:
                continue
            c = len(sa & sb) / len(sa)
            if c >= t:
                want.add((a, b, round(c, 6)))
    assert got == want


@given(docs=_corpus, t=_thresh)
@SET
def test_containment_dedup_matches_model(spark, docs, t):
    """Winner rule: drop A iff contained in some B where containment is
    one-directional, or mutual with B < A (mutual groups keep min id)."""
    from cascalog_spark.functions import containment_dedup

    df = spark.createDataFrame(
        [(i, " ".join(d)) for i, d in enumerate(docs)],
        "doc_id int, text string")
    got = {r["doc_id"]
           for r in containment_dedup(df, threshold=t, n=2).collect()}
    sh = {i: set(_pd_shingles(_pd_toks(" ".join(d)), 2))
          for i, d in enumerate(docs)}
    sh = {i: s for i, s in sh.items() if len(s) > 0}
    pairs = {(a, b) for a, sa in sh.items() for b, sb in sh.items()
             if a != b and len(sa & sb) / len(sa) >= t}
    losers = {a for a, b in pairs
              if (b, a) not in pairs or b < a}
    assert got == set(range(len(docs))) - losers


_line_txt = st.text(alphabet="ab ", min_size=0, max_size=6)
_line_docs = st.lists(st.lists(_line_txt, min_size=1, max_size=4),
                      min_size=1, max_size=6)


@given(docs=_line_docs)
@SET
def test_cross_doc_line_dedup_matches_model(spark, docs):
    """First-occurrence rule: a line (trimmed+lowercased key) survives
    only at its global (id, pos) minimum among eligible occurrences;
    sub-min_chars lines are never deduped."""
    from cascalog_spark.functions import cross_doc_line_dedup

    rows = [(i, "\n".join(lines)) for i, lines in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {r["doc_id"]: r["dedup_text"]
           for r in cross_doc_line_dedup(df).collect()}
    owners = {}
    for i, lines in enumerate(docs):
        for p, ln in enumerate(lines):
            if len(ln.strip(" ")) >= 1:
                key = ln.lower().strip(" ")
                if key not in owners or (i, p) < owners[key]:
                    owners[key] = (i, p)
    want = {}
    for i, lines in enumerate(docs):
        kept = []
        for p, ln in enumerate(lines):
            if len(ln.strip(" ")) < 1 \
                    or owners[ln.lower().strip(" ")] == (i, p):
                kept.append(ln)
        want[i] = "\n".join(kept)
    assert got == want


def _pd_near_dedup_components(texts, num_perm=8, bands=4, k=2):
    """Pure-Python replay of minhash_lsh_candidates + components:
    md5-based 60-bit shingle hash, LCG universal-hash minhash, md5 band
    buckets — bit-identical arithmetic to the engine by construction."""
    coeffs = [((1103515245 * i + 12345) % (_MP - 1) + 1,
               (2654435761 * i) % _MP) for i in range(num_perm)]
    r = num_perm // bands
    sigs = {}
    for i, text in enumerate(texts):
        hs = [int(_pd_md5(s)[:15], 16) % _MP
              for s in _pd_shingles(_pd_toks(text), k)]
        sigs[i] = [min((a * h + b) % _MP for h in hs)
                   for a, b in coeffs]
    buckets = {}
    for i, sig in sigs.items():
        for b in range(bands):
            bh = _pd_md5(",".join(str(sig[b * r + j])
                                  for j in range(r)))
            buckets.setdefault((b, bh), []).append(i)
    pairs = {(a, b) for ids in buckets.values()
             for a in ids for b in ids if a < b}
    return _pd_components(list(sigs), pairs), pairs


@given(docs=_corpus, scores=st.lists(st.integers(0, 5), min_size=8,
                                     max_size=8))
@SET
def test_near_dedup_keep_best_matches_model(spark, docs, scores):
    """keep='best': per cluster keep argmax(score), min-id tiebreak."""
    from cascalog_spark.functions import near_dedup

    texts = [" ".join(d) for d in docs]
    df = spark.createDataFrame(
        [(i, t, float(scores[i])) for i, t in enumerate(texts)],
        "doc_id int, text string, score double")
    got = {r["doc_id"] for r in near_dedup(
        df, num_perm=8, bands=4, shingle_k=2, keep="best",
        score_col="score").collect()}
    comps, _ = _pd_near_dedup_components(texts)
    losers = set()
    for comp in comps:
        winner = min(comp, key=lambda i: (-scores[i], i))
        losers |= comp - {winner}
    assert got == set(range(len(texts))) - losers


@given(docs=_corpus)
@SET
def test_near_dedup_keep_central_matches_model(spark, docs):
    """keep='central': per cluster keep argmax(PageRank over the pair
    graph, 12 dp), min-id tiebreak — 5 damped rounds, undirected, no
    dangling mass (every graph node has degree >= 1)."""
    from cascalog_spark.functions import near_dedup

    texts = [" ".join(d) for d in docs]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)],
        "doc_id int, text string")
    got = {r["doc_id"] for r in near_dedup(
        df, num_perm=8, bands=4, shingle_k=2, keep="central").collect()}
    comps, pairs = _pd_near_dedup_components(texts)
    nodes = sorted({n for p in pairs for n in p})
    rank = {}
    if nodes:
        adj = {n: [] for n in nodes}
        for a, b in pairs:
            adj[a].append(b)
            adj[b].append(a)
        n = len(nodes)
        rank = {v: 1.0 / n for v in nodes}
        for _ in range(5):
            nxt = {v: (1 - 0.85) / n for v in nodes}
            for v in nodes:
                share = 0.85 * rank[v] / len(adj[v])
                for u in adj[v]:
                    nxt[u] += share
            rank = nxt
    losers = set()
    for comp in comps:
        winner = min(comp, key=lambda i: (-round(rank[i], 12), i))
        losers |= comp - {winner}
    assert got == set(range(len(texts))) - losers


_mk = st.one_of(st.integers(min_value=0, max_value=6), st.none())
_mrows = st.lists(st.tuples(_mk, vals), min_size=0, max_size=10)
_wm = st.sampled_from(["update", "delete", "ignore"])
_wn = st.sampled_from(["insert", "ignore"])


@given(tgt=_mrows, upd=_mrows, wm=_wm, wn=_wn,
       strategy=st.sampled_from(["shuffle", "broadcast"]))
@SET
def test_merge_frames_matches_model(spark, tgt, upd, wm, wn, strategy):
    """SQL-standard MERGE vs a dict model: plain-equality keys (NULL
    never matches), update takes source values, delete removes,
    unmatched source inserts — per when_matched x when_not_matched x
    strategy.  Duplicate source keys deduped first (ANSI constraint the
    engine validates separately)."""
    from cascalog_spark.operators import merge_frames

    # model requires unique source keys (like ANSI MERGE); keep first
    seen, u = set(), []
    for k, v in upd:
        if k is None or k not in seen:
            u.append((k, v))
            if k is not None:
                seen.add(k)
    t_df = _df(spark, tgt, ["k", "v"])
    u_df = _df(spark, u, ["k", "v"])
    got = _multiset(merge_frames(t_df, u_df, "k", wm, wn,
                                 strategy=strategy,
                                 validate=False).collect())
    src = {k: v for k, v in u if k is not None}
    out = []
    for k, v in tgt:
        if k is not None and k in src:
            if wm == "update":
                out.append((k, src[k]))
            elif wm == "ignore":
                out.append((k, v))
            # delete: drop
        else:
            out.append((k, v))
    if wn == "insert":
        matched_keys = {k for k, _ in tgt if k is not None and k in src}
        out += [(k, v) for k, v in u
                if k is None or k not in matched_keys]
    assert got == _multiset(out)


_ck = st.integers(min_value=0, max_value=6)
_cdc_feed = st.lists(
    st.tuples(_ck, vals, st.sampled_from(["I", "U", "D"]),
              st.integers(min_value=0, max_value=9)),
    min_size=0, max_size=12)
_cdc_tgt = st.lists(st.tuples(_ck, vals), min_size=0, max_size=8)


@given(tgt=_cdc_tgt, feed=_cdc_feed,
       strategy=st.sampled_from(["shuffle", "broadcast"]))
@SET
def test_apply_changes_matches_model(spark, tgt, feed, strategy):
    """CDC APPLY CHANGES vs a pure-Python fold: the latest change per
    key wins (seq desc), U/I replaces-or-inserts the payload, D removes
    (absent key: no-op), untouched target keys pass through — random
    op feeds include delete-then-reinsert and stale-delete-after-update
    sequences.  Feeds are generated (key, seq)-unique, the total order
    the engine documents for full determinism."""
    from cascalog_spark.operators import apply_changes

    t_seen, t = set(), []
    for k, v in tgt:  # unique target keys (standing-table invariant)
        if k not in t_seen:
            t.append((k, v))
            t_seen.add(k)
    f_seen, ch = set(), []
    for k, v, op, s in feed:
        if (k, s) not in f_seen:
            ch.append((k, v, op, s))
            f_seen.add((k, s))
    t_df = _df(spark, t, ["k", "v"])
    ch_df = spark.createDataFrame(ch, "k int, v int, op string, seq int")
    got = _multiset(apply_changes(t_df, ch_df, "k", seq_col="seq",
                                  strategy=strategy).collect())

    state = dict(t)
    win = {}
    for k, v, op, s in ch:
        if k not in win or s > win[k][2]:
            win[k] = (v, op, s)
    for k, (v, op, _s) in win.items():
        if op == "D":
            state.pop(k, None)
        else:
            state[k] = v
    assert got == _multiset(state.items())
