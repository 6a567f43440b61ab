"""Incremental rollup maintenance + mergeable t-digest quantile sketch.

The correctness bar mirrors the HLL daily-vs-oneshot battery: folding
deltas into a standing aggregate must equal recomputing from scratch —
bit-exact for the algebraic kinds, same-estimate for HLL, bounded rank
error for t-digest under ANY merge grouping.
"""

import random

import pytest
from pyspark.sql import Row, functions as F

from cascalog_spark.functions.rollup import (aggregate_rollup,
                                             incremental_rollup,
                                             merge_rollups)
from cascalog_spark.functions.stats import (tdigest_quantile_col,
                                            tdigest_sketch)

SPEC = {"n": ("count",), "sv": ("sum", "v"), "mn": ("min", "v"),
        "mx": ("max", "v")}


def _mk(spark, rows):
    return spark.createDataFrame([Row(k=k, u=u, v=float(v))
                                  for k, u, v in rows])


def _native(df):
    return {tuple(r)[:1] + tuple(round(x, 9) if isinstance(x, float) else x
                                 for x in tuple(r)[1:])
            for r in df.select("k", "n", "sv", "mn", "mx").collect()}


def test_incremental_equals_full_recompute(spark):
    rng = random.Random(7)
    rows = [(rng.randrange(4), rng.randrange(40), rng.uniform(-5, 100))
            for _ in range(400)]
    cut = 300
    hist, delta = _mk(spark, rows[:cut]), _mk(spark, rows[cut:])
    full = _mk(spark, rows)
    old = aggregate_rollup(hist, ["k"], SPEC).localCheckpoint()
    inc = incremental_rollup(old, delta, ["k"], SPEC)
    assert _native(inc) == _native(aggregate_rollup(full, ["k"], SPEC))


def test_merge_grouping_invariance(spark):
    # 6 daily parts merged ((d1+d2)+(d3..d6)) vs all-at-once vs pairwise
    rng = random.Random(11)
    days = [_mk(spark, [(rng.randrange(3), rng.randrange(20),
                         rng.uniform(0, 10)) for _ in range(60)])
            for _ in range(6)]
    aggs = [aggregate_rollup(d, ["k"], SPEC) for d in days]
    one = merge_rollups(aggs, ["k"], SPEC)
    nested = merge_rollups(
        [merge_rollups(aggs[:2], ["k"], SPEC),
         merge_rollups(aggs[2:], ["k"], SPEC)], ["k"], SPEC)
    assert _native(one) == _native(nested)


def test_hll_kind_matches_oneshot_estimate(spark):
    rng = random.Random(3)
    rows = [(rng.randrange(2), rng.randrange(500), 1.0) for _ in range(800)]
    spec = {"users": ("hll", "u")}
    parts = [aggregate_rollup(_mk(spark, rows[i::4]), ["k"], spec)
             for i in range(4)]
    merged = merge_rollups(parts, ["k"], spec)
    oneshot = aggregate_rollup(_mk(spark, rows), ["k"], spec)
    est = lambda df: dict(  # noqa: E731
        df.select("k", F.hll_sketch_estimate("users").alias("e")).collect())
    assert est(merged) == est(oneshot)


def test_mixed_spec_null_keys_survive_split_join(spark):
    # tdigest forces the two-pass split; NULL group keys must survive
    # the null-safe join between the native and pandas agg frames
    df = spark.createDataFrame(
        [Row(k=None, v=1.0), Row(k=None, v=3.0), Row(k="a", v=5.0)])
    spec = {"n": ("count",), "td": ("tdigest", "v")}
    out = aggregate_rollup(df, ["k"], spec)
    got = {r["k"]: (r["n"],
                    round(_q(r["td"], 0.5), 6)) for r in out.collect()}
    assert got[None][0] == 2 and got["a"][0] == 1
    assert got[None][1] == pytest.approx(2.0)
    assert got["a"][1] == pytest.approx(5.0)


def _q(sketch, q):
    from cascalog_spark.functions.stats import _td_quantiles
    return _td_quantiles(sketch[0], sketch[1], [q])[0]


def test_tdigest_incremental_rank_error_bound(spark):
    # fold 5 deltas into a standing sketch; every decile estimate must
    # sit within ~2/compression rank of the exact quantile
    rng = random.Random(42)
    vals = ([rng.gauss(0, 1) for _ in range(2000)]
            + [rng.expovariate(0.2) for _ in range(2000)])
    rows = [(0, 0, v) for v in vals]
    spec = {"td": ("tdigest", "v")}
    standing = aggregate_rollup(_mk(spark, rows[:800]), ["k"],
                                spec).localCheckpoint()
    for i in range(800, 4000, 800):
        standing = incremental_rollup(standing, _mk(spark,
                                                    rows[i:i + 800]),
                                      ["k"], spec).localCheckpoint()
    sk = standing.collect()[0]["td"]
    svals = sorted(vals)
    n = len(svals)
    for q in [0.1, 0.25, 0.5, 0.75, 0.9, 0.99]:
        est = _q(sk, q)
        rank = sum(1 for v in svals if v <= est) / n
        assert abs(rank - q) <= 0.03, (q, est, rank)


def test_tdigest_sketch_global_scale_path(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    sk = tdigest_sketch(ev, "value", compression=200)
    est = sk.select(
        tdigest_quantile_col(F.col("sketch"), 0.5).alias("p50")).first()
    exact = ev.agg(F.expr("percentile(value, 0.5)")).first()[0]
    vals = [r["value"] for r in ev.select("value").collect()]
    rank = sum(1 for v in vals if v <= est["p50"]) / len(vals)
    assert abs(rank - 0.5) <= 0.02, (est["p50"], exact, rank)


def test_tdigest_sketch_grouped_keys(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    sk = tdigest_sketch(ev, "value", keys=["event_type"])
    rows = sk.select("event_type",
                     tdigest_quantile_col(F.col("sketch"), 0.9)
                     .alias("p90")).collect()
    exact = dict(ev.groupBy("event_type")
                 .agg(F.expr("percentile(value, 0.9)")).collect())
    assert len(rows) == len(exact)
    for r in rows:
        assert r["p90"] == pytest.approx(exact[r["event_type"]], rel=0.1)


def test_tdigest_bounded_size(spark):
    df = spark.range(0, 50000).select(
        (F.col("id") % 1000).cast("double").alias("v"))
    sk = tdigest_sketch(df, "v", compression=100).first()["sketch"]
    assert len(sk[0]) <= 101 and len(sk[0]) == len(sk[1])
    assert abs(sum(sk[1]) - 50000) < 1e-6  # mass conserved


def test_empty_and_validation(spark):
    df = _mk(spark, [(0, 0, 1.0)]).where("v > 99")
    out = aggregate_rollup(df, ["k"], SPEC)
    assert out.count() == 0
    with pytest.raises(ValueError, match="non-empty"):
        aggregate_rollup(df, ["k"], {})
    with pytest.raises(ValueError, match="unknown agg kind"):
        aggregate_rollup(df, ["k"], {"x": ("median", "v")})
    with pytest.raises(ValueError, match="needs a source column"):
        aggregate_rollup(df, ["k"], {"x": ("sum",)})
    with pytest.raises(ValueError, match="non-empty"):
        merge_rollups([], ["k"], SPEC)


def test_global_rollup_no_keys(spark):
    rows = [(0, 0, float(v)) for v in range(10)]
    spec = {"n": ("count",), "sv": ("sum", "v"), "td": ("tdigest", "v")}
    hist, delta = _mk(spark, rows[:7]), _mk(spark, rows[7:])
    old = aggregate_rollup(hist, [], spec).localCheckpoint()
    r = incremental_rollup(old, delta, [], spec).collect()
    assert len(r) == 1 and r[0]["n"] == 10 and r[0]["sv"] == 45.0
    assert _q(r[0]["td"], 0.5) == pytest.approx(4.5, abs=1.0)


def test_join_merge_equals_union_merge(spark):
    from pyspark.sql import functions as F

    rng = random.Random(23)
    rows = [(rng.randrange(5), rng.randrange(30), rng.uniform(-3, 50))
            for _ in range(500)]
    spec = dict(SPEC, users=("hll", "u"), td=("tdigest", "v"))
    hist, delta = _mk(spark, rows[:350]), _mk(spark, rows[350:])
    old = aggregate_rollup(hist, ["k"], spec).localCheckpoint()
    via_union = incremental_rollup(old, delta, ["k"], spec)
    via_join = incremental_rollup(old, delta, ["k"], spec, via="join")

    def canon(df):
        return {r["k"]: (r["n"], round(r["sv"], 9), r["mn"], r["mx"],
                         r["du"], round(_q(r["td"], 0.5), 6))
                for r in df.select(
                    "k", "n", "sv", "mn", "mx", "td",
                    F.hll_sketch_estimate("users").alias("du")).collect()}

    assert canon(via_union) == canon(via_join)
    # key present only in the delta (and vice versa) survives the full join
    extra = _mk(spark, [(99, 1, 1.0)])
    j = incremental_rollup(old, extra, ["k"], spec, via="join")
    got = {r["k"] for r in j.select("k").collect()}
    assert 99 in got and got >= {r[0] for r in rows}
    with pytest.raises(ValueError, match="union|join"):
        incremental_rollup(old, delta, ["k"], spec, via="bogus")
    from cascalog_spark.functions.rollup import merge_rollup_joined
    with pytest.raises(ValueError, match="keys"):
        merge_rollup_joined(old, old, [], spec)


def test_fuzz_merge_equals_oneshot(spark):
    """Property: for ANY multiset of rows and ANY partition into parts,
    merging per-part rollups (union path AND join path for the 2-part
    case) equals the one-shot aggregate — the model is plain Python
    over the same rows."""
    import os

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from cascalog_spark.functions.rollup import merge_rollup_joined

    rows_st = st.lists(
        st.tuples(st.integers(min_value=0, max_value=3),
                  st.one_of(st.integers(min_value=-9, max_value=9),
                            st.none())),
        min_size=1, max_size=16)
    cut_st = st.integers(min_value=0, max_value=16)

    spec = {"n": ("count",), "sv": ("sum", "v"), "mn": ("min", "v"),
            "mx": ("max", "v")}

    def model(rows):
        out = {}
        for k, v in rows:
            e = out.setdefault(k, [0, None, None, None])
            e[0] += 1
            if v is not None:
                e[1] = v if e[1] is None else e[1] + v
                e[2] = v if e[2] is None else min(e[2], v)
                e[3] = v if e[3] is None else max(e[3], v)
        return {k: tuple(e) for k, e in out.items()}

    def got(df):
        return {r["k"]: (r["n"], r["sv"], r["mn"], r["mx"])
                for r in df.collect()}

    @given(rows=rows_st, cut=cut_st)
    @settings(max_examples=int(os.environ.get("CSPARK_FUZZ", "4")),
              deadline=None,
              suppress_health_check=[
                  HealthCheck.function_scoped_fixture,
                  HealthCheck.too_slow])
    def prop(rows, cut):
        cut = min(cut, len(rows))
        df = spark.createDataFrame(rows, "k int, v int")
        expected = model(rows)
        oneshot = aggregate_rollup(df, ["k"], spec)
        assert got(oneshot) == expected
        a = spark.createDataFrame(rows[:cut] or [(99, None)],
                                  "k int, v int").where("k < 99" if not
                                                        rows[:cut]
                                                        else "1=1")
        b = spark.createDataFrame(rows[cut:] or [(99, None)],
                                  "k int, v int").where("k < 99" if not
                                                        rows[cut:]
                                                        else "1=1")
        pa, pb = (aggregate_rollup(x, ["k"], spec) for x in (a, b))
        assert got(merge_rollups([pa, pb], ["k"], spec)) == expected
        assert got(merge_rollup_joined(pa, pb, ["k"], spec)) == expected

    prop()


def test_fuzz_tdigest_rank_error(spark):
    """Property: for any value multiset and any 2-way split, the merged
    sketch's quantile estimates stay within the k0 rank bound."""
    import os

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from cascalog_spark.functions.stats import tdigest_sketch

    vals_st = st.lists(
        st.floats(min_value=-1e6, max_value=1e6,
                  allow_nan=False, allow_infinity=False),
        min_size=5, max_size=300)

    @given(vals=vals_st)
    @settings(max_examples=int(os.environ.get("CSPARK_FUZZ", "4")),
              deadline=None,
              suppress_health_check=[
                  HealthCheck.function_scoped_fixture,
                  HealthCheck.too_slow])
    def prop(vals):
        df = spark.createDataFrame([(v,) for v in vals], "v double")
        sk = tdigest_sketch(df.repartition(4), "v",
                            compression=50).first()["sketch"]
        assert len(sk[0]) <= 51
        assert abs(sum(sk[1]) - len(vals)) < 1e-6
        svals = sorted(vals)
        n = len(svals)
        for qq in (0.25, 0.5, 0.75):
            est = _q(sk, qq)
            # ties make point-rank ill-defined: the estimate's rank is
            # the whole interval [#(<est), #(<=est)]/n and the bound
            # holds if q sits within tolerance of that interval
            lo = sum(1 for v in svals if v < est) / n
            hi = sum(1 for v in svals if v <= est) / n
            tol = max(0.05, 2.5 / n)
            assert lo - tol <= qq <= hi + tol, (qq, est, lo, hi)

    prop()


def test_tdigest_merge_partitioning_invariant(spark):
    """Post-fix invariant: merging a FIXED set of sketches yields the
    identical sketch regardless of how the sketch rows are partitioned
    (the lexsort(mean, weight) canonical order makes the compress a
    pure function of the centroid multiset).  Includes tied-mean
    centroids with unequal weights — the case that used to flip."""
    from cascalog_spark.functions.stats import tdigest_merge_col

    sketches = [
        [[1.0, 5.0], [2.0, 2.0]],
        [[5.0, 9.0], [4.0, 2.0]],   # 5.0 again, different weight
        [[5.0], [1.0]],             # and again
        [[3.0, 7.0], [1.0, 1.0]],
    ]
    df = spark.createDataFrame([(s,) for s in sketches],
                               "sk array<array<double>>")
    outs = []
    for parts in (1, 2, 4):
        r = (df.repartition(parts)
             .agg(tdigest_merge_col(F.col("sk"), 3).alias("m")).first())
        outs.append((tuple(r["m"][0]), tuple(r["m"][1])))
    assert outs[0] == outs[1] == outs[2], outs
    # mass conserved through the merge
    assert abs(sum(outs[0][1]) - 13.0) < 1e-9
