"""cross_join / lazy_generator / with_job_conf / IVF ANN unit tests."""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cascalog_spark import c, cross_join, lazy_generator, q
from cascalog_spark.functions.similarity import (brute_force_topk,
                                                 ivf_ann_topk)
from cascalog_spark.plans.stats import with_job_conf


def test_cross_join_cartesian(spark):
    a = spark.createDataFrame([(1,), (2,)], ["x"])
    b = spark.createDataFrame([("a",), ("b",), ("c",)], ["y"])
    rows = q(["?x", "?y"],
             (cross_join(a, b), {"x": "?x", "y": "?y"})).run(spark)
    assert len(rows) == 6
    assert set(rows) == {(i, s) for i in (1, 2) for s in "abc"}


def test_cross_join_with_filter(spark):
    a = spark.createDataFrame([(1,), (2,), (3,)], ["x"])
    b = spark.createDataFrame([(2,), (3,)], ["z"])
    rows = q(["?x", "?z"],
             (cross_join(a, b), {"x": "?x", "z": "?z"}),
             (c.lt, "?x", "?z")).run(spark)
    assert set(rows) == {(1, 2), (1, 3), (2, 3)}


def test_lazy_generator_chunks(spark):
    gen = lazy_generator(((i, i * i) for i in range(25)),
                         ["?n", "?sq"], chunk_size=10)
    df = gen.to_df(spark)
    assert df.count() == 25
    assert df.columns == ["n", "sq"]
    rows = q(["?n", "?sq"], (gen, {"n": "?n", "sq": "?sq"}),
             (c.gt, "?n", 20)).run(spark)
    assert sorted(rows) == [(21, 441), (22, 484), (23, 529), (24, 576)]


def test_lazy_generator_empty(spark):
    df = lazy_generator(iter(()), ["?a"], spark=spark)
    assert df.count() == 0


def test_with_job_conf_restores(spark):
    key = "spark.sql.shuffle.partitions"
    before = spark.conf.get(key)
    with with_job_conf(spark, {key: "3"}):
        assert spark.conf.get(key) == "3"
    assert spark.conf.get(key) == before


def test_ivf_matches_brute_force_at_full_probe(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qvec = [float(x) for x in
            emb.where(F.col("vec_id") == 0).select("embedding").first()[0]]
    exact = brute_force_topk(emb, qvec, k=5).collect()
    # probing every cell makes IVF exhaustive → must equal brute force
    approx = ivf_ann_topk(emb, qvec, k=5, n_centroids=8, n_probe=8).collect()
    assert [tuple(r) for r in approx] == [tuple(r) for r in exact]


def test_reducers_option(spark):
    df = spark.createDataFrame([(1, "a"), (2, "a"), (3, "b")], ["x", "g"])
    qr = q(["?g", "?n"], (df, {"g": "?g", "x": "?x"}),
           (c.count, "?n"), reducers=2)
    sdf = qr.to_df(spark)
    assert sorted(tuple(r) for r in sdf.collect()) == [("a", 2), ("b", 1)]
    plan = sdf._jdf.queryExecution().toString()
    assert "REPARTITION_BY_NUM" in plan or "hashpartitioning" in plan.lower()


def test_fixed_sample_row_count(spark, sf_dir):
    import __spark_entry__ as entry_mod

    df = entry_mod.orders_fixed_sample(spark, sf_dir)
    n_orders = spark.read.parquet(f"{sf_dir}/orders.parquet").count()
    assert df.count() == min(50, n_orders)
    assert df.columns == ["o_orderkey", "o_totalprice"]


def test_checkpoint_gen(spark):
    from cascalog_spark import checkpoint_gen

    base = spark.createDataFrame([(i, i % 3) for i in range(30)], ["x", "g"])
    inner = q(["?g", "?n"], (base, {"x": "?x", "g": "?g"}), (c.count, "?n"))
    ck = checkpoint_gen(inner)
    # fan out from the checkpoint twice — second use reuses materialization
    r1 = q(["?g", "?n"], (ck, {"g": "?g", "n": "?n"}),
           (c.gt, "?n", 9)).run(spark)
    r2 = q(["?g"], (ck, {"g": "?g", "n": "?n"})).run(spark)
    assert sorted(r1) == [(0, 10), (1, 10), (2, 10)]
    assert sorted(r2) == [(0,), (1,), (2,)]


def test_describe_plan(spark):
    people = spark.createDataFrame([("a", 1)], ["p", "n"])
    other = spark.createDataFrame([("a", 2)], ["p", "m"])
    qr = q(["?p", "?tot"],
           (people, {"p": "?p", "n": "?n"}),
           (other, {"p": "?p", "m": "?m"}),
           (c.add, "?n", "?m", ":>", "?s"),
           (c.sum_agg, "?s", ":>", "?tot"))
    txt = qr.describe()
    assert "GroupingNode" in txt and "JoinNode" in txt
    assert "ProjectionNode" in txt


def test_defmain_decorator(spark):
    from cascalog_spark import defmain

    @defmain
    def job(sp, a, b):
        return int(a) + int(b)

    assert callable(job.main)
    # direct invocation still works (decorator is non-destructive)
    assert job(spark, 1, 2) == 3


def test_jdbc_tap_option_mapping():
    from cascalog_spark.sources import JdbcTap

    tap = JdbcTap(url="jdbc:postgresql://h/db", table="t",
                  partition_column="id", lower_bound=0, upper_bound=1000,
                  num_partitions=16)
    opts = tap._opts()
    assert opts["partitionColumn"] == "id"
    assert opts["numPartitions"] == "16"
    assert opts["dbtable"] == "t"


def test_subquery_fluent_builder(spark):
    from cascalog_spark import Subquery

    follows = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "c")], ["src", "dst"])
    res = (Subquery("?p", "?n")
           .predicate(follows, {"src": "?p", "dst": "?o"})
           .predicate(c.count, "?n")
           .run(spark))
    assert sorted(res) == [("a", 2), ("b", 1)]

    # .out() chaining + use as a generator inside a q()
    sub = (Subquery("?p", "?n")
           .predicate(follows, {"src": "?p", "dst": "?o"})
           .predicate(c.count, "?n"))
    outer = q(["?p"], (sub, {"p": "?p", "n": "?n"}),
              (c.gt, "?n", 1)).run(spark)
    assert outer == [("a",)]


def test_midje_checkers(spark):
    from cascalog_spark import first_n
    from cascalog_spark.testing import (produces_in_order, produces_prefix,
                                        produces_some, produces_suffix)

    data = [(i, i * 10) for i in range(6)]
    base = q(["?x", "?y"], (data, "?x", "?y"))
    assert produces_some(base, spark, [(2, 20), (5, 50)])
    assert not produces_some(base, spark, [(9, 90)])

    ordered = first_n(base, 4, sort=["?x"])  # 0,1,2,3 ascending
    assert produces_prefix(ordered, spark, [(0, 0), (1, 10)])
    assert produces_suffix(ordered, spark, [(2, 20), (3, 30)])
    assert produces_in_order(ordered, spark, [(0, 0), (2, 20)])
    assert produces_in_order(ordered, spark, [(1, 10), (2, 20)],
                             no_gaps=True)
    assert not produces_in_order(ordered, spark, [(0, 0), (2, 20)],
                                 no_gaps=True)


def test_bucketed_tap_colocated_join_no_exchange(spark, tmp_path):
    """Two tables bucketed on the same key join with ZERO shuffle — the
    co-located-join scale primitive."""
    from cascalog_spark.sources import BucketedTap

    a = spark.createDataFrame([(i, i * 2) for i in range(100)], ["k", "va"])
    b = spark.createDataFrame([(i, i * 3) for i in range(100)], ["k", "vb"])
    ta = BucketedTap(table="bt_a", path=str(tmp_path / "a"),
                     bucket_by=["k"], n_buckets=4)
    tb = BucketedTap(table="bt_b", path=str(tmp_path / "b"),
                     bucket_by=["k"], n_buckets=4)
    ta.save_df(a)
    tb.save_df(b)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = ta.load_df(spark).join(tb.load_df(spark), "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan  # bucketing removed both shuffles
        assert joined.count() == 100
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS bt_a")
        spark.sql("DROP TABLE IF EXISTS bt_b")


def test_defprepfn_lifecycle(spark):
    from cascalog_spark import defprepfn

    @defprepfn(returns="bigint")
    def expensive_scorer():
        base = 100  # stands in for a model load — once per worker
        return lambda x: x + base

    df = spark.createDataFrame([(i,) for i in range(5)], ["x"])
    rows = q(["?x", "?y"], (df, {"x": "?x"}),
             (expensive_scorer, "?x", ":>", "?y")).run(spark)
    assert sorted(rows) == [(i, i + 100) for i in range(5)]


def test_salted_join_matches_plain_join(spark):
    from cascalog_spark.functions import salted_join

    # 90% of the fact rows share one hot key
    facts = spark.createDataFrame(
        [(1 if i % 10 else i, i) for i in range(200)], ["k", "v"])
    dim = spark.createDataFrame([(i, f"d{i}") for i in range(20)],
                                ["k", "name"])
    plain = facts.join(dim, ["k"], "inner").collect()
    salted = salted_join(facts, dim, ["k"], "inner", n_salt=8).collect()
    assert sorted(map(tuple, salted)) == sorted(map(tuple, plain))
    left_plain = facts.join(dim, ["k"], "left").collect()
    left_salted = salted_join(facts, dim, ["k"], "left", n_salt=8).collect()
    assert sorted(map(tuple, left_salted)) == sorted(map(tuple, left_plain))


def test_ivf_index_partition_pruning(spark, sf_dir, tmp_path):
    """The persisted IVF layout must prune to the probed cells at the FILE
    level (PartitionFilters), and agree with the in-memory IVF query."""
    from cascalog_spark.functions.similarity import (ivf_ann_topk,
                                                     ivf_query_index,
                                                     ivf_write_index)

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qvec = [float(x) for x in
            emb.where(F.col("vec_id") == 0).select("embedding").first()[0]]
    path = str(tmp_path / "ivf_index")
    cents = ivf_write_index(emb, path, n_centroids=8)
    res = ivf_query_index(spark, path, cents, qvec, k=5, n_probe=2)
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(__cell" in plan \
        or "__cell#" in plan.split("PartitionFilters")[1][:200]
    mem = ivf_ann_topk(emb, qvec, k=5, n_centroids=8, n_probe=2).collect()
    assert [tuple(r) for r in res.collect()] == [tuple(r) for r in mem]


def test_ivf_partial_probe_subset(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qvec = [float(x) for x in
            emb.where(F.col("vec_id") == 0).select("embedding").first()[0]]
    res = ivf_ann_topk(emb, qvec, k=5, n_centroids=8, n_probe=2).collect()
    assert 0 < len(res) <= 5
    # query vector itself lives in a probed cell (its own nearest cell)
    assert res[0]["vec_id"] == 0 and res[0]["sim"] == 1.0


def test_ivf_kmeans_centroids_balance_skewed_ids(spark):
    """VERDICT r1 #8: first-k-ids seeding degenerates when the id space is
    skewed (the k lowest ids all sit in one region of embedding space).
    Sampled-KMeans centroids must recover balanced cells behind the same
    ivf_assign_col interface."""
    import random

    from cascalog_spark.functions.similarity import (ivf_assign_col,
                                                     ivf_centroids,
                                                     ivf_centroids_kmeans)

    rng = random.Random(7)
    centers = [[10.0, 0.0, 0.0], [0.0, 10.0, 0.0],
               [0.0, 0.0, 10.0], [-10.0, -10.0, 0.0]]
    rows = []
    # ids 0..15 ALL in cluster 0 (skewed id space); remaining ids round-robin
    for i in range(400):
        cluster = 0 if i < 16 else i % 4
        v = [c0 + rng.gauss(0, 0.5) for c0 in centers[cluster]]
        rows.append((i, v))
    df = spark.createDataFrame(
        [(i, v, (0 if i < 16 else i % 4)) for (i, v), _ in
         zip(rows, range(len(rows)))],
        ["vec_id", "embedding", "true_cluster"])
    vec = F.col("embedding").cast("array<double>")

    def purity(cents):
        """Weighted mean over cells of (dominant true cluster fraction) —
        1.0 means every Voronoi cell maps to exactly one real mode."""
        cnt = (df.withColumn("__cell", ivf_assign_col(vec, cents))
               .groupBy("__cell", "true_cluster").count().collect())
        by_cell = {}
        for r in cnt:
            by_cell.setdefault(r["__cell"], []).append(r["count"])
        total = sum(sum(v) for v in by_cell.values())
        return sum(max(v) for v in by_cell.values()) / total

    # first-4-ids centroids all come from cluster 0: four near-identical
    # directions can't separate the other three modes
    seed_purity = purity(ivf_centroids(df, n_centroids=4))
    km_cents = ivf_centroids_kmeans(df, n_centroids=4, sample_rows=300,
                                    seed=11)
    km_purity = purity(km_cents)
    assert len(km_cents) == 4
    assert km_purity > 0.95
    assert seed_purity < km_purity - 0.1


def test_get_out_fields_parity(spark):
    """parse.clj IOutputFields / platform.clj:353-361: queries and
    declared-field taps answer; a field-less tap THROWS (Fields/ALL has no
    specific out-fields) instead of guessing."""
    import pytest

    from cascalog_spark import (Subquery, get_out_fields, name_vars,
                                num_out_fields, q as Q, select_fields)
    from cascalog_spark.sources import CascalogTap, MemoryTap, ParquetTap

    query = Q(["?a", "?b"], ([(1, 2)], "?a", "?b"))
    assert get_out_fields(query) == ["?a", "?b"]
    assert num_out_fields(query) == 2
    assert get_out_fields(Subquery("?x", "?n")) == ["?x", "?n"]

    tap = MemoryTap(["p", "a"], [("x", 1)])
    assert get_out_fields(tap) == ["p", "a"]
    assert get_out_fields(CascalogTap(source=tap, sink=None)) == ["p", "a"]
    assert get_out_fields(ParquetTap(path="/x", fields=["c1"])) == ["c1"]
    assert get_out_fields(name_vars(tap, ["?p", "?a"])) == ["?p", "?a"]
    assert get_out_fields(select_fields(tap, ["a"])) == ["a"]

    with pytest.raises(ValueError, match="Cannot get specific out-fields"):
        get_out_fields(ParquetTap(path="/x"))
    with pytest.raises(TypeError, match="not a generator"):
        get_out_fields(42)


def test_select_fields_cascalogtap_query(spark):
    """cascading_api_test.clj:278-285 verbatim: select-fields over a
    cascalog-tap REORDERS (f4, f2) inside a query."""
    from cascalog_spark import q as Q, select_fields
    from cascalog_spark.sources import CascalogTap, MemoryTap

    data = MemoryTap(["f1", "f2", "f3", "f4"],
                     [(1, 2, 3, 4), (11, 12, 13, 14), (21, 22, 23, 24)])
    ct = CascalogTap(source=data, sink=None)
    qr = Q(["?a", "?b"], (select_fields(ct, ["f4", "f2"]), "?a", "?b"))
    assert sorted(qr.run(spark)) == [(4, 2), (14, 12), (24, 22)]


def test_bench_contract_shape():
    """bench.py must keep the driver contract: headline set is importable,
    every bench query exists in queries(), and each has an oracle (the
    driver records BENCH_r{N} against these names)."""
    import bench as bench_mod
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert len(bench_mod.BENCH_QUERIES) >= 15
    for name in bench_mod.BENCH_QUERIES:
        assert name in qs, f"bench query {name} missing from queries()"
        assert name in oracles, f"bench query {name} has no oracle"


def test_describe_dot_valid_tree(tmp_path):
    """describe_dot: valid DOT, one node per IR node, tree-shaped edges
    (reference explain writes the flow DOT — api.clj:71-86)."""
    import re
    from cascalog_spark import q, c

    rows = [("a", 1), ("b", 2), ("a", 3)]
    query = q(["?k", "?s"], (rows, "?k", "?v"), (c.sum_agg, "?v", ":>", "?s"))
    out = tmp_path / "plan.dot"
    dot = query.describe_dot(str(out))
    assert out.read_text().strip() == dot.strip()
    assert dot.startswith("digraph") and dot.rstrip().endswith("}")
    assert dot.count("{") == dot.count("}")
    nodes = re.findall(r'^\s*(n\d+) \[label="', dot, re.M)
    edges = re.findall(r'^\s*n\d+ -> n\d+;', dot, re.M)
    assert len(nodes) == len(set(nodes)) >= 2
    assert len(edges) == len(nodes) - 1  # tree
    assert "GroupingNode" in dot


def test_first_n_mixed_directions(spark):
    """(var, 'asc'|'desc') sort entries: Q3-style revenue DESC, date ASC."""
    from cascalog_spark import first_n, q

    rows = [("a", 10, 3), ("b", 10, 1), ("c", 5, 2), ("d", 20, 9)]
    inner = q(["?k", "?rev", "?d"], (rows, "?k", "?rev", "?d"))
    got = first_n(inner, 3, sort=[("?rev", "desc"), ("?d", "asc")]) \
        .to_df(spark).collect()
    assert [(r.k) for r in got] == ["d", "b", "a"]
    # plan stays TakeOrderedAndProject
    plan = (first_n(inner, 3, sort=[("?rev", "desc"), ("?d", "asc")])
            .to_df(spark)._jdf.queryExecution().executedPlan().toString())
    assert "TakeOrderedAndProject" in plan


def test_api_secondary_reference_cases(spark):
    """api_secondary_test.clj ported: symmetric multi-column aggregators
    (clj:73-80), construct from predicates-as-data with !!var padding
    (clj:53-62), fail-to-construct missing-var error (clj:64-70),
    higher-order query builders incl. a buffer param (clj:34-51),
    scalar-sequence sources and literal-join data structures
    (clj:82-88,199-205)."""
    import pytest

    from cascalog_spark import c, construct, defbufferfn, q
    from cascalog_spark.testing import assert_produces

    # symmetric ops: one agg PER column
    nums3 = [(1, 2, 3), (10, 20, 30), (100, 200, 300)]
    qr = q(["?s1", "?s2", "?s3", "?min1", "?min2", "?min3",
            "?max1", "?max2", "?max3"],
           (nums3, "?a", "?b", "?c"),
           (c.sum_agg, "?a", "?b", "?c", ":>", "?s1", "?s2", "?s3"),
           (c.min_agg, "?a", "?b", "?c", ":>", "?min1", "?min2", "?min3"),
           (c.max_agg, "?a", "?b", "?c", ":>", "?max1", "?max2", "?max3"))
    assert_produces(qr, spark, [(111, 222, 333, 1, 2, 3, 100, 200, 300)])

    # construct: predicates assembled as data; !!g pads the outer join
    age = [("alice", 25), ("bob", 30)]
    gender = [("alice", "f"), ("charlie", "m")]
    inc = c.column_op("inc", lambda x: x + 1)
    preds = [[age, "?p", "?a"], [inc, "?a", ":>", "?a2"]]
    preds.append([gender, "?p", "!!g"])
    qr = construct(["?p", "?a2", "!!g"], preds)
    assert_produces(qr, spark, [("alice", 26, "f"), ("bob", 31, None)])

    # fail-to-construct: an output var no predicate supplies is loud
    foos = [("alice",), ("bob",)]
    with pytest.raises(Exception, match="bar"):
        construct(["?foo", "?bar"], [[foos, "?foo"]]).run(spark)

    # higher-order: a fn parameterized on the op builds the query
    nums = [(1, 1), (2, 2), (1, 3)]

    def op_to_pairs(sq, op):
        return q(["?c"], (sq, "?a", "?b"), (op, "?a", "?b", ":>", "?c"))

    assert_produces(op_to_pairs(nums, c.add), spark, [(2,), (4,), (4,)])
    assert_produces(op_to_pairs(nums, c.sub), spark, [(0,), (0,), (-2,)])

    @defbufferfn(returns=["bigint"], name="sum+1")
    def sum_plus_1(pdf):
        import pandas as pd
        return pd.DataFrame({"s": [int(pdf.iloc[:, 0].sum()) + 1]})

    assert_produces(op_to_pairs(nums, sum_plus_1), spark, [(5,)])

    # literal collections join like any generator (test-data-structure)
    src = [(1, 5), (5, 6), (8, 2)]
    qr = q(["?a", "?b"], ([(1,), (2,)], "?a"), (src, "?a", "?b"))
    assert_produces(qr, spark, [(1, 5)])

    # scalar-sequence source: [1 2 3] == [[1] [2] [3]]
    assert_produces(q(["?n"], ([(1,), (2,), (3,)], "?n")), spark,
                    [(1,), (2,), (3,)])
    assert_produces(q(["?n"], ([1, 2, 3], "?n")), spark,
                    [(1,), (2,), (3,)])


def test_jcascalog_reference_cases(spark):
    """jcascalog_test.clj ported through the fluent Subquery facade:
    vanilla double-sum chain, constant equality filter + DISTINCT
    option, predicate macros through .predicate/.out, the
    PredicateMacroTemplate with intermediate-var RENAMING (the caller's
    ?sum must not capture the template's internal ?sum), first-n over a
    subquery with a CONSTANT in a generator binding position, and
    Api/each symmetric application."""
    from cascalog_spark import (Subquery, c, first_n, predmacro,
                                predmacro_template, q)
    from cascalog_spark.testing import assert_produces
    from cascalog_spark.vars import gen_var

    value = [("a", 1), ("a", 2), ("b", 10), ("c", 3), ("b", 2), ("a", 6)]
    res = (Subquery("?letter", "?doublesum")
           .predicate(value, "?letter", "?v")
           .predicate(c.mult, "?v", 2).out("?double")
           .predicate(c.sum_agg, "?double").out("?doublesum")
           .run(spark))
    assert sorted(res) == [("a", 18), ("b", 24), ("c", 6)]

    res = (Subquery("?letter")
           .predicate(value, "?letter", "_")
           .predicate(c.eq, "?letter", "a")
           .run(spark))
    assert sorted(res) == [("a",)] * 3

    res = (Subquery("?letter")
           .predicate(value, "?letter", "_")
           .predicate(c.eq, "?letter", "a")
           .option(distinct=True)
           .run(spark))
    assert res == [("a",)]

    # my-avg predicate macro (jcascalog_test.clj:41-54)
    @predmacro
    def my_avg(invars, outvars):
        cnt, s = gen_var("!"), gen_var("!")
        return [(c.count, cnt),
                (c.sum_agg, invars[0], ":>", s),
                (c.div, s, cnt, ":>", outvars[0])]

    nums = [(1,), (2,), (3,), (4,), (5,)]
    res = (Subquery("?avg")
           .predicate(nums, "?v")
           .predicate(my_avg, "?v").out("?avg")
           .run(spark))
    assert res == [(3.0,)]

    # PredicateMacroTemplate (clj:56-68): caller binds ?sum — the
    # template's OWN ?sum must rename away instead of colliding
    my_avg_template = predmacro_template(
        ["?v"], ["?avg"],
        [(c.count, "?count"),
         (c.sum_agg, "?v", ":>", "?sum"),
         (c.div, "?sum", "?count", ":>", "?avg")])
    res = (Subquery("?avg")
           .predicate(nums, "?sum")
           .predicate(my_avg_template, "?sum").out("?avg")
           .run(spark))
    assert res == [(3.0,)]

    # first-n over a subquery + CONSTANT in generator binding position
    data = [("a", 1), ("a", 1), ("b", 1), ("c", 1), ("c", 1), ("a", 1),
            ("d", 1)]
    sq = (Subquery("?l", "?count")
          .predicate(data, "?l", "_")
          .predicate(c.count, "?count")
          .build())
    firstn = first_n(sq, 2, sort=["?count"], reverse=True)
    res = q(["?l"], (firstn, "?l", 2)).run(spark)
    assert res == [("c",)]

    # Api/each(Sum) over three vars (clj:84-90) = one independent sum
    # per column — the symmetric-aggregator expansion
    res = q(["?x", "?y", "?z"],
            ([(1, 2, 3), (4, 5, 6)], "?a", "?b", "?c"),
            (c.sum_agg, "?a", "?b", "?c", ":>", "?x", "?y", "?z"),
            ).run(spark)
    assert res == [(5, 7, 9)]


def test_ivf_append_index_incremental_ingest(spark, sf_dir, tmp_path):
    """Appending a new batch against the SAME centroid table: old files
    are untouched (no rewrite), the appended vectors are queryable, and
    the combined index equals a from-scratch build over old+new."""
    import os
    from cascalog_spark.functions.similarity import (ivf_append_index,
                                                     ivf_query_index,
                                                     ivf_write_index)

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    old = emb.where(F.col("vec_id") % 2 == 0)
    new = emb.where(F.col("vec_id") % 2 == 1)
    path = str(tmp_path / "ivf_inc")
    cents = ivf_write_index(old, path, n_centroids=8)

    def files():
        out = set()
        for root, _, names in os.walk(path):
            out.update(os.path.join(root, n) for n in names
                       if n.endswith(".parquet"))
        return out

    before = files()
    ivf_append_index(new, path, cents)
    after = files()
    assert before <= after and len(after) > len(before)  # pure append

    qvec = [float(x) for x in
            emb.where(F.col("vec_id") == 1).select("embedding").first()[0]]
    res = ivf_query_index(spark, path, cents, qvec, k=5, n_probe=2)
    rows = [tuple(r) for r in res.collect()]
    assert rows[0][0] == 1 and rows[0][1] == 1.0   # new vector found
    # combined layout == one-shot build over the full corpus (same cents)
    path2 = str(tmp_path / "ivf_full")
    ivf_write_index(emb, path2, n_centroids=8, centroids=cents)
    res2 = ivf_query_index(spark, path2, cents, qvec, k=5, n_probe=2)
    assert rows == [tuple(r) for r in res2.collect()]
