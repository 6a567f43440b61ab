"""Data-quality expectation checks (functions/expectations.py),
differentially tested against DuckDB on the driver tables, plus the
NULL / empty-input edge cases a production gate must get right."""

import duckdb
import pytest
from pyspark.sql import functions as F

from cascalog_spark.functions import (check_expectations,
                                      referential_orphans,
                                      referential_report, unique_report)


@pytest.fixture(scope="module")
def orders(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/orders.parquet")


@pytest.fixture(scope="module")
def lineitem(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/lineitem.parquet")


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in ("orders", "lineitem", "customer"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def test_check_expectations_vs_duck(orders, duck):
    out = check_expectations(orders, {
        "price_positive": F.col("o_totalprice") > 0,
        "status_domain": "o_orderstatus IN ('O', 'F', 'P')",
        "custkey_not_null": F.col("o_custkey").isNotNull(),
        "price_under_1m": F.col("o_totalprice") < 1_000_000,
    }).orderBy("rule")
    oracle = duck.sql("""
        WITH n AS (SELECT count(*) AS n_rows FROM orders)
        SELECT r.rule, n.n_rows, r.n_fail,
               round(r.n_fail * 1.0 / n.n_rows, 6) AS fail_frac,
               r.n_fail = 0 AS passed
        FROM n, (
          SELECT 'custkey_not_null' AS rule,
                 sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS n_fail
          FROM orders
          UNION ALL
          SELECT 'price_positive',
                 sum(CASE WHEN o_totalprice > 0 THEN 0 ELSE 1 END)
          FROM orders
          UNION ALL
          SELECT 'price_under_1m',
                 sum(CASE WHEN o_totalprice < 1000000 THEN 0 ELSE 1 END)
          FROM orders
          UNION ALL
          SELECT 'status_domain',
                 sum(CASE WHEN o_orderstatus IN ('O','F','P')
                     THEN 0 ELSE 1 END)
          FROM orders) r
        ORDER BY r.rule""")
    a = [tuple(r) for r in out.collect()]
    b = [tuple(r) for r in oracle.fetchall()]
    assert [(x[0], int(x[1]), int(x[2]), float(x[3]), bool(x[4]))
            for x in a] == \
           [(y[0], int(y[1]), int(y[2]), float(y[3]), bool(y[4]))
            for y in b]


def test_null_predicate_counts_as_failure(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, -5.0)], "id long, v double")
    out = {r["rule"]: r for r in
           check_expectations(df, {"v_pos": F.col("v") > 0}).collect()}
    # row 2: (NULL > 0) is NULL in SQL — the gate must count it failed
    assert out["v_pos"]["n_fail"] == 2
    assert out["v_pos"]["n_rows"] == 3
    assert not out["v_pos"]["passed"]


def test_empty_input_passes(spark):
    df = spark.createDataFrame([], "id long, v double")
    rows = check_expectations(
        df, {"v_pos": F.col("v") > 0, "id_nn": "id IS NOT NULL"}).collect()
    assert len(rows) == 2
    for r in rows:
        assert r["n_rows"] == 0 and r["n_fail"] == 0 and r["passed"]
        assert r["fail_frac"] == 0.0


def test_check_expectations_rejects_empty_rules(orders):
    with pytest.raises(ValueError):
        check_expectations(orders, {})


def test_unique_report_vs_duck(lineitem, duck):
    row = unique_report(lineitem, ["l_orderkey", "l_linenumber"]).first()
    o = duck.sql("""
        WITH k AS (SELECT l_orderkey, l_linenumber, count(*) AS c
                   FROM lineitem GROUP BY 1, 2)
        SELECT sum(c) AS n_rows, count(*) AS n_keys,
               sum(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS n_dup_keys,
               sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS n_dup_rows
        FROM k""").fetchone()
    assert (row["n_rows"], row["n_keys"],
            row["n_dup_keys"], row["n_dup_rows"]) == \
           (int(o[0]), int(o[1]), int(o[2]), int(o[3]))
    assert row["passed"] == (row["n_dup_keys"] == 0)


def test_unique_report_null_keys_group(spark):
    df = spark.createDataFrame(
        [(None, 1), (None, 2), (5, 3)], "k int, v int")
    row = unique_report(df, ["k"]).first()
    # two NULL keys ARE a duplicate for gating purposes
    assert row["n_dup_keys"] == 1 and row["n_dup_rows"] == 2
    assert not row["passed"]


def test_referential_orphans_and_report(spark, lineitem, orders, duck):
    # the driver data is referentially clean — verify zero orphans...
    rep = referential_report(lineitem, orders,
                             {"l_orderkey": "o_orderkey"}).first()
    n_child = duck.sql("SELECT count(*) FROM lineitem").fetchone()[0]
    n_orph = duck.sql("""
        SELECT count(*) FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_orderkey = l.l_orderkey)""").fetchone()[0]
    assert (rep["n_child"], rep["n_orphans"]) == (int(n_child), int(n_orph))
    # ...then inject orphans (NULL key + unknown key) and see them surface
    extra = spark.createDataFrame(
        [(None,), (-999,)], "l_orderkey long").withColumns(
        {c: F.lit(None).cast(t) for c, t in lineitem.dtypes
         if c != "l_orderkey"})
    child = lineitem.unionByName(extra.select(*lineitem.columns))
    orphans = referential_orphans(child, orders,
                                  {"l_orderkey": "o_orderkey"})
    got = sorted([r["l_orderkey"] for r in orphans.collect()],
                 key=lambda x: (x is not None, x))
    assert got == [None, -999] if n_orph == 0 else len(got) == n_orph + 2


def test_referential_broadcast_plan(lineitem, orders):
    plan = referential_orphans(
        lineitem, orders, {"l_orderkey": "o_orderkey"})._jdf \
        .queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_expectations_single_scan_plan(orders):
    out = check_expectations(orders, {
        "p": F.col("o_totalprice") > 0,
        "s": "o_orderstatus IN ('O', 'F', 'P')",
    })
    plan = out._jdf.queryExecution().executedPlan().toString()
    # all rules fold into ONE aggregate over ONE scan: no join, no
    # per-rule union branches, exactly one parquet scan
    assert plan.count("Scan parquet") == 1
    assert "Join" not in plan and "Union" not in plan
    # the only exchange is the 1-row-per-partition SinglePartition one
    assert plan.count("Exchange") == 1 and "SinglePartition" in plan


# --- dataset_fingerprint ---------------------------------------------------

def test_fingerprint_order_and_partitioning_invariant(orders):
    from cascalog_spark.functions import dataset_fingerprint

    base = orders.select("o_orderkey", "o_orderstatus")
    a = dataset_fingerprint(base).first()
    b = dataset_fingerprint(
        base.repartition(17).orderBy(F.desc("o_orderkey"))).first()
    assert a.asDict() == b.asDict()
    assert a["n_rows"] > 0 and a["min_hash"] <= a["max_hash"]


def test_fingerprint_detects_changes(spark):
    from cascalog_spark.functions import dataset_fingerprint

    df = spark.createDataFrame([(i, f"v{i}") for i in range(100)],
                               "k int, v string")
    base = dataset_fingerprint(df).first()
    mutated = df.withColumn(
        "v", F.when(F.col("k") == 42, F.lit("vX")).otherwise(F.col("v")))
    dropped = df.where("k <> 42")
    assert dataset_fingerprint(mutated).first()["xor_hash"] \
        != base["xor_hash"]
    d = dataset_fingerprint(dropped).first()
    assert (d["n_rows"], d["xor_hash"]) != (base["n_rows"],
                                            base["xor_hash"])


def test_fingerprint_null_vs_empty_string_distinct(spark):
    from cascalog_spark.functions import dataset_fingerprint

    a = spark.createDataFrame([(1, None)], "k int, v string")
    b = spark.createDataFrame([(1, "")], "k int, v string")
    assert dataset_fingerprint(a).first()["xor_hash"] \
        != dataset_fingerprint(b).first()["xor_hash"]


def test_fingerprint_one_aggregate_pass(orders):
    from cascalog_spark.functions import dataset_fingerprint

    plan = dataset_fingerprint(orders.select("o_orderkey"))._jdf \
        .queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1
    assert "Join" not in plan
    assert plan.count("Exchange") == 1 and "SinglePartition" in plan


def test_fingerprint_no_cross_column_shift_collision(spark):
    from cascalog_spark.functions import dataset_fingerprint

    a = spark.createDataFrame([("a|b", "c")], "x string, y string")
    b = spark.createDataFrame([("a", "b|c")], "x string, y string")
    # plain '|'-joining would make these identical; the length-prefixed
    # encoding must not
    assert dataset_fingerprint(a).first()["xor_hash"] \
        != dataset_fingerprint(b).first()["xor_hash"]
    # NULL never collides with the sentinel-ish literals either
    c = spark.createDataFrame([("n", "v1:x")], "x string, y string")
    d = spark.createDataFrame([(None, "v1:x")], "x string, y string")
    assert dataset_fingerprint(c).first()["xor_hash"] \
        != dataset_fingerprint(d).first()["xor_hash"]


def test_export_manifest(spark, tmp_path):
    from cascalog_spark.functions.expectations import (dataset_fingerprint,
                                                       export_manifest)

    df = spark.createDataFrame([(i, f"v{i}") for i in range(500)],
                               "k int, v string")
    path = str(tmp_path / "export")
    df.repartition(4).write.parquet(path)
    man = export_manifest(spark, path).collect()
    assert len(man) == 4
    assert sum(r["n_rows"] for r in man) == 500
    # xor of per-file hashes folds to the whole-dataset fingerprint
    folded = 0
    for r in man:
        folded ^= r["xor_hash"]
    whole = dataset_fingerprint(spark.read.parquet(path)).first()
    assert folded == whole["xor_hash"]
    # recomputation is stable
    man2 = {r["file"]: r["xor_hash"]
            for r in export_manifest(spark, path).collect()}
    assert man2 == {r["file"]: r["xor_hash"] for r in man}
    # per-file granularity is real: a different physical layout of the
    # SAME rows yields a different per-file manifest whose xors still
    # fold to the identical whole-dataset fingerprint
    path2 = str(tmp_path / "export2")
    df.repartition(7).write.parquet(path2)
    man_b = export_manifest(spark, path2).collect()
    assert len(man_b) == 7
    folded_b = 0
    for r in man_b:
        folded_b ^= r["xor_hash"]
    assert folded_b == folded
    # and rewriting one shard flips exactly that file's row
    import glob
    import os

    victim = sorted(glob.glob(f"{path2}/part-*.parquet"))[0]
    keep = spark.read.parquet(victim).limit(1)
    tmp_out = str(tmp_path / "victim_rewrite")
    keep.coalesce(1).write.parquet(tmp_out)
    os.replace(glob.glob(f"{tmp_out}/part-*.parquet")[0], victim)
    # the local-FS .crc sidecar still describes the OLD bytes
    crc = os.path.join(os.path.dirname(victim),
                       f".{os.path.basename(victim)}.crc")
    if os.path.exists(crc):
        os.remove(crc)
    spark.catalog.refreshByPath(path2)  # drop the stale listing cache
    base = {r["file"]: r["xor_hash"] for r in man_b}
    man_c = {r["file"]: r["xor_hash"]
             for r in export_manifest(spark, path2).collect()}
    diff = [f for f in base if man_c.get(f) != base[f]]
    assert len(diff) == 1 and diff[0].endswith(
        os.path.basename(victim)), diff


def test_embedding_drift_report(spark, sf_dir):
    """Vector-space drift metrics: self-drift is the identity
    (cosine 1, shift 0, both PSIs 0); disjoint halves produce finite
    metrics; deterministic across shuffle layouts."""
    from pyspark.sql import functions as F

    from cascalog_spark.functions import embedding_drift_report

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    e = emb.where(F.col("vec_id") % 2 == 0)
    a = emb.where(F.col("vec_id") % 2 == 1)
    self_ = {r["metric"]: r["value"]
             for r in embedding_drift_report(e, e).collect()}
    assert self_ == {"mean_cosine": 1.0, "mean_l2_shift": 0.0,
                     "norm_psi": 0.0, "cell_psi": 0.0}
    drift = {r["metric"]: r["value"]
             for r in embedding_drift_report(e, a).collect()}
    assert set(drift) == set(self_)
    assert all(v is not None for v in drift.values())
    assert -1.0 <= drift["mean_cosine"] <= 1.0
    assert drift["mean_l2_shift"] >= 0.0
    # re-run with a different partitioning: values stable
    drift2 = {r["metric"]: r["value"] for r in embedding_drift_report(
        e.repartition(13), a.repartition(7)).collect()}
    assert drift2 == drift

    import pytest as _pt
    empty = emb.where(F.lit(False))
    with _pt.raises(ValueError, match="empty expected"):
        embedding_drift_report(empty, a)


def test_embedding_drift_ref_model_and_stream(spark, sf_dir, tmp_path):
    """Frozen-reference form == two-DataFrame form when the actual side
    sits inside the reference's norm range (reference = full table,
    actual = subset); the streaming monitor writes per-batch rows that
    equal the one-shot ref-model report of each batch."""
    from pyspark.sql import functions as F

    from cascalog_spark.functions import (embedding_drift_reference,
                                          embedding_drift_report)
    from cascalog_spark.streaming import stream_embedding_drift_monitor

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    sub = emb.where(F.col("vec_id") % 3 == 1)
    model = embedding_drift_reference(emb)
    two = {r["metric"]: r["value"]
           for r in embedding_drift_report(emb, sub).collect()}
    frz = {r["metric"]: r["value"]
           for r in embedding_drift_report(None, sub,
                                           ref_model=model).collect()}
    assert frz == two

    # streaming: two batches, drained rows == per-batch one-shot
    b1 = emb.where(F.col("vec_id") % 3 == 1)
    b2 = emb.where(F.col("vec_id") % 3 == 2)
    src = str(tmp_path / "edrift_src")
    for b in (b1, b2):
        b.coalesce(1).write.mode("append").parquet(src)
    sdf = (spark.readStream.schema(emb.schema)
           .option("maxFilesPerTrigger", "1").parquet(src))
    q = stream_embedding_drift_monitor(
        sdf, model, str(tmp_path / "edrift_out"),
        checkpoint_dir=str(tmp_path / "edrift_ckpt"))
    try:
        assert q.awaitTermination(240)
    finally:
        q.stop()
    got = spark.read.parquet(str(tmp_path / "edrift_out"))
    assert got.count() == 8  # 4 metrics x 2 batches
    per_batch = {(r["batch"], r["metric"]): r["value"]
                 for r in got.collect()}
    for bid_vals in ({r["metric"]: r["value"] for r in
                      embedding_drift_report(None, b, ref_model=model)
                      .collect()} for b in (b1, b2)):
        assert any(
            all(per_batch[(bid, m)] == v for m, v in bid_vals.items())
            for bid in {b for b, _ in per_batch})
