"""Keyed MERGE/upsert (operators/merge.py): SQL-standard semantics,
broadcast==shuffle strategy equivalence, plan shape, and the
write-new-then-swap crash windows of merge_into/MergeTap."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from cascalog_spark.operators import MergeTap, merge_frames, merge_into


@pytest.fixture()
def tgt(spark):
    return spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30), (None, "n", 99)],
        "k int, s string, v int")


@pytest.fixture()
def upd(spark):
    # k=2 matched (update), k=4 new (insert), k=NULL never matches
    return spark.createDataFrame(
        [(2, "B", 200), (4, "D", 400), (None, "N", 500)],
        "k int, s string, v int")


def _rows(df):
    return sorted(map(tuple, df.collect()),
                  key=lambda r: (r[0] is None, r))


def test_merge_upsert_semantics(spark, tgt, upd):
    got = _rows(merge_frames(tgt, upd, "k"))
    # NULL keys never match: target NULL row passes through, update
    # NULL row inserts -> both survive
    assert got == [(1, "a", 10), (2, "B", 200), (3, "c", 30),
                   (4, "D", 400), (None, "N", 500), (None, "n", 99)]


def test_merge_strategies_identical(spark, tgt, upd):
    for wm in ("update", "delete", "ignore"):
        for wn in ("insert", "ignore"):
            a = _rows(merge_frames(tgt, upd, "k", wm, wn,
                                   strategy="shuffle"))
            b = _rows(merge_frames(tgt, upd, "k", wm, wn,
                                   strategy="broadcast"))
            assert a == b, (wm, wn)


def test_merge_delete_and_ignore(spark, tgt, upd):
    got = _rows(merge_frames(tgt, upd, "k", when_matched="delete",
                             when_not_matched="ignore"))
    assert got == [(1, "a", 10), (3, "c", 30), (None, "n", 99)]
    got = _rows(merge_frames(tgt, upd, "k", when_matched="ignore",
                             when_not_matched="ignore"))
    assert got == _rows(tgt)


def test_merge_partial_update_cols(spark, tgt, upd):
    # only v taken from source; s preserved from target on matches
    got = _rows(merge_frames(tgt, upd, "k", update_cols=["v"]))
    assert (2, "b", 200) in got and (2, "B", 200) not in got


def test_merge_target_only_columns_null_on_insert(spark, tgt):
    upd = spark.createDataFrame([(2, 200), (4, 400)], "k int, v int")
    got = _rows(merge_frames(tgt, upd, "k"))
    # matched row keeps its target-only column; insert gets NULL
    assert (2, "b", 200) in got and (4, None, 400) in got


def test_merge_duplicate_update_keys_rejected(spark, tgt):
    dup = spark.createDataFrame([(2, "x", 1), (2, "y", 2)],
                                "k int, s string, v int")
    with pytest.raises(ValueError, match="duplicate key"):
        merge_frames(tgt, dup, "k").collect()
    # validate=False lets an arbitrary winner through (count pinned)
    got = merge_frames(tgt, dup, "k", validate=False)
    assert got.where(F.col("k") == 2).count() == 2


def test_merge_spec_errors(spark, tgt, upd):
    with pytest.raises(ValueError, match="when_matched"):
        merge_frames(tgt, upd, "k", when_matched="upsert")
    with pytest.raises(ValueError, match="key column"):
        merge_frames(tgt, upd, "missing")
    with pytest.raises(ValueError, match="schema evolution"):
        merge_frames(tgt, upd.withColumn("extra", F.lit(1)), "k")
    with pytest.raises(ValueError, match="cannot be updated"):
        merge_frames(tgt, upd, "k", update_cols=["k"])


def test_merge_multi_key(spark):
    t = spark.createDataFrame([(1, 1, "a"), (1, 2, "b")],
                              "k1 int, k2 int, s string")
    u = spark.createDataFrame([(1, 2, "B"), (2, 1, "C")],
                              "k1 int, k2 int, s string")
    got = _rows(merge_frames(t, u, ["k1", "k2"]))
    assert got == [(1, 1, "a"), (1, 2, "B"), (2, 1, "C")]


def test_merge_broadcast_plan_no_target_exchange(spark, sf_dir):
    """strategy='broadcast' must not shuffle the target: the kept-rows
    join is a BroadcastHashJoin and the only Exchange in the plan
    belongs to the insert anti-join's key-pruned target scan."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    upd = orders.limit(10).withColumn("o_totalprice", F.lit(0.0))
    m = merge_frames(orders, upd, "o_orderkey", strategy="broadcast",
                     validate=False)
    plan = m._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # the full-width target scan side must reach the union without an
    # Exchange; key-only scan for the anti join may shuffle
    kept_half = plan.split("BroadcastHashJoin")[0]
    assert "Exchange" not in kept_half


def test_merge_into_roundtrip_and_tap(spark, tmp_path):
    d = str(tmp_path / "tbl")
    base = spark.createDataFrame([(1, 10), (2, 20)], "k int, v int")
    # first merge bootstraps the table from the batch
    merge_into(spark, d, base, "k")
    tap = MergeTap(d, on="k")
    assert _rows(tap.to_df(spark)) == [(1, 10), (2, 20)]
    tap.merge(spark, spark.createDataFrame([(2, 99), (3, 30)],
                                           "k int, v int"))
    assert _rows(tap.to_df(spark)) == [(1, 10), (2, 99), (3, 30)]
    # keyed delete via tombstones
    tap.merge(spark, spark.createDataFrame([(1,)], "k int")
              .withColumn("v", F.lit(None).cast("int")),
              when_matched="delete", when_not_matched="ignore")
    assert _rows(tap.to_df(spark)) == [(2, 99), (3, 30)]


def test_merge_into_crash_recovery(spark, tmp_path):
    """Same crash windows as compact_rollup: (a) crash between the two
    renames -> reader raises, re-running merge_into auto-recovers from
    .compact.old and applies the batch; (b) stale .old beside a live
    target is swept."""
    d = str(tmp_path / "tbl")
    merge_into(spark, d, spark.createDataFrame([(1, 10), (2, 20)],
                                               "k int, v int"), "k")
    upd = spark.createDataFrame([(2, 99)], "k int, v int")

    # (a) simulate: tmp written, target moved aside, crash before
    # tmp->target rename
    tmp, old = d + ".compact.tmp", d + ".compact.old"
    shutil.copytree(d, tmp)
    os.rename(d, old)
    with pytest.raises(RuntimeError, match="crashed between renames"):
        MergeTap(d, on="k").to_df(spark)  # raises (crashed, not empty)
    merge_into(spark, d, upd, "k")  # auto-recovers then merges
    assert not os.path.exists(old) and not os.path.exists(tmp)
    got = sorted(map(tuple, spark.read.parquet(d).collect()))
    assert got == [(1, 10), (2, 99)]

    # (b) crash AFTER the final rename left a stale .old behind
    shutil.copytree(d, old)
    merge_into(spark, d, spark.createDataFrame([(3, 30)],
                                               "k int, v int"), "k")
    assert not os.path.exists(old)
    got = sorted(map(tuple, spark.read.parquet(d).collect()))
    assert got == [(1, 10), (2, 99), (3, 30)]


def test_merge_tap_raises_on_crashed_state(spark, tmp_path):
    d = str(tmp_path / "tbl")
    os.makedirs(d + ".compact.old")
    with pytest.raises(RuntimeError, match="crashed between renames"):
        MergeTap(d, on="k").to_df(spark)


def test_merge_into_partition_pruned(spark, tmp_path):
    """partition_by merge: result equals the whole-table merge, files
    of untouched partitions are NOT rewritten, an emptied partition
    disappears, and replaying the same batch is a no-op (value-
    absolute semantics -> crash recovery by replay)."""
    import glob

    d = str(tmp_path / "ptbl")
    base = spark.createDataFrame(
        [(k, k % 3, k * 10) for k in range(12)],
        "k int, part int, v int")
    merge_into(spark, d, base, ["k", "part"], partition_by="part")
    untouched_before = sorted(glob.glob(f"{d}/part=2/*.parquet"))

    # upsert touching only part 0 and 1
    upd = spark.createDataFrame(
        [(0, 0, 999), (97, 1, 555)], "k int, part int, v int")
    merge_into(spark, d, upd, ["k", "part"], partition_by="part")

    whole = merge_frames(base, upd, ["k", "part"])
    got = sorted(map(tuple, spark.read.parquet(d)
                     .select("k", "part", "v").collect()))
    want = sorted(map(tuple, whole.select("k", "part", "v").collect()))
    assert got == want
    assert sorted(glob.glob(f"{d}/part=2/*.parquet")) == untouched_before

    # replay the same batch -> identical state (idempotent recovery)
    merge_into(spark, d, upd, ["k", "part"], partition_by="part")
    got2 = sorted(map(tuple, spark.read.parquet(d)
                      .select("k", "part", "v").collect()))
    assert got2 == got

    # delete every row of part=1 -> the partition dir disappears
    tomb = spark.read.parquet(d).where(F.col("part") == 1) \
        .select("k", "part", "v")
    merge_into(spark, d, tomb, ["k", "part"], when_matched="delete",
               when_not_matched="ignore", partition_by="part")
    assert glob.glob(f"{d}/part=1") == []
    assert spark.read.parquet(d).where(F.col("part") == 1).count() == 0


def test_merge_into_partitioned_spec_errors(spark, tmp_path):
    d = str(tmp_path / "ptbl")
    df = spark.createDataFrame([(1, 1, 1)], "k int, part int, v int")
    with pytest.raises(ValueError, match="must be part of the merge"):
        merge_into(spark, d, df, ["k"], partition_by="part")
    nulls = spark.createDataFrame([(1, None, 1)],
                                  "k int, part int, v int")
    merge_into(spark, d, df, ["k", "part"], partition_by="part")
    with pytest.raises(ValueError, match="NULL partition values"):
        merge_into(spark, d, nulls, ["k", "part"], partition_by="part")


def test_merge_tap_partitioned(spark, tmp_path):
    d = str(tmp_path / "ptbl")
    tap = MergeTap(d, on=["k", "part"], partition_by="part")
    tap.merge(spark, spark.createDataFrame(
        [(1, 0, 1), (2, 1, 2)], "k int, part int, v int"))
    tap.merge(spark, spark.createDataFrame(
        [(2, 1, 99)], "k int, part int, v int"))
    got = sorted(map(tuple, tap.to_df(spark)
                     .select("k", "part", "v").collect()))
    assert got == [(1, 0, 1), (2, 1, 99)]


def test_apply_changes_semantics(spark):
    """Latest-change-per-key wins (seq desc); U/I upsert, D deletes,
    unknown ops raise; no-seq feeds must be key-unique."""
    from cascalog_spark.operators import apply_changes

    tgt = spark.createDataFrame([(1, 10), (2, 20), (3, 30)],
                                "k int, v int")
    ch = spark.createDataFrame(
        [(1, 100, "U", 1), (1, 111, "U", 2),   # latest wins -> 111
         (2, None, "D", 1),                    # delete
         (4, 40, "I", 1),                      # insert
         (5, None, "D", 1),                    # delete absent: no-op
         (3, 999, "U", 1), (3, None, "D", 2)], # updated then deleted
        "k int, v int, op string, seq int")
    for strat in ("shuffle", "broadcast"):
        got = sorted(map(tuple, apply_changes(
            tgt, ch, "k", seq_col="seq", strategy=strat).collect()))
        assert got == [(1, 111), (4, 40)], strat

    bad = spark.createDataFrame([(1, 1, "X", 1)],
                                "k int, v int, op string, seq int")
    with pytest.raises(ValueError, match="unknown op"):
        apply_changes(tgt, bad, "k", seq_col="seq")
    dup = spark.createDataFrame([(1, 1, "U"), (1, 2, "U")],
                                "k int, v int, op string")
    with pytest.raises(ValueError, match="duplicate key"):
        apply_changes(tgt, dup, "k")


def test_apply_changes_into_roundtrip_and_replay(spark, tmp_path):
    """Bootstrap from the feed's upserts; folding a second batch is
    crash-recoverable by REPLAY (idempotent re-run)."""
    from cascalog_spark.operators import apply_changes_into

    d = str(tmp_path / "cdc_tbl")
    b1 = spark.createDataFrame(
        [(1, 10, "I", 1), (2, 20, "I", 1), (2, None, "D", 0)],
        "k int, v int, op string, seq int")
    apply_changes_into(spark, d, b1, "k", seq_col="seq")
    got = sorted(map(tuple, spark.read.parquet(d).collect()))
    assert got == [(1, 10), (2, 20)]  # seq=1 I beats seq=0 D
    b2 = spark.createDataFrame(
        [(1, None, "D", 2), (3, 30, "U", 2)],
        "k int, v int, op string, seq int")
    apply_changes_into(spark, d, b2, "k", seq_col="seq")
    once = sorted(map(tuple, spark.read.parquet(d).collect()))
    assert once == [(2, 20), (3, 30)]
    apply_changes_into(spark, d, b2, "k", seq_col="seq")  # replay
    assert sorted(map(tuple, spark.read.parquet(d).collect())) == once


def test_stream_cdc_apply_equals_one_shot(spark, tmp_path):
    """Drained CDC stream (per-key seq non-decreasing across batches)
    == one-shot apply_changes over the whole feed; includes a
    delete-then-reinsert key crossing the batch boundary."""
    from cascalog_spark.operators import apply_changes
    from cascalog_spark.streaming import stream_cdc_apply
    from cascalog_spark.streaming.stream import stage_file_batches

    tgt0 = spark.createDataFrame(
        [(k, k * 10, "I", 0) for k in range(6)],
        "k int, v int, op string, seq int")
    b1 = spark.createDataFrame(
        [(1, None, "D", 1), (6, 60, "I", 1)],
        "k int, v int, op string, seq int")
    b2 = spark.createDataFrame(
        [(1, 111, "U", 2),   # re-insert after the batch-1 delete
         (2, None, "D", 2), (6, 66, "U", 2)],
        "k int, v int, op string, seq int")
    src = stage_file_batches([tgt0, b1, b2])
    raw = (spark.readStream.schema(tgt0.schema)
           .option("maxFilesPerTrigger", "1")
           .option("pathGlobFilter", "batch*.parquet").parquet(src))
    d = str(tmp_path / "cdc_stream_tbl")
    qy = stream_cdc_apply(raw, d, "k", seq_col="seq",
                          checkpoint_dir=str(tmp_path / "ckpt"),
                          query_name="test_cdc_apply")
    try:
        assert qy.awaitTermination(240)
    finally:
        qy.stop()
    got = sorted(map(tuple, spark.read.parquet(d).collect()))
    empty = spark.createDataFrame([], "k int, v int")
    want = sorted(map(tuple, apply_changes(
        empty, tgt0.unionByName(b1).unionByName(b2), "k",
        seq_col="seq").collect()))
    assert got == want
    assert (1, 111) in got and (6, 66) in got
    assert not any(r[0] == 2 for r in got)


def test_merge_evolve_schema(spark, tgt):
    """evolve=True: new source columns extend the schema (NULL
    backfill on untouched rows, source values on matched + inserted);
    forbidden with partition_by (old partitions would keep the old
    schema)."""
    upd = spark.createDataFrame(
        [(2, "B", 200, "hot"), (4, "D", 400, "new")],
        "k int, s string, v int, tag string")
    got = sorted(map(tuple, merge_frames(tgt, upd, "k",
                                         evolve=True).collect()),
                 key=lambda r: (r[0] is None, r))
    assert got == [(1, "a", 10, None), (2, "B", 200, "hot"),
                   (3, "c", 30, None), (4, "D", 400, "new"),
                   (None, "n", 99, None)]
    b = sorted(map(tuple, merge_frames(tgt, upd, "k", evolve=True,
                                       strategy="broadcast").collect()),
               key=lambda r: (r[0] is None, r))
    assert b == got
    with pytest.raises(ValueError, match="full rewrite"):
        merge_into(spark, "/tmp/nope", upd, ["k"], evolve=True,
                   partition_by="k")


def test_merge_into_evolve_roundtrip(spark, tmp_path):
    d = str(tmp_path / "etbl")
    merge_into(spark, d, spark.createDataFrame([(1, 10)], "k int, v int"),
               "k")
    merge_into(spark, d,
               spark.createDataFrame([(1, 11, "x"), (2, 22, "y")],
                                     "k int, v int, t string"),
               "k", evolve=True)
    got = sorted(map(tuple, spark.read.parquet(d)
                     .select("k", "v", "t").collect()))
    assert got == [(1, 11, "x"), (2, 22, "y")]


def test_optimize_table_bin_pack_and_zorder(spark, tmp_path):
    """OPTIMIZE: many small files fold to few, rows bit-identical;
    ZORDER variant clusters both columns (per-file min/max spans
    narrow on the second dimension too); crash contract shared with
    merge_into."""
    import glob

    from cascalog_spark.operators import optimize_table

    d = str(tmp_path / "tbl")
    df = spark.range(2000).select(
        F.col("id").cast("int").alias("x"),
        (F.col("id") * 37 % 2000).cast("int").alias("y"))
    df.repartition(40).write.parquet(d)  # 40 small files
    before = sorted(map(tuple, spark.read.parquet(d).collect()))
    n0 = len(glob.glob(f"{d}/part-*.parquet"))
    assert n0 >= 30

    rep = optimize_table(spark, d, target_file_mb=512)
    assert rep["files_before"] >= 30 and rep["files_after"] <= 2
    assert sorted(map(tuple, spark.read.parquet(d).collect())) == before

    # zorder: re-fragment, then optimize clustered on (x, y)
    spark.read.parquet(d).repartition(40).write.mode("overwrite") \
        .parquet(d)
    rep = optimize_table(spark, d, target_file_mb=1, zorder_by=["x", "y"],
                         min_files=4)
    assert rep["files_after"] >= 4
    assert sorted(map(tuple, spark.read.parquet(d).collect())) == before
    # clustering check: per-file y-span must be far below the global
    # span (unsorted files would each cover ~the full y range)
    import pyarrow.parquet as pq

    spans = []
    for f in glob.glob(f"{d}/part-*.parquet"):
        t = pq.read_table(f, columns=["y"])
        ys = t.column("y").to_pylist()
        spans.append(max(ys) - min(ys))
    assert sum(spans) / len(spans) < 1200  # global span is 1999

    with pytest.raises(FileNotFoundError):
        optimize_table(spark, str(tmp_path / "missing"))


def test_optimize_table_partitioned_guard(spark, tmp_path):
    """A flat rewrite would drop the hive layout — must raise and
    point at per-partition optimization, which works as-is."""
    from cascalog_spark.operators import optimize_table

    d = str(tmp_path / "ptbl")
    df = spark.createDataFrame([(k, k % 2, k) for k in range(100)],
                               "k int, part int, v int")
    df.repartition(10).write.partitionBy("part").parquet(d)
    with pytest.raises(ValueError, match="hive-partitioned"):
        optimize_table(spark, d)
    before = sorted(map(tuple, spark.read.parquet(f"{d}/part=0")
                        .collect()))
    rep = optimize_table(spark, f"{d}/part=0", target_file_mb=512)
    assert rep["files_after"] <= 2
    assert sorted(map(tuple, spark.read.parquet(f"{d}/part=0")
                      .collect())) == before


def test_apply_changes_into_partition_pruned(spark, tmp_path):
    """Pruned CDC: only the feed's partitions are read/rewritten;
    result equals the unpruned fold; emptied partitions disappear;
    replay idempotent."""
    import glob

    from cascalog_spark.operators import apply_changes, apply_changes_into

    d = str(tmp_path / "cdc_ptbl")
    boot = spark.createDataFrame(
        [(k, k % 3, k * 10, "I", 0) for k in range(12)],
        "k int, part int, v int, op string, seq int")
    apply_changes_into(spark, d, boot, ["k", "part"], seq_col="seq",
                       partition_by="part")
    untouched = sorted(glob.glob(f"{d}/part=2/*.parquet"))

    feed = spark.createDataFrame(
        [(0, 0, 999, "U", 1), (97, 1, 555, "I", 1),
         (1, 1, None, "D", 1), (4, 1, None, "D", 1),
         (7, 1, None, "D", 1), (10, 1, None, "D", 1)],  # empties part=1? no: 97 inserted
        "k int, part int, v int, op string, seq int")
    apply_changes_into(spark, d, feed, ["k", "part"], seq_col="seq",
                       partition_by="part")
    got = sorted(map(tuple, spark.read.parquet(d)
                     .select("k", "part", "v").collect()))
    whole = apply_changes(
        spark.createDataFrame([(k, k % 3, k * 10) for k in range(12)],
                              "k int, part int, v int"),
        feed, ["k", "part"], seq_col="seq")
    want = sorted(map(tuple, whole.select("k", "part", "v").collect()))
    assert got == want
    assert sorted(glob.glob(f"{d}/part=2/*.parquet")) == untouched
    # replay
    apply_changes_into(spark, d, feed, ["k", "part"], seq_col="seq",
                       partition_by="part")
    assert sorted(map(tuple, spark.read.parquet(d)
                      .select("k", "part", "v").collect())) == got
    # now empty part=1 entirely (delete its remaining key 97)
    kill = spark.createDataFrame([(97, 1, None, "D", 2)],
                                 "k int, part int, v int, op string, seq int")
    apply_changes_into(spark, d, kill, ["k", "part"], seq_col="seq",
                       partition_by="part")
    assert glob.glob(f"{d}/part=1") == []


def test_merge_tap_local_rows(spark, tmp_path):
    """MergeTap works as a generator on the LOCAL platform: load_rows
    reads the standing table Spark-free (pyarrow), and a q over it
    runs via run_local."""
    from cascalog_spark import q, run_local

    d = str(tmp_path / "tbl")
    tap = MergeTap(d, on="k")
    merge_into(spark, d, spark.createDataFrame(
        [(1, 10), (2, None), (3, 30)], "k int, v int"), "k")
    fields, rows = tap.load_rows()
    assert fields == ["k", "v"]
    assert sorted(rows) == [(1, 10), (2, None), (3, 30)]
    got = sorted(run_local(q(["?k", "?v"], (tap, "?k", "?v"))))
    assert got == [(1, 10), (3, 30)]  # ?v drops the NULL row
    # crashed state is loud locally too
    os.rename(d, d + ".compact.old")
    with pytest.raises(RuntimeError, match="crashed between renames"):
        tap.load_rows()


def test_apply_changes_into_bootstrap_null_partition_rejected(
        spark, tmp_path):
    from cascalog_spark.operators import apply_changes_into

    d = str(tmp_path / "cdc_ptbl")
    feed = spark.createDataFrame(
        [(1, None, 10, "I", 1)],
        "k int, part int, v int, op string, seq int")
    with pytest.raises(ValueError, match="NULL partition values"):
        apply_changes_into(spark, d, feed, ["k", "part"],
                           seq_col="seq", partition_by="part")
