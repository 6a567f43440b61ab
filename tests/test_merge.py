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
    # validate=False SKIPS the check; duplicate source keys then fan
    # out the join and multiply the matched row (documented contract —
    # not an arbitrary winner)
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

    # the unknown-op guard is folded into the fold's own job (zero
    # extra driver actions) -> it raises LAZILY, at action time, from
    # raise_error; NULL ops hit the same guard (isin would otherwise
    # silently drop them)
    bad = spark.createDataFrame([(1, 1, "X", 1)],
                                "k int, v int, op string, seq int")
    with pytest.raises(Exception, match="unknown op"):
        apply_changes(tgt, bad, "k", seq_col="seq").collect()
    nul = spark.createDataFrame([(1, 1, None, 1)],
                                "k int, v int, op string, seq int")
    with pytest.raises(Exception, match="unknown op NULL"):
        apply_changes(tgt, nul, "k", seq_col="seq").collect()
    # validate=False: the caller owns the contract; bad/NULL ops are
    # then dropped by the isin splits instead of raising
    got = sorted(map(tuple, apply_changes(
        tgt, bad, "k", seq_col="seq", validate=False).collect()))
    assert got == sorted(map(tuple, tgt.collect()))
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


def test_optimize_table_partitioned_auto_iterates(spark, tmp_path):
    """A hive-partitioned root auto-iterates its partition dirs (a
    flat rewrite would drop the layout): each partition bin-packs
    under its own swap, rows + layout survive bit-identical,
    skip_below_files leaves compact partitions alone, and the
    partition column is rejected as a zorder key."""
    import glob

    from cascalog_spark.operators import optimize_table

    d = str(tmp_path / "ptbl")
    df = spark.createDataFrame([(k, k % 2, k) for k in range(100)],
                               "k int, part int, v int")
    df.repartition(10).write.partitionBy("part").parquet(d)
    before = sorted(map(tuple, spark.read.parquet(d)
                        .select("k", "part", "v").collect()))
    assert len(glob.glob(f"{d}/part=0/*.parquet")) >= 5

    rep = optimize_table(spark, d, target_file_mb=512)
    assert rep["partitions"] == 2 and rep["partitions_skipped"] == 0
    assert rep["files_after"] <= 2 * 2
    assert len(glob.glob(f"{d}/part=0/*.parquet")) <= 2
    assert sorted(glob.glob(f"{d}/part=*")) == \
        [f"{d}/part=0", f"{d}/part=1"]  # layout preserved
    assert sorted(map(tuple, spark.read.parquet(d)
                      .select("k", "part", "v").collect())) == before

    # second sweep with skip_below_files: both partitions are already
    # compact -> skipped, files untouched
    files0 = sorted(glob.glob(f"{d}/part=0/*.parquet"))
    rep = optimize_table(spark, d, target_file_mb=512,
                         skip_below_files=3)
    assert rep["partitions"] == 0 and rep["partitions_skipped"] == 2
    assert sorted(glob.glob(f"{d}/part=0/*.parquet")) == files0

    with pytest.raises(ValueError, match="partition column"):
        optimize_table(spark, d, zorder_by=["part", "k"])
    # zorder on a non-partition column works per partition
    rep = optimize_table(spark, d, target_file_mb=512,
                         zorder_by=["k"])
    assert sorted(map(tuple, spark.read.parquet(d)
                      .select("k", "part", "v").collect())) == before

    # a bare partition dir still optimizes as a flat table
    before0 = sorted(map(tuple, spark.read.parquet(f"{d}/part=0")
                         .collect()))
    rep = optimize_table(spark, f"{d}/part=0", target_file_mb=512)
    assert rep["files_after"] <= 2
    assert sorted(map(tuple, spark.read.parquet(f"{d}/part=0")
                      .collect())) == before0


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


def test_write_pruned_escaped_partition_values(spark, tmp_path):
    """Emptied-partition removal must survive hive-ESCAPED dir names:
    Spark writes `part=true` for boolean True and %-encodes specials
    (spaces/colons) — a str()-built path would silently miss the dir
    and the deleted partition's stale rows would reappear on read.
    The remover resolves dirs from actual file paths, so both cases
    vanish for real."""
    import glob

    # string partition values with spaces and colons
    d = str(tmp_path / "esc_tbl")
    base = spark.createDataFrame(
        [(1, "a b", 10), (2, "a b", 20), (3, "x:y", 30), (4, "ok", 40)],
        "k int, part string, v int")
    merge_into(spark, d, base, ["k", "part"], partition_by="part")
    # the colon IS hive-escaped: no literal 'part=x:y' dir exists
    assert not os.path.isdir(os.path.join(d, "part=x:y"))
    tomb = spark.createDataFrame(
        [(1, "a b", 0), (2, "a b", 0), (3, "x:y", 0)],
        "k int, part string, v int")
    merge_into(spark, d, tomb, ["k", "part"], when_matched="delete",
               when_not_matched="ignore", partition_by="part")
    got = sorted(map(tuple, spark.read.parquet(d)
                     .select("k", "part", "v").collect()))
    assert got == [(4, "ok", 40)]
    # both emptied dirs are really gone, whatever their escaping
    assert glob.glob(f"{d}/part=*") == [f"{d}/part=ok"]
    # re-read after a fresh scan: no stale resurrection
    assert spark.read.parquet(d).where(F.col("part") != "ok") \
        .count() == 0

    # boolean partition: dir is part=true, not part=True
    b = str(tmp_path / "bool_tbl")
    bbase = spark.createDataFrame(
        [(1, True, 10), (2, True, 20), (3, False, 30)],
        "k int, part boolean, v int")
    merge_into(spark, b, bbase, ["k", "part"], partition_by="part")
    btomb = spark.createDataFrame([(1, True, 0), (2, True, 0)],
                                  "k int, part boolean, v int")
    merge_into(spark, b, btomb, ["k", "part"], when_matched="delete",
               when_not_matched="ignore", partition_by="part")
    assert glob.glob(f"{b}/part=true") == []
    got = sorted(map(tuple, spark.read.parquet(b)
                     .select("k", "part", "v").collect()))
    # partition-type inference reads boolean dirs back as strings
    assert got == [(3, "false", 30)]

    # deleting a partition value the target never had is a no-op
    ghost = spark.createDataFrame([(9, "ghost", 0)],
                                  "k int, part string, v int")
    merge_into(spark, d, ghost, ["k", "part"], when_matched="delete",
               when_not_matched="ignore", partition_by="part")
    assert sorted(map(tuple, spark.read.parquet(d)
                      .select("k", "part", "v").collect())) == \
        [(4, "ok", 40)]


def test_merge_into_bootstrap_duplicate_keys_rejected(spark, tmp_path):
    """The first batch BECOMES the table — a duplicate key there would
    silently break the key-unique invariant every later merge assumes;
    validate=True must catch it on both bootstrap paths."""
    dup = spark.createDataFrame([(1, 0, 10), (1, 0, 11)],
                                "k int, part int, v int")
    with pytest.raises(ValueError, match="duplicate key"):
        merge_into(spark, str(tmp_path / "flat"), dup, "k")
    assert not os.path.isdir(str(tmp_path / "flat"))
    with pytest.raises(ValueError, match="duplicate key"):
        merge_into(spark, str(tmp_path / "part"), dup, ["k", "part"]
                   [:1] + ["part"], partition_by="part")
    assert not os.path.isdir(str(tmp_path / "part"))
    # validate=False keeps the old behavior (caller owns the contract)
    merge_into(spark, str(tmp_path / "flat"), dup, "k", validate=False)
    assert spark.read.parquet(str(tmp_path / "flat")).count() == 2


def test_merge_into_file_pruned(spark, tmp_path):
    """file_prune=True: files whose key range cannot hold any batch
    key are never read and survive the swap BYTE-identical (hard-
    linked); result equals the full merge; inserts land even when no
    file is touched by their key."""
    import glob
    import hashlib

    d = str(tmp_path / "ftbl")
    # four files with disjoint key ranges [0..9] [10..19] [20..29] [30..39]
    for lo in (0, 10, 20, 30):
        spark.createDataFrame([(k, k * 10) for k in range(lo, lo + 10)],
                              "k int, v int") \
            .coalesce(1).write.mode("append").parquet(d)
    files0 = sorted(glob.glob(f"{d}/part-*.parquet"))
    assert len(files0) == 4
    base = spark.read.parquet(d)

    def _md5s(paths):
        return {os.path.basename(p): hashlib.md5(
            open(p, "rb").read()).hexdigest() for p in paths}

    before = _md5s(files0)
    # batch hits range [10..19] (update k=15, delete k=12) and inserts
    # k=100 (touches NO file)
    upd = spark.createDataFrame([(15, 999), (100, 1)], "k int, v int")
    base_rows = sorted(map(tuple, base.collect()))
    rep = merge_into(spark, d, upd, "k", file_prune=True)
    assert rep == {"files_total": 4, "files_touched": 1,
                   "files_linked": 3}
    got = sorted(map(tuple, spark.read.parquet(d).collect()))
    want = sorted(map(tuple, merge_frames(
        spark.createDataFrame(base_rows, "k int, v int"),
        upd, "k").collect()))
    assert got == want and (15, 999) in got and (100, 1) in got
    after = _md5s(glob.glob(f"{d}/part-*.parquet"))
    # the three untouched files' bytes survive under their own names
    surviving = set(before) & set(after)
    assert len(surviving) == 3
    assert all(before[n] == after[n] for n in surviving)

    # keyed delete through the pruned path
    rep = merge_into(spark, d, spark.createDataFrame(
        [(35, 0)], "k int, v int"), "k", when_matched="delete",
        when_not_matched="ignore", file_prune=True)
    assert rep["files_touched"] >= 1
    assert spark.read.parquet(d).where(F.col("k") == 35).count() == 0

    # spec error: no file_prune with evolve
    with pytest.raises(ValueError, match="evolve"):
        merge_into(spark, d, upd.withColumn("nc", F.lit(1)), "k",
                   evolve=True, file_prune=True)


def test_merge_into_partitioned_file_pruned(spark, tmp_path):
    """partition_by + file_prune COMPOSE: partition pruning picks the
    touched partitions, footer-range file pruning inside each touched
    partition links the unhit files through byte-identical; untouched
    partitions are never opened; inserts to brand-new partition
    values create their dirs; a fully-deleted partition disappears;
    replay is idempotent."""
    import glob
    import hashlib

    d = str(tmp_path / "pftbl")
    # 3 partitions x 4 files each, disjoint key ranges [0..99]...[300..399]
    for p in range(3):
        for lo in (0, 100, 200, 300):
            spark.createDataFrame(
                [(k, k * 10 + p) for k in range(lo, lo + 100)],
                "k int, v int").coalesce(1) \
                .write.mode("append").parquet(f"{d}/part={p}")
    base = spark.read.parquet(d).select("k", "part", "v")
    base_rows = sorted(map(tuple, base.collect()))

    def _md5s(pattern):
        return {p: hashlib.md5(open(p, "rb").read()).hexdigest()
                for p in sorted(glob.glob(pattern))}

    before_p1 = _md5s(f"{d}/part=1/*.parquet")
    before_p02 = {**_md5s(f"{d}/part=0/*.parquet"),
                  **_md5s(f"{d}/part=2/*.parquet")}
    # batch: update k=150 in part=1 (file [100..199] only), insert
    # k=995 into part=1 (no file range holds it), insert part=5 (new)
    upd = spark.createDataFrame(
        [(150, 1, 9999), (995, 1, 1), (7, 5, 70)],
        "k int, part int, v int")
    rep = merge_into(spark, d, upd, ["k", "part"],
                     partition_by="part", file_prune=True)
    assert rep["partitions_touched"] == 1 and rep["partitions_new"] == 1
    assert rep["files_total"] == 4 and rep["files_touched"] == 1 \
        and rep["files_linked"] == 3, rep
    got = sorted(map(tuple, spark.read.parquet(d)
                     .select("k", "part", "v").collect()))
    want = sorted(map(tuple, merge_frames(
        spark.createDataFrame(base_rows, "k int, part int, v int"),
        upd, ["k", "part"]).collect()))
    assert got == want
    assert (150, 1, 9999) in got and (995, 1, 1) in got \
        and (7, 5, 70) in got
    # untouched partitions byte-identical; 3 of part=1's files too
    after_p02 = {**_md5s(f"{d}/part=0/*.parquet"),
                 **_md5s(f"{d}/part=2/*.parquet")}
    assert after_p02 == before_p02
    after_p1 = _md5s(f"{d}/part=1/*.parquet")
    surviving = {os.path.basename(p) for p in before_p1} \
        & {os.path.basename(p) for p in after_p1}
    assert len(surviving) == 3

    # replay the same batch -> identical state
    merge_into(spark, d, upd, ["k", "part"], partition_by="part",
               file_prune=True)
    assert sorted(map(tuple, spark.read.parquet(d)
                      .select("k", "part", "v").collect())) == got

    # delete every row of part=2 through the composed path
    tomb = spark.read.parquet(d).where(F.col("part") == 2) \
        .select("k", "part", "v")
    rep = merge_into(spark, d, tomb, ["k", "part"],
                     when_matched="delete", when_not_matched="ignore",
                     partition_by="part", file_prune=True)
    assert glob.glob(f"{d}/part=2") == []
    assert spark.read.parquet(d).where(F.col("part") == 2).count() == 0

    # spec error: partition column alone cannot range-prune files
    with pytest.raises(ValueError, match="non-partition key"):
        merge_into(spark, d, upd.select("part", "v").limit(1),
                   ["part"], partition_by="part", file_prune=True)


def test_stream_cdc_apply_partitioned(spark, tmp_path):
    """Streaming CDC with partition_by: drained table == one-shot
    apply_changes over the whole feed, AND a micro-batch that touches
    one partition never rewrites the others' files — per-batch cost is
    O(touched partitions), not O(table)."""
    import glob

    from cascalog_spark.operators import apply_changes
    from cascalog_spark.streaming import stream_cdc_apply
    from cascalog_spark.streaming.stream import stage_file_batches

    sch = "k int, part int, v int, op string, seq int"
    boot = spark.createDataFrame(
        [(k, k % 3, k * 10, "I", 0) for k in range(12)], sch)
    b1 = spark.createDataFrame(
        [(0, 0, 999, "U", 1), (97, 1, 555, "I", 1)], sch)
    d = str(tmp_path / "scdc_ptbl")

    src = stage_file_batches([boot])
    raw = (spark.readStream.schema(boot.schema)
           .option("maxFilesPerTrigger", "1")
           .option("pathGlobFilter", "batch*.parquet").parquet(src))
    qy = stream_cdc_apply(raw, d, ["k", "part"], seq_col="seq",
                          partition_by="part",
                          checkpoint_dir=str(tmp_path / "ck1"),
                          query_name="t_cdc_p1")
    try:
        assert qy.awaitTermination(240)
    finally:
        qy.stop()
    untouched = sorted(glob.glob(f"{d}/part=2/*.parquet"))
    assert untouched  # hive layout in place

    # second stream run feeds a batch touching parts 0 and 1 only
    src2 = stage_file_batches([b1])
    raw2 = (spark.readStream.schema(boot.schema)
            .option("maxFilesPerTrigger", "1")
            .option("pathGlobFilter", "batch*.parquet").parquet(src2))
    qy = stream_cdc_apply(raw2, d, ["k", "part"], seq_col="seq",
                          partition_by="part",
                          checkpoint_dir=str(tmp_path / "ck2"),
                          query_name="t_cdc_p2")
    try:
        assert qy.awaitTermination(240)
    finally:
        qy.stop()
    assert sorted(glob.glob(f"{d}/part=2/*.parquet")) == untouched

    got = sorted(map(tuple, spark.read.parquet(d)
                     .select("k", "part", "v").collect()))
    empty = spark.createDataFrame([], "k int, part int, v int")
    want = sorted(map(tuple, apply_changes(
        empty, boot.unionByName(b1), ["k", "part"], seq_col="seq")
        .select("k", "part", "v").collect()))
    assert got == want and (97, 1, 555) in got and (0, 0, 999) in got

    # crash-recovery = REPLAY: re-processing the same batch from a
    # fresh checkpoint (a retried/duplicated delivery) is idempotent
    raw3 = (spark.readStream.schema(boot.schema)
            .option("maxFilesPerTrigger", "1")
            .option("pathGlobFilter", "batch*.parquet").parquet(src2))
    qy = stream_cdc_apply(raw3, d, ["k", "part"], seq_col="seq",
                          partition_by="part",
                          checkpoint_dir=str(tmp_path / "ck3"),
                          query_name="t_cdc_p3")
    try:
        assert qy.awaitTermination(240)
    finally:
        qy.stop()
    assert sorted(map(tuple, spark.read.parquet(d)
                      .select("k", "part", "v").collect())) == got


def test_apply_changes_into_zero_extra_validation_jobs(spark, tmp_path):
    """With seq_col, validate=True must cost ZERO extra Spark jobs
    over validate=False (the unknown-op guard rides inside the fold's
    own job via raise_error) — the per-micro-batch driver-action cost
    of streaming CDC validation."""
    from cascalog_spark.operators import apply_changes_into

    sch = "k int, v int, op string, seq int"
    boot = spark.createDataFrame(
        [(k, k * 10, "I", 0) for k in range(8)], sch)
    feed = spark.createDataFrame(
        [(1, 111, "U", 1), (2, None, "D", 1)], sch)

    def _jobs(tag, fn):
        sc = spark.sparkContext
        sc.setJobGroup(tag, tag)
        try:
            fn()
        finally:
            sc.setJobGroup("idle", "idle")
        return len(sc.statusTracker().getJobIdsForGroup(tag))

    d1 = str(tmp_path / "t1")
    apply_changes_into(spark, d1, boot, "k", seq_col="seq")
    n_val = _jobs("cdc_val", lambda: apply_changes_into(
        spark, d1, feed, "k", seq_col="seq"))

    d2 = str(tmp_path / "t2")
    apply_changes_into(spark, d2, boot, "k", seq_col="seq")
    n_noval = _jobs("cdc_noval", lambda: apply_changes_into(
        spark, d2, feed, "k", seq_col="seq", validate=False))
    assert n_val == n_noval, (n_val, n_noval)


def test_merge_tap_generations_restore_vacuum(spark, tmp_path):
    """retain=N time-travel: each merge snapshots the pre-merge table
    as a hard-link generation (no data copy — parquet immutable under
    the swap), restore() swaps one back crash-safely and the
    generation survives, vacuum prunes beyond the window, crashed
    .tmp snapshots are swept."""
    import glob

    d = str(tmp_path / "tbl")
    tap = MergeTap(d, on="k", retain=2)
    tap.merge(spark, spark.createDataFrame([(1, 10), (2, 20)],
                                           "k int, v int"))
    assert tap.generations() == []  # bootstrap has no pre-state
    tap.merge(spark, spark.createDataFrame([(2, 99)], "k int, v int"))
    tap.merge(spark, spark.createDataFrame([(3, 30)], "k int, v int"))
    tap.merge(spark, spark.createDataFrame([(1, 11)], "k int, v int"))
    # three merges snapshotted; retain=2 pruned the oldest
    assert tap.generations() == [1, 2]
    assert _rows(tap.to_df(spark)) == [(1, 11), (2, 99), (3, 30)]

    # generation 2 = the pre-merge state of the LAST merge
    g = tap.restore()
    assert g == 2
    assert _rows(tap.to_df(spark)) == [(1, 10), (2, 99), (3, 30)]
    assert tap.generations() == [1, 2]  # restore keeps the generation
    # roll further back
    tap.restore(1)
    assert _rows(tap.to_df(spark)) == [(1, 10), (2, 99)]
    # merging after a restore keeps working (and snapshots again)
    tap.merge(spark, spark.createDataFrame([(4, 40)], "k int, v int"))
    assert _rows(tap.to_df(spark)) == [(1, 10), (2, 99), (4, 40)]
    assert tap.generations() == [2, 3]

    with pytest.raises(FileNotFoundError, match="no generation 99"):
        tap.restore(99)

    # crashed snapshot (.tmp) is ignored and swept
    os.makedirs(d + ".gen-7.tmp")
    assert tap.generations() == [2, 3]
    tap.vacuum()
    assert glob.glob(d + ".gen-*.tmp") == []

    # crashed SWAP before a retained merge: recover happens before the
    # snapshot, so the generation captures the recovered table
    shutil.copytree(d, d + ".compact.old")
    shutil.rmtree(d)
    tap.merge(spark, spark.createDataFrame([(5, 50)], "k int, v int"))
    assert (5, 50) in _rows(tap.to_df(spark))
    assert tap.generations() == [3, 4]
    tap.restore(4)  # pre-merge state of the post-recovery merge
    assert (5, 50) not in _rows(tap.to_df(spark))
    assert (1, 10) in _rows(tap.to_df(spark))

    # vacuum(0) drops everything
    assert tap.vacuum(0) == [3, 4]
    assert tap.generations() == []


def test_apply_changes_into_file_pruned(spark, tmp_path):
    """CDC over the file-skipping fold: flat tables range-prune files
    on the key, partitioned tables stack both pruning levels; results
    equal the unpruned fold and unhit files survive byte-identical."""
    import glob
    import hashlib

    from cascalog_spark.operators import apply_changes, apply_changes_into

    def _md5s(pattern):
        return {os.path.basename(p): hashlib.md5(
            open(p, "rb").read()).hexdigest()
            for p in sorted(glob.glob(pattern))}

    # flat: 4 files with disjoint key ranges
    d = str(tmp_path / "cdc_f")
    for lo in (0, 100, 200, 300):
        spark.createDataFrame([(k, k * 10) for k in range(lo, lo + 100)],
                              "k int, v int").coalesce(1) \
            .write.mode("append").parquet(d)
    base_rows = sorted(map(tuple, spark.read.parquet(d).collect()))
    before = _md5s(f"{d}/part-*.parquet")
    feed = spark.createDataFrame(
        [(150, 999, "U", 1), (155, None, "D", 1), (995, 5, "I", 1)],
        "k int, v int, op string, seq int")
    rep = apply_changes_into(spark, d, feed, "k", seq_col="seq",
                             file_prune=True)
    assert rep["files_touched"] == 1 and rep["files_linked"] == 3, rep
    got = sorted(map(tuple, spark.read.parquet(d).collect()))
    want = sorted(map(tuple, apply_changes(
        spark.createDataFrame(base_rows, "k int, v int"), feed, "k",
        seq_col="seq").collect()))
    assert got == want and (150, 999) in got and (995, 5) in got
    assert not any(r[0] == 155 for r in got)
    after = _md5s(f"{d}/part-*.parquet")
    assert sum(1 for n in before if n in after
               and before[n] == after[n]) == 3

    # partitioned + file_prune: both levels stacked
    p = str(tmp_path / "cdc_pf")
    for pv in range(3):
        for lo in (0, 100):
            spark.createDataFrame(
                [(k, k * 10 + pv) for k in range(lo, lo + 100)],
                "k int, v int").coalesce(1) \
                .write.mode("append").parquet(f"{p}/part={pv}")
    pbase = sorted(map(tuple, spark.read.parquet(p)
                       .select("k", "part", "v").collect()))
    b_other = {**_md5s(f"{p}/part=0/*.parquet"),
               **_md5s(f"{p}/part=2/*.parquet")}
    b_p1 = _md5s(f"{p}/part=1/*.parquet")
    pfeed = spark.createDataFrame(
        [(150, 1, 7, "U", 1), (9, 9, 90, "I", 1)],
        "k int, part int, v int, op string, seq int")
    rep = apply_changes_into(spark, p, pfeed, ["k", "part"],
                             seq_col="seq", partition_by="part",
                             file_prune=True)
    assert rep["partitions_touched"] == 1 and rep["partitions_new"] == 1
    assert rep["files_touched"] == 1 and rep["files_linked"] == 1, rep
    got = sorted(map(tuple, spark.read.parquet(p)
                     .select("k", "part", "v").collect()))
    want = sorted(map(tuple, apply_changes(
        spark.createDataFrame(pbase, "k int, part int, v int"),
        pfeed, ["k", "part"], seq_col="seq")
        .select("k", "part", "v").collect()))
    assert got == want and (9, 9, 90) in got and (150, 1, 7) in got
    assert {**_md5s(f"{p}/part=0/*.parquet"),
            **_md5s(f"{p}/part=2/*.parquet")} == b_other
    a_p1 = _md5s(f"{p}/part=1/*.parquet")
    assert sum(1 for n in b_p1 if n in a_p1
               and b_p1[n] == a_p1[n]) == 1
    # replay idempotent
    apply_changes_into(spark, p, pfeed, ["k", "part"], seq_col="seq",
                       partition_by="part", file_prune=True)
    assert sorted(map(tuple, spark.read.parquet(p)
                      .select("k", "part", "v").collect())) == got


def test_stream_cdc_apply_file_pruned(spark, tmp_path):
    """Streaming CDC with file_prune: drained == one-shot, and files
    the feed's keys cannot touch keep their bytes across the whole
    stream."""
    import glob
    import hashlib

    from cascalog_spark.operators import apply_changes
    from cascalog_spark.streaming import stream_cdc_apply
    from cascalog_spark.streaming.stream import stage_file_batches

    d = str(tmp_path / "scdc_f")
    for lo in (0, 100, 200, 300):
        spark.createDataFrame([(k, k * 10) for k in range(lo, lo + 100)],
                              "k int, v int").coalesce(1) \
            .write.mode("append").parquet(d)
    base_rows = sorted(map(tuple, spark.read.parquet(d).collect()))
    before = {os.path.basename(q): hashlib.md5(
        open(q, "rb").read()).hexdigest()
        for q in glob.glob(f"{d}/part-*.parquet")}

    sch = "k int, v int, op string, seq int"
    b1 = spark.createDataFrame([(150, 999, "U", 1)], sch)
    b2 = spark.createDataFrame([(155, None, "D", 2), (151, 3, "I", 2)],
                               sch)
    src = stage_file_batches([b1, b2])
    raw = (spark.readStream.schema(b1.schema)
           .option("maxFilesPerTrigger", "1")
           .option("pathGlobFilter", "batch*.parquet").parquet(src))
    qy = stream_cdc_apply(raw, d, "k", seq_col="seq", file_prune=True,
                          checkpoint_dir=str(tmp_path / "ck"),
                          query_name="t_cdc_fp")
    try:
        assert qy.awaitTermination(240)
    finally:
        qy.stop()
    got = sorted(map(tuple, spark.read.parquet(d).collect()))
    want = sorted(map(tuple, apply_changes(
        spark.createDataFrame(base_rows, "k int, v int"),
        b1.unionByName(b2), "k", seq_col="seq").collect()))
    assert got == want
    after = {os.path.basename(q): hashlib.md5(
        open(q, "rb").read()).hexdigest()
        for q in glob.glob(f"{d}/part-*.parquet")}
    # keys 150/151/155 live in ONE file's range; the other three
    # files' bytes survive both micro-batches
    assert sum(1 for n in before if n in after
               and before[n] == after[n]) == 3


def test_apply_changes_evolve(spark, tmp_path):
    """CDC schema evolution: evolve=True lets the feed carry NEW
    payload columns — output schema extends, untouched rows backfill
    NULL, deletes still land; forbidden with partition_by/file_prune
    (untouched partitions/files would keep the old schema)."""
    from cascalog_spark.operators import apply_changes, apply_changes_into

    tgt = spark.createDataFrame([(1, 10), (2, 20), (3, 30)],
                                "k int, v int")
    ch = spark.createDataFrame(
        [(1, 111, "hot", "U", 1), (2, None, None, "D", 1),
         (4, 40, "new", "I", 1)],
        "k int, v int, tag string, op string, seq int")
    with pytest.raises(ValueError, match="schema evolution"):
        apply_changes(tgt, ch, "k", seq_col="seq").collect()
    got = sorted(map(tuple, apply_changes(
        tgt, ch, "k", seq_col="seq", evolve=True).collect()))
    assert got == [(1, 111, "hot"), (3, 30, None), (4, 40, "new")]

    d = str(tmp_path / "cdc_ev")
    apply_changes_into(
        spark, d, spark.createDataFrame([(1, 10, "I", 0),
                                         (3, 30, "I", 0)],
                                        "k int, v int, op string, seq int"),
        "k", seq_col="seq")
    apply_changes_into(spark, d, ch, "k", seq_col="seq", evolve=True)
    got = sorted(map(tuple, spark.read.parquet(d)
                     .select("k", "v", "tag").collect()))
    assert got == [(1, 111, "hot"), (3, 30, None), (4, 40, "new")]
    with pytest.raises(ValueError, match="full rewrite"):
        apply_changes_into(spark, d, ch, "k", seq_col="seq",
                           evolve=True, file_prune=True)
