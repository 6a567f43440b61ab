"""Keyed MERGE / upsert — the lakehouse ``MERGE INTO`` for standing
parquet tables, the one incremental-pipeline operation the engine's
partition-granular sinks (``update_partitions``, scd2) did not cover:
fold an update batch into a target table BY KEY — update / delete
matched rows, insert unmatched source rows, pass everything else
through untouched.

No counterpart in the reference (cascalog's sinks are whole-dataset
writes, vendor/cascading taps; sinkmode semantics at tap.clj-level
replace or append, never key-merge) — this is the training-data
pipeline extension tier, same as dedup/similarity.

Two layers:

* :func:`merge_frames` — the pure DataFrame semantics (SQL-standard
  ``MERGE``: plain key equality, NULL keys never match; duplicate
  source keys are an error like ANSI MERGE's "cannot update the same
  row twice").
* :func:`merge_into` — the standing-table face: read the target
  parquet dir, merge, write-new-then-swap with the same crash-safe
  rename pair (`.compact.tmp` / `.compact.old`) and auto-recovery
  contract as ``compact_rollup`` (streaming/ingest.py) — any crash
  leaves a recoverable directory, never a half-merged table.

Scale shape: ``strategy="shuffle"`` (default) is ONE full-outer
shuffle join on the key — the floor when both sides are large, and a
pure-parquet merge rewrites the table anyway.  ``strategy=
"broadcast"`` never shuffles the target: matched/unchanged rows come
from a broadcast left join (map-side, no Exchange on the target), and
insert detection anti-joins the updates against the target's KEY
COLUMNS ONLY (column-pruned scan — at 100 TB that is the key bytes,
not the table).  Identical output, pinned by test.
"""

from __future__ import annotations

import os
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_MATCHED = ("update", "delete", "ignore")
_NOT_MATCHED = ("insert", "ignore")


def _merge_check(target: DataFrame, updates: DataFrame, on: list[str],
                 when_matched: str, when_not_matched: str,
                 update_cols: Optional[list[str]]) -> list[str]:
    """Validate the merge spec; returns the non-key update columns."""
    if when_matched not in _MATCHED:
        raise ValueError(f"merge: when_matched must be one of "
                         f"{_MATCHED}, got {when_matched!r}")
    if when_not_matched not in _NOT_MATCHED:
        raise ValueError(f"merge: when_not_matched must be one of "
                         f"{_NOT_MATCHED}, got {when_not_matched!r}")
    tcols, ucols = target.columns, set(updates.columns)
    for k in on:
        if k not in tcols or k not in ucols:
            raise ValueError(f"merge: key column {k!r} must exist on "
                             f"both sides")
    extra = ucols - set(tcols)
    if extra:
        raise ValueError(f"merge: update columns {sorted(extra)} do not "
                         f"exist on the target — schema evolution is not "
                         f"a merge; add columns to the target first")
    if update_cols is None:
        update_cols = [c for c in tcols if c not in on and c in ucols]
    for c in update_cols:
        if c in on:
            raise ValueError(f"merge: key column {c!r} cannot be updated")
        if c not in ucols:
            raise ValueError(f"merge: update_col {c!r} missing from the "
                             f"update batch")
    return update_cols


def _unique_update_keys(updates: DataFrame, on: list[str]) -> None:
    """ANSI MERGE forbids two source rows hitting one target row; a
    groupBy over the (small) update batch catches it loudly instead of
    letting a nondeterministic winner through."""
    dup = (updates.groupBy(*on).agg(F.count(F.lit(1)).alias("__n"))
           .where(F.col("__n") > 1).limit(1).collect())
    if dup:
        key = {k: dup[0][k] for k in on}
        raise ValueError(f"merge: update batch has duplicate key {key} "
                         f"— dedupe first (e.g. latest_by / "
                         f"apply_changes with seq_col).  validate="
                         f"False only SKIPS this check: duplicate "
                         f"source keys then fan out the join and "
                         f"MULTIPLY matched output rows, they do not "
                         f"pick a winner")


def merge_frames(target: DataFrame, updates: DataFrame, on,
                 when_matched: str = "update",
                 when_not_matched: str = "insert",
                 update_cols: Optional[list[str]] = None,
                 strategy: str = "shuffle",
                 validate: bool = True,
                 evolve: bool = False) -> DataFrame:
    """SQL-standard ``MERGE`` as a DataFrame transform.

    ``on`` — key column name(s); matching is PLAIN equality (NULL keys
    never match, per the SQL standard — a NULL-key source row is "not
    matched" and inserts; a NULL-key target row passes through).

    ``when_matched`` — ``"update"`` (matched target rows take
    ``update_cols`` — default: every shared non-key column — from the
    source; target-only columns are preserved), ``"delete"`` (matched
    target rows are removed), or ``"ignore"`` (target wins).

    ``when_not_matched`` — ``"insert"`` (source rows with no target
    match are appended; target-only columns become NULL) or
    ``"ignore"``.

    ``strategy`` — ``"shuffle"``: one full-outer join on the key (one
    Exchange per side, the floor when both sides are large).
    ``"broadcast"``: for the big-target/small-batch case — matched and
    unchanged rows via a broadcast left join (NO Exchange on the
    target), inserts via an anti join against the target's key columns
    only (column-pruned scan).  Identical output.

    ``validate=True`` errors on duplicate source keys (ANSI MERGE's
    "cannot update the same row twice"); one aggregate over the update
    batch.

    ``evolve=True`` is opt-in SCHEMA EVOLUTION: update columns absent
    from the target EXTEND the output schema (appended after the
    target's columns, source dtypes); pre-existing target rows carry
    NULL there, matched/inserted rows the source values.  Without it,
    extra source columns are a loud error (the ANSI default).
    """
    on = [on] if isinstance(on, str) else list(on)
    if evolve:
        udt = dict(updates.dtypes)
        for c in updates.columns:
            if c not in target.columns:
                target = target.withColumn(
                    c, F.lit(None).cast(udt[c]))
    update_cols = _merge_check(target, updates, on, when_matched,
                               when_not_matched, update_cols)
    if validate:
        _unique_update_keys(updates, on)
    out_cols = target.columns
    nonkey = [c for c in out_cols if c not in on]

    def _src(c):
        # inserted rows: source value where the source carries the
        # column, NULL (typed from the target side) otherwise
        return F.col(f"s.{c}") if c in updates.columns \
            else F.lit(None).cast(dict(target.dtypes)[c])

    if strategy == "broadcast":
        # matched + unchanged target rows: broadcast left join — the
        # target side stays map-side (no Exchange, no sort)
        t = target.alias("t")
        cond = [F.col(f"t.{k}") == F.col(f"s.{k}") for k in on]
        # presence flag robust to NULL-valued source columns
        s = F.broadcast(updates.withColumn("__s", F.lit(True))).alias("s")
        matched = F.col("s.__s").isNotNull()
        j = t.join(s, on=cond, how="left")
        if when_matched == "delete":
            kept = j.where(~matched).select([F.col(f"t.{c}").alias(c)
                                             for c in out_cols])
        elif when_matched == "ignore":
            kept = j.select([F.col(f"t.{c}").alias(c) for c in out_cols])
        else:  # update
            kept = j.select(
                *[F.col(f"t.{k}").alias(k) for k in on],
                *[(F.when(matched, F.col(f"s.{c}"))
                   .otherwise(F.col(f"t.{c}")).alias(c)
                   if c in update_cols else
                   F.col(f"t.{c}").alias(c))
                  for c in nonkey]).select(*out_cols)
        if when_not_matched == "ignore":
            return kept
        # inserts: updates anti-join the target's KEY columns only —
        # the scan is column-pruned to the key bytes; NULL-key source
        # rows never match (plain equality) so they insert, matching
        # the SQL standard
        ins = (updates.alias("s")
               .join(target.select(*on).alias("t"), on=cond,
                     how="left_anti")
               .select([_src(c).alias(c) for c in out_cols]))
        return kept.unionByName(ins)

    if strategy != "shuffle":
        raise ValueError(f"merge: strategy must be 'shuffle' or "
                         f"'broadcast', got {strategy!r}")
    # one full-outer join; presence flags distinguish sides even when
    # every payload column is NULL
    t = target.withColumn("__t", F.lit(True)).alias("t")
    s = updates.withColumn("__s", F.lit(True)).alias("s")
    cond = [F.col(f"t.{k}") == F.col(f"s.{k}") for k in on]
    j = t.join(s, on=cond, how="full_outer")
    t_here = F.col("t.__t").isNotNull()
    s_here = F.col("s.__s").isNotNull()
    matched = t_here & s_here
    if when_matched == "delete":
        keep = ~matched & (t_here | (s_here & F.lit(
            when_not_matched == "insert")))
    else:
        keep = t_here | (s_here & F.lit(when_not_matched == "insert"))
    take_src = (matched & F.lit(when_matched == "update"))
    cols = []
    for k in on:
        cols.append(F.when(t_here, F.col(f"t.{k}"))
                    .otherwise(F.col(f"s.{k}")).alias(k))
    for c in nonkey:
        upd = take_src if c in update_cols else F.lit(False)
        cols.append(F.when(t_here & ~upd, F.col(f"t.{c}"))
                    .otherwise(_src(c)).alias(c))
    return j.where(keep).select(*cols)


def merge_into(spark: SparkSession, target_dir: str, updates: DataFrame,
               on, when_matched: str = "update",
               when_not_matched: str = "insert",
               update_cols: Optional[list[str]] = None,
               strategy: str = "broadcast",
               validate: bool = True,
               partition_by: Optional[str] = None,
               evolve: bool = False,
               file_prune: bool = False) -> Optional[dict]:
    """Apply :func:`merge_frames` to the standing parquet table at
    ``target_dir`` IN PLACE, crash-safely.

    Write discipline (same contract as ``compact_rollup``): the merged
    table is fully materialized to a ``.compact.tmp`` sibling FIRST
    (the lazy merge plan reads the live target while tmp writes), then
    target→``.compact.old``, tmp→target, old removed.  A crash at any
    point leaves a recoverable directory — re-running ``merge_into``
    (or any ``compact_*``) auto-recovers, and readers that find the
    target missing with an ``.old`` sibling raise instead of silently
    reading an empty table.  NOT safe under concurrent mergers (single
    maintenance writer, like every compactor here).

    First merge (no ``target_dir`` yet): with ``when_not_matched=
    "insert"`` the batch itself becomes the table.

    ``strategy`` defaults to ``"broadcast"`` here (standing table >>
    update batch is the operational case); pass ``"shuffle"`` when the
    batch is comparable to the table.

    ``partition_by=`` is the 100 TB lever — PARTITION-PRUNED merge:
    the table is hive-partitioned on that column, only the partitions
    the batch touches are read (partition-pruned scan) and rewritten
    (dynamic partition overwrite); everything else is never opened.
    Requirements: the partition column MUST be part of ``on`` (a key
    match then can only occur inside one partition, which is what
    makes reading only the batch's partitions complete — the standard
    lakehouse MERGE-with-partition-predicate contract) and batch
    partition values must be non-NULL.  Crash model differs from the
    swap path: dynamic overwrite is per-partition, not atomic across
    partitions — but the merge is value-ABSOLUTE (update sets source
    values, re-inserting an inserted row is a same-value update,
    re-deleting deletes nothing), so recovery is REPLAY: re-run the
    same batch and the table converges to the same state (pinned by
    test).  A partition whose every row is deleted is removed.

    ``file_prune=True`` is FILE-level data skipping: target files
    whose footer min/max range on the first non-partition key cannot
    contain any batch key are never read and are hard-linked into the
    swapped-in table byte-identical; only the touched files' rows are
    merged.  Returns ``{"files_total", "files_touched",
    "files_linked"}`` (``None`` on the other paths).  Best after an
    :func:`optimize_table` ZORDER on the key — clustered files have
    narrow key ranges, so a small batch touches few files.  COMPOSES
    with ``partition_by=``: partition pruning picks the touched
    partitions, then each touched partition dir file-prunes under its
    own swap — a key-local batch costs O(touched files), not
    O(touched partitions); the report adds ``partitions_touched`` /
    ``partitions_new``."""
    from ..streaming.ingest import StateDir

    sd = StateDir(target_dir, "merge_into")
    sd.recover()
    on_l = [on] if isinstance(on, str) else list(on)
    if partition_by is None:
        if not os.path.isdir(target_dir):
            if when_not_matched == "insert":
                # the bootstrap batch BECOMES the table — a duplicate
                # key here would violate the key-unique invariant every
                # later merge (and the ANSI dup check) assumes
                if validate:
                    _unique_update_keys(updates, on_l)
                updates.write.mode("overwrite").parquet(target_dir)
            return
        target = spark.read.parquet(target_dir)
        if file_prune:
            return _merge_file_pruned(
                spark, sd, target_dir, target, updates, on_l,
                when_matched, when_not_matched, update_cols, strategy,
                validate, evolve)
        merged = merge_frames(target, updates, on_l, when_matched,
                              when_not_matched, update_cols,
                              strategy=strategy, validate=validate,
                              evolve=evolve)
        sd.swap(lambda tmp: merged.write.mode("overwrite").parquet(tmp))
        return

    if evolve:
        raise ValueError(
            "merge_into: evolve=True needs a full rewrite (untouched "
            "partitions would keep the old schema and a plain read "
            "does not merge parquet schemas) — run once without "
            "partition_by to evolve, then resume pruned merges")
    vals = [r[0] for r in
            updates.select(partition_by).distinct().collect()]
    _pruned_check(on_l, partition_by, vals, "merge_into")
    if not vals:
        return None
    if file_prune:
        on_p = [k for k in on_l if k != partition_by]
        if not on_p:
            raise ValueError(
                "merge_into: file_prune with partition_by needs a "
                "non-partition key column to range-prune files on")
        if not os.path.isdir(target_dir):
            if when_not_matched == "insert":
                if validate:
                    _unique_update_keys(updates, on_l)
                (updates.write.mode("overwrite")
                 .partitionBy(partition_by).parquet(target_dir))
            return None
        return _merge_partitioned_file_pruned(
            spark, target_dir, partition_by, vals, updates, on_l,
            on_p, when_matched, when_not_matched, update_cols,
            strategy, validate)
    if not os.path.isdir(target_dir):
        if when_not_matched == "insert":
            if validate:
                _unique_update_keys(updates, on_l)
            (updates.write.mode("overwrite")
             .partitionBy(partition_by).parquet(target_dir))
        return
    target = spark.read.parquet(target_dir)
    sliced = target.where(F.col(partition_by).isin(vals))
    merged = merge_frames(sliced, updates, on_l, when_matched,
                          when_not_matched, update_cols,
                          strategy=strategy, validate=validate)
    _write_pruned(spark, target_dir, partition_by, vals, merged)


def _file_key_ranges(target_dir: str, key: str):
    """Per-file [min, max] of ``key`` from the parquet FOOTERS (no data
    read): ``(ranged, statless)`` where ranged is ``[(path, mn, mx)]``
    and statless files (missing/NULL stats — e.g. an all-NULL key
    chunk) are conservatively treated as touched by the caller.
    Parquet writers truncate long string stats CONSERVATIVELY (min
    rounded down, max rounded up per the spec), so a range test stays
    a safe over-approximation for string keys too."""
    import glob as _glob

    import pyarrow.parquet as _pq

    ranged, statless = [], []
    for f in sorted(_glob.glob(os.path.join(target_dir, "*"))):
        base = os.path.basename(f)
        if not os.path.isfile(f) or base.startswith(("_", ".")):
            continue
        try:
            md = _pq.ParquetFile(f).metadata
            idx = md.schema.to_arrow_schema().get_field_index(key)
            mn = mx = None
            ok = idx >= 0 and md.num_row_groups > 0
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                if (st is None or not st.has_min_max
                        or st.min is None or st.max is None):
                    ok = False
                    break
                mn = st.min if mn is None else min(mn, st.min)
                mx = st.max if mx is None else max(mx, st.max)
            if ok:
                ranged.append((f, mn, mx))
            else:
                statless.append(f)
        except Exception:
            statless.append(f)
    return ranged, statless


def _merge_file_pruned(spark: SparkSession, sd, target_dir: str,
                       target: DataFrame, updates: DataFrame,
                       on_l: list[str], when_matched: str,
                       when_not_matched: str,
                       update_cols: Optional[list[str]],
                       strategy: str, validate: bool,
                       evolve: bool) -> dict:
    """FILE-level pruned merge for a flat standing table (the standard
    lakehouse data-skipping shape): the batch's keys are range-tested
    against each target file's footer min/max on the FIRST merge key —
    files whose key range cannot contain any batch key are never read
    and survive the swap byte-identical (hard-linked into the new
    table dir); only the touched files' rows flow through
    :func:`merge_frames`.

    Correct because a source key outside a file's [min, max] cannot
    match any of its rows (equality on ``on`` includes ``on[0]``), so
    skipped files have no matched rows — and a batch key touching NO
    file is genuinely absent from the target, i.e. a plain insert.
    The decision join is one broadcast range join of the batch's keys
    against the O(files) range list; at 100 TB the win is reading the
    few files the batch hits instead of the table."""
    if evolve:
        raise ValueError(
            "merge_into: file_prune=True cannot evolve the schema — "
            "linked-through files would keep the old schema; run once "
            "with file_prune=False to evolve, then resume pruned "
            "merges")

    def fold(touched_df: DataFrame) -> DataFrame:
        return merge_frames(touched_df, updates, on_l, when_matched,
                            when_not_matched, update_cols,
                            strategy=strategy, validate=validate)

    return _file_pruned_fold(spark, sd, target_dir, target, updates,
                             on_l[0], fold)


def _file_pruned_fold(spark: SparkSession, sd, target_dir: str,
                      target: DataFrame, batch: DataFrame,
                      prune_key: str, fold) -> dict:
    """The generic file-skipping swap shared by the MERGE and CDC
    faces: range-test the batch's ``prune_key`` values against each
    target file's footer min/max, run ``fold(touched_rows_df)`` over
    only the hit files' rows, and swap the result in with every unhit
    file HARD-LINKED through byte-identical.  The decision join is one
    broadcast range join of batch keys x the O(files) range list."""
    k0 = prune_key
    ranged, statless = _file_key_ranges(target_dir, k0)
    touched = list(statless)
    if ranged:
        ktype = dict(target.dtypes)[k0]
        ranges_df = spark.createDataFrame(
            [(i, mn, mx) for i, (_, mn, mx) in enumerate(ranged)],
            f"__i int, __mn {ktype}, __mx {ktype}")
        hit = (batch.select(F.col(k0).alias("__k"))
               .join(F.broadcast(ranges_df),
                     (F.col("__k") >= F.col("__mn"))
                     & (F.col("__k") <= F.col("__mx")))
               .select("__i").distinct().collect())
        touched += [ranged[r["__i"]][0] for r in hit]
    tset = set(touched)
    untouched = [f for f, _, _ in ranged if f not in tset]
    if touched:
        touched_df = spark.read.parquet(*sorted(touched))
    else:
        touched_df = target.limit(0)
    merged = fold(touched_df)
    # keep the table PRUNABLE across repeated merges: the replacement
    # files are range-clustered on the prune key (disjoint per-file
    # footer ranges, like the files they replace after an OPTIMIZE
    # ZORDER), so the next merge's range test stays tight instead of
    # degrading toward whole-table rewrites.  Rows identical; the
    # shuffle is touched-rows-sized.
    merged = (merged.repartitionByRange(max(1, len(touched)),
                                        F.col(k0))
              .sortWithinPartitions(k0))

    import shutil

    def _write(tmp: str) -> None:
        merged.write.mode("overwrite").parquet(tmp)
        for f in untouched:
            dst = os.path.join(tmp, os.path.basename(f))
            if os.path.exists(dst):  # UUID collision: rename, keep
                dst = os.path.join(
                    tmp, "linked-" + os.path.basename(f))
            try:
                os.link(f, dst)
            except OSError:
                shutil.copy2(f, dst)

    sd.swap(_write)
    return {"files_total": len(ranged) + len(statless),
            "files_touched": len(touched),
            "files_linked": len(untouched)}


def _merge_partitioned_file_pruned(spark: SparkSession,
                                   target_dir: str, partition_by: str,
                                   vals: list, updates: DataFrame,
                                   on_l: list[str], on_p: list[str],
                                   when_matched: str,
                                   when_not_matched: str,
                                   update_cols: Optional[list[str]],
                                   strategy: str,
                                   validate: bool) -> dict:
    """BOTH pruning levels stacked — the full lakehouse data-skipping
    shape: hive partition pruning picks the batch's partitions, then
    each touched partition dir (a flat parquet table without the
    partition column) runs the footer-range FILE prune under its own
    swap, so a key-local batch costs O(touched files), not O(touched
    partitions).  Batch values with no existing partition dir write
    through one dynamic-overwrite job (Spark owns the hive escaping;
    idempotent on replay).  Crash model is REPLAY, like the dynamic
    path: per-dir swaps apply value-absolute merges one partition at
    a time.  A partition the merge empties is removed (probed with a
    partition-local limit(1)).  Best when merges are key-local; for
    batches spraying most partitions, the plain ``partition_by=``
    dynamic overwrite does the same work in one Spark job."""
    extra = (set(updates.columns)
             - set(spark.read.parquet(target_dir).columns))
    if extra:
        raise ValueError(f"merge: update columns {sorted(extra)} do "
                         f"not exist on the target — schema evolution "
                         f"is not a merge")
    if validate:
        _unique_update_keys(updates, on_l)

    def fold_factory(with_part: bool):
        keys = on_l if with_part else on_p
        uc = update_cols if with_part or update_cols is None \
            else [c for c in update_cols if c != partition_by]

        def f(tgt: DataFrame, b: DataFrame) -> DataFrame:
            return merge_frames(tgt, b, keys, when_matched,
                                when_not_matched, uc,
                                strategy=strategy, validate=False)

        return f

    return _partitioned_file_pruned_fold(
        spark, target_dir, partition_by, vals, updates, on_p[0],
        fold_factory)


def _partitioned_file_pruned_fold(spark: SparkSession,
                                  target_dir: str, partition_by: str,
                                  vals: list, batch_df: DataFrame,
                                  prune_key: str,
                                  fold_factory) -> dict:
    """Generic partition+file pruned apply shared by the MERGE and CDC
    faces: resolve the touched partition dirs from actual file paths
    (Spark owns the hive escaping), run the file-pruned fold per dir
    under its own swap, remove emptied partitions, and write batch
    values with no existing dir through one dynamic-overwrite job
    (``fold_factory(with_part)`` supplies the fold over
    (target_slice, batch_slice) — without the partition column for
    per-dir folds, with it for the new-partition path)."""
    import shutil
    from urllib.parse import unquote, urlparse

    from ..streaming.ingest import StateDir

    # value -> partition dir, resolved from actual file paths (hive
    # escaping owned by Spark, same trick as _remove_partition_dirs)
    rows = (spark.read.parquet(target_dir)
            .where(F.col(partition_by).isin(list(vals)))
            .select(partition_by, F.input_file_name().alias("__f"))
            .groupBy(partition_by).agg(F.first("__f").alias("__f"))
            .collect())
    root = os.path.realpath(target_dir)
    dirmap = {}
    for r in rows:
        p = os.path.realpath(unquote(urlparse(r["__f"]).path))
        head = os.path.relpath(p, root).split(os.sep, 1)[0]
        if not head.startswith(f"{partition_by}="):
            raise RuntimeError(
                f"merge_into: file of partition value "
                f"{r[partition_by]!r} not under a {partition_by}= dir")
        dirmap[r[partition_by]] = os.path.join(root, head)
    tot = {"partitions_touched": len(dirmap),
           "partitions_new": 0, "files_total": 0,
           "files_touched": 0, "files_linked": 0}
    fold_nopart = fold_factory(False)
    for v in sorted(dirmap, key=repr):
        pdir = dirmap[v]
        sd = StateDir(pdir, "merge_into")
        sd.recover()
        sub = spark.read.parquet(pdir)
        sl = batch_df.where(F.col(partition_by) == F.lit(v)) \
            .drop(partition_by)
        rep = _file_pruned_fold(spark, sd, pdir, sub, sl, prune_key,
                                lambda tdf: fold_nopart(tdf, sl))
        for k in ("files_total", "files_touched", "files_linked"):
            tot[k] += rep[k]
        if spark.read.parquet(pdir).limit(1).count() == 0:
            shutil.rmtree(pdir)  # the fold emptied this partition
    new_vals = [v for v in vals if v not in dirmap]
    if new_vals:
        root_df = spark.read.parquet(target_dir)
        ins = batch_df.where(F.col(partition_by).isin(new_vals))
        out = fold_factory(True)(root_df.limit(0), ins)
        prev = spark.conf.get(
            "spark.sql.sources.partitionOverwriteMode", "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode",
                       "dynamic")
        try:
            (out.write.mode("overwrite")
             .partitionBy(partition_by).parquet(target_dir))
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode",
                           prev)
        tot["partitions_new"] = len(new_vals)
    return tot


def _pruned_check(on_l: list[str], partition_by: str,
                  vals: list, who: str) -> None:
    if partition_by not in on_l:
        raise ValueError(
            f"{who}: partition_by {partition_by!r} must be part of "
            f"the merge key `on` — otherwise a key could match a row "
            f"in an unread partition and the pruned fold would "
            f"duplicate it")
    if any(v is None for v in vals):
        raise ValueError(f"{who}: NULL partition values in the batch "
                         f"(NULL keys never match — the row could "
                         f"only land in the Hive default partition; "
                         f"partition on a non-NULL column)")


def _write_pruned(spark: SparkSession, target_dir: str,
                  partition_by: str, vals: list,
                  frame: DataFrame) -> None:
    """Dynamic-partition-overwrite write of the folded touched
    partitions + removal of partitions the fold emptied (a fully-
    deleted partition leaves no rows for dynamic overwrite to replace,
    so its stale dir must go explicitly).

    The localCheckpoint is touched-PARTITIONS-sized — the same rows
    the write must materialize anyway (it exists so the survivors
    probe does not run the merge plan a second time); executor-local
    disk, bounded by the batch's partitions, never the table."""
    frame = frame.localCheckpoint(eager=False)
    survived = {r[0] for r in
                frame.select(partition_by).distinct().collect()}
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode",
                          "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode",
                   "dynamic")
    try:
        (frame.write.mode("overwrite").partitionBy(partition_by)
         .parquet(target_dir))
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode",
                       prev)
    doomed = set(vals) - survived
    if doomed:
        _remove_partition_dirs(spark, target_dir, partition_by,
                               sorted(doomed, key=repr))


def _remove_partition_dirs(spark: SparkSession, target_dir: str,
                           partition_by: str, doomed: list) -> None:
    """Remove the hive partition dirs holding the ``doomed`` values.

    The dir NAME cannot be derived as ``f"{col}={value}"`` — Spark
    hive-escapes it (boolean True -> ``part=true``, spaces/colons/
    slashes %-encoded), so a str()-built path silently misses and the
    stale partition's rows would reappear on every read.  Instead the
    dirs are resolved from the ACTUAL file paths Spark associates with
    the doomed values (partition-pruned, zero-payload-column scan of
    only the stale partitions), so removal is exact by construction;
    a doomed value with no files is a partition that never existed
    (e.g. a delete feed for a brand-new partition value) — a no-op."""
    import shutil
    from urllib.parse import unquote, urlparse

    files = (spark.read.parquet(target_dir)
             .where(F.col(partition_by).isin(list(doomed)))
             .select(F.input_file_name().alias("__f"))
             .distinct().collect())
    root = os.path.realpath(target_dir)
    dirs = set()
    for r in files:
        p = os.path.realpath(unquote(urlparse(r["__f"]).path))
        rel = os.path.relpath(p, root)
        head = rel.split(os.sep, 1)[0]
        if rel.startswith("..") or not head.startswith(
                f"{partition_by}="):
            raise RuntimeError(
                f"_remove_partition_dirs: file {p!r} of a doomed "
                f"partition does not sit under a "
                f"{partition_by}=... dir of {root!r} — refusing to "
                f"remove anything")
        dirs.add(head)
    for d in sorted(dirs):
        shutil.rmtree(os.path.join(root, d))


class MergeTap:
    """Tap face of :func:`merge_into`: a standing keyed parquet table
    that reads like any source tap and folds update batches in place.

    >>> tap = MergeTap(path, on=["k"])
    >>> tap.merge(spark, updates_df)           # upsert
    >>> tap.merge(spark, tombstones, when_matched="delete",
    ...           when_not_matched="ignore")   # keyed delete
    >>> df = tap.to_df(spark)                  # standing state

    ``retain=N`` keeps the last N PRE-merge generations as hard-link
    snapshots (``<path>.gen-<k>`` siblings — parquet files are
    immutable and every merge writes new files, so a snapshot costs
    one link per file, no data copy): cheap time-travel on top of the
    swap contract.  ``generations()`` lists them, ``restore(gen)``
    swaps one back in (crash-safe, the generation survives),
    ``vacuum(keep)`` prunes old ones.  Single maintenance writer,
    like every compactor here."""

    __cascalog_generator__ = True

    def __init__(self, path: str, on, strategy: str = "broadcast",
                 partition_by: Optional[str] = None, retain: int = 0):
        self.path = path
        self.on = [on] if isinstance(on, str) else list(on)
        self.strategy = strategy
        self.partition_by = partition_by
        self.retain = retain

    def to_df(self, spark: SparkSession) -> DataFrame:
        from ..streaming.ingest import _raise_if_crashed

        if not os.path.isdir(self.path):
            _raise_if_crashed(self.path, "merge_into")
            raise FileNotFoundError(
                f"MergeTap: no standing table at {self.path} — merge a "
                f"first batch before reading")
        return spark.read.parquet(self.path)

    def load_rows(self) -> tuple[list, list]:
        """``(field names, row tuples)`` WITHOUT Spark — the in-memory
        platform's tap reader (same contract as ParquetTap.load_rows:
        pyarrow read, Python natives, None for NULLs), so a MergeTap
        works as a generator on the local platform too.  Crashed swap
        state raises the same loud error as the Spark reader."""
        import glob as _glob

        from ..streaming.ingest import _raise_if_crashed

        if not os.path.isdir(self.path):
            _raise_if_crashed(self.path, "merge_into")
            raise FileNotFoundError(
                f"MergeTap: no standing table at {self.path}")
        import pyarrow.parquet as _pq

        files = sorted(
            _glob.glob(os.path.join(self.path, "**", "*.parquet"),
                       recursive=True)
            or _glob.glob(os.path.join(self.path, "**", "part-*"),
                          recursive=True))
        if not files:
            raise FileNotFoundError(
                f"MergeTap: no parquet files under {self.path}")
        tbl = _pq.ParquetDataset(self.path).read()
        pdf = tbl.to_pandas()
        pdf = pdf.astype(object).where(pdf.notnull(), None)
        return ([str(c) for c in pdf.columns],
                [tuple(r) for r in pdf.itertuples(index=False,
                                                  name=None)])

    def merge(self, spark: SparkSession, updates: DataFrame,
              when_matched: str = "update",
              when_not_matched: str = "insert",
              update_cols: Optional[list[str]] = None,
              validate: bool = True, evolve: bool = False,
              file_prune: bool = False) -> Optional[dict]:
        if self.retain > 0:
            from ..streaming.ingest import StateDir

            # recover any crashed swap BEFORE snapshotting, so the
            # generation captures a consistent table, then prune to
            # the retention window
            StateDir(self.path, "merge_into").recover()
            if os.path.isdir(self.path):
                self.snapshot()
                self.vacuum()
        return merge_into(spark, self.path, updates, self.on,
                          when_matched, when_not_matched, update_cols,
                          strategy=self.strategy, validate=validate,
                          partition_by=self.partition_by, evolve=evolve,
                          file_prune=file_prune)

    # ---- time-travel: hard-link generations on the swap contract ----

    def _gen_dir(self, n: int) -> str:
        return f"{self.path.rstrip('/')}.gen-{n}"

    def generations(self) -> list[int]:
        """Sorted generation numbers currently on disk (oldest
        first).  A ``.tmp`` suffix marks a crashed snapshot — swept by
        the next :meth:`vacuum`/:meth:`snapshot`, never listed."""
        import glob as _glob
        import re as _re

        out = []
        for p in _glob.glob(self._gen_dir("*")):
            m = _re.fullmatch(r".*\.gen-(\d+)", p)
            if m:
                out.append(int(m.group(1)))
        return sorted(out)

    def snapshot(self) -> int:
        """Hard-link the CURRENT table into a new generation dir and
        return its number.  Link-then-rename: a crash mid-snapshot
        leaves only a ``.tmp`` dir (swept later), never a half
        generation.  O(files) link syscalls, zero data copied —
        parquet files are immutable here (merges swap in NEW files)."""
        if not os.path.isdir(self.path):
            raise FileNotFoundError(
                f"MergeTap.snapshot: no table at {self.path}")
        n = (self.generations() or [-1])[-1] + 1
        gen = self._gen_dir(n)
        tmp = gen + ".tmp"
        _linktree(self.path, tmp, fresh=True)
        os.rename(tmp, gen)
        return n

    def vacuum(self, keep: Optional[int] = None) -> list[int]:
        """Drop the oldest generations beyond ``keep`` (default: the
        tap's ``retain``) and sweep crashed ``.tmp`` snapshots;
        returns the removed generation numbers."""
        import glob as _glob
        import shutil as _shutil

        keep = self.retain if keep is None else keep
        for p in _glob.glob(self._gen_dir("*") + ".tmp"):
            _shutil.rmtree(p, ignore_errors=True)
        gens = self.generations()
        doomed = gens[:-keep] if keep > 0 else gens
        for n in doomed:
            _shutil.rmtree(self._gen_dir(n))
        return doomed

    def restore(self, gen: Optional[int] = None) -> int:
        """Swap generation ``gen`` (default: newest) back in as the
        live table, crash-safely (same StateDir contract as the
        merges: the restored copy is fully linked into ``.compact.tmp``
        first).  The generation itself SURVIVES — restore is a copy-
        back, not a move — so restore/merge/restore chains work.
        Returns the restored generation number."""
        from ..streaming.ingest import StateDir

        gens = self.generations()
        if not gens:
            raise FileNotFoundError(
                f"MergeTap.restore: no generations beside {self.path}")
        if gen is None:
            gen = gens[-1]
        if gen not in gens:
            raise FileNotFoundError(
                f"MergeTap.restore: no generation {gen} "
                f"(have {gens})")
        sd = StateDir(self.path, "merge_into")
        sd.recover()
        if not os.path.isdir(self.path):
            # table deleted out-of-band: plain link-back, no swap
            _linktree(self._gen_dir(gen), self.path, fresh=True)
            return gen
        sd.swap(lambda tmp: _linktree(self._gen_dir(gen), tmp,
                                      fresh=True))
        return gen


def _linktree(src: str, dst: str, fresh: bool = False) -> None:
    """Recreate ``src``'s tree at ``dst`` with hard links (copy
    fallback across devices).  Used for MergeTap generations — safe
    because the engine never mutates a written parquet file in place
    (every write path here creates new files and swaps dirs)."""
    import shutil

    if fresh:
        shutil.rmtree(dst, ignore_errors=True)
    for root, _dirs, files in os.walk(src):
        rel = os.path.relpath(root, src)
        out = dst if rel == "." else os.path.join(dst, rel)
        os.makedirs(out, exist_ok=True)
        for f in files:
            s, d = os.path.join(root, f), os.path.join(out, f)
            try:
                os.link(s, d)
            except OSError:
                shutil.copy2(s, d)


def _guard_op_col(changes: DataFrame, op_col: str, insert_ops: tuple,
                  delete_ops: tuple) -> DataFrame:
    """The unknown-op guard rides INSIDE the op column itself (an op
    outside insert_ops+delete_ops — including NULL, which isin()
    would silently drop — hits raise_error executor-side the moment
    any downstream expression reads the op), so it costs ZERO extra
    driver actions: streaming CDC folds pay the check for free in the
    winners job.  The error is LAZY — it surfaces when the fold's
    first action runs."""
    ok = tuple(insert_ops) + tuple(delete_ops)
    msg = F.concat(
        F.lit("apply_changes: unknown op "),
        F.coalesce(F.col(op_col).cast("string"), F.lit("NULL")),
        F.lit(f" (insert_ops={insert_ops}, "
              f"delete_ops={delete_ops})"))
    checked = (F.when(F.col(op_col).isin(*ok), F.col(op_col))
               .otherwise(F.raise_error(msg)
                          .cast(dict(changes.dtypes)[op_col])))
    return changes.withColumn(op_col, checked)


def apply_changes(target: DataFrame, changes: DataFrame, on,
                  op_col: str = "op", seq_col: Optional[str] = None,
                  insert_ops: tuple = ("I", "U"),
                  delete_ops: tuple = ("D",),
                  strategy: str = "shuffle",
                  validate: bool = True,
                  evolve: bool = False) -> DataFrame:
    """CDC APPLY CHANGES: fold a change feed into the target — the
    Delta-style ``APPLY CHANGES INTO`` companion of
    :func:`merge_frames` (two chained merge passes: upserts over the
    payload, then a keyed delete whose join carries key columns
    only).

    ``changes`` carries ``op_col`` (values in ``insert_ops`` upsert the
    row's payload; values in ``delete_ops`` delete by key; anything
    else — including NULL — raises) and optionally ``seq_col``: with
    it, only each key's
    LATEST change applies (row_number over seq DESC, ties broken by
    ``op_col`` DESC then arbitrary-but-deterministic — pass a total
    (key, seq) order for full determinism); without it the feed must
    be key-unique (enforced like merge's validate).

    Semantics per key: latest change U/I → target row replaced (or
    inserted when absent); latest change D → target row removed
    (absent: no-op); keys without changes pass through.  One
    full-outer shuffle join (``strategy='shuffle'``) or the
    no-target-Exchange broadcast form (``'broadcast'`` — broadcast
    left join + key-pruned anti join), same trade as merge_frames.

    Value-absolute like MERGE, so replaying the same change batch is
    idempotent — the crash-recovery contract of the ``*_into`` face.

    ``validate`` — the unknown-op guard is FREE (folded into the op
    column via ``raise_error``: zero extra driver actions, the error
    surfaces lazily when the fold's first action evaluates a bad op).
    Only the no-``seq_col`` key-uniqueness check costs an extra
    aggregate probe; ``validate=False`` skips both for producers that
    guarantee clean feeds (the streaming hot path).

    ``evolve=True`` — opt-in schema evolution, same contract as
    :func:`merge_frames`: payload columns the feed carries beyond the
    target extend the output schema (NULL backfill on untouched
    rows); without it extra feed columns are a loud error.
    """
    from pyspark.sql import Window

    on = [on] if isinstance(on, str) else list(on)
    if op_col not in changes.columns:
        raise ValueError(f"apply_changes: op_col {op_col!r} missing "
                         f"from the change feed")
    if validate:
        changes = _guard_op_col(changes, op_col, insert_ops,
                                delete_ops)
    drop = [op_col] + ([seq_col] if seq_col else [])
    if seq_col is not None:
        w = Window.partitionBy(*on).orderBy(F.col(seq_col).desc(),
                                            F.col(op_col).desc())
        changes = (changes.withColumn("__cn", F.row_number().over(w))
                   .where(F.col("__cn") == 1).drop("__cn"))
    elif validate:
        # the ONE remaining validation action: without seq_col the
        # feed must be key-unique (an aggregate probe over the batch);
        # pass validate=False when the producer guarantees it
        _unique_update_keys(changes, on)
    upserts = changes.where(F.col(op_col).isin(*insert_ops)).drop(*drop)
    deletes = changes.where(F.col(op_col).isin(*delete_ops)) \
        .select(*on)
    # two merge passes, both over the SAME winners frame: upsert then
    # keyed delete — the delete side joins on keys only, so the second
    # pass shuffles key columns, not payloads
    step1 = merge_frames(target, upserts, on, "update", "insert",
                         strategy=strategy, validate=False,
                         evolve=evolve)
    dl = deletes
    # NULL-type the delete side from step1 (== target unless evolve
    # extended the schema)
    for c in [c for c in step1.columns if c not in on]:
        dl = dl.withColumn(c, F.lit(None).cast(dict(step1.dtypes)[c]))
    return merge_frames(step1, dl, on, "delete", "ignore",
                        strategy=strategy, validate=False)


def apply_changes_into(spark: SparkSession, target_dir: str,
                       changes: DataFrame, on,
                       op_col: str = "op",
                       seq_col: Optional[str] = None,
                       insert_ops: tuple = ("I", "U"),
                       delete_ops: tuple = ("D",),
                       strategy: str = "broadcast",
                       partition_by: Optional[str] = None,
                       validate: bool = True,
                       file_prune: bool = False,
                       evolve: bool = False) -> Optional[dict]:
    """Apply a CDC batch to the standing parquet table at
    ``target_dir`` with the same crash-safe write-new-then-swap
    contract as :func:`merge_into` (replay-idempotent: value-absolute
    changes converge on re-run).  First batch bootstraps the table
    from the feed's upserts.

    ``partition_by=`` is the pruned path, same contract as
    :func:`merge_into`: the partition column must ride in ``on``,
    only the feed's partitions are read and rewritten (dynamic
    overwrite; emptied partitions removed), crash recovery by replay
    instead of the atomic swap.

    ``file_prune=True`` stacks FILE-level skipping on top, same
    contract as :func:`merge_into`'s: footer key ranges on the first
    non-partition key decide which files the feed can touch; unhit
    files hard-link through byte-identical.  Composes with
    ``partition_by=`` (per-touched-partition folds) or runs flat;
    returns the file-skipping report dict on those paths."""
    from ..streaming.ingest import StateDir

    sd = StateDir(target_dir, "apply_changes_into")
    sd.recover()
    on_l = [on] if isinstance(on, str) else list(on)
    if evolve and (partition_by is not None or file_prune):
        raise ValueError(
            "apply_changes_into: evolve=True needs a full rewrite "
            "(untouched partitions / linked-through files would keep "
            "the old schema) — apply one evolving batch without "
            "partition_by/file_prune, then resume pruned folds")
    drop = [op_col] + ([seq_col] if seq_col else [])
    if not os.path.isdir(target_dir):
        empty = changes.where(F.col(op_col).isin(*insert_ops)) \
            .drop(*drop).limit(0)
        applied = apply_changes(empty, changes, on_l, op_col, seq_col,
                                insert_ops, delete_ops,
                                strategy="shuffle", validate=validate)
        w = applied.write.mode("overwrite")
        if partition_by is not None:
            # check the BOOTSTRAP batch's values too — a NULL would
            # silently land in the Hive default partition and then be
            # unreachable by every later pruned merge
            vals = [r[0] for r in
                    changes.select(partition_by).distinct().collect()]
            _pruned_check(on_l, partition_by, vals,
                          "apply_changes_into")
            w = w.partitionBy(partition_by)
        w.parquet(target_dir)
        return
    if validate:
        # op guard is expression-level (free); apply it ONCE here so
        # the file-pruned per-partition folds don't re-probe, and run
        # the one no-seq uniqueness probe a single time for the batch
        changes = _guard_op_col(changes, op_col, insert_ops,
                                delete_ops)
        if seq_col is None:
            _unique_update_keys(changes, on_l)
    if partition_by is not None:
        vals = [r[0] for r in
                changes.select(partition_by).distinct().collect()]
        _pruned_check(on_l, partition_by, vals, "apply_changes_into")
        if not vals:
            return None
        if file_prune:
            on_p = [k for k in on_l if k != partition_by]
            if not on_p:
                raise ValueError(
                    "apply_changes_into: file_prune with partition_by "
                    "needs a non-partition key column to range-prune "
                    "files on")

            def fold_factory(with_part: bool):
                keys = on_l if with_part else on_p

                def f(tgt: DataFrame, b: DataFrame) -> DataFrame:
                    return apply_changes(tgt, b, keys, op_col,
                                         seq_col, insert_ops,
                                         delete_ops,
                                         strategy=strategy,
                                         validate=False)

                return f

            return _partitioned_file_pruned_fold(
                spark, target_dir, partition_by, vals, changes,
                on_p[0], fold_factory)
        target = spark.read.parquet(target_dir)
        sliced = target.where(F.col(partition_by).isin(vals))
        applied = apply_changes(sliced, changes, on_l, op_col, seq_col,
                                insert_ops, delete_ops,
                                strategy=strategy, validate=False)
        _write_pruned(spark, target_dir, partition_by, vals, applied)
        return None
    target = spark.read.parquet(target_dir)
    if file_prune:

        def fold(tdf: DataFrame) -> DataFrame:
            return apply_changes(tdf, changes, on_l, op_col, seq_col,
                                 insert_ops, delete_ops,
                                 strategy=strategy, validate=False)

        return _file_pruned_fold(spark, sd, target_dir, target,
                                 changes, on_l[0], fold)
    applied = apply_changes(target, changes, on_l, op_col, seq_col,
                            insert_ops, delete_ops, strategy=strategy,
                            validate=False, evolve=evolve)
    sd.swap(lambda tmp: applied.write.mode("overwrite").parquet(tmp))
    return None


def optimize_table(spark: SparkSession, target_dir: str,
                   target_file_mb: int = 128,
                   zorder_by: Optional[list[str]] = None,
                   zorder_bits: int = 16,
                   min_files: int = 1,
                   skip_below_files: int = 0) -> dict:
    """Lakehouse ``OPTIMIZE [ZORDER BY]`` for a standing parquet table:
    bin-pack the small files that incremental merges / dynamic
    partition overwrites accumulate into ~``target_file_mb`` files,
    optionally Z-order-clustered on ``zorder_by`` (Morton key →
    repartitionByRange + sortWithinPartitions — per-file min/max stats
    then prune scans on EVERY clustered column).

    Same crash contract as :func:`merge_into` (StateDir swap: the
    optimized copy is fully written to ``.compact.tmp`` first — a
    crash at any point is recoverable and never mixes layouts).  Rows
    are bit-identical, only layout changes (pinned by test).  Returns
    ``{"files_before": n, "files_after": m, "bytes": b}``.

    A hive-partitioned root is auto-iterated: every partition dir is
    optimized under its OWN swap (crash leaves each partition fully
    optimized or untouched), ``skip_below_files`` skips partitions
    already holding fewer data files than that, and the returned dict
    adds ``partitions`` / ``partitions_skipped``.

    Run with the maintenance writer idle, like every compactor here.
    At 100 TB this is the periodic maintenance job: merge cost is
    O(batch) every batch, optimize cost O(table) but amortized over
    however many merges accumulated between runs."""
    import glob

    from ..streaming.ingest import StateDir

    sd = StateDir(target_dir, "optimize_table")
    sd.recover()
    if not os.path.isdir(target_dir):
        raise FileNotFoundError(f"optimize_table: no table at "
                                f"{target_dir}")
    parts = sorted(e for e in os.listdir(target_dir)
                   if "=" in e
                   and os.path.isdir(os.path.join(target_dir, e)))
    if parts:
        # a flat rewrite of a hive-partitioned table would silently
        # DROP the partition layout (the partition column becomes a
        # plain column) — so a partitioned root auto-iterates: each
        # partition dir is a plain parquet table, optimized under its
        # OWN StateDir swap (a crash mid-sweep leaves every partition
        # either fully optimized or untouched, never mixed), and
        # `skip_below_files` skips partitions that are already
        # compact.  The partition column itself cannot be a zorder
        # key (it is the dir name, not a column of the per-dir files)
        pcol = parts[0].split("=", 1)[0]
        if zorder_by and pcol in zorder_by:
            raise ValueError(
                f"optimize_table: zorder_by contains the partition "
                f"column {pcol!r} — the hive layout already clusters "
                f"on it; zorder on the remaining columns")
        tot = {"files_before": 0, "files_after": 0, "bytes": 0,
               "partitions": 0, "partitions_skipped": 0}
        for p in parts:
            pdir = os.path.join(target_dir, p)
            n_data = len([f for f in glob.glob(os.path.join(pdir, "*"))
                          if os.path.isfile(f) and not
                          os.path.basename(f).startswith(("_", "."))])
            if n_data < skip_below_files:
                tot["partitions_skipped"] += 1
                continue
            rep = optimize_table(spark, pdir, target_file_mb,
                                 zorder_by, zorder_bits, min_files)
            tot["files_before"] += rep["files_before"]
            tot["files_after"] += rep["files_after"]
            tot["bytes"] += rep["bytes"]
            tot["partitions"] += 1
        return tot
    files = [f for f in glob.glob(os.path.join(target_dir, "**", "*"),
                                  recursive=True)
             if os.path.isfile(f) and not os.path.basename(f)
             .startswith(("_", "."))]
    total = sum(os.path.getsize(f) for f in files)
    n_out = max(min_files, int(total // (target_file_mb << 20)) + 1)
    df = spark.read.parquet(target_dir)
    if zorder_by:
        from ..functions.layout import zorder_key

        key = zorder_key(df, list(zorder_by), bits=zorder_bits)
        packed = (df.withColumn("__zkey", key)
                  .repartitionByRange(n_out, F.col("__zkey"))
                  .sortWithinPartitions("__zkey")
                  .drop("__zkey"))
    else:
        packed = df.coalesce(n_out) if n_out < len(files) \
            else df.repartition(n_out)
    sd.swap(lambda tmp: packed.write.mode("overwrite").parquet(tmp))
    after = len([f for f in glob.glob(os.path.join(target_dir, "*"))
                 if os.path.isfile(f) and not os.path.basename(f)
                 .startswith(("_", "."))])
    return {"files_before": len(files), "files_after": after,
            "bytes": int(total)}
