"""Data-quality expectation checks — declarative constraint validation.

The know-your-data counterpart to profiling (stats.py, corpus.py
corpus_report): a production 100 TB pipeline gates every ingest batch on
assertions (null fractions, domains, ranges, key uniqueness, referential
integrity) before the data reaches training.  Reference analog: none —
this is the extension tier's own production-hardening bar (the reference
stops at :trap error diversion; SURVEY.md §2.11).

Scale shape: ``check_expectations`` is ONE column-pruned aggregate pass
over the table — every rule folds to a conditional sum, map-side partials
collapse each partition to a single row before the (1-row) shuffle, and
the per-rule unpivot happens on that 1-row frame.  ``unique_report`` is
one groupBy on the key (map-side combine) + a 1-row summary.
``referential_orphans`` is a single anti-join, broadcast when the parent
key set fits.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _as_cond(rule) -> Column:
    cond = F.expr(rule) if isinstance(rule, str) else rule
    # NULL predicate result = expectation NOT met (SQL three-valued logic
    # would silently skip the row; a data-quality gate must count it)
    return F.coalesce(cond, F.lit(False))


def check_expectations(df: DataFrame, rules: dict[str, Column | str],
                       ) -> DataFrame:
    """Evaluate named boolean expectations in ONE aggregate pass →
    ``(rule, n_rows, n_fail, fail_frac, passed)``, one row per rule.

    ``rules`` maps a rule name to a boolean Column or SQL expression
    string that is True for every row satisfying the expectation.  A
    NULL predicate result counts as a failure (a gate must not silently
    skip unscorable rows).  Empty input → every rule passes with
    ``n_rows = 0``.

    The whole report is a single global aggregate: per-partition
    partials are one row wide regardless of table size, so the shuffle
    is O(partitions), never data-sized.
    """
    if not rules:
        raise ValueError("check_expectations: rules must be non-empty")
    aggs = [F.count(F.lit(1)).alias("__n")]
    names = sorted(rules)
    for i, name in enumerate(names):
        aggs.append(F.sum(
            F.when(_as_cond(rules[name]), 0).otherwise(1)
        ).alias(f"__f{i}"))
    row = df.agg(*aggs)
    # unpivot the 1-row aggregate into one row per rule — native explode
    # over a literal-shaped array of structs (tiny; never data-sized)
    pairs = F.array(*[
        F.struct(F.lit(name).alias("rule"),
                 F.coalesce(F.col(f"__f{i}"), F.lit(0)).alias("n_fail"))
        for i, name in enumerate(names)])
    out = (row.select(F.col("__n").alias("n_rows"),
                      F.explode(pairs).alias("r"))
           .select("r.rule", "n_rows", "r.n_fail"))
    frac = F.when(F.col("n_rows") == 0, F.lit(0.0)).otherwise(
        F.col("n_fail") / F.col("n_rows"))
    return (out.withColumn("fail_frac", F.round(frac, 6))
            .withColumn("passed", F.col("n_fail") == 0)
            .select("rule", "n_rows", "n_fail", "fail_frac", "passed"))


def unique_report(df: DataFrame, cols: list[str]) -> DataFrame:
    """Key-uniqueness expectation → ONE row
    ``(n_rows, n_keys, n_dup_keys, n_dup_rows, passed)``.

    ``n_dup_keys`` = distinct key tuples appearing more than once;
    ``n_dup_rows`` = rows carrying such a key (the rows an exact-dedup
    pass would inspect).  NULL key components group together (a NULL
    order id occurring twice IS a duplicate for gating purposes).

    One groupBy on the key (map-side combine bounds the shuffle at one
    row per distinct key) + a 1-row rollup of the per-key counts.
    """
    if not cols:
        raise ValueError("unique_report: cols must be non-empty")
    per_key = df.groupBy(*cols).agg(F.count(F.lit(1)).alias("__c"))
    return (per_key.agg(
        F.coalesce(F.sum("__c"), F.lit(0)).alias("n_rows"),
        F.count(F.lit(1)).alias("n_keys"),
        F.sum(F.when(F.col("__c") > 1, 1).otherwise(0)).alias("n_dup_keys"),
        F.sum(F.when(F.col("__c") > 1, F.col("__c")).otherwise(0)
              ).alias("n_dup_rows"))
        .withColumn("n_dup_keys", F.coalesce(F.col("n_dup_keys"), F.lit(0)))
        .withColumn("n_dup_rows", F.coalesce(F.col("n_dup_rows"), F.lit(0)))
        .withColumn("passed", F.col("n_dup_keys") == 0))


def referential_orphans(child: DataFrame, parent: DataFrame,
                        on: dict[str, str],
                        broadcast_parent: bool = True) -> DataFrame:
    """Referential-integrity violations: child rows whose key has no
    match in ``parent`` → the orphan child rows, unchanged schema.

    ``on`` maps child column → parent column.  Rows with a NULL child
    key are orphans (anti-join keeps them — a fact row with no foreign
    key fails the expectation rather than vanishing from the report).

    One left-anti join; the parent side is pruned to its key columns
    and broadcast by default (a dimension key set is small even when
    the dimension table is wide).  Set ``broadcast_parent=False`` for
    fact-to-fact checks so the join shuffles both sides on the key.
    """
    if not on:
        raise ValueError("referential_orphans: on must be non-empty")
    keys = parent.select(*[F.col(p).alias(f"__k_{c}")
                           for c, p in on.items()]).dropDuplicates()
    if broadcast_parent:
        keys = F.broadcast(keys)
    cond = None
    for c in on:
        eq = child[c] == keys[f"__k_{c}"]
        cond = eq if cond is None else (cond & eq)
    return child.join(keys, cond, "left_anti")


def referential_report(child: DataFrame, parent: DataFrame,
                       on: dict[str, str],
                       broadcast_parent: bool = True) -> DataFrame:
    """One-row gate summary over ``referential_orphans`` →
    ``(n_child, n_orphans, orphan_frac, passed)``.  Two column-pruned
    aggregates (child count + orphan count); the orphan side reuses the
    single anti-join plan."""
    n_child = child.agg(F.count(F.lit(1)).alias("n_child"))
    n_orph = (referential_orphans(child, parent, on, broadcast_parent)
              .agg(F.count(F.lit(1)).alias("n_orphans")))
    frac = F.when(F.col("n_child") == 0, F.lit(0.0)).otherwise(
        F.col("n_orphans") / F.col("n_child"))
    return (n_child.crossJoin(n_orph)  # two 1-row sides
            .withColumn("orphan_frac", F.round(frac, 6))
            .withColumn("passed", F.col("n_orphans") == 0))


def _row_hash_col(cols: list[str]):
    """The ONE row-hash encoding shared by :func:`dataset_fingerprint`
    and :func:`export_manifest` (their xors must fold into each other):
    60-bit md5 over '|'-joined length-prefixed cells — ``v<len>:<val>``,
    bare ``n`` for NULL — so content cannot shift across column
    boundaries and NULL never collides with a literal."""
    def cell(c):
        sv = F.col(c).cast("string")
        return F.when(sv.isNull(), F.lit("n")).otherwise(
            F.concat(F.lit("v"), F.length(sv).cast("string"),
                     F.lit(":"), sv))

    s = F.concat_ws("|", *[cell(c) for c in cols])
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")


def dataset_fingerprint(df: DataFrame, cols: list[str] | None = None,
                        ) -> DataFrame:
    """Order- and partitioning-invariant content fingerprint → ONE row
    ``(n_rows, xor_hash, min_hash, max_hash)``.

    The reproducibility gate for training exports: two datasets with
    the same multiset of rows fingerprint identically however they are
    partitioned, ordered, or re-written; any single changed/missing/
    duplicated row flips ``xor_hash`` (and usually the min/max probes).
    Duplicate-PAIR blindness is the one xor caveat (two identical added
    rows cancel) — ``n_rows`` catches additions, and exact-dup auditing
    is ``unique_report``'s job.

    Row hash = first 60 bits of md5 over a length-prefixed encoding of
    the string casts — each cell renders as ``v<len>:<value>`` (NULL →
    the bare marker ``n``) joined by '|', so content cannot shift
    across column boundaries unnoticed (``('a|b','c')`` and
    ``('a','b|c')`` hash differently, and NULL never collides with any
    literal).  Deliberately replicable in any engine with md5 — the
    cross-engine check an int-only xxhash64 would not allow.  One
    aggregate pass; partials are one row per partition.
    Cast-stability caveat: float→string formatting differs across
    engines, so fingerprint integer/string/date columns (or pre-round
    floats to fixed decimals) when comparing across engines.
    """
    cols = list(cols or df.columns)
    if not cols:
        raise ValueError("dataset_fingerprint: no columns")
    h = _row_hash_col(cols)
    return (df.select(h.alias("__h"))
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.expr("bit_xor(__h)").alias("xor_hash"),
                 F.min("__h").alias("min_hash"),
                 F.max("__h").alias("max_hash")))


def export_manifest(spark, path: str,
                    cols: list[str] | None = None) -> DataFrame:
    """Per-file manifest of a written parquet dataset → one row per
    file ``(file, n_rows, xor_hash)`` plus :func:`dataset_fingerprint`
    semantics within each file — the artifact a training run pins so a
    re-export (or a single corrupted/rewritten shard) is detectable at
    file granularity without re-reading everything downstream.

    One pass over the dataset grouped by ``input_file_name()``
    (map-side combined: one row per file per task).  ``cols`` defaults
    to every column.  Compare manifests with ``operators.table_diff``
    keyed on ``file``, or fold ``xor_hash`` across files for the
    whole-dataset fingerprint (xor is associative).
    """
    df = spark.read.parquet(path)
    cols = list(cols or df.columns)
    h = _row_hash_col(cols)
    return (df.select(F.input_file_name().alias("file"),
                      h.alias("__h"))
            .groupBy("file")
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.expr("bit_xor(__h)").alias("xor_hash")))
