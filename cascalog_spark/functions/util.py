"""Partition-shape utilities for the pipeline operator packs."""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def explode_fast(df: DataFrame, arr: Column, out_name: str,
                 pos_name: Optional[str] = None) -> DataFrame:
    """``explode`` with plain-explode semantics but WITHOUT Catalyst's
    ``InferFiltersFromGenerate`` pathology.

    For non-outer Generate, Catalyst infers ``size(arr) > 0`` and pushes it
    below the projections that built ``arr`` — inlining the WHOLE array
    expression into the filter, so an expensive array (shingles, LSH bands,
    chunk windows, a Python-UDF result) is computed TWICE per row, the
    second time in deeply-inlined interpreted form where every inner column
    reference is re-expanded per element (measured 48× slowdown on the
    shingle pipeline, and 2× extra Python calls for UDF mapcats).

    ``posexplode_outer`` is exempt from the rule; filtering the POSITION
    for null afterwards restores exact explode semantics: empty/null
    arrays drop the row, while legitimately-null array ELEMENTS survive
    (an element-null filter would eat those).
    """
    pos_tmp, out_tmp = "__xpf_pos", "__xpf_val"
    while pos_tmp in df.columns or out_tmp in df.columns:
        pos_tmp += "_"
        out_tmp += "_"
    keep = [c for c in df.columns if c not in (out_name, pos_name)]
    out = (df.select(*keep, F.posexplode_outer(arr).alias(pos_tmp, out_tmp))
           .where(F.col(pos_tmp).isNotNull()))
    if pos_name is not None:
        out = out.withColumnRenamed(pos_tmp, pos_name)
    else:
        out = out.drop(pos_tmp)
    return out.withColumnRenamed(out_tmp, out_name)


def ensure_parallelism(df: DataFrame,
                       min_partitions: Optional[int] = None) -> DataFrame:
    """Round-robin repartition ONLY when the input has fewer partitions than
    the cluster has slots.

    A compact parquet source (one file / one row group) scans as a single
    task, which serializes every CPU-heavy downstream op (shingling,
    minhash, pandas UDFs) on one core.  At real scale inputs arrive in many
    splits and this is a no-op — the guard means we never add a shuffle to
    a well-partitioned 100 TB corpus, only to pathologically-narrow inputs
    whose shuffle is by definition tiny.
    """
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    # Partition-count probe WITHOUT df.rdd: with AQE on, .rdd materializes
    # query stages (can run real jobs — r1 bench paid this twice per query).
    # inputFiles() is a driver-side metadata call; a file source with >=
    # target files already scans wide (parquet row-group splits only add
    # partitions).  Non-file sources fall back to the RDD probe.
    try:
        n_files = len(df.inputFiles())
    except Exception:  # pragma: no cover - defensive
        n_files = 0
    if n_files >= target:
        return df
    if n_files == 0 and df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
