"""Partition-shape utilities for the pipeline operator packs."""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame


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
