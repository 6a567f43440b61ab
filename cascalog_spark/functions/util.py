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
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
