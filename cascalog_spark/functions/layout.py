"""Multi-dimensional write layout — Z-order (Morton) clustering.

Range-partitioning one column gives parquet min/max pruning on THAT
column only; queries filtering a second dimension still scan everything.
Z-ordering interleaves the bits of several rank-normalized dimensions so
rows close in ANY clustered dimension land in the same files — per-file
min/max stats then prune scans on every clustered column (the lakehouse
`OPTIMIZE ZORDER BY` capability, built from native expressions).

Scale shape: one cheap stats pass (min/max per column, same as SQ8
quantization), then the key is a pure map expression and the write is a
single repartitionByRange + sortWithinPartitions — exactly one shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def zorder_key(df: DataFrame, cols: list[str], bits: int = 16,
               stats: dict[str, tuple[float, float]] | None = None
               ) -> Column:
    """Morton key column interleaving ``bits`` bits per dimension (≤ 2
    cols × 31 bits or 3 × 21 — the key must fit a long).  Each column is
    affine-mapped to [0, 2^bits) from its observed (or provided) min/max;
    NULLs map to 0 (cluster together at the low end)."""
    if not cols:
        raise ValueError("zorder_key: at least one column required")
    if bits * len(cols) > 62:
        raise ValueError("zorder_key: bits * len(cols) must be <= 62")
    if stats is None:
        aggs = []
        for c in cols:
            aggs += [F.min(F.col(c).cast("double")).alias(f"__mn_{c}"),
                     F.max(F.col(c).cast("double")).alias(f"__mx_{c}")]
        row = df.agg(*aggs).first()
        stats = {c: (row[f"__mn_{c}"], row[f"__mx_{c}"]) for c in cols}
    scaled = []
    top = (1 << bits) - 1
    for c in cols:
        mn, mx = stats[c]
        mn = float(mn if mn is not None else 0.0)
        width = (float(mx) - mn) if (mx is not None and float(mx) > mn) \
            else 1.0
        v = (F.col(c).cast("double") - F.lit(mn)) / F.lit(width)
        cell = F.least(F.lit(top), F.greatest(F.lit(0), F.floor(
            v * F.lit(float(1 << bits))).cast("long")))
        scaled.append(F.coalesce(cell, F.lit(0)))
    n = len(cols)
    key = F.lit(0).cast("long")
    for b in range(bits):
        for i, s in enumerate(scaled):
            bit = F.shiftright(s, b).bitwiseAND(F.lit(1))
            key = key + F.shiftleft(bit, b * n + i)
    return key


def write_zordered(df: DataFrame, path: str, cols: list[str],
                   bits: int = 16, n_files: int = 32,
                   mode: str = "overwrite") -> None:
    """Write ``df`` as parquet clustered by the Z-order of ``cols``:
    repartitionByRange on the Morton key (one shuffle, disjoint key spans
    per file) + sortWithinPartitions so row groups inherit tight min/max
    on EVERY clustered column."""
    key = zorder_key(df, cols, bits)
    (df.withColumn("__zkey", key)
       .repartitionByRange(n_files, F.col("__zkey"))
       .sortWithinPartitions("__zkey")
       .drop("__zkey")
       .write.mode(mode).parquet(path))


def shuffle_key(col, seed: int = 42):
    """Deterministic pseudo-random sort key for ``col`` — md5 of the id
    + seed, the same engine-portable scheme as the sampling family.
    Reproducible across runs/retries (a ``rand()`` sort key is
    neither)."""
    return F.md5(F.concat_ws("_", col.cast("string"),
                             F.lit("shuf" + str(seed))))


def write_shuffled(df: DataFrame, path: str, id_col: str,
                   n_files: int = 32, seed: int = 42,
                   mode: str = "overwrite") -> None:
    """Materialize ``df`` in a deterministic GLOBAL random order — the
    training-export requirement (readers stream shards sequentially, so
    the order on disk IS the training order).

    repartitionByRange on the md5 shuffle key gives disjoint key spans
    per file (a range-sampling pass + one shuffle — never a
    single-partition global sort) and sortWithinPartitions finishes the
    total order; re-running with the same seed reproduces the byte
    order exactly, and a different seed is a fresh permutation."""
    key = shuffle_key(F.col(id_col), seed)
    (df.withColumn("__skey", key)
       .repartitionByRange(n_files, F.col("__skey"))
       .sortWithinPartitions("__skey")
       .drop("__skey")
       .write.mode(mode).parquet(path))


def compact_parquet(spark, path: str, target_bytes: int = 128 << 20,
                    tmp_suffix: str = "__compact_tmp") -> int:
    """Small-files maintenance: rewrite a parquet directory so each file
    is ~``target_bytes`` — the operational fix for ingest paths that
    accumulate thousands of tiny files (every one costs a task + an
    open at 100 TB scan time).

    File count = ceil(current_bytes / target) from the reader's own
    file listing (``df.inputFiles()``); the rewrite is
    write-new-then-swap (never in-place), preserving the schema and
    rows.  Partitioned layouts should compact per partition directory
    — point this at the leaf.  Returns the new file count."""
    import math
    import os
    import shutil
    from urllib.parse import urlparse

    df = spark.read.parquet(path)
    files = [urlparse(f).path for f in df.inputFiles()]
    total = sum(os.path.getsize(f) for f in files if os.path.exists(f))
    n = max(1, math.ceil(total / target_bytes))
    tmp = path.rstrip("/") + tmp_suffix
    df.repartition(n).write.mode("overwrite").parquet(tmp)
    bak = path.rstrip("/") + "__compact_bak"
    os.rename(path, bak)
    os.rename(tmp, path)
    shutil.rmtree(bak)
    return n
