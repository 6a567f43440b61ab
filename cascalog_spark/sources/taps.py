"""Taps — sources and sinks (the analog of cascalog.cascading.tap,
cascalog-core/src/clj/cascalog/cascading/tap.clj, and cascalog-more-taps,
cascalog-more-taps/src/clj/cascalog/more_taps.clj).

A Tap is a thin dataclass pairing a reader (``load_df``) with a writer
(``save_df``).  Spark formats replace Cascading schemes 1:1 (SURVEY §2.1):

| reference                       | here                                  |
|---------------------------------|---------------------------------------|
| hfs-seqfile (tuple interchange) | ParquetTap (columnar, pushdown-able)  |
| hfs-textline / lfs-textline     | TextLineTap                           |
| hfs-delimited (more-taps)       | CsvTap (delimiter/header/quote/types) |
| hfs-wholefile (more-taps)       | BinaryFileTap                         |
| memory-source-tap               | MemoryTap                             |
| stdout                          | StdoutSink                            |
| cascalog-tap (src+sink pair)    | CascalogTap                           |
| :sinkmode :keep/:update/:replace| mode ignore/append/overwrite          |
| :sink-template (template-tap)   | partition_by= (df.write.partitionBy)  |
| :source-pattern (glob-hfs)      | native glob paths                     |
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Optional

from pyspark.sql import DataFrame, SparkSession

SINKMODES = {  # tap.clj:28-36 sink-mode → Spark SaveMode
    "keep": "ignore",
    "update": "append",
    "replace": "overwrite",
}


@dataclass
class Tap:
    """Base tap: a path + format + options, readable and writable."""

    path: str = ""
    fmt: str = "parquet"
    read_options: dict = field(default_factory=dict)
    write_options: dict = field(default_factory=dict)
    schema: Any = None
    sinkmode: str = "replace"  # tap.clj default :replace semantics
    partition_by: Optional[list] = None  # template-tap (tap.clj:80-86)
    fields: Optional[list] = None  # declared field subset

    def load_df(self, spark: SparkSession) -> DataFrame:
        reader = spark.read.format(self.fmt).options(**self.read_options)
        if self.schema is not None:
            reader = reader.schema(self.schema)
        df = reader.load(self.path)
        if self.fields:
            df = df.select(*self.fields)
        return df

    def load_rows(self) -> tuple[list, list]:
        """``(field names, row tuples)`` WITHOUT Spark — the in-memory
        platform's tap reader (exec_local): pyarrow for parquet/orc,
        pandas for csv/json, plain file reads for text.  Globs and
        Spark-written part-file directories both resolve.  Values come
        back as Python natives with ``None`` for SQL NULLs."""
        import glob as _glob
        import os as _os

        def _files(suffix: str) -> list[str]:
            if _os.path.isdir(self.path):
                out = sorted(
                    _glob.glob(_os.path.join(self.path, f"*{suffix}"))
                    or _glob.glob(_os.path.join(self.path, "part-*")))
            else:
                out = sorted(_glob.glob(self.path)) or [self.path]
            if not out:
                raise FileNotFoundError(
                    f"{type(self).__name__}: nothing at {self.path}")
            return out

        if self.fmt in ("parquet", "orc"):
            import pyarrow.dataset as ds

            table = ds.dataset(self.path, format=self.fmt).to_table()
            names = table.column_names
            if self.fields:
                names = list(self.fields)
                table = table.select(names)
            return names, [tuple(r[c] for c in names)
                           for r in table.to_pylist()]
        if self.fmt == "csv":
            import pandas as pd

            frames = [pd.read_csv(
                f, sep=self.read_options.get("sep", ","),
                header=0 if self.read_options.get("header") == "true"
                else None,
                quotechar=self.read_options.get("quote", '"'))
                for f in _files(".csv")]
            pdf = pd.concat(frames, ignore_index=True)
            if self.fields:
                pdf = pdf[list(self.fields)]
            pdf = pdf.astype(object).where(pdf.notnull(), None)
            return ([str(c) for c in pdf.columns],
                    [tuple(r) for r in pdf.itertuples(index=False,
                                                      name=None)])
        if self.fmt == "text":
            rows = []
            for f in _files(".txt"):
                with open(f, encoding="utf-8") as fh:
                    rows.extend((line.rstrip("\n"),) for line in fh)
            return ["value"], rows
        if self.fmt == "json":
            import pandas as pd

            frames = [pd.read_json(f, lines=True)
                      for f in _files(".json")]
            pdf = pd.concat(frames, ignore_index=True)
            if self.fields:
                pdf = pdf[list(self.fields)]
            pdf = pdf.astype(object).where(pdf.notnull(), None)
            return ([str(c) for c in pdf.columns],
                    [tuple(r) for r in pdf.itertuples(index=False,
                                                      name=None)])
        raise TypeError(f"{type(self).__name__} ({self.fmt}) has no "
                        "Spark-free reader; run on the Spark platform")

    def save_df(self, df: DataFrame) -> None:
        if self.sinkmode == "update_partitions":
            # dynamic partition overwrite: replace ONLY the partitions
            # present in df, keep every other partition untouched — the
            # idempotent daily-incremental writer (re-running a day's job
            # rewrites that day, never appends duplicates and never
            # truncates history).  Extends tap.clj's :keep/:update/
            # :replace triple with the mode a partitioned lake needs.
            if not self.partition_by:
                raise ValueError(
                    "sinkmode='update_partitions' requires partition_by "
                    "(there is no partition unit to overwrite)")
            spark = df.sparkSession
            prev = spark.conf.get(
                "spark.sql.sources.partitionOverwriteMode", "static")
            spark.conf.set(
                "spark.sql.sources.partitionOverwriteMode", "dynamic")
            try:
                (df.write.format(self.fmt)
                 .options(**self.write_options)
                 .mode("overwrite")
                 .partitionBy(*self.partition_by)
                 .save(self.path))
            finally:
                spark.conf.set(
                    "spark.sql.sources.partitionOverwriteMode", prev)
            return
        writer = (df.write.format(self.fmt)
                  .options(**self.write_options)
                  .mode(SINKMODES.get(self.sinkmode, self.sinkmode)))
        if self.partition_by:
            writer = writer.partitionBy(*self.partition_by)
        writer.save(self.path)


@dataclass
class ParquetTap(Tap):
    """The native tuple-interchange format (replaces hfs-seqfile,
    tap.clj:197-223) — columnar, predicate-pushdown-able, splittable."""

    fmt: str = "parquet"


@dataclass
class OrcTap(Tap):
    """ORC source/sink (Spark-native columnar alternative; same pushdown /
    pruning / splittability story as parquet — tap-matrix completion for
    shops standardized on ORC)."""

    fmt: str = "orc"


@dataclass
class JdbcTap(Tap):
    """JDBC source/sink (tap-matrix completion; no reference equivalent —
    Cascading taps were HDFS-only).  Partitioned reads via
    ``partition_column``/``num_partitions`` bounds so a big table scans
    parallel, not through one connection.  Requires the JDBC driver jar on
    the Spark classpath."""

    fmt: str = "jdbc"
    url: str = ""
    table: str = ""
    partition_column: Optional[str] = None
    lower_bound: Optional[int] = None
    upper_bound: Optional[int] = None
    num_partitions: Optional[int] = None

    def _opts(self) -> dict:
        opts = {"url": self.url, "dbtable": self.table,
                **self.read_options}
        if self.partition_column:
            if self.lower_bound is None or self.upper_bound is None:
                raise ValueError(
                    "JdbcTap: partition_column requires lower_bound and "
                    "upper_bound (Spark partitions the scan by range)")
            opts.update(partitionColumn=self.partition_column,
                        lowerBound=str(self.lower_bound),
                        upperBound=str(self.upper_bound),
                        numPartitions=str(self.num_partitions or 8))
        return opts

    def load_df(self, spark: SparkSession) -> DataFrame:
        return spark.read.format("jdbc").options(**self._opts()).load()

    def save_df(self, df: DataFrame) -> None:
        (df.write.format("jdbc")
         .options(url=self.url, dbtable=self.table, **self.write_options)
         .mode(SINKMODES.get(self.sinkmode, self.sinkmode)).save())


@dataclass
class BucketedTap(Tap):
    """Hash-bucketed, bucket-sorted parquet table — the co-located-join
    primitive at scale: two tables bucketed on the same keys with the same
    bucket count sort-merge-join with ZERO exchange (the Spark analog of
    pre-partitioning a CoGroup's inputs).

    Spark's bucketing metadata lives in the catalog, so writes go through
    ``saveAsTable`` with an explicit path; reads resolve the table name.
    """

    table: str = ""
    bucket_by: Optional[list] = None
    n_buckets: int = 32

    def load_df(self, spark: SparkSession) -> DataFrame:
        return spark.table(self.table)

    def save_df(self, df: DataFrame) -> None:
        spark = df.sparkSession
        if self.sinkmode == "replace":
            spark.sql(f"DROP TABLE IF EXISTS {self.table}")
        writer = (df.write.format(self.fmt)
                  .options(**self.write_options)
                  .mode(SINKMODES.get(self.sinkmode, self.sinkmode)))
        if self.path:
            writer = writer.option("path", self.path)
        keys = self.bucket_by or []
        writer.bucketBy(self.n_buckets, *keys).sortBy(*keys) \
              .saveAsTable(self.table)


@dataclass
class RangePartitionedTap(Tap):
    """Range-layout parquet: rows range-partitioned AND sorted on
    ``range_by``, so every output file covers a disjoint key interval and
    its parquet min/max column statistics prune range predicates at the
    row-group level — the sort-key layout lever for time-series / id-range
    scans at 100 TB (the write costs one range exchange; every subsequent
    ``BETWEEN``/``>=`` scan reads only the overlapping files).

    ``n_ranges`` bounds file count; reads are plain parquet reads (the
    layout is self-describing via footer stats, no catalog state)."""

    range_by: Optional[list] = None
    n_ranges: int = 32

    def save_df(self, df: DataFrame) -> None:
        from pyspark.sql import functions as F

        keys = [F.col(k) for k in (self.range_by or [])]
        if not keys:
            raise ValueError("RangePartitionedTap needs range_by columns")
        out = (df.repartitionByRange(self.n_ranges, *keys)
               .sortWithinPartitions(*keys))
        writer = (out.write.format(self.fmt)
                  .options(**self.write_options)
                  .mode(SINKMODES.get(self.sinkmode, self.sinkmode)))
        writer.save(self.path)


@dataclass
class CsvTap(Tap):
    """hfs-delimited analog (more_taps.clj:11-80): delimiter, header,
    quote, per-column types via ``schema`` (the ``:classes`` option).
    Cascading semantics: ``strict`` (arity mismatch throws) or ``safe=False``
    (coercion error throws) → FAILFAST; default → PERMISSIVE (bad values
    become null).  To drop malformed rows instead, pass
    ``read_options={"mode": "DROPMALFORMED"}``."""

    fmt: str = "csv"
    delimiter: str = "\t"
    header: bool = False
    quote: str = '"'
    strict: bool = False
    safe: bool = True

    def __post_init__(self):
        mode = "FAILFAST" if (self.strict or not self.safe) else "PERMISSIVE"
        base = {"sep": self.delimiter, "header": str(self.header).lower(),
                "quote": self.quote, "mode": mode}
        if self.schema is None:
            base["inferSchema"] = "true"
        self.read_options = {**base, **self.read_options}
        self.write_options = {"sep": self.delimiter,
                              "header": str(self.header).lower(),
                              **self.write_options}


@dataclass
class TextLineTap(Tap):
    """text-line scheme (tap.clj:50-57): one `line` column; optional
    compression codec on write."""

    fmt: str = "text"
    compression: Optional[str] = None

    def __post_init__(self):
        if self.compression:
            self.write_options = {"compression": self.compression,
                                  **self.write_options}


@dataclass
class JsonTap(Tap):
    fmt: str = "json"


@dataclass
class BinaryFileTap(Tap):
    """hfs-wholefile analog (more_taps.clj:114-130 + WholeFile.java): one row
    per file with (path, modificationTime, length, content) — the ingestion
    point for multimodal (image/audio/video) corpora."""

    fmt: str = "binaryFile"
    glob: Optional[str] = None

    def load_df(self, spark: SparkSession) -> DataFrame:
        reader = spark.read.format("binaryFile")
        if self.glob:
            reader = reader.option("pathGlobFilter", self.glob)
        return reader.load(self.path)

    def save_df(self, df: DataFrame) -> None:
        raise NotImplementedError("binaryFile is a read-only source")


class MemoryTap:
    """memory-source-tap (tap.clj:230-236): named in-memory tuples."""

    def __init__(self, fields: list[str], rows: list):
        if not rows:
            raise ValueError("can't use an empty collection as a generator")
        self.fields = list(fields)
        self.rows = [tuple(r) if isinstance(r, (list, tuple)) else (r,)
                     for r in rows]

    def load_df(self, spark: SparkSession) -> DataFrame:
        return spark.createDataFrame(self.rows, self.fields)


class StdoutSink:
    """stdout tap (tap.clj:225-228)."""

    def save_df(self, df: DataFrame) -> None:
        df.show(truncate=False)


@dataclass
class CascalogTap:
    """Source+sink pair (tap.clj:20-26).  ``sink`` may be a callable of the
    DataFrame (fn-sink that may transform before writing,
    cascading/platform.clj:320-324)."""

    source: Any = None
    sink: Any = None

    def load_df(self, spark: SparkSession) -> DataFrame:
        s = self.source
        if hasattr(s, "load_df"):
            return s.load_df(spark)
        if isinstance(s, DataFrame):
            return s
        raise TypeError(f"not a source: {s!r}")

    def save_df(self, df: DataFrame) -> None:
        if hasattr(self.sink, "save_df"):
            self.sink.save_df(df)
        elif callable(self.sink):
            self.sink(df)
        else:
            raise TypeError(f"not a sink: {self.sink!r}")


def hfs_tap(path: str, fmt: str = "parquet", sinkmode: str = "replace",
            source_pattern: Optional[str] = None,
            sink_template: Optional[list] = None, **options) -> Tap:
    """hfs-tap analog (tap.clj:104-159): any scheme at a path, with
    ``:sinkmode``, ``:source-pattern`` (glob) and ``:sink-template``
    (partitioned output) options."""
    p = f"{path}/{source_pattern}" if source_pattern else path
    return Tap(path=p, fmt=fmt, sinkmode=sinkmode,
               partition_by=sink_template, read_options=options)


lfs_tap = hfs_tap  # local fs == hadoop fs under Spark's unified FS API

@dataclass
class SequenceFileTap:
    """hfs-wrtseqfile analog (more_taps.clj:83-112): Hadoop SequenceFile of
    Writable key/value pairs — legacy-ingest only (parquet is this engine's
    interchange format, the ``hfs-seqfile`` role).  Round-trips (key, value)
    rows through the RDD sequence-file codecs; at scale the read is
    split-parallel per HDFS block like any Hadoop input."""

    path: str = ""
    key_field: str = "key"
    value_field: str = "value"

    def load_df(self, spark: SparkSession) -> DataFrame:
        rdd = spark.sparkContext.sequenceFile(self.path)
        return spark.createDataFrame(rdd, [self.key_field, self.value_field])

    def save_df(self, df: DataFrame) -> None:
        if len(df.columns) != 2:
            raise ValueError("SequenceFileTap writes (key, value) tuples; "
                             f"got {len(df.columns)} columns")
        df.rdd.map(tuple).saveAsSequenceFile(self.path)


@dataclass
class DecodedTap:
    """Record-decode tap — the lzo-thrift/protobuf family analog
    (cascalog-lzo/src/cascalog/lzo.clj:17-36: compressed lines of
    base64-encoded serialized records).

    Wraps an inner tap (text/binaryFile/...) and applies ``decoder`` —
    a per-record Python fn returning a tuple matching ``schema`` — as an
    Arrow-batched UDF, so decode parallelism follows the scan's splits.
    Undecodable records yield null columns; ``drop_undecodable`` filters
    them (the codec-level trap).  Protobuf corpora with a registered
    descriptor should prefer Spark's native ``from_protobuf`` (JVM-side);
    this tap is the generic fallback for thrift/custom codecs.
    """

    inner: Any = None
    decoder: Any = None
    schema: str = ""           # DDL, e.g. "id bigint, name string"
    record_col: str = "value"  # column of the inner tap holding the record
    drop_undecodable: bool = True

    def load_df(self, spark: SparkSession) -> DataFrame:
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        df = self.inner.load_df(spark) if hasattr(self.inner, "load_df") \
            else self.inner
        out_t = T.StructType.fromDDL(self.schema)
        dec = self.decoder
        n = len(out_t.fields)

        def safe(rec):
            try:
                return tuple(dec(rec))
            except Exception:
                return (None,) * n

        udf = F.udf(safe, out_t, useArrow=True)
        decoded = df.withColumn("__rec", udf(F.col(self.record_col)))
        out = decoded.select(*[F.col("__rec").getField(f.name).alias(f.name)
                               for f in out_t.fields])
        if self.drop_undecodable:
            out = out.na.drop(how="all")
        return out

    def save_df(self, df: DataFrame) -> None:
        raise NotImplementedError("DecodedTap is a read-only source; encode "
                                  "with a map op and write the inner tap")


@dataclass
class FixedWidthTap(Tap):
    """Fixed-width text records — the mainframe/COBOL-era legacy format
    the Hadoop stacks the reference targeted ingest constantly (SURVEY
    §2.1's delimited-tap family, minus the delimiter).  ``columns``
    maps name → (start, length), 0-based character offsets; values are
    trimmed and cast to ``types[name]`` (default string).  Reading is
    one native substring/trim/cast projection over ``spark.read.text``
    — no UDF, whole-stage codegen applies; short lines yield NULLs
    (substring past the end is empty → NULL after trim-to-null).

    Writing pads/truncates each column to its width (rpad+substr) and
    concatenates in offset order — round-trip safe for in-width values.
    Layout contract on the WRITE side: declared fields may leave gaps
    (fillers), which are emitted as spaces so every field lands at its
    declared offset, but may not OVERLAP (two fields claiming the same
    character have no single serialization — ``save_df`` raises).
    Reading tolerates any offsets, including overlapping fields (e.g. a
    composite key read alongside its parts).
    """

    fmt: str = "text"
    columns: Optional[dict] = None   # name -> (start, length)
    types: Optional[dict] = None     # name -> spark type string

    def _spec(self):
        if not self.columns:
            raise ValueError("FixedWidthTap: columns must map "
                             "name -> (start, length)")
        spec = {n: (int(s), int(ln))
                for n, (s, ln) in self.columns.items()}
        for n, (s, ln) in spec.items():
            if s < 0 or ln <= 0:
                raise ValueError(
                    f"FixedWidthTap: field {n!r} needs start >= 0 and "
                    f"length > 0, got (start={s}, length={ln})")
        return spec

    def load_df(self, spark: SparkSession) -> DataFrame:
        from pyspark.sql import functions as F

        spec = self._spec()  # validate before the eager path resolve
        raw = (spark.read.format("text")
               .options(**self.read_options).load(self.path))
        cols = []
        for name, (start, length) in spec.items():
            c = F.trim(F.substring(F.col("value"), start + 1, length))
            c = F.when(c == "", None).otherwise(c)
            typ = (self.types or {}).get(name)
            if typ:
                c = c.cast(typ)
            cols.append(c.alias(name))
        df = raw.select(*cols)
        if self.fields:
            df = df.select(*self.fields)
        return df

    def save_df(self, df: DataFrame) -> None:
        from pyspark.sql import functions as F

        spec = self._spec()
        ordered = sorted(spec.items(), key=lambda kv: kv[1][0])
        parts = []
        pos = 0  # next unwritten character offset
        prev_name = None
        for name, (start, length) in ordered:
            if start < pos:
                raise ValueError(
                    f"FixedWidthTap: field {name!r} at (start={start}, "
                    f"length={length}) overlaps {prev_name!r} — "
                    "overlapping fields cannot be serialized; fix the "
                    "spec")
            if start > pos:  # declared gap -> space filler at the
                parts.append(F.lit(" " * (start - pos)))  # right offset
            s = F.coalesce(F.col(name).cast("string"), F.lit(""))
            parts.append(F.substring(F.rpad(s, length, " "), 1, length))
            pos = start + length
            prev_name = name
        line = F.concat(*parts).alias("value")
        (df.select(line).write.format("text")
         .options(**self.write_options)
         .mode(SINKMODES.get(self.sinkmode, self.sinkmode))
         .save(self.path))
