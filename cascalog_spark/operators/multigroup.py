"""multigroup — cogroup two generators on a shared key and apply a custom
multibuffer over both branches' tuples per key.

Reference: ``multigroup`` (cascalog-core/src/clj/cascalog/cascading/
operations.clj:550-569) backed by MultiGroupBy.java (195 LoC) +
ClojureMultibuffer.java.  Spark replaces all of that machinery with
``groupBy().cogroup().applyInPandas`` — Arrow-batched, spill-aware, no
custom spillable tuple lists needed.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def multigroup(spark: SparkSession, left, right, group_fields: list[str],
               multibuffer: Callable, schema) -> DataFrame:
    """Cogroup ``left`` and ``right`` (Query/DataFrame/generator) on
    ``group_fields``; ``multibuffer(key_tuple, left_pdf, right_pdf)`` returns
    a pandas.DataFrame matching ``schema`` (DDL string or StructType).

    The multibuffer sees ALL tuples of both branches for a key — the exact
    MultiGroupBy contract — with each branch arriving as a pandas frame.
    """
    ldf = left.to_df(spark) if hasattr(left, "to_df") else left
    rdf = right.to_df(spark) if hasattr(right, "to_df") else right
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)

    def apply_fn(key, lpdf, rpdf):
        return multibuffer(key, lpdf, rpdf)

    return (ldf.groupBy(*group_fields)
            .cogroup(rdf.groupBy(*group_fields))
            .applyInPandas(apply_fn, schema))


def multigroup_n(spark: SparkSession, gens: list, group_fields: list[str],
                 multibuffer: Callable, schema) -> DataFrame:
    """n-way MultiGroupBy (src/java/cascalog/MultiGroupBy.java supports any
    number of pipes; Spark's cogroup is binary, so n branches are tagged,
    unioned, and split back inside one grouped-map pass — a single shuffle,
    same as the reference's one CoGroup).

    ``multibuffer(key_tuple, pdf_0, ..., pdf_{n-1})`` receives one pandas
    frame per branch (that branch's columns only).  Branches may have
    disjoint non-key columns; same-named columns must be type-compatible.
    """
    from pyspark.sql import functions as F

    dfs = [g.to_df(spark) if hasattr(g, "to_df") else g for g in gens]
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    cols_per_branch = [df.columns for df in dfs]
    # the union pads missing columns with nulls, which silently floats
    # integral pandas dtypes; remember which columns to restore per branch
    int_cols_per_branch = [
        [f.name for f in df.schema.fields
         if f.dataType.simpleString() in ("tinyint", "smallint", "int",
                                          "bigint")]
        for df in dfs]
    tagged = [df.withColumn("__branch", F.lit(i))
              for i, df in enumerate(dfs)]
    u = tagged[0]
    for t in tagged[1:]:
        u = u.unionByName(t, allowMissingColumns=True)

    n_branches = len(dfs)

    def apply_fn(key, pdf):
        # closure captures only column lists + count — never the DataFrames
        # (they drag SparkContext into the pickle)
        frames = []
        for i in range(n_branches):
            f = pdf.loc[pdf["__branch"] == i, cols_per_branch[i]]
            ints = [c for c in int_cols_per_branch[i]
                    if c in f.columns and f[c].dtype.kind == "f"]
            if ints:  # nullable Int64 keeps exact integer semantics
                f = f.astype({c: "Int64" for c in ints})
            frames.append(f)
        return multibuffer(key, *frames)

    return u.groupBy(*group_fields).applyInPandas(apply_fn, schema)
