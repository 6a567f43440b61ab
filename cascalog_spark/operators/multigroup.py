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
