"""cascalog_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of nathanmarz/cascalog.

Datalog-inspired predicate queries over logic variables, compiled to Spark
DataFrames: variable unification drives implicit joins; groundness (``!!x``)
drives outer joins; Catalyst owns all physical planning.

    from cascalog_spark import q, c
    people = [("alice", 28), ("bob", 33)]
    young = q(["?person", "?age"],
              (people, "?person", "?age"),
              (c.lt, "?age", 30))
    young.run(spark)   # → [("alice", 28)]
"""

from . import builtin as c
from .dsl import parse_query
from .api import (Query, Subquery, broadcast_gen, checkpoint_gen, combine,
                  construct, cross_join, defmain, describe_plan, except_gens,
                  execute, first_n, get_out_fields, intersect_gens,
                  lazy_generator, name_vars, num_out_fields, out_names,
                  plan_dot, q, run_many, select_fields, union)
from .exec_local import LocalPlatformUnsupported, run_local
from .predicates import predmacro, predmacro_template
from .ops import (BufferOp, FilterOp, LimitAgg, MapcatOp, MapOp, ParallelAgg,
                  SequentialAgg, column_filter, column_op, defaggregatefn,
                  defbufferfn, deffilterfn, defmapcatfn, defmapfn,
                  defbufferiterfn, defparallelagg, defparallelbuf,
                  defprepfn, filterfn, mapcatfn, mapfn)
from .vars import gen_var, is_ground, is_ungrounding, is_var

__version__ = "0.1.0"

__all__ = [
    "Query", "Subquery", "q", "construct", "c", "parse_query",
    "predmacro", "predmacro_template",
    "combine", "union",
    "execute", "first_n", "run_many",
    "cross_join", "lazy_generator", "broadcast_gen", "intersect_gens",
    "except_gens", "checkpoint_gen", "defmain", "describe_plan",
    "select_fields", "name_vars", "out_names", "get_out_fields",
    "num_out_fields",
    "defmapfn", "defmapcatfn", "deffilterfn", "defaggregatefn",
    "defbufferfn", "defbufferiterfn", "defparallelagg", "defparallelbuf",
    "defprepfn",
    "mapfn", "mapcatfn",
    "filterfn",
    "column_op", "column_filter",
    "MapOp", "MapcatOp", "FilterOp", "ParallelAgg", "SequentialAgg",
    "BufferOp", "LimitAgg",
    "is_var", "is_ungrounding", "is_ground", "gen_var",
]
