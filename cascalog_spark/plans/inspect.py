"""Plan introspection — the 100 TB pre-flight check as a dict, not an
eyeball pass over ``explain()`` output.

``scan_report(df)`` answers the questions that decide whether a plan
survives a 100x scale-up (the same ones tests/test_plan_quality.py
gates for the headline queries): did the filters reach the scans, how
many columns does each scan actually read, how many Exchanges /
broadcast joins / Python boundaries does the plan carry, and is
anything cartesian.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

_SCAN = re.compile(r"FileScan (\w+) (?:\S+)?\[([^\]]*)\]")
_PUSHED = re.compile(r"PushedFilters: \[([^\]]*)\]")
_READSCHEMA = re.compile(r"ReadSchema: struct<([^>]*)>")


def scan_report(df: DataFrame) -> dict:
    """Summarize the physical plan's scale-relevant properties.

    Returns::

        {"scans": [{"format", "columns", "n_columns", "pushed_filters"}],
         "n_exchanges": int,        # shuffles (incl. broadcast exchanges)
         "n_broadcast_joins": int,
         "n_sort_merge_joins": int,
         "n_python": int,           # Arrow/pandas eval boundaries
         "cartesian": bool,         # any CartesianProduct / NestedLoop
         "whole_stage_codegen": int # codegen span count (0 before an
                                    # AQE plan executes — best effort)
        }

    A 2-column projection whose scan reads 16 columns, or a filter query
    with empty ``pushed_filters``, is a plan that wastes IO at scale —
    visible here without reading tree output.
    """
    plan = df._jdf.queryExecution().executedPlan().toString()
    scans = []
    for m in _SCAN.finditer(plan):
        tail = plan[m.end():]
        pushed = _PUSHED.search(tail[:2000])
        rs = _READSCHEMA.search(tail[:4000])
        cols = [c.split(":")[0] for c in rs.group(1).split(",") if c] \
            if rs else []
        scans.append({
            "format": m.group(1),
            "columns": cols,
            "n_columns": len(cols),
            "pushed_filters": [f.strip() for f in
                               pushed.group(1).split(",") if f.strip()]
            if pushed else [],
        })
    return {
        "scans": scans,
        "n_exchanges": plan.count("Exchange "),
        "n_broadcast_joins": plan.count("BroadcastHashJoin"),
        "n_sort_merge_joins": plan.count("SortMergeJoin"),
        "n_python": (plan.count("MapInPandas")
                     + plan.count("FlatMapGroupsInPandas")
                     + plan.count("ArrowEvalPython")
                     + plan.count("BatchEvalPython")),
        "cartesian": ("CartesianProduct" in plan
                      or "BroadcastNestedLoopJoin" in plan),
        "whole_stage_codegen": plan.count("WholeStageCodegen"),
    }
