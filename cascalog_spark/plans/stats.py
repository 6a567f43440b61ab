"""Flow naming + stats — the analog of :name/:stats-fn options and the
dynamic counter API (cascading/stats.clj:17-117, flow.clj:23-94;
``stats/inc!`` from inside ops → Spark accumulators).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Optional

from pyspark.sql import SparkSession


@contextlib.contextmanager
def with_job_conf(spark: SparkSession, conf: dict):
    """Scoped runtime-conf overlay, the with-job-conf analog
    (cascading/conf.clj:114-138): sets each key for the dynamic extent of
    the block and restores the previous value (or unsets) on exit.

    Only session-mutable SQL confs apply (e.g. shuffle.partitions,
    broadcast threshold, AQE toggles) — immutable cluster confs raise, as
    in Spark generally.
    """
    saved: dict[str, Optional[str]] = {}
    for k, v in conf.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, str(v))
    try:
        yield spark
    finally:
        for k, old in saved.items():
            if old is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, old)


def counter(spark: SparkSession, name: str):
    """A named counter usable from inside Python ops (closure-captured),
    mirroring cascalog.cascading.stats/inc! (stats.clj:39-65).

    Example::

        errs = counter(spark, "bad-rows")
        @deffilterfn
        def clean(x):
            ok = x is not None
            if not ok:
                errs.add(1)
            return ok
    """
    acc = spark.sparkContext.accumulator(0)
    acc.name = name  # type: ignore[attr-defined]
    return acc


def observed_stats(df, name: str = "stats", **metrics):
    """Native, zero-cost dynamic stats for pure-Column pipelines — the
    Spark-first face of the counter API: ``counter()`` accumulators only
    tick from inside Python ops, but an all-native flow has none, so this
    attaches aggregate metrics to the DataFrame via ``df.observe`` and
    they are computed DURING the next action (no extra pass, no extra
    shuffle; Datasource-agnostic).

    Returns ``(df, observation)``; read ``observation.get`` after any
    action on the returned frame.

    Example::

        df, obs = observed_stats(df, rows=F.count(F.lit(1)),
                                 null_ids=F.count_if(F.col("id").isNull()))
        sink.save_df(df)
        print(obs.get)   # {'rows': ..., 'null_ids': ...}
    """
    from pyspark.sql import Observation

    if not metrics:
        raise ValueError("observed_stats: pass at least one metric "
                         "(name=aggregate Column)")
    obs = Observation(name)
    cols = [expr.alias(alias) for alias, expr in metrics.items()]
    return df.observe(obs, *cols), obs


def execute_with_stats(spark: SparkSession, query, sink=None,
                       name: Optional[str] = None,
                       stats_fn: Optional[Callable[[dict], None]] = None,
                       counters: Optional[dict] = None) -> dict:
    """?- with :name and :stats-fn semantics (flow.clj:60-94): runs the
    query into the sink, then invokes ``stats_fn`` with a stats map
    {name, duration_sec, successful, counters} — counter values read from
    the supplied accumulators after completion.

    Multi-sink form: pass a list of ``(query, sink)`` pairs as ``query``
    (``sink=None``) — the whole Semigroup-summed flow runs as one timed,
    named action set, exactly the reference's ``(?- sink1 q1 sink2 q2)``
    under one flow name."""
    from ..api import execute

    if name:
        spark.sparkContext.setJobGroup(name, f"cascalog flow {name}")
    t0 = time.perf_counter()
    ok = False
    try:
        if sink is None and isinstance(query, list):
            execute(spark, query)
        else:
            execute(spark, query, sink)
        ok = True
    finally:
        stats = {
            "name": name,
            "duration_sec": round(time.perf_counter() - t0, 3),
            "successful": ok,
            "counters": {k: v.value for k, v in (counters or {}).items()},
        }
        if name:
            spark.sparkContext.setJobGroup("", "")
        if stats_fn:
            stats_fn(stats)
    return stats
