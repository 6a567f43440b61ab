"""Capture .explain("formatted") for bench entries into plans/$SPARK_GRAFT_PLANS_DIR (default r11).

Usage: python tools/capture_plans.py <suffix> [query ...]
  suffix = "before" / "after"; default queries = the bench set.

The plan is captured from the SAME DataFrame the bench times (the
callable's return), in a session configured like bench.py's.  Queries
whose callable has side effects (streaming ingest, merge taps) still
run those side effects — the captured plan is the final read-back,
which is what the bench times end-to-end anyway; the pipeline anatomy
for those lives in PLANS.md.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "plans", os.environ.get("SPARK_GRAFT_PLANS_DIR", "r11"))


def main() -> None:
    suffix = sys.argv[1]
    import bench
    import __spark_entry__ as entry_mod

    names = sys.argv[2:] or bench.BENCH_QUERIES
    os.makedirs(OUT, exist_ok=True)
    spark = bench._session()
    qs = entry_mod.queries()
    for name in names:
        try:
            df = qs[name](spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
        except Exception as e:  # noqa: BLE001
            plan = f"CAPTURE FAILED: {e!r}"
        with open(os.path.join(OUT, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        print(f"{name}: {len(plan)} chars")
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
