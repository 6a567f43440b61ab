"""Local replica of the driver's correctness gate: run every queries() entry
AND its oracle_sql() via DuckDB on the same parquet, compare row count +
column names + order-insensitive values.  This is the t2 gate rehearsal."""

import decimal
import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    # default threads = n_cpus (32 here): DuckDB's per-thread buffer
    # allocations sharing a process with the Spark JVM intermittently
    # die with "Failed to allocate block ... (bad allocation)" on the
    # heavy ivfpq oracles (observed r8, plenty of free RAM).  8 threads
    # is reliable and the oracles are seconds either way.
    con.sql("SET threads=8")
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _norm_val(x):
    if isinstance(x, decimal.Decimal):
        return float(x)
    if isinstance(x, float) and math.isnan(x):
        return "NaN"
    return x


def _norm_rows(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm_val(r[i]) for i in order) for r in rows)


QUERIES = sorted(entry_mod.queries().keys())


@pytest.fixture(scope="module")
def spark_results(spark, sf_dir):
    """All queries' Spark legs computed ONCE, 4 in flight (guide §2.6:
    actions are only sequential because the driver calls them
    sequentially — overlapping independent jobs back-fills the
    scheduler and cuts this module's wall clock ~3x).  Failures are
    stored per query and re-raised in the owning test, so -x / failure
    attribution behave exactly as before; values are identical (same
    plans, same collect)."""
    from concurrent.futures import ThreadPoolExecutor

    qs = entry_mod.queries()

    def run(name):
        try:
            sdf = qs[name](spark, sf_dir)
            return name, (sdf.columns, [tuple(r) for r in sdf.collect()])
        except Exception as e:  # re-raised by the owning test
            return name, e

    with ThreadPoolExecutor(max_workers=4) as pool:
        return dict(pool.map(run, QUERIES))


@pytest.mark.parametrize("name", QUERIES)
def test_query_matches_oracle(name, spark, sf_dir, duck, spark_results):
    got = spark_results[name]
    if isinstance(got, Exception):
        raise got
    scols, srows = got

    sql = entry_mod.oracle_sql().get(name)
    if sql is None:
        assert len(srows) >= 0  # rows-only check (driver's weaker gate)
        return
    rel = duck.sql(sql)
    dcols = rel.columns
    drows = rel.fetchall()

    assert sorted(scols) == sorted(dcols), \
        f"{name}: column names differ: spark={scols} duck={dcols}"
    assert len(srows) == len(drows), \
        f"{name}: row counts differ: spark={len(srows)} duck={len(drows)}"
    a = _norm_rows(srows, scols)
    b = _norm_rows(drows, dcols)
    mism = [(x, y) for x, y in zip(a, b) if x != y]
    assert not mism, f"{name}: first value mismatch: {mism[0]}"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
