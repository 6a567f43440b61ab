import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder
        .master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
        .appName("cascalog_spark_tests")
        .config("spark.sql.shuffle.partitions",
                os.environ.get("CSPARK_TEST_SHUFFLE", "8"))
        .config("spark.sql.adaptive.enabled",
                os.environ.get("CSPARK_TEST_AQE", "true"))
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.codegen.wholeStage",
                os.environ.get("CSPARK_TEST_CODEGEN", "true"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        # default stopTimeout=0 waits FOREVER: a streaming test whose
        # awaitTermination expired under host contention then deadlocks
        # the whole suite inside query.stop() (observed r8: stop joins
        # the execution thread while it sits in a Python foreachBatch
        # callback).  A bounded stop turns that into a catchable error.
        .config("spark.sql.streaming.stopTimeout", "60s")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    yield spark
    spark.stop()


SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
