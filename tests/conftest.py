from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    # Deliberately a VANILLA session, mirroring the driver harness (which
    # supplies its own SparkSession with none of the engine's confs):
    # every query must work because load_table/ensure_session_confs applies
    # the runtime-settable confs itself, not because the factory pre-set them.
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName("ex-hivent-spark-tests")
        .master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
