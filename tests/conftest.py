from __future__ import annotations

import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")

SF0001 = "/root/testdata/sf0.001"
SF001 = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from retail_etl_pipeline_spark.session import get_spark

    s = get_spark(app_name="tests", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF0001


@pytest.fixture(scope="session")
def duck():
    """DuckDB connection with the fixture tables registered as views, the
    same way the driver's oracle does (TESTDATA.md)."""
    import duckdb

    from retail_etl_pipeline_spark.schemas import FIXTURE_TABLES

    con = duckdb.connect()
    for t in FIXTURE_TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF0001}/{t}.parquet'"
        )
    yield con
    con.close()
