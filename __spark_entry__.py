"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

The real inventory lives in ``retail_etl_pipeline_spark.registry``; this
module is a thin adapter.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The 13-metric weekly retail summary (reference ``df_final``,
    ``Data Transformation.py:156-175``) as a single aggregation pass.
    """
    from retail_etl_pipeline_spark.plans.weekly_summary import weekly_summary

    return weekly_summary(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from retail_etl_pipeline_spark.registry import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each query (omitted only for
    genuinely non-SQL-expressible ops -> driver does a rows-only check)."""
    from retail_etl_pipeline_spark.registry import ORACLES

    return dict(ORACLES)
