"""Sources and sinks (SURVEY.md §2.1).

Covers the reference's scan/sink surface, Spark-first:

- S1  CSV scan with explicit schema (vs ``inferSchema=True``,
  ``Data Transformation.py:24-34``) — one scan, deterministic types.
- S2  Partitioned parquet sink — drops the reference's ``repartition(1)``
  single-task write and its malformed ``.option("csv")``
  (``Data Transformation.py:181``); partition pruning comes free for readers.
- S4  Bulk CSV -> managed table (``Data Ingestion.sql:7-15``).
- S5  Filtered CSV export (``Data Load.sql:4-41``).
- S7/S8  Catalog registration + SQL over registered tables
  (``Data Transformation.py:105``, ``README.md:64-76``).
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .schemas import FIXTURE_TABLES


# --------------------------------------------------------------------------
# sources
# --------------------------------------------------------------------------

def read_csv(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """S1: CSV scan — header row, comma-delimited, explicit schema.

    Mirrors the warehouse file format (delimiter ',', skip 1 header row —
    ``Data Ingestion.sql:7-10``) without the inference scan.
    """
    return (
        spark.read.schema(schema)
        .option("header", True)
        .option("mode", "PERMISSIVE")
        .csv(path)
    )


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def read_json(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """JSON-lines scan with explicit schema (no inference pass — same
    policy as S1; schema-on-read without the extra scan)."""
    return spark.read.schema(schema).json(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan — columnar alternative sink/source; predicate pushdown and
    column pruning apply as with parquet."""
    return spark.read.orc(path)


def write_orc(
    df: DataFrame,
    path: str,
    partition_by: str | list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    writer = df.write.mode(mode)
    if partition_by:
        cols = [partition_by] if isinstance(partition_by, str) else partition_by
        writer = writer.partitionBy(*cols)
    writer.orc(path)


def load_fixtures(
    spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = FIXTURE_TABLES
) -> dict[str, DataFrame]:
    """Load the driver-generated parquet fixtures (TESTDATA.md)."""
    return {
        name: spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
        for name in tables
    }


def register_tables(
    spark: SparkSession, dfs: dict[str, DataFrame], replace: bool = True
) -> None:
    """S7: register DataFrames as temp views so DataFrame-API and
    ``spark.sql`` queries share one catalog (``Data Transformation.py:105``)."""
    for name, df in dfs.items():
        if replace:
            df.createOrReplaceTempView(name)
        else:
            df.createTempView(name)


def register_fixtures(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    dfs = load_fixtures(spark, sf_dir)
    register_tables(spark, dfs)
    return dfs


# --------------------------------------------------------------------------
# sinks
# --------------------------------------------------------------------------

def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: str | list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """S2: parquet sink, idempotent overwrite, optional partition layout.

    The reference writes one forced file under a ``date={ds}`` prefix
    (``Data Transformation.py:181``); here the run-date partitioning is a
    real ``partitionBy`` column (partition pruning for downstream SQL, C6)
    and write parallelism is left to the upstream plan — no ``repartition(1)``
    choke point.
    """
    writer = df.write.mode(mode)
    if partition_by:
        cols = [partition_by] if isinstance(partition_by, str) else partition_by
        writer = writer.partitionBy(*cols)
    writer.parquet(path)


def write_run_partition(df: DataFrame, path: str, run_date: str) -> None:
    """C6: run-scoped publish — adds a ``date`` column for the run and
    overwrites only that partition (idempotent daily re-runs)."""
    (
        df.withColumn("date", F.lit(run_date).cast("date"))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("date")
        .parquet(path)
    )


def csv_to_table(
    spark: SparkSession, path: str, schema: T.StructType, table: str
) -> None:
    """S4: bulk CSV load into a managed table (COPY INTO analog,
    ``Data Ingestion.sql:7-15,45,63,81,99,114``)."""
    read_csv(spark, path, schema).write.mode("overwrite").saveAsTable(table)


def export_csv(
    df: DataFrame,
    path: str,
    predicate: Column | str | None = None,
    header: bool = True,
    single_file: bool = False,
) -> None:
    """S5: filtered table export to CSV (``Data Load.sql:4-41``).

    ``predicate`` mirrors the ``WHERE dt <= CURRENT_DATE()`` exports (F4).
    ``single_file`` reproduces the reference's ``single=true`` knob — off by
    default (a single output task is a scale anti-pattern).

    The reference also caps each unloaded file at ~103 MiB
    (``Snow Flake/Data Load.sql:7-9`` MAX_FILE_SIZE). Spark's analog is
    ``spark.sql.files.maxRecordsPerFile`` (rows, not bytes) on the writer,
    or sizing output partitions upstream; a byte-exact cap is not
    reproduced here by design — when ``single_file`` is off, output size
    per file is governed by partitioning, which is the scale-correct knob.
    """
    if predicate is not None:
        df = df.filter(predicate)
    if single_file:
        df = df.coalesce(1)
    df.write.mode("overwrite").option("header", header).csv(path)
