"""Repo-wide representation sweeps (VERDICT r3 item 5).

The driver's correctness compare hashes query output after a
pandas round-trip; two whole classes of red rows in r2/r3 were pure
representation mismatches, not value bugs:

- a DuckDB oracle column typed HUGEINT (``SUM(INTEGER)``, int128 ``//``)
  hashes differently from Spark's BIGINT even when values match
  (``orders_expectations``, r3);
- array/map/struct cells are unhashable / order-fragile in the driver's
  sort+hash, and decimal/binary round-trip differently between engines.

These tests sweep EVERY registered oracle (DuckDB prepare only — no row
is fetched) and EVERY Spark output schema so the classes cannot recur.
"""

from __future__ import annotations

import pytest

from retail_etl_pipeline_spark.registry import ORACLES, QUERIES

# ---------------------------------------------------------------------------
# (a) oracle output types: no HUGEINT / list / struct / map ever reaches
# the driver's hasher from the DuckDB side
# ---------------------------------------------------------------------------

_FORBIDDEN_DUCK = ("HUGEINT", "STRUCT", "MAP(", "UNION(")


def _bad_duck_types(con, sql: str) -> list[str]:
    rel = con.sql(f"SELECT * FROM ({sql}) __sweep__ LIMIT 0")
    bad = []
    for name, typ in zip(rel.columns, rel.types):
        t = str(typ).upper()
        if t.endswith("[]") or any(f in t for f in _FORBIDDEN_DUCK):
            bad.append(f"{name}: {t}")
    return bad


def test_no_oracle_emits_hugeint_or_nested(duck):
    offenders = {}
    for name, sql in ORACLES.items():
        bad = _bad_duck_types(duck, sql)
        if bad:
            offenders[name] = bad
    assert not offenders, (
        "oracle columns with driver-unhashable DuckDB types (wrap in "
        f"CAST(... AS BIGINT) / unnest): {offenders}"
    )


def test_duck_type_sweep_detects_seeded_violation(duck):
    # the detector itself must flag the exact class that caused the r3
    # red row: an un-CAST integer division over a SUM(INTEGER) HUGEINT
    bad = _bad_duck_types(
        duck,
        "SELECT (SUM(r_regionkey) * 1000000) // COUNT(*) AS ppm"
        " FROM region",
    )
    assert bad and "HUGEINT" in bad[0]
    assert _bad_duck_types(duck, "SELECT [1, 2] AS xs")


# ---------------------------------------------------------------------------
# (b) Spark output schemas: no array/map/struct/decimal/binary column in
# any queries() result (the driver pandas round-trips + hashes cells)
# ---------------------------------------------------------------------------


def _bad_spark_fields(schema) -> list[str]:
    from pyspark.sql import types as T

    forbidden = (T.ArrayType, T.MapType, T.StructType, T.BinaryType,
                 T.DecimalType)
    return [
        f"{f.name}: {f.dataType.simpleString()}"
        for f in schema.fields
        if isinstance(f.dataType, forbidden)
    ]


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_schema_is_driver_hashable(spark, sf_dir, name):
    spark.catalog.clearCache()
    df = QUERIES[name](spark, sf_dir)
    bad = _bad_spark_fields(df.schema)
    assert not bad, (
        f"{name} emits driver-unhashable column types {bad}; cast to "
        "bigint/double/string (or join keys back) before returning"
    )


def test_spark_schema_sweep_detects_seeded_violation(spark):
    from pyspark.sql import functions as F

    df = spark.range(1).select(
        F.array(F.lit(1)).alias("xs"),
        F.col("id").cast("decimal(20,2)").alias("d"),
    )
    bad = _bad_spark_fields(df.schema)
    assert len(bad) == 2
