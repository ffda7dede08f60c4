"""Z-order clustering: interleave correctness, SQL-replica parity, and
the layout property the whole feature exists for (per-file extents are
bounded in EVERY dimension, so min/max stats can prune box predicates).
"""

from __future__ import annotations

import os
import shutil

import duckdb
import pytest
from pyspark.sql import functions as F

from retail_etl_pipeline_spark.functions import zorder as zo

TMP = os.path.join(os.path.dirname(os.path.dirname(__file__)), ".tmp", "zorder")


@pytest.fixture(autouse=True, scope="module")
def _tmpdir():
    shutil.rmtree(TMP, ignore_errors=True)
    os.makedirs(TMP, exist_ok=True)
    yield
    shutil.rmtree(TMP, ignore_errors=True)


def _morton2(x: int, y: int, bits: int) -> int:
    out = 0
    for j in range(bits):
        out |= ((x >> j) & 1) << (2 * j)
        out |= ((y >> j) & 1) << (2 * j + 1)
    return out


def test_zvalue_matches_reference_interleave(spark):
    rows = [(x, y) for x in range(8) for y in range(8)]
    df = spark.createDataFrame(rows, ["x", "y"])
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.select(
            "x", "y", zo.zvalue([F.col("x"), F.col("y")], 3).alias("z")
        ).collect()
    }
    for x, y in rows:
        assert got[(x, y)] == _morton2(x, y, 3), (x, y)


def test_zvalue_sql_replica_parity(spark):
    rows = [(x, y) for x in range(16) for y in range(16)]
    df = spark.createDataFrame(rows, ["x", "y"])
    got = sorted(
        tuple(r)
        for r in df.select(
            "x", "y", zo.zvalue([F.col("x"), F.col("y")], 4).alias("z")
        ).collect()
    )
    con = duckdb.connect()
    want = sorted(
        con.sql(
            "SELECT x, y, "
            + zo.zvalue_sql(["x", "y"], 4)
            + " AS z FROM (SELECT unnest(range(16)) AS x), "
            "(SELECT unnest(range(16)) AS y)"
        ).fetchall()
    )
    assert got == want


def test_zvalue_rejects_bigint_overflow():
    with pytest.raises(ValueError):
        zo.zvalue([F.lit(0), F.lit(0)], 32)


def test_scale_to_bits_clamps_and_spans(spark):
    df = spark.createDataFrame(
        [(-5.0,), (0.0,), (50.0,), (100.0,), (999.0,)], ["v"]
    )
    got = [
        r["s"]
        for r in df.select(
            zo.scale_to_bits(F.col("v"), 0.0, 100.0, 4).alias("s")
        ).collect()
    ]
    assert got == [0, 0, 8, 15, 15]  # clamp below, span, clamp above


def test_zorder_write_bounds_file_extents(spark):
    # 64x64 grid, 16 files: a z-ordered layout must give every file a
    # bounded box in BOTH dims; a linear (x, y) sort would give ~full-range
    # y extents. This is the property parquet min/max pruning consumes.
    n = 64
    df = (
        spark.range(n * n)
        .select(
            (F.col("id") % n).alias("x"),
            (F.col("id") / n).cast("bigint").alias("y"),
        )
    )
    out = os.path.join(TMP, "clustered")
    zo.zorder_write(
        df,
        out,
        dims={"x": F.col("x"), "y": F.col("y")},
        bits=6,
        num_files=16,
    )
    per_file = (
        spark.read.parquet(out)
        .groupBy(F.input_file_name().alias("f"))
        .agg(
            (F.max("x") - F.min("x")).alias("xr"),
            (F.max("y") - F.min("y")).alias("yr"),
        )
        .collect()
    )
    assert len(per_file) >= 8
    # every file's box is far smaller than the full 0..63 extent in BOTH
    # dimensions (a perfect 16-file Morton split gives 16x32 boxes; range
    # partition boundaries from sampling make it approximate)
    for r in per_file:
        assert r["xr"] <= 40, r
        assert r["yr"] <= 40, r
