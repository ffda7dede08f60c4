"""functions/ordered.py: the two-level global rank / NTILE / running-sum
operators must be bit-identical to their single-task global-window
equivalents on every size and tie pattern — they exist so no query ever
needs an empty-partitionBy window (VERDICT r2 #4)."""

from __future__ import annotations

from decimal import Decimal

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from retail_etl_pipeline_spark.functions.ordered import (
    ntile_from_rank,
    with_global_rank,
    with_running_sum,
)


def _frame(spark, n, ties=False):
    """n rows, unique id, value column with ties when requested."""
    rows = [(i, (i // 3) if ties else (n - i)) for i in range(n)]
    return spark.createDataFrame(rows, "id long, v long")


@pytest.mark.parametrize("n", [0, 1, 3, 4, 5, 17, 100])
@pytest.mark.parametrize("ties", [False, True])
def test_global_rank_matches_row_number(spark, n, ties):
    df = _frame(spark, n, ties)
    order = [F.desc("v"), F.asc("id")]
    ranked, total = with_global_rank(df, order, rank_col="rk", num_partitions=4)
    assert total == n
    expect = df.withColumn(
        "rk_win", F.row_number().over(Window.partitionBy().orderBy(*order))
    )
    got = {r["id"]: r["rk"] for r in ranked.collect()}
    want = {r["id"]: r["rk_win"] for r in expect.collect()}
    assert got == want


@pytest.mark.parametrize("n", [1, 2, 3, 4, 5, 7, 8, 10, 11, 100])
@pytest.mark.parametrize("buckets", [2, 4])
def test_ntile_from_rank_matches_sql_ntile(spark, n, buckets):
    """Exact NTILE reproduction including the uneven-bucket boundary
    (first n%buckets buckets get one extra row)."""
    df = _frame(spark, n)
    order = [F.desc("v"), F.asc("id")]
    ranked, total = with_global_rank(df, order, rank_col="rk", num_partitions=3)
    got = {
        r["id"]: r["b"]
        for r in ranked.select(
            "id", ntile_from_rank("rk", total, buckets).alias("b")
        ).collect()
    }
    want = {
        r["id"]: r["b"]
        for r in df.select(
            "id",
            F.ntile(buckets)
            .over(Window.partitionBy().orderBy(*order))
            .alias("b"),
        ).collect()
    }
    assert got == want


@pytest.mark.parametrize("n", [0, 1, 4, 17, 100])
def test_running_sum_matches_window_cumsum(spark, n):
    df = _frame(spark, n).select(
        "id", F.col("v").cast("decimal(30,2)").alias("v")
    )
    order = [F.desc("v"), F.asc("id")]
    d, total = with_running_sum(
        df, order, "v", running_col="run", num_partitions=4
    )
    w = (
        Window.partitionBy()
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want_rows = df.select(
        "id", F.sum("v").over(w).cast("decimal(38,2)").alias("run")
    ).collect()
    got = {r["id"]: r["run"] for r in d.collect()}
    want = {r["id"]: r["run"] for r in want_rows}
    assert got == want
    # the grand total is the final running value (0 for an empty frame)
    assert total == max((r["run"] for r in want_rows), default=Decimal(0))


def test_running_sum_grand_total_exact(spark):
    df = spark.createDataFrame(
        [(i, Decimal("0.10")) for i in range(100)], "id long, v decimal(30,2)"
    )
    _, total = with_running_sum(
        df, [F.asc("id")], "v", num_partitions=7
    )
    assert total == Decimal("10.00")


def test_global_rank_no_single_task_stage(spark):
    """The produced plan's window is partitioned by the range-partition id
    — never an empty partition spec."""
    df = _frame(spark, 50)
    ranked, _ = with_global_rank(
        df, [F.desc("v"), F.asc("id")], rank_col="rk", num_partitions=4
    )
    opt = ranked._jdf.queryExecution().optimizedPlan().toString()
    for line in opt.splitlines():
        if "Window [" in line:
            assert "_range_pid" in line, line


def test_with_running_sum_rejects_non_decimal(spark):
    import pytest
    from pyspark.sql import functions as F

    from retail_etl_pipeline_spark.functions.ordered import with_running_sum

    df = spark.range(10).select(F.col("id"), (F.col("id") * 1.5).alias("v"))
    with pytest.raises(TypeError, match="DECIMAL"):
        with_running_sum(df, [F.asc("id")], "v")


def test_with_running_sum_rejects_scale_loss(spark):
    import pytest
    from pyspark.sql import functions as F

    from retail_etl_pipeline_spark.functions.ordered import with_running_sum

    df = spark.range(10).select(
        F.col("id"), (F.col("id").cast("decimal(20,6)")).alias("v")
    )
    with pytest.raises(ValueError, match="lose scale"):
        with_running_sum(df, [F.asc("id")], "v", sum_type="decimal(38,2)")
