"""Retail metric operators (SURVEY.md §2.2-§2.7), over canonical frames.

Each function is one operator family from the inventory, implemented
Spark-first over DataFrames shaped like the retail star schema (see
``fixtures_adapter`` for how the driver fixtures are role-mapped in).
Where the reference's as-written behavior diverges from its intent
(SURVEY.md §2.9), the intended semantics are primary and the divergence is
noted on the function.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.metrics import decimal_sum, money, money_sum, safe_div
from ..functions.weeks import yr_wk_num

#: The output grain of every weekly metric (``README.md:47``).
WEEK_GRAIN = ["yr_wk_num", "store_key", "prod_key"]


def add_week(df: DataFrame, date_col: str) -> DataFrame:
    """P4: derive the weekly grouping key from a date column (Q8 fallback
    when no calendar dim is present)."""
    return df.withColumn("yr_wk_num", yr_wk_num(date_col))


def join_calendar(fact: DataFrame, calendar: DataFrame, fact_dt: str) -> DataFrame:
    """J2: fact ⋈ calendar on differently-named date columns
    (``Data Transformation.py:52``). Calendar is tiny -> broadcast."""
    return fact.join(
        F.broadcast(calendar), fact[fact_dt] == calendar["cal_dt"], "inner"
    ).drop(calendar["cal_dt"])


def weekly_sales_agg(sales_with_week: DataFrame) -> DataFrame:
    """A1-A4 + A12: the weekly sales rollup (``Data Transformation.py:62-67``).

    ``avg_sales_amt`` is the ratio-of-sums average selling price (A3) with
    null-on-zero-denominator (Q7), not ``avg()``."""
    return sales_with_week.groupBy(*WEEK_GRAIN).agg(
        money(F.sum("sales_qty")).alias("total_sales_qty"),
        money_sum(F.col("sales_amt")).alias("total_sales_amt"),
        money(safe_div(decimal_sum(F.col("sales_amt")), F.sum("sales_qty"))).alias(
            "avg_sales_amt"
        ),
        money_sum(F.col("sales_cost")).alias("total_sales_cost"),
    )


def eow_snapshot_window(
    inv: DataFrame,
    grain: list[str],
    order_cols: list[str],
    value_cols: dict[str, str],
) -> DataFrame:
    """W1 (window form): last observation per group — row_number() over
    (grain, order desc) then keep row 1 (``Data Transformation.py:71-74,
    79-82``). ``order_cols`` must end in a unique tie-breaker so the result
    is deterministic (SURVEY.md §7 risk b)."""
    w = Window.partitionBy(*grain).orderBy(*[F.desc(c) for c in order_cols])
    picked = inv.withColumn("row_num", F.row_number().over(w)).where(
        F.col("row_num") == 1
    )
    return picked.select(
        *grain, *[F.col(src).alias(dst) for src, dst in value_cols.items()]
    )


def eow_snapshot_maxby(
    inv: DataFrame,
    grain: list[str],
    order_cols: list[str],
    value_cols: dict[str, str],
) -> DataFrame:
    """W1 (single-pass form): ``max_by(value, order)`` inside the groupBy —
    same result as the window form without materializing row numbers; one
    aggregate with partial (map-side) combine instead of a full sort
    within each partition. Preferred at scale.

    A single order column stays a bare column (hash-aggregable →
    HashAggregate); a composite tie-break needs a struct ordering key,
    which demotes the plan to SortAggregate — still partial-combining and
    parallel, just sort-based within each task. Pass one column when the
    ordering is already unique."""
    ordk = (
        F.col(order_cols[0])
        if len(order_cols) == 1
        else F.struct(*[F.col(c) for c in order_cols])
    )
    return inv.groupBy(*grain).agg(
        *[F.max_by(F.col(src), ordk).alias(dst) for src, dst in value_cols.items()]
    )


def low_stock_flag(merged: DataFrame) -> Column:
    """O3: conditional flag — on-hand below the line's sold quantity
    (``Data Transformation.py:100``)."""
    return (
        F.when(F.col("inventory_on_hand_qty") < F.col("sales_qty"), F.lit(1))
        .otherwise(F.lit(0))
        .cast("int")
    )


def out_of_stock_week(events_inv_with_week: DataFrame) -> DataFrame:
    """A6: out-of-stock days ÷ 7 per week (``Data Transformation.py:93-96``).

    Counts *distinct days* flagged out-of-stock (the observation stream may
    carry many rows per day), ÷ 7 for the in-stock-percentage proxy."""
    days = F.count_distinct(
        F.when(F.col("out_of_stock_flg") == 1, F.col("cal_dt"))
    ).cast("double")
    return events_inv_with_week.groupBy("yr_wk_num", "store_key").agg(
        money(days / F.lit(7)).alias("out_of_stock_count")
    )


def no_stock_instances(events_inv_with_week: DataFrame) -> DataFrame:
    """A7 + F2: conditional count — observations flagged out-of-stock
    (``Data Transformation.py:111-112,141-144``). Implemented single-pass as
    ``sum(CASE WHEN ...)`` instead of filter-then-count: no second scan."""
    return events_inv_with_week.groupBy("yr_wk_num", "store_key").agg(
        F.sum(F.when(F.col("out_of_stock_flg") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("no_stock_instances")
    )


def low_stock_count(events_inv_with_week: DataFrame) -> DataFrame:
    """A8, intended semantics (Q4): ``sum(low_stock_flg)`` on the full
    weekly grain — the reference's ``count()`` counted all rows and its
    groupBy dropped the week key (``Data Transformation.py:117``)."""
    return events_inv_with_week.groupBy("yr_wk_num", "store_key").agg(
        F.sum("low_stock_flg").cast("bigint").alias("low_stock_count")
    )


def total_low_stock_impact(events_inv_with_week: DataFrame) -> DataFrame:
    """A9 + J5: post-aggregation arithmetic across two aggregates
    (``Data Transformation.py:121-126``) — computed here in ONE pass over
    the base instead of materializing two relations and re-joining them."""
    oos = F.count_distinct(
        F.when(F.col("out_of_stock_flg") == 1, F.col("cal_dt"))
    ).cast("double") / F.lit(7)
    low = F.sum("low_stock_flg").cast("double")
    return events_inv_with_week.groupBy("yr_wk_num", "store_key").agg(
        money(oos + low).alias("total_low_stock_impact")
    )
