"""SQL entry point (SURVEY.md §3.3): the same engine driven by
``spark.sql`` over catalog-registered tables — the Athena/BI consumption
path of the reference (``README.md:64-78``), served by Spark itself.

The flagship 13-metric weekly summary here is ONE SQL statement compiled by
the same Catalyst pipeline as the DataFrame form; ``test_oracle_parity``
holds it to the same DuckDB oracle, and the planner produces the same
single-aggregation physical plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators import fixtures_adapter as fx

#: Spark-dialect week key (the oracle's DuckDB dialect uses isoyear())
_WEEK_SPARK = (
    "CAST(extract(YEAROFWEEK FROM {d}) * 100 + weekofyear({d}) AS INT)"
)

_MONEY = "CAST(round(CAST({x} AS DECIMAL(30,6)), 2) AS DOUBLE)"
_MONEY_SUM = "CAST(round(SUM(CAST({x} AS DECIMAL(30,6))), 2) AS DOUBLE)"
_DEC_SUM = "CAST(SUM(CAST({x} AS DECIMAL(30,6))) AS DOUBLE)"
_OOS = "COUNT(DISTINCT CASE WHEN out_of_stock_flg = 1 THEN cal_dt END)"

WEEKLY_SUMMARY_SQL = f"""
WITH base AS (
  SELECT l_partkey AS prod_key,
         l_suppkey AS store_key,
         to_date(l_shipdate) AS trans_dt,
         l_quantity AS sales_qty,
         l_extendedprice * (1 - l_discount) AS sales_amt,
         l_extendedprice * (1 - l_discount) * (1 - l_tax) AS sales_cost,
         l_discount AS disc
  FROM lineitem
),
-- the inventory snapshot is derived at the exact join grain, so its
-- columns ride a window over (date, store, prod) instead of a groupBy +
-- self-join: one shuffle total (same plan the DataFrame form builds)
winified AS (
  SELECT prod_key, store_key, trans_dt, trans_dt AS cal_dt,
         sales_qty, sales_amt, sales_cost,
         SUM(sales_qty) OVER w * (0.25 + CAST(prod_key % 7 AS DOUBLE) * 0.25)
           AS inventory_on_hand_qty,
         SUM(sales_qty) OVER w * (0.5 + CAST(store_key % 4 AS DOUBLE) * 0.25)
           AS inventory_on_order_qty,
         CAST(MAX(CASE WHEN disc >= 0.06 THEN 1 ELSE 0 END) OVER w AS INT)
           AS out_of_stock_flg,
         {_WEEK_SPARK.format(d="trans_dt")} AS yr_wk_num
  FROM base
  WINDOW w AS (PARTITION BY trans_dt, store_key, prod_key)
),
merged AS (
  SELECT *,
         CASE WHEN inventory_on_hand_qty < sales_qty THEN 1 ELSE 0 END
           AS low_stock_flg
  FROM winified
)
SELECT yr_wk_num,
       store_key,
       prod_key,
       {_MONEY.format(x="SUM(sales_qty)")} AS total_sales_qty,
       {_MONEY_SUM.format(x="sales_amt")} AS total_sales_amt,
       {_MONEY.format(x=f"{_DEC_SUM.format(x='sales_amt')} / nullif(SUM(sales_qty), 0)")}
         AS avg_sales_amt,
       {_MONEY_SUM.format(x="sales_cost")} AS total_sales_cost,
       {_MONEY.format(x="max_by(inventory_on_hand_qty, cal_dt)")} AS eow_on_hand_qty,
       {_MONEY.format(x="max_by(inventory_on_order_qty, cal_dt)")} AS eow_on_order_qty,
       {_OOS} AS out_of_stock_days,
       {_MONEY.format(x=f"CAST({_OOS} AS DOUBLE) / 7")} AS out_of_stock_rate,
       CAST(SUM(low_stock_flg) AS BIGINT) AS low_stock_count,
       CAST(SUM(CASE WHEN out_of_stock_flg = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS no_stock_instances,
       {_MONEY.format(x=f"CAST({_OOS} AS DOUBLE) / 7 + CAST(SUM(low_stock_flg) AS DOUBLE)")}
         AS total_low_stock_impact,
       {_MONEY.format(x="SUM(CASE WHEN low_stock_flg = 1 THEN sales_qty - inventory_on_hand_qty END)")}
         AS potential_low_stock_impact,
       {_MONEY.format(x="max_by(inventory_on_hand_qty, cal_dt) / nullif(SUM(sales_qty), 0)")}
         AS weeks_supply
FROM merged
GROUP BY yr_wk_num, store_key, prod_key
"""


def weekly_summary_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Register the fixtures and run the flagship summary as one SQL
    statement — S7/S8 + the full metric surface through the SQL parser."""
    fx._read(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(WEEKLY_SUMMARY_SQL)
