"""Role-map the driver fixtures onto the retail star schema (FIXTURES.md §B).

The driver provides TPC-H-ish parquet tables; the reference's operators are
defined over a retail star schema (sales/inventory facts + store/product/
calendar dims). This module builds the canonical retail-shaped DataFrames
from the fixtures, deterministically, with an exactly-equivalent DuckDB CTE
for each (kept in ``oracles.py``) so every operator is oracle-checkable.

Mapping (all expressions chosen so float math is bit-deterministic across
engines — integral doubles and exact binary fractions only):

- ``sales``      <- lineitem: trans_dt=date(l_shipdate), store_key=l_suppkey,
                   prod_key=l_partkey, qty=l_quantity,
                   amt=l_extendedprice*(1-l_discount), cost=amt*(1-l_tax)
- ``inventory``  <- daily snapshot derived from lineitem at
                   (cal_dt, store_key, prod_key) grain — unique per key like
                   the reference's inventory table (``Data Ingestion.sql:
                   102-112``); on-hand/on-order scale sum(qty) by exact
                   quarter fractions keyed off prod/store so the low-stock
                   comparison (O3) exercises both branches.
- ``store``      <- supplier ⋈ nation ⋈ region (geo rollup like the store
                   dim's region/country columns)
- ``product``    <- part
- ``calendar``   <- distinct ship dates with ISO week/month/quarter keys
                   (the fixtures ship no calendar table — SURVEY.md §2.9 Q8)
- ``events_inv`` <- events as a second, stream-shaped inventory: many
                   observations per (day, store); used for last-per-group
                   (W1) and flag aggregation (A6-A8) operators.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.weeks import yr_wk_num


def _read(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # Deterministic timestamp semantics even when the caller built its own
    # session (e.g. the driver's smoke/correctness runner): events.ts is
    # parquet TIMESTAMP(NANOS) which Spark 4 only reads via nanosAsLong, and
    # instant->date conversions must be UTC to match the DuckDB oracle.
    # Set once per session (the flag rides the session object) — not on
    # every read call.
    if not getattr(spark, "_retail_fixture_confs_set", False):
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        spark._retail_fixture_confs_set = True
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def event_ts_micros(ev: DataFrame):
    """Microsecond-instant ``ts`` column for the events table, across
    fixture vintages: older generators wrote parquet TIMESTAMP(NANOS)
    (which Spark reads as nano-epoch BIGINT under nanosAsLong — integer
    division, ns values ~1.7e18 overflow a double mantissa), newer ones
    write TIMESTAMP(MICROS) (read as timestamp_ntz). Both normalize to the
    same UTC instant, matching the oracle's
    ``make_timestamp(epoch_ns(ts) // 1000)``."""
    if dict(ev.dtypes)["ts"] == "bigint":
        return F.timestamp_micros(F.expr("ts div 1000"))
    # timestamp_ntz -> instant: session tz is pinned to UTC in _read
    return F.col("ts").cast("timestamp")


def sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sales fact (one row per order line)."""
    li = _read(spark, sf_dir, "lineitem")
    amt = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    return li.select(
        F.col("l_orderkey").alias("trans_id"),
        F.col("l_linenumber").alias("trans_line"),
        F.col("l_partkey").alias("prod_key"),
        F.col("l_suppkey").alias("store_key"),
        F.to_date("l_shipdate").alias("trans_dt"),
        F.col("l_quantity").alias("sales_qty"),
        amt.alias("sales_amt"),
        (amt * (F.lit(1) - F.col("l_tax"))).alias("sales_cost"),
    )


def inventory(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily inventory snapshot, unique per (cal_dt, store_key, prod_key).

    on_hand = sum(qty) * (0.25 + (prod_key % 7) * 0.25)   -- 0.25x .. 1.75x
    on_order = sum(qty) * (0.5 + (store_key % 4) * 0.25)  -- 0.5x .. 1.25x
    out_of_stock_flg = 1 if any line that day had discount >= 0.06

    Quarter fractions are exact in binary and l_quantity is integral, so
    these measures are bit-identical in any engine (oracle-safe).
    """
    li = _read(spark, sf_dir, "lineitem")
    qty = F.sum("l_quantity")
    base = li.select(
        F.to_date("l_shipdate").alias("cal_dt"),
        F.col("l_suppkey").alias("store_key"),
        F.col("l_partkey").alias("prod_key"),
        "l_quantity",
        "l_discount",
    )
    return (
        base.groupBy("cal_dt", "store_key", "prod_key")
        .agg(
            (qty * (F.lit(0.25) + (F.col("prod_key") % 7).cast("double") * 0.25)).alias(
                "inventory_on_hand_qty"
            ),
            (qty * (F.lit(0.5) + (F.col("store_key") % 4).cast("double") * 0.25)).alias(
                "inventory_on_order_qty"
            ),
            F.max(
                F.when(F.col("l_discount") >= 0.06, F.lit(1)).otherwise(F.lit(0))
            )
            .cast("int")
            .alias("out_of_stock_flg"),
        )
    )


def store_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Store dimension with geo rollup: supplier ⋈ nation ⋈ region.

    Both dim joins are broadcast-size by construction (100 suppliers at
    sf0.01; ~10k at 100 TB-scale SFs — still broadcastable)."""
    supp = _read(spark, sf_dir, "supplier")
    nat = _read(spark, sf_dir, "nation")
    reg = _read(spark, sf_dir, "region")
    return (
        supp.join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .select(
            F.col("s_suppkey").alias("store_key"),
            F.col("s_name").alias("store_desc"),
            F.col("n_name").alias("cntry_nm"),
            F.col("r_name").alias("region"),
            F.col("s_acctbal").alias("store_size"),
        )
    )


def product_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product dimension <- part."""
    return _read(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("prod_key"),
        F.col("p_name").alias("prod_name"),
        F.col("p_brand").alias("brand_name"),
        F.col("p_type").alias("category_name"),
        F.col("p_size").alias("prod_size"),
        F.col("p_retailprice").alias("retail_price"),
    )


def calendar_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar dimension derived from distinct ship dates (Q8 fallback)."""
    li = _read(spark, sf_dir, "lineitem")
    d = F.col("cal_dt")
    return (
        li.select(F.to_date("l_shipdate").alias("cal_dt"))
        .distinct()
        .select(
            d,
            yr_wk_num(d).alias("yr_wk_num"),
            F.year(d).cast("int").alias("yr_num"),
            F.weekofyear(d).cast("int").alias("wk_num"),
            F.month(d).cast("int").alias("mnth_num"),
            (F.year(d) * 100 + F.month(d)).cast("int").alias("yr_mnth_num"),
            F.quarter(d).cast("int").alias("qtr_num"),
            (F.year(d) * 10 + F.quarter(d)).cast("int").alias("yr_qtr_num"),
        )
    )


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The raw event stream with a microsecond timestamp (see note on
    TIMESTAMP(NANOS) in :func:`events_inventory`)."""
    ev = _read(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        event_ts_micros(ev).alias("ts"),
        "user_id",
        "event_type",
        "value",
    )


def events_inventory(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-shaped inventory observations from the events table.

    Many observations per (day, store_key) — the natural home for the
    last-per-group end-of-week state operator (W1) and the flag
    aggregations (A6-A8). ``event_id`` is the deterministic tie-breaker for
    same-timestamp observations."""
    ev = _read(spark, sf_dir, "events")
    ts = event_ts_micros(ev)
    return ev.select(
        F.col("event_id"),
        ts.alias("ts"),
        F.to_date(ts).alias("cal_dt"),
        F.col("user_id").alias("store_key"),
        F.col("event_type").alias("prod_key"),
        F.col("value").alias("inventory_on_hand_qty"),
        F.length("props").cast("double").alias("inventory_on_order_qty"),
        F.when(F.col("value") < 50, F.lit(1)).otherwise(F.lit(0)).cast("int").alias(
            "out_of_stock_flg"
        ),
        F.when(F.col("value") < 100, F.lit(1)).otherwise(F.lit(0)).cast("int").alias(
            "low_stock_flg"
        ),
    )


# ---------------------------------------------------------------------------
# DuckDB CTE fragments — EXACT SQL equivalents of the adapters above.
# Used by oracles.py; every expression must stay in sync with the Spark side.
# ---------------------------------------------------------------------------

SALES_CTE = """
sales AS (
  SELECT l_orderkey AS trans_id,
         l_linenumber AS trans_line,
         l_partkey AS prod_key,
         l_suppkey AS store_key,
         CAST(l_shipdate AS DATE) AS trans_dt,
         l_quantity AS sales_qty,
         l_extendedprice * (1 - l_discount) AS sales_amt,
         l_extendedprice * (1 - l_discount) * (1 - l_tax) AS sales_cost
  FROM lineitem
)"""

INVENTORY_CTE = """
inventory AS (
  SELECT CAST(l_shipdate AS DATE) AS cal_dt,
         l_suppkey AS store_key,
         l_partkey AS prod_key,
         SUM(l_quantity) * (0.25 + CAST(l_partkey % 7 AS DOUBLE) * 0.25)
           AS inventory_on_hand_qty,
         SUM(l_quantity) * (0.5 + CAST(l_suppkey % 4 AS DOUBLE) * 0.25)
           AS inventory_on_order_qty,
         CAST(MAX(CASE WHEN l_discount >= 0.06 THEN 1 ELSE 0 END) AS INTEGER)
           AS out_of_stock_flg
  FROM lineitem
  GROUP BY 1, 2, 3
)"""

STORE_CTE = """
store AS (
  SELECT s_suppkey AS store_key,
         s_name AS store_desc,
         n_name AS cntry_nm,
         r_name AS region,
         s_acctbal AS store_size
  FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
)"""

PRODUCT_CTE = """
product AS (
  SELECT p_partkey AS prod_key,
         p_name AS prod_name,
         p_brand AS brand_name,
         p_type AS category_name,
         p_size AS prod_size,
         p_retailprice AS retail_price
  FROM part
)"""

CALENDAR_CTE = """
calendar AS (
  SELECT cal_dt,
         CAST(isoyear(cal_dt) * 100 + weekofyear(cal_dt) AS INTEGER) AS yr_wk_num,
         CAST(year(cal_dt) AS INTEGER) AS yr_num,
         CAST(weekofyear(cal_dt) AS INTEGER) AS wk_num,
         CAST(month(cal_dt) AS INTEGER) AS mnth_num,
         CAST(year(cal_dt) * 100 + month(cal_dt) AS INTEGER) AS yr_mnth_num,
         CAST(quarter(cal_dt) AS INTEGER) AS qtr_num,
         CAST(year(cal_dt) * 10 + quarter(cal_dt) AS INTEGER) AS yr_qtr_num
  FROM (SELECT DISTINCT CAST(l_shipdate AS DATE) AS cal_dt FROM lineitem)
)"""

EVENTS_STREAM_CTE = """
events_norm AS (
  SELECT event_id,
         make_timestamp(epoch_ns(ts) // 1000) AS ts,
         user_id,
         event_type,
         value
  FROM events
)"""

EVENTS_INV_CTE = """
events_inv AS (
  SELECT event_id,
         make_timestamp(epoch_ns(ts) // 1000) AS ts,
         CAST(make_timestamp(epoch_ns(ts) // 1000) AS DATE) AS cal_dt,
         user_id AS store_key,
         event_type AS prod_key,
         value AS inventory_on_hand_qty,
         CAST(length(props) AS DOUBLE) AS inventory_on_order_qty,
         CAST(CASE WHEN value < 50 THEN 1 ELSE 0 END AS INTEGER) AS out_of_stock_flg,
         CAST(CASE WHEN value < 100 THEN 1 ELSE 0 END AS INTEGER) AS low_stock_flg
  FROM events
)"""
