"""Explicit schemas for the retail star schema and the driver fixtures.

The reference relies on ``inferSchema=True`` (``Data Transformation.py:34``),
which costs an extra full scan per CSV and is nondeterministic on dirty data;
the authoritative schemas live in the warehouse DDL
(``Snow Flake/Data Ingestion.sql:20-114``). This module transcribes that DDL
into explicit ``StructType``s (SURVEY.md §1.2).

Measures default to ``DoubleType`` to match the reference job's effective
runtime types (inferred doubles); ``measure_type="decimal"`` gives the
DDL-faithful ``DecimalType(38,2)`` variant.
"""

from __future__ import annotations

from pyspark.sql import types as T


def _measure(measure_type: str) -> T.DataType:
    if measure_type == "decimal":
        return T.DecimalType(38, 2)
    return T.DoubleType()


def sales_schema(measure_type: str = "double") -> T.StructType:
    """sales fact — one row per transaction line (``Data Ingestion.sql:48-61``)."""
    m = _measure(measure_type)
    return T.StructType(
        [
            T.StructField("trans_id", T.IntegerType()),
            T.StructField("prod_key", T.IntegerType()),
            T.StructField("store_key", T.IntegerType()),
            T.StructField("trans_dt", T.DateType()),
            T.StructField("trans_time", T.IntegerType()),
            T.StructField("sales_qty", m),
            T.StructField("sales_price", m),
            T.StructField("sales_amt", m),
            T.StructField("discount", m),
            T.StructField("sales_cost", m),
            T.StructField("sales_mgrn", m),
            T.StructField("ship_cost", m),
        ]
    )


def inventory_schema(measure_type: str = "double") -> T.StructType:
    """inventory fact — daily snapshot per store x product (``Data Ingestion.sql:102-112``)."""
    m = _measure(measure_type)
    return T.StructType(
        [
            T.StructField("cal_dt", T.DateType()),
            T.StructField("store_key", T.IntegerType()),
            T.StructField("prod_key", T.IntegerType()),
            T.StructField("inventory_on_hand_qty", m),
            T.StructField("inventory_on_order_qty", m),
            # int 0/1, not boolean: summed arithmetically
            # (``Data Transformation.py:94``)
            T.StructField("out_of_stock_flg", T.IntegerType()),
            T.StructField("waste_qty", m),
            T.StructField("promotion_flg", T.BooleanType()),
            T.StructField("next_delivery_dt", T.DateType()),
        ]
    )


def store_schema() -> T.StructType:
    """store dimension (``Data Ingestion.sql:20-43``)."""
    return T.StructType(
        [
            T.StructField("store_key", T.IntegerType()),
            T.StructField("store_num", T.StringType()),
            T.StructField("store_desc", T.StringType()),
            T.StructField("addr", T.StringType()),
            T.StructField("city", T.StringType()),
            T.StructField("region", T.StringType()),
            T.StructField("cntry_cd", T.StringType()),
            T.StructField("cntry_nm", T.StringType()),
            T.StructField("postal_zip_cd", T.StringType()),
            T.StructField("prov_state_desc", T.StringType()),
            T.StructField("prov_state_cd", T.StringType()),
            T.StructField("store_type_cd", T.StringType()),
            T.StructField("store_type_desc", T.StringType()),
            T.StructField("frnchs_flg", T.BooleanType()),
            T.StructField("store_size", T.DoubleType()),
            T.StructField("market_key", T.IntegerType()),
            T.StructField("market_name", T.StringType()),
            T.StructField("submarket_key", T.IntegerType()),
            T.StructField("submarket_name", T.StringType()),
            T.StructField("latitude", T.DoubleType()),
            T.StructField("longitude", T.DoubleType()),
        ]
    )


def product_schema(measure_type: str = "double") -> T.StructType:
    """product dimension (``Data Ingestion.sql:84-97``)."""
    m = _measure(measure_type)
    return T.StructType(
        [
            T.StructField("prod_key", T.IntegerType()),
            T.StructField("prod_name", T.StringType()),
            T.StructField("vol", m),
            T.StructField("wgt", m),
            T.StructField("brand_name", T.StringType()),
            T.StructField("status_code", T.IntegerType()),
            T.StructField("status_code_name", T.StringType()),
            T.StructField("category_key", T.IntegerType()),
            T.StructField("category_name", T.StringType()),
            T.StructField("subcategory_key", T.IntegerType()),
            T.StructField("subcategory_name", T.StringType()),
        ]
    )


def calendar_schema() -> T.StructType:
    """calendar dimension — week/month/quarter rollup keys (``Data Ingestion.sql:66-79``)."""
    return T.StructType(
        [
            T.StructField("cal_dt", T.DateType(), nullable=False),
            T.StructField("cal_type_desc", T.StringType()),
            T.StructField("day_of_wk_num", T.StringType()),
            T.StructField("day_of_wk_desc", T.StringType()),
            T.StructField("yr_num", T.IntegerType()),
            T.StructField("wk_num", T.IntegerType()),
            T.StructField("yr_wk_num", T.IntegerType()),
            T.StructField("mnth_num", T.IntegerType()),
            T.StructField("yr_mnth_num", T.IntegerType()),
            T.StructField("qtr_num", T.IntegerType()),
            T.StructField("yr_qtr_num", T.IntegerType()),
        ]
    )


RETAIL_SCHEMAS = {
    "sales": sales_schema,
    "inventory": inventory_schema,
    "store": lambda measure_type="double": store_schema(),
    "product": product_schema,
    "calendar": lambda measure_type="double": calendar_schema(),
}

#: The five retail input tables and their readiness-gate file prefix
#: (``Lambda Function.py:17``).
RETAIL_TABLES = ("calendar", "inventory", "product", "sales", "store")

#: Driver fixture tables at /root/testdata/sf*/ (TESTDATA.md).
FIXTURE_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
