"""Registry part2: query registrations, in original registry order.

Sections:
- data profiling — per-column health metrics (null rate, distinct count,
- Window analytics / string / JSON / statistics coverage (§2.10 extensions).
- Batch 2: date/scalar functions, set ops, explode, analytic ranks, arrays
- Custom connector (Python DataSource API): the source-extension surface
- UDTF (table function) + SCD2 interval build
- Classic multi-join analytics (TPC-H Q7/Q9 shapes) — join-ordering and

Split from the monolithic registry.py (round 7); the
registration ORDER is load-bearing (the driver correctness
rotation walks QUERIES in insertion order) — append only,
never reorder (tests/test_rotation_guard.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from ..functions.metrics import MONEY_SQL
from ..functions.metrics import MONEY_SUM_SQL
from ..functions.metrics import decimal_sum
from ..functions.metrics import money
from ..functions.metrics import money_sum
from ..functions.weeks import yr_wk_num
from ..operators import dedup as dd
from ..operators import fixtures_adapter as fx
from ..operators import multimodal as mm
from ..operators import retail
from ..sources.synthetic import SYNTHETIC_ORACLE_CTE
from ..sources.synthetic import register_synthetic_source
from ._base import (_register, _m, _ms, _ds, _W_TRANS)  # noqa: F401

# ---------------------------------------------------------------------------
# data profiling — per-column health metrics (null rate, distinct count,
# min/max lengths), the standard pre-training corpus audit
# ---------------------------------------------------------------------------

@_register(
    "documents_profile",
    """
SELECT COUNT(*) AS n_rows,
       CAST(SUM(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS null_text,
       CAST(SUM(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS null_lang,
       COUNT(DISTINCT lang) AS distinct_langs,
       COUNT(DISTINCT source) AS distinct_sources,
       CAST(MIN(length(text)) AS BIGINT) AS min_len,
       CAST(MAX(length(text)) AS BIGINT) AS max_len,
       CAST(MIN(n_chars) AS BIGINT) AS min_chars,
       CAST(MAX(n_chars) AS BIGINT) AS max_chars
FROM documents
""",
)
def documents_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass corpus profile: null rates, cardinalities, length bounds.
    All aggregates combine map-side; distincts expand to grouping-set
    partials internally — still a single job."""
    d = fx._read(spark, sf_dir, "documents")
    return d.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("text").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("null_text"),
        F.sum(F.when(F.col("lang").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("null_lang"),
        F.count_distinct(F.col("lang")).alias("distinct_langs"),
        F.count_distinct(F.col("source")).alias("distinct_sources"),
        F.min(F.length("text")).cast("bigint").alias("min_len"),
        F.max(F.length("text")).cast("bigint").alias("max_len"),
        F.min("n_chars").cast("bigint").alias("min_chars"),
        F.max("n_chars").cast("bigint").alias("max_chars"),
    )


@_register(
    "events_zscore_per_user",
    f"""
WITH {fx.EVENTS_STREAM_CTE.strip()},
stats AS (
  SELECT user_id,
         avg(value) AS mu,
         stddev_pop(value) AS sd
  FROM events_norm
  GROUP BY user_id
)
SELECT e.event_id,
       e.user_id,
       {MONEY_SQL.format(x="CASE WHEN s.sd > 0 THEN (e.value - s.mu) / s.sd ELSE 0.0 END")}
         AS zscore
FROM events_norm e
JOIN stats s ON e.user_id = s.user_id
""",
)
def events_zscore_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas per-user z-scores; the oracle computes
    the same normalization as an aggregate+join. Values rounded to cents
    via the decimal route — pandas and SQL accumulate in different orders."""
    ev = fx.events_stream(spark, sf_dir)
    z = mm.zscore_per_user(ev)
    return z.select("event_id", "user_id", money(F.col("zscore")).alias("zscore"))


# ---------------------------------------------------------------------------
# Window analytics / string / JSON / statistics coverage (§2.10 extensions).
# The reference has no analytic windows beyond W1 (SURVEY.md §2.6) and zero
# string/JSON functions (§2.7 "absent" list); a training-data pipeline needs
# them, so they are first-class oracle-backed operators here.
# ---------------------------------------------------------------------------



_WEEKLY_REV_CTE = f"""
weekly AS (
  SELECT store_key,
         {_W_TRANS} AS yr_wk_num,
         {{ms_amt}} AS wk_rev
  FROM sales
  GROUP BY 1, 2
)""".format(ms_amt=MONEY_SUM_SQL.format(x="sales_amt"))


def _weekly_store_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = fx.sales(spark, sf_dir)
    return s.groupBy(
        "store_key", yr_wk_num("trans_dt").alias("yr_wk_num")
    ).agg(money_sum(F.col("sales_amt")).alias("wk_rev"))


@_register(
    "running_revenue_by_store",
    f"""
WITH {fx.SALES_CTE.strip()},
{_WEEKLY_REV_CTE.strip()}
SELECT store_key,
       yr_wk_num,
       wk_rev,
       CAST(round(SUM(CAST(wk_rev AS DECIMAL(30,6))) OVER (
              PARTITION BY store_key ORDER BY yr_wk_num
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS DOUBLE)
         AS cum_rev
FROM weekly
""",
)
def running_revenue_by_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative weekly revenue per store: running-total frame window.

    The window partitions on store_key, so the cumulative scan is fully
    parallel across stores (no global sort); the inner sum rides DECIMAL so
    both engines accumulate exactly regardless of frame evaluation order.
    """
    weekly = _weekly_store_revenue(spark, sf_dir)
    w = (
        Window.partitionBy("store_key")
        .orderBy("yr_wk_num")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return weekly.withColumn(
        "cum_rev",
        F.round(F.sum(F.col("wk_rev").cast("decimal(30,6)")).over(w), 2).cast(
            "double"
        ),
    )


@_register(
    "wow_revenue_change",
    f"""
WITH {fx.SALES_CTE.strip()},
{_WEEKLY_REV_CTE.strip()}
SELECT store_key,
       yr_wk_num,
       wk_rev,
       {_m("wk_rev - LAG(wk_rev) OVER (PARTITION BY store_key ORDER BY yr_wk_num)")}
         AS wow_delta
FROM weekly
""",
)
def wow_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week revenue delta per store via lag(); NULL on each
    store's first week (no default), matching SQL LAG semantics."""
    weekly = _weekly_store_revenue(spark, sf_dir)
    w = Window.partitionBy("store_key").orderBy("yr_wk_num")
    return weekly.withColumn(
        "wow_delta", money(F.col("wk_rev") - F.lag("wk_rev").over(w))
    )


@_register(
    "top3_parts_per_brand",
    """
SELECT p_brand, p_partkey, p_retailprice, rn
FROM (
  SELECT p_brand, p_partkey, p_retailprice,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY p_brand
           ORDER BY p_retailprice DESC, p_partkey) AS INTEGER) AS rn
  FROM part
) t
WHERE rn <= 3
""",
)
def top3_parts_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k-per-group beyond W1's k=1: row_number rank with a
    deterministic (price DESC, key ASC) tie-break, filter rn <= k.
    Catalyst pushes the rn <= 3 filter into the window as a group limit."""
    p = fx._read(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(
        F.desc("p_retailprice"), F.asc("p_partkey")
    )
    return (
        p.select("p_brand", "p_partkey", "p_retailprice")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
    )


@_register(
    "order_quartiles_by_priority",
    f"""
WITH ranked AS (
  SELECT o_orderpriority, o_totalprice,
         CAST(ntile(4) OVER (
           PARTITION BY o_orderpriority
           ORDER BY o_totalprice, o_orderkey) AS INTEGER) AS quartile
  FROM orders
)
SELECT o_orderpriority,
       quartile,
       COUNT(*) AS n_orders,
       {_ms("o_totalprice")} AS total_value,
       {_m("MIN(o_totalprice)")} AS min_value,
       {_m("MAX(o_totalprice)")} AS max_value
FROM ranked
GROUP BY o_orderpriority, quartile
""",
)
def order_quartiles_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile(4) value-quartiles within each order priority, then per-bucket
    stats. Partitioning by priority keeps the ranking window parallel (a
    global ntile would serialize into one task — see SCALE.md)."""
    o = fx._read(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        "o_totalprice", "o_orderkey"
    )
    return (
        o.select("o_orderpriority", "o_totalprice", "o_orderkey")
        .withColumn("quartile", F.ntile(4).over(w))
        .groupBy("o_orderpriority", "quartile")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            money_sum(F.col("o_totalprice")).alias("total_value"),
            money(F.min("o_totalprice")).alias("min_value"),
            money(F.max("o_totalprice")).alias("max_value"),
        )
    )


@_register(
    "part_name_features",
    """
SELECT p_partkey,
       upper(p_brand) AS brand_uc,
       substr(p_name, 1, 4) AS name_prefix,
       CAST(length(p_name) AS INTEGER) AS name_len,
       concat_ws('|', p_brand, p_type) AS brand_type,
       CASE WHEN p_name LIKE '%red%' THEN 1 ELSE 0 END AS is_red,
       regexp_extract(p_name, '^([a-z]+)', 1) AS first_word
FROM part
""",
)
def part_name_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function surface (absent from the reference, §2.7): case
    mapping, substring, length, concat_ws, LIKE containment, regex capture
    — all JVM-native expressions inside one codegen stage, no UDFs."""
    p = fx._read(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_uc"),
        F.substring("p_name", 1, 4).alias("name_prefix"),
        F.length("p_name").alias("name_len"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.when(F.col("p_name").like("%red%"), 1).otherwise(0).alias("is_red"),
        F.regexp_extract("p_name", "^([a-z]+)", 1).alias("first_word"),
    )


@_register(
    "grouping_sets_brand_type",
    f"""
SELECT p_brand,
       p_type,
       CAST(GROUPING(p_brand) * 2 + GROUPING(p_type) AS INTEGER) AS gid,
       {_ms("l_extendedprice * (1 - l_discount)")} AS revenue,
       COUNT(*) AS n_lines
FROM lineitem
JOIN part ON l_partkey = p_partkey
GROUP BY GROUPING SETS ((p_brand), (p_type), ())
""",
)
def grouping_sets_brand_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (beyond rollup/cube): brand totals, type
    totals, and the grand total in ONE aggregation pass, with an explicit
    bit-composed gid so both engines' grouping() conventions align.
    Runs through spark.sql over registered views (S7/S8 path)."""
    fx._read(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    fx._read(spark, sf_dir, "part").createOrReplaceTempView("part")
    return spark.sql(
        f"""
SELECT p_brand,
       p_type,
       CAST(grouping(p_brand) * 2 + grouping(p_type) AS INT) AS gid,
       {_ms("l_extendedprice * (1 - l_discount)")} AS revenue,
       COUNT(*) AS n_lines
FROM lineitem
JOIN part ON l_partkey = p_partkey
GROUP BY GROUPING SETS ((p_brand), (p_type), ())
"""
    )


@_register(
    "quantity_percentiles",
    f"""
SELECT l_returnflag,
       {_m("quantile_cont(l_quantity, 0.25)")} AS qty_p25,
       {_m("quantile_cont(l_quantity, 0.50)")} AS qty_p50,
       {_m("quantile_cont(l_quantity, 0.75)")} AS qty_p75,
       {_m("quantile_cont(l_extendedprice, 0.50)")} AS price_p50,
       {_m("MIN(l_quantity)")} AS qty_min,
       {_m("MAX(l_quantity)")} AS qty_max
FROM lineitem
GROUP BY l_returnflag
""",
)
def quantity_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact continuous percentiles (linear interpolation) per return flag.
    Spark's `percentile` and DuckDB's `quantile_cont` implement the same
    ANSI interpolation; quantities are integral doubles so interpolated
    values are exact binary fractions — bit-identical across engines."""
    li = fx._read(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        money(F.expr("percentile(l_quantity, 0.25)")).alias("qty_p25"),
        money(F.expr("percentile(l_quantity, 0.50)")).alias("qty_p50"),
        money(F.expr("percentile(l_quantity, 0.75)")).alias("qty_p75"),
        money(F.expr("percentile(l_extendedprice, 0.50)")).alias("price_p50"),
        money(F.min("l_quantity")).alias("qty_min"),
        money(F.max("l_quantity")).alias("qty_max"),
    )


@_register(
    "quantity_approx_percentiles",
    """
SELECT l_returnflag,
       quantile_disc(l_quantity, 0.25) AS qty_p25,
       quantile_disc(l_quantity, 0.50) AS qty_p50,
       quantile_disc(l_quantity, 0.75) AS qty_p75,
       quantile_disc(l_extendedprice, 0.50) AS price_p50
FROM lineitem
GROUP BY l_returnflag
""",
)
def quantity_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based percentiles (approx_percentile, Greenwald-Khanna): the
    100 TB path — a mergeable bounded-memory sketch per group instead of
    the exact percentile's full per-group sort. At the oracle-checked SFs
    the group sizes are below the accuracy parameter, where GK returns the
    exact discrete element (== DuckDB quantile_disc); at production scale
    the same query degrades gracefully to rank-error <= 1/accuracy
    instead of blowing memory."""
    li = fx._read(spark, sf_dir, "lineitem")
    acc = 1_000_000
    return li.groupBy("l_returnflag").agg(
        F.expr(f"approx_percentile(l_quantity, 0.25, {acc})").alias("qty_p25"),
        F.expr(f"approx_percentile(l_quantity, 0.50, {acc})").alias("qty_p50"),
        F.expr(f"approx_percentile(l_quantity, 0.75, {acc})").alias("qty_p75"),
        F.expr(f"approx_percentile(l_extendedprice, 0.50, {acc})").alias(
            "price_p50"
        ),
    )


@_register(
    "acctbal_stats_by_segment",
    f"""
WITH moments AS (
  SELECT c_mktsegment,
         COUNT(*) AS n,
         {_ds("c_acctbal")} AS sx,
         {_ds("c_acctbal * c_acctbal")} AS sxx,
         {_ds("CAST(c_nationkey AS DOUBLE)")} AS sy,
         {_ds("CAST(c_nationkey AS DOUBLE) * CAST(c_nationkey AS DOUBLE)")} AS syy,
         {_ds("c_acctbal * CAST(c_nationkey AS DOUBLE)")} AS sxy
  FROM customer
  GROUP BY c_mktsegment
)
SELECT c_mktsegment,
       n AS n_customers,
       {_m("sx / n")} AS avg_bal,
       {_m("sqrt((sxx - sx * sx / n) / (n - 1))")} AS std_bal,
       {_m("(n * sxy - sx * sy) / NULLIF(sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 0)")}
         AS corr_bal_nation
FROM moments
""",
)
def acctbal_stats_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution stats per market segment via single-pass moment sums
    (n, Σx, Σx², Σxy...) — the distributed-stable formulation: partial
    moments combine map-side and are order-independent in DECIMAL, so
    stddev/corr are bit-identical across engines and cluster sizes
    (a naive stddev_samp/corr call differs in the last ulp per engine)."""
    c = fx._read(spark, sf_dir, "customer")
    x = F.col("c_acctbal")
    y = F.col("c_nationkey").cast("double")
    m = c.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        decimal_sum(x).alias("sx"),
        decimal_sum(x * x).alias("sxx"),
        decimal_sum(y).alias("sy"),
        decimal_sum(y * y).alias("syy"),
        decimal_sum(x * y).alias("sxy"),
    )
    n, sx, sxx = F.col("n"), F.col("sx"), F.col("sxx")
    sy, syy, sxy = F.col("sy"), F.col("syy"), F.col("sxy")
    return m.select(
        "c_mktsegment",
        n.alias("n_customers"),
        money(sx / n).alias("avg_bal"),
        money(F.sqrt((sxx - sx * sx / n) / (n - 1))).alias("std_bal"),
        money(
            (n * sxy - sx * sy)
            / F.nullif(
                F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), F.lit(0.0)
            )
        ).alias("corr_bal_nation"),
    )


@_register(
    "event_props_json",
    f"""
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
         AS sum_k,
       CAST(MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
         AS min_k,
       CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
         AS max_k,
       {_m("CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS DOUBLE) / COUNT(*)")}
         AS avg_k
FROM events
GROUP BY event_type
""",
)
def event_props_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured column surface: parse the events.props JSON payload
    JVM-side (get_json_object — no Python in the path) and aggregate the
    extracted field per event type."""
    ev = fx._read(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    kv = ev.select("event_type", k.alias("k"))
    return kv.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("k").alias("sum_k"),
        F.min("k").alias("min_k"),
        F.max("k").alias("max_k"),
        money(F.sum("k").cast("double") / F.count(F.lit(1))).alias("avg_k"),
    )


# ---------------------------------------------------------------------------
# Batch 2: date/scalar functions, set ops, explode, analytic ranks, arrays
# ---------------------------------------------------------------------------

@_register(
    "order_date_features",
    """
SELECT o_orderkey,
       CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
       last_day(CAST(o_orderdate AS DATE)) AS month_end,
       CAST(o_orderdate + INTERVAL 1 MONTH AS DATE) AS next_month,
       CAST(isodow(o_orderdate) AS INTEGER) AS iso_dow,
       CAST(dayofyear(o_orderdate) AS INTEGER) AS doy,
       CAST(quarter(o_orderdate) AS INTEGER) AS qtr
FROM orders
""",
)
def order_date_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time function surface: truncation, month arithmetic, ISO
    day-of-week, day-of-year, quarter — all JVM-native (O6/O7 family)."""
    o = fx._read(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.date_trunc("month", "o_orderdate").cast("date").alias("month_start"),
        F.last_day(F.col("o_orderdate").cast("date")).alias("month_end"),
        (F.col("o_orderdate") + F.expr("INTERVAL 1 MONTH"))
        .cast("date")
        .alias("next_month"),
        (F.expr("weekday(o_orderdate)") + F.lit(1)).cast("int").alias("iso_dow"),
        F.dayofyear("o_orderdate").cast("int").alias("doy"),
        F.quarter("o_orderdate").cast("int").alias("qtr"),
    )


@_register(
    "priorities_intersect",
    """
SELECT o_orderpriority
FROM orders WHERE o_orderstatus = 'F'
INTERSECT
SELECT o_orderpriority
FROM orders WHERE o_orderstatus = 'O'
""",
)
def priorities_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT set op (absent from the reference, §2.7): priorities that
    occur under both order statuses. Catalyst plans it as a left-semi
    aggregate join — no distinct-then-join by hand."""
    o = fx._read(spark, sf_dir, "orders")
    f = o.where(F.col("o_orderstatus") == "F").select("o_orderpriority")
    p = o.where(F.col("o_orderstatus") == "O").select("o_orderpriority")
    return f.intersect(p)


@_register(
    "priorities_except",
    """
SELECT o_orderpriority
FROM orders WHERE o_orderstatus = 'F'
EXCEPT
SELECT o_orderpriority
FROM orders WHERE o_orderstatus = 'P'
""",
)
def priorities_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT set op: priorities under status F never seen under status P
    (left-anti aggregate join under the hood)."""
    o = fx._read(spark, sf_dir, "orders")
    f = o.where(F.col("o_orderstatus") == "F").select("o_orderpriority")
    p = o.where(F.col("o_orderstatus") == "P").select("o_orderpriority")
    return f.subtract(p)


@_register(
    "part_word_counts",
    """
SELECT word, COUNT(*) AS n
FROM (SELECT unnest(string_split(p_name, ' ')) AS word FROM part)
GROUP BY word
""",
)
def part_word_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral expansion: split each name into words and explode one row
    per word (generator expression — Spark's UNNEST), then count. The
    explode runs inside the scan stage; only the word counts shuffle."""
    p = fx._read(spark, sf_dir, "part")
    return (
        p.select(F.explode(F.split("p_name", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@_register(
    "store_first_last_week",
    f"""
WITH {fx.SALES_CTE.strip()},
{_WEEKLY_REV_CTE.strip()}
SELECT store_key,
       yr_wk_num,
       wk_rev,
       FIRST_VALUE(wk_rev) OVER w AS first_wk_rev,
       LAST_VALUE(wk_rev) OVER w AS last_wk_rev,
       NTH_VALUE(wk_rev, 2) OVER w AS second_wk_rev
FROM weekly
WINDOW w AS (PARTITION BY store_key ORDER BY yr_wk_num
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
""",
)
def store_first_last_week(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value / last_value / nth_value over an unbounded frame —
    every weekly row annotated with its store's first, last, and second
    week revenue (frame-spec coverage beyond W1's ranking window)."""
    weekly = _weekly_store_revenue(spark, sf_dir)
    w = (
        Window.partitionBy("store_key")
        .orderBy("yr_wk_num")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return weekly.select(
        "store_key",
        "yr_wk_num",
        "wk_rev",
        F.first("wk_rev").over(w).alias("first_wk_rev"),
        F.last("wk_rev").over(w).alias("last_wk_rev"),
        F.nth_value("wk_rev", 2).over(w).alias("second_wk_rev"),
    )


@_register(
    "order_price_percentrank",
    f"""
SELECT o_orderkey,
       o_orderpriority,
       {_m("PERCENT_RANK() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice)")}
         AS pr,
       {_m("CUME_DIST() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice)")}
         AS cd,
       CAST(DENSE_RANK() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice) AS INTEGER)
         AS dr
FROM orders
""",
)
def order_price_percentrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative-rank analytics (percent_rank, cume_dist, dense_rank) per
    priority. Rank functions are tie-stable: equal prices share a rank, so
    no tiebreaker column is needed for determinism."""
    o = fx._read(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice")
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        money(F.percent_rank().over(w)).alias("pr"),
        money(F.cume_dist().over(w)).alias("cd"),
        F.dense_rank().over(w).alias("dr"),
    )


@_register(
    "supplier_scalar_functions",
    f"""
SELECT s_suppkey,
       {_m("coalesce(nullif(s_acctbal, 0.0), -1.0)")} AS bal_or_sentinel,
       {_m("greatest(s_acctbal, 0.0)")} AS bal_floor0,
       {_m("least(s_acctbal, 1000.0)")} AS bal_cap,
       {_m("abs(s_acctbal)")} AS bal_abs,
       CAST(ceil(s_acctbal) AS BIGINT) AS bal_ceil,
       CAST(floor(s_acctbal) AS BIGINT) AS bal_floor,
       CAST(sign(s_acctbal) AS INTEGER) AS bal_sign,
       CAST(s_suppkey % 10 AS BIGINT) AS key_mod
FROM supplier
""",
)
def supplier_scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar/null-handling surface: coalesce, nullif, greatest/least,
    abs/ceil/floor/sign, modulo — single codegen projection."""
    s = fx._read(spark, sf_dir, "supplier")
    bal = F.col("s_acctbal")
    return s.select(
        "s_suppkey",
        money(F.coalesce(F.nullif(bal, F.lit(0.0)), F.lit(-1.0))).alias(
            "bal_or_sentinel"
        ),
        money(F.greatest(bal, F.lit(0.0))).alias("bal_floor0"),
        money(F.least(bal, F.lit(1000.0))).alias("bal_cap"),
        money(F.abs(bal)).alias("bal_abs"),
        F.ceil(bal).cast("bigint").alias("bal_ceil"),
        F.floor(bal).cast("bigint").alias("bal_floor"),
        F.signum(bal).cast("int").alias("bal_sign"),
        (F.col("s_suppkey") % 10).cast("bigint").alias("key_mod"),
    )


@_register(
    "segment_priority_lists",
    """
SELECT c_mktsegment,
       string_agg(DISTINCT o_orderpriority, ',' ORDER BY o_orderpriority)
           AS priorities,
       COUNT(DISTINCT o_orderpriority) AS n_priorities
FROM customer
JOIN orders ON o_custkey = c_custkey
GROUP BY c_mktsegment
""",
)
def segment_priority_lists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-aggregation surface: the distinct priorities per segment,
    built as a sorted set (collect_set is unordered — sort_array makes it
    deterministic) and emitted as a ','-joined STRING rather than a raw
    array<string>: list cells are unhashable to the driver's pandas
    canonicalizer (r2 ``TypeError: unhashable type: 'list'``), and the
    join loses no information because the sort fixes element order."""
    c = fx._read(spark, sf_dir, "customer")
    o = fx._read(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "inner")
        .groupBy("c_mktsegment")
        .agg(
            F.array_join(
                F.sort_array(F.collect_set("o_orderpriority")), ","
            ).alias("priorities"),
            F.count_distinct("o_orderpriority").alias("n_priorities"),
        )
    )


# ---------------------------------------------------------------------------
# Custom connector (Python DataSource API): the source-extension surface
# ---------------------------------------------------------------------------


_SYNTH_ROWS = 20_000


@_register(
    "synthetic_source_rollup",
    f"""
WITH {SYNTHETIC_ORACLE_CTE.format(last=_SYNTH_ROWS - 1).strip()}
SELECT kind,
       user_id,
       COUNT(*) AS n,
       {_ms("value")} AS total_value,
       {_m(_ds("value") + " / COUNT(*)")} AS avg_value
FROM synthetic
GROUP BY kind, user_id
""",
)
def synthetic_source_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rollup over a CUSTOM Python DataSource connector: partitioned
    parallel generation executor-side, aggregated like any other relation.
    The oracle replays the same deterministic generator with DuckDB
    generate_series — proving the connector's contract, not just its
    plumbing. (sf_dir is unused: the source is synthetic by construction.)"""
    register_synthetic_source(spark)
    df = (
        spark.read.format("synthetic_events")
        .option("numRows", _SYNTH_ROWS)
        .option("numPartitions", 8)
        .load()
    )
    return df.groupBy("kind", "user_id").agg(
        F.count(F.lit(1)).alias("n"),
        money_sum(F.col("value")).alias("total_value"),
        money(decimal_sum(F.col("value")) / F.count(F.lit(1))).alias(
            "avg_value"
        ),
    )


# ---------------------------------------------------------------------------
# UDTF (table function) + SCD2 interval build
# ---------------------------------------------------------------------------

@_register(
    "udtf_part_words",
    """
SELECT p_partkey, word, CAST(pos AS INTEGER) AS pos
FROM (
  SELECT p_partkey,
         unnest(string_split(p_name, ' ')) AS word,
         unnest(generate_series(0, length(p_name) - length(replace(p_name, ' ', '')))) AS pos
  FROM part
)
""",
)
def udtf_part_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark 4 table function): one input row -> many output
    rows with per-row Python logic, used LATERALLY from SQL. The work here
    (positional word split) is deliberately also expressible natively —
    the oracle proves the UDTF contract. ``useArrow=True`` moves the
    row exchange to Arrow batches (ArrowEvalPythonUDTF — the per-row
    Python generator remains, but serialization is columnar); the
    repo-wide plan test bans the pickled BatchEvalPython path outright.
    Even Arrow-batched, keep UDTFs off 100 TB hot paths (this one runs
    over the part dim)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="word: string, pos: int", useArrow=True)
    class SplitWords:
        def eval(self, name: str):
            if name is None:
                return
            for i, w in enumerate(name.split(" ")):
                yield w, i

    spark.udtf.register("split_words", SplitWords)
    fx._read(spark, sf_dir, "part").createOrReplaceTempView("part")
    return spark.sql(
        """
        SELECT p.p_partkey, s.word, s.pos
        FROM part p, LATERAL split_words(p.p_name) s
        """
    )


@_register(
    "inventory_scd2_intervals",
    f"""
WITH {fx.INVENTORY_CTE.strip()}
SELECT store_key,
       prod_key,
       cal_dt AS valid_from,
       COALESCE(
         CAST(LEAD(cal_dt) OVER (PARTITION BY store_key, prod_key
                                 ORDER BY cal_dt)
              - INTERVAL 1 DAY AS DATE),
         DATE '9999-12-31') AS valid_to,
       {_m("inventory_on_hand_qty")} AS on_hand_qty
FROM inventory
""",
)
def inventory_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 (slowly-changing-dimension) interval build: point-in-time daily
    snapshots become [valid_from, valid_to] validity ranges via lead() —
    open intervals capped at the sentinel high date. One window per
    (store, prod) partition; the as-of join (events_asof_last_purchase)
    is the read-side companion."""
    inv = fx.inventory(spark, sf_dir)
    w = Window.partitionBy("store_key", "prod_key").orderBy("cal_dt")
    lead_dt = F.lead("cal_dt").over(w)
    return inv.select(
        "store_key",
        "prod_key",
        F.col("cal_dt").alias("valid_from"),
        F.coalesce(
            F.date_sub(lead_dt, 1), F.lit("9999-12-31").cast("date")
        ).alias("valid_to"),
        money(F.col("inventory_on_hand_qty")).alias("on_hand_qty"),
    )


@_register(
    "event_props_variant",
    """
SELECT event_type,
       COUNT(*) AS n_high,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
         AS sum_high_k
FROM events
WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 50
GROUP BY event_type
""",
)
def event_props_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT path (Spark 4): parse the JSON payload once into the binary
    variant encoding, then typed variant_get extraction — the schema-on-read
    form that scales past get_json_object when many fields are pulled from
    one payload (single parse, not one per field)."""
    ev = fx._read(spark, sf_dir, "events")
    k = F.expr("variant_get(parse_json(props), '$.k', 'bigint')")
    return (
        ev.select("event_type", k.alias("k"))
        .where(F.col("k") > 50)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_high"),
            F.sum("k").alias("sum_high_k"),
        )
    )


# ---------------------------------------------------------------------------
# Classic multi-join analytics (TPC-H Q7/Q9 shapes) — join-ordering and
# broadcast-planning exercise over the full star schema
# ---------------------------------------------------------------------------

@_register(
    "nation_trade_volume",
    f"""
SELECT n1.n_name AS supp_nation,
       n2.n_name AS cust_nation,
       CAST(year(l.l_shipdate) AS INTEGER) AS yr,
       {_ms("l.l_extendedprice * (1 - l.l_discount)")} AS revenue,
       COUNT(*) AS n_lines
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
WHERE n1.n_nationkey <> n2.n_nationkey
GROUP BY n1.n_name, n2.n_name, year(l.l_shipdate)
""",
)
def nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-nation trade volume (TPC-H Q7 shape): fact joined through
    orders->customer and supplier, nation dim broadcast on BOTH sides
    (aliased twice), filtered to cross-border pairs.

    Only the bounded nation dim carries broadcast hints. customer and
    supplier SCALE WITH SF — a forced hint there would override AQE's
    size check and become an executor-OOM at 100 TB. Without hints AQE
    broadcasts them while they fit and degrades to a shuffled join when
    they don't; the only unavoidable big-big join is lineitem ⋈ orders."""
    li = fx._read(spark, sf_dir, "lineitem")
    o = fx._read(spark, sf_dir, "orders")
    c = fx._read(spark, sf_dir, "customer")
    s = fx._read(spark, sf_dir, "supplier")
    n = fx._read(spark, sf_dir, "nation")
    n1 = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    rev = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey, "inner")
        .join(c, o.o_custkey == c.c_custkey, "inner")
        .join(s, li.l_suppkey == s.s_suppkey, "inner")
        .join(F.broadcast(n1), s.s_nationkey == F.col("sn_key"), "inner")
        .join(F.broadcast(n2), c.c_nationkey == F.col("cn_key"), "inner")
        .where(F.col("sn_key") != F.col("cn_key"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("yr"),
        )
        .agg(
            money_sum(rev).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@_register(
    "nation_product_profit",
    f"""
SELECT n_name AS nation,
       CAST(year(l_shipdate) AS INTEGER) AS yr,
       {_ms("l_extendedprice * (1 - l_discount) - p_retailprice * 0.1 * l_quantity")}
         AS profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_name LIKE '%red%'
GROUP BY n_name, year(l_shipdate)
""",
)
def nation_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-line profit per supplier nation and year (TPC-H Q9 shape;
    no partsupp fixture, so unit cost is modeled as 10% of retail price).
    The selective p_name filter prunes part BEFORE any join, so the fact
    join probes a small relation.

    part and supplier scale with SF, so they carry no broadcast hint —
    AQE broadcasts the filtered part while it fits and falls back to a
    shuffled join beyond that; only the bounded nation dim keeps its
    hint."""
    li = fx._read(spark, sf_dir, "lineitem")
    p = fx._read(spark, sf_dir, "part").where(F.col("p_name").like("%red%"))
    s = fx._read(spark, sf_dir, "supplier")
    n = fx._read(spark, sf_dir, "nation")
    profit = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")) - F.col(
        "p_retailprice"
    ) * F.lit(0.1) * F.col("l_quantity")
    return (
        li.join(p, li.l_partkey == p.p_partkey, "inner")
        .join(s, li.l_suppkey == s.s_suppkey, "inner")
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey, "inner")
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("l_shipdate").cast("int").alias("yr"),
        )
        .agg(money_sum(profit).alias("profit"))
    )


@_register("neardup_components", dd.NEARDUP_COMPONENTS_SQL)
def neardup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clusters: connected components (min-label propagation) over
    the verified LSH pair graph — the keep-one-per-cluster step of a
    training-data dedup pipeline. The DuckDB oracle computes the same
    components with a recursive transitive-closure CTE."""
    return dd.neardup_components(fx._read(spark, sf_dir, "documents"))


def _quality_score_sql() -> str:
    from ..operators import text as _tx

    return _tx.QUALITY_SCORE_SQL


@_register(
    "neardup_rate_by_source", dd.neardup_rate_by_source_sql(_quality_score_sql())
)
def neardup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source dedup health: docs / clustered / dropped counts and the
    exact-ppm drop rate per ingestion source (operators/dedup.
    neardup_rate_by_source) — the table a corpus pipeline watches to
    catch a feed that started re-crawling itself. Drops are charged to
    the DROPPED member's source (canonical-keep decision), not the
    keeper's."""
    return dd.neardup_rate_by_source(fx._read(spark, sf_dir, "documents"))
