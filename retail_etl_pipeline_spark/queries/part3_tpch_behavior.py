"""Registry part3: query registrations, in original registry order.

Sections:
- classic decision-support patterns (TPC-H Q4/Q6/Q8/Q10/Q13/Q14/Q15/Q17/Q18/
- behavior analytics (operators/behavior.py): funnel, cohort retention,
- customer-value analytics: RFM segmentation and Pareto concentration
- multimodal resize / frame-sample (operators/multimodal.py): the 1->1 and
- DDL-faithful decimal mode (schemas.py measure_type="decimal"): the weekly
- skew-salted aggregation (functions/skew.py): the weekly rollup computed

Split from the monolithic registry.py (round 7); the
registration ORDER is load-bearing (the driver correctness
rotation walks QUERIES in insertion order) — append only,
never reorder (tests/test_rotation_guard.py).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import DataFrame
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from ..functions.metrics import DECIMAL_SUM_SQL
from ..functions.metrics import MONEY_SQL
from ..functions.metrics import decimal_sum
from ..functions.metrics import money
from ..functions.metrics import money_sum
from ..functions.metrics import safe_div
from ..functions.weeks import yr_wk_num
from ..operators import behavior as bh
from ..operators import dedup as dd
from ..operators import fixtures_adapter as fx
from ..operators import multimodal as mm
from ..operators import retail
from ..operators import text as tx
from ..plans import weekly_summary as ws
from ._base import (_register, _m, _ms, _W_TRANS)  # noqa: F401
from .part1_retail_flagship import (_OOS_DAYS, _ROLLUP_ORACLE, _with_events_cte)

# ---------------------------------------------------------------------------
# classic decision-support patterns (TPC-H Q4/Q6/Q8/Q10/Q13/Q14/Q15/Q17/Q18/
# Q19/Q22 shapes, adapted to the fixture schema — no partsupp/comment/phone
# columns). These widen SURVEY.md §2.5's relational surface with EXISTS
# semi-joins, correlated aggregates, scalar subqueries, conditional-agg
# ratios, disjunctive pushdown, and anti-join + scalar-threshold filters.
# ---------------------------------------------------------------------------


@_register(
    "forecast_revenue",
    f"""
SELECT {_ms("l_extendedprice * l_discount")} AS revenue
FROM lineitem
WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
  AND CAST(l_shipdate AS DATE) < DATE '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
)
def forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-table filter + one global aggregate (TPC-H Q6 shape): the
    discount-elimination what-if. All three predicates reach the parquet
    scan as pushed filters; the agg is a one-row partial->final combine —
    the cheapest possible distributed plan, no join, one tiny shuffle."""
    li = fx._read(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.to_date("l_shipdate") >= F.lit("1996-01-01").cast("date"))
            & (F.to_date("l_shipdate") < F.lit("1997-01-01").cast("date"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            money_sum(F.col("l_extendedprice") * F.col("l_discount")).alias(
                "revenue"
            )
        )
    )


@_register(
    "order_priority_exists",
    """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE CAST(o.o_orderdate AS DATE) >= DATE '1996-01-01'
  AND CAST(o.o_orderdate AS DATE) < DATE '1996-07-01'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R'
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)
def order_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS-driven priority census (TPC-H Q4 shape): LEFT SEMI join is
    the distributed form of the correlated EXISTS — no row multiplication
    when an order has several returned lines, and only the probe side's
    columns flow. The returnflag filter prunes the build side BEFORE the
    shuffle."""
    o = fx._read(spark, sf_dir, "orders").where(
        (F.to_date("o_orderdate") >= F.lit("1996-01-01").cast("date"))
        & (F.to_date("o_orderdate") < F.lit("1996-07-01").cast("date"))
    )
    li = (
        fx._read(spark, sf_dir, "lineitem")
        .where(F.col("l_returnflag") == "R")
        .select("l_orderkey")
    )
    return (
        o.join(li, o.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


@_register(
    "returned_item_revenue",
    f"""
SELECT c.c_custkey,
       c.c_name,
       {_ms("l.l_extendedprice * (1 - l.l_discount)")} AS revenue,
       c.c_acctbal,
       n.n_name
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE CAST(o.o_orderdate AS DATE) >= DATE '1996-01-01'
  AND CAST(o.o_orderdate AS DATE) < DATE '1996-04-01'
  AND l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
ORDER BY revenue DESC, c.c_custkey ASC
LIMIT 20
""",
)
def returned_item_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 customers by returned-merchandise revenue in a quarter
    (TPC-H Q10 shape). Both selective filters (quarter, returnflag) are
    applied before their joins; nation broadcasts; the final TopK is a
    TakeOrderedAndProject, not a full sort."""
    c = fx._read(spark, sf_dir, "customer")
    o = fx._read(spark, sf_dir, "orders").where(
        (F.to_date("o_orderdate") >= F.lit("1996-01-01").cast("date"))
        & (F.to_date("o_orderdate") < F.lit("1996-04-01").cast("date"))
    )
    li = fx._read(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    n = fx._read(spark, sf_dir, "nation")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            money_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue")
        )
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@_register(
    "customer_order_distribution",
    """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
  FROM customer c
  LEFT JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
) per_cust
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""",
)
def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-count histogram over ALL customers including zeros (TPC-H Q13
    shape): the non-equi part of the ON clause rides the LEFT join (orders
    filtered BEFORE the join, which preserves customers with no surviving
    orders), then two cascaded aggregations — the second one is tiny."""
    c = fx._read(spark, sf_dir, "customer").select("c_custkey")
    o = (
        fx._read(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") != "1-URGENT")
        .select("o_custkey", "o_orderkey")
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@_register(
    "promo_revenue_share",
    f"""
SELECT {MONEY_SQL.format(x="100.0 * "
  + DECIMAL_SUM_SQL.format(x="CASE WHEN p.p_type = 'PROMO' "
    "THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END")
  + " / NULLIF(" + DECIMAL_SUM_SQL.format(
      x="l.l_extendedprice * (1 - l.l_discount)") + ", 0)")}
  AS promo_revenue_pct
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE CAST(l.l_shipdate AS DATE) >= DATE '1996-03-01'
  AND CAST(l.l_shipdate AS DATE) < DATE '1996-04-01'
""",
)
def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Promotion revenue share for one ship-month (TPC-H Q14 shape): a
    conditional-aggregate ratio computed in ONE pass — no second scan or
    self-join for the numerator. Both sums are exact decimals so the
    ratio's last bits match the oracle on any partitioning."""
    li = fx._read(spark, sf_dir, "lineitem").where(
        (F.to_date("l_shipdate") >= F.lit("1996-03-01").cast("date"))
        & (F.to_date("l_shipdate") < F.lit("1996-04-01").cast("date"))
    )
    p = fx._read(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .agg(
            money(
                F.lit(100.0)
                * safe_div(
                    decimal_sum(
                        F.when(F.col("p_type") == "PROMO", rev).otherwise(
                            F.lit(0.0)
                        )
                    ),
                    decimal_sum(rev),
                )
            ).alias("promo_revenue_pct")
        )
    )


@_register(
    "top_supplier",
    f"""
WITH rev AS (
  SELECT l_suppkey,
         {_ms("l_extendedprice * (1 - l_discount)")} AS total_revenue
  FROM lineitem
  WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
    AND CAST(l_shipdate AS DATE) < DATE '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM rev r
JOIN supplier s ON s.s_suppkey = r.l_suppkey
WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM rev)
ORDER BY s.s_suppkey
""",
)
def top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier(s) with the maximum quarterly revenue (TPC-H Q15 shape).
    The scalar-subquery MAX is a broadcast join against a one-row global
    MAX aggregate of the same per-supplier relation: both branches read
    the identical groupBy shuffle, so ``ReuseExchange`` computes lineitem
    and the aggregation ONCE (verified by the plan test), the MAX itself
    is a tree-reduced partial aggregate (never a single-task window —
    the previous empty-``partitionBy`` MAX window moved all suppliers
    into one task), and the broadcast adds no shuffle. Revenue is
    rounded to exact cents BEFORE the equality, so ties are
    engine-stable."""
    li = fx._read(spark, sf_dir, "lineitem").where(
        (F.to_date("l_shipdate") >= F.lit("1996-01-01").cast("date"))
        & (F.to_date("l_shipdate") < F.lit("1996-04-01").cast("date"))
        # explicit, so BOTH branches below carry the identical pushed
        # filter set: the supplier join infers isnotnull(l_suppkey) on its
        # branch only, which would break canonical plan equality and with
        # it the exchange/stage reuse this query's single-scan shape
        # depends on
        & F.col("l_suppkey").isNotNull()
    )
    rev = li.groupBy("l_suppkey").agg(
        money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "total_revenue"
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("_mx"))
    s = fx._read(spark, sf_dir, "supplier")
    return (
        rev.join(F.broadcast(mx), F.col("total_revenue") == F.col("_mx"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@_register(
    "small_qty_revenue",
    f"""
SELECT {_m(DECIMAL_SUM_SQL.format(x="l.l_extendedprice") + " / 7.0")}
  AS avg_yearly
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
JOIN (
  SELECT l_partkey,
         CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS qty_sum,
         COUNT(*) AS cnt
  FROM lineitem
  GROUP BY l_partkey
) pa ON pa.l_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#23'
  AND l.l_quantity * 5.0 * pa.cnt < pa.qty_sum
""",
)
def small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-quantity-order revenue for one brand (TPC-H Q17 shape): the
    correlated per-part AVG becomes a grouped aggregate joined back to the
    fact. The threshold test is the multiply form
    ``5 * qty * cnt < sum(qty)`` — division-free, and with an exact decimal
    sum both engines evaluate the SAME comparison bit-for-bit (a raw
    double AVG's accumulation order is not cross-engine-stable)."""
    li = fx._read(spark, sf_dir, "lineitem")
    p = fx._read(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#23")
    per_part = li.groupBy(F.col("l_partkey").alias("pa_partkey")).agg(
        F.sum(F.col("l_quantity").cast("decimal(30,6)"))
        .cast("double")
        .alias("qty_sum"),
        F.count("*").alias("cnt"),
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(per_part, li.l_partkey == F.col("pa_partkey"))
        .where(
            F.col("l_quantity") * F.lit(5.0) * F.col("cnt") < F.col("qty_sum")
        )
        .agg(
            money(decimal_sum(F.col("l_extendedprice")) / F.lit(7.0)).alias(
                "avg_yearly"
            )
        )
    )


@_register(
    "large_volume_customers",
    """
SELECT c.c_custkey,
       c.c_name,
       o.o_orderkey,
       o.o_totalprice,
       SUM(l.l_quantity) AS total_qty
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
GROUP BY c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
HAVING SUM(l.l_quantity) > 250
ORDER BY o.o_totalprice DESC, o.o_orderkey ASC
LIMIT 20
""",
)
def large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers behind the largest orders (TPC-H Q18 shape): aggregate
    lineitem by order FIRST (map-side combinable, shrinks ~4x), filter with
    HAVING, and only then join the survivors to orders/customer — the join
    probes ~1% of the orders instead of every lineitem row. Quantities are
    integer-valued doubles, so SUM is exact in both engines."""
    li = fx._read(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .where(F.col("total_qty") > 250)
    )
    o = fx._read(spark, sf_dir, "orders")
    c = fx._read(spark, sf_dir, "customer")
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select("c_custkey", "c_name", "o_orderkey", "o_totalprice", "total_qty")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
    )


@_register(
    "disjunctive_revenue",
    f"""
SELECT {_ms("l.l_extendedprice * (1 - l.l_discount)")} AS revenue
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
       AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
       AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 20 AND 30)
""",
)
def disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Disjunction of brand/size/quantity conjuncts (TPC-H Q19 shape).
    Catalyst extracts the common part-side implicant
    (brand IN (...) AND size <= 15) below the join, so the broadcast build
    holds only candidate parts; the mixed-table OR is evaluated once as a
    post-join filter instead of three unioned scans."""
    li = fx._read(spark, sf_dir, "lineitem")
    p = fx._read(spark, sf_dir, "part")
    j = li.join(p, p.p_partkey == li.l_partkey)
    branch = lambda b, smax, qlo, qhi: (  # noqa: E731
        (F.col("p_brand") == b)
        & F.col("p_size").between(1, smax)
        & F.col("l_quantity").between(qlo, qhi)
    )
    return j.where(
        branch("Brand#12", 5, 1, 11)
        | branch("Brand#23", 10, 10, 20)
        | branch("Brand#34", 15, 20, 30)
    ).agg(
        money_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "revenue"
        )
    )


@_register(
    "idle_rich_customers",
    f"""
WITH thr AS (
  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(30,6))) AS DOUBLE)
           / COUNT(*) AS avg_bal
  FROM customer WHERE c_acctbal > 0.0
)
SELECT c.c_mktsegment,
       COUNT(*) AS numcust,
       {_ms("c.c_acctbal")} AS totacctbal
FROM customer c, thr
WHERE c.c_acctbal > thr.avg_bal
  AND NOT EXISTS (
    SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
  )
GROUP BY c.c_mktsegment
ORDER BY c.c_mktsegment
""",
)
def idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Above-average-balance customers who never ordered (TPC-H Q22 shape):
    scalar-subquery threshold -> broadcast 1-row aggregate; NOT EXISTS ->
    LEFT ANTI join on the orders key projection. The average is
    decimal-sum / count so the threshold double is identical in both
    engines regardless of accumulation order."""
    c = fx._read(spark, sf_dir, "customer")
    o = fx._read(spark, sf_dir, "orders").select("o_custkey")
    thr = (
        c.where(F.col("c_acctbal") > 0.0)
        .agg(
            (decimal_sum(F.col("c_acctbal")) / F.count("*")).alias("avg_bal")
        )
    )
    return (
        c.join(F.broadcast(thr), F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("numcust"),
            money_sum(F.col("c_acctbal")).alias("totacctbal"),
        )
        .orderBy("c_mktsegment")
    )


@_register(
    "asia_market_share",
    f"""
SELECT year(CAST(o.o_orderdate AS DATE)) AS yr,
       {MONEY_SQL.format(x="100.0 * "
  + DECIMAL_SUM_SQL.format(x="CASE WHEN sn.n_name = 'NATION_3' "
    "THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END")
  + " / NULLIF(" + DECIMAL_SUM_SQL.format(
      x="l.l_extendedprice * (1 - l.l_discount)") + ", 0)")}
  AS mkt_share_pct
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation cn ON c.c_nationkey = cn.n_nationkey
JOIN region r ON cn.n_regionkey = r.r_regionkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation sn ON s.s_nationkey = sn.n_nationkey
WHERE r.r_name = 'ASIA'
  AND CAST(o.o_orderdate AS DATE) >= DATE '1996-01-01'
  AND CAST(o.o_orderdate AS DATE) < DATE '1998-01-01'
GROUP BY yr
ORDER BY yr
""",
)
def asia_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One nation's share of ASIA-region revenue per year (TPC-H Q8 shape):
    a conditional-aggregate ratio over a 7-table join — numerator selected
    WITH a CASE inside the same aggregation pass, never a second join. All
    dimensions broadcast; only the two facts shuffle."""
    li = fx._read(spark, sf_dir, "lineitem")
    o = fx._read(spark, sf_dir, "orders").where(
        (F.to_date("o_orderdate") >= F.lit("1996-01-01").cast("date"))
        & (F.to_date("o_orderdate") < F.lit("1998-01-01").cast("date"))
    )
    c = fx._read(spark, sf_dir, "customer")
    s = fx._read(spark, sf_dir, "supplier")
    n = fx._read(spark, sf_dir, "nation")
    cn = n.select(
        F.col("n_nationkey").alias("cn_nationkey"),
        F.col("n_regionkey").alias("cn_regionkey"),
    )
    sn = n.select(
        F.col("n_nationkey").alias("sn_nationkey"),
        F.col("n_name").alias("sn_name"),
    )
    r = fx._read(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(cn), c.c_nationkey == F.col("cn_nationkey"))
        .join(F.broadcast(r), F.col("cn_regionkey") == r.r_regionkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), s.s_nationkey == F.col("sn_nationkey"))
        .groupBy(F.year(F.to_date("o_orderdate")).cast("int").alias("yr"))
        .agg(
            money(
                F.lit(100.0)
                * safe_div(
                    decimal_sum(
                        F.when(F.col("sn_name") == "NATION_3", rev).otherwise(
                            F.lit(0.0)
                        )
                    ),
                    decimal_sum(rev),
                )
            ).alias("mkt_share_pct")
        )
        .orderBy("yr")
    )


@_register(
    "volume_shipping_nation_pair",
    f"""
SELECT sn.n_name AS supp_nation,
       cn.n_name AS cust_nation,
       CAST(year(CAST(l.l_shipdate AS DATE)) AS INTEGER) AS l_year,
       {_ms("l.l_extendedprice * (1 - l.l_discount)")} AS revenue
FROM supplier s
JOIN lineitem l ON s.s_suppkey = l.l_suppkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation sn ON s.s_nationkey = sn.n_nationkey
JOIN nation cn ON c.c_nationkey = cn.n_nationkey
WHERE ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
    OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
  AND CAST(l.l_shipdate AS DATE) >= DATE '1995-01-01'
  AND CAST(l.l_shipdate AS DATE) < DATE '1997-01-01'
GROUP BY supp_nation, cust_nation, l_year
""",
)
def volume_shipping_nation_pair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bilateral trade volume between two nations per ship-year (TPC-H
    Q7 shape): the disjunctive nation-pair predicate evaluates after
    both broadcast nation-dim joins (it references both sides), while
    the shipdate range prunes at the lineitem scan. Both directions of
    the pair survive as separate groups."""
    li = fx._read(spark, sf_dir, "lineitem").where(
        (F.to_date("l_shipdate") >= F.lit("1995-01-01").cast("date"))
        & (F.to_date("l_shipdate") < F.lit("1997-01-01").cast("date"))
    )
    o = fx._read(spark, sf_dir, "orders")
    c = fx._read(spark, sf_dir, "customer")
    s = fx._read(spark, sf_dir, "supplier")
    n = fx._read(spark, sf_dir, "nation")
    sn = n.select(
        F.col("n_nationkey").alias("sn_nationkey"),
        F.col("n_name").alias("supp_nation"),
    )
    cn = n.select(
        F.col("n_nationkey").alias("cn_nationkey"),
        F.col("n_name").alias("cust_nation"),
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    pair = (
        (F.col("supp_nation") == "NATION_1")
        & (F.col("cust_nation") == "NATION_2")
    ) | (
        (F.col("supp_nation") == "NATION_2")
        & (F.col("cust_nation") == "NATION_1")
    )
    return (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(sn), s.s_nationkey == F.col("sn_nationkey"))
        .join(F.broadcast(cn), c.c_nationkey == F.col("cn_nationkey"))
        .where(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year(F.to_date("l_shipdate")).cast("int").alias("l_year"),
        )
        .agg(money_sum(rev).alias("revenue"))
    )


@_register(
    "suppliers_sole_blame_late",
    """
SELECT s.s_name AS s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM supplier s
JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
JOIN orders o ON o.o_orderkey = l1.l_orderkey
WHERE o.o_orderstatus = 'F'
  AND CAST(l1.l_shipdate AS DATE) > CAST(o.o_orderdate AS DATE)
      + INTERVAL 90 DAY
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND CAST(l3.l_shipdate AS DATE)
                        > CAST(o.o_orderdate AS DATE) + INTERVAL 90 DAY)
GROUP BY s.s_name
""",
)
def suppliers_sole_blame_late(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers solely to blame for late multi-supplier orders (TPC-H
    Q21 shape, 'late' adapted to shipped >90 days after order date —
    the fixture has no receipt/commit dates). The oracle runs the
    TEXTBOOK correlated EXISTS / NOT EXISTS pair; this plan runs the
    de-correlated aggregate rewrite a distributed engine wants:

      EXISTS(other supplier)          ==  per-order distinct-supplier
                                          count >= 2
      NOT EXISTS(other late supplier) ==  per-order distinct-LATE-
                                          supplier count == 1
                                          (l1 itself is late)

    so the driver's green row proves the de-correlation equivalence.
    Three aggregations/joins co-partitioned on l_orderkey, supplier
    dim broadcast at the end — no correlated per-row re-scan."""
    li = fx._read(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", F.to_date("l_shipdate").alias("sdate")
    )
    o = (
        fx._read(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == "F")
        .select("o_orderkey", F.to_date("o_orderdate").alias("odate"))
    )
    s = fx._read(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    late = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .where(F.col("sdate") > F.date_add(F.col("odate"), 90))
        .select("l_orderkey", "l_suppkey")
    )
    per_order = li.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supps")
    )
    late_supps = late.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_late")
    )
    return (
        late.join(per_order, "l_orderkey")
        .where(F.col("n_supps") >= 2)
        .join(late_supps, "l_orderkey")
        .where(F.col("n_late") == 1)
        .join(F.broadcast(s), late.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("bigint").alias("numwait"))
    )


@_register(
    "shipping_priority_topk",
    f"""
SELECT l.l_orderkey AS l_orderkey,
       {_ms("l.l_extendedprice * (1 - l.l_discount)")} AS revenue,
       CAST(o.o_orderdate AS DATE) AS o_orderdate,
       o.o_orderpriority AS o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND CAST(o.o_orderdate AS DATE) < DATE '1995-06-15'
  AND CAST(l.l_shipdate AS DATE) > DATE '1995-06-15'
GROUP BY l.l_orderkey, CAST(o.o_orderdate AS DATE), o.o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
""",
)
def shipping_priority_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top unshipped-revenue orders for one segment at a cutoff date
    (TPC-H Q3 shape; o_orderpriority stands in for the absent
    o_shippriority): segment filter prunes through the customer join,
    both date filters push to their scans, the per-order aggregate is
    one hash agg, and the top-10 runs as TakeOrderedAndProject on the
    decimal-rounded revenue with an orderkey tie-break (a raw-double
    ordering could select different ties per engine)."""
    c = fx._read(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = fx._read(spark, sf_dir, "orders").where(
        F.to_date("o_orderdate") < F.lit("1995-06-15").cast("date")
    )
    li = fx._read(spark, sf_dir, "lineitem").where(
        F.to_date("l_shipdate") > F.lit("1995-06-15").cast("date")
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy(
            "l_orderkey",
            F.to_date("o_orderdate").alias("o_orderdate"),
            "o_orderpriority",
        )
        .agg(money_sum(rev).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@_register(
    "nation_year_margin",
    f"""
SELECT sn.n_name AS nation,
       CAST(year(CAST(o.o_orderdate AS DATE)) AS INTEGER) AS o_year,
       {_ms("l.l_extendedprice * (1 - l.l_discount) * l.l_tax")} AS margin
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation sn ON sn.n_nationkey = s.s_nationkey
GROUP BY sn.n_name, o_year
""",
)
def nation_year_margin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gross margin by supplier nation and order year (TPC-H Q9 shape;
    the fixture has no partsupp/supplycost, so cost is the engine's own
    sales-cost definition extprice*(1-disc)*(1-tax) — see
    plans/weekly_summary — and margin = revenue - cost collapses
    algebraically to extprice*(1-disc)*tax, computed directly as ONE
    product inside the decimal sum instead of two sums subtracted).
    Facts join on their keys; nation keeps its broadcast hint (25 rows,
    genuinely bounded) while supplier carries none — it scales with SF,
    so AQE decides (the local_supplier_volume broadcast policy); one
    bounded (nation x year) aggregate."""
    li = fx._read(spark, sf_dir, "lineitem")
    o = fx._read(spark, sf_dir, "orders")
    s = fx._read(spark, sf_dir, "supplier")
    n = fx._read(spark, sf_dir, "nation").select(
        "n_nationkey", F.col("n_name").alias("nation")
    )
    margin = (
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * F.col("l_tax")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == F.col("n_nationkey"))
        .groupBy(
            "nation",
            F.year(F.to_date("o_orderdate")).cast("int").alias("o_year"),
        )
        .agg(money_sum(margin).alias("margin"))
    )


# ---------------------------------------------------------------------------
# behavior analytics (operators/behavior.py): funnel, cohort retention,
# transition matrix — batch forms of the event-stream surface
# ---------------------------------------------------------------------------



@_register("funnel_conversion", _with_events_cte(f"WITH {bh.FUNNEL_SQL.strip()}"))
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """view -> click -> purchase funnel by ordered per-user first times."""
    return bh.funnel_conversion(fx.events_stream(spark, sf_dir))


@_register("weekly_cohort_retention", _with_events_cte(f"WITH {bh.COHORT_SQL.strip()}"))
def weekly_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort activity matrix: first-active ISO week x active week."""
    return bh.weekly_cohort_retention(fx.events_stream(spark, sf_dir))


@_register("event_transitions", _with_events_cte(f"WITH {bh.TRANSITIONS_SQL.strip()}"))
def event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition counts between consecutive events."""
    return bh.event_transitions(fx.events_stream(spark, sf_dir))


@_register("simhash_neardup", dd.SIMHASH_NEARDUP_SQL)
def simhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: pigeonhole block join + Hamming verify."""
    return dd.simhash_neardup(fx._read(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# customer-value analytics: RFM segmentation and Pareto concentration
# ---------------------------------------------------------------------------


@_register(
    "rfm_segments",
    """
WITH per AS (
  SELECT o_custkey,
         MAX(CAST(o_orderdate AS DATE)) AS last_dt,
         COUNT(*) AS freq,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE) AS monetary
  FROM orders
  GROUP BY o_custkey
),
q AS (
  SELECT NTILE(4) OVER (ORDER BY last_dt DESC, o_custkey) AS r_q,
         NTILE(4) OVER (ORDER BY freq DESC, o_custkey) AS f_q,
         NTILE(4) OVER (ORDER BY monetary DESC, o_custkey) AS m_q
  FROM per
)
SELECT r_q, f_q, m_q, COUNT(*) AS customers
FROM q
GROUP BY r_q, f_q, m_q
ORDER BY r_q, f_q, m_q
""",
)
def rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: recency/frequency/monetary quartiles per ordering
    customer, counted per segment cell (<= 64 rows out).

    Every NTILE ordering carries a full tie-break (metric, custkey) so
    quartile boundaries are identical across engines and partitionings;
    the monetary sum is exact decimal for the same reason. Each quartile
    assignment is an exact two-level NTILE (``functions/ordered.py``):
    range shuffle + bounded per-partition counts + partition-local
    row_number — an empty-``partitionBy`` NTILE window would move the
    whole per-customer relation (~10^9 rows at 100 TB) into ONE task;
    this plan keeps every stage parallel while producing bit-identical
    buckets. The three rankings re-join on o_custkey (co-partitioned
    equi-joins of the already-aggregated relation)."""
    from ..functions.ordered import ntile_from_rank, with_global_rank

    o = fx._read(spark, sf_dir, "orders")
    per = o.groupBy("o_custkey").agg(
        F.max(F.to_date("o_orderdate")).alias("last_dt"),
        F.count("*").alias("freq"),
        F.sum(F.col("o_totalprice").cast("decimal(30,2)"))
        .cast("double")
        .alias("monetary"),
    )
    dims = {
        "r_q": [F.desc("last_dt"), F.asc("o_custkey")],
        "f_q": [F.desc("freq"), F.asc("o_custkey")],
        "m_q": [F.desc("monetary"), F.asc("o_custkey")],
    }
    q = None
    for bucket_col, order in dims.items():
        ranked, n = with_global_rank(per, order, rank_col="_rk")
        buckets = ranked.select(
            "o_custkey", ntile_from_rank("_rk", n, 4).alias(bucket_col)
        )
        q = buckets if q is None else q.join(buckets, "o_custkey")
    return (
        q.groupBy("r_q", "f_q", "m_q")
        .agg(F.count("*").alias("customers"))
        .orderBy("r_q", "f_q", "m_q")
    )


@_register(
    "pareto_customers",
    """
WITH per AS (
  SELECT o_custkey,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2))) AS DECIMAL(30,2))
           AS rev
  FROM orders
  GROUP BY o_custkey
),
w AS (
  SELECT rev,
         SUM(rev) OVER (
           ORDER BY rev DESC, o_custkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS running,
         SUM(rev) OVER () AS total
  FROM per
)
SELECT COUNT(*) AS pareto_customers
FROM w
WHERE (running - rev) * 5 < total * 4
""",
)
def pareto_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How many top customers cover 80% of revenue (Pareto concentration).

    The cumulative sum is an exact two-level DECIMAL prefix sum
    (``functions/ordered.py``): range shuffle on (rev DESC, custkey) +
    bounded per-partition partials + partition-local cumulative window —
    the empty-``partitionBy`` running-SUM window it replaces would sort
    the whole per-customer relation in ONE task at cluster scale.
    Decimal partials are exact and associative, so the two-level result
    is bit-identical to a sequential cumsum and to DuckDB's segment
    tree. The 80% boundary test is the multiply form
    ``5 * running_before < 4 * total`` — division-free, exact; the grand
    total is the exact driver-side sum of the same bounded partials. A
    customer is counted iff the threshold wasn't reached before their
    row."""
    from ..functions.ordered import with_running_sum

    o = fx._read(spark, sf_dir, "orders")
    per = o.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(30,2)"))
        .cast("decimal(30,2)")
        .alias("rev")
    )
    w, total = with_running_sum(
        per, [F.desc("rev"), F.asc("o_custkey")], "rev"
    )
    return w.where(
        (F.col("running") - F.col("rev")) * 5
        < F.lit(total).cast("decimal(38,2)") * 4
    ).agg(F.count("*").alias("pareto_customers"))


@_register(
    "orders_data_quality",
    f"""
SELECT COUNT(*) AS n_rows,
       COUNT(DISTINCT o_custkey) AS n_customers,
       COUNT(DISTINCT o_orderstatus) AS n_statuses,
       COUNT(DISTINCT o_orderpriority) AS n_priorities,
       CAST(COUNT(*) FILTER (WHERE o_totalprice IS NULL
                                OR o_totalprice <= 0) AS BIGINT)
         AS bad_totalprice,
       MIN(CAST(o_orderdate AS DATE)) AS min_date,
       MAX(CAST(o_orderdate AS DATE)) AS max_date,
       {MONEY_SQL.format(x="MIN(o_totalprice)")} AS min_price,
       {MONEY_SQL.format(x="MAX(o_totalprice)")} AS max_price
FROM orders
""",
)
def orders_data_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass data-quality profile of the orders feed — the engine
    side of the reference's file-readiness gate (``Lambda Function.py``,
    SURVEY.md §2.8): row volume, key/enum cardinalities, invalid-measure
    count, date coverage, price envelope. Multiple COUNT(DISTINCT)s run
    in one Expand-based aggregate, still one scan of the table."""
    o = fx._read(spark, sf_dir, "orders")
    return o.agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("o_custkey").alias("n_customers"),
        F.countDistinct("o_orderstatus").alias("n_statuses"),
        F.countDistinct("o_orderpriority").alias("n_priorities"),
        F.count(
            F.when(
                F.col("o_totalprice").isNull() | (F.col("o_totalprice") <= 0),
                1,
            )
        ).alias("bad_totalprice"),
        F.min(F.to_date("o_orderdate")).alias("min_date"),
        F.max(F.to_date("o_orderdate")).alias("max_date"),
        money(F.min("o_totalprice")).alias("min_price"),
        money(F.max("o_totalprice")).alias("max_price"),
    )


@_register(
    "corpus_vocabulary",
    f"""
WITH toks AS (
  SELECT doc_id, unnest({{tokens}}) AS tok
  FROM documents
)
SELECT tok,
       CAST(COUNT(*) AS BIGINT) AS term_freq,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS doc_freq
FROM toks
GROUP BY tok
ORDER BY term_freq DESC, tok ASC
LIMIT 1000
""".format(tokens="regexp_split_to_array(trim(text), '\\s+')"),
)
def corpus_vocabulary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary: term and document frequency of the top-1000
    tokens — the build-the-vocab step of a training-data pipeline. One
    explode + one aggregate computing both frequencies in the same pass
    (COUNT + COUNT DISTINCT share the Expand); the top-k is a
    TakeOrderedAndProject with a token tie-break. At 100 TB the aggregate
    key space is the vocabulary (~1e6), a sliver of the token stream —
    partial aggregation collapses almost everything map-side."""
    from ..operators.text import tokens as _tokens

    docs = fx._read(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(_tokens(F.col("text"))).alias("tok")
    )
    return (
        toks.groupBy("tok")
        .agg(
            F.count("*").alias("term_freq"),
            F.countDistinct("doc_id").alias("doc_freq"),
        )
        .orderBy(F.desc("term_freq"), F.asc("tok"))
        .limit(1000)
    )


@_register("tfidf_keywords", tx.TFIDF_SQL)
def tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-5 keywords by TF-IDF (deterministic token
    tie-break); df relation broadcasts, top-k is a per-doc window."""
    return tx.tfidf_keywords(fx._read(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# multimodal resize / frame-sample (operators/multimodal.py): the 1->1 and
# 1->many mapInPandas shapes, oracle-checked via md5-of-hex of the
# deterministic byte kernels (real media decode is the documented stub)
# ---------------------------------------------------------------------------


@_register("multimodal_resize", mm.multimodal_resize_sql())
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size resize over the opaque-binary media column (1 row ->
    1 row, Arrow-batched mapInPandas; kernel = cyclic byte repeat, the
    deterministic stand-in for a real decoder). Output is hashed (md5 of
    uppercase hex) so the comparison rides strings both engines produce
    byte-identically."""
    media = mm.attach_binary(fx._read(spark, sf_dir, "documents"))
    resized = mm.resize_images(media, mm.RESIZE_W, mm.RESIZE_H)
    return resized.select(
        "doc_id",
        "width",
        "height",
        F.md5(F.hex(F.col("pixels"))).alias("pixels_md5"),
    )


@_register("multimodal_frames", mm.multimodal_frames_sql())
def multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over the media column (1 row -> many rows; the
    fan-out happens inside the Arrow batch loop, never driver-side).
    Every 2nd FRAME_BYTES-sized chunk, trailing partial kept."""
    frames = mm.sample_frames(
        mm.attach_binary(fx._read(spark, sf_dir, "documents")), every_n=2
    )
    return frames.select(
        "doc_id",
        "frame_idx",
        F.md5(F.hex(F.col("frame"))).alias("frame_md5"),
    )


# ---------------------------------------------------------------------------
# DDL-faithful decimal mode (schemas.py measure_type="decimal"): the weekly
# rollup with every money measure in the warehouse DDL's DECIMAL(38,2)
# (``Snow Flake/Data Ingestion.sql:48-61``) instead of the reference job's
# effective runtime doubles. Decimal addition is exact and
# order-independent, so the sums are bit-identical on ANY partitioning —
# the property that makes decimal mode the audit-grade path at 100 TB.
# ---------------------------------------------------------------------------


@_register(
    "weekly_sales_rollup_decimal",
    f"""
WITH {fx.SALES_CTE.strip()}
SELECT {_W_TRANS} AS yr_wk_num,
       store_key,
       prod_key,
       CAST(CAST(SUM(CAST(round(CAST(sales_qty AS DECIMAL(30,6)), 2)
                     AS DECIMAL(38,2))) AS DECIMAL(38,2)) AS DOUBLE) AS total_sales_qty,
       CAST(CAST(SUM(CAST(round(CAST(sales_amt AS DECIMAL(30,6)), 2)
                     AS DECIMAL(38,2))) AS DECIMAL(38,2)) AS DOUBLE) AS total_sales_amt,
       CAST(CAST(SUM(CAST(round(CAST(sales_cost AS DECIMAL(30,6)), 2)
                     AS DECIMAL(38,2))) AS DECIMAL(38,2)) AS DOUBLE) AS total_sales_cost,
       COUNT(*) AS line_count
FROM sales
GROUP BY 1, 2, 3
""",
)
def weekly_sales_rollup_decimal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly rollup in DDL-faithful decimal mode: measures are cast to
    the ``schemas.sales_schema("decimal")`` DECIMAL(38,2) types at the
    ingest boundary (via the proven money rounding hop through
    DECIMAL(30,6)), then summed in exact decimal arithmetic end-to-end.
    The aggregation is pure DECIMAL(38,2) — exact, order-independent —
    and only the FINAL projection casts to double so the result is
    representable by the driver's pandas canonicalizer (a DECIMAL(38,2)
    sum is exact, so the one terminal double cast is lossless for any
    value below 2^53 cents)."""
    from ..schemas import sales_schema

    dec_types = {
        f.name: f.dataType for f in sales_schema("decimal").fields
    }
    s = retail.add_week(fx.sales(spark, sf_dir), "trans_dt")
    measures = ("sales_qty", "sales_amt", "sales_cost")
    dec = s.select(
        "yr_wk_num",
        "store_key",
        "prod_key",
        *[
            F.round(F.col(c).cast("decimal(30,6)"), 2)
            .cast(dec_types[c])
            .alias(c)
            for c in measures
        ],
    )
    return dec.groupBy("yr_wk_num", "store_key", "prod_key").agg(
        F.sum("sales_qty")
        .cast("decimal(38,2)")
        .cast("double")
        .alias("total_sales_qty"),
        F.sum("sales_amt")
        .cast("decimal(38,2)")
        .cast("double")
        .alias("total_sales_amt"),
        F.sum("sales_cost")
        .cast("decimal(38,2)")
        .cast("double")
        .alias("total_sales_cost"),
        F.count(F.lit(1)).alias("line_count"),
    )


#: money ingest hop shared by the decimal-mode queries: presentation-round
#: the runtime double to cents (exact, cross-engine-stable), then store it
#: in the warehouse DDL's DECIMAL(38,2).
_DEC_IN_SQL = "CAST(round(CAST({x} AS DECIMAL(30,6)), 2) AS DECIMAL(38,2))"

_MERGED_DEC_CTE = f"""
merged_dec AS (
  SELECT *,
         CASE WHEN inventory_on_hand_qty < sales_qty THEN 1 ELSE 0 END
           AS low_stock_flg
  FROM (
    SELECT s.trans_dt,
           s.store_key,
           s.prod_key,
           i.cal_dt,
           i.out_of_stock_flg,
           {_DEC_IN_SQL.format(x="s.sales_qty")} AS sales_qty,
           {_DEC_IN_SQL.format(x="s.sales_amt")} AS sales_amt,
           {_DEC_IN_SQL.format(x="s.sales_cost")} AS sales_cost,
           {_DEC_IN_SQL.format(x="i.inventory_on_hand_qty")}
             AS inventory_on_hand_qty,
           {_DEC_IN_SQL.format(x="i.inventory_on_order_qty")}
             AS inventory_on_order_qty,
           {_W_TRANS} AS yr_wk_num
    FROM sales s
    JOIN inventory i
      ON s.prod_key = i.prod_key
     AND s.store_key = i.store_key
     AND s.trans_dt = i.cal_dt
  )
)"""

_OOS_RATE = f"CAST({_OOS_DAYS} AS DOUBLE) / 7"


@_register(
    "weekly_summary_decimal",
    f"""
WITH {fx.SALES_CTE.strip()},
{fx.INVENTORY_CTE.strip()},
{_MERGED_DEC_CTE.strip()}
SELECT yr_wk_num,
       store_key,
       prod_key,
       CAST(SUM(sales_qty) AS DOUBLE) AS total_sales_qty,
       CAST(SUM(sales_amt) AS DOUBLE) AS total_sales_amt,
       {_m("CAST(SUM(sales_amt) AS DOUBLE) / NULLIF(CAST(SUM(sales_qty) AS DOUBLE), 0)")}
         AS avg_sales_amt,
       CAST(SUM(sales_cost) AS DOUBLE) AS total_sales_cost,
       CAST(arg_max(inventory_on_hand_qty, cal_dt) AS DOUBLE) AS eow_on_hand_qty,
       CAST(arg_max(inventory_on_order_qty, cal_dt) AS DOUBLE) AS eow_on_order_qty,
       {_OOS_DAYS} AS out_of_stock_days,
       {_m(_OOS_RATE)} AS out_of_stock_rate,
       CAST(SUM(low_stock_flg) AS BIGINT) AS low_stock_count,
       CAST(SUM(CASE WHEN out_of_stock_flg = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS no_stock_instances,
       {_m(f"{_OOS_RATE} + CAST(SUM(low_stock_flg) AS DOUBLE)")}
         AS total_low_stock_impact,
       CAST(SUM(CASE WHEN low_stock_flg = 1
                     THEN sales_qty - inventory_on_hand_qty END) AS DOUBLE)
         AS potential_low_stock_impact,
       {_m("CAST(arg_max(inventory_on_hand_qty, cal_dt) AS DOUBLE)"
           " / NULLIF(CAST(SUM(sales_qty) AS DOUBLE), 0)")}
         AS weeks_supply
FROM merged_dec
GROUP BY 1, 2, 3
""",
)
def weekly_summary_decimal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full 13-metric flagship in DDL-faithful decimal mode
    (``schemas.sales_schema("decimal")``, ``Snow Flake/Data
    Ingestion.sql:48-61``): every money measure enters as DECIMAL(38,2)
    via the proven cents hop, all sums / extrema / differences run in
    exact decimal arithmetic (order-independent — bit-identical on any
    partitioning, the audit-grade property at 100 TB), and only ratio
    metrics drop to double (a ratio of exact sums, then the standard
    money rounding). The terminal projection casts every decimal to
    double so the driver's pandas canonicalizer can hash it; the cast is
    lossless below 2^53 cents. The low-stock flag is compared on the
    DECIMAL values on both sides (the decimal-mode contract: gates see
    what the warehouse stores)."""
    from ..schemas import sales_schema

    dec38 = sales_schema("decimal")["sales_qty"].dataType
    m = ws.merged(spark, sf_dir)

    def dec_in(c: str) -> Column:
        return F.round(F.col(c).cast("decimal(30,6)"), 2).cast(dec38)

    md = m.select(
        "yr_wk_num",
        "store_key",
        "prod_key",
        "cal_dt",
        "out_of_stock_flg",
        dec_in("sales_qty").alias("sales_qty"),
        dec_in("sales_amt").alias("sales_amt"),
        dec_in("sales_cost").alias("sales_cost"),
        dec_in("inventory_on_hand_qty").alias("inventory_on_hand_qty"),
        dec_in("inventory_on_order_qty").alias("inventory_on_order_qty"),
    ).withColumn(
        "low_stock_flg",
        F.when(
            F.col("inventory_on_hand_qty") < F.col("sales_qty"), 1
        ).otherwise(0),
    )
    eow = F.col("cal_dt")  # bare date: hash-aggregable (see plans/weekly_summary)
    oos_days = F.count_distinct(
        F.when(F.col("out_of_stock_flg") == 1, F.col("cal_dt"))
    )
    sum_qty_d = F.sum("sales_qty").cast("double")
    eow_on_hand_d = F.max_by("inventory_on_hand_qty", eow).cast("double")
    return md.groupBy(*retail.WEEK_GRAIN).agg(
        F.sum("sales_qty").cast("double").alias("total_sales_qty"),
        F.sum("sales_amt").cast("double").alias("total_sales_amt"),
        money(
            safe_div(F.sum("sales_amt").cast("double"), sum_qty_d)
        ).alias("avg_sales_amt"),
        F.sum("sales_cost").cast("double").alias("total_sales_cost"),
        eow_on_hand_d.alias("eow_on_hand_qty"),
        F.max_by("inventory_on_order_qty", eow)
        .cast("double")
        .alias("eow_on_order_qty"),
        oos_days.cast("bigint").alias("out_of_stock_days"),
        money(oos_days.cast("double") / F.lit(7)).alias("out_of_stock_rate"),
        F.sum("low_stock_flg").cast("bigint").alias("low_stock_count"),
        F.sum(F.when(F.col("out_of_stock_flg") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("no_stock_instances"),
        money(
            oos_days.cast("double") / F.lit(7)
            + F.sum("low_stock_flg").cast("double")
        ).alias("total_low_stock_impact"),
        F.sum(
            F.when(
                F.col("low_stock_flg") == 1,
                F.col("sales_qty") - F.col("inventory_on_hand_qty"),
            )
        )
        .cast("double")
        .alias("potential_low_stock_impact"),
        money(safe_div(eow_on_hand_d, sum_qty_d)).alias("weeks_supply"),
    )


# ---------------------------------------------------------------------------
# skew-salted aggregation (functions/skew.py): the weekly rollup computed
# as an explicit two-phase salted aggregate — same result relation as
# weekly_sales_rollup (decimal partials are exact and associative), shaped
# for a single hot group key that would overwhelm one reducer. AQE's skew
# handling covers joins; a hot GROUP BY key needs this manual spread.
# ---------------------------------------------------------------------------


@_register("weekly_sales_rollup_salted", _ROLLUP_ORACLE)
def weekly_sales_rollup_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted weekly rollup via :func:`skew.salted_agg`:
    phase 1 partial-aggregates on (grain, salt) — a hot grain's rows
    spread over SALT_N reducers — phase 2 merges at most SALT_N partials
    per grain. Partials are exact decimal sums (associative), so the
    result is bit-identical to the unsalted plan and shares its oracle."""
    from ..functions.skew import salted_agg

    s = retail.add_week(fx.sales(spark, sf_dir), "trans_dt")
    grain = ["yr_wk_num", "store_key", "prod_key"]
    merged = salted_agg(
        s,
        grain,
        partial_aggs={
            "qty": F.sum("sales_qty"),
            "amt": F.sum(F.col("sales_amt").cast("decimal(30,6)")),
            "cost": F.sum(F.col("sales_cost").cast("decimal(30,6)")),
        },
        merge_aggs={
            "qty": F.sum("qty"),
            "amt": F.sum("amt"),
            "cost": F.sum("cost"),
        },
    )
    return merged.select(
        *grain,
        money(F.col("qty")).alias("total_sales_qty"),
        F.round(F.col("amt"), 2).cast("double").alias("total_sales_amt"),
        money(safe_div(F.col("amt").cast("double"), F.col("qty"))).alias(
            "avg_sales_amt"
        ),
        F.round(F.col("cost"), 2).cast("double").alias("total_sales_cost"),
    )
