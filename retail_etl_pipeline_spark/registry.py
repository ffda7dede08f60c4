"""Query registry: name -> (Spark callable, DuckDB oracle SQL).

This is the driver-facing inventory (SURVEY.md §2): every implemented
operator has a named query here, a Spark implementation (taking
``(spark, sf_dir)``) and — when SQL-expressible — an exactly-equivalent
ANSI SQL string the DuckDB oracle runs on the same parquet tables.

Alignment rules (SURVEY.md §5, FIXTURES.md):
- every computed column aliased identically on both sides;
- money sums/ratios rounded via DECIMAL (see functions.metrics — double
  rounding is not cross-engine-stable at exact ties) on both sides;
- ``NULLIF(denom, 0)`` in SQL to match Spark's null-on-divide-by-zero;
- ``CAST(SUM(int) AS BIGINT)`` in SQL (DuckDB sums ints to HUGEINT);
- week keys cast to INTEGER on both sides;
- deterministic tie-breaks on every window/top-k.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions.metrics import (
    DECIMAL_SUM_SQL,
    MONEY_SQL,
    MONEY_SUM_SQL,
    decimal_sum,
    money,
    money_sum,
    safe_div,
)
from .functions import zorder as zo
from .operators import fixtures_adapter as fx
from .operators import reconcile as rc
from .operators import retail
from .plans import weekly_summary as ws

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def _register(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _m(x: str) -> str:
    """money(): decimal-stable round-to-cents of a scalar expression."""
    return MONEY_SQL.format(x=x)


def _ms(x: str) -> str:
    """money_sum(): exact decimal sum rounded to cents."""
    return MONEY_SUM_SQL.format(x=x)


def _ds(x: str) -> str:
    """decimal_sum(): exact decimal sum as double (for ratio numerators)."""
    return DECIMAL_SUM_SQL.format(x=x)


# common SQL fragments
_WEEK = "CAST(isoyear({d}) * 100 + weekofyear({d}) AS INTEGER)"
_W_TRANS = _WEEK.format(d="trans_dt")
_W_CAL = _WEEK.format(d="cal_dt")

_MERGED_CTE = f"""
merged AS (
  SELECT s.*,
         i.cal_dt,
         i.inventory_on_hand_qty,
         i.inventory_on_order_qty,
         i.out_of_stock_flg,
         CASE WHEN i.inventory_on_hand_qty < s.sales_qty THEN 1 ELSE 0 END
           AS low_stock_flg,
         {_W_TRANS} AS yr_wk_num
  FROM sales s
  JOIN inventory i
    ON s.prod_key = i.prod_key
   AND s.store_key = i.store_key
   AND s.trans_dt = i.cal_dt
)"""


# ---------------------------------------------------------------------------
# §2.5 A1-A4: weekly sales rollup (the Phase-1 end-to-end slice)
# ---------------------------------------------------------------------------

_ROLLUP_ORACLE = f"""
WITH {fx.SALES_CTE.strip()}
SELECT {_W_TRANS} AS yr_wk_num,
       store_key,
       prod_key,
       {_m("SUM(sales_qty)")} AS total_sales_qty,
       {_ms("sales_amt")} AS total_sales_amt,
       {_m(f"{_ds('sales_amt')} / NULLIF(SUM(sales_qty), 0)")} AS avg_sales_amt,
       {_ms("sales_cost")} AS total_sales_cost
FROM sales
GROUP BY 1, 2, 3
"""


@_register("weekly_sales_rollup", _ROLLUP_ORACLE)
def weekly_sales_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1-A4+A12 (``Data Transformation.py:62-67``): one hash aggregate,
    partial map-side combine; no pre-sort (the reference's per-intermediate
    ``orderBy`` shuffles are dropped, SURVEY.md §4)."""
    s = retail.add_week(fx.sales(spark, sf_dir), "trans_dt")
    return retail.weekly_sales_agg(s)


# ---------------------------------------------------------------------------
# §2.4 J2/J3: calendar + store dim joins (broadcast)
# ---------------------------------------------------------------------------

@_register(
    "weekly_sales_by_region",
    f"""
WITH {fx.SALES_CTE.strip()},
{fx.STORE_CTE.strip()},
{fx.CALENDAR_CTE.strip()}
SELECT c.yr_wk_num,
       st.region,
       {_ms("s.sales_amt")} AS total_sales_amt,
       COUNT(*) AS line_count
FROM sales s
JOIN calendar c ON s.trans_dt = c.cal_dt
JOIN store st ON s.store_key = st.store_key
GROUP BY 1, 2
""",
)
def weekly_sales_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 (fact ⋈ calendar on differently-named dates) + J3 (fact ⋈ store) —
    both dims broadcast; one shuffle total (the group-by)."""
    s = fx.sales(spark, sf_dir)
    cal = fx.calendar_dim(spark, sf_dir)
    st = fx.store_dim(spark, sf_dir)
    joined = retail.join_calendar(s, cal, "trans_dt").join(
        F.broadcast(st), "store_key", "inner"
    )
    return joined.groupBy("yr_wk_num", "region").agg(
        money_sum(F.col("sales_amt")).alias("total_sales_amt"),
        F.count(F.lit(1)).alias("line_count"),
    )


# ---------------------------------------------------------------------------
# §2.6 W1: end-of-week state (window form and single-pass max_by form)
# ---------------------------------------------------------------------------

_EOW_ORACLE = f"""
WITH {fx.EVENTS_INV_CTE.strip()},
ranked AS (
  SELECT {_W_CAL} AS yr_wk_num,
         store_key,
         inventory_on_hand_qty,
         inventory_on_order_qty,
         row_number() OVER (
           PARTITION BY {_W_CAL}, store_key
           ORDER BY ts DESC, event_id DESC
         ) AS rn
  FROM events_inv
)
SELECT yr_wk_num,
       store_key,
       inventory_on_hand_qty AS eow_on_hand_qty,
       inventory_on_order_qty AS eow_on_order_qty
FROM ranked
WHERE rn = 1
"""


@_register("eow_inventory_window", _EOW_ORACLE)
def eow_inventory_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 as written (``Data Transformation.py:71-74,79-82``): row_number
    over (grain, ts desc) with a unique tie-breaker, keep row 1."""
    inv = retail.add_week(fx.events_inventory(spark, sf_dir), "cal_dt")
    return retail.eow_snapshot_window(
        inv,
        grain=["yr_wk_num", "store_key"],
        order_cols=["ts", "event_id"],
        value_cols={
            "inventory_on_hand_qty": "eow_on_hand_qty",
            "inventory_on_order_qty": "eow_on_order_qty",
        },
    )


@_register("eow_inventory_single_pass", _EOW_ORACLE)
def eow_inventory_single_pass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 re-planned: ``max_by(value, (ts, event_id))`` — one hash aggregate
    instead of sort+rank+filter; same result, cheaper at scale."""
    inv = retail.add_week(fx.events_inventory(spark, sf_dir), "cal_dt")
    return retail.eow_snapshot_maxby(
        inv,
        grain=["yr_wk_num", "store_key"],
        order_cols=["ts", "event_id"],
        value_cols={
            "inventory_on_hand_qty": "eow_on_hand_qty",
            "inventory_on_order_qty": "eow_on_order_qty",
        },
    )


# ---------------------------------------------------------------------------
# §2.5 A6-A9 flag aggregations over the observation stream
# ---------------------------------------------------------------------------

_OOS_DAYS = "COUNT(DISTINCT CASE WHEN out_of_stock_flg = 1 THEN cal_dt END)"


@_register(
    "out_of_stock_week",
    f"""
WITH {fx.EVENTS_INV_CTE.strip()}
SELECT {_W_CAL} AS yr_wk_num,
       store_key,
       {_m(f"CAST({_OOS_DAYS} AS DOUBLE) / 7")} AS out_of_stock_count
FROM events_inv
GROUP BY 1, 2
""",
)
def out_of_stock_week(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 (``Data Transformation.py:93-96``): distinct out-of-stock days / 7."""
    inv = retail.add_week(fx.events_inventory(spark, sf_dir), "cal_dt")
    return retail.out_of_stock_week(inv)


@_register(
    "no_stock_instances",
    f"""
WITH {fx.EVENTS_INV_CTE.strip()}
SELECT {_W_CAL} AS yr_wk_num,
       store_key,
       CAST(SUM(CASE WHEN out_of_stock_flg = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS no_stock_instances
FROM events_inv
GROUP BY 1, 2
""",
)
def no_stock_instances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7+F2 (``Data Transformation.py:111-112,141-144``), single-pass
    conditional count."""
    inv = retail.add_week(fx.events_inventory(spark, sf_dir), "cal_dt")
    return retail.no_stock_instances(inv)


@_register(
    "low_stock_count",
    f"""
WITH {fx.EVENTS_INV_CTE.strip()}
SELECT {_W_CAL} AS yr_wk_num,
       store_key,
       CAST(SUM(low_stock_flg) AS BIGINT) AS low_stock_count
FROM events_inv
GROUP BY 1, 2
""",
)
def low_stock_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 with intended semantics (Q4): sum(flag) on the full weekly grain."""
    inv = retail.add_week(fx.events_inventory(spark, sf_dir), "cal_dt")
    return retail.low_stock_count(inv)


@_register(
    "total_low_stock_impact",
    f"""
WITH {fx.EVENTS_INV_CTE.strip()}
SELECT {_W_CAL} AS yr_wk_num,
       store_key,
       {_m(f"CAST({_OOS_DAYS} AS DOUBLE) / 7 + CAST(SUM(low_stock_flg) AS DOUBLE)")}
         AS total_low_stock_impact
FROM events_inv
GROUP BY 1, 2
""",
)
def total_low_stock_impact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9+J5 (``Data Transformation.py:121-126``) — the reference's
    two-relations-then-join collapsed into one pass."""
    inv = retail.add_week(fx.events_inventory(spark, sf_dir), "cal_dt")
    return retail.total_low_stock_impact(inv)


# ---------------------------------------------------------------------------
# §2.5 A10/A11 over the merged fact-fact join
# ---------------------------------------------------------------------------

@_register(
    "potential_low_stock_impact",
    f"""
WITH {fx.SALES_CTE.strip()},
{fx.INVENTORY_CTE.strip()},
{_MERGED_CTE.strip()}
SELECT yr_wk_num,
       store_key,
       prod_key,
       {_m("SUM(sales_qty) - SUM(inventory_on_hand_qty)")}
         AS potential_low_stock_impact
FROM merged
WHERE low_stock_flg = 1
GROUP BY 1, 2, 3
""",
)
def potential_low_stock_impact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10+F3+J6 (``Data Transformation.py:132-136``): filter low-stock rows,
    weekly sum(sold) - sum(on-hand). Filter sits directly on the scan side of
    the aggregate (predicate pushdown applies)."""
    m = ws.merged(spark, sf_dir)
    return (
        m.where(F.col("low_stock_flg") == 1)
        .groupBy(*retail.WEEK_GRAIN)
        .agg(
            money(
                F.sum("sales_qty") - F.sum("inventory_on_hand_qty")
            ).alias("potential_low_stock_impact")
        )
    )


@_register(
    "weeks_supply",
    f"""
WITH {fx.SALES_CTE.strip()},
{fx.INVENTORY_CTE.strip()},
{_MERGED_CTE.strip()}
SELECT yr_wk_num,
       store_key,
       prod_key,
       {_m("arg_max(inventory_on_hand_qty, cal_dt) / NULLIF(SUM(sales_qty), 0)")}
         AS weeks_supply
FROM merged
GROUP BY 1, 2, 3
""",
)
def weeks_supply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11 with intended semantics (Q6): end-of-week on-hand ÷ weekly sold
    qty — not the reference's grouping-key smuggle
    (``Data Transformation.py:150-152``)."""
    m = ws.merged(spark, sf_dir)
    return m.groupBy(*retail.WEEK_GRAIN).agg(
        money(
            safe_div(
                F.max_by("inventory_on_hand_qty", F.col("cal_dt")),
                F.sum("sales_qty"),
            )
        ).alias("weeks_supply")
    )


# ---------------------------------------------------------------------------
# the flagship: 13-metric weekly summary (single-pass and reference-shaped)
# ---------------------------------------------------------------------------

_SUMMARY_ORACLE = f"""
WITH {fx.SALES_CTE.strip()},
{fx.INVENTORY_CTE.strip()},
{_MERGED_CTE.strip()}
SELECT yr_wk_num,
       store_key,
       prod_key,
       {_m("SUM(sales_qty)")} AS total_sales_qty,
       {_ms("sales_amt")} AS total_sales_amt,
       {_m(f"{_ds('sales_amt')} / NULLIF(SUM(sales_qty), 0)")} AS avg_sales_amt,
       {_ms("sales_cost")} AS total_sales_cost,
       {_m("arg_max(inventory_on_hand_qty, cal_dt)")} AS eow_on_hand_qty,
       {_m("arg_max(inventory_on_order_qty, cal_dt)")} AS eow_on_order_qty,
       {_OOS_DAYS} AS out_of_stock_days,
       {_m(f"CAST({_OOS_DAYS} AS DOUBLE) / 7")} AS out_of_stock_rate,
       CAST(SUM(low_stock_flg) AS BIGINT) AS low_stock_count,
       CAST(SUM(CASE WHEN out_of_stock_flg = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS no_stock_instances,
       {_m(f"CAST({_OOS_DAYS} AS DOUBLE) / 7 + CAST(SUM(low_stock_flg) AS DOUBLE)")}
         AS total_low_stock_impact,
       {_m("SUM(CASE WHEN low_stock_flg = 1 THEN sales_qty - inventory_on_hand_qty END)")}
         AS potential_low_stock_impact,
       {_m("arg_max(inventory_on_hand_qty, cal_dt) / NULLIF(SUM(sales_qty), 0)")}
         AS weeks_supply
FROM merged
GROUP BY 1, 2, 3
"""


@_register("weekly_summary", _SUMMARY_ORACLE)
def weekly_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's entire ``df_final`` (``Data Transformation.py:
    156-175``) as ONE aggregation pass — 13 metrics, no self-joins."""
    return ws.weekly_summary(spark, sf_dir)


@_register("weekly_summary_assembled", _SUMMARY_ORACLE)
def weekly_summary_assembled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference-shaped plan (J5-J7): separate aggregate relations re-joined
    on the weekly grain, base persisted. Same output as ``weekly_summary``."""
    return ws.weekly_summary_assembled(spark, sf_dir)


# ---------------------------------------------------------------------------
# §2.3 F4 + §2.1 S5: filtered export semantics
# ---------------------------------------------------------------------------

@_register(
    "orders_to_date",
    """
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
       o_orderpriority
FROM orders
WHERE CAST(o_orderdate AS DATE) <= current_date
""",
)
def orders_to_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4 (``Data Load.sql:4,11``): date-upper-bound export filter."""
    return fx._read(spark, sf_dir, "orders").where(
        F.to_date("o_orderdate") <= F.current_date()
    )


# ---------------------------------------------------------------------------
# general SQL capability: classic pricing-summary + top-k + dim rollup
# ---------------------------------------------------------------------------

@_register(
    "pricing_summary",
    f"""
SELECT l_returnflag,
       l_linestatus,
       {_m("SUM(l_quantity)")} AS sum_qty,
       {_ms("l_extendedprice")} AS sum_base_price,
       {_ms("l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
       {_ms("l_extendedprice * (1 - l_discount) * (1 + l_tax)")} AS sum_charge,
       {_m("SUM(l_quantity) / NULLIF(COUNT(*), 0)")} AS avg_qty,
       {_m(f"{_ds('l_extendedprice')} / NULLIF(COUNT(*), 0)")} AS avg_price,
       {_m(f"{_ds('l_discount')} / NULLIF(COUNT(*), 0)")} AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""",
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary: scan-side filter + wide hash agg.
    Averages as ratio-of-sums so both engines accumulate identically."""
    li = fx._read(spark, sf_dir, "lineitem")
    cnt = F.count(F.lit(1))
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.where(F.to_date("l_shipdate") <= F.lit("1998-09-02").cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            money(F.sum("l_quantity")).alias("sum_qty"),
            money_sum(F.col("l_extendedprice")).alias("sum_base_price"),
            money_sum(disc_price).alias("sum_disc_price"),
            money_sum(disc_price * (1 + F.col("l_tax"))).alias("sum_charge"),
            money(safe_div(F.sum("l_quantity"), cnt)).alias("avg_qty"),
            money(safe_div(decimal_sum(F.col("l_extendedprice")), cnt)).alias(
                "avg_price"
            ),
            money(safe_div(decimal_sum(F.col("l_discount")), cnt)).alias("avg_disc"),
            cnt.alias("count_order"),
        )
    )


@_register(
    "top_parts_by_revenue",
    f"""
WITH {fx.SALES_CTE.strip()},
{fx.PRODUCT_CTE.strip()},
rev AS (
  SELECT prod_key, {_ms("sales_amt")} AS revenue
  FROM sales GROUP BY prod_key
)
SELECT r.prod_key, p.prod_name, p.brand_name, r.revenue
FROM rev r JOIN product p ON r.prod_key = p.prod_key
ORDER BY r.revenue DESC, r.prod_key ASC
LIMIT 100
""",
)
def top_parts_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k by aggregate: hash agg -> broadcast dim join -> global top-100
    (Spark TakeOrderedAndProject — no full sort materialization).
    Deterministic tie-break on prod_key; revenue is an exact decimal sum so
    the ranking itself is engine-stable."""
    s = fx.sales(spark, sf_dir)
    p = fx.product_dim(spark, sf_dir)
    rev = s.groupBy("prod_key").agg(money_sum(F.col("sales_amt")).alias("revenue"))
    return (
        rev.join(F.broadcast(p), "prod_key", "inner")
        .select("prod_key", "prod_name", "brand_name", "revenue")
        .orderBy(F.desc("revenue"), F.asc("prod_key"))
        .limit(100)
    )


@_register(
    "segment_order_stats",
    f"""
SELECT c.c_mktsegment,
       COUNT(*) AS order_count,
       {_ms("o.o_totalprice")} AS total_price,
       {_m(f"{_ds('o.o_totalprice')} / NULLIF(COUNT(*), 0)")} AS avg_price
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment
""",
)
def segment_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer dim join + rollup on a low-cardinality key (5 segments)."""
    o = fx._read(spark, sf_dir, "orders")
    c = fx._read(spark, sf_dir, "customer")
    cnt = F.count(F.lit(1))
    return (
        o.join(c, o.o_custkey == c.c_custkey, "inner")
        .groupBy("c_mktsegment")
        .agg(
            cnt.alias("order_count"),
            money_sum(F.col("o_totalprice")).alias("total_price"),
            money(safe_div(decimal_sum(F.col("o_totalprice")), cnt)).alias(
                "avg_price"
            ),
        )
    )


# ---------------------------------------------------------------------------
# §2.10 extensions — text analysis (operators/text.py)
# ---------------------------------------------------------------------------

from .operators import dedup as dd  # noqa: E402
from .operators import similarity as sim  # noqa: E402
from .operators import text as tx  # noqa: E402
from .operators import windows as win  # noqa: E402


@_register("text_profile", tx.TEXT_PROFILE_SQL)
def text_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting + lexical stats, all JVM-side string/array functions."""
    return tx.text_profile(fx._read(spark, sf_dir, "documents"))


@_register("quality_score", tx.QUALITY_SCORE_SQL)
def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite document quality score (diversity/stopword/length)."""
    return tx.quality_score(fx._read(spark, sf_dir, "documents"))


@_register("language_id", tx.LANGUAGE_ID_SQL)
def language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-marker language identification with deterministic argmax."""
    return tx.language_id(fx._read(spark, sf_dir, "documents"))


@_register("doc_fingerprints", tx.DOC_FINGERPRINTS_SQL)
def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """60-bit md5 fingerprint of normalized text (exact-dedup key)."""
    return tx.doc_fingerprints(fx._read(spark, sf_dir, "documents"))


@_register("simhash_signatures", tx.SIMHASH_SQL)
def simhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup signatures (bit-majority over token hashes)."""
    return tx.simhash(fx._read(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# §2.10 extensions — deduplication (operators/dedup.py)
# ---------------------------------------------------------------------------

@_register("dedup_exact", dd.DEDUP_EXACT_SQL)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on the 60-bit content fingerprint."""
    return dd.dedup_exact(fx._read(spark, sf_dir, "documents"))


@_register("ngram_jaccard_neardup", dd.NGRAM_JACCARD_SQL)
def ngram_jaccard_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs via shingle inverted index."""
    return dd.ngram_jaccard_pairs(fx._read(spark, sf_dir, "documents"))


@_register("minhash_lsh_candidates", dd.MINHASH_LSH_SQL)
def minhash_lsh_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH candidate pairs (16 minhashes, 4 bands x 4 rows)."""
    return dd.minhash_lsh_candidates(fx._read(spark, sf_dir, "documents"))


@_register("minhash_neardup", dd.MINHASH_NEARDUP_SQL)
def minhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage near-dup: LSH candidates verified with exact Jaccard."""
    return dd.minhash_neardup_verified(fx._read(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# §2.10 extensions — similarity search (operators/similarity.py)
# ---------------------------------------------------------------------------

@_register("cosine_topk", sim.cosine_topk_sql())
def cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k against the vec_id=0 query vector."""
    return sim.cosine_topk(fx._read(spark, sf_dir, "embeddings"))


@_register("ann_lsh_topk", sim.ann_lsh_topk_sql())
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-k: random-hyperplane LSH bucket, exact rerank in-bucket."""
    return sim.ann_lsh_topk(fx._read(spark, sf_dir, "embeddings"))


@_register("ann_lsh_topk_multiprobe", sim.ann_lsh_topk_multiprobe_sql())
def ann_lsh_topk_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe LSH ANN: query bucket + all Hamming-1 neighbor
    buckets (flip each hyperplane bit once), exact rerank over the
    union — the recall knob on ann_lsh_topk (candidate superset, so
    recall@k >= single-probe; pinned by test_similarity recall test)."""
    return sim.ann_lsh_topk_multiprobe(fx._read(spark, sf_dir, "embeddings"))


@_register("ann_ivf_topk_lloyd", sim.ann_ivf_topk_lloyd_sql())
def ann_ivf_topk_lloyd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN over centroids refined by ONE exact-decimal Lloyd
    iteration (operators/similarity.py — nano-unit integer means, so
    the k-means update is engine-stable; the honest clustering upgrade
    over the seeded quantizer)."""
    return sim.ann_ivf_topk_lloyd(fx._read(spark, sf_dir, "embeddings"))


@_register("ann_ivf_topk_lloyd2", sim.ann_ivf_topk_lloyd_sql(iters=2))
def ann_ivf_topk_lloyd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN over centroids refined by TWO exact-decimal Lloyd
    iterations — one more unroll of the same engine-stable k-means
    update (VERDICT r6 item 4); the measured recall@k of every ANN
    variant against cosine_topk ground truth is recorded in SCALE.md."""
    return sim.ann_ivf_topk_lloyd(
        fx._read(spark, sf_dir, "embeddings"), iters=2
    )


@_register("ann_ivf_topk_multiprobe", sim.ann_ivf_topk_multiprobe_sql())
def ann_ivf_topk_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe IVF ANN: rerank inside the nprobe=2 nearest centroid
    cells (boundary queries keep their runner-up cell's neighbors) —
    the recall knob on ann_ivf_topk."""
    return sim.ann_ivf_topk_multiprobe(fx._read(spark, sf_dir, "embeddings"))


@_register("embedding_neardup", sim.EMBEDDING_NEARDUP_SQL)
def embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs: brute-force baseline over a
    bounded deterministic sample (sim.NEARDUP_SAMPLE_DOCS lowest
    vec_ids, which covers the whole corpus at test SFs) — the
    driver-side collect stays O(sample) at any scale. The unbounded
    production path is embedding_neardup_lsh."""
    return sim.embedding_neardup(fx._read(spark, sf_dir, "embeddings"))


@_register("embedding_neardup_lsh", sim.EMBEDDING_NEARDUP_LSH_SQL)
def embedding_neardup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs, LSH-bucketed (the scale path)."""
    return sim.embedding_neardup_lsh(fx._read(spark, sf_dir, "embeddings"))


@_register(
    "embedding_neardup_lsh_multiprobe",
    sim.EMBEDDING_NEARDUP_LSH_MULTIPROBE_SQL,
)
def embedding_neardup_lsh_multiprobe(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Pair-level multi-probe near-dup: one join side expanded into its
    bucket + Hamming-1 flips, so pairs straddling ONE hyperplane are
    recovered (each qualifying pair matches exactly once — identity
    flip for equal buckets, the single differing bit otherwise)."""
    return sim.embedding_neardup_lsh_multiprobe(
        fx._read(spark, sf_dir, "embeddings")
    )


# ---------------------------------------------------------------------------
# §2.10 extensions — event-time windows (operators/windows.py)
# ---------------------------------------------------------------------------

def _with_events_cte(body: str) -> str:
    """Prepend the events_norm CTE, merging with the body's own WITH."""
    body = body.strip()
    if body.upper().startswith("WITH "):
        return f"WITH {fx.EVENTS_STREAM_CTE.strip()},\n{body[5:]}"
    return f"WITH {fx.EVENTS_STREAM_CTE.strip()}\n{body}"


@_register("tumbling_hourly", _with_events_cte(win.TUMBLING_SQL))
def tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1h event-time windows per event type."""
    return win.tumbling(fx.events_stream(spark, sf_dir))


@_register("sliding_hourly", _with_events_cte(win.SLIDING_SQL))
def sliding_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 1h windows every 30m."""
    return win.sliding(fx.events_stream(spark, sf_dir))


@_register("session_windows", _with_events_cte(win.SESSION_SQL))
def session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session windows (4h gap)."""
    return win.sessionized(fx.events_stream(spark, sf_dir))


# ---------------------------------------------------------------------------
# §2.10 extensions — multimodal plumbing (operators/multimodal.py)
# ---------------------------------------------------------------------------

from .operators import multimodal as mm  # noqa: E402


@_register("multimodal_features", mm.MULTIMODAL_FEATURES_SQL)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column pipeline: text -> binary payload + metadata struct ->
    Arrow-batched mapInPandas feature extraction (decode step stubbed;
    byte-level features are oracle-checkable via md5)."""
    media = mm.attach_binary(fx._read(spark, sf_dir, "documents"))
    return mm.extract_features(media)


# ---------------------------------------------------------------------------
# §3.3: the same flagship through the SQL parser (S7/S8 catalog path)
# ---------------------------------------------------------------------------

from .plans import sql_entry as sqe  # noqa: E402


@_register("weekly_summary_sql", _SUMMARY_ORACLE)
def weekly_summary_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 13-metric weekly summary as ONE spark.sql statement over
    registered views — same Catalyst plan as the DataFrame form."""
    return sqe.weekly_summary_sql(spark, sf_dir)


# ---------------------------------------------------------------------------
# general relational capability beyond the reference (SURVEY.md §2.7 lists
# these as ABSENT from the reference; an engine a reference user switches to
# still needs them): distinct, semi/anti joins, union, rollup/cube, pivot
# ---------------------------------------------------------------------------

@_register(
    "distinct_order_priorities",
    "SELECT DISTINCT o_orderpriority, o_orderstatus FROM orders",
)
def distinct_order_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT = hash aggregate without aggregates (map-side combine)."""
    return fx._read(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_orderstatus"
    ).distinct()


@_register(
    "customers_with_orders",
    """
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
""",
)
def customers_with_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join: existence probe, no row multiplication, and only the
    probe side's columns flow — cheaper than join+distinct."""
    c = fx._read(spark, sf_dir, "customer")
    o = fx._read(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


@_register(
    "customers_without_orders",
    """
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
""",
)
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join (the NOT EXISTS plan)."""
    c = fx._read(spark, sf_dir, "customer")
    o = fx._read(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


@_register(
    "all_account_balances",
    """
SELECT c_custkey AS entity_key, 'customer' AS entity_kind, c_acctbal AS acctbal
FROM customer
UNION ALL
SELECT s_suppkey AS entity_key, 'supplier' AS entity_kind, s_acctbal AS acctbal
FROM supplier
""",
)
def all_account_balances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL across heterogeneous sources with aligned schemas."""
    c = fx._read(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("entity_key"),
        F.lit("customer").alias("entity_kind"),
        F.col("c_acctbal").alias("acctbal"),
    )
    s = fx._read(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("entity_key"),
        F.lit("supplier").alias("entity_kind"),
        F.col("s_acctbal").alias("acctbal"),
    )
    return c.unionByName(s)


@_register(
    "region_rollup",
    f"""
WITH {fx.SALES_CTE.strip()},
{fx.STORE_CTE.strip()}
SELECT st.region,
       st.cntry_nm,
       {_ms("s.sales_amt")} AS total_sales_amt,
       COUNT(*) AS line_count
FROM sales s
JOIN store st ON s.store_key = st.store_key
GROUP BY ROLLUP(st.region, st.cntry_nm)
""",
)
def region_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals: (region, country) -> region -> grand total,
    one pass with grouping-set expansion (no self-union of aggregates)."""
    s = fx.sales(spark, sf_dir)
    st = fx.store_dim(spark, sf_dir)
    return (
        s.join(F.broadcast(st), "store_key", "inner")
        .rollup("region", "cntry_nm")
        .agg(
            money_sum(F.col("sales_amt")).alias("total_sales_amt"),
            F.count(F.lit(1)).alias("line_count"),
        )
    )


@_register(
    "flag_status_cube",
    f"""
SELECT l_returnflag,
       l_linestatus,
       {_m("SUM(l_quantity)")} AS sum_qty,
       COUNT(*) AS n
FROM lineitem
GROUP BY CUBE(l_returnflag, l_linestatus)
""",
)
def flag_status_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all 2^k grouping sets in one aggregation."""
    li = fx._read(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        money(F.sum("l_quantity")).alias("sum_qty"),
        F.count(F.lit(1)).alias("n"),
    )


@_register(
    "returnflag_pivot",
    f"""
SELECT l_linestatus,
       {_m("SUM(CASE WHEN l_returnflag = 'A' THEN l_quantity END)")} AS qty_a,
       {_m("SUM(CASE WHEN l_returnflag = 'N' THEN l_quantity END)")} AS qty_n,
       {_m("SUM(CASE WHEN l_returnflag = 'R' THEN l_quantity END)")} AS qty_r
FROM lineitem
GROUP BY l_linestatus
""",
)
def returnflag_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT with an explicit value list (explicit values keep the plan a
    single pass — no distinct-scan to discover columns)."""
    li = fx._read(spark, sf_dir, "lineitem")
    p = (
        li.groupBy("l_linestatus")
        .pivot("l_returnflag", ["A", "N", "R"])
        .agg(money(F.sum("l_quantity")))
    )
    return p.select(
        "l_linestatus",
        F.col("A").alias("qty_a"),
        F.col("N").alias("qty_n"),
        F.col("R").alias("qty_r"),
    )


@_register("ann_ivf_topk", sim.ann_ivf_topk_sql())
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: coarse centroid cells, exact rerank in the probed
    cell (the k-means-cell join shape with deterministic centroids)."""
    return sim.ann_ivf_topk(fx._read(spark, sf_dir, "embeddings"))


# ---------------------------------------------------------------------------
# §2.9 as-written / README variants — the reference's divergent semantics,
# exposed alongside the intended-primary forms so parity is checkable for
# BOTH readings (Q4, Q5)
# ---------------------------------------------------------------------------

@_register(
    "low_stock_count_aswritten",
    f"""
WITH {fx.EVENTS_INV_CTE.strip()}
SELECT store_key,
       COUNT(low_stock_flg) AS low_stock_count
FROM events_inv
GROUP BY store_key
""",
)
def low_stock_count_aswritten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 AS WRITTEN (Q4): count() of non-null flags (i.e. all rows) on the
    weekless (store-only) grain — reproduces ``Data Transformation.py:117``
    including its dropped week key. The intended form is ``low_stock_count``."""
    inv = fx.events_inventory(spark, sf_dir)
    return inv.groupBy("store_key").agg(
        F.count("low_stock_flg").alias("low_stock_count")
    )


@_register(
    "potential_low_stock_impact_readme",
    f"""
WITH {fx.SALES_CTE.strip()},
{fx.INVENTORY_CTE.strip()},
{_MERGED_CTE.strip()}
SELECT yr_wk_num,
       store_key,
       prod_key,
       {_ms("sales_amt - inventory_on_hand_qty")} AS potential_low_stock_impact
FROM merged
WHERE low_stock_flg = 1
GROUP BY 1, 2, 3
""",
)
def potential_low_stock_impact_readme(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10, README form (Q5): ``SUM(sales_amt - stock_on_hand)`` over
    low-stock rows (``README.md:56``) — the executed code's quantity-based
    form is the primary ``potential_low_stock_impact``."""
    m = ws.merged(spark, sf_dir)
    return (
        m.where(F.col("low_stock_flg") == 1)
        .groupBy(*retail.WEEK_GRAIN)
        .agg(
            money_sum(
                F.col("sales_amt") - F.col("inventory_on_hand_qty")
            ).alias("potential_low_stock_impact")
        )
    )


# ---------------------------------------------------------------------------
# approximate distinct counting — deterministic linear-counting sketch.
# Spark's approx_count_distinct (HLL++) can't be oracle-matched (engine-
# specific sketch state); linear counting over md5 buckets is the same
# class of estimator with bit-identical results in any engine, so the
# oracle check stays exact. Native approx_count_distinct remains available
# to users; this is the cross-engine-checkable form.
# ---------------------------------------------------------------------------

_LC_BUCKETS = 4096


@_register(
    "approx_distinct_parts",
    f"""
WITH occupied AS (
  SELECT COUNT(DISTINCT CAST(('0x' || substring(md5(CAST(l_partkey AS VARCHAR)), 1, 15))
                             AS BIGINT) % {_LC_BUCKETS}) AS m
  FROM lineitem
)
SELECT m AS occupied_buckets,
       CAST(round(CAST(-{_LC_BUCKETS} * ln(1.0 - CAST(m AS DOUBLE) / {_LC_BUCKETS})
                       AS DECIMAL(20,6)), 1) AS DOUBLE) AS approx_distinct
FROM occupied
""",
)
def approx_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-counting estimate of distinct l_partkey: hash each key into
    {_LC_BUCKETS} buckets, count occupied buckets m, estimate
    -K*ln(1-m/K). One exact-distinct over a tiny key space replaces the
    full distinct at scale (the sketch state is K bits, mergeable across
    partitions)."""
    li = fx._read(spark, sf_dir, "lineitem")
    bucket = (
        F.conv(
            F.substring(F.md5(F.col("l_partkey").cast("string")), 1, 15), 16, 10
        ).cast("bigint")
        % _LC_BUCKETS
    )
    occ = li.agg(F.count_distinct(bucket).alias("m"))
    k = float(_LC_BUCKETS)
    est = -k * F.log(F.lit(1.0) - F.col("m").cast("double") / k)
    return occ.select(
        F.col("m").alias("occupied_buckets"),
        F.round(est.cast("decimal(20,6)"), 1).cast("double").alias(
            "approx_distinct"
        ),
    )


@_register("token_counts", tx.TOKEN_COUNTS_SQL)
def token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace + BPE-ish regex token counting with fertility ratio."""
    return tx.token_counts(fx._read(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# classic multi-join analytics (shipping priority / local supplier volume
# shapes): deeper join trees under one aggregation, AQE-ordered
# ---------------------------------------------------------------------------

@_register(
    "shipping_priority",
    f"""
SELECT l.l_orderkey,
       {_ms("l.l_extendedprice * (1 - l.l_discount)")} AS revenue,
       o.o_orderdate,
       o.o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND CAST(o.o_orderdate AS DATE) < DATE '1998-03-15'
  AND CAST(l.l_shipdate AS DATE) > DATE '1998-03-15'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, l.l_orderkey ASC
LIMIT 10
""",
)
def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-table join with filters on every input (all pushed to the scans),
    one aggregation, global top-10 via TakeOrderedAndProject."""
    c = fx._read(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = fx._read(spark, sf_dir, "orders").where(
        F.to_date("o_orderdate") < F.lit("1998-03-15").cast("date")
    )
    li = fx._read(spark, sf_dir, "lineitem").where(
        F.to_date("l_shipdate") > F.lit("1998-03-15").cast("date")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            money_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@_register(
    "local_supplier_volume",
    f"""
SELECT n.n_name,
       {_ms("l.l_extendedprice * (1 - l.l_discount)")} AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND CAST(o.o_orderdate AS DATE) >= DATE '1996-01-01'
  AND CAST(o.o_orderdate AS DATE) < DATE '1997-01-01'
GROUP BY n.n_name
ORDER BY revenue DESC, n.n_name ASC
""",
)
def local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """6-table join: two large facts plus supplier and the bounded
    nation/region dims, the customer-nation = supplier-nation condition
    riding the supplier join; one aggregation on a 25-value key.

    Supplier carries no broadcast hint: it scales with SF, so a forced
    hint would override AQE's size check and OOM executors at 100 TB.
    AQE still picks a broadcast join at any SF where supplier fits
    under the threshold; nation/region are genuinely bounded (25/5
    rows) and keep their hints."""
    c = fx._read(spark, sf_dir, "customer")
    o = fx._read(spark, sf_dir, "orders").where(
        (F.to_date("o_orderdate") >= F.lit("1996-01-01").cast("date"))
        & (F.to_date("o_orderdate") < F.lit("1997-01-01").cast("date"))
    )
    li = fx._read(spark, sf_dir, "lineitem")
    s = fx._read(spark, sf_dir, "supplier")
    n = fx._read(spark, sf_dir, "nation")
    r = fx._read(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(
            s,
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            money_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


# ---------------------------------------------------------------------------
# as-of join (operators/asof.py): every event annotated with the latest
# at-or-before 'purchase' value of the same user
# ---------------------------------------------------------------------------

from .operators.asof import asof_join  # noqa: E402


@_register(
    "events_asof_last_purchase",
    f"""
WITH {fx.EVENTS_STREAM_CTE.strip()},
lt AS (
  SELECT event_id, ts, user_id, event_type, value,
         1 AS _side, CAST(NULL AS DOUBLE) AS _pv
  FROM events_norm
),
rt AS (
  SELECT event_id, ts, user_id, CAST(NULL AS VARCHAR) AS event_type,
         CAST(NULL AS DOUBLE) AS value, 0 AS _side, value AS _pv
  FROM events_norm WHERE event_type = 'purchase'
),
combined AS (SELECT * FROM lt UNION ALL BY NAME SELECT * FROM rt),
filled AS (
  SELECT *,
         last_value(_pv IGNORE NULLS) OVER (
           PARTITION BY user_id
           ORDER BY ts, _side, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS last_purchase_value
  FROM combined
)
SELECT event_id, ts, user_id, event_type, value, last_purchase_value
FROM filled
WHERE _side = 1
""",
)
def events_asof_last_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join demo: events ⋈asof purchases per user (at-or-before
    event time, deterministic tie-break on event_id)."""
    ev = fx.events_stream(spark, sf_dir)
    purchases = ev.where(F.col("event_type") == "purchase")
    return asof_join(
        ev,
        purchases,
        key="user_id",
        ts="ts",
        tiebreak="event_id",
        value_col="value",
        out_col="last_purchase_value",
    )


# ---------------------------------------------------------------------------
# range join via time-bucketing (operators/rangejoin.py)
# ---------------------------------------------------------------------------

from .operators import rangejoin as rj  # noqa: E402


@_register(
    "orders_in_promo_windows",
    f"""
WITH {rj.PROMO_WINDOWS_SQL.strip()}
SELECT p.promo_id,
       p.rate,
       COUNT(*) AS order_count,
       {_ms("o.o_totalprice")} AS total_price
FROM orders o
JOIN promos p
  ON CAST(o.o_orderdate AS DATE) >= p.start_dt
 AND CAST(o.o_orderdate AS DATE) < p.end_dt
GROUP BY p.promo_id, p.rate
""",
)
def orders_in_promo_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join rewritten as a bucketed equi-join (the oracle runs the
    naive BETWEEN join — same result, quadratic plan)."""
    return rj.orders_in_promo_windows(spark, fx._read(spark, sf_dir, "orders"))


# ---------------------------------------------------------------------------
# hierarchical rollup: monthly re-aggregated FROM daily partials — the
# continuous-aggregate / hypertable-rollup pattern. At scale the daily
# relation is a materialized incremental table; correctness requires the
# re-aggregation of partials to equal the direct aggregate, which the
# oracle checks (daily decimal sums round-trip double->decimal exactly at
# these magnitudes, so sum-of-daily == direct sum bit-for-bit).
# ---------------------------------------------------------------------------

@_register(
    "monthly_from_daily_rollup",
    f"""
WITH {fx.SALES_CTE.strip()},
daily AS (
  SELECT trans_dt,
         store_key,
         {_ds("sales_amt")} AS day_amt,
         {_m("SUM(sales_qty)")} AS day_qty
  FROM sales
  GROUP BY 1, 2
)
SELECT CAST(year(trans_dt) * 100 + month(trans_dt) AS INTEGER) AS yr_mnth_num,
       store_key,
       {_ms("day_amt")} AS total_sales_amt,
       {_m("SUM(day_qty)")} AS total_sales_qty,
       COUNT(*) AS active_days
FROM daily
GROUP BY 1, 2
""",
)
def monthly_from_daily_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level rollup: daily partials -> monthly, plus a day-grain
    metric (active_days) only the hierarchy can provide."""
    s = fx.sales(spark, sf_dir)
    daily = s.groupBy("trans_dt", "store_key").agg(
        decimal_sum(F.col("sales_amt")).alias("day_amt"),
        money(F.sum("sales_qty")).alias("day_qty"),
    )
    return (
        daily.groupBy(
            (F.year("trans_dt") * 100 + F.month("trans_dt"))
            .cast("int")
            .alias("yr_mnth_num"),
            "store_key",
        )
        .agg(
            money_sum(F.col("day_amt")).alias("total_sales_amt"),
            money(F.sum("day_qty")).alias("total_sales_qty"),
            F.count(F.lit(1)).alias("active_days"),
        )
    )


@_register(
    "weekly_category_sales",
    f"""
WITH {fx.SALES_CTE.strip()},
{fx.PRODUCT_CTE.strip()},
agg AS (
  SELECT {_W_TRANS} AS yr_wk_num,
         prod_key,
         {_ds("sales_amt")} AS amt
  FROM sales
  GROUP BY 1, 2
)
SELECT a.yr_wk_num,
       p.category_name,
       {_ms("a.amt")} AS total_sales_amt,
       COUNT(*) AS product_count
FROM agg a
JOIN product p ON a.prod_key = p.prod_key
GROUP BY 1, 2
""",
)
def weekly_category_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate-THEN-join: the fact is rolled up to (week, product)
    BEFORE the product dim joins in, so the join probes the compact
    aggregate instead of every fact row — the right order at 100 TB when
    the dim attributes aren't needed inside the aggregation itself."""
    s = retail.add_week(fx.sales(spark, sf_dir), "trans_dt")
    agg = s.groupBy("yr_wk_num", "prod_key").agg(
        decimal_sum(F.col("sales_amt")).alias("amt")
    )
    p = fx.product_dim(spark, sf_dir)
    return (
        agg.join(F.broadcast(p), "prod_key", "inner")
        .groupBy("yr_wk_num", "category_name")
        .agg(
            money_sum(F.col("amt")).alias("total_sales_amt"),
            F.count(F.lit(1)).alias("product_count"),
        )
    )


# ---------------------------------------------------------------------------
# deterministic stratified sampling — rand()-based sampling is
# irreproducible across runs and engines; hashing the stable key gives the
# identical sample everywhere and survives task retries. Rates per stratum
# (language), shared between both sides.
# ---------------------------------------------------------------------------

_SAMPLE_RATES: dict[str, int] = {"en": 50, "de": 25, "fr": 25, "es": 25, "zh": 25}


def _rate_case_sql() -> str:
    whens = " ".join(
        f"WHEN lang = '{l}' THEN {r}" for l, r in _SAMPLE_RATES.items()
    )
    return f"CASE {whens} ELSE 0 END"


@_register(
    "documents_stratified_sample",
    f"""
WITH rated AS (
  SELECT doc_id,
         lang,
         n_chars,
         CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
           % 100 AS h
  FROM documents
)
SELECT doc_id, lang, n_chars
FROM rated
WHERE h < {_rate_case_sql()}
""",
)
def documents_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language sampling rates via a hash of the stable key: the
    selected set is a pure function of the data — rerunnable, engine-
    independent, retry-safe (none of which rand()-sampling gives)."""
    docs = fx._read(spark, sf_dir, "documents")
    h = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10)
        .cast("bigint")
        % 100
    )
    rate = F.lit(0)
    for lang, r in _SAMPLE_RATES.items():
        rate = F.when(F.col("lang") == lang, F.lit(r)).otherwise(rate)
    return docs.select("doc_id", "lang", "n_chars").where(h < rate)


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

from pyspark.sql.window import Window  # noqa: E402

from .functions.weeks import yr_wk_num  # noqa: E402

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

from .sources.synthetic import (  # noqa: E402
    SYNTHETIC_ORACLE_CTE,
    register_synthetic_source,
)

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

from .operators import behavior as bh  # noqa: E402


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
    from .functions.ordered import ntile_from_rank, with_global_rank

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
    from .functions.ordered import with_running_sum

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
    from .operators.text import tokens as _tokens

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
    from .schemas import sales_schema

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
    from .schemas import sales_schema

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
    from .functions.skew import salted_agg

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


# ---------------------------------------------------------------------------
# Corpus-preparation operators (operators/corpus.py): chunking, repetition
# profiling, eval-set contamination, corpus shape statistics — the
# document-level transforms between raw ingestion and tokenization.
# ---------------------------------------------------------------------------

from .operators import corpus as cp  # noqa: E402


@_register("doc_chunks", cp.DOC_CHUNKS_SQL)
def doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping fixed-width chunks, one row per (doc, chunk) — the
    sequence+explode pretraining chunker. Map-only (no shuffle): output
    partitioning follows the input scan at any corpus size."""
    return cp.doc_chunks(fx._read(spark, sf_dir, "documents"))


@_register("word_repetition", cp.WORD_REPETITION_SQL)
def word_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document repetition profile (token totals, distinct count, top
    token + ratio) — the degenerate-repetition quality signal. Two compact
    exchanges of post-partial-agg (doc_id, tok, cnt) rows; raw text never
    shuffles."""
    return cp.word_repetition(fx._read(spark, sf_dir, "documents"))


@_register("eval_contamination", cp.EVAL_CONTAMINATION_SQL)
def eval_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram contamination of a held-out eval split vs the training
    corpus: equi-join on 60-bit shingle fingerprints (never text); the
    eval side is 1/EVAL_MOD of the data, so AQE broadcasts it when it
    fits."""
    return cp.eval_contamination(fx._read(spark, sf_dir, "documents"))


@_register("token_length_histogram", cp.TOKEN_LENGTH_HISTOGRAM_SQL)
def token_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-length histogram by language — bounded-key (lang × bucket)
    two-phase aggregate; exact BIGINT sums divided at the end keep the
    averages bit-stable across engines and partition counts."""
    return cp.token_length_histogram(fx._read(spark, sf_dir, "documents"))


@_register("ann_batch_topk", sim.ann_batch_topk_sql())
def ann_batch_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched brute-force cosine top-k: one corpus scan scores a bounded
    broadcast batch of query vectors; per-query top-k via a rank window
    whose rn <= k filter pushes below the shuffle (WindowGroupLimit), so
    the exchange moves O(|Q|*k*tasks) rows, not |corpus|×|Q|."""
    return sim.ann_batch_topk(fx._read(spark, sf_dir, "embeddings"))


@_register("boilerplate_spans", cp.BOILERPLATE_SPANS_SQL)
def boilerplate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document boilerplate fraction — share of shingles occurring in
    >= BOILERPLATE_MIN_DOCS distinct docs. Join-free: document frequency
    is a count window over the shingle partition (same shuffle a
    groupBy(sh) would cost, no shingle recomputation), then one per-doc
    roll-up; plan-locked to three exchanges."""
    return cp.boilerplate_spans(fx._read(spark, sf_dir, "documents"))


@_register("corpus_split", cp.CORPUS_SPLIT_SQL)
def corpus_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 90/5/5 train/val/test split via multiplicative hash
    of doc_id (stable across runs/engines/partitionings, unlike
    randomSplit) + per-(split, source) doc/token/char stats — one
    bounded-key aggregate."""
    return cp.corpus_split(fx._read(spark, sf_dir, "documents"))


@_register("documents_epoch_shuffle", cp.epoch_shuffle_prefix_sql((1, 2), 64))
def documents_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-epoch corpus shuffle (training-loader order):
    each epoch is a different multiplicative-hash permutation of the
    same documents, reproducible across runs/engines/partitionings —
    the property rand(seed) does NOT have (its output depends on
    partitioning). The query emits the first 64 docs of epochs 1 and 2;
    both prefixes run as TakeOrdered top-k merges, and the oracle
    replays the identical hash arithmetic."""
    return cp.epoch_shuffle_prefix(
        fx._read(spark, sf_dir, "documents"), epochs=(1, 2), k=64
    )


@_register("documents_arrow_byte_profile", tx.ARROW_BYTE_PROFILE_SQL)
def documents_arrow_byte_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source byte/codepoint accounting via mapInArrow — the
    zero-copy RecordBatch exchange shape (no pandas materialization);
    pyarrow.compute binary_length/utf8_length kernels, bounded
    per-source aggregate on top."""
    return tx.arrow_byte_profile(fx._read(spark, sf_dir, "documents"))


@_register("shingle_novelty", cp.SHINGLE_NOVELTY_SQL)
def shingle_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document novelty: share of shingles whose first occurrence
    (min doc_id) is this document — marginal-contribution ranking for
    corpus trimming. Join-free: min(doc_id) as a window over the shingle
    partition, then one per-doc roll-up; plan-locked to three
    exchanges."""
    return cp.shingle_novelty(fx._read(spark, sf_dir, "documents"))


@_register("label_centroid_similarity", sim.LABEL_CENTROID_SQL)
def label_centroid_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise cosine between per-label centroids (cluster coherence).
    Cosine's scale-invariance lets the plan skip the mean: decimal-exact
    component SUMS give the identical cosine with order-independent
    accumulation. One bounded-key (label × dim) aggregate + a |labels|²
    broadcast pairing."""
    return sim.label_centroid_similarity(fx._read(spark, sf_dir, "embeddings"))


@_register("embedding_quantize", sim.EMBEDDING_QUANTIZE_SQL)
def embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector min-max int8 quantization with a cross-engine-exact
    code checksum — pure row-local projection, no shuffle; explicit
    floor(z+0.5) rounding because round() tie modes differ between
    engines."""
    return sim.embedding_quantize(fx._read(spark, sf_dir, "embeddings"))


@_register(
    "customer_nation_salted",
    f"""
SELECT n.n_name,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       {_ms("c.c_acctbal")} AS total_acctbal
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
""",
)
def customer_nation_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resistant dim join through functions.skew.salted_broadcast_left:
    the big side is salted 16 ways and the dim replicated across salts, so
    a hot nation key spreads over 16 tasks instead of one. Salting is
    result-neutral (same rows, different placement) — the oracle is the
    plain join. At 100 TB this is the manual fallback when AQE's skew-join
    splitting can't apply (e.g. the skewed side feeds an aggregation in
    the same stage)."""
    from .functions.skew import salted_broadcast_left

    c = fx._read(spark, sf_dir, "customer").withColumnRenamed(
        "c_nationkey", "nk"
    )
    n = fx._read(spark, sf_dir, "nation").withColumnRenamed(
        "n_nationkey", "nk"
    )
    joined = salted_broadcast_left(c, n, "nk")
    return joined.groupBy("n_name").agg(
        F.count(F.lit(1)).alias("n_customers"),
        money_sum(F.col("c_acctbal")).alias("total_acctbal"),
    )


@_register(
    "document_vector_profile",
    f"""
WITH e AS (
  SELECT vec_id,
         label,
         sqrt(list_dot_product({{v}}, {{v}})) AS norm
  FROM embeddings
)
SELECT d.lang,
       e.label,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(round(CAST(SUM(CAST(norm AS DECIMAL(30,15)))
                       / COUNT(*) AS DECIMAL(20,9)), 6) AS DOUBLE)
         AS avg_norm,
       CAST(SUM(d.n_chars) AS BIGINT) AS total_chars
FROM documents d JOIN e ON d.doc_id = e.vec_id
GROUP BY 1, 2
""".format(v="list_transform(embedding, x -> CAST(x AS DOUBLE))"),
)
def document_vector_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modal join: documents ⋈ embeddings on doc_id = vec_id, rolled
    up per (lang, label) with a decimal-exact average vector norm. The
    norm is row-local double math (deterministic fold); only the exact
    DECIMAL sum crosses rows, so the result is partition-order-independent.
    At scale this is a co-partitionable equi-join on the shared id — the
    canonical text-table-meets-vector-table shape; both sides bucket by
    the same key in a real deployment, making it shuffle-free."""
    from .operators.similarity import _vectors, dot

    d = fx._read(spark, sf_dir, "documents")
    e = _vectors(fx._read(spark, sf_dir, "embeddings")).select(
        "vec_id",
        "label",
        F.sqrt(dot(F.col("v"), F.col("v"))).alias("norm"),
    )
    return (
        d.join(e, d.doc_id == e.vec_id)
        .groupBy("lang", "label")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(
                (
                    F.sum(F.col("norm").cast("decimal(30,15)"))
                    / F.count(F.lit(1))
                ).cast("decimal(20,9)"),
                6,
            )
            .cast("double")
            .alias("avg_norm"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


@_register(
    "token_length_percentiles",
    f"""
WITH d AS (
  SELECT source, len({{tokens}}) AS n_tokens FROM documents
)
SELECT source,
       quantile_disc(n_tokens, 0.25) AS tok_p25,
       quantile_disc(n_tokens, 0.50) AS tok_p50,
       quantile_disc(n_tokens, 0.90) AS tok_p90,
       quantile_disc(n_tokens, 0.99) AS tok_p99
FROM d
GROUP BY source
""".format(tokens="regexp_split_to_array(trim(text), '\\s+')"),
)
def token_length_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token-length distribution (p25/p50/p90/p99) via
    approx_percentile — the mergeable Greenwald-Khanna sketch, so the
    shuffle carries one bounded sketch per (source) instead of the raw
    length column, and the same query degrades gracefully from exact (at
    fixture scale, below the accuracy parameter) to rank-error <=
    1/accuracy at corpus scale. The sequence-length histogram every
    training-mix decision starts from.

    Cross-engine convention note (ADVICE r2): the oracle pairs this with
    DuckDB ``quantile_disc``. Both engines return an ACTUAL element of
    the group (discrete quantile), but their rank conventions differ:
    Spark's GK sketch returns the smallest value whose rank >= ceil(p*N),
    while quantile_disc uses the type-7-style index floor(p*(N-1)).
    For some (N, p) the two pick adjacent order statistics — e.g. N=10,
    p=0.25 -> GK rank 3 vs quantile_disc index floor(2.25)=2 (the 3rd
    element either way), but N=4, p=0.5 -> GK 2nd vs disc floor(1.5)=1
    -> 2nd as well; divergence appears when p*N is integral. The fixture
    groups (500 docs, 20 sources) don't hit a divergent combination; if
    a future fixture does, pin both sides to an explicit
    ``ceil(p*N)``-th order statistic via a rank window instead of
    treating it as a correctness bug in either engine."""
    from .operators.text import token_count

    acc = 1_000_000
    d = fx._read(spark, sf_dir, "documents").select(
        "source", token_count(F.col("text")).alias("n_tokens")
    )
    return d.groupBy("source").agg(
        *[
            F.expr(f"approx_percentile(n_tokens, {p}, {acc})").alias(a)
            for p, a in [
                (0.25, "tok_p25"),
                (0.50, "tok_p50"),
                (0.90, "tok_p90"),
                (0.99, "tok_p99"),
            ]
        ]
    )


# ---------------------------------------------------------------------------
# PII scrubbing + URL/domain analytics (operators/text.py): training-data
# hygiene passes. The fixture corpus contains no PII-shaped strings, so
# both engines deterministically AUGMENT each doc with synthetic
# email/card/ip/phone/url substrings derived from doc_id before the
# operator runs — the same both sides, so the redaction/extraction
# automata are genuinely exercised and oracle-checked (the clean-corpus
# alternative would verify an identity map).
# ---------------------------------------------------------------------------

_PII_AUG_SQL = (
    "text || ' contact user' || CAST(doc_id AS VARCHAR)"
    " || '@example.com ip 10.0.' || CAST(doc_id % 256 AS VARCHAR)"
    " || '.7 call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
    " || ' card 4111 1111 1111 1111.'"
)


@_register(
    "pii_scrub",
    f"""
WITH augmented AS (
  SELECT doc_id, {_PII_AUG_SQL} AS text FROM documents
)
SELECT doc_id,
       {tx.scrub_pii_sql("text").replace("AS scrubbed", "AS scrubbed_text")}
FROM augmented
""",
)
def pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex PII redaction (emails, card numbers, IPv4, phone runs) with
    per-rule match counts. Map-only JVM regexp chain — no shuffle; the
    patterns live in the Java-regex/RE2 common subset so the oracle runs
    the identical automaton."""
    d = fx._read(spark, sf_dir, "documents")
    aug = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com ip 10.0."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(".7 call 555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            F.lit(" card 4111 1111 1111 1111."),
        ).alias("text"),
    )
    out = tx.scrub_pii(aug)
    return out.select(
        "doc_id",
        "n_email",
        "n_card",
        "n_ipv4",
        "n_phone",
        F.col("scrubbed").alias("scrubbed_text"),
    )


_URL_AUG_SQL = (
    "text || ' see https://docs' || CAST(doc_id % 10 AS VARCHAR)"
    " || '.example.org/p/' || CAST(doc_id AS VARCHAR)"
    " || ' and http://mirror' || CAST(doc_id % 3 AS VARCHAR)"
    " || '.example.net/q?x=' || CAST(doc_id % 7 AS VARCHAR)"
)


@_register(
    "url_domains",
    tx.DOMAIN_STATS_SQL.replace("FROM documents", "FROM aug_documents")
    .replace(
        "WITH urls AS (",
        f"WITH aug_documents AS (\n  SELECT doc_id, {_URL_AUG_SQL} AS text"
        " FROM documents\n),\nurls AS (",
    )
    .format(text="text"),
)
def url_domains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain link profile: regexp_extract_all -> executor-side
    explode -> one hash aggregation on the domain key."""
    d = fx._read(spark, sf_dir, "documents")
    aug = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" see https://docs"),
            (F.col("doc_id") % 10).cast("string"),
            F.lit(".example.org/p/"),
            F.col("doc_id").cast("string"),
            F.lit(" and http://mirror"),
            (F.col("doc_id") % 3).cast("string"),
            F.lit(".example.net/q?x="),
            (F.col("doc_id") % 7).cast("string"),
        ).alias("text"),
    )
    return tx.domain_stats(aug)


# ---------------------------------------------------------------------------
# Z-order clustering key (functions/zorder.py): the Morton interleave that
# zorder_write clusters files by, verified cell-by-cell against a DuckDB
# replica of the same bit arithmetic. The scale bounds are plan constants
# (in production: table statistics); 8 bits/dim keeps the demo grid
# readable while the operator itself goes to 16 bits x 3 dims.
# ---------------------------------------------------------------------------

_Z_BITS = 8
_Z_CELLS = (1 << _Z_BITS) - 1
_Z_VLO, _Z_VHI = 0.0, 500.0  # events.value domain bound (stats-derived)
_Z_ULO, _Z_UHI = 0.0, 256.0  # events.user_id domain bound


def _z_scale_sql(expr: str, lo: float, hi: float) -> str:
    return (
        f"GREATEST(0, LEAST({_Z_CELLS}, CAST(floor("
        f"(CAST({expr} AS DOUBLE) - {lo}) / {hi - lo} * {_Z_CELLS} + 0.5"
        f") AS BIGINT)))"
    )


@_register(
    "events_zorder_cells",
    f"""
WITH scaled AS (
  SELECT {_z_scale_sql("user_id", _Z_ULO, _Z_UHI)} AS u,
         {_z_scale_sql("value", _Z_VLO, _Z_VHI)} AS v
  FROM events
),
z AS (
  SELECT {zo.zvalue_sql(["u", "v"], _Z_BITS)} AS zval FROM scaled
)
SELECT CAST(zval >> {_Z_BITS} AS BIGINT) AS z_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(MIN(zval) AS BIGINT) AS z_min,
       CAST(MAX(zval) AS BIGINT) AS z_max
FROM z
GROUP BY 1
""",
)
def events_zorder_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton-key cell histogram over events (user_id x value): the exact
    clustering key ``zorder_write`` lays files out by, as a pure codegen
    shift/mask expression — bit-identical to the DuckDB replica."""
    e = fx._read(spark, sf_dir, "events")
    u = zo.scale_to_bits(F.col("user_id"), _Z_ULO, _Z_UHI, _Z_BITS)
    v = zo.scale_to_bits(F.col("value"), _Z_VLO, _Z_VHI, _Z_BITS)
    z = zo.zvalue([u, v], _Z_BITS)
    return (
        e.select(z.alias("zval"))
        .groupBy(
            F.shiftright("zval", _Z_BITS).cast("bigint").alias("z_bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("zval").cast("bigint").alias("z_min"),
            F.max("zval").cast("bigint").alias("z_max"),
        )
    )


# ---------------------------------------------------------------------------
# time-series RANGE-frame window: trailing 7-day moving average of daily
# store revenue. The frame is a RANGE over an integer day index (not ROWS),
# so gaps in the calendar shrink the window honestly; the window is
# partitioned by store — parallel across stores, never a global sort. The
# frame sum runs in exact DECIMAL so the two engines' different sliding-
# aggregation strategies (running accumulation vs segment tree) cannot
# diverge in the last ulp before the cents rounding.
# ---------------------------------------------------------------------------


@_register(
    "store_revenue_7d_ma",
    f"""
WITH {fx.SALES_CTE.strip()},
daily AS (
  SELECT store_key,
         trans_dt,
         CAST(trans_dt - DATE '1970-01-01' AS BIGINT) AS day_idx,
         SUM(CAST(sales_amt AS DECIMAL(30,6))) AS rev_dec
  FROM sales
  GROUP BY 1, 2, 3
)
SELECT store_key,
       trans_dt,
       CAST(round(rev_dec, 2) AS DOUBLE) AS daily_rev,
       {_m("CAST(SUM(rev_dec) OVER w AS DOUBLE) / COUNT(*) OVER w")}
         AS ma_7d,
       CAST(COUNT(*) OVER w AS BIGINT) AS n_days_7d
FROM daily
WINDOW w AS (
  PARTITION BY store_key
  ORDER BY day_idx
  RANGE BETWEEN 6 PRECEDING AND CURRENT ROW
)
""",
)
def store_revenue_7d_ma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day moving average of daily revenue per store (RANGE
    frame on a day index, partitioned by store)."""
    s = fx.sales(spark, sf_dir)
    daily = s.groupBy(
        "store_key",
        "trans_dt",
        F.datediff("trans_dt", F.lit("1970-01-01").cast("date")).alias(
            "day_idx"
        ),
    ).agg(F.sum(F.col("sales_amt").cast("decimal(30,6)")).alias("rev_dec"))
    w = (
        Window.partitionBy("store_key")
        .orderBy("day_idx")
        .rangeBetween(-6, Window.currentRow)
    )
    return daily.select(
        "store_key",
        "trans_dt",
        F.round("rev_dec", 2).cast("double").alias("daily_rev"),
        money(
            F.sum("rev_dec").over(w).cast("double")
            / F.count(F.lit(1)).over(w)
        ).alias("ma_7d"),
        F.count(F.lit(1)).over(w).cast("bigint").alias("n_days_7d"),
    )


# ---------------------------------------------------------------------------
# referential-integrity audit: orphan counts for every FK edge of the
# star schema in ONE relation. Each child table is scanned ONCE with all
# its parent key-sets left-joined in the same pass (markers), so the
# seven edges cost four fact/dim scans; bounded-cardinality parents
# (nation, region) are broadcast, big parents go through the planner's
# shuffle join + AQE. Output: one row per edge.
# ---------------------------------------------------------------------------


def _orphan_sql(child: str, ck: str, parent: str, pk: str, extra: str = "") -> str:
    return f"""
SELECT '{child}.{ck}->{parent}.{pk}' AS fk_edge,
       CAST(COUNT(*) AS BIGINT) AS n_child_rows,
       CAST(SUM(CASE WHEN NOT EXISTS (
           SELECT 1 FROM {parent} p WHERE p.{pk} = c.{ck}
         ) THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans
FROM {child} c{extra}"""


@_register(
    "fk_orphans_audit",
    " UNION ALL ".join(
        [
            _orphan_sql("lineitem", "l_orderkey", "orders", "o_orderkey"),
            _orphan_sql("lineitem", "l_partkey", "part", "p_partkey"),
            _orphan_sql("lineitem", "l_suppkey", "supplier", "s_suppkey"),
            _orphan_sql("orders", "o_custkey", "customer", "c_custkey"),
            _orphan_sql("customer", "c_nationkey", "nation", "n_nationkey"),
            _orphan_sql("supplier", "s_nationkey", "nation", "n_nationkey"),
            _orphan_sql("nation", "n_regionkey", "region", "r_regionkey"),
        ]
    )
    + " ORDER BY fk_edge",
)
def fk_orphans_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orphan-row counts for all seven FK edges of the star schema
    (``operators/integrity.py``): each child table scanned once for ALL
    its parents, per-edge rows unioned."""
    from .operators.integrity import FkEdge, orphan_counts

    def t(name: str) -> DataFrame:
        return fx._read(spark, sf_dir, name)

    groups = [
        (
            t("lineitem"),
            [
                FkEdge(
                    "l_orderkey", t("orders"), "o_orderkey",
                    "lineitem.l_orderkey->orders.o_orderkey",
                ),
                FkEdge(
                    "l_partkey", t("part"), "p_partkey",
                    "lineitem.l_partkey->part.p_partkey",
                ),
                FkEdge(
                    "l_suppkey", t("supplier"), "s_suppkey",
                    "lineitem.l_suppkey->supplier.s_suppkey",
                ),
            ],
        ),
        (
            t("orders"),
            [
                FkEdge(
                    "o_custkey", t("customer"), "c_custkey",
                    "orders.o_custkey->customer.c_custkey",
                )
            ],
        ),
        (
            t("customer"),
            [
                FkEdge(
                    "c_nationkey", t("nation"), "n_nationkey",
                    "customer.c_nationkey->nation.n_nationkey",
                    broadcast=True,
                )
            ],
        ),
        (
            t("supplier"),
            [
                FkEdge(
                    "s_nationkey", t("nation"), "n_nationkey",
                    "supplier.s_nationkey->nation.n_nationkey",
                    broadcast=True,
                )
            ],
        ),
        (
            t("nation"),
            [
                FkEdge(
                    "n_regionkey", t("region"), "r_regionkey",
                    "nation.n_regionkey->region.r_regionkey",
                    broadcast=True,
                )
            ],
        ),
    ]
    out = None
    for child, edges in groups:
        part = orphan_counts(child, edges)
        out = part if out is None else out.unionByName(part)
    return out.orderBy("fk_edge")


# ---------------------------------------------------------------------------
# snapshot reconciliation (operators/reconcile.py): anti-entropy diff of
# two table versions by (key, md5 fingerprint) pairs. The "new" snapshot
# is derived deterministically from lineitem in-query (drops, mutations,
# inserts keyed off order/part keys) so both engines diff the same pair
# of relations; fingerprint inputs are ints/strings only (raw doubles
# render differently as VARCHAR between engines).
# ---------------------------------------------------------------------------

_RECON_FP_COLS = ["q_int", "l_returnflag", "l_linestatus"]
_RECON_OLD_CTE = f"""
old AS (
  SELECT l_orderkey, l_linenumber,
         CAST(floor(l_quantity) AS BIGINT) AS q_int,
         l_returnflag, l_linestatus
  FROM lineitem
)"""
_RECON_NEW_CTE = """
new AS (
  -- deletes: every 97th order; mutations: quantity bump on part%31;
  -- inserts: shifted-linenumber clones of every 89th order
  SELECT l_orderkey, l_linenumber,
         CASE WHEN l_partkey % 31 = 0 THEN CAST(floor(l_quantity) AS BIGINT) + 1
              ELSE CAST(floor(l_quantity) AS BIGINT) END AS q_int,
         l_returnflag, l_linestatus
  FROM lineitem WHERE l_orderkey % 97 <> 0
  UNION ALL
  SELECT l_orderkey, l_linenumber + 100,
         CAST(floor(l_quantity) AS BIGINT), l_returnflag, l_linestatus
  FROM lineitem WHERE l_orderkey % 89 = 0
)"""


@_register(
    "lineitem_snapshot_diff",
    f"""
WITH {_RECON_OLD_CTE.strip()},
{_RECON_NEW_CTE.strip()},
o AS (
  SELECT l_orderkey, l_linenumber,
         {rc.row_fingerprint_sql(_RECON_FP_COLS)} AS fp_old
  FROM old
),
n AS (
  SELECT l_orderkey, l_linenumber,
         {rc.row_fingerprint_sql(_RECON_FP_COLS)} AS fp_new
  FROM new
)
SELECT CASE WHEN fp_old IS NULL THEN 'added'
            WHEN fp_new IS NULL THEN 'removed'
            WHEN fp_old <> fp_new THEN 'changed'
            ELSE 'unchanged' END AS status,
       CAST(COUNT(*) AS BIGINT) AS n_keys
FROM o FULL OUTER JOIN n USING (l_orderkey, l_linenumber)
GROUP BY 1
""",
)
def lineitem_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-entropy diff of lineitem vs a simulated next-day snapshot:
    added/removed/changed/unchanged key counts via (key, md5) pairs."""
    from .operators.reconcile import snapshot_diff

    li = fx._read(spark, sf_dir, "lineitem")
    q_int = F.floor("l_quantity").cast("bigint")
    old = li.select(
        "l_orderkey",
        "l_linenumber",
        q_int.alias("q_int"),
        "l_returnflag",
        "l_linestatus",
    )
    kept = li.filter(F.col("l_orderkey") % 97 != 0).select(
        "l_orderkey",
        "l_linenumber",
        F.when(F.col("l_partkey") % 31 == 0, q_int + 1)
        .otherwise(q_int)
        .alias("q_int"),
        "l_returnflag",
        "l_linestatus",
    )
    inserted = li.filter(F.col("l_orderkey") % 89 == 0).select(
        "l_orderkey",
        (F.col("l_linenumber") + 100).alias("l_linenumber"),
        q_int.alias("q_int"),
        "l_returnflag",
        "l_linestatus",
    )
    new = kept.unionByName(inserted)
    return snapshot_diff(
        old,
        new,
        ["l_orderkey", "l_linenumber"],
        [F.col(c) for c in _RECON_FP_COLS],
    )


# ---------------------------------------------------------------------------
# bitwise activity bitmap: per-user weekday activity as one integer (bit
# i = active on ISO weekday i), rolled up to a distribution of users by
# active-day count. Bitmap aggregation (bit_or) is THE compact rollup for
# presence-style facts at 100 TB: the per-user state is 4 bytes whatever
# the event volume, partials combine map-side, and bit_count replaces a
# count_distinct expansion.
# ---------------------------------------------------------------------------


@_register(
    "user_activity_bitmap",
    f"""
WITH {fx.EVENTS_STREAM_CTE.strip()},
per_user AS (
  SELECT user_id,
         bit_or(1 << (isodow(ts) - 1)) AS mask
  FROM events_norm
  GROUP BY user_id
)
SELECT CAST(bit_count(mask) AS INTEGER) AS n_active_weekdays,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(MIN(mask) AS INTEGER) AS min_mask,
       CAST(MAX(mask) AS INTEGER) AS max_mask
FROM per_user
GROUP BY 1
""",
)
def user_activity_bitmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Users by number of distinct active ISO weekdays, via bit_or of a
    7-bit weekday mask (Spark ``weekday`` = 0-Monday = DuckDB isodow-1)."""
    ev = fx.events_stream(spark, sf_dir)
    # SQL shiftleft: the Python wrapper only takes a literal bit count
    per = ev.groupBy("user_id").agg(
        F.bit_or(F.expr("shiftleft(1, weekday(ts))")).alias("mask")
    )
    return per.groupBy(
        F.bit_count("mask").cast("int").alias("n_active_weekdays")
    ).agg(
        F.count(F.lit(1)).alias("n_users"),
        F.min("mask").cast("int").alias("min_mask"),
        F.max("mask").cast("int").alias("max_mask"),
    )


# ---------------------------------------------------------------------------
# corpus trigram frequency table (the canonical MapReduce workload): word
# 3-grams via posexplode + lead() windows (native, codegen — HOF lambdas
# are interpreted), two-phase count on the gram string, top-k via
# TakeOrdered with a full deterministic tiebreak. At 100 TB the shuffle
# carries (gram, partial count) pairs and the top-k merge moves
# k x partitions rows — never the full gram table.
# ---------------------------------------------------------------------------

_TRIGRAM_K = 100


@_register(
    "trigram_topk",
    f"""
WITH grams AS (
  SELECT t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS gram
  FROM (
    SELECT doc_id, {tx.TOKENS_SQL.format(c="text")} AS t FROM documents
  ) AS d, unnest(range(1, len(t) - 1)) AS r(i)
)
SELECT gram, CAST(COUNT(*) AS BIGINT) AS n
FROM grams
GROUP BY gram
ORDER BY n DESC, gram ASC
LIMIT {_TRIGRAM_K}
""",
)
def trigram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{k} corpus word trigrams by frequency (deterministic
    count-desc, gram-asc order)."""
    from pyspark.sql import Window as W

    d = fx._read(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.posexplode(tx.tokens(F.col("text"))).alias("pos", "tok")
    )
    w = W.partitionBy("doc_id").orderBy("pos")
    t1 = F.lead("tok", 1).over(w)
    t2 = F.lead("tok", 2).over(w)
    grams = toks.select(
        F.concat_ws(" ", F.col("tok"), t1, t2).alias("gram"),
        t2.alias("_last"),
    ).where(F.col("_last").isNotNull())
    return (
        grams.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("gram"))
        .limit(_TRIGRAM_K)
    )


# ---------------------------------------------------------------------------
# language-ID evaluation: confusion counts of predicted vs labeled lang.
# Pure re-aggregation of the language_id projection (map-only) into one
# bounded-key hash agg (|langs|² cells) — the classifier-eval pattern at
# corpus scale: the expensive per-doc scoring never leaves the scan
# stage, only (true, pred, partial count) triples shuffle.
# ---------------------------------------------------------------------------


@_register(
    "language_id_confusion",
    f"""
WITH scored AS ({tx.LANGUAGE_ID_SQL.strip()})
SELECT lang_true,
       lang_pred,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN lang_true = lang_pred THEN 1 ELSE 0 END)
            AS BIGINT) AS n_correct
FROM scored
GROUP BY 1, 2
""",
)
def language_id_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion-cell counts for the stopword-marker language classifier
    against the fixtures' ground-truth ``lang`` label."""
    scored = tx.language_id(fx._read(spark, sf_dir, "documents"))
    return scored.groupBy("lang_true", "lang_pred").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(
            F.when(F.col("lang_true") == F.col("lang_pred"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_correct"),
    )


# ---------------------------------------------------------------------------
# unpivot/melt: the weekly rollup reshaped long — (grain, metric, value)
# — the standard feed for metric stores and plotting layers. Spark's
# unpivot/stack is a zero-shuffle projection: each input row fans out to
# |metrics| rows inside the scan stage, and the expensive part (the
# rollup itself) is the same single-shuffle aggregate it always was.
# ---------------------------------------------------------------------------


@_register(
    "weekly_rollup_long",
    f"""
WITH {fx.SALES_CTE.strip()},
wide AS (
  SELECT {_W_TRANS} AS yr_wk_num,
         store_key,
         prod_key,
         {_m("SUM(sales_qty)")} AS total_sales_qty,
         {_ms("sales_amt")} AS total_sales_amt,
         {_ms("sales_cost")} AS total_sales_cost
  FROM sales
  GROUP BY 1, 2, 3
)
SELECT yr_wk_num, store_key, prod_key, metric, value
FROM wide
UNPIVOT (value FOR metric IN (
  total_sales_qty, total_sales_amt, total_sales_cost
))
""",
)
def weekly_rollup_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The weekly rollup melted to (grain, metric, value) via unpivot —
    a map-side fan-out above the same single-shuffle aggregate."""
    s = retail.add_week(fx.sales(spark, sf_dir), "trans_dt")
    wide = s.groupBy("yr_wk_num", "store_key", "prod_key").agg(
        money(F.sum("sales_qty")).alias("total_sales_qty"),
        money_sum(F.col("sales_amt")).alias("total_sales_amt"),
        money_sum(F.col("sales_cost")).alias("total_sales_cost"),
    )
    return wide.unpivot(
        ["yr_wk_num", "store_key", "prod_key"],
        ["total_sales_qty", "total_sales_amt", "total_sales_cost"],
        "metric",
        "value",
    )


# ---------------------------------------------------------------------------
# median aggregation (per brand): F.median and DuckDB median both take
# the midpoint average on even counts — aligned through the money hop.
# At scale median is a per-group sort of group-local values (same class
# as exact percentiles); approx_percentile is the mergeable-sketch swap.
# ---------------------------------------------------------------------------


@_register(
    "brand_price_median",
    f"""
SELECT p_brand,
       {_m("median(p_retailprice)")} AS median_price,
       CAST(COUNT(*) AS BIGINT) AS n_parts
FROM part
GROUP BY p_brand
""",
)
def brand_price_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median retail price per brand (midpoint interpolation on even
    counts in both engines)."""
    p = fx._read(spark, sf_dir, "part")
    return p.groupBy("p_brand").agg(
        money(F.median("p_retailprice")).alias("median_price"),
        F.count(F.lit(1)).alias("n_parts"),
    )


# ---------------------------------------------------------------------------
# blocked string similarity: near-identical part names via a BLOCKING-KEY
# equi-join (shared head noun) + Levenshtein verify — the scalable shape
# for fuzzy matching: candidate pairs come from an equi-join on a cheap
# key, the O(len²) edit distance runs only on candidates, and the
# all-pairs cross join never exists. Same architecture as the MinHash
# band join, for strings instead of shingle sets.
# ---------------------------------------------------------------------------

_LEV_MAX = 4


@_register(
    "similar_part_names",
    f"""
WITH names AS (
  SELECT DISTINCT p_name,
         split_part(p_name, ' ', 2) AS block_key
  FROM part
)
SELECT a.p_name AS name_a,
       b.p_name AS name_b,
       CAST(levenshtein(a.p_name, b.p_name) AS INTEGER) AS edit_dist
FROM names a
JOIN names b
  ON a.block_key = b.block_key AND a.p_name < b.p_name
WHERE levenshtein(a.p_name, b.p_name) <= {_LEV_MAX}
""",
)
def similar_part_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-identical part-name pairs: block on the shared noun, verify
    with Levenshtein <= {k} — candidate-only edit distance.

    Recall contract: candidates are DEFINED by the block (same-noun
    family) — cross-noun pairs are out of scope even when their raw edit
    distance is small, the standard entity-resolution trade where the
    blocking key encodes the match intent. A guaranteed-recall variant
    needs an overlap-style scheme (q-gram pigeonhole blocks, like the
    SimHash 4-block join) at ~q× the candidate volume."""
    names = (
        fx._read(spark, sf_dir, "part")
        .select("p_name")
        .distinct()
        .withColumn("block_key", F.split_part(F.col("p_name"), F.lit(" "), F.lit(2)))
    )
    a = names.alias("a")
    b = names.alias("b")
    lev = F.levenshtein(F.col("a.p_name"), F.col("b.p_name"))
    return (
        a.join(
            b,
            (F.col("a.block_key") == F.col("b.block_key"))
            & (F.col("a.p_name") < F.col("b.p_name")),
        )
        .where(lev <= _LEV_MAX)
        .select(
            F.col("a.p_name").alias("name_a"),
            F.col("b.p_name").alias("name_b"),
            lev.cast("int").alias("edit_dist"),
        )
    )


# ---------------------------------------------------------------------------
# per-store missing sales days — counted arithmetically (span minus
# distinct active days) on both engines; the day-spine densification
# pattern (sequence + explode) lives where the gap ROWS are actually
# consumed, store_revenue_interpolated.
# ---------------------------------------------------------------------------


@_register(
    "missing_sales_days",
    f"""
WITH {fx.SALES_CTE.strip()}
SELECT store_key,
       CAST(MAX(trans_dt) - MIN(trans_dt) + 1 AS BIGINT) AS n_days_span,
       CAST(COUNT(DISTINCT trans_dt) AS BIGINT) AS n_active_days,
       CAST(MAX(trans_dt) - MIN(trans_dt) + 1
            - COUNT(DISTINCT trans_dt) AS BIGINT) AS n_missing_days
FROM sales
GROUP BY store_key
""",
)
def missing_sales_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-store gap count inside the store's own [first, last] sales
    window — as PURE ARITHMETIC: span = max - min + 1, missing = span -
    distinct active days. One aggregation, no spine.

    This query used to materialize the day spine (sequence+explode) and
    anti-join the actual days back, only to COUNT the leftovers — 8x
    slower at sf0.1 for the identical result (the oracle was always the
    arithmetic form). The lesson is the plan-shape one: densify only
    when downstream needs the gap ROWS (store_revenue_interpolated
    does — that is where the spine pattern lives now)."""
    s = fx.sales(spark, sf_dir).select("store_key", "trans_dt")
    return s.groupBy("store_key").agg(
        (
            F.datediff(F.max("trans_dt"), F.min("trans_dt")) + 1
        ).cast("bigint").alias("n_days_span"),
        F.count_distinct("trans_dt").cast("bigint").alias("n_active_days"),
        (
            F.datediff(F.max("trans_dt"), F.min("trans_dt"))
            + 1
            - F.count_distinct("trans_dt")
        ).cast("bigint").alias("n_missing_days"),
    )


# ---------------------------------------------------------------------------
# pandas-on-Spark surface (pyspark.pandas): the same relational work
# through the pandas API, compiling to the identical Catalyst plan — the
# migration path for pandas-shaped code. Scale guards: the default-index
# type is forced to 'distributed' (the default 'sequence' index builds a
# GLOBAL order — exactly the empty-partition window this repo bans), and
# the result returns to a plain DataFrame via to_spark() so nothing
# driver-side materializes.
# ---------------------------------------------------------------------------


@_register(
    "pandas_api_brand_profile",
    """
SELECT p_brand,
       CAST(COUNT(*) AS BIGINT) AS n_parts,
       AVG(p_size) AS avg_size,
       CAST(MAX(p_retailprice) AS DOUBLE) AS max_price
FROM part
GROUP BY p_brand
""",
)
def pandas_api_brand_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brand profile via the pandas API on Spark (groupby/agg/reset_index
    -> to_spark). The mean is exact in double (integer sums < 2^53), so
    no decimal hop is needed."""
    import pyspark.pandas as ps

    # option_context, not set_option: the index-type choice must not leak
    # to other pandas-on-Spark users in the process. The conversion goes
    # through fx._read so the fixture path convention and session confs
    # stay in one place.
    with ps.option_context("compute.default_index_type", "distributed"):
        pdf = fx._read(spark, sf_dir, "part").pandas_api()
        out = (
            pdf.groupby("p_brand")
            .agg(
                n_parts=("p_partkey", "count"),
                avg_size=("p_size", "mean"),
                max_price=("p_retailprice", "max"),
            )
            .reset_index()
        )
        sdf = out.to_spark()
    return sdf.select(
        "p_brand",
        F.col("n_parts").cast("bigint"),
        "avg_size",
        F.col("max_price").cast("double"),
    )


# ---------------------------------------------------------------------------
# incremental aggregate maintenance (operators/incremental.py): the weekly
# rollup produced by MERGING two independently-computed partial states
# (history ∪ delta) instead of one scan — shares the direct rollup's
# oracle, so the driver proves merge(partials(A), partials(B)) ==
# direct(A ∪ B) bit-for-bit. The run-over-run pattern that makes a daily
# 100 TB pipeline O(delta), not O(history).
# ---------------------------------------------------------------------------


@_register("incremental_weekly_rollup", _ROLLUP_ORACLE)
def incremental_weekly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly rollup via mergeable partials: the fact is split into two
    disjoint 'runs' (orderkey parity stands in for history vs today),
    each aggregated to partial state independently, the states merged,
    then finalized — decimal partials make the merge exact on any
    grouping of runs."""
    from .operators.incremental import (
        finalize_rollup,
        merge_partials,
        rollup_partials,
    )

    s = retail.add_week(fx.sales(spark, sf_dir), "trans_dt")
    history = s.filter(F.col("trans_id") % 2 == 0)
    today = s.filter(F.col("trans_id") % 2 == 1)
    state = merge_partials(rollup_partials(history), rollup_partials(today))
    return finalize_rollup(state)


# ---------------------------------------------------------------------------
# URL canonicalization + URL-level dedup (operators/text.py): messy URL
# variants (mixed-case host, utm params, fragments, trailing slashes)
# collapse to one canonical resource before dedup — the standard web-
# corpus step ahead of content dedup. Variants are synthesized from
# doc_id (fixtures carry no URLs) the same way on both engines; the
# canonicalization chain is map-only regexp work.
# ---------------------------------------------------------------------------

_URL_VARIANT_SQL = """
CASE doc_id % 4
  WHEN 0 THEN 'https://Docs' || CAST(doc_id % 50 AS VARCHAR)
              || '.Example.org/res/' || CAST(doc_id % 50 AS VARCHAR)
  WHEN 1 THEN 'https://docs' || CAST(doc_id % 50 AS VARCHAR)
              || '.example.org/res/' || CAST(doc_id % 50 AS VARCHAR)
              || '?utm_source=feed'
  WHEN 2 THEN 'https://docs' || CAST(doc_id % 50 AS VARCHAR)
              || '.example.org/res/' || CAST(doc_id % 50 AS VARCHAR)
              || '#section2'
  ELSE 'HTTPS://DOCS' || CAST(doc_id % 50 AS VARCHAR)
              || '.EXAMPLE.ORG/res/' || CAST(doc_id % 50 AS VARCHAR) || '/'
END
"""


@_register(
    "url_canonical_dedup",
    f"""
WITH raw AS (
  SELECT doc_id, {_URL_VARIANT_SQL.strip()} AS url FROM documents
)
SELECT {tx.canonicalize_url_sql("url")} AS canonical_url,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT url) AS BIGINT) AS n_variants,
       CAST(MIN(doc_id) AS BIGINT) AS keeper_doc_id
FROM raw
GROUP BY 1
""",
)
def url_canonical_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-level dedup after canonicalization: per canonical resource,
    how many docs and raw variants collapse onto it, and the
    deterministic keeper (min doc_id)."""
    d = fx._read(spark, sf_dir, "documents")
    n = (F.col("doc_id") % 50).cast("string")
    variant = (
        F.when(
            F.col("doc_id") % 4 == 0,
            F.concat(F.lit("https://Docs"), n, F.lit(".Example.org/res/"), n),
        )
        .when(
            F.col("doc_id") % 4 == 1,
            F.concat(
                F.lit("https://docs"), n, F.lit(".example.org/res/"), n,
                F.lit("?utm_source=feed"),
            ),
        )
        .when(
            F.col("doc_id") % 4 == 2,
            F.concat(
                F.lit("https://docs"), n, F.lit(".example.org/res/"), n,
                F.lit("#section2"),
            ),
        )
        .otherwise(
            F.concat(
                F.lit("HTTPS://DOCS"), n, F.lit(".EXAMPLE.ORG/res/"), n,
                F.lit("/"),
            )
        )
    )
    raw = d.select("doc_id", variant.alias("url"))
    return raw.groupBy(
        tx.canonicalize_url(F.col("url")).alias("canonical_url")
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_distinct("url").alias("n_variants"),
        F.min("doc_id").alias("keeper_doc_id"),
    )


# ---------------------------------------------------------------------------
# Iterative graph analytics (operators/graph.py): fixed-point PageRank
# over the part co-purchase graph — bounded unrolled loop of equi-joins,
# exact integer arithmetic so both engines agree bit-for-bit.
# ---------------------------------------------------------------------------

from .operators import graph as gph  # noqa: E402


def _copurchase_edges_shared(
    spark: SparkSession, sf_dir: str, supported: bool = False
) -> DataFrame:
    """The co-purchase edge relation all five graph queries derive from,
    materialized ONCE per (session, sf_dir, variant) via
    graph.materialized_edges — the lineitem self-join (+ distinct /
    support aggregation) is the dominant shared cost of the family
    (BENCH_DIFF_r05 triage), and a persisted relation cannot carry
    across queries because bench clearCache()s between them."""
    li = fx._read(spark, sf_dir, "lineitem")
    if supported:
        return gph.materialized_edges(
            spark,
            f"copurchase-supported:{sf_dir}",
            lambda: gph.copurchase_edges_supported(li),
        )
    return gph.materialized_edges(
        spark, f"copurchase:{sf_dir}", lambda: gph.copurchase_edges(li)
    )


@_register("part_copurchase_pagerank", gph.pagerank_oracle_sql(iterations=5, k=20))
def part_copurchase_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 parts by PageRank over the co-purchase graph (parts that
    appear in the same order). 5 iterations of the exact fixed-point
    recurrence (operators/graph.py) — the iterative-DataFrame-loop
    pattern: one persisted adjacency relation, one shuffle per
    iteration, TakeOrdered final top-k. Extends the reference's join
    surface (SURVEY.md §2.4) to iterative graph algorithms."""
    edges = _copurchase_edges_shared(spark, sf_dir)
    return gph.pagerank_topk(edges, iterations=5, k=20)


# ---------------------------------------------------------------------------
# Deterministic weighted sampling (operators/sampling.py): priority
# sampling — the sample is a pure projection + bounded per-group top-k,
# reproducible on any engine/partitioning.
# ---------------------------------------------------------------------------

from .operators import sampling as sp  # noqa: E402


@_register(
    "documents_weighted_sample",
    f"""
WITH staged AS (
  SELECT source, doc_id, n_chars,
         {sp.priority_sql("doc_id", "n_chars")} AS priority
  FROM documents
),
ranked AS (
  SELECT source, doc_id, n_chars, CAST(priority AS BIGINT) AS priority,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY source ORDER BY priority DESC, doc_id ASC
         ) AS INTEGER) AS sample_rank
  FROM staged
)
SELECT * FROM ranked WHERE sample_rank <= 3
""",
)
def documents_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-weighted 3-per-source document sample via deterministic
    priority sampling (Duffield-Lund-Thorup): integer priorities from a
    multiplicative hash, per-group rank window (WindowGroupLimit pushes
    the top-k below the shuffle). Complements the uniform
    documents_stratified_sample with the weighted variant every
    training-mix builder needs."""
    d = fx._read(spark, sf_dir, "documents").select("source", "doc_id", "n_chars")
    return sp.sample_per_group(d, "source", "doc_id", "n_chars", k=3)


# ---------------------------------------------------------------------------
# Exact heavy hitters with Misra-Gries pruning (operators/frequent.py):
# two-pass plan that never shuffles the full vocabulary; the oracle is
# the plain exact GROUP BY because pass 2 recounts exactly.
# ---------------------------------------------------------------------------

from .operators import frequent as fq  # noqa: E402


@_register(
    "heavy_hitter_tokens",
    """
WITH toks AS (
  SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
  FROM documents
),
tot AS (SELECT COUNT(*) AS n FROM toks)
SELECT tok,
       CAST(COUNT(*) AS BIGINT) AS term_freq,
       CAST((COUNT(*) * 1000000) // MAX(tot.n) AS BIGINT) AS freq_ppm
FROM toks, tot
GROUP BY tok
HAVING COUNT(*) * 1000 >= MAX(tot.n)
""",
)
def heavy_hitter_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokens with corpus frequency >= 0.1%, exact, via the two-pass
    Misra-Gries plan: bounded per-partition MG candidates (pass 1,
    mapInPandas, <= k keys shuffled per task), exact broadcast-semi-join
    recount of candidates only (pass 2). The oracle is the naive exact
    GROUP BY — identical results, different shuffle volume."""
    d = fx._read(spark, sf_dir, "documents")
    toks = d.select(F.explode(tx.tokens(F.col("text"))).alias("tok"))
    return fq.exact_heavy_hitters(toks, "tok", denom=1000, k=2000)


# ---------------------------------------------------------------------------
# Mergeable-sketch distinct rollup: daily linear-counting bucket partials
# union-merged to monthly — the sketch algebra (union of occupied
# buckets) expressed relationally, exact on both engines. Companion to
# approx_distinct_parts (global LC) and incremental_weekly_rollup
# (mergeable decimal partials).
# ---------------------------------------------------------------------------

_LC_CUST_BUCKETS = 4096


@_register(
    "monthly_distinct_customers_lc",
    f"""
WITH daily AS (
  SELECT DISTINCT CAST(strftime(o_orderdate, '%Y%m') AS INTEGER) AS order_month,
         o_orderdate AS order_day,
         CAST(('0x' || substring(md5(CAST(o_custkey AS VARCHAR)), 1, 15))
              AS BIGINT) % {_LC_CUST_BUCKETS} AS bucket
  FROM orders
),
monthly AS (
  SELECT order_month, COUNT(DISTINCT bucket) AS m
  FROM daily GROUP BY order_month
),
exact AS (
  SELECT CAST(strftime(o_orderdate, '%Y%m') AS INTEGER) AS order_month,
         CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_distinct
  FROM orders GROUP BY 1
)
SELECT m.order_month,
       CAST(m.m AS BIGINT) AS occupied_buckets,
       CAST(round(CAST(-{_LC_CUST_BUCKETS}
                       * ln(1.0 - CAST(m.m AS DOUBLE) / {_LC_CUST_BUCKETS})
                       AS DECIMAL(20,6)), 1) AS DOUBLE) AS approx_distinct,
       e.exact_distinct
FROM monthly m JOIN exact e ON m.order_month = e.order_month
""",
)
def monthly_distinct_customers_lc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly distinct-customer estimate by MERGING daily linear-counting
    partials (distinct (day, bucket) -> distinct bucket per month): the
    mergeable-sketch rollup pattern — daily partials are computed once
    and reused by any coarser grain, so the monthly estimate costs a
    union of 4096-bucket sets instead of a re-scan of raw orders. The
    exact per-month count rides alongside for error visibility. Sketch
    arithmetic is integer/closed-form on both engines -> bit-exact
    oracle parity (same construction as approx_distinct_parts)."""
    o = fx._read(spark, sf_dir, "orders")
    month = (F.year("o_orderdate") * 100 + F.month("o_orderdate")).cast("integer")
    bucket = (
        F.conv(F.substring(F.md5(F.col("o_custkey").cast("string")), 1, 15), 16, 10)
        .cast("bigint")
        % _LC_CUST_BUCKETS
    )
    daily = (
        o.select(
            month.alias("order_month"),
            F.col("o_orderdate").alias("order_day"),
            bucket.alias("bucket"),
        )
        .distinct()
    )
    monthly = daily.groupBy("order_month").agg(
        F.count_distinct("bucket").alias("m")
    )
    exact = o.groupBy(month.alias("order_month")).agg(
        F.count_distinct("o_custkey").alias("exact_distinct")
    )
    est = (
        F.round(
            (
                -F.lit(float(_LC_CUST_BUCKETS))
                * F.log(F.lit(1.0) - F.col("m") / F.lit(float(_LC_CUST_BUCKETS)))
            ).cast("decimal(20,6)"),
            1,
        )
    ).cast("double")
    return monthly.join(exact, "order_month").select(
        "order_month",
        F.col("m").cast("bigint").alias("occupied_buckets"),
        est.alias("approx_distinct"),
        "exact_distinct",
    )


# ---------------------------------------------------------------------------
# Count-min sketch (operators/sketches.py): bounded-state frequency
# estimates, relational construction, estimate >= truth invariant checked
# row-by-row against the exact counts.
# ---------------------------------------------------------------------------

from .operators import sketches as sk  # noqa: E402

_CMS_PROBE_FILTER = "doc_id % 97 = 0"


@_register(
    "cms_token_estimates",
    f"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
  FROM documents
),
cells AS (
{sk.cms_cells_sql("tok", "toks")}
),
sketch AS (
  SELECT j, cell, CAST(COUNT(*) AS BIGINT) AS cnt FROM cells GROUP BY 1, 2
),
probes AS (
  SELECT DISTINCT tok FROM toks WHERE {_CMS_PROBE_FILTER}
),
pc AS (
{sk.cms_cells_sql("tok", "probes", keep=("tok",))}
),
est AS (
  SELECT pc.tok, MIN(s.cnt) AS cms_estimate
  FROM pc JOIN sketch s ON pc.j = s.j AND pc.cell = s.cell
  GROUP BY pc.tok
),
tru AS (
  SELECT t.tok, CAST(COUNT(*) AS BIGINT) AS term_freq
  FROM toks t JOIN probes p ON t.tok = p.tok
  GROUP BY t.tok
)
SELECT e.tok, e.cms_estimate, t.term_freq,
       CAST(e.cms_estimate - t.term_freq AS BIGINT) AS overcount
FROM est e JOIN tru t ON e.tok = t.tok
""",
)
def cms_token_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch over the token stream (4x1024 integer-hashed
    counters, bounded state), probed with a deterministic token sample
    and joined against exact counts — the overcount column materializes
    the CMS invariant (estimate >= truth, always) for the oracle to
    verify. Sketch build is one bounded groupBy; probing is a broadcast
    join of the d*w counter table."""
    d = fx._read(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(tx.tokens(F.col("text"))).alias("tok"))
    sketch = sk.cms_build(toks, "tok")
    probes = toks.where(F.expr(_CMS_PROBE_FILTER)).select("tok").distinct()
    est = sk.cms_estimate(sketch, probes, "tok")
    tru = (
        toks.join(F.broadcast(probes), "tok", "inner")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("term_freq"))
    )
    return est.join(tru, "tok").select(
        "tok",
        "cms_estimate",
        "term_freq",
        (F.col("cms_estimate") - F.col("term_freq")).cast("bigint").alias("overcount"),
    )


# ---------------------------------------------------------------------------
# k-anonymity audit (operators/privacy.py): release-risk over
# quasi-identifiers, one hash aggregation.
# ---------------------------------------------------------------------------

from .operators import expectations as ex  # noqa: E402
from .operators import privacy as pv  # noqa: E402

_KANON_K = 3
_KANON_CLS = """
cls AS (
  SELECT c_mktsegment, c_nationkey,
         CAST(floor(c_acctbal / 1000) AS INTEGER) AS bal_band,
         COUNT(*) AS class_size
  FROM customer
  GROUP BY 1, 2, 3
)"""


def _kanon_base(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = fx._read(spark, sf_dir, "customer")
    return c.withColumn(
        "bal_band", F.floor(F.col("c_acctbal") / 1000).cast("integer")
    )


@_register(
    "k_anonymity_customers",
    f"""
WITH {_KANON_CLS.strip()}
SELECT CAST(COUNT(*) AS BIGINT) AS n_classes,
       CAST(SUM(CASE WHEN class_size < {_KANON_K} THEN 1 ELSE 0 END) AS BIGINT)
         AS violating_classes,
       CAST(SUM(CASE WHEN class_size < {_KANON_K} THEN class_size ELSE 0 END)
            AS BIGINT) AS rows_at_risk,
       CAST(MIN(class_size) AS BIGINT) AS achieved_k
FROM cls
""",
)
def k_anonymity_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row k-anonymity audit of customer over the quasi-identifier
    set (mktsegment, nationkey, acctbal band): is the table safe to
    release at k=3, and if not, how exposed is it."""
    return pv.k_anonymity_summary(
        _kanon_base(spark, sf_dir),
        ["c_mktsegment", "c_nationkey", "bal_band"],
        k=_KANON_K,
    )


@_register(
    "k_anonymity_violating_classes",
    f"""
WITH {_KANON_CLS.strip()}
SELECT c_mktsegment, c_nationkey, bal_band,
       CAST(class_size AS BIGINT) AS class_size,
       CAST({_KANON_K} - class_size AS BIGINT) AS deficit
FROM cls WHERE class_size < {_KANON_K}
""",
)
def k_anonymity_violating_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The equivalence classes that break k=3 — the concrete
    generalize-or-suppress worklist for a release process."""
    return pv.k_anonymity_violations(
        _kanon_base(spark, sf_dir),
        ["c_mktsegment", "c_nationkey", "bal_band"],
        k=_KANON_K,
    ).select(
        "c_mktsegment",
        "c_nationkey",
        "bal_band",
        F.col("class_size").cast("bigint").alias("class_size"),
        F.col("deficit").cast("bigint").alias("deficit"),
    )


# ---------------------------------------------------------------------------
# Higher moments via exact moment sums: skewness/kurtosis with bit-exact
# cross-engine parity (the same shared-expression-string discipline as
# acctbal_stats_by_segment, extended to 3rd/4th moments).
# ---------------------------------------------------------------------------

# shared numeric fragments — the SAME strings run on both engines so the
# double expression trees are identical (IEEE ops on identical exact
# inputs -> identical outputs; pow() is avoided because its rounding is
# implementation-defined, sqrt is correctly-rounded everywhere).
_MMEAN = "(s1 / n)"
_MM2 = f"(s2 / n - {_MMEAN} * {_MMEAN})"
_MM3 = f"(s3 / n - 3 * {_MMEAN} * (s2 / n) + 2 * {_MMEAN} * {_MMEAN} * {_MMEAN})"
_MM4 = (
    f"(s4 / n - 4 * {_MMEAN} * (s3 / n) + 6 * {_MMEAN} * {_MMEAN} * (s2 / n)"
    f" - 3 * {_MMEAN} * {_MMEAN} * {_MMEAN} * {_MMEAN})"
)
_STAT6 = "CAST(round(CAST({x} AS DECIMAL(38,12)), 6) AS DOUBLE)"


@_register(
    "quantity_moments",
    f"""
WITH m AS (
  SELECT l_returnflag,
         CAST(COUNT(*) AS BIGINT) AS n,
         {_ds("l_quantity")} AS s1,
         {_ds("l_quantity * l_quantity")} AS s2,
         {_ds("l_quantity * l_quantity * l_quantity")} AS s3,
         {_ds("l_quantity * l_quantity * l_quantity * l_quantity")} AS s4
  FROM lineitem
  GROUP BY l_returnflag
)
SELECT l_returnflag,
       n AS n_lines,
       {_STAT6.format(x=_MMEAN)} AS mean_qty,
       {_STAT6.format(x=f"sqrt({_MM2})")} AS std_qty,
       {_STAT6.format(x=f"{_MM3} / ({_MM2} * sqrt({_MM2}))")} AS skew_qty,
       {_STAT6.format(x=f"{_MM4} / ({_MM2} * {_MM2}) - 3")} AS kurt_qty
FROM m
""",
)
def quantity_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-returnflag distribution shape (mean/std/skewness/excess
    kurtosis) from ONE aggregation pass of exact decimal moment sums
    S1..S4 — the mergeable-moments pattern: partials combine map-side,
    the shuffle carries 5 numbers per group, and the closed-form
    moment algebra runs on the aggregated row. Spark's builtin
    skewness()/kurtosis() stream doubles in partition order and are NOT
    cross-engine (or even cross-run) bit-stable; exact integer-valued
    sums are."""
    li = fx._read(spark, sf_dir, "lineitem")
    q = F.col("l_quantity")
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        decimal_sum(q).alias("s1"),
        decimal_sum(q * q).alias("s2"),
        decimal_sum(q * q * q).alias("s3"),
        decimal_sum(q * q * q * q).alias("s4"),
    )
    return m.select(
        "l_returnflag",
        F.col("n").alias("n_lines"),
        F.expr(_STAT6.format(x=_MMEAN)).alias("mean_qty"),
        F.expr(_STAT6.format(x=f"sqrt({_MM2})")).alias("std_qty"),
        F.expr(_STAT6.format(x=f"{_MM3} / ({_MM2} * sqrt({_MM2}))")).alias(
            "skew_qty"
        ),
        F.expr(_STAT6.format(x=f"{_MM4} / ({_MM2} * {_MM2}) - 3")).alias(
            "kurt_qty"
        ),
    )


# ---------------------------------------------------------------------------
# cume_dist — the one ranking-family window not yet exercised
# (rank/dense_rank/row_number/ntile/percent_rank all are).
# ---------------------------------------------------------------------------


@_register(
    "order_price_cume_dist",
    """
SELECT o_orderkey, o_orderpriority, o_totalprice,
       cume_dist() OVER (
         PARTITION BY o_orderpriority ORDER BY o_totalprice
       ) AS price_cume_dist
FROM orders
WHERE o_orderdate >= DATE '1997-01-01'
""",
)
def order_price_cume_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cume_dist per priority class: fraction of orders at or below each
    price. Tie-safe by definition (ties share a value independent of row
    order), partitioned by a real key — no global window. The ratio is
    count/count in double: exact on both engines."""
    o = fx._read(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("1997-01-01").cast("date")
    )
    w = (
        Window.partitionBy("o_orderpriority").orderBy("o_totalprice")
    )
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        "o_totalprice",
        F.cume_dist().over(w).alias("price_cume_dist"),
    )


# ---------------------------------------------------------------------------
# Declarative expectations (operators/expectations.py): N named rules,
# one scan, one row per rule.
# ---------------------------------------------------------------------------

_ORDER_RULES_SQL = {
    "orderkey_not_null": "o_orderkey IS NOT NULL",
    "positive_price": "o_totalprice > 0",
    "valid_status": "o_orderstatus IN ('O', 'F', 'P')",
    "date_in_range": "o_orderdate BETWEEN DATE '1992-01-01' AND DATE '1998-12-31'",
    "priority_wellformed": "regexp_matches(o_orderpriority, '^[1-5]-')",
    "custkey_positive": "o_custkey > 0",
}


@_register(
    "orders_expectations",
    "WITH agg AS (\n  SELECT COUNT(*) AS n,\n"
    + ",\n".join(
        f"    SUM(CASE WHEN COALESCE(({cond}), FALSE) THEN 0 ELSE 1 END) AS v_{name}"
        for name, cond in _ORDER_RULES_SQL.items()
    )
    + "\n  FROM orders\n)\n"
    + "\nUNION ALL\n".join(
        f"SELECT '{name}' AS rule, CAST(n AS BIGINT) AS n_rows,"
        f" CAST(v_{name} AS BIGINT) AS violations,"
        f" CAST(((n - v_{name}) * 1000000) // n AS BIGINT) AS pass_ppm FROM agg"
        for name in _ORDER_RULES_SQL
    ),
)
def orders_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative DQ expectations over orders: six named rules compiled
    into ONE conditional-aggregation scan (NULL rule results count as
    violations — three-valued logic made explicit), unpivoted to a row
    per rule with exact ppm pass rates."""
    o = fx._read(spark, sf_dir, "orders")
    rules = {
        "orderkey_not_null": F.col("o_orderkey").isNotNull(),
        "positive_price": F.col("o_totalprice") > 0,
        "valid_status": F.col("o_orderstatus").isin("O", "F", "P"),
        "date_in_range": F.col("o_orderdate").between(
            F.lit("1992-01-01").cast("date"), F.lit("1998-12-31").cast("date")
        ),
        "priority_wellformed": F.col("o_orderpriority").rlike("^[1-5]-"),
        "custkey_positive": F.col("o_custkey") > 0,
    }
    return ex.check_expectations(o, rules)


# ---------------------------------------------------------------------------
# Sequence packing + training-mix rebalancing (operators/corpus.py):
# the two arithmetic backbones of corpus assembly.
# ---------------------------------------------------------------------------

from .operators import corpus as cp  # noqa: E402


@_register(
    "packing_index",
    cp.PACKING_INDEX_SQL.format(
        tokens=tx.TOKENS_SQL.format(c="text"), block=cp.PACK_BLOCK_TOKENS
    ),
)
def packing_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk packing index at 512-token blocks: per-source
    running token offsets place every document into its first/last
    training block (documents straddle boundaries — the standard
    pretraining packing). One shuffle on the source key; pure window +
    integer-division arithmetic, bit-stable on any engine."""
    d = fx._read(spark, sf_dir, "documents")
    return cp.packing_index(d, block_tokens=cp.PACK_BLOCK_TOKENS)


@_register(
    "source_mix_weights",
    cp.SOURCE_MIX_SQL.format(tokens=tx.TOKENS_SQL.format(c="text")),
)
def source_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token shares (exact ppm) and the resampling weight that
    rebalances to a uniform source mix — integer arithmetic end-to-end
    so the mix spec is engine- and order-stable."""
    d = fx._read(spark, sf_dir, "documents")
    return cp.source_mix_weights(d)


# ---------------------------------------------------------------------------
# Equi-depth histogram without a global ranking window: exact percentile
# cutpoints (one scalar aggregate) + comparison bucketing (a projection).
# The naive ntile() over an empty partitionBy is banned repo-wide
# (test_no_empty_partition_windows_anywhere) — this is the scale-safe
# equivalent: the only global state is 9 numbers.
# ---------------------------------------------------------------------------

_EQD_PS = [i / 10 for i in range(1, 10)]


@_register(
    "price_equidepth_histogram",
    f"""
WITH cuts AS (
  SELECT quantile_cont(o_totalprice, {_EQD_PS}) AS c FROM orders
),
bucketed AS (
  SELECT 1 + {" + ".join(f"(CASE WHEN o.o_totalprice > cuts.c[{i + 1}] THEN 1 ELSE 0 END)" for i in range(9))}
           AS bucket,
         o.o_totalprice
  FROM orders o, cuts
)
SELECT CAST(bucket AS INTEGER) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       {_m("MIN(o_totalprice)")} AS min_price,
       {_m("MAX(o_totalprice)")} AS max_price
FROM bucketed
GROUP BY 1
""",
)
def price_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-bucket equi-depth histogram of order prices. Cutpoints come
    from ONE scalar percentile aggregate (exact, interpolating — same
    ANSI formula as DuckDB quantile_cont); rows are then bucketed by
    comparing against the 9 broadcast cut values and counted with an
    ordinary groupBy. Total cost: two passes, zero sorts, no
    single-task stage — where ntile()-over-everything would move the
    whole table through one partition."""
    o = fx._read(spark, sf_dir, "orders")
    ps = ", ".join(str(p) for p in _EQD_PS)
    cuts = o.agg(F.expr(f"percentile(o_totalprice, array({ps}))").alias("c"))
    bucket = F.lit(1)
    for i in range(9):
        bucket = bucket + F.when(
            F.col("o_totalprice") > F.col("c").getItem(i), 1
        ).otherwise(0)
    return (
        o.crossJoin(F.broadcast(cuts))
        .select(bucket.cast("integer").alias("bucket"), "o_totalprice")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            money(F.min("o_totalprice")).alias("min_price"),
            money(F.max("o_totalprice")).alias("max_price"),
        )
    )


# ---------------------------------------------------------------------------
# Linear interpolation over the densified day spine: fill silent gaps in
# a store's daily revenue series — the time-series repair step between
# densification (missing_sales_days) and the rolling metrics
# (store_revenue_7d_ma).
# ---------------------------------------------------------------------------


@_register(
    "store_revenue_interpolated",
    f"""
WITH {fx.SALES_CTE.strip()},
daily AS (
  SELECT store_key, trans_dt, {_ms("sales_amt")} AS day_rev
  FROM sales GROUP BY 1, 2
),
span AS (
  SELECT store_key, MIN(trans_dt) AS d0, MAX(trans_dt) AS d1 FROM daily
  GROUP BY 1
),
spine AS (
  SELECT store_key,
         CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
                                     CAST(d1 AS TIMESTAMP),
                                     INTERVAL 1 DAY)) AS DATE) AS cal_dt
  FROM span
),
joined AS (
  SELECT sp.store_key, sp.cal_dt, d.day_rev
  FROM spine sp LEFT JOIN daily d
    ON sp.store_key = d.store_key AND sp.cal_dt = d.trans_dt
),
bracketed AS (
  SELECT store_key, cal_dt, day_rev,
         last_value(day_rev IGNORE NULLS) OVER (
           PARTITION BY store_key ORDER BY cal_dt
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ) AS prev_rev,
         last_value(CASE WHEN day_rev IS NOT NULL THEN cal_dt END IGNORE NULLS)
           OVER (
             PARTITION BY store_key ORDER BY cal_dt
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ) AS prev_dt,
         first_value(day_rev IGNORE NULLS) OVER (
           PARTITION BY store_key ORDER BY cal_dt
           ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING
         ) AS next_rev,
         first_value(CASE WHEN day_rev IS NOT NULL THEN cal_dt END IGNORE NULLS)
           OVER (
             PARTITION BY store_key ORDER BY cal_dt
             ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING
           ) AS next_dt
  FROM joined
)
SELECT store_key, cal_dt,
       {_m("prev_rev + (next_rev - prev_rev)"
           " * (CAST(cal_dt - prev_dt AS DOUBLE)"
           " / CAST(next_dt - prev_dt AS DOUBLE))")} AS interp_rev
FROM bracketed
WHERE day_rev IS NULL AND prev_rev IS NOT NULL AND next_rev IS NOT NULL
""",
)
def store_revenue_interpolated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linearly interpolated revenue for days with NO sales inside each
    store's active span: densify to the day spine (sequence+explode, a
    map-only expansion), bracket each gap with ignore-nulls windows
    (one shuffle on store_key), interpolate in identically-shaped double
    arithmetic on both engines, round via the decimal money hop. Gaps at
    the edges (no bracket) stay unfilled rather than extrapolated."""
    s = fx.sales(spark, sf_dir)
    daily = s.groupBy("store_key", "trans_dt").agg(
        money_sum(F.col("sales_amt")).alias("day_rev")
    )
    span = daily.groupBy("store_key").agg(
        F.min("trans_dt").alias("d0"), F.max("trans_dt").alias("d1")
    )
    spine = span.select(
        "store_key", F.explode(F.sequence("d0", "d1")).alias("cal_dt")
    )
    joined = spine.join(
        daily.withColumnRenamed("trans_dt", "cal_dt"),
        ["store_key", "cal_dt"],
        "left",
    )
    wp = (
        Window.partitionBy("store_key")
        .orderBy("cal_dt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # the FORWARD bracket as a running frame over the REVERSED sort, not
    # first_value over (1 FOLLOWING, UNBOUNDED FOLLOWING): Spark executes
    # an unbounded-FOLLOWING frame by re-scanning to the partition end
    # for every row — O(rows²) per store (measured: 150 s vs 2 s at
    # sf0.1 for this query). A running unbounded-PRECEDING frame is the
    # O(rows) streaming implementation in both directions.
    wn = (
        Window.partitionBy("store_key")
        .orderBy(F.desc("cal_dt"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    known_dt = F.when(F.col("day_rev").isNotNull(), F.col("cal_dt"))
    b = joined.select(
        "store_key",
        "cal_dt",
        "day_rev",
        F.last("day_rev", ignorenulls=True).over(wp).alias("prev_rev"),
        F.last(known_dt, ignorenulls=True).over(wp).alias("prev_dt"),
        F.last("day_rev", ignorenulls=True).over(wn).alias("next_rev"),
        F.last(known_dt, ignorenulls=True).over(wn).alias("next_dt"),
    )
    interp = F.col("prev_rev") + (F.col("next_rev") - F.col("prev_rev")) * (
        F.datediff("cal_dt", "prev_dt").cast("double")
        / F.datediff("next_dt", "prev_dt").cast("double")
    )
    return b.where(
        F.col("day_rev").isNull()
        & F.col("prev_rev").isNotNull()
        & F.col("next_rev").isNotNull()
    ).select("store_key", "cal_dt", money(interp).alias("interp_rev"))


# ---------------------------------------------------------------------------
# Round-4-queue pulled forward: label-propagation communities, chi-square
# association, min-per-group join-back (TPC-H Q2 shape), fixed-weight
# exponential smoothing. (These sit BEHIND the 50-query never-checked
# backlog in the driver window — see __spark_entry__.queries() ordering.)
# ---------------------------------------------------------------------------


@_register("copurchase_communities", gph.label_propagation_oracle_sql(rounds=3))
def copurchase_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community structure of the part co-purchase graph by 3 rounds of
    min-label propagation (operators/graph.py) — a bounded, fully
    relational iteration (pure min-algebra: deterministic at ANY round
    count, converged or not), aggregated to (community, size, member
    range). The relational twin of dedup.connected_components' hybrid."""
    edges = _copurchase_edges_shared(spark, sf_dir)
    labels = gph.min_label_propagation(edges, rounds=3)
    return labels.groupBy(F.col("label").alias("community")).agg(
        F.count(F.lit(1)).alias("n_members"),
        F.min("node").alias("min_member"),
        F.max("node").alias("max_member"),
    )


# --- chi-square association (segment x region) ------------------------------

_CHI2_CELL = "(CAST(o AS DOUBLE) - e) * (CAST(o AS DOUBLE) - e) / e"


@_register(
    "segment_region_chi2",
    f"""
WITH cells AS (
  SELECT c.c_mktsegment AS seg, r.r_name AS region,
         CAST(COUNT(*) AS BIGINT) AS o
  FROM customer c
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  GROUP BY 1, 2
),
rt AS (SELECT seg, CAST(SUM(o) AS BIGINT) AS row_tot FROM cells GROUP BY seg),
ct AS (SELECT region, CAST(SUM(o) AS BIGINT) AS col_tot FROM cells GROUP BY region),
tot AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM cells),
contrib AS (
  SELECT cells.seg, cells.region, cells.o,
         CAST(round(CAST({_CHI2_CELL} AS DECIMAL(38,12)), 6) AS DECIMAL(38,6))
           AS c
  FROM cells
  JOIN rt ON cells.seg = rt.seg
  JOIN ct ON cells.region = ct.region
  CROSS JOIN tot,
  LATERAL (SELECT CAST(row_tot AS DOUBLE) * col_tot / n AS e) x
),
sizes AS (
  SELECT COUNT(DISTINCT seg) AS n_seg, COUNT(DISTINCT region) AS n_reg
  FROM cells
)
SELECT CAST(SUM(c) AS DOUBLE) AS chi2,
       CAST((MAX(n_seg) - 1) * (MAX(n_reg) - 1) AS BIGINT) AS dof,
       CAST(SUM(o) AS BIGINT) AS n_customers
FROM contrib, sizes
""",
)
def segment_region_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square statistic for market-segment x region association.
    Observed counts are exact; expected counts and per-cell (o-e)^2/e
    run in identically-shaped double arithmetic on both engines; each
    cell contribution is rounded IN DECIMAL at 6 places and the final
    chi2 is an exact decimal sum of those — so the statistic is
    bit-stable under any partition/accumulation order (a raw double sum
    of contributions would not be). All relations after the first
    groupBy are bounded (segments x regions)."""
    c = fx._read(spark, sf_dir, "customer")
    n = fx._read(spark, sf_dir, "nation")
    r = fx._read(spark, sf_dir, "region")
    cells = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("c_mktsegment").alias("seg"), F.col("r_name").alias("region"))
        .agg(F.count(F.lit(1)).alias("o"))
    )
    rt = cells.groupBy("seg").agg(F.sum("o").alias("row_tot"))
    ct = cells.groupBy("region").agg(F.sum("o").alias("col_tot"))
    tot = cells.agg(F.sum("o").alias("n"))
    sizes = cells.agg(
        F.count_distinct("seg").alias("n_seg"),
        F.count_distinct("region").alias("n_reg"),
    )
    contrib = (
        cells.join(F.broadcast(rt), "seg")
        .join(F.broadcast(ct), "region")
        .crossJoin(F.broadcast(tot))
        .withColumn("e", F.expr("CAST(row_tot AS DOUBLE) * col_tot / n"))
        .withColumn(
            "c",
            F.expr(
                f"CAST(round(CAST({_CHI2_CELL} AS DECIMAL(38,12)), 6)"
                " AS DECIMAL(38,6))"
            ),
        )
    )
    return (
        contrib.agg(
            F.sum("c").cast("double").alias("chi2"),
            F.sum("o").cast("bigint").alias("n_customers"),
        )
        .crossJoin(F.broadcast(sizes))
        .select(
            "chi2",
            ((F.col("n_seg") - 1) * (F.col("n_reg") - 1))
            .cast("bigint")
            .alias("dof"),
            "n_customers",
        )
    )


# --- min-per-group + join-back (TPC-H Q2 shape) -----------------------------


@_register(
    "cheapest_supplier_per_part",
    f"""
WITH mins AS (
  SELECT l_partkey, MIN(l_extendedprice) AS min_price
  FROM lineitem GROUP BY l_partkey
),
best AS (
  SELECT l.l_partkey, m.min_price,
         MIN(l.l_suppkey) AS s_suppkey
  FROM lineitem l
  JOIN mins m
    ON l.l_partkey = m.l_partkey AND l.l_extendedprice = m.min_price
  GROUP BY 1, 2
)
SELECT b.l_partkey AS p_partkey,
       {_m("b.min_price")} AS min_price,
       b.s_suppkey,
       s.s_name
FROM best b JOIN supplier s ON b.s_suppkey = s.s_suppkey
""",
)
def cheapest_supplier_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cheapest observed supplier per part (TPC-H Q2's correlated
    min-subquery shape): min-per-group aggregate, equi-join BACK on
    (key, min-value) to recover the attribution row, deterministic
    min-suppkey tie-break, then the supplier dim join. The join-back on
    the aggregate value is the classic alternative to a rank window —
    two compact shuffles on l_partkey (the aggregate and the join reuse
    the same partitioning) and the probe side carries only
    (part, price, supp). The raw double join key is safe cross-engine:
    both sides compare the UNROUNDED stored value (money rounding only
    in the final projection)."""
    li = fx._read(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_extendedprice", "l_suppkey"
    )
    s = fx._read(spark, sf_dir, "supplier")
    # the aggregate's key is re-aliased: mins derives from li, and a
    # same-name equality predicate on a self-derived relation collapses
    # to trivially-true (Spark resolves both sides to the same attribute)
    mins = li.groupBy(F.col("l_partkey").alias("mp_partkey")).agg(
        F.min("l_extendedprice").alias("min_price")
    )
    best = (
        li.join(
            mins,
            (F.col("l_partkey") == F.col("mp_partkey"))
            & (F.col("l_extendedprice") == F.col("min_price")),
        )
        .groupBy("l_partkey", "min_price")
        .agg(F.min("l_suppkey").alias("s_suppkey"))
    )
    return best.join(s, "s_suppkey").select(
        F.col("l_partkey").alias("p_partkey"),
        money(F.col("min_price")).alias("min_price"),
        "s_suppkey",
        "s_name",
    )


# --- fixed-weight exponential smoothing -------------------------------------

#: EWMA(alpha=1/4) truncated at 8 lags: weights 3^j / 4^(j+1) are exact
#: binary doubles, so the weighted sum is bit-identical cross-engine.
_EWMA_W = [(3**j) / (4 ** (j + 1)) for j in range(8)]


@_register(
    "store_revenue_ewma",
    f"""
WITH {fx.SALES_CTE.strip()},
daily AS (
  SELECT store_key, trans_dt, {_ms("sales_amt")} AS day_rev
  FROM sales GROUP BY 1, 2
),
lagged AS (
  SELECT store_key, trans_dt, day_rev,
         {", ".join(f"lag(day_rev, {j}) OVER (PARTITION BY store_key ORDER BY trans_dt) AS l{j}" for j in range(1, 8))}
  FROM daily
)
SELECT store_key, trans_dt,
       {_m("day_rev")} AS day_rev,
       {_m("day_rev * " + repr(_EWMA_W[0]) + " + " + " + ".join(f"l{j} * {_EWMA_W[j]!r}" for j in range(1, 8)))}
         AS ewma_rev
FROM lagged
WHERE l7 IS NOT NULL
""",
)
def store_revenue_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted trailing revenue (alpha=1/4, truncated at
    8 observed days) per store. The geometric weights 3^j/4^(j+1) are
    exact binary fractions, so the fixed-order weighted sum is
    bit-identical across engines — the engine-stable form of exponential
    smoothing (the recursive EWMA is a sequential recurrence whose
    float error depends on history length; the truncated form is a pure
    window projection: ONE shuffle on store_key, 7 lag() columns sharing
    one sort). Rows before the 8th observation are excluded (no partial
    warm-up estimates)."""
    s = fx.sales(spark, sf_dir)
    daily = s.groupBy("store_key", "trans_dt").agg(
        money_sum(F.col("sales_amt")).alias("day_rev")
    )
    w = Window.partitionBy("store_key").orderBy("trans_dt")
    lagged = daily.select(
        "store_key",
        "trans_dt",
        "day_rev",
        *[F.lag("day_rev", j).over(w).alias(f"l{j}") for j in range(1, 8)],
    )
    ewma = F.expr(
        "day_rev * " + repr(_EWMA_W[0])
        + " + "
        + " + ".join(f"l{j} * {_EWMA_W[j]!r}" for j in range(1, 8))
    )
    return lagged.where(F.col("l7").isNotNull()).select(
        "store_key",
        "trans_dt",
        money(F.col("day_rev")).alias("day_rev"),
        money(ewma).alias("ewma_rev"),
    )


# ---------------------------------------------------------------------------
# Market-basket association: pair support + lift over co-purchases.
# ---------------------------------------------------------------------------

_LIFT6 = (
    "CAST(round(CAST(CAST(pair_count AS DOUBLE) * n_orders"
    " / (CAST(cnt_a AS DOUBLE) * cnt_b) AS DECIMAL(38,12)), 6) AS DOUBLE)"
)


@_register(
    "part_pair_lift",
    f"""
WITH basket AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
item AS (
  SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS cnt FROM basket GROUP BY 1
),
tot AS (
  SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders FROM basket
),
pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
         CAST(COUNT(*) AS BIGINT) AS pair_count
  FROM basket a JOIN basket b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
)
SELECT part_a, part_b, pair_count,
       ia.cnt AS cnt_a, ib.cnt AS cnt_b,
       {_LIFT6} AS lift
FROM pairs
JOIN item ia ON pairs.part_a = ia.l_partkey
JOIN item ib ON pairs.part_b = ib.l_partkey
CROSS JOIN tot
ORDER BY pair_count DESC, part_a ASC, part_b ASC
LIMIT 50
""",
)
def part_pair_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 co-purchased part pairs by support, with association lift
    (P(a,b) / P(a)P(b)). The basket self-join fans out per order size
    (bounded), pair/item counts are exact, lift is a ratio of exact
    integers in identically-shaped double arithmetic rounded in decimal
    — engine-stable. Sort keys are integers only (pair_count + the pair
    itself); TakeOrdered, no global sort."""
    li = fx._read(spark, sf_dir, "lineitem")
    basket = li.select("l_orderkey", "l_partkey").distinct()
    item = basket.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("cnt"))
    tot = basket.agg(F.count_distinct("l_orderkey").alias("n_orders"))
    a = basket.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_a"))
    b = basket.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_b"))
    pairs = (
        a.join(b, "ok")
        .where(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("pair_count"))
    )
    ia = item.select(F.col("l_partkey").alias("part_a"), F.col("cnt").alias("cnt_a"))
    ib = item.select(F.col("l_partkey").alias("part_b"), F.col("cnt").alias("cnt_b"))
    out = (
        pairs.join(ia, "part_a")
        .join(ib, "part_b")
        .crossJoin(F.broadcast(tot))
        .select(
            "part_a",
            "part_b",
            "pair_count",
            "cnt_a",
            "cnt_b",
            F.expr(_LIFT6).alias("lift"),
        )
    )
    return out.orderBy(
        F.desc("pair_count"), F.asc("part_a"), F.asc("part_b")
    ).limit(50)


# ---------------------------------------------------------------------------
# Exact discrete percentiles with an EXPLICIT rank convention — the
# hardened twin of token_length_percentiles (ADVICE r2: GK-sketch vs
# quantile_disc rank conventions can disagree by one element; this form
# pins ceil(p*N) on both engines so there is no convention to disagree
# about).
# ---------------------------------------------------------------------------


@_register(
    "token_length_percentiles_exact",
    """
WITH d AS (
  SELECT source, doc_id,
         COALESCE(CAST(len({tokens}) AS BIGINT), 0) AS n_tokens
  FROM documents
),
ranked AS (
  SELECT source, n_tokens,
         ROW_NUMBER() OVER (
           PARTITION BY source ORDER BY n_tokens ASC, doc_id ASC
         ) AS rn,
         COUNT(*) OVER (PARTITION BY source) AS n
  FROM d
)
SELECT source,
       MAX(CASE WHEN rn = (25 * n + 99) // 100 THEN n_tokens END) AS tok_p25,
       MAX(CASE WHEN rn = (50 * n + 99) // 100 THEN n_tokens END) AS tok_p50,
       MAX(CASE WHEN rn = (90 * n + 99) // 100 THEN n_tokens END) AS tok_p90,
       MAX(CASE WHEN rn = (99 * n + 99) // 100 THEN n_tokens END) AS tok_p99
FROM ranked
GROUP BY source
""".format(tokens="regexp_split_to_array(trim(text), '\\s+')"),
)
def token_length_percentiles_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source discrete token-length percentiles as the explicit
    ceil(p*N)-th order statistic (doc_id tie-break): one rank window per
    source + a conditional aggregate — no sketch, no engine-specific
    quantile convention. Use the GK twin (token_length_percentiles) at
    corpus scale; use this one when the percentile must be auditable to
    a rank formula."""
    # NULL text coalesces to 0 tokens on BOTH sides: Spark ranks NULLs
    # first, DuckDB last — with even one NULL the ceil(p*N) rank would
    # land on different rows
    d = fx._read(spark, sf_dir, "documents").select(
        "source",
        "doc_id",
        F.coalesce(tx.token_count(F.col("text")), F.lit(0)).alias("n_tokens"),
    )
    w = Window.partitionBy("source")
    ranked = d.select(
        "source",
        "n_tokens",
        F.row_number()
        .over(w.orderBy(F.asc("n_tokens"), F.asc("doc_id")))
        .alias("rn"),
        F.count(F.lit(1)).over(w).alias("n"),
    )
    def at(p: int, name: str):
        return F.max(
            F.when(F.col("rn") == F.expr(f"({p} * n + 99) div 100"), F.col("n_tokens"))
        ).alias(name)
    return ranked.groupBy("source").agg(
        at(25, "tok_p25"), at(50, "tok_p50"), at(90, "tok_p90"), at(99, "tok_p99")
    )


# ---------------------------------------------------------------------------
# Financial reconciliation: order header total vs recomputed line total.
# Companion to fk_orphans_audit (referential integrity) and
# lineitem_snapshot_diff (anti-entropy) — this is the VALUE-level check.
# ---------------------------------------------------------------------------


@_register(
    "order_total_reconciliation",
    f"""
WITH line_tot AS (
  SELECT l_orderkey,
         {_ms("l_extendedprice * (1 - l_discount) * (1 + l_tax)")}
           AS computed_total,
         CAST(COUNT(*) AS BIGINT) AS n_lines
  FROM lineitem GROUP BY 1
),
joined AS (
  SELECT o.o_orderkey,
         {_m("o.o_totalprice")} AS header_total,
         lt.computed_total,
         {_m("abs(o.o_totalprice - lt.computed_total)")} AS abs_diff
  FROM orders o JOIN line_tot lt ON o.o_orderkey = lt.l_orderkey
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CASE WHEN abs_diff > 0.01 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_mismatched,
       {_m("MAX(abs_diff)")} AS max_abs_diff,
       {_ms("abs_diff")} AS total_abs_drift
FROM joined
""",
)
def order_total_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Header-vs-detail reconciliation: recompute each order's total from
    its lines (extended price with discount and tax, exact decimal sum)
    and compare against the stored header total — count of orders
    drifting beyond a cent, worst drift, and the summed absolute drift.
    One aggregation per side + one equi-join on the order key; every
    money comparison rides the decimal hop so the mismatch COUNT is
    engine-stable (a raw double compare would flip rows at the
    tolerance boundary)."""
    li = fx._read(spark, sf_dir, "lineitem")
    o = fx._read(spark, sf_dir, "orders")
    line_tot = li.groupBy("l_orderkey").agg(
        money_sum(
            F.col("l_extendedprice")
            * (F.lit(1) - F.col("l_discount"))
            * (F.lit(1) + F.col("l_tax"))
        ).alias("computed_total"),
        F.count(F.lit(1)).alias("n_lines"),
    )
    joined = o.join(line_tot, o.o_orderkey == line_tot.l_orderkey).select(
        money(F.col("o_totalprice")).alias("header_total"),
        "computed_total",
        money(F.abs(F.col("o_totalprice") - F.col("computed_total"))).alias(
            "abs_diff"
        ),
    )
    return joined.agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.when(F.col("abs_diff") > 0.01, 1).otherwise(0))
        .cast("bigint")
        .alias("n_mismatched"),
        money(F.max("abs_diff")).alias("max_abs_diff"),
        money_sum(F.col("abs_diff")).alias("total_abs_drift"),
    )


# ---------------------------------------------------------------------------
# API-surface batch: grouped-agg Arrow UDF, metadata columns, null-safe
# join — the remaining DataFrame surfaces the inventory didn't yet touch.
# ---------------------------------------------------------------------------


@_register(
    "priority_weighted_median_price",
    """
WITH w AS (
  SELECT o.o_orderkey, o.o_orderpriority, o.o_totalprice,
         CAST(COUNT(*) AS BIGINT) AS weight
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
  GROUP BY 1, 2, 3
),
ranked AS (
  SELECT o_orderpriority, o_totalprice, weight,
         SUM(weight) OVER (
           PARTITION BY o_orderpriority
           ORDER BY o_totalprice ASC, o_orderkey ASC
         ) AS cum,
         SUM(weight) OVER (PARTITION BY o_orderpriority) AS tot
  FROM w
)
SELECT o_orderpriority,
       MIN(CASE WHEN 2 * cum >= tot THEN o_totalprice END)
         AS weighted_median_price
FROM ranked
GROUP BY o_orderpriority
""",
)
def priority_weighted_median_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Line-count-weighted median order price per priority, computed with
    a GROUPED_AGG Arrow pandas UDF (the one Python-UDF variant the
    inventory hadn't exercised — Arrow-batched per group, never
    per-row). Convention pinned explicitly: the LOWER weighted median
    (smallest price whose cumulative weight reaches half the total,
    cumulating in (price, orderkey) order) — the oracle implements the
    identical rule with a window, which is also the form to prefer at
    100 TB scale (stays in codegen; the UDF exists to cover the API
    surface and as the template for group aggregations SQL can't
    express)."""
    from .operators.pandas_aggs import weighted_median_lower as wmedian

    o = fx._read(spark, sf_dir, "orders")
    li = fx._read(spark, sf_dir, "lineitem")
    w = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderpriority", "o_totalprice")
        .agg(F.count(F.lit(1)).alias("weight"))
    )
    return w.groupBy("o_orderpriority").agg(
        wmedian(
            F.col("o_totalprice"), F.col("weight"), F.col("o_orderkey")
        ).alias("weighted_median_price")
    )


@_register(
    "documents_file_provenance",
    """
SELECT 'documents.parquet' AS file_name,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(MIN(doc_id) AS BIGINT) AS min_doc_id,
       CAST(MAX(doc_id) AS BIGINT) AS max_doc_id
FROM documents
""",
)
def documents_file_provenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row provenance via the hidden ``_metadata`` column: which physical
    file each document came from (basename — stable across scale dirs),
    with per-file row counts and id ranges. The lakehouse audit op for
    'which ingest file produced these rows'; the metadata struct is
    populated by the scan itself, so provenance costs no extra read.
    (The fixture is one file per table, which is what the oracle's
    literal basename encodes.)"""
    d = fx._read(spark, sf_dir, "documents")
    return (
        d.select(
            F.regexp_extract(
                F.col("_metadata.file_path"), r"([^/]+)$", 1
            ).alias("file_name"),
            "doc_id",
        )
        .groupBy("file_name")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
    )


@_register(
    "lang_nullsafe_join",
    """
WITH masked AS (
  SELECT doc_id,
         CASE WHEN lang = 'en' THEN NULL ELSE lang END AS masked_lang
  FROM documents
),
dim AS (
  SELECT masked_lang, CAST(COUNT(*) AS BIGINT) AS lang_docs
  FROM masked GROUP BY masked_lang
)
SELECT m.masked_lang AS lang_key, CAST(COUNT(*) AS BIGINT) AS n_docs,
       MAX(d.lang_docs) AS lang_docs
FROM masked m JOIN dim d
  ON m.masked_lang IS NOT DISTINCT FROM d.masked_lang
GROUP BY 1
""",
)
def lang_nullsafe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (`<=>` / IS NOT DISTINCT FROM): the dominant
    language is masked to NULL and the join must still route those rows
    to the NULL dim entry — a plain equality join silently drops every
    NULL-keyed row (the classic silent-loss bug in enrichment joins
    against dims with an 'unknown' NULL row). Null-safe equality remains
    a hash-partitionable join key (NULL hashes like any value), so the
    plan is an ordinary equi-join, not a nested loop."""
    d = fx._read(spark, sf_dir, "documents")
    masked = d.select(
        "doc_id",
        F.when(F.col("lang") == "en", F.lit(None))
        .otherwise(F.col("lang"))
        .alias("masked_lang"),
    )
    dim = masked.groupBy("masked_lang").agg(
        F.count(F.lit(1)).alias("lang_docs")
    )
    j = masked.alias("m").join(
        dim.alias("d"),
        F.col("m.masked_lang").eqNullSafe(F.col("d.masked_lang")),
        "inner",
    )
    return j.groupBy(F.col("m.masked_lang").alias("lang_key")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.max("d.lang_docs").alias("lang_docs"),
    )


# ---------------------------------------------------------------------------
# Typed schema-on-read: from_json with an explicit schema + PERMISSIVE
# malformed handling (the third JSON surface, after get_json_object and
# VARIANT). Some payloads are deterministically truncated so the
# parse-failure path is genuinely exercised and counted.
# ---------------------------------------------------------------------------

_MALFORM_SQL = "CASE WHEN event_id % 10 = 0 THEN substr(props, 1, 3) ELSE props END"


@_register(
    "event_props_typed",
    f"""
WITH p AS (
  SELECT event_type,
         CASE WHEN json_valid({_MALFORM_SQL})
              THEN CAST(json_extract_string({_MALFORM_SQL}, '$.k') AS BIGINT)
         END AS k,
         json_valid({_MALFORM_SQL}) AS ok
  FROM events
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CASE WHEN ok THEN 1 ELSE 0 END) AS BIGINT) AS n_parsed,
       CAST(SUM(CASE WHEN ok THEN 0 ELSE 1 END) AS BIGINT) AS n_malformed,
       CAST(SUM(k) AS BIGINT) AS sum_k
FROM p
GROUP BY event_type
""",
)
def event_props_typed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed JSON parsing with an explicit schema: ``from_json(props,
    'k BIGINT')`` — schema-on-read without inference scans, JVM-side.
    Every 10th payload is deterministically truncated to exercise
    PERMISSIVE malformed semantics. Spark 4's PERMISSIVE from_json does
    NOT null the struct on parse failure (it yields a struct of NULL
    fields — indistinguishable from a valid payload missing the key),
    so malformed detection uses the explicit corrupt-record column: the
    failure is COUNTED per event type, not silently absorbed — the
    schema-drift early-warning every ingest pipeline needs."""
    ev = fx._read(spark, sf_dir, "events")
    raw = F.when(
        F.col("event_id") % 10 == 0, F.substring("props", 1, 3)
    ).otherwise(F.col("props"))
    j = F.from_json(
        raw,
        "k BIGINT, _corrupt_record STRING",
        {"columnNameOfCorruptRecord": "_corrupt_record"},
    )
    # NULL props: from_json(NULL) is a NULL struct whose corrupt field
    # is also NULL — without the isNotNull guard a missing payload would
    # count as parsed while the oracle (json_valid(NULL) -> NULL -> ELSE)
    # counts it malformed
    p = ev.select(
        "event_type",
        j.getField("k").alias("k"),
        (j.getField("_corrupt_record").isNull() & raw.isNotNull()).alias("ok"),
    )
    return p.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.when(F.col("ok"), 1).otherwise(0)).cast("bigint").alias("n_parsed"),
        F.sum(F.when(F.col("ok"), 0).otherwise(1)).cast("bigint").alias("n_malformed"),
        F.sum("k").cast("bigint").alias("sum_k"),
    )


# ---------------------------------------------------------------------------
# MapType surface: from_json into map<string,bigint> + map functions —
# schema-on-read for payloads whose KEY SET drifts (the struct form
# needs every key declared; the map form discovers them). Output stays
# scalar/string (map-typed result columns are not driver-hashable — the
# r2 representation-failure class).
# ---------------------------------------------------------------------------


@_register(
    "event_props_map",
    """
WITH kv AS (
  SELECT event_type,
         unnest(json_keys(props)) AS key,
         TRY_CAST(json_extract_string(props, '$.'
                                      || unnest(json_keys(props)))
                  AS BIGINT) AS val
  FROM events
  WHERE COALESCE(json_valid(props), FALSE)
)
SELECT event_type,
       string_agg(DISTINCT key, ',' ORDER BY key) AS keys_seen,
       CAST(COUNT(*) AS BIGINT) AS n_entries,
       CAST(SUM(val) AS BIGINT) AS sum_vals
FROM kv
GROUP BY event_type
""",
)
def event_props_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-drift-tolerant JSON parsing: props as ``map<string,bigint>``
    (no keys declared up front), exploded with ``explode(map)`` and
    profiled per event type — which keys appear, how many entries, the
    value sum. The map path is what ingest uses BEFORE a payload's
    schema is pinned; once keys stabilize, event_props_typed's struct
    form takes over (cheaper, typed). Map work happens JVM-side; the
    output is scalars + a sorted joined key list (map columns never
    reach the result — the driver's canonicalizer can't hash them).
    Drift guards: the oracle filters json_valid and TRY_CASTs values so
    malformed payloads degrade instead of erroring; note the engines'
    residual semantic difference under VALUE-type drift (Spark nulls
    the whole map for an unparsable value, DuckDB nulls just that
    entry) — the fixture contains neither, and event_props_typed is
    the query that counts malformed payloads deliberately."""
    ev = fx._read(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,bigint>")
    kv = ev.select(
        "event_type", F.explode(m).alias("key", "val")
    )
    return kv.groupBy("event_type").agg(
        F.array_join(F.sort_array(F.collect_set("key")), ",").alias("keys_seen"),
        F.count(F.lit(1)).alias("n_entries"),
        F.sum("val").cast("bigint").alias("sum_vals"),
    )


# ---------------------------------------------------------------------------
# Grouping markers on multi-level rollups + ANSI-safe try_cast parsing —
# the last two scalar surfaces the inventory hadn't pinned.
# ---------------------------------------------------------------------------


@_register(
    "region_segment_rollup_gid",
    f"""
SELECT COALESCE(r.r_name, 'ALL') AS region,
       COALESCE(c.c_mktsegment, 'ALL') AS segment,
       CAST(2 * GROUPING(r.r_name) + GROUPING(c.c_mktsegment) AS BIGINT)
         AS gid,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       {_ms("c.c_acctbal")} AS total_acctbal
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY ROLLUP (r.r_name, c.c_mktsegment)
""",
)
def region_segment_rollup_gid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Region/segment rollup with EXPLICIT grouping markers: gid =
    2*grouping(region) + grouping(segment) distinguishes detail rows
    from the subtotal levels — without it, a real region named 'ALL'
    would be indistinguishable from the rollup total (the classic
    COALESCE-label ambiguity). The marker is composed from grouping()
    bits identically on both engines rather than relying on either's
    grouping_id() bit order."""
    c = fx._read(spark, sf_dir, "customer")
    n = fx._read(spark, sf_dir, "nation")
    r = fx._read(spark, sf_dir, "region")
    base = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    )
    return (
        base.rollup("r_name", "c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            money_sum(F.col("c_acctbal")).alias("total_acctbal"),
            (
                2 * F.grouping("r_name") + F.grouping("c_mktsegment")
            ).cast("bigint").alias("gid"),
        )
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("region"),
            F.coalesce("c_mktsegment", F.lit("ALL")).alias("segment"),
            "gid",
            "n_customers",
            "total_acctbal",
        )
    )


# engine-specific only in the cast keyword (Spark: STRING, DuckDB:
# VARCHAR); values round-trip through shortest-repr formatting on both,
# so the parsed-back doubles are identical
_MESSY_BAL_T = (
    "CASE WHEN s_suppkey % 7 = 0 THEN 'N/A'"
    " WHEN s_suppkey % 11 = 0 THEN ''"
    " ELSE CAST(s_acctbal AS {t}) END"
)
_MESSY_BAL = _MESSY_BAL_T.format(t="VARCHAR")
_MESSY_BAL_SPARK = _MESSY_BAL_T.format(t="STRING")


@_register(
    "supplier_try_cast_audit",
    f"""
WITH raw AS (
  SELECT s_nationkey, {_MESSY_BAL} AS bal_str FROM supplier
),
parsed AS (
  SELECT s_nationkey, bal_str, TRY_CAST(bal_str AS DOUBLE) AS bal
  FROM raw
)
SELECT s_nationkey,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN bal IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_unparsable,
       {_ms("bal")} AS parsed_total
FROM parsed
GROUP BY s_nationkey
""",
)
def supplier_try_cast_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-safe parsing of messy numeric strings: under Spark 4's
    default ANSI mode a plain CAST on 'N/A' kills the whole job at row
    one; try_cast degrades the single row to NULL so the batch survives
    AND the failure count is reported per group (parse errors as data,
    not exceptions). Strings are deterministically dirtied from the
    fixture so the failure path is genuinely exercised."""
    s = fx._read(spark, sf_dir, "supplier")
    raw = s.select("s_nationkey", F.expr(_MESSY_BAL_SPARK).alias("bal_str"))
    parsed = raw.withColumn("bal", F.expr("try_cast(bal_str AS DOUBLE)"))
    return parsed.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("bal").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_unparsable"),
        money_sum(F.col("bal")).alias("parsed_total"),
    )


# ---------------------------------------------------------------------------
# Product analytics: rolling active users via bounded contribution
# explode (windowed COUNT DISTINCT without windowed count-distinct),
# and self-referential revenue anomaly days.
# ---------------------------------------------------------------------------


@_register(
    "daily_active_users_rolling",
    _with_events_cte("""
WITH acts AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events_norm
),
contrib AS (
  SELECT DISTINCT user_id,
         CAST(unnest(generate_series(CAST(day AS TIMESTAMP),
                                     CAST(day AS TIMESTAMP) + INTERVAL 6 DAY,
                                     INTERVAL 1 DAY)) AS DATE) AS target_day
  FROM acts
),
wau AS (
  SELECT target_day, CAST(COUNT(*) AS BIGINT) AS wau FROM contrib
  GROUP BY target_day
),
dau AS (
  SELECT day, CAST(COUNT(*) AS BIGINT) AS dau FROM acts GROUP BY day
)
SELECT d.day, d.dau, w.wau,
       (d.dau * 1000000) // w.wau AS stickiness_ppm
FROM dau d JOIN wau w ON d.day = w.target_day
"""),
)
def daily_active_users_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU and trailing-7-day WAU per day, plus the DAU/WAU stickiness
    ratio (exact ppm). Windowed COUNT DISTINCT does not exist as a
    window function — the scale-safe form is the bounded CONTRIBUTION
    EXPLODE: each active (user, day) contributes to the 7 target days
    it keeps the user 'weekly-active' for, distinct once, then an
    ordinary groupBy. Fan-out is exactly the window width (7), the
    shuffle carries (user, day) pairs, and no per-day state or
    re-scan exists — against a naive per-day subquery re-scan this is
    the difference between O(days * events) and O(7 * events). Days are
    restricted to those with actual activity (no trailing phantom
    days past the data's end)."""
    ev = fx.events_stream(spark, sf_dir)
    acts = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    contrib = (
        acts.select(
            "user_id",
            F.explode(
                F.sequence(F.col("day"), F.date_add(F.col("day"), 6))
            ).alias("target_day"),
        )
        .distinct()
    )
    wau = contrib.groupBy("target_day").agg(F.count(F.lit(1)).alias("wau"))
    dau = acts.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    return dau.join(wau, dau.day == wau.target_day).select(
        "day",
        "dau",
        "wau",
        F.expr("(dau * 1000000) div wau").alias("stickiness_ppm"),
    )


@_register(
    "store_revenue_anomaly_days",
    f"""
WITH {fx.SALES_CTE.strip()},
daily AS (
  SELECT store_key, trans_dt, {_ms("sales_amt")} AS day_rev
  FROM sales GROUP BY 1, 2
),
stats AS (
  SELECT store_key, trans_dt, day_rev,
         CAST(COUNT(*) OVER w AS BIGINT) AS n,
         CAST(SUM(CAST(day_rev AS DECIMAL(30,6))) OVER w AS DOUBLE) AS s1,
         CAST(SUM(CAST(day_rev * day_rev AS DECIMAL(30,6))) OVER w AS DOUBLE)
           AS s2
  FROM daily
  WINDOW w AS (
    PARTITION BY store_key ORDER BY trans_dt
    ROWS BETWEEN 28 PRECEDING AND 1 PRECEDING
  )
)
SELECT store_key, trans_dt,
       day_rev,
       {_m("(day_rev - s1 / n) / sqrt(s2 / n - (s1 / n) * (s1 / n))")} AS z
FROM stats
WHERE n >= 14
  AND (s2 / n - (s1 / n) * (s1 / n)) > 0
  AND abs((day_rev - s1 / n) / sqrt(s2 / n - (s1 / n) * (s1 / n))) > 3
""",
)
def store_revenue_anomaly_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Days whose revenue sits more than 3 trailing sigmas from the
    store's OWN trailing distribution over its last 28 OBSERVED sales
    days (a ROWS frame — on a store with gaps that spans more calendar
    time than 28 days; swap to a RANGE frame over a day number for
    strict calendar windows). Trailing moments ride ONE frame window
    per store in exact DECIMAL (the moment-sum discipline: bit-stable
    under any partitioning); the z-score is identically-shaped double
    arithmetic rounded through the money hop. Days with fewer than 14
    trailing observations or zero variance are excluded (no z-score is
    defined there)."""
    s = fx.sales(spark, sf_dir)
    daily = s.groupBy("store_key", "trans_dt").agg(
        money_sum(F.col("sales_amt")).alias("day_rev")
    )
    w = (
        Window.partitionBy("store_key")
        .orderBy("trans_dt")
        .rowsBetween(-28, -1)
    )
    stats = daily.select(
        "store_key",
        "trans_dt",
        "day_rev",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum(F.col("day_rev").cast("decimal(30,6)"))
        .over(w)
        .cast("double")
        .alias("s1"),
        F.sum((F.col("day_rev") * F.col("day_rev")).cast("decimal(30,6)"))
        .over(w)
        .cast("double")
        .alias("s2"),
    )
    z = F.expr("(day_rev - s1 / n) / sqrt(s2 / n - (s1 / n) * (s1 / n))")
    var = F.expr("s2 / n - (s1 / n) * (s1 / n)")
    return stats.where(
        (F.col("n") >= 14) & (var > 0) & (F.abs(z) > 3)
    ).select("store_key", "trans_dt", "day_rev", money(z).alias("z"))


# ---------------------------------------------------------------------------
# Split-leakage audit: near-dup clusters spanning train/val/test — the
# dedup-aware split-integrity check (a near-duplicate of a training doc
# sitting in the test split contaminates evaluation even though the
# doc-level split is perfectly deterministic).
# ---------------------------------------------------------------------------

# ONE string surgery: the components query's final "  )\nSELECT ..."
# tail (including the reach CTE's closing paren, which picks up the
# comma the extended CTE list needs) becomes comp/labeled CTEs plus the
# leakage projection. The split CASE is the SHARED fragment from
# operators/corpus.py — same NULL-id guard as split_assignment(), not a
# re-derived copy that could drift.
_LEAKAGE_TAIL = """)
SELECT a AS doc_id, MIN(b) AS component
FROM reach
GROUP BY a"""
assert _LEAKAGE_TAIL in dd.NEARDUP_COMPONENTS_SQL
_LEAKAGE_SQL = dd.NEARDUP_COMPONENTS_SQL.strip().replace(
    _LEAKAGE_TAIL.strip(),
    f"""),
comp AS (
  SELECT a AS doc_id, MIN(b) AS component FROM reach GROUP BY a
),
labeled AS (
  SELECT component, doc_id, {cp.SPLIT_CASE_SQL} AS split FROM comp
)
SELECT component,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT split) AS BIGINT) AS n_splits,
       string_agg(DISTINCT split, ',' ORDER BY split) AS splits_seen,
       COUNT(DISTINCT split) > 1 AS leaks
FROM labeled
GROUP BY component""",
    1,
)


@_register("split_leakage_audit", _LEAKAGE_SQL)
def split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per near-dup cluster: which splits its members landed in, and
    whether the cluster LEAKS across splits. Doc-level hash splits are
    deterministic but duplicate-blind — the audit composes the verified
    near-dup components with the split assignment (two existing bounded
    relations, one groupBy; no new scans of text). Leaking clusters are
    the re-assignment worklist (move the whole cluster to one split, or
    drop the eval-side members)."""
    docs = fx._read(spark, sf_dir, "documents")
    comp = dd.neardup_components(docs)
    labeled = comp.select(
        "component", "doc_id", cp.split_assignment().alias("split")
    )
    return labeled.groupBy("component").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_distinct("split").alias("n_splits"),
        F.array_join(F.sort_array(F.collect_set("split")), ",").alias(
            "splits_seen"
        ),
        (F.count_distinct("split") > 1).alias("leaks"),
    )


# ---------------------------------------------------------------------------
# Remaining built-in surfaces with honest oracles: bitmap aggregates
# (exact distinct via bitmap buckets), AES column encryption (roundtrip
# invariant — GCM ciphertexts are randomized, so the CHECK is the
# deterministic thing), and XPath extraction over synthesized XML
# (ground truth from the same synthesis arithmetic).
# ---------------------------------------------------------------------------


@_register(
    "nation_distinct_customers_bitmap",
    """
SELECT c_nationkey,
       CAST(COUNT(DISTINCT c_custkey) AS BIGINT) AS n_distinct_customers
FROM customer
GROUP BY c_nationkey
""",
)
def nation_distinct_customers_bitmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct customers per nation via Spark's bitmap aggregate
    family: keys bucket into 4096-bit bitmaps
    (bitmap_bucket_number / bitmap_bit_position), one
    bitmap_construct_agg per (nation, bucket), bitmap_count summed per
    nation. Same answer as COUNT(DISTINCT) — the oracle — but the
    shuffle carries fixed 512-byte bitmaps instead of raw key lists,
    and bucket bitmaps are mergeable partials (OR), the same algebra
    the incremental/LC rollups use. The distinct-count expansion
    Catalyst generates for COUNT(DISTINCT) is the thing this avoids."""
    c = fx._read(spark, sf_dir, "customer")
    per_bucket = (
        c.select(
            "c_nationkey",
            F.expr("bitmap_bucket_number(c_custkey)").alias("bucket"),
            F.expr("bitmap_bit_position(c_custkey)").alias("pos"),
        )
        .groupBy("c_nationkey", "bucket")
        .agg(F.expr("bitmap_count(bitmap_construct_agg(pos))").alias("n"))
    )
    return per_bucket.groupBy("c_nationkey").agg(
        F.sum("n").cast("bigint").alias("n_distinct_customers")
    )


@_register(
    "pii_encryption_roundtrip",
    """
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(*) AS BIGINT) AS n_roundtrip_ok,
       CAST(0 AS BIGINT) AS n_mismatched
FROM customer
""",
)
def pii_encryption_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level encryption for PII at rest: aes_encrypt the customer
    name (AES-GCM — ciphertexts are RANDOMIZED per row per run, which is
    the security property), aes_decrypt it back, and verify the
    roundtrip row by row. The deterministic, oracle-checkable output is
    the invariant (every row decrypts to its original), not the
    ciphertext; the oracle states that invariant directly. Both
    directions run JVM-side in one projection — no Python, no shuffle
    beyond the count."""
    c = fx._read(spark, sf_dir, "customer")
    # 16-byte demo key (AES-128); real deployments pull this from a KMS
    rt = c.select(
        (
            F.expr(
                "aes_decrypt(aes_encrypt(c_name, '0123456789abcdef'),"
                " '0123456789abcdef')"
            ).cast("string")
            == F.col("c_name")
        ).alias("ok")
    )
    return rt.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("ok"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_roundtrip_ok"),
        F.sum(F.when(F.col("ok"), 0).otherwise(1))
        .cast("bigint")
        .alias("n_mismatched"),
    )


@_register(
    "event_xml_extract",
    """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(event_id % 1000) AS BIGINT) AS sum_codes
FROM events
WHERE event_id % 5 = 0
GROUP BY event_type
""",
)
def event_xml_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XPath extraction surface: events wrapped into XML envelopes
    (synthesized deterministically — the fixture carries no XML) and the
    code read back with ``xpath_long``. The oracle computes the ground
    truth from the same synthesis arithmetic, so what is verified is
    that the XML parse path extracts exactly what was embedded — the
    legacy-feed ingestion pattern (SOAP/XML exports) without pretending
    the warehouse speaks XPath.

    Cost note: xpath_* is row-at-a-time Java DOM parsing — NOT codegen
    (measured ~5s for 240k rows at sf0.1, ~100x a regexp_extract). It
    exists for feeds that are genuinely XML; anything hot-path should
    regexp or pre-convert. The query runs on a deterministic 1-in-5
    slice — the surface demo doesn't need every row paying DOM cost."""
    ev = fx._read(spark, sf_dir, "events").where(
        F.col("event_id") % 5 == 0
    )
    xml = F.concat(
        F.lit("<ev><type>"),
        F.col("event_type"),
        F.lit("</type><code>"),
        (F.col("event_id") % 1000).cast("string"),
        F.lit("</code></ev>"),
    )
    parsed = ev.select("event_type", xml.alias("xml")).select(
        "event_type",
        F.expr("xpath_long(xml, '/ev/code/text()')").alias("code"),
    )
    return parsed.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("code").cast("bigint").alias("sum_codes"),
    )


# ---------------------------------------------------------------------------
# explode_outer: the keep-empty-rows generator variant — an enrichment
# fan-out must not silently drop entities that have nothing to fan out
# (a plain explode of a doc's URL list loses every URL-less doc from the
# output, the generator-shaped cousin of the inner-join-drops-NULLs bug
# that lang_nullsafe_join pins).
# ---------------------------------------------------------------------------

_DOC_URLS_SQL = """CASE
  WHEN doc_id % 9 = 0 THEN
    ['https://a.example.org/p/' || CAST(doc_id % 50 AS VARCHAR),
     'https://b.example.org/q/' || CAST(doc_id % 50 AS VARCHAR)]
  WHEN doc_id % 3 = 0 THEN
    ['https://a.example.org/p/' || CAST(doc_id % 50 AS VARCHAR)]
  ELSE CAST([] AS VARCHAR[]) END"""


@_register(
    "docs_url_explode_outer",
    f"""
WITH withurls AS (
  SELECT doc_id, {_DOC_URLS_SQL} AS urls FROM documents
),
outered AS (
  SELECT doc_id,
         unnest(CASE WHEN len(urls) = 0 THEN [CAST(NULL AS VARCHAR)]
                ELSE urls END) AS url
  FROM withurls
)
SELECT url IS NOT NULL AS has_url,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT url) AS BIGINT) AS n_distinct_urls
FROM outered
GROUP BY 1
""",
)
def docs_url_explode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode_outer over a synthesized per-doc URL list (two URLs,
    one, or none): URL-less docs survive as NULL-url rows, so the
    output accounts for EVERY document — the row-count audit that
    catches a plain explode silently dropping the empty-list entities.
    (DuckDB's unnest drops empties like explode does; the oracle
    emulates the outer form by substituting a [NULL] list.)"""
    d = fx._read(spark, sf_dir, "documents")
    n = (F.col("doc_id") % 50).cast("string")
    urls = (
        F.when(
            F.col("doc_id") % 9 == 0,
            F.array(
                F.concat(F.lit("https://a.example.org/p/"), n),
                F.concat(F.lit("https://b.example.org/q/"), n),
            ),
        )
        .when(
            F.col("doc_id") % 3 == 0,
            F.array(F.concat(F.lit("https://a.example.org/p/"), n)),
        )
        .otherwise(F.array().cast("array<string>"))
    )
    outered = d.select(
        "doc_id", F.explode_outer(urls).alias("url")
    )
    return outered.groupBy(F.col("url").isNotNull().alias("has_url")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count_distinct("doc_id").alias("n_docs"),
        F.count_distinct("url").alias("n_distinct_urls"),
    )


# ---------------------------------------------------------------------------
# Map higher-order functions + PSI distribution drift — the last two
# round-4-queue items that are implementable here (map HOFs over the
# from_json map; PSI with decimal-rounded per-bin contributions).
# ---------------------------------------------------------------------------


@_register(
    "event_props_map_hof",
    """
WITH kv AS (
  SELECT event_type,
         unnest(json_keys(props)) AS key,
         TRY_CAST(json_extract_string(props, '$.'
                                      || unnest(json_keys(props)))
                  AS BIGINT) AS val
  FROM events
  WHERE COALESCE(json_valid(props), FALSE)
),
kept AS (
  -- map_filter(v >= 20) then transform_values(v -> v * 3 + 1)
  SELECT event_type, key, val * 3 + 1 AS val3
  FROM kv WHERE val >= 20
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_kept_entries,
       CAST(SUM(val3) AS BIGINT) AS sum_transformed
FROM kept
GROUP BY event_type
""",
)
def event_props_map_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map higher-order functions: the parsed props map filtered with
    ``map_filter`` (drop entries under a threshold) and rewritten with
    ``transform_values`` — both JVM lambda HOFs running inside the
    projection, then exploded and aggregated. The per-entry pipeline a
    feature store runs on map-typed payloads; the oracle applies the
    same predicate/transform at the exploded-entry level. (HOF lambdas
    are interpreted, not codegen — fine once per entry; the hot-path
    caveat from SCALE.md's vector-math row applies at billions of
    entries.)"""
    ev = fx._read(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,bigint>")
    transformed = F.transform_values(
        F.map_filter(m, lambda k, v: v >= 20),
        lambda k, v: v * 3 + 1,
    )
    kv = ev.select(
        "event_type", F.explode(transformed).alias("key", "val3")
    )
    return kv.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_kept_entries"),
        F.sum("val3").cast("bigint").alias("sum_transformed"),
    )


# PSI bins: token-length buckets of 8; add-1 smoothing keeps every bin
# strictly positive so ln(p/q) is defined.
_PSI_BINS = 8
_PSI_BUCKET_SQL = (
    "LEAST(CAST(len("
    + tx.TOKENS_SQL.format(c="text")
    + f") AS BIGINT) // 8, {_PSI_BINS - 1})"
)


@_register(
    "corpus_drift_psi",
    f"""
WITH b AS (
  SELECT doc_id % 2 = 0 AS cohort_a,
         {_PSI_BUCKET_SQL} AS bucket
  FROM documents
),
counts AS (
  SELECT bucket,
         CAST(SUM(CASE WHEN cohort_a THEN 1 ELSE 0 END) + 1 AS BIGINT) AS na,
         CAST(SUM(CASE WHEN cohort_a THEN 0 ELSE 1 END) + 1 AS BIGINT) AS nb
  FROM b GROUP BY bucket
),
tot AS (
  SELECT CAST(SUM(na) AS BIGINT) AS ta, CAST(SUM(nb) AS BIGINT) AS tb
  FROM counts
),
contrib AS (
  SELECT bucket,
         CAST(round(CAST(
           (CAST(na AS DOUBLE) / ta - CAST(nb AS DOUBLE) / tb)
           * ln((CAST(na AS DOUBLE) / ta) / (CAST(nb AS DOUBLE) / tb))
           AS DECIMAL(38,12)), 6) AS DECIMAL(38,6)) AS c
  FROM counts, tot
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_bins,
       CAST(SUM(c) AS DOUBLE) AS psi
FROM contrib
""",
)
def corpus_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population stability index between two corpus cohorts (even vs
    odd doc_id — the stand-in for yesterday-vs-today) over token-length
    bins: PSI = sum (p-q) * ln(p/q), the standard drift alarm for a
    training-data intake. Counts are exact with add-1 smoothing (every
    bin positive -> ln defined); each bin's contribution is computed in
    identically-shaped double arithmetic, rounded IN DECIMAL at 6
    places, and the total is an exact decimal sum — so the statistic is
    partition- and engine-stable up to ln()'s last-ulp (not formally
    correctly-rounded everywhere; a 1-ulp disagreement would need the
    contribution to sit within ~1e-16 of a 1e-6 rounding tie to
    surface — accepted and documented, same class as the equi-depth
    percentile interpolation)."""
    d = fx._read(spark, sf_dir, "documents")
    bucket = F.least(
        (tx.token_count(F.col("text")) / 8).cast("bigint"),
        F.lit(_PSI_BINS - 1),
    )
    b = d.select(
        (F.col("doc_id") % 2 == 0).alias("cohort_a"), bucket.alias("bucket")
    )
    counts = b.groupBy("bucket").agg(
        (F.sum(F.when(F.col("cohort_a"), 1).otherwise(0)) + 1)
        .cast("bigint")
        .alias("na"),
        (F.sum(F.when(F.col("cohort_a"), 0).otherwise(1)) + 1)
        .cast("bigint")
        .alias("nb"),
    )
    tot = counts.agg(
        F.sum("na").cast("bigint").alias("ta"),
        F.sum("nb").cast("bigint").alias("tb"),
    )
    contrib = counts.crossJoin(F.broadcast(tot)).select(
        F.expr(
            "CAST(round(CAST("
            "(CAST(na AS DOUBLE) / ta - CAST(nb AS DOUBLE) / tb)"
            " * ln((CAST(na AS DOUBLE) / ta) / (CAST(nb AS DOUBLE) / tb))"
            " AS DECIMAL(38,12)), 6) AS DECIMAL(38,6))"
        ).alias("c")
    )
    return contrib.agg(
        F.count(F.lit(1)).alias("n_bins"),
        F.sum("c").cast("double").alias("psi"),
    )


# KL / JS divergence twins of corpus_drift_psi (VERDICT r4 item 5) — same
# bins, same add-1 smoothing, same decimal-rounded per-bin-contribution
# trick; the shared expression fragments below are evaluated verbatim by
# BOTH engines so the double arithmetic shape is identical. The ln() ulp
# caveat is documented ONCE on corpus_drift_psi and applies here equally.
_DRIFT_PA = "(CAST(na AS DOUBLE) / ta)"
_DRIFT_PB = "(CAST(nb AS DOUBLE) / tb)"
_DRIFT_PM = f"(({_DRIFT_PA} + {_DRIFT_PB}) / 2)"
_DRIFT_KL_AB = f"{_DRIFT_PA} * ln({_DRIFT_PA} / {_DRIFT_PB})"
_DRIFT_KL_BA = f"{_DRIFT_PB} * ln({_DRIFT_PB} / {_DRIFT_PA})"
# integer /2 (not a 0.5 literal — decimal literal typing differs between
# engines) keeps the halving in pure double arithmetic on both sides
_DRIFT_JS = (
    f"({_DRIFT_PA} * ln({_DRIFT_PA} / {_DRIFT_PM})"
    f" + {_DRIFT_PB} * ln({_DRIFT_PB} / {_DRIFT_PM})) / 2"
)


def _drift6(x: str) -> str:
    """Decimal-rounded per-bin contribution (see corpus_drift_psi)."""
    return f"CAST(round(CAST({x} AS DECIMAL(38,12)), 6) AS DECIMAL(38,6))"


@_register(
    "corpus_drift_kl_js",
    f"""
WITH b AS (
  SELECT doc_id % 2 = 0 AS cohort_a,
         {_PSI_BUCKET_SQL} AS bucket
  FROM documents
),
counts AS (
  SELECT bucket,
         CAST(SUM(CASE WHEN cohort_a THEN 1 ELSE 0 END) + 1 AS BIGINT) AS na,
         CAST(SUM(CASE WHEN cohort_a THEN 0 ELSE 1 END) + 1 AS BIGINT) AS nb
  FROM b GROUP BY bucket
),
tot AS (
  SELECT CAST(SUM(na) AS BIGINT) AS ta, CAST(SUM(nb) AS BIGINT) AS tb
  FROM counts
),
contrib AS (
  SELECT bucket,
         {_drift6(_DRIFT_KL_AB)} AS c_ab,
         {_drift6(_DRIFT_KL_BA)} AS c_ba,
         {_drift6(_DRIFT_JS)} AS c_js
  FROM counts, tot
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_bins,
       CAST(SUM(c_ab) AS DOUBLE) AS kl_ab,
       CAST(SUM(c_ba) AS DOUBLE) AS kl_ba,
       CAST(SUM(c_js) AS DOUBLE) AS js
FROM contrib
""",
)
def corpus_drift_kl_js(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kullback-Leibler (both directions) and Jensen-Shannon divergence
    between the two corpus cohorts over the same token-length bins as
    corpus_drift_psi — the asymmetric and the bounded-symmetric members
    of the drift-alarm family (PSI alarms on magnitude, KL on direction,
    JS stays in [0, ln 2] for dashboards). Same engineering: exact
    smoothed counts, per-bin contributions in engine-identical double
    expressions rounded IN DECIMAL at 6 places, exact decimal total;
    the ln() ulp caveat documented on corpus_drift_psi applies."""
    d = fx._read(spark, sf_dir, "documents")
    bucket = F.least(
        (tx.token_count(F.col("text")) / 8).cast("bigint"),
        F.lit(_PSI_BINS - 1),
    )
    b = d.select(
        (F.col("doc_id") % 2 == 0).alias("cohort_a"), bucket.alias("bucket")
    )
    counts = b.groupBy("bucket").agg(
        (F.sum(F.when(F.col("cohort_a"), 1).otherwise(0)) + 1)
        .cast("bigint")
        .alias("na"),
        (F.sum(F.when(F.col("cohort_a"), 0).otherwise(1)) + 1)
        .cast("bigint")
        .alias("nb"),
    )
    tot = counts.agg(
        F.sum("na").cast("bigint").alias("ta"),
        F.sum("nb").cast("bigint").alias("tb"),
    )
    contrib = counts.crossJoin(F.broadcast(tot)).select(
        F.expr(_drift6(_DRIFT_KL_AB)).alias("c_ab"),
        F.expr(_drift6(_DRIFT_KL_BA)).alias("c_ba"),
        F.expr(_drift6(_DRIFT_JS)).alias("c_js"),
    )
    return contrib.agg(
        F.count(F.lit(1)).alias("n_bins"),
        F.sum("c_ab").cast("double").alias("kl_ab"),
        F.sum("c_ba").cast("double").alias("kl_ba"),
        F.sum("c_js").cast("double").alias("js"),
    )


# Recursive CTE (WITH RECURSIVE, Spark 4.1 SPARK-24497): the SQL-surface
# iteration primitive, run by BOTH engines from the SAME statement. The
# demo recursion is an acyclic hierarchy walk (implicit binary tree over
# part keys: parent(n) = n div 2, root 1 — the org-chart/BOM traversal
# shape), which UNION ALL recursion handles exactly: every node has one
# path from the root, so no row is ever produced twice and total work is
# O(N) over ~log2(N) recursion levels. Cyclic-graph BFS/components stay
# on the DataFrame-loop operators (operators/graph.py, dedup.py):
# cycle-safe recursion needs UNION-distinct termination, which Spark 4.1
# rejects (UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE) — with UNION ALL a
# bounded walk over the dense co-purchase graph enumerates all paths
# (degree^hops explosion), which no engine should run at scale.
_PART_TREE_RECURSIVE_SQL = f"""
WITH RECURSIVE tree(node, depth, price) AS (
  SELECT p_partkey, 0, p_retailprice FROM part WHERE p_partkey = 1
  UNION ALL
  SELECT p.p_partkey, t.depth + 1, p.p_retailprice
  FROM part p JOIN tree t ON CAST(FLOOR(p.p_partkey / 2) AS BIGINT) = t.node
  WHERE p.p_partkey > 1
)
SELECT CAST(depth AS INTEGER) AS depth,
       CAST(COUNT(*) AS BIGINT) AS n_parts,
       CAST(MIN(node) AS BIGINT) AS min_part,
       CAST(MAX(node) AS BIGINT) AS max_part,
       {MONEY_SUM_SQL.format(x="price")} AS total_price
FROM tree
GROUP BY depth
"""


@_register(
    "nation_balance_dominance_cogrouped",
    """
WITH nk AS (
  SELECT c_nationkey AS nationkey FROM customer
  UNION
  SELECT s_nationkey FROM supplier
),
pairs AS (
  SELECT c.c_nationkey AS nationkey, CAST(COUNT(*) AS BIGINT) AS n_pairs
  FROM customer c JOIN supplier s
    ON c.c_nationkey = s.s_nationkey AND c.c_acctbal <= s.s_acctbal
  GROUP BY c.c_nationkey
),
nc AS (
  SELECT c_nationkey AS nationkey, CAST(COUNT(*) AS BIGINT) AS n
  FROM customer GROUP BY c_nationkey
),
ns AS (
  SELECT s_nationkey AS nationkey, CAST(COUNT(*) AS BIGINT) AS n
  FROM supplier GROUP BY s_nationkey
)
SELECT CAST(nk.nationkey AS INTEGER) AS nationkey,
       CAST(COALESCE(pairs.n_pairs, 0) AS BIGINT) AS n_pairs,
       CAST(COALESCE(nc.n, 0) AS BIGINT) AS n_cust,
       CAST(COALESCE(ns.n, 0) AS BIGINT) AS n_supp
FROM nk
LEFT JOIN pairs USING (nationkey)
LEFT JOIN nc USING (nationkey)
LEFT JOIN ns USING (nationkey)
""",
)
def nation_balance_dominance_cogrouped(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Co-grouped applyInPandas — the one Arrow exchange shape the
    grouped-map/map-partitions operators don't cover: customers and
    suppliers are grouped by nation INDEPENDENTLY and each nation's two
    Arrow batches arrive together in one Python call (full-outer over
    keys: a side absent from a nation arrives as an empty frame). The
    kernel is the classic cogroup workload — per-key rank matching: how
    many (customer, supplier) pairs have customer balance <= supplier
    balance, via one sort + vectorized searchsorted per nation instead
    of the |C|x|S| pair join the oracle spells out. Comparisons only
    (no float arithmetic), so parity is exact.

    Scale: parallelism unit = grouping key; each nation's two frames
    must fit a worker's Arrow batch memory (same contract as every
    grouped applyInPandas), and the sort+searchsorted kernel is
    O((|C|+|S|) log |C|) per key vs the join's O(|C|x|S|) pairs."""
    import numpy as np
    import pandas as pd

    c = fx._read(spark, sf_dir, "customer").select(
        "c_nationkey", "c_acctbal"
    )
    s = fx._read(spark, sf_dir, "supplier").select(
        "s_nationkey", "s_acctbal"
    )

    def dominance(key, cdf: pd.DataFrame, sdf: pd.DataFrame) -> pd.DataFrame:
        cb = np.sort(cdf["c_acctbal"].to_numpy(dtype="float64"))
        sb = sdf["s_acctbal"].to_numpy(dtype="float64")
        n_pairs = int(np.searchsorted(cb, sb, side="right").sum())
        return pd.DataFrame(
            {
                "nationkey": np.array([key[0]], dtype="int32"),
                "n_pairs": np.array([n_pairs], dtype="int64"),
                "n_cust": np.array([len(cb)], dtype="int64"),
                "n_supp": np.array([len(sb)], dtype="int64"),
            }
        )

    return (
        c.groupBy("c_nationkey")
        .cogroup(s.groupBy("s_nationkey"))
        .applyInPandas(
            dominance,
            "nationkey int, n_pairs bigint, n_cust bigint, n_supp bigint",
        )
    )


# correlated LATERAL derived table (Spark 4 LateralJoin; the SQL-surface
# twin of the window top-k-per-group): both engines run the IDENTICAL
# statement. Spark de-correlates this to a DomainJoin + per-domain limit
# internally — the declared form stays the textbook per-row subquery.
_LATERAL_TOP2_SQL = """
SELECT c.c_custkey AS c_custkey,
       t.o_orderkey AS o_orderkey,
       t.o_totalprice AS o_totalprice
FROM customer c, LATERAL (
  SELECT o_orderkey, o_totalprice
  FROM orders o
  WHERE o.o_custkey = c.c_custkey
  ORDER BY o_totalprice DESC, o_orderkey ASC
  LIMIT 2
) t
WHERE c.c_nationkey = 3
"""


@_register("customer_top2_orders_lateral", _LATERAL_TOP2_SQL)
def customer_top2_orders_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-2 orders per customer (one nation) via a correlated LATERAL
    derived table — the SQL-surface form of top-k-per-group, next to
    the window/WindowGroupLimit DataFrame form (top3_parts_per_brand)
    and the UDTF lateral (udtf_part_words). Both engines execute the
    identical statement; ordering is on the STORED o_totalprice (no
    arithmetic, so no float-parity engineering) with an orderkey
    tie-break for deterministic LIMIT selection."""
    fx._read(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    fx._read(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_LATERAL_TOP2_SQL)


@_register("part_tree_depth_recursive", _PART_TREE_RECURSIVE_SQL)
def part_tree_depth_recursive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchy rollup via a recursive CTE, executed by spark.sql from
    the IDENTICAL statement the DuckDB oracle runs: walk the implicit
    part-key binary tree from the root and aggregate per depth (count,
    key range, decimal-rounded price mass). Every node keyed >= 2 has
    exactly one parent (node div 2) and node 0 is excluded as its own
    parent (a self-loop would never terminate under UNION ALL) — see
    the module comment for why cyclic BFS remains a DataFrame loop."""
    fx._read(spark, sf_dir, "part").createOrReplaceTempView("part")
    return spark.sql(_PART_TREE_RECURSIVE_SQL)


# ---------------------------------------------------------------------------
# Round-4 additions: HLL mergeable distinct rollups, TPC-H Q12 shape,
# A-Res weighted sampling, bounded BFS, correlated scalar subqueries
# ---------------------------------------------------------------------------


@_register(
    "nation_customer_hll",
    """
SELECT CAST(c_nationkey AS INTEGER) AS c_nationkey,
       CAST(COUNT(DISTINCT c_custkey) AS BIGINT) AS approx_distinct
FROM customer
GROUP BY c_nationkey
""",
)
def nation_customer_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation distinct customers via Apache DataSketches HLL
    (hll_sketch_agg + hll_sketch_estimate). At fixture scale every group
    sits inside the sketch's exact coupon regime (sketches.HLL_LGK
    docstring), so the oracle is the plain COUNT(DISTINCT) — the
    estimate must EQUAL it. The point of the operator is the 100 TB
    shape: distinct-count state per group is a bounded sketch, not a
    hash set of raw ids."""
    c = fx._read(spark, sf_dir, "customer")
    return sk.hll_distinct(c, "c_nationkey", "c_custkey")


@_register(
    "region_customer_hll_merge",
    """
SELECT CAST(n.n_regionkey AS INTEGER) AS n_regionkey,
       CAST(COUNT(DISTINCT c.c_custkey) AS BIGINT) AS approx_distinct
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_regionkey
""",
)
def region_customer_hll_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Region-level distinct customers by MERGING the per-nation HLL
    sketches (hll_union_agg) — never re-touching the raw customer rows.
    This is the mergeable-partials algebra that makes a 100 TB
    distinct-count rollup incremental: store per-day/per-shard sketches
    (bytes each), union upward on demand; same family as
    incremental_weekly_rollup and monthly_distinct_customers_lc. The
    broadcast nation dim assigns regions to the 25 sketch rows."""
    c = fx._read(spark, sf_dir, "customer")
    n = fx._read(spark, sf_dir, "nation")
    partials = sk.hll_sketch_per_group(c, "c_nationkey", "c_custkey")
    tagged = partials.join(
        F.broadcast(n.select("n_nationkey", "n_regionkey")),
        partials.c_nationkey == F.col("n_nationkey"),
    )
    return sk.hll_merge_estimate(tagged, "n_regionkey")


@_register(
    "incremental_nation_hll_rollup",
    """
SELECT CAST(c_nationkey AS INTEGER) AS c_nationkey,
       CAST(COUNT(DISTINCT c_custkey) AS BIGINT) AS approx_distinct
FROM customer
GROUP BY c_nationkey
""",
)
def incremental_nation_hll_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-union INCREMENTALITY proof — the actual reason to store
    sketches: the customer fact is split into two disjoint 'runs'
    (custkey parity = history vs today), each run builds its per-nation
    HLL partials independently, and the runs are folded with
    hll_union_agg — never re-touching run A's raw rows. Shares
    nation_customer_hll's COUNT(DISTINCT) oracle, so the driver proves
    merge(sketch(A), sketch(B)) == direct(A ∪ B) exactly (fixture
    groups sit in the coupon regime; see sketches.HLL_LGK). The HLL
    member of the incremental_weekly_rollup family; its streaming
    foreachBatch twin is pinned in tests/test_streaming.py."""
    c = fx._read(spark, sf_dir, "customer")
    history = c.filter(F.col("c_custkey") % 2 == 0)
    today = c.filter(F.col("c_custkey") % 2 == 1)
    partials = sk.hll_sketch_per_group(
        history, "c_nationkey", "c_custkey"
    ).unionByName(sk.hll_sketch_per_group(today, "c_nationkey", "c_custkey"))
    return sk.hll_merge_estimate(partials, "c_nationkey")


@_register(
    "lineitem_q12_linestatus",
    """
SELECT l_linestatus AS shipmode_proxy,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM orders
JOIN lineitem ON l_orderkey = o_orderkey
WHERE CAST(l_shipdate AS DATE) > CAST(o_orderdate AS DATE)
      + INTERVAL 90 DAY
  AND CAST(l_shipdate AS DATE) >= DATE '1995-01-01'
  AND CAST(l_shipdate AS DATE) < DATE '1996-01-01'
GROUP BY l_linestatus
""",
)
def lineitem_q12_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 adapted to the fixture schema (no l_shipmode /
    l_receiptdate — DEVNOTES queue: linestatus is the mode proxy, and
    "late" is shipped >90 days after order date): per-mode counts of
    critical- vs normal-priority lineitems shipped late in 1995
    (the fixture's shipdates start 1995-01-02). The
    priority CASE is evaluated from the broadcast-joined orders side;
    the date filters prune at the lineitem scan."""
    o = fx._read(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", F.to_date("o_orderdate").alias("odate")
    )
    l = fx._read(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linestatus", F.to_date("l_shipdate").alias("sdate")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.where(
            (F.col("sdate") >= F.lit("1995-01-01").cast("date"))
            & (F.col("sdate") < F.lit("1996-01-01").cast("date"))
        )
        .join(o, l.l_orderkey == o.o_orderkey)
        .where(F.col("sdate") > F.date_add(F.col("odate"), 90))
        .groupBy(F.col("l_linestatus").alias("shipmode_proxy"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0))
            .cast("bigint")
            .alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1))
            .cast("bigint")
            .alias("low_line_count"),
        )
    )


@_register(
    "documents_weighted_sample_ares",
    f"""
WITH ranked AS (
  SELECT source, doc_id,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY source
           ORDER BY {sp.ares_key_sql("doc_id", "n_chars")} DESC, doc_id ASC
         ) AS INTEGER) AS sample_rank
  FROM documents
)
SELECT source, doc_id, sample_rank FROM ranked WHERE sample_rank <= 3
""",
)
def documents_weighted_sample_ares(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Length-weighted 3-per-source sample in the A-Res (reservoir)
    distribution — the exact weighted-without-replacement twin of the
    Duffield priority sample in documents_weighted_sample (see
    operators/sampling.ares_sample_per_group for when each bias is the
    right one). Deterministic: same hash-uniform, key rounded in
    decimal, id tie-break."""
    d = fx._read(spark, sf_dir, "documents").select(
        "source", "doc_id", "n_chars"
    )
    return sp.ares_sample_per_group(
        d, "source", "doc_id", "n_chars", k=3
    ).select("source", "doc_id", "sample_rank")


@_register("copurchase_bfs_hops", gph.bfs_oracle_sql(rounds=4))
def copurchase_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-depth BFS over the part co-purchase graph: per-hop node
    histogram within 4 hops of the smallest part key. The third
    iterative-graph primitive next to PageRank (value iteration) and
    min-label propagation (component flood) — min-plus relaxation with
    a sentinel for unreached nodes, exactly unrolled in the oracle."""
    dist = gph.bfs_hops(_copurchase_edges_shared(spark, sf_dir), rounds=4)
    return (
        dist.where(F.col("hops") < gph.BFS_INF)
        .groupBy("hops")
        .agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.min("node").alias("min_node"),
            F.max("node").alias("max_node"),
        )
    )


@_register(
    "customer_above_nation_avg",
    """
SELECT CAST(c.c_nationkey AS INTEGER) AS c_nationkey,
       CAST(COUNT(*) AS BIGINT) AS n_above
FROM customer c
WHERE CAST(c.c_acctbal AS DECIMAL(30,6))
      * (SELECT COUNT(*) FROM customer c2
         WHERE c2.c_nationkey = c.c_nationkey)
      > (SELECT SUM(CAST(c2.c_acctbal AS DECIMAL(30,6))) FROM customer c2
         WHERE c2.c_nationkey = c.c_nationkey)
GROUP BY c.c_nationkey
""",
)
def customer_above_nation_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers above their own nation's average balance, written as
    CORRELATED scalar subqueries (the classic decorrelation shape:
    Catalyst rewrites both subqueries into one aggregate + join — no
    per-row re-execution). The comparison is cross-engine exact:
    ``bal * n > sum`` in decimal instead of ``bal > avg`` in double
    (double averages diverge by accumulation order at ties)."""
    fx._read(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """
SELECT CAST(c.c_nationkey AS INT) AS c_nationkey,
       CAST(COUNT(*) AS BIGINT) AS n_above
FROM customer c
WHERE CAST(c.c_acctbal AS DECIMAL(30,6))
      * (SELECT COUNT(*) FROM customer c2
         WHERE c2.c_nationkey = c.c_nationkey)
      > (SELECT SUM(CAST(c2.c_acctbal AS DECIMAL(30,6))) FROM customer c2
         WHERE c2.c_nationkey = c.c_nationkey)
GROUP BY c.c_nationkey
"""
    )


# ---------------------------------------------------------------------------
# Round-5 continuation: SQL-surface batch — listagg WITHIN GROUP,
# GROUP BY ALL / ORDER BY ALL, windowed median, Benford digit audit
# ---------------------------------------------------------------------------


@_register(
    "region_nation_roster",
    """
SELECT r.r_name AS r_name,
       string_agg(n.n_name, ',' ORDER BY n.n_name) AS nations,
       CAST(COUNT(*) AS BIGINT) AS n_nations
FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name
""",
)
def region_nation_roster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation: Spark 4's ``listagg(...) WITHIN GROUP
    (ORDER BY ...)`` (SQL:2023) against DuckDB's ``string_agg(x, sep
    ORDER BY x)`` spelling — same semantics, per-dialect syntax. The
    explicit WITHIN GROUP ordering is what makes the concatenation
    deterministic; an unordered listagg reflects arrival order and can
    never be oracle-compared. Scale: listagg is a regular two-phase
    aggregate (partial buffers concatenate), but the result row grows
    with group size — roster-style outputs must be bounded-cardinality
    groups (here: nations per region)."""
    n = fx._read(spark, sf_dir, "nation")
    r = fx._read(spark, sf_dir, "region")
    return (
        n.join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.expr(
                "listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name)"
            ).alias("nations"),
            F.count(F.lit(1)).cast("bigint").alias("n_nations"),
        )
    )


_GROUP_BY_ALL_SQL = """
SELECT CAST(year(o_orderdate) AS INTEGER) AS order_yr,
       o_orderstatus AS o_orderstatus,
       o_orderpriority AS o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders
GROUP BY ALL
ORDER BY ALL
"""


@_register("order_mix_group_by_all", _GROUP_BY_ALL_SQL)
def order_mix_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL / ORDER BY ALL (the analyst-SQL dialect extension
    both engines adopted): grouping keys inferred as every non-aggregate
    select item, ordering over all output columns left-to-right. The
    IDENTICAL statement runs on both engines — this query's point is the
    shared resolution rule, not the aggregation (ORDER BY ALL over the
    full output is also the cheapest deterministic total order: no
    tie-break column needed because the whole row IS the sort key)."""
    fx._read(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_GROUP_BY_ALL_SQL)


@_register(
    "store_revenue_7d_median",
    f"""
WITH {fx.SALES_CTE.strip()},
daily AS (
  SELECT store_key,
         trans_dt,
         CAST(trans_dt - DATE '1970-01-01' AS BIGINT) AS day_idx,
         CAST(round(SUM(CAST(sales_amt AS DECIMAL(30,6))), 2) * 100
              AS BIGINT) AS rev_cents
  FROM sales
  GROUP BY 1, 2, 3
)
SELECT store_key,
       trans_dt,
       CAST(median(rev_cents) OVER w AS DOUBLE) / 100 AS med_7d,
       CAST(COUNT(*) OVER w AS BIGINT) AS n_days_7d
FROM daily
WINDOW w AS (
  PARTITION BY store_key
  ORDER BY day_idx
  RANGE BETWEEN 6 PRECEDING AND CURRENT ROW
)
""",
)
def store_revenue_7d_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day windowed MEDIAN of daily revenue per store — the
    robust-statistics twin of store_revenue_7d_ma (a median shrugs off
    the one-day spikes that drag a moving average). Cross-engine
    exactness is engineered by running the median over integer CENTS:
    both engines interpolate the even-count case as the midpoint of two
    integers, which is exactly representable in double (x.5), and the
    final /100 is the same IEEE operation on both sides — median over
    raw doubles would inherit each engine's summation quirks. Scale:
    same RANGE-frame window as the MA (one shuffle on store_key); the
    frame re-sorts per partition but frames are 7 rows wide."""
    s = fx.sales(spark, sf_dir)
    daily = s.groupBy(
        "store_key",
        "trans_dt",
        F.datediff("trans_dt", F.lit("1970-01-01").cast("date")).alias(
            "day_idx"
        ),
    ).agg(
        # exact decimal sum -> round to cents -> *100: every step exact
        # and identically defined on both engines (per-row double*100
        # rounding and decimal->bigint casts are NOT: Spark truncates,
        # DuckDB rounds)
        (F.round(F.sum(F.col("sales_amt").cast("decimal(30,6)")), 2) * 100)
        .cast("bigint")
        .alias("rev_cents")
    )
    w = (
        Window.partitionBy("store_key")
        .orderBy("day_idx")
        .rangeBetween(-6, Window.currentRow)
    )
    return daily.select(
        "store_key",
        "trans_dt",
        # F.median disallows window frames (INVALID_WINDOW_SPEC_FOR_
        # AGGREGATION_FUNC); exact percentile(0.5) is the same
        # interpolated statistic and accepts one
        (
            F.percentile("rev_cents", F.lit(0.5)).over(w).cast("double") / 100
        ).alias("med_7d"),
        F.count(F.lit(1)).over(w).cast("bigint").alias("n_days_7d"),
    )


#: Benford expected first-digit frequencies, parts-per-million
#: (log10(1 + 1/d) rounded to the nearest ppm — plan constants, no ln()
#: evaluated inside either engine)
_BENFORD_PPM = {
    1: 301030, 2: 176091, 3: 124939, 4: 96910, 5: 79181,
    6: 66947, 7: 57992, 8: 51153, 9: 45757,
}
_BENFORD_CASE = " ".join(
    f"WHEN '{d}' THEN {p}" for d, p in _BENFORD_PPM.items()
)


@_register(
    "order_price_benford",
    f"""
WITH digits AS (
  SELECT substring(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
           AS d1
  FROM orders
  WHERE o_totalprice >= 1
),
counts AS (
  SELECT d1, COUNT(*) AS n FROM digits GROUP BY 1
)
SELECT d1,
       CAST(n AS BIGINT) AS n,
       CAST((n * 1000000) // (SELECT SUM(n) FROM counts) AS BIGINT)
         AS obs_ppm,
       CAST(CASE d1 {_BENFORD_CASE} END AS BIGINT) AS benford_ppm
FROM counts
""",
)
def order_price_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit over order totals — the classic
    fabricated-data screen (synthetic uniform prices fail it loudly,
    which is itself the informative answer on this fixture). Engine
    stability by construction: the digit comes from the STRING of
    floor(price) as BIGINT (never the double itself — Spark renders
    doubles >= 1e7 in scientific notation), observed shares are integer
    ppm via exact integer division, and the Benford expectations are
    precomputed ppm literals (no ln()/log10() evaluated at runtime —
    correctly-rounded transcendentals are not guaranteed cross-engine).
    Scale: one scan, one 9-group aggregate; the total is a broadcast
    1-row join."""
    o = fx._read(spark, sf_dir, "orders")
    counts = (
        o.where(F.col("o_totalprice") >= 1)
        .select(
            F.substring(
                F.floor("o_totalprice").cast("bigint").cast("string"), 1, 1
            ).alias("d1")
        )
        .groupBy("d1")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    total = counts.agg(F.sum("n").alias("tot"))
    benford = F.create_map(
        *[x for d, p in _BENFORD_PPM.items() for x in (F.lit(str(d)), F.lit(p))]
    )
    return counts.crossJoin(F.broadcast(total)).select(
        "d1",
        F.col("n").cast("bigint").alias("n"),
        F.expr("(n * 1000000) div tot").cast("bigint").alias("obs_ppm"),
        benford[F.col("d1")].cast("bigint").alias("benford_ppm"),
    )


@_register("copurchase_triangles", gph.triangle_oracle_sql())
def copurchase_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census of the part co-purchase graph (count, wedges,
    global clustering coefficient in exact ppm) via degree-ordered
    orientation — the classic distributed triangle kernel: orientation
    caps per-node out-adjacency at O(sqrt(m)), so the wedge join is
    O(m^1.5) worst-case instead of sum-of-squared-degrees, and a hub
    part co-purchased with everything cannot explode the plan. The
    graph is the SUPPORT-FILTERED copurchase graph (pairs in >= 2
    distinct orders, graph.TRIANGLE_MIN_SUPPORT): the raw clique-union
    graph is near-dense and its triangle census is both meaningless
    (every order contributes a clique) and a measured 22 s wedge-join
    bomb. All arithmetic integer-exact (operators/graph.triangle_count
    for the orientation-completeness argument)."""
    return gph.triangle_count(
        _copurchase_edges_shared(spark, sf_dir, supported=True)
    )


@_register(
    "neardup_prefix_filter",
    dd.ngram_jaccard_sql(dd.PREFIX_JACCARD_THRESHOLD),
)
def neardup_prefix_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Jaccard >= 0.7 near-dup pairs via PREFIX FILTERING
    (AllPairs/PPJoin): the deterministic-complete alternative to
    MinHash-LSH — only each doc's ~30% RAREST shingles (global
    df-ascending order) enter the candidate self-join, provably
    missing no qualifying pair, and the stop-shingle hot buckets that
    make the naive inverted index quadratic never reach the join. The
    oracle is the full inverted-index exact join at the same
    threshold: identical output proves the filter lossless
    (operators/dedup.prefix_filter_neardup for the completeness
    argument)."""
    return dd.prefix_filter_neardup(fx._read(spark, sf_dir, "documents"))


@_register(
    "doc_surprisal_score",
    f"""
WITH toks AS (
  SELECT doc_id, unnest({tx.TOKENS_SQL.format(c='text')}) AS tok
  FROM documents
),
vocab AS (
  SELECT tok, CAST(COUNT(*) AS BIGINT) AS n FROM toks GROUP BY 1
),
tot AS (
  SELECT CAST(SUM(n) AS BIGINT) AS t FROM vocab
),
contrib AS (
  SELECT tok,
         CAST(round(CAST(ln(CAST(t AS DOUBLE) / n) AS DECIMAL(38,12)), 6)
              AS DECIMAL(38,6)) AS c
  FROM vocab, tot
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_toks,
       CAST(CAST(SUM(c) AS DOUBLE) / COUNT(*) AS DOUBLE) AS avg_surprisal
FROM toks JOIN contrib USING (tok)
GROUP BY doc_id
""",
)
def doc_surprisal_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document average unigram surprisal -ln p(tok) — the cheapest
    perplexity proxy for corpus quality filtering (gibberish and
    boilerplate separate from natural text without any model): a doc of
    corpus-rare tokens scores high, a doc of stop-words scores low.
    Two-pass plan: corpus vocabulary with counts (bounded by |V|, AQE
    broadcasts it when small), per-TYPE contribution ln(total/n)
    computed once per vocab word and rounded IN DECIMAL at 6 places
    (the corpus_drift_psi trick — per-token doubles summed in exact
    decimal make the per-doc average partition- and engine-stable; the
    ln() last-ulp caveat documented there applies), then joined back to
    the token stream and averaged per doc. The join-back fans out per
    occurrence — linear in corpus tokens, no pair explosion, and hot
    stop-word keys are pure map-side fan-out, not aggregation skew."""
    d = fx._read(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(tx.tokens(F.col("text"))).alias("tok")
    )
    vocab = toks.groupBy("tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    tot = vocab.agg(F.sum("n").cast("bigint").alias("t"))
    contrib = vocab.crossJoin(F.broadcast(tot)).select(
        "tok",
        F.expr(
            "CAST(round(CAST(ln(CAST(t AS DOUBLE) / n) AS DECIMAL(38,12)),"
            " 6) AS DECIMAL(38,6))"
        ).alias("c"),
    )
    return (
        toks.join(contrib, "tok")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_toks"),
            (F.sum("c").cast("double") / F.count(F.lit(1)))
            .cast("double")
            .alias("avg_surprisal"),
        )
    )


# Winsorization cutpoints as DYADIC quantiles (1/16, 15/16): the
# interpolation index (n-1)*p then has a power-of-two denominator, so
# lo + (hi-lo)*frac over integer cents is EXACT in double no matter how
# each engine algebraically arranges the interpolation formula —
# non-dyadic p (0.05) leaves a last-ulp to the formula shape.
_WINSOR_LO = "0.0625"
_WINSOR_HI = "0.9375"


@_register(
    "winsorized_balance_stats",
    f"""
WITH cents AS (
  SELECT c_nationkey,
         CAST(round(CAST(c_acctbal AS DECIMAL(30,6)), 2) * 100 AS BIGINT)
           AS bal_c
  FROM customer
),
cuts AS (
  SELECT c_nationkey,
         quantile_cont(bal_c, {_WINSOR_LO}) AS lo,
         quantile_cont(bal_c, {_WINSOR_HI}) AS hi
  FROM cents GROUP BY 1
)
SELECT CAST(c.c_nationkey AS INTEGER) AS c_nationkey,
       CAST(COUNT(*) AS BIGINT) AS n_cust,
       {_m("MIN(lo) / 100")} AS cut_lo,
       {_m("MIN(hi) / 100")} AS cut_hi,
       {_m(_ds("CAST(bal_c AS DOUBLE) / 100") + " / COUNT(*)")} AS mean_raw,
       {_m(_ds("LEAST(GREATEST(CAST(bal_c AS DOUBLE), lo), hi) / 100")
           + " / COUNT(*)")} AS mean_winsor
FROM cents c JOIN cuts USING (c_nationkey)
GROUP BY c.c_nationkey
""",
)
def winsorized_balance_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized per-nation balance means: clamp each balance at the
    group's 1/16 and 15/16 quantiles, then compare the robust mean to
    the raw mean — the standard outlier-resistant aggregate for
    monitoring skewed money columns. Exactness engineering: quantiles
    run over INTEGER cents at DYADIC probabilities (see _WINSOR_LO
    comment — dyadic interpolation indices make the cutpoint bit-exact
    across engines regardless of formula arrangement), the clamped
    values have <= 4 fractional decimal digits so the decimal sum is
    exact, and means go through the house money() rounding. Two-phase
    plan: per-group cutpoints (sort-based percentile agg), join back
    (AQE broadcasts the 25-row cut relation), one clamped aggregate."""
    c = fx._read(spark, sf_dir, "customer")
    cents = c.select(
        "c_nationkey",
        (F.round(F.col("c_acctbal").cast("decimal(30,6)"), 2) * 100)
        .cast("bigint")
        .alias("bal_c"),
    )
    cuts = cents.groupBy("c_nationkey").agg(
        F.expr(f"percentile(bal_c, {_WINSOR_LO})").alias("lo"),
        F.expr(f"percentile(bal_c, {_WINSOR_HI})").alias("hi"),
    )
    clamped = F.expr("LEAST(GREATEST(CAST(bal_c AS DOUBLE), lo), hi) / 100")
    return (
        cents.join(cuts, "c_nationkey")
        .groupBy(F.col("c_nationkey").cast("int").alias("c_nationkey"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_cust"),
            money(F.min("lo") / 100).alias("cut_lo"),
            money(F.min("hi") / 100).alias("cut_hi"),
            money(
                decimal_sum(F.expr("CAST(bal_c AS DOUBLE) / 100"))
                / F.count(F.lit(1))
            ).alias("mean_raw"),
            money(decimal_sum(clamped) / F.count(F.lit(1))).alias(
                "mean_winsor"
            ),
        )
    )


# ---------------------------------------------------------------------------
# BM25 ad-hoc retrieval scoring — shared SQL fragments evaluated verbatim
# by both engines (the corpus_drift_psi/_DRIFT_* discipline): identical
# double arithmetic shape, idf ln() rounded in DECIMAL, and the per-doc
# term sum written as a FIXED-ORDER chain (a SUM() over terms would
# reintroduce engine-dependent double accumulation order).
# ---------------------------------------------------------------------------

_BM25_TERMS = ("spark", "join", "window")
_BM25_K1 = "1.2"
_BM25_B = "0.75"
#: columns in scope: tf, dl, df, nd (bigint), avgdl (double)
_BM25_IDF = (
    "CAST(CAST(round(CAST(ln((CAST(nd AS DOUBLE) - df + 0.5) / (df + 0.5)"
    " + 1) AS DECIMAL(38,12)), 6) AS DECIMAL(38,6)) AS DOUBLE)"
)
_BM25_SCORE = (
    f"({_BM25_IDF} * (CAST(tf AS DOUBLE) * (1 + {_BM25_K1}))"
    f" / (CAST(tf AS DOUBLE) + {_BM25_K1} * (1 - {_BM25_B} + {_BM25_B}"
    f" * (CAST(dl AS DOUBLE) / avgdl))))"
)
_BM25_DOC_SUM = " + ".join(
    f"COALESCE(MAX(CASE WHEN tok = '{t}' THEN s END), CAST(0 AS DOUBLE))"
    for t in _BM25_TERMS
)
_BM25_TERM_LIST = ", ".join(f"'{t}'" for t in _BM25_TERMS)


@_register(
    "bm25_search",
    f"""
WITH toks AS (
  SELECT doc_id, unnest({tx.TOKENS_SQL.format(c='text')}) AS tok
  FROM documents
),
dl AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM toks GROUP BY 1
),
stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS nd,
         (CAST(SUM(dl) AS DOUBLE) / COUNT(*)) AS avgdl
  FROM dl
),
tf AS (
  SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
  FROM toks WHERE tok IN ({_BM25_TERM_LIST})
  GROUP BY 1, 2
),
dfreq AS (
  SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1
),
scored AS (
  SELECT t.doc_id, t.tok, {_BM25_SCORE} AS s
  FROM tf t
  JOIN dfreq USING (tok)
  JOIN dl USING (doc_id)
  CROSS JOIN stats
)
SELECT doc_id,
       {_BM25_DOC_SUM} AS bm25,
       CAST(COUNT(*) AS BIGINT) AS n_terms
FROM scored
GROUP BY doc_id
ORDER BY bm25 DESC, doc_id ASC
LIMIT 20
""",
)
def bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 documents by BM25 (k1=1.2, b=0.75) for a fixed 3-term
    query — the classic lexical retrieval scorer a training-data
    pipeline uses for eval-set mining and contamination triage.
    Cross-engine exactness: idf's ln() is rounded IN DECIMAL at 6
    places per TERM (3 constants, the corpus_drift_psi trick), every
    other factor is identically-shaped IEEE double arithmetic on
    integers, and the per-doc sum over terms is a FIXED-ORDER
    COALESCE(MAX(CASE))+... chain — a plain SUM would hand the
    accumulation order to each engine. Deterministic top-k via the
    doc_id tie-break (TakeOrdered, no global sort materialization).
    Scale: tf touches only posting rows of the query terms (predicate
    pushed to the token stream); dl/stats are one bounded aggregate;
    the joins are equi-joins with a broadcast 1-row stats relation."""
    d = fx._read(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(tx.tokens(F.col("text"))).alias("tok")
    )
    dl = toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("dl")
    )
    stats = dl.agg(
        F.count(F.lit(1)).cast("bigint").alias("nd"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )
    tf = (
        toks.where(F.col("tok").isin(*_BM25_TERMS))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )
    dfreq = tf.groupBy("tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("df")
    )
    scored = (
        tf.join(dfreq, "tok")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", "tok", F.expr(_BM25_SCORE).alias("s"))
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.expr(_BM25_DOC_SUM).alias("bm25"),
            F.count(F.lit(1)).cast("bigint").alias("n_terms"),
        )
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(20)
    )


@_register(
    "quantile_normalized_doclen",
    f"""
WITH ranked AS (
  SELECT source, doc_id, n_chars,
         ROW_NUMBER() OVER (
           PARTITION BY source ORDER BY n_chars, doc_id
         ) AS rnk
  FROM documents
),
ref AS (
  SELECT rnk,
         {_m(_ds("CAST(n_chars AS DOUBLE)") + " / COUNT(*)")} AS qnorm
  FROM ranked GROUP BY rnk
)
SELECT source, doc_id, CAST(n_chars AS BIGINT) AS n_chars, qnorm
FROM ranked JOIN ref USING (rnk)
""",
)
def quantile_normalized_doclen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile normalization of document lengths across sources (the
    bioinformatics-standard distribution equalizer, applied to the
    corpus-mixing problem): rank docs within each source, average the
    length at each rank ACROSS sources, and assign every doc the
    cross-source average at its rank — after which each source's
    length distribution is identical while preserving within-source
    order. Rank ties broken by doc_id (total order, engine-stable);
    the per-rank average is an exact decimal sum through the money
    macros. Scale: one window per source partition + a groupBy on rank
    + an equi-join back — all shuffles on bounded keys; no source may
    be empty-partitioned since ranks derive from actual rows."""
    d = fx._read(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    ranked = d.select(
        "source", "doc_id", "n_chars", F.row_number().over(w).alias("rnk")
    )
    ref = ranked.groupBy("rnk").agg(
        money(
            decimal_sum(F.col("n_chars").cast("double"))
            / F.count(F.lit(1))
        ).alias("qnorm")
    )
    return ranked.join(ref, "rnk").select(
        "source", "doc_id", F.col("n_chars").cast("bigint").alias("n_chars"),
        "qnorm",
    )


@_register(
    "view_to_purchase_latency",
    f"""
WITH {fx.EVENTS_STREAM_CTE.strip()},
pu AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'view' THEN CAST(ts AS DATE) END)
           AS first_view,
         MIN(CASE WHEN event_type = 'purchase' THEN CAST(ts AS DATE) END)
           AS first_purchase
  FROM events_norm GROUP BY 1
),
viewers AS (
  SELECT * FROM pu WHERE first_view IS NOT NULL
),
tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS t FROM viewers
),
hist AS (
  SELECT CAST(first_purchase - first_view AS BIGINT) AS day_offset,
         CAST(COUNT(*) AS BIGINT) AS n_users
  FROM viewers
  WHERE first_purchase >= first_view
  GROUP BY 1
)
SELECT day_offset,
       n_users,
       CAST(SUM(n_users) OVER (
              ORDER BY day_offset
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
            ) * 1000000 // t AS BIGINT) AS cum_conv_ppm
FROM hist, tot
""",
)
def view_to_purchase_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-conversion curve: for every user with a view event, days
    from first view to first purchase (same-day = 0), as a histogram
    with the CUMULATIVE share of all viewers converted by each offset
    (exact integer ppm) — the product-analytics complement of the
    funnel/retention operators in operators/behavior.py. The
    cumulative sum runs through functions.ordered.with_running_sum
    (range-partitioned two-level prefix sum), not an
    empty-partitionBy window — the histogram is small but the repo
    bans the one-task window shape everywhere. Conversion before the
    first view is excluded (purchase-first users are attribution
    noise, not conversions)."""
    from .functions.ordered import with_running_sum

    ev = fx._read(spark, sf_dir, "events")
    per_user = (
        ev.select(
            "user_id",
            "event_type",
            F.to_date(fx.event_ts_micros(ev)).alias("d"),
        )
        .groupBy("user_id")
        .agg(
            F.min(F.when(F.col("event_type") == "view", F.col("d"))).alias(
                "first_view"
            ),
            F.min(
                F.when(F.col("event_type") == "purchase", F.col("d"))
            ).alias("first_purchase"),
        )
        .where(F.col("first_view").isNotNull())
        .persist()
    )
    tot = per_user.agg(F.count(F.lit(1)).cast("bigint").alias("t"))
    hist = (
        per_user.where(F.col("first_purchase") >= F.col("first_view"))
        .select(
            F.datediff("first_purchase", "first_view")
            .cast("bigint")
            .alias("day_offset")
        )
        .groupBy("day_offset")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
        .withColumn("n_dec", F.col("n_users").cast("decimal(38,0)"))
    )
    cum, _total = with_running_sum(
        hist, [F.col("day_offset")], "n_dec", running_col="cum_n"
    )
    return cum.crossJoin(F.broadcast(tot)).select(
        "day_offset",
        "n_users",
        F.expr("(cast(cum_n as decimal(38,0)) * 1000000) div t")
        .cast("bigint")
        .alias("cum_conv_ppm"),
    )


# ---------------------------------------------------------------------------
# Graph link prediction, interval-sweep concurrency, robust MAD outliers
# ---------------------------------------------------------------------------


@_register("copurchase_link_prediction", gph.link_prediction_oracle_sql())
def copurchase_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 part pairs most likely to be co-purchased NEXT: neighborhood
    Jaccard over the support-filtered copurchase graph, existing edges
    anti-joined out — the classic common-neighbors link-prediction
    kernel (operators/graph.jaccard_link_prediction for the wedge-join
    plan and hub-capping notes). All-integer jaccard_ppm with (u, w)
    tie-breaks keeps the top-k engine-stable."""
    return gph.jaccard_link_prediction(
        _copurchase_edges_shared(spark, sf_dir, supported=True)
    )


@_register(
    "peak_session_concurrency",
    f"""
WITH {fx.EVENTS_STREAM_CTE.strip()},
{win.SESSION_CTES},
sessions AS (
  SELECT user_id,
         MIN(ts) AS s,
         MAX(ts) + {win.SESSION_GAP_SQL} AS e
  FROM sess GROUP BY user_id, sid
),
bounds AS (
  SELECT s AS t, 1 AS d FROM sessions
  UNION ALL
  SELECT e AS t, -1 AS d FROM sessions
),
net AS (
  SELECT t, CAST(SUM(d) AS BIGINT) AS net FROM bounds GROUP BY t
),
run AS (
  SELECT t,
         SUM(net) OVER (
           ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS c
  FROM net
),
peak AS (SELECT MAX(c) AS p FROM run)
SELECT CAST(p AS BIGINT) AS peak_concurrency,
       (SELECT MIN(t) FROM run WHERE c = p) AS first_peak_ts,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM sessions) AS n_sessions
FROM peak
""",
)
def peak_session_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak number of simultaneously open user sessions and the first
    instant it is reached — the classic interval sweep (+1 at session
    start, -1 at end) over the same 4-hour-gap sessions the
    session_windows query emits. Engine stability by construction:
    boundaries are aggregated to one NET integer delta per distinct
    timestamp BEFORE the prefix sum, so the running relation has
    unique sort keys (no within-tie intermediate values for engines to
    order differently), and end-before-start at equal instants is
    exactly the half-open [start, end) overlap convention. The prefix
    sum runs through functions.ordered.with_running_sum (two-level
    range-partitioned, no one-task global window); peak and argmin are
    bounded scalar aggregates over it."""
    from .functions.ordered import with_running_sum

    sess = win.sessionized(fx.events_stream(spark, sf_dir))
    bounds = sess.select(
        F.col("session_start").alias("t"), F.lit(1).alias("d")
    ).unionAll(
        sess.select(F.col("session_end").alias("t"), F.lit(-1).alias("d"))
    )
    net = bounds.groupBy("t").agg(
        F.sum("d").cast("decimal(38,0)").alias("net")
    )
    run, _tot = with_running_sum(net, [F.col("t")], "net", running_col="c")
    peak = run.agg(F.max("c").alias("p"))
    n_s = sess.agg(F.count(F.lit(1)).cast("bigint").alias("n_sessions"))
    return (
        run.crossJoin(F.broadcast(peak))
        .where(F.col("c") == F.col("p"))
        .agg(
            F.max("c").cast("bigint").alias("peak_concurrency"),
            F.min("t").alias("first_peak_ts"),
        )
        .crossJoin(F.broadcast(n_s))
        .select("peak_concurrency", "first_peak_ts", "n_sessions")
    )


@_register(
    "store_revenue_mad_outliers",
    f"""
WITH {fx.SALES_CTE.strip()},
daily AS (
  SELECT store_key,
         trans_dt,
         CAST(round(SUM(CAST(sales_amt AS DECIMAL(30,6))), 2) * 100
              AS BIGINT) AS rev_cents
  FROM sales
  GROUP BY 1, 2
),
r AS (
  SELECT *,
         ROW_NUMBER() OVER (
           PARTITION BY store_key ORDER BY rev_cents, trans_dt
         ) AS rn,
         CAST(COUNT(*) OVER (PARTITION BY store_key) AS BIGINT) AS n
  FROM daily
),
m AS (
  SELECT *,
         MAX(CASE WHEN rn = (n + 1) // 2 THEN rev_cents END)
           OVER (PARTITION BY store_key) AS med_cents
  FROM r
),
a AS (
  SELECT *, abs(rev_cents - med_cents) AS abs_dev FROM m
),
r2 AS (
  SELECT *,
         ROW_NUMBER() OVER (
           PARTITION BY store_key ORDER BY abs_dev, trans_dt
         ) AS rn2
  FROM a
),
m2 AS (
  SELECT *,
         MAX(CASE WHEN rn2 = (n + 1) // 2 THEN abs_dev END)
           OVER (PARTITION BY store_key) AS mad_cents
  FROM r2
)
SELECT store_key,
       trans_dt,
       rev_cents,
       CAST(med_cents AS BIGINT) AS med_cents,
       CAST(mad_cents AS BIGINT) AS mad_cents
FROM m2
WHERE abs_dev > 3 * mad_cents
""",
)
def store_revenue_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-store outlier days: |daily revenue - median| > 3 * MAD
    (median absolute deviation) — the standard-deviation screen's
    robust sibling (store_revenue_anomaly_days is the sigma version);
    MAD tolerates up to 50% contaminated days where trailing sigma is
    dragged by the outliers it is hunting. Exact by construction:
    revenue in integer cents (the store_revenue_7d_median fragment),
    both medians rank-PINNED at ceil(n/2) under a total order
    (rev/dev, trans_dt) — the repo's lower-median convention
    (token_length_percentiles_exact) rather than engine median()
    interpolation — and the 3*MAD comparison is pure integers. Plan:
    one hash aggregate, then all five window passes share the single
    store_key partitioning (one shuffle, no empty-partitionBy
    windows); whole-partition frames are computed once per group."""
    s = fx.sales(spark, sf_dir)
    daily = s.groupBy("store_key", "trans_dt").agg(
        (F.round(F.sum(F.col("sales_amt").cast("decimal(30,6)")), 2) * 100)
        .cast("bigint")
        .alias("rev_cents")
    )
    w_all = Window.partitionBy("store_key")
    w_rank = Window.partitionBy("store_key").orderBy("rev_cents", "trans_dt")
    r = daily.select(
        "*",
        F.row_number().over(w_rank).alias("rn"),
        F.count(F.lit(1)).over(w_all).cast("bigint").alias("n"),
    )
    m = r.withColumn(
        "med_cents",
        F.max(
            F.when(F.col("rn") == F.expr("(n + 1) div 2"), F.col("rev_cents"))
        ).over(w_all),
    ).withColumn("abs_dev", F.abs(F.col("rev_cents") - F.col("med_cents")))
    w_rank2 = Window.partitionBy("store_key").orderBy("abs_dev", "trans_dt")
    m2 = m.withColumn("rn2", F.row_number().over(w_rank2)).withColumn(
        "mad_cents",
        F.max(
            F.when(F.col("rn2") == F.expr("(n + 1) div 2"), F.col("abs_dev"))
        ).over(w_all),
    )
    return m2.where(F.col("abs_dev") > 3 * F.col("mad_cents")).select(
        "store_key",
        "trans_dt",
        "rev_cents",
        F.col("med_cents").cast("bigint").alias("med_cents"),
        F.col("mad_cents").cast("bigint").alias("mad_cents"),
    )


# ---------------------------------------------------------------------------
# Seasonality analytics (lag-7 autocorrelation, weekday-adjusted outliers),
# l-diversity privacy audit, per-document token entropy
# ---------------------------------------------------------------------------

#: 6-decimal presentation rounding via the money() decimal hop at scale 6 —
#: for correlation/entropy outputs where 2 decimals is too coarse.
_ROUND6_SQL = "CAST(round(CAST({x} AS DECIMAL(30,12)), 6) AS DOUBLE)"

# single definition of the 6-decimal hop (functions/stats.py) — a second
# copy here could drift from the kernels' tie-break rule
from .functions.stats import round6 as _round6  # noqa: E402


_DAILY_REV_CTE = f"""
daily AS (
  SELECT store_key, trans_dt,
         CAST(round(SUM(CAST(sales_amt AS DECIMAL(30,6))), 2) * 100
              AS BIGINT) AS rev_cents
  FROM sales
  GROUP BY 1, 2
)"""


def _daily_rev(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        fx.sales(spark, sf_dir)
        .groupBy("store_key", "trans_dt")
        .agg(
            (
                F.round(
                    F.sum(F.col("sales_amt").cast("decimal(30,6)")), 2
                )
                * 100
            )
            .cast("bigint")
            .alias("rev_cents")
        )
    )


@_register(
    "store_revenue_autocorr7",
    f"""
WITH {fx.SALES_CTE.strip()},
{_DAILY_REV_CTE.strip()},
pairs AS (
  SELECT a.store_key,
         CAST(a.rev_cents AS DECIMAL(38,0)) AS x,
         CAST(b.rev_cents AS DECIMAL(38,0)) AS y
  FROM daily a
  JOIN daily b
    ON a.store_key = b.store_key
   AND b.trans_dt = a.trans_dt + INTERVAL '7' DAY
),
m AS (
  SELECT store_key,
         CAST(COUNT(*) AS DECIMAL(38,0)) AS n,
         SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * x) AS sxx, SUM(y * y) AS syy, SUM(x * y) AS sxy
  FROM pairs GROUP BY 1
)
SELECT CAST(store_key AS BIGINT) AS store_key,
       CAST(n AS BIGINT) AS n_pairs,
       {_ROUND6_SQL.format(x='''
         CAST(n * sxy - sx * sy AS DOUBLE)
         / nullif(sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                       * CAST(n * syy - sy * sy AS DOUBLE)), 0.0)''')}
         AS autocorr7
FROM m
WHERE n >= 30
""",
)
def store_revenue_autocorr7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly seasonality strength per store: Pearson autocorrelation of
    daily revenue at lag 7 DAYS (calendar shift, not 7 rows — gap days
    pair with nothing instead of silently shifting the series). High
    autocorr7 = stable weekly rhythm (forecastable, weekday-aware
    staffing); near zero = demand is event-driven.

    Exactness: revenue in integer cents, the lag pairing expressed as an
    EQUI-join (the 7-day shift is applied to one side's key before the
    join, so no non-equi range condition), and all five moment sums in
    DECIMAL(38,0) — exact integer arithmetic, order-independent, safely
    inside 38 digits (cents^2 * days * n < 1e24). Only the final
    correlation ratio runs in double — on bit-identical inputs through a
    shared expression string — and is presentation-rounded through the
    scale-6 decimal hop. Plan: one hash agg, one shuffle-on-store_key
    self-equi-join, one hash agg; n>=30 suppresses stores with too few
    pairs for a meaningful estimate."""
    from .functions.stats import CORR_DEN_EXPR, CORR_NUM_EXPR, moment_sums

    daily = _daily_rev(spark, sf_dir)
    shifted = daily.select(
        "store_key",
        F.date_sub("trans_dt", 7).alias("trans_dt"),
        F.col("rev_cents").alias("y"),
    )
    pairs = daily.join(shifted, ["store_key", "trans_dt"])
    m = moment_sums(pairs, ["store_key"], F.col("rev_cents"), F.col("y"))
    return m.where(F.col("n") >= 30).select(
        F.col("store_key").cast("bigint").alias("store_key"),
        F.col("n").cast("bigint").alias("n_pairs"),
        _round6(
            F.expr(CORR_NUM_EXPR)
            / F.nullif(F.expr(CORR_DEN_EXPR), F.lit(0.0))
        ).alias("autocorr7"),
    )


@_register(
    "store_revenue_dow_outliers",
    f"""
WITH {fx.SALES_CTE.strip()},
daily AS (
  SELECT store_key, trans_dt, isodow(trans_dt) - 1 AS dow,
         CAST(round(SUM(CAST(sales_amt AS DECIMAL(30,6))), 2) * 100
              AS BIGINT) AS rev_cents
  FROM sales GROUP BY 1, 2, 3
),
r AS (
  SELECT *,
         ROW_NUMBER() OVER (
           PARTITION BY store_key, dow ORDER BY rev_cents, trans_dt) AS rn,
         CAST(COUNT(*) OVER (PARTITION BY store_key, dow) AS BIGINT) AS n
  FROM daily
),
m AS (
  SELECT *,
         MAX(CASE WHEN rn = (n + 1) // 2 THEN rev_cents END)
           OVER (PARTITION BY store_key, dow) AS med
  FROM r
)
SELECT store_key, trans_dt, CAST(dow AS INTEGER) AS iso_dow,
       rev_cents, CAST(med AS BIGINT) AS dow_median_cents
FROM m WHERE rev_cents > 2 * med
""",
)
def store_revenue_dow_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality-ADJUSTED outlier days: daily revenue more than 2x the
    store's median FOR THAT WEEKDAY. A raw threshold flags every
    Saturday in a weekend-heavy store; comparing each day against its
    own weekday's median removes the weekly cycle first, so what
    remains is genuinely anomalous (store_revenue_mad_outliers is the
    robust-dispersion screen; this is the seasonal screen — a real
    monitoring stack runs both). Integer-exact end-to-end: cents
    revenue, rank-pinned lower median per (store, weekday) under a
    total order, integer 2x compare. Weekday convention: Spark
    ``weekday`` (0=Monday) == DuckDB ``isodow - 1`` (the
    weekday-bitmap query's mapping). Both window passes share the one
    (store_key, dow) partitioning — a single shuffle."""
    daily = (
        fx.sales(spark, sf_dir)
        .groupBy(
            "store_key",
            "trans_dt",
            F.expr("weekday(trans_dt)").alias("dow"),
        )
        .agg(
            (
                F.round(
                    F.sum(F.col("sales_amt").cast("decimal(30,6)")), 2
                )
                * 100
            )
            .cast("bigint")
            .alias("rev_cents")
        )
    )
    w_all = Window.partitionBy("store_key", "dow")
    w_rank = Window.partitionBy("store_key", "dow").orderBy(
        "rev_cents", "trans_dt"
    )
    m = (
        daily.select(
            "*",
            F.row_number().over(w_rank).alias("rn"),
            F.count(F.lit(1)).over(w_all).cast("bigint").alias("n"),
        )
        .withColumn(
            "med",
            F.max(
                F.when(
                    F.col("rn") == F.expr("(n + 1) div 2"), F.col("rev_cents")
                )
            ).over(w_all),
        )
    )
    return m.where(F.col("rev_cents") > 2 * F.col("med")).select(
        "store_key",
        "trans_dt",
        F.col("dow").cast("int").alias("iso_dow"),
        "rev_cents",
        F.col("med").cast("bigint").alias("dow_median_cents"),
    )


_LDIV_L = 3


@_register(
    "l_diversity_customers",
    f"""
WITH cls AS (
  SELECT c_mktsegment, c_nationkey,
         COUNT(*) AS class_size,
         COUNT(DISTINCT CAST(floor(c_acctbal / 1000) AS INTEGER))
           AS n_sensitive
  FROM customer
  GROUP BY 1, 2
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_classes,
       CAST(SUM(CASE WHEN n_sensitive < {_LDIV_L} THEN 1 ELSE 0 END)
            AS BIGINT) AS violating_classes,
       CAST(SUM(CASE WHEN n_sensitive < {_LDIV_L} THEN class_size ELSE 0 END)
            AS BIGINT) AS rows_at_risk,
       CAST(MIN(n_sensitive) AS BIGINT) AS achieved_l
FROM cls
""",
)
def l_diversity_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row l-diversity audit — k-anonymity's necessary complement
    (operators/privacy.l_diversity_summary): the k-anonymity queries
    treat the acctbal band as a quasi-identifier; here it is the
    SENSITIVE attribute, and the question becomes whether any
    (segment, nation) class is value-homogeneous — a class of 50
    customers all in the same balance band is perfectly 3-anonymous
    yet discloses every member's band outright. One grouped
    distinct-count pass, no window, no self-join."""
    c = fx._read(spark, sf_dir, "customer").withColumn(
        "bal_band", F.floor(F.col("c_acctbal") / 1000).cast("integer")
    )
    return pv.l_diversity_summary(
        c, ["c_mktsegment", "c_nationkey"], "bal_band", l=_LDIV_L
    )


@_register(
    "doc_token_entropy",
    f"""
WITH toks AS (
  SELECT doc_id, unnest({tx.TOKENS_SQL.format(c='text')}) AS tok
  FROM documents
),
cnt AS (
  SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS c FROM toks GROUP BY 1, 2
),
agg AS (
  SELECT doc_id,
         CAST(SUM(c) AS BIGINT) AS n_toks,
         CAST(COUNT(*) AS BIGINT) AS n_distinct,
         SUM(CAST(round(CAST(c * ln(CAST(c AS DOUBLE)) AS DECIMAL(38,12)), 6)
                  AS DECIMAL(38,6))) AS sclnc
  FROM cnt GROUP BY 1
)
SELECT doc_id, n_toks, n_distinct,
       {_ROUND6_SQL.format(x='''
         CAST(CAST(round(CAST(ln(CAST(n_toks AS DOUBLE)) AS DECIMAL(38,12)),
                         6) AS DECIMAL(38,6)) AS DOUBLE)
         - CAST(sclnc AS DOUBLE) / n_toks''')} AS entropy
FROM agg
""",
)
def doc_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document Shannon entropy of the token distribution (nats) —
    the complementary quality signal to doc_surprisal_score: surprisal
    measures rarity AGAINST THE CORPUS, entropy measures internal
    repetitiveness WITHIN the doc (keyword-stuffed or template text
    scores far below natural prose of the same length; entropy
    approaches ln(n_toks) when every token is distinct). Computed as
    H = ln(n) - (1/n) * sum(c * ln c) so only per-(doc, token) COUNTS
    feed the logs: each contribution is rounded IN DECIMAL at 6 places
    (doc_surprisal_score's trick; the ln() last-ulp caveat documented
    at corpus_drift_psi applies) and summed exactly, then the final
    ratio runs in double on identical inputs. Plan: explode ->
    grouped count -> grouped sum, all linear in corpus tokens with
    map-side partials; the decimal rounding keeps the result
    partition-count-independent — the cluster answer equals the
    local[32] answer bit-for-bit."""
    d = fx._read(spark, sf_dir, "documents")
    cnt = (
        d.select("doc_id", F.explode(tx.tokens(F.col("text"))).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    agg = cnt.groupBy("doc_id").agg(
        F.sum("c").cast("bigint").alias("n_toks"),
        F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
        F.sum(
            F.round(
                (F.col("c") * F.log(F.col("c").cast("double"))).cast(
                    "decimal(38,12)"
                ),
                6,
            ).cast("decimal(38,6)")
        ).alias("sclnc"),
    )
    ln_n = F.round(
        F.log(F.col("n_toks").cast("double")).cast("decimal(38,12)"), 6
    ).cast("decimal(38,6)")
    return agg.select(
        "doc_id",
        "n_toks",
        "n_distinct",
        _round6(
            ln_n.cast("double")
            - F.col("sclnc").cast("double") / F.col("n_toks")
        ).alias("entropy"),
    )


@_register(
    "customer_spend_gini",
    """
WITH spend AS (
  SELECT o_custkey,
         CAST(round(SUM(CAST(o_totalprice AS DECIMAL(30,6))), 2) * 100
              AS BIGINT) AS cents
  FROM orders GROUP BY 1
),
ranked AS (
  SELECT CAST(cents AS DECIMAL(38,0)) AS x,
         CAST(ROW_NUMBER() OVER (ORDER BY cents, o_custkey) AS DECIMAL(38,0))
           AS i
  FROM spend
),
agg AS (
  SELECT CAST(COUNT(*) AS DECIMAL(38,0)) AS n,
         SUM(x) AS sx,
         SUM(i * x) AS six
  FROM ranked
)
SELECT CAST(n AS BIGINT) AS n_customers,
       CAST(sx AS BIGINT) AS total_cents,
       CAST(CAST((2 * six - (n + 1) * sx) * 1000000 AS HUGEINT)
            // CAST(n * sx AS HUGEINT) AS BIGINT) AS gini_ppm
FROM agg
""",
)
def customer_spend_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer lifetime spend, in ppm — the single
    inequality number behind the pareto_customers curve (G = 0 everyone
    spends alike, G -> 1 a few whales carry the book). Exact by the
    rank formula G = (2*sum(i*x_i) - (n+1)*sum(x)) / (n*sum(x)) over
    ASCENDING-sorted integer cents: every term is a DECIMAL(38,0)
    integer (i*x < 1e20, the sum < 1e26 — inside 38 digits at any
    plausible scale), and the final ratio is exact integer division —
    Spark decimal ``div`` == DuckDB HUGEINT ``//`` (DECIMAL ``//`` in
    DuckDB routes through double and flips floor on near-integer
    quotients; observed on the KS twin at sf0.001). The global sort
    rank runs through functions.ordered.with_global_rank — range
    shuffle + partition-local row_number with literal offsets, no
    one-task window stage."""
    from .functions.stats import gini_ppm

    o = fx._read(spark, sf_dir, "orders")
    spend = o.groupBy("o_custkey").agg(
        (F.round(F.sum(F.col("o_totalprice").cast("decimal(30,6)")), 2) * 100)
        .cast("bigint")
        .alias("cents")
    )
    return gini_ppm(spend, "cents", "o_custkey").select(
        F.col("n").alias("n_customers"),
        F.col("total").alias("total_cents"),
        "gini_ppm",
    )


@_register(
    "lineitem_revenue_ks",
    """
WITH vals AS (
  SELECT CAST(round(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6)),
                    2) * 100 AS BIGINT) AS v,
         year(l_shipdate) <= 1997 AS a
  FROM lineitem
),
cnt AS (
  SELECT v,
         CAST(SUM(CASE WHEN a THEN 1 ELSE 0 END) AS DECIMAL(38,0)) AS ca,
         CAST(SUM(CASE WHEN a THEN 0 ELSE 1 END) AS DECIMAL(38,0)) AS cb
  FROM vals GROUP BY 1
),
tot AS (
  SELECT CAST(SUM(ca) AS DECIMAL(38,0)) AS na,
         CAST(SUM(cb) AS DECIMAL(38,0)) AS nb
  FROM cnt
),
delta AS (
  SELECT v, ca * nb - cb * na AS d FROM cnt, tot
),
run AS (
  SELECT v,
         SUM(d) OVER (ORDER BY v
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rd
  FROM delta
),
mx AS (SELECT MAX(abs(rd)) AS m FROM run)
SELECT CAST(na AS BIGINT) AS n_early,
       CAST(nb AS BIGINT) AS n_late,
       CAST(CAST(m * 1000000 AS HUGEINT) // CAST(na * nb AS HUGEINT)
            AS BIGINT) AS ks_ppm,
       (SELECT CAST(MIN(v) AS BIGINT) FROM run, mx WHERE abs(rd) = m)
         AS at_cents
FROM tot, mx
""",
)
def lineitem_revenue_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic between early (ship year
    <= 1997) and late per-line revenue distributions — the
    distribution-drift detector that completes the PSI / KL / JS family
    (corpus_drift_psi): PSI needs binning choices, KS is
    binning-free (sup over the ecdf gap) and EXACTLY computable in
    integers. Key identity: with per-value counts (ca, cb) and totals
    (na, nb), the scaled ecdf gap at v is Ca(v)*nb - Cb(v)*na — a
    RUNNING SUM of the per-value delta ca*nb - cb*na — so one exact
    decimal prefix sum (functions.ordered.with_running_sum, two-level
    range-partitioned, no one-task window) yields the whole curve;
    ks_ppm = max|gap| * 1e6 div (na*nb) in exact integer division
    (DuckDB side in HUGEINT — its DECIMAL // routes through double and
    flips floor on near-integer quotients, observed off-by-one at
    sf0.001). at_cents pins the argmax with a MIN(v) tie-break. Plan:
    one hash agg on value, tiny broadcast totals, range-shuffle prefix
    sum, bounded scalar aggregates."""
    from .functions.stats import ks_statistic

    li = fx._read(spark, sf_dir, "lineitem")
    vals = li.select(
        (
            F.round(
                (
                    F.col("l_extendedprice") * (1 - F.col("l_discount"))
                ).cast("decimal(30,6)"),
                2,
            )
            * 100
        )
        .cast("bigint")
        .alias("v"),
        (F.year("l_shipdate") <= 1997).alias("a"),
    )
    return ks_statistic(vals, "v", "a").select(
        F.col("n_a").alias("n_early"),
        F.col("n_b").alias("n_late"),
        "ks_ppm",
        F.col("at_value").alias("at_cents"),
    )


@_register(
    "store_revenue_trend",
    f"""
WITH {fx.SALES_CTE.strip()},
{_DAILY_REV_CTE.strip()},
idx AS (
  SELECT store_key,
         CAST(datediff('day', MIN(trans_dt) OVER (PARTITION BY store_key),
                       trans_dt) AS DECIMAL(38,0)) AS x,
         CAST(rev_cents AS DECIMAL(38,0)) AS y
  FROM daily
),
m AS (
  SELECT store_key,
         CAST(COUNT(*) AS DECIMAL(38,0)) AS n,
         SUM(x) AS sx, SUM(y) AS sy, SUM(x * x) AS sxx, SUM(x * y) AS sxy
  FROM idx GROUP BY 1
)
SELECT CAST(store_key AS BIGINT) AS store_key,
       CAST(n AS BIGINT) AS n_days,
       CAST(CAST((n * sxy - sx * sy) * 1000000 AS HUGEINT)
            // CAST(n * sxx - sx * sx AS HUGEINT) AS BIGINT)
         AS slope_microcents_per_day
FROM m WHERE n >= 30
""",
)
def store_revenue_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-store revenue TREND: the OLS slope of daily revenue against
    the day index, in micro-cents/day — growing vs declining stores as
    one robust number per store rather than an eyeballed chart.
    Integer-exact: x is the day offset from the store's own first day
    (a per-partition window MIN — no global scalar to broadcast), y is
    integer cents, the four moment sums accumulate in DECIMAL(38,0)
    (order-independent, cluster-size-independent), and the closed-form
    slope (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2) is exact integer division
    scaled to 1e6 (DuckDB side in HUGEINT — its DECIMAL // routes
    through double; see customer_spend_gini). Plan: one hash agg, one
    store-partitioned window pass, one hash agg — two shuffles, no
    self-join, trivially parallel by store."""
    from .functions.stats import SLOPE_PPM_EXPR, moment_sums

    daily = _daily_rev(spark, sf_dir)
    w = Window.partitionBy("store_key")
    idx = daily.select(
        "store_key",
        F.datediff(F.col("trans_dt"), F.min("trans_dt").over(w)).alias("x"),
        F.col("rev_cents").alias("y"),
    )
    m = moment_sums(idx, ["store_key"], F.col("x"), F.col("y"))
    return m.where(F.col("n") >= 30).select(
        F.col("store_key").cast("bigint").alias("store_key"),
        F.col("n").cast("bigint").alias("n_days"),
        F.expr(SLOPE_PPM_EXPR).alias("slope_microcents_per_day"),
    )


@_register(
    "brand_price_elasticity",
    """
WITH pts AS (
  SELECT p_brand,
         CAST(round(CAST(ln(l_extendedprice / l_quantity) AS DECIMAL(38,12)),
                    6) * 1000000 AS DECIMAL(38,0)) AS x,
         CAST(round(CAST(ln(CAST(l_quantity AS DOUBLE)) AS DECIMAL(38,12)),
                    6) * 1000000 AS DECIMAL(38,0)) AS y
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_quantity > 0 AND l_extendedprice > 0
),
m AS (
  SELECT p_brand,
         CAST(COUNT(*) AS DECIMAL(38,0)) AS n,
         SUM(x) AS sx, SUM(y) AS sy, SUM(x * x) AS sxx, SUM(x * y) AS sxy
  FROM pts GROUP BY 1
)
SELECT p_brand,
       CAST(n AS BIGINT) AS n_lines,
       CAST(CAST((n * sxy - sx * sy) * 1000000 AS HUGEINT)
            // CAST(n * sxx - sx * sx AS HUGEINT) AS BIGINT)
         AS elasticity_ppm
FROM m WHERE n >= 30
""",
)
def brand_price_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price elasticity proxy per brand: the OLS slope of ln(quantity)
    on ln(unit price) across order lines — the log-log regression whose
    slope reads directly as %-demand change per %-price change
    (negative = normal demand curve). The two logs run in double
    through IDENTICAL expression strings on both engines (IEEE ops on
    identical inputs), are immediately pinned to integer micros via the
    decimal-round hop (doc_surprisal_score's trick — after this point
    NOTHING depends on summation order), and the slope is exact integer
    arithmetic as in store_revenue_trend. Plan: broadcast part dim join
    (fact never shuffles for the join), one hash agg per brand — the
    whole regression is one map + one combine-friendly reduce; at 100TB
    the moment sums are per-brand partials, no row survives the map
    stage."""
    from .functions.stats import SLOPE_PPM_EXPR, moment_sums

    li = fx._read(spark, sf_dir, "lineitem")
    p = fx._read(spark, sf_dir, "part").select("p_partkey", "p_brand")
    pts = (
        li.where((F.col("l_quantity") > 0) & (F.col("l_extendedprice") > 0))
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .select(
            "p_brand",
            (
                F.round(
                    F.log(
                        F.col("l_extendedprice") / F.col("l_quantity")
                    ).cast("decimal(38,12)"),
                    6,
                )
                * 1000000
            ).alias("x"),
            (
                F.round(
                    F.log(F.col("l_quantity").cast("double")).cast(
                        "decimal(38,12)"
                    ),
                    6,
                )
                * 1000000
            ).alias("y"),
        )
    )
    m = moment_sums(pts, ["p_brand"], F.col("x"), F.col("y"))
    return m.where(F.col("n") >= 30).select(
        "p_brand",
        F.col("n").cast("bigint").alias("n_lines"),
        F.expr(SLOPE_PPM_EXPR).alias("elasticity_ppm"),
    )


@_register(
    "cohort_ltv_matrix",
    """
WITH o AS (
  SELECT o_custkey, CAST(o_orderdate AS DATE) AS d, o_totalprice
  FROM orders
),
firsts AS (
  SELECT o_custkey,
         MIN(year(d) * 12 + month(d) - 1) AS cm
  FROM o GROUP BY 1
),
j AS (
  SELECT f.cm,
         (year(o.d) * 12 + month(o.d) - 1) - f.cm AS age_months,
         o.o_totalprice AS p,
         o.o_custkey
  FROM o JOIN firsts f ON o.o_custkey = f.o_custkey
)
SELECT CAST(cm // 12 * 100 + cm % 12 + 1 AS INTEGER) AS cohort_month,
       CAST(age_months AS INTEGER) AS age_months,
       CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers,
       CAST(round(SUM(CAST(p AS DECIMAL(30,6))), 2) AS DOUBLE) AS revenue
FROM j GROUP BY 1, 2
""",
)
def cohort_ltv_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value matrix: customers grouped by FIRST-order
    month, revenue summed by months-since-acquisition — the money twin
    of weekly_cohort_retention (that one counts event activity; LTV is
    what acquisition spend is actually justified against). Month
    arithmetic stays in integers (linear month number y*12+m-1, so the
    age difference and the yyyymm render are exact on both engines —
    no interval/timestamp subtraction semantics to reconcile), revenue
    through the decimal-exact money sum. Plan: grouped MIN for
    first-order month, fact-fact equi-join back on o_custkey (both
    sides shuffle-partitioned on the same key; AQE broadcasts the
    firsts side when small), one grouped distinct-count+sum. Skew-safe:
    cohort keys are months, bounded cardinality, and the heavy join key
    is the customer — naturally high-cardinality."""
    o = fx._read(spark, sf_dir, "orders").select(
        "o_custkey",
        F.col("o_orderdate").cast("date").alias("d"),
        "o_totalprice",
    )
    mnum = F.year("d") * 12 + F.month("d") - 1
    firsts = o.groupBy("o_custkey").agg(F.min(mnum).alias("cm"))
    j = o.join(firsts, "o_custkey").select(
        "o_custkey",
        "cm",
        (mnum - F.col("cm")).alias("age_months"),
        F.col("o_totalprice").alias("p"),
    )
    return j.groupBy(
        (
            (F.col("cm") / 12).cast("int") * 100 + F.col("cm") % 12 + 1
        )
        .cast("int")
        .alias("cohort_month"),
        F.col("age_months").cast("int").alias("age_months"),
    ).agg(
        F.count_distinct("o_custkey").cast("bigint").alias("n_customers"),
        money_sum(F.col("p")).alias("revenue"),
    )


# ---------------------------------------------------------------------------
# Lorenz deciles + Theil index (inequality beyond the Gini scalar),
# bigram PMI collocations, weekly activity streaks, order cadence
# ---------------------------------------------------------------------------

_SPEND_CTE = """
spend AS (
  SELECT o_custkey,
         CAST(round(SUM(CAST(o_totalprice AS DECIMAL(30,6))), 2) * 100
              AS BIGINT) AS cents
  FROM orders GROUP BY 1
)"""


def _spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = fx._read(spark, sf_dir, "orders")
    return o.groupBy("o_custkey").agg(
        (F.round(F.sum(F.col("o_totalprice").cast("decimal(30,6)")), 2) * 100)
        .cast("bigint")
        .alias("cents")
    )


@_register(
    "customer_spend_lorenz",
    f"""
WITH {_SPEND_CTE.strip()},
ranked AS (
  SELECT cents, NTILE(10) OVER (ORDER BY cents, o_custkey) AS decile
  FROM spend
),
d AS (
  SELECT decile,
         CAST(COUNT(*) AS BIGINT) AS n_customers,
         CAST(SUM(CAST(cents AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS dc
  FROM ranked GROUP BY 1
),
t AS (SELECT SUM(dc) AS total FROM d)
SELECT CAST(d.decile AS INTEGER) AS decile,
       d.n_customers,
       CAST(d.dc AS BIGINT) AS decile_cents,
       CAST(CAST(d.dc * 1000000 AS HUGEINT) // CAST(t.total AS HUGEINT)
            AS BIGINT) AS share_ppm,
       CAST(CAST(c.cum * 1000000 AS HUGEINT) // CAST(t.total AS HUGEINT)
            AS BIGINT) AS cum_share_ppm
FROM d
JOIN (
  SELECT a.decile, SUM(b.dc) AS cum
  FROM d a JOIN d b ON b.decile <= a.decile
  GROUP BY a.decile
) c ON d.decile = c.decile
CROSS JOIN t
ORDER BY decile
""",
)
def customer_spend_lorenz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Lorenz curve behind customer_spend_gini, at decile
    resolution: per spend-decile customer count, revenue share, and
    cumulative share in exact ppm — the release-ready "bottom 50% hold
    X%, top 10% hold Y%" table. Deciles come from the exact two-level
    NTILE (with_global_rank + ntile_from_rank — identical tie handling
    to SQL NTILE, no one-task window); shares are exact integer
    division of DECIMAL(38,0) sums. The cumulative sum runs as a
    broadcast non-equi self-join of the 10-row decile relation —
    bounded by buckets², never by data. Kernel:
    :func:`..functions.stats.lorenz_buckets` (bucket-size, sum-to-total
    and monotone-cum-share invariants are unit-tested there)."""
    from .functions.stats import lorenz_buckets

    return lorenz_buckets(
        _spend(spark, sf_dir), "cents", "o_custkey", buckets=10
    ).select(
        F.col("bucket").alias("decile"),
        F.col("n_rows").alias("n_customers"),
        F.col("bucket_total").alias("decile_cents"),
        "share_ppm",
        "cum_share_ppm",
    )


@_register(
    "customer_spend_theil",
    f"""
WITH {_SPEND_CTE.strip()},
tot AS (
  SELECT CAST(COUNT(*) AS DECIMAL(38,0)) AS n,
         CAST(SUM(CAST(cents AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sx
  FROM spend WHERE cents > 0
),
contrib AS (
  SELECT CAST(cents AS DECIMAL(38,0))
         * CAST(round(CAST(ln(
             CAST(CAST(cents AS DECIMAL(38,0)) * n AS DOUBLE)
             / CAST(sx AS DOUBLE)
           ) AS DECIMAL(38,12)), 6) AS DECIMAL(38,6)) AS c
  FROM spend, tot WHERE cents > 0
)
SELECT CAST(n AS BIGINT) AS n_customers,
       CAST(round(CAST(CAST(SUM(c) AS DOUBLE) / CAST(sx AS DOUBLE)
            AS DECIMAL(30,12)), 6) AS DOUBLE) AS theil_index
FROM contrib, tot
GROUP BY n, sx
""",
)
def customer_spend_theil(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil T index of customer spend — the entropy-based inequality
    measure beside the rank-based Gini: T = (1/n)·Σ (x/μ)·ln(x/μ),
    zero at perfect equality, ln(n) at total concentration, and unlike
    Gini it DECOMPOSES additively into between-group + within-group
    terms. Computed as Σ x·ln(x·n/Σx) / Σx with x in integer cents:
    each ln argument is a ratio of exact decimals cast to double
    (identical on both engines), the per-customer contribution is
    decimal-rounded at 6 places then summed exactly (the
    doc_surprisal_score discipline), so the index is independent of
    partitioning and accumulation order. x=0 customers are excluded on
    both sides (0·ln0 = 0 by convention). One agg for totals
    (broadcast back), one contribution scan, one final scalar agg.
    Kernel: :func:`..functions.stats.theil_index` (zero-at-equality /
    scale-invariance / ln(n)-at-concentration are unit-tested there)."""
    from .functions.stats import theil_index

    return theil_index(_spend(spark, sf_dir), "cents").select(
        F.col("n").alias("n_customers"), "theil_index"
    )


@_register(
    "bigram_pmi_collocations",
    f"""
WITH toks AS (
  SELECT doc_id, u.pos, u.tok
  FROM documents,
       LATERAL (SELECT UNNEST({tx.TOKENS_SQL.format(c='text')}) AS tok,
                       generate_subscripts({tx.TOKENS_SQL.format(c='text')},
                                           1) AS pos) u
),
bi AS (
  SELECT doc_id, pos, tok AS a,
         lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS b
  FROM toks
),
bc AS (
  SELECT a, b, CAST(COUNT(*) AS DECIMAL(38,0)) AS cab
  FROM bi WHERE b IS NOT NULL GROUP BY 1, 2
),
uc AS (
  SELECT tok, CAST(COUNT(*) AS DECIMAL(38,0)) AS c FROM toks GROUP BY 1
),
tot AS (
  SELECT (SELECT CAST(SUM(c) AS DECIMAL(38,0)) FROM uc) AS t,
         (SELECT CAST(SUM(cab) AS DECIMAL(38,0)) FROM bc) AS bt
)
SELECT a AS tok_a, b AS tok_b,
       CAST(cab AS BIGINT) AS n_bigram,
       CAST(round(CAST(ln(
         CAST(cab * t * t AS DOUBLE)
         / CAST(bt * ca.c * cb.c AS DOUBLE)
       ) AS DECIMAL(38,12)), 6) AS DOUBLE) AS pmi
FROM bc
JOIN uc ca ON bc.a = ca.tok
JOIN uc cb ON bc.b = cb.tok
CROSS JOIN tot
WHERE cab >= 5
ORDER BY pmi DESC, tok_a, tok_b
LIMIT 20
""",
)
def bigram_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 collocations: adjacent token pairs ranked by pointwise
    mutual information ln(p(ab)/(p(a)p(b))) — the classic corpus
    statistic behind multi-word-expression mining and tokenizer-merge
    candidates (what BPE merges first IS the highest-count collocation
    family). Bigrams come from a lead() window over position-exploded
    tokens (the DEVNOTES shingle pattern — no self-join on position);
    counts are exact decimals; the PMI argument is a ratio of two
    exact decimal products cast to double (bit-identical both engines
    — no float accumulation), rounded through the decimal hop so the
    ORDER BY key is tie-stable, with (tok_a, tok_b) breaking residual
    ties. min-count >= 5 suppresses noise collocations. Plan: explode
    -> window -> three hash aggs + two vocab joins (AQE broadcasts the
    bounded vocab side) + TakeOrdered top-k; linear in corpus tokens.
    Kernel: :func:`..operators.text.bigram_pmi` (hand-computed PMI on
    a known corpus is unit-tested there)."""
    return tx.bigram_pmi(
        fx._read(spark, sf_dir, "documents"), min_count=5, top_k=20
    )


@_register(
    "user_weekly_streaks",
    f"""
WITH {fx.EVENTS_STREAM_CTE.strip()},
wk AS (
  SELECT DISTINCT user_id,
         CAST(datediff('day', DATE '1995-01-02',
                       CAST(date_trunc('week', ts) AS DATE)) AS BIGINT)
           // 7 AS widx
  FROM events_norm
),
g AS (
  SELECT user_id, widx,
         widx - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY widx) AS grp
  FROM wk
),
runs AS (
  SELECT user_id, grp, CAST(COUNT(*) AS BIGINT) AS len
  FROM g GROUP BY 1, 2
),
mx AS (
  SELECT user_id, MAX(len) AS max_streak FROM runs GROUP BY 1
)
SELECT CAST(max_streak AS BIGINT) AS max_streak_weeks,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM mx GROUP BY 1
""",
)
def user_weekly_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engagement-streak histogram: users by their LONGEST run of
    consecutive active weeks — the gaps-and-islands pattern (value
    minus row_number is constant exactly along a consecutive run) on a
    LINEAR week index. The index is days-since-a-fixed-Monday div 7
    over date_trunc('week') rather than isoyear*100+weekofyear:
    week-number keys are non-contiguous at year boundaries (52/53-week
    years), which would split every streak that crosses New Year.
    All-integer, one distinct + one per-user window + two hash aggs —
    every stage partitions by user. Kernel:
    :func:`..operators.behavior.weekly_streak_histogram` (the
    year-boundary contiguity claim is unit-tested there on synthetic
    dates)."""
    ev = fx.events_stream(spark, sf_dir)
    return bh.weekly_streak_histogram(
        ev.select("user_id", F.to_date("ts").alias("day"))
    )


@_register(
    "customer_order_cadence",
    """
WITH o AS (
  SELECT o_custkey, CAST(o_orderdate AS DATE) AS d, o_orderkey
  FROM orders
),
gaps AS (
  SELECT o_custkey,
         datediff('day', prev_d, d) AS gap
  FROM (
    SELECT o_custkey, d,
           lag(d) OVER (PARTITION BY o_custkey ORDER BY d, o_orderkey)
             AS prev_d
    FROM o
  ) x WHERE prev_d IS NOT NULL
),
r AS (
  SELECT o_custkey, gap,
         ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY gap) AS rn,
         CAST(COUNT(*) OVER (PARTITION BY o_custkey) AS BIGINT) AS n
  FROM gaps
)
SELECT o_custkey,
       CAST(n AS BIGINT) AS n_gaps,
       CAST(MAX(CASE WHEN rn = (n + 1) // 2 THEN gap END) AS BIGINT)
         AS median_gap_days,
       CAST(MIN(gap) AS BIGINT) AS min_gap_days,
       CAST(MAX(gap) AS BIGINT) AS max_gap_days
FROM r
WHERE n >= 2
GROUP BY o_custkey, n
""",
)
def customer_order_cadence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeat-purchase cadence per customer: lower-median, min and max
    days between CONSECUTIVE orders (>= 3 orders, i.e. >= 2 gaps) —
    the replenishment-cycle number behind reorder reminders and churn
    cutoffs (a customer at 3x their median gap is lapsing). Gaps from
    a lag() window ordered by (date, orderkey) — same-day orders give
    deterministic zero gaps; the median is rank-pinned at ceil(n/2)
    (the repo's lower-median convention — equal gap values make the
    pick order-insensitive). Integer days end-to-end; both window
    passes partition by customer, one shuffle. Kernel:
    :func:`..operators.behavior.consecutive_gap_stats` (lower-median
    pick and same-day zero gaps are unit-tested there)."""
    o = fx._read(spark, sf_dir, "orders").select(
        "o_custkey",
        F.col("o_orderdate").cast("date").alias("d"),
        "o_orderkey",
    )
    return bh.consecutive_gap_stats(o, "o_custkey", "d", "o_orderkey")


# ---------------------------------------------------------------------------
# Market concentration (HHI), price indices (Laspeyres/Paasche/Fisher),
# ABC/XYZ inventory classification, Kaplan-Meier survival — four
# econometric/supply-chain families over the same exact-decimal
# discipline (round-5 continuation batch 3).
# ---------------------------------------------------------------------------


@_register(
    "supplier_revenue_hhi",
    """
WITH rev AS (
  SELECT r_name, s_suppkey,
         CAST(round(SUM(CAST(l_extendedprice * (1 - l_discount)
                             AS DECIMAL(30,6))), 2) * 100 AS BIGINT) AS cents
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  GROUP BY 1, 2
)
SELECT r_name,
       CAST(COUNT(*) AS BIGINT) AS n_suppliers,
       CAST(SUM(CAST(cents AS DECIMAL(38,0))) AS BIGINT) AS total_cents,
       CAST(CAST(SUM(CAST(cents AS DECIMAL(38,0)) * CAST(cents AS DECIMAL(38,0)))
                 * 1000000 AS HUGEINT)
            // NULLIF(CAST(SUM(CAST(cents AS DECIMAL(38,0))) AS HUGEINT)
                      * CAST(SUM(CAST(cents AS DECIMAL(38,0))) AS HUGEINT), 0)
            AS BIGINT) AS hhi_ppm
FROM rev GROUP BY 1 ORDER BY 1
""",
)
def supplier_revenue_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl–Hirschman concentration of supplier revenue per
    region — the antitrust-style market-structure scalar (10_000 ppm =
    perfectly fragmented at 100 suppliers, 1_000_000 = monopoly).
    HHI = Σ sᵢ² over supplier shares, computed division-free as
    Σxᵢ²·1e6 div (Σx)² with net-revenue cents in DECIMAL(38,0) — both
    sums ride ONE hash aggregation per region, so there is no per-
    supplier share division and no float accumulation anywhere. Scale:
    lineitem⋈supplier shuffles on suppkey (well-distributed);
    nation/region are broadcast; the region-level agg is 5 rows. The
    kernel invariants (monopoly → 1e6, n equal shares → 1e6 div n) are
    unit-tested in tests/test_engagement_inequality_unit.py."""
    li = fx._read(spark, sf_dir, "lineitem")
    su = fx._read(spark, sf_dir, "supplier")
    na = fx._read(spark, sf_dir, "nation")
    re_ = fx._read(spark, sf_dir, "region")
    rev = (
        li.join(su, li.l_suppkey == su.s_suppkey)
        .join(F.broadcast(na), su.s_nationkey == na.n_nationkey)
        .join(F.broadcast(re_), na.n_regionkey == re_.r_regionkey)
        .groupBy("r_name", "s_suppkey")
        .agg(
            (
                F.round(
                    F.sum(
                        (
                            F.col("l_extendedprice")
                            * (1 - F.col("l_discount"))
                        ).cast("decimal(30,6)")
                    ),
                    2,
                )
                * 100
            )
            .cast("bigint")
            .alias("cents")
        )
    )
    from .functions.stats import hhi_ppm

    return (
        hhi_ppm(rev, ["r_name"], "cents")
        .select(
            "r_name",
            F.col("n_units").alias("n_suppliers"),
            F.col("total").alias("total_cents"),
            "hhi_ppm",
        )
        .orderBy("r_name")
    )


@_register(
    "part_price_index",
    """
WITH per AS (
  SELECT l_partkey,
         CAST(round(SUM(CASE WHEN year(CAST(l_shipdate AS DATE)) = 1996
                        THEN CAST(l_extendedprice AS DECIMAL(30,6)) END), 2)
              * 100 AS BIGINT) AS e0,
         CAST(round(SUM(CASE WHEN year(CAST(l_shipdate AS DATE)) = 1997
                        THEN CAST(l_extendedprice AS DECIMAL(30,6)) END), 2)
              * 100 AS BIGINT) AS e1,
         CAST(SUM(CASE WHEN year(CAST(l_shipdate AS DATE)) = 1996
                  THEN CAST(l_quantity AS DECIMAL(30,6)) END) AS BIGINT) AS q0,
         CAST(SUM(CASE WHEN year(CAST(l_shipdate AS DATE)) = 1997
                  THEN CAST(l_quantity AS DECIMAL(30,6)) END) AS BIGINT) AS q1
  FROM lineitem GROUP BY 1
),
kept AS (
  SELECT CAST(e0 AS HUGEINT) e0, CAST(e1 AS HUGEINT) e1,
         CAST(q0 AS HUGEINT) q0, CAST(q1 AS HUGEINT) q1
  FROM per
  WHERE q0 IS NOT NULL AND q1 IS NOT NULL AND q0 > 0 AND q1 > 0
),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_parts,
         SUM(e0) AS se0, SUM(e1) AS se1,
         SUM((e1 * q0) // q1) AS sl,
         SUM((e0 * q1) // q0) AS sp
  FROM kept
)
SELECT n_parts,
       CAST((sl * 1000000) // se0 AS BIGINT) AS laspeyres_ppm,
       CAST((se1 * 1000000) // sp AS BIGINT) AS paasche_ppm,
       CAST(round(CAST(sqrt(CAST(CAST((sl * 1000000) // se0 AS BIGINT)
                                 AS DOUBLE)
                            * CAST(CAST((se1 * 1000000) // sp AS BIGINT)
                                   AS DOUBLE)) / 1000000.0
                       AS DECIMAL(30,12)), 6) AS DOUBLE) AS fisher_index
FROM s
""",
)
def part_price_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shelf-price inflation 1996→1997 as the three classic index
    numbers: Laspeyres (base-year basket at current prices), Paasche
    (current basket at base prices), and their geometric mean (Fisher's
    ideal index). Per part, yearly quantity and extended-price sums are
    exact integers; the unit-price ratio never materializes — each
    part's "basket at other-period prices" term is the exact floored
    integer division (e₁·q₀) div q₁ (Spark decimal ``div`` ==
    DuckDB HUGEINT ``//``, the customer_spend_gini discipline), so both
    indices are ratios of exact BIGINT sums in ppm. Fisher is the only
    double op: sqrt of a product of the two exact ppms, rounded through
    the scale-6 decimal hop. Parts traded in only one of the two years
    drop out (an index needs both a base and a current observation).
    Scale: one conditional-aggregate pass over lineitem partitioned by
    partkey, then a one-row reduction — no joins at all."""
    li = fx._read(spark, sf_dir, "lineitem")
    yr = F.year(F.to_date("l_shipdate"))
    per = (
        li.groupBy("l_partkey")
        .agg(
            (
                F.round(
                    F.sum(
                        F.when(
                            yr == 1996,
                            F.col("l_extendedprice").cast("decimal(30,6)"),
                        )
                    ),
                    2,
                )
                * 100
            )
            .cast("bigint")
            .alias("e0"),
            (
                F.round(
                    F.sum(
                        F.when(
                            yr == 1997,
                            F.col("l_extendedprice").cast("decimal(30,6)"),
                        )
                    ),
                    2,
                )
                * 100
            )
            .cast("bigint")
            .alias("e1"),
            F.sum(
                F.when(yr == 1996, F.col("l_quantity").cast("decimal(30,6)"))
            )
            .cast("bigint")
            .alias("q0"),
            F.sum(
                F.when(yr == 1997, F.col("l_quantity").cast("decimal(30,6)"))
            )
            .cast("bigint")
            .alias("q1"),
        )
        .where(
            F.col("q0").isNotNull()
            & F.col("q1").isNotNull()
            & (F.col("q0") > 0)
            & (F.col("q1") > 0)
        )
        .select(
            F.col("e0").cast("decimal(38,0)").alias("e0"),
            F.col("e1").cast("decimal(38,0)").alias("e1"),
            F.col("q0").cast("decimal(38,0)").alias("q0"),
            F.col("q1").cast("decimal(38,0)").alias("q1"),
        )
    )
    from .functions.stats import round6

    return (
        per.select(
            "e0",
            "e1",
            F.expr("(e1 * q0) div q1").cast("decimal(38,0)").alias("cl"),
            F.expr("(e0 * q1) div q0").cast("decimal(38,0)").alias("cp"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_parts"),
            F.sum("e0").alias("se0"),
            F.sum("e1").alias("se1"),
            F.sum("cl").alias("sl"),
            F.sum("cp").alias("sp"),
        )
        .select(
            "n_parts",
            F.expr("CAST((sl * 1000000) div se0 AS BIGINT)").alias(
                "laspeyres_ppm"
            ),
            F.expr("CAST((se1 * 1000000) div sp AS BIGINT)").alias(
                "paasche_ppm"
            ),
        )
        .select(
            "n_parts",
            "laspeyres_ppm",
            "paasche_ppm",
            round6(
                F.sqrt(
                    F.col("laspeyres_ppm").cast("double")
                    * F.col("paasche_ppm").cast("double")
                )
                / F.lit(1000000.0)
            ).alias("fisher_index"),
        )
    )


@_register(
    "part_demand_abc_xyz",
    """
WITH d AS (
  SELECT l_partkey,
         CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6)) AS net,
         CAST(l_quantity AS DECIMAL(30,6)) AS qty,
         CAST(datediff('day', DATE '1995-01-02',
                       CAST(date_trunc('week', CAST(l_shipdate AS DATE))
                            AS DATE)) AS BIGINT) // 7 AS widx
  FROM lineitem
),
revp AS (
  SELECT l_partkey,
         CAST(CAST(round(SUM(net), 2) * 100 AS BIGINT) AS DECIMAL(38,0))
           AS rc
  FROM d GROUP BY 1
),
run AS (
  SELECT l_partkey, rc,
         SUM(rc) OVER (ORDER BY rc DESC, l_partkey
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum,
         SUM(rc) OVER () AS total
  FROM revp
),
abc AS (
  SELECT l_partkey, rc,
         CASE WHEN cum * 5 <= total * 4 THEN 'A'
              WHEN cum * 20 <= total * 19 THEN 'B'
              ELSE 'C' END AS abc_class
  FROM run
),
weekly AS (
  SELECT l_partkey, widx, CAST(SUM(qty) AS BIGINT) AS wq
  FROM d GROUP BY 1, 2
),
span AS (
  SELECT CAST(MAX(widx) - MIN(widx) + 1 AS HUGEINT) AS nw FROM d
),
xyz AS (
  SELECT l_partkey,
         CASE WHEN cv <= 0.5 THEN 'X' WHEN cv <= 1.0 THEN 'Y'
              ELSE 'Z' END AS xyz_class
  FROM (
    SELECT l_partkey,
           CAST(round(CAST(sqrt(CAST(nw * sq2 - sq1 * sq1 AS DOUBLE))
                           / CAST(sq1 AS DOUBLE) AS DECIMAL(30,12)), 6)
                AS DOUBLE) AS cv
    FROM (
      SELECT l_partkey,
             CAST(SUM(CAST(wq AS HUGEINT)) AS HUGEINT) AS sq1,
             CAST(SUM(CAST(wq AS HUGEINT) * CAST(wq AS HUGEINT))
                  AS HUGEINT) AS sq2
      FROM weekly GROUP BY 1
    ) m, span
    WHERE m.sq1 > 0
  ) c
)
SELECT abc_class, xyz_class,
       CAST(COUNT(*) AS BIGINT) AS n_parts,
       CAST(SUM(rc) AS BIGINT) AS class_rev_cents
FROM abc JOIN xyz USING (l_partkey)
GROUP BY 1, 2 ORDER BY 1, 2
""",
)
def part_demand_abc_xyz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The supply-chain planner's 3×3: ABC revenue classes (A = parts
    inside the top 80% of cumulative net revenue, B to 95%, C the
    tail) crossed with XYZ demand-variability classes (coefficient of
    variation of WEEKLY demand: X ≤ 0.5 steady, Y ≤ 1.0, Z erratic) —
    the matrix that decides which parts get safety stock vs
    make-to-order. ABC cumulative shares ride the exact two-level
    DECIMAL prefix sum over (revenue DESC, partkey) with the
    division-free multiply-form thresholds (the pareto_customers
    discipline); XYZ uses the moment-sum CV over the LINEAR week index
    (weeks with zero demand are implicit zeros in Σq/Σq² — the global
    week span supplies n, so no calendar densification scan), sqrt of
    an exact integer in double, decimal-rounded before the class
    compare. Scale: ONE shuffled pass over lineitem — everything (part
    revenue, weekly demand, the global week span) derives from a single
    (part, week) aggregation whose unrounded decimal partials re-sum
    exactly to the per-part totals; after it only |parts|-bounded
    reductions, the running sum and a broadcast 1-row span remain — no
    data-sized join or window, no second fact scan."""
    from .functions.stats import round6
    from .functions.ordered import with_running_sum

    li = fx._read(spark, sf_dir, "lineitem")
    d = li.select(
        "l_partkey",
        (F.col("l_extendedprice") * (1 - F.col("l_discount")))
        .cast("decimal(30,6)")
        .alias("net"),
        F.col("l_quantity").cast("decimal(30,6)").alias("qty"),
        # shared week-index fragment (operators/behavior.py) — the SAME
        # epoch/truncation rule as user_weekly_streaks
        F.expr(bh.linear_week_index_sql("to_date(l_shipdate)")).alias(
            "widx"
        ),
    )
    # the ONE data-sized aggregation: weekly grain carries UNROUNDED
    # exact decimal revenue partials, so the per-part rounding below
    # equals rounding the direct per-part sum. Persisted: three
    # consumers (revenue ranks, CV moments, week span) read the bounded
    # |parts x weeks| relation instead of re-scanning the fact table
    # (the shared-shingle-relation contract; bench/tests clearCache
    # between queries)
    base = (
        d.groupBy("l_partkey", "widx")
        .agg(
            F.sum("net").alias("wnet"),
            F.sum("qty").cast("bigint").alias("wq"),
        )
        .persist()
    )
    revp = base.groupBy("l_partkey").agg(
        (F.round(F.sum("wnet"), 2) * 100)
        .cast("bigint")
        .cast("decimal(38,0)")
        .alias("rc")
    )
    run, total = with_running_sum(
        revp, [F.desc("rc"), F.asc("l_partkey")], "rc", running_col="cum"
    )
    abc = run.select(
        "l_partkey",
        "rc",
        F.when(
            F.col("cum") * 5 <= F.lit(total).cast("decimal(38,0)") * 4, "A"
        )
        .when(
            F.col("cum") * 20 <= F.lit(total).cast("decimal(38,0)") * 19,
            "B",
        )
        .otherwise("C")
        .alias("abc_class"),
    )
    # span from the SAME (part, week) aggregate — the exchange is
    # reused, not a third scan of the fact table
    span = base.agg(
        (F.max("widx") - F.min("widx") + 1)
        .cast("decimal(38,0)")
        .alias("nw")
    )
    wv = F.col("wq").cast("decimal(38,0)")
    xyz = (
        base.groupBy("l_partkey")
        .agg(F.sum(wv).alias("sq"), F.sum(wv * wv).alias("sqq"))
        # CV is undefined at zero total demand (0/0 -> NaN, which the
        # decimal hop cannot carry); such parts can't exist in TPC-H
        # (qty >= 1) but a degenerate input must not crash the cast
        .where(F.col("sq") > 0)
        .crossJoin(F.broadcast(span))
        .select(
            "l_partkey",
            round6(
                F.sqrt(F.expr("CAST(nw * sqq - sq * sq AS DOUBLE)"))
                / F.col("sq").cast("double")
            ).alias("cv"),
        )
        .select(
            "l_partkey",
            F.when(F.col("cv") <= 0.5, "X")
            .when(F.col("cv") <= 1.0, "Y")
            .otherwise("Z")
            .alias("xyz_class"),
        )
    )
    return (
        abc.join(xyz, "l_partkey")
        .groupBy("abc_class", "xyz_class")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_parts"),
            F.sum("rc").cast("bigint").alias("class_rev_cents"),
        )
        .orderBy("abc_class", "xyz_class")
    )


@_register(
    "customer_second_order_km",
    """
WITH ranked AS (
  SELECT o_custkey, CAST(o_orderdate AS DATE) AS dd,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY CAST(o_orderdate AS DATE), o_orderkey)
           AS rn
  FROM orders
),
subj AS (
  SELECT o_custkey,
         MIN(CASE WHEN rn = 1 THEN dd END) AS d1,
         MIN(CASE WHEN rn = 2 THEN dd END) AS d2
  FROM ranked GROUP BY 1
),
mx AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS md FROM orders),
life AS (
  SELECT CASE WHEN d2 IS NOT NULL THEN datediff('day', d1, d2)
              ELSE datediff('day', d1, md) END AS t,
         CASE WHEN d2 IS NOT NULL THEN 1 ELSE 0 END AS ev
  FROM subj, mx
),
per_t AS (
  SELECT t, CAST(SUM(ev) AS DECIMAL(38,0)) AS d,
         CAST(COUNT(*) AS DECIMAL(38,0)) AS c
  FROM life GROUP BY 1
),
risk AS (
  SELECT t, d, c,
         SUM(c) OVER (ORDER BY t DESC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS n
  FROM per_t
),
ev AS (
  SELECT t, d, n,
         CASE WHEN n > d THEN
           CAST(round(CAST(ln(CAST(n - d AS DOUBLE) / CAST(n AS DOUBLE))
                           AS DECIMAL(38,12)), 6) AS DECIMAL(38,6))
         ELSE CAST(0 AS DECIMAL(38,6)) END AS lf
  FROM risk WHERE d > 0
),
curve AS (
  SELECT t, d, n,
         SUM(lf) OVER (ORDER BY t
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum
  FROM ev
)
SELECT CAST(t AS BIGINT) AS t_days,
       CAST(n AS BIGINT) AS n_at_risk,
       CAST(d AS BIGINT) AS n_events,
       CASE WHEN n = d THEN 0.0
            ELSE CAST(round(CAST(exp(CAST(cum AS DOUBLE))
                                 AS DECIMAL(30,12)), 6) AS DOUBLE)
       END AS survival
FROM curve ORDER BY t_days
""",
)
def customer_second_order_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan–Meier survival curve of time-to-second-order: per event
    time (days after the first order), the at-risk count, events, and
    the product-limit survival probability — the censoring-correct
    repeat-purchase curve behind "X% of new customers reorder within N
    days" (customers who never reorder are right-censored at the
    dataset's last order date, which a naive gap ecdf would silently
    drop or miscount). Subjects come from one per-customer window
    (first/second order date); the curve is
    :func:`..functions.stats.kaplan_meier` — exact DECIMAL suffix sum
    for the risk set, decimal-rounded ln terms, cumulative exact sum,
    exp at the end (censoring semantics and the terminal S=0 case are
    unit-tested on synthetic lifetimes in
    tests/test_engagement_inequality_unit.py). Scale: the only
    data-sized stages are the per-customer window and one groupBy on
    duration; everything after is bounded by distinct durations."""
    from .functions.stats import kaplan_meier

    o = fx._read(spark, sf_dir, "orders").select(
        "o_custkey",
        F.to_date("o_orderdate").alias("dd"),
        "o_orderkey",
    )
    w = Window.partitionBy("o_custkey").orderBy("dd", "o_orderkey")
    ranked = o.select(
        "o_custkey", "dd", F.row_number().over(w).alias("rn")
    )
    subj = ranked.groupBy("o_custkey").agg(
        F.min(F.when(F.col("rn") == 1, F.col("dd"))).alias("d1"),
        F.min(F.when(F.col("rn") == 2, F.col("dd"))).alias("d2"),
    )
    mx = o.agg(F.max("dd").alias("md"))
    life = subj.crossJoin(F.broadcast(mx)).select(
        F.when(
            F.col("d2").isNotNull(), F.datediff(F.col("d2"), F.col("d1"))
        )
        .otherwise(F.datediff(F.col("md"), F.col("d1")))
        .cast("bigint")
        .alias("t"),
        F.when(F.col("d2").isNotNull(), F.lit(1))
        .otherwise(F.lit(0))
        .alias("ev"),
    )
    return kaplan_meier(life)


# ---------------------------------------------------------------------------
# Round-6 corpus-pipeline additions: quality-based downsampling, per-source
# token budgeting, near-dup canonical selection, LSH decontamination — the
# four selection/cleaning steps between "score the corpus" (quality_score,
# neardup_components, eval_contamination, all registered earlier) and
# "train on it".
# ---------------------------------------------------------------------------

_DOCS_QUALITY_TOKENS_CTE = f"""
q AS ({{quality}}),
d AS (
  SELECT documents.doc_id, source,
         CAST(len({tx.TOKENS_SQL.format(c='text')}) AS BIGINT) AS n_tokens,
         quality_score
  FROM documents JOIN q ON documents.doc_id = q.doc_id
)"""


@_register(
    "documents_quality_downsample",
    f"""
WITH {_DOCS_QUALITY_TOKENS_CTE.format(quality=tx.QUALITY_SCORE_SQL.strip()).strip()},
ranked AS (
  SELECT *,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY quality_score DESC, doc_id) AS rn
  FROM d
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_kept,
       CAST(SUM(n_tokens) AS BIGINT) AS tokens_kept,
       MIN(quality_score) AS min_kept_quality
FROM ranked
WHERE rn <= 20
GROUP BY 1
ORDER BY source
""",
)
def documents_quality_downsample(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Quality-based downsampling: keep the top-20 documents PER SOURCE
    by quality_score (doc_id tie-break — the score is rounded at 4
    decimals on both engines, so ties are real), reporting per-source
    kept counts/tokens/threshold. The standard curation step between
    scoring and training: a fixed per-source keep depth instead of a
    global score cutoff, so no source is silently wiped out by another
    source's score distribution. Plan: one scan computes tokens +
    quality (pure projections), ONE window partitioned by source (real
    key), and Spark executes the rn <= 20 filter as WindowGroupLimit —
    per-task state is 20 rows per source, not the source's documents.
    Scale: output bounded by |sources|."""
    docs = fx._read(spark, sf_dir, "documents")
    q = tx.quality_score(docs).select("doc_id", "quality_score")
    d = docs.select(
        "doc_id", "source", tx.token_count(F.col("text")).alias("n_tokens")
    ).join(q, "doc_id")
    w = Window.partitionBy("source").orderBy(
        F.desc("quality_score"), F.asc("doc_id")
    )
    return (
        d.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 20)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("n_tokens").alias("tokens_kept"),
            F.min("quality_score").alias("min_kept_quality"),
        )
        .orderBy("source")
    )


@_register(
    "source_token_budget_cut",
    f"""
WITH {_DOCS_QUALITY_TOKENS_CTE.format(quality=tx.QUALITY_SCORE_SQL.strip()).strip()},
ranked AS (
  SELECT *,
         SUM(n_tokens) OVER (PARTITION BY source
                             ORDER BY quality_score DESC, doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND CURRENT ROW) AS cum
  FROM d
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_kept,
       CAST(SUM(n_tokens) AS BIGINT) AS tokens_kept
FROM ranked
WHERE cum <= 10000
GROUP BY 1
ORDER BY source
""",
)
def source_token_budget_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget curation: per source, take documents in quality
    order until a 10k-token budget is spent (greedy prefix on the exact
    integer running token sum — a source whose best document alone
    exceeds the budget contributes no rows, deterministically on both
    engines). The data-mix primitive behind "N tokens per source"
    training recipes; the per-source budget would be the source-mix
    weight at production scale. Plan: same single scan + source
    window as documents_quality_downsample with a running SUM instead
    of row_number; exact integer cumsum, no float drift in the cut.
    Scale: output bounded by |sources|."""
    docs = fx._read(spark, sf_dir, "documents")
    q = tx.quality_score(docs).select("doc_id", "quality_score")
    d = docs.select(
        "doc_id", "source", tx.token_count(F.col("text")).alias("n_tokens")
    ).join(q, "doc_id")
    w = (
        Window.partitionBy("source")
        .orderBy(F.desc("quality_score"), F.asc("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        d.withColumn("cum", F.sum("n_tokens").over(w))
        .where(F.col("cum") <= 10000)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("n_tokens").alias("tokens_kept"),
        )
        .orderBy("source")
    )


@_register(
    "source_temperature_mix_budget",
    f"""
WITH {_DOCS_QUALITY_TOKENS_CTE.format(quality=tx.QUALITY_SCORE_SQL.strip()).strip()},
tot AS (
  SELECT source, CAST(SUM(n_tokens) AS BIGINT) AS src_tokens
  FROM d GROUP BY 1
),
s AS (
  SELECT source, src_tokens,
         CAST(FLOOR(SQRT(CAST(src_tokens AS DOUBLE))) AS BIGINT) AS sq
  FROM tot
),
g AS (SELECT CAST(SUM(sq) AS BIGINT) AS stot FROM s),
budgets AS (
  SELECT source, src_tokens,
         CAST((60000 * CAST(sq AS HUGEINT)) // NULLIF(stot, 0) AS BIGINT)
           AS budget_tokens
  FROM s, g
),
ranked AS (
  SELECT d.*,
         SUM(n_tokens) OVER (PARTITION BY source
                             ORDER BY quality_score DESC, doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND CURRENT ROW) AS cum
  FROM d
)
SELECT ranked.source,
       budgets.budget_tokens,
       CAST(COUNT(*) AS BIGINT) AS n_kept,
       CAST(SUM(n_tokens) AS BIGINT) AS tokens_kept
FROM ranked
JOIN budgets ON ranked.source = budgets.source
WHERE cum <= budget_tokens
GROUP BY 1, 2
ORDER BY ranked.source
""",
)
def source_temperature_mix_budget(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Temperature-flattened data mix (the multilingual-training
    standard, target share ∝ share^0.5): each source's token budget is
    60k x sqrt(its tokens) / Σ sqrt(tokens) — big sources are damped,
    small sources boosted, nobody wiped out — then the greedy
    quality-ordered prefix cut per source (source_token_budget_cut's
    machinery under a derived budget). Engine-stable without being
    integer-only: sqrt over a BIGINT-exact double is IEEE
    correctly-rounded (bit-identical on both engines), FLOOR pins it to
    an integer, and everything after is exact HUGEINT/DECIMAL
    arithmetic — the one transcendental gets the KM/Greenwood
    hop-immediately treatment. Plan: the per-doc relation feeds both
    the per-source totals (one bounded agg -> 1-row broadcast) and the
    source-partitioned running-sum window; budgets broadcast back.
    Scale: output bounded by |sources|; one data-sized shuffle."""
    docs = fx._read(spark, sf_dir, "documents")
    q = tx.quality_score(docs).select("doc_id", "quality_score")
    d = docs.select(
        "doc_id", "source", tx.token_count(F.col("text")).alias("n_tokens")
    ).join(q, "doc_id")
    tot = d.groupBy("source").agg(
        F.sum("n_tokens").cast("bigint").alias("src_tokens")
    )
    s = tot.select(
        "source",
        "src_tokens",
        F.floor(F.sqrt(F.col("src_tokens").cast("double")))
        .cast("bigint")
        .alias("sq"),
    )
    g = s.agg(F.sum("sq").cast("bigint").alias("stot"))
    budgets = s.join(F.broadcast(g)).select(
        "source",
        F.expr(
            "CAST((60000 * cast(sq as decimal(38,0)))"
            " div NULLIF(stot, 0) AS BIGINT)"
        ).alias("budget_tokens"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy(F.desc("quality_score"), F.asc("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        d.withColumn("cum", F.sum("n_tokens").over(w))
        .join(F.broadcast(budgets), "source")
        .where(F.col("cum") <= F.col("budget_tokens"))
        .groupBy("source", "budget_tokens")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("n_tokens").cast("bigint").alias("tokens_kept"),
        )
        .orderBy("source")
    )


@_register(
    "neardup_canonical_keep",
    dd.neardup_canonical_keep_sql(tx.QUALITY_SCORE_SQL),
)
def neardup_canonical_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which document each near-dup cluster KEEPS: the highest-quality
    member (operators/dedup.neardup_canonical_keep — dedup pipelines
    keep the best representative, not an arbitrary one). Completes the
    registered dedup chain: pairs (minhash_neardup) -> clusters
    (neardup_components) -> keep/drop decision (this)."""
    return dd.neardup_canonical_keep(fx._read(spark, sf_dir, "documents"))


@_register("eval_contamination_lsh", cp.EVAL_CONTAMINATION_LSH_SQL)
def eval_contamination_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate decontamination: train docs sharing an LSH band
    bucket with any held-out eval doc (operators/corpus.
    eval_contamination_lsh) — catches paraphrased eval leakage the
    exact-shingle eval_contamination misses."""
    return cp.eval_contamination_lsh(fx._read(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# TPC-H Q11/Q16/Q20 over the synthesized partsupp (sources/synthetic.py:
# partsupp_synthetic — the public dbgen supplier-assignment formula plus
# the repo's multiplicative-hash value columns; money in integer CENTS).
# These were the last "remaining gaps" in the TPC-H family (DEVNOTES) —
# excluded until round 6 only for lack of a partsupp fixture. Both engines
# derive the SAME relation from part x supplier (row-for-row identical,
# verified in test_operators_unit; at sf0.001's 10 suppliers the dbgen
# step can repeat a (part, supplier) pair — identically on both engines,
# so every aggregate stays comparable), so the oracle checks the query
# logic, not the generator.
# ---------------------------------------------------------------------------

from .sources.synthetic import PARTSUPP_CTE_SQL, partsupp_synthetic  # noqa: E402


def _partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    return partsupp_synthetic(
        fx._read(spark, sf_dir, "part"), fx._read(spark, sf_dir, "supplier")
    )


@_register(
    "tpch_q11_important_stock",
    f"""
WITH {PARTSUPP_CTE_SQL},
nat AS (
  SELECT ps_partkey,
         CAST(ps_supplycost_cents * ps_availqty AS HUGEINT) AS v
  FROM partsupp
  JOIN supplier ON ps_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_9'
),
pv AS (
  SELECT ps_partkey, CAST(SUM(v) AS BIGINT) AS value_cents
  FROM nat GROUP BY 1
),
tot AS (SELECT CAST(SUM(v) // 1000 AS BIGINT) AS thr FROM nat)
SELECT ps_partkey, value_cents
FROM pv, tot
WHERE value_cents > thr
ORDER BY value_cents DESC, ps_partkey
""",
)
def tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 (important stock identification) on the synthesized
    partsupp: per-part inventory value (supplycost_cents * availqty)
    held by suppliers of one nation, keeping parts above 0.1% of the
    nation's total value. The threshold is EXACT integer division of
    the total (div 1000) — no float fraction, so the cut is
    engine-stable at any scale. Plan: partsupp is a projection of
    part x {{0..3}} (no shuffle to build), supplier/nation broadcast,
    ONE hash aggregation by part, and the 1-row total broadcast back —
    the per-part and total sums both combine map-side. Scale: output
    bounded by |parts|; the only data-sized shuffle is the part-key
    aggregation."""
    ps = _partsupp(spark, sf_dir)
    su = fx._read(spark, sf_dir, "supplier")
    na = fx._read(spark, sf_dir, "nation")
    nat = (
        ps.join(
            F.broadcast(
                su.join(na, su.s_nationkey == na.n_nationkey)
                .where(F.col("n_name") == "NATION_9")
                .select("s_suppkey")
            ),
            ps.ps_suppkey == F.col("s_suppkey"),
        )
        .select(
            "ps_partkey",
            (
                F.col("ps_supplycost_cents").cast("decimal(38,0)")
                * F.col("ps_availqty")
            ).alias("v"),
        )
    )
    pv = nat.groupBy("ps_partkey").agg(
        F.sum("v").cast("bigint").alias("value_cents")
    )
    tot = nat.agg(F.expr("sum(v) div 1000").cast("bigint").alias("thr"))
    return (
        pv.join(F.broadcast(tot))
        .where(F.col("value_cents") > F.col("thr"))
        .select("ps_partkey", "value_cents")
        .orderBy(F.desc("value_cents"), F.asc("ps_partkey"))
    )


@_register(
    "tpch_q16_supplier_part_counts",
    f"""
WITH {PARTSUPP_CTE_SQL}
SELECT p_brand, p_type, p_size,
       COUNT(DISTINCT ps_suppkey) AS supplier_cnt
FROM partsupp
JOIN part ON ps_partkey = p_partkey
WHERE p_brand <> 'Brand#1'
  AND p_type <> 'PROMO'
  AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
  AND ps_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
  )
GROUP BY 1, 2, 3
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
""",
)
def tpch_q16_supplier_part_counts(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q16 (parts/supplier relationship) on the synthesized
    partsupp: distinct supplier count per (brand, type, size) for parts
    outside one brand/type and eight sizes, excluding suppliers in bad
    standing. Fixture adaptation: the spec's complaint-comment exclusion
    becomes s_acctbal < 0 (the fixture has no comment columns — same
    adaptation rule as the other TPC-H queries, DEVNOTES r1). Plan:
    the exclusion list is a broadcast anti-join (bounded by |suppliers|);
    the distinct-count aggregation is the only data-sized shuffle and
    Spark's two-phase distinct rewrite keeps it partial-aggregated.
    Scale: output bounded by brand x type x size."""
    ps = _partsupp(spark, sf_dir)
    pt = fx._read(spark, sf_dir, "part")
    su = fx._read(spark, sf_dir, "supplier")
    bad = su.where(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        ps.join(
            pt.where(
                (F.col("p_brand") != "Brand#1")
                & (F.col("p_type") != "PROMO")
                & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)
            ).select("p_partkey", "p_brand", "p_type", "p_size"),
            ps.ps_partkey == F.col("p_partkey"),
        )
        .join(
            F.broadcast(bad),
            ps.ps_suppkey == bad.s_suppkey,
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.desc("supplier_cnt"), "p_brand", "p_type", "p_size"
        )
    )


@_register(
    "tpch_q20_excess_stock_suppliers",
    f"""
WITH {PARTSUPP_CTE_SQL},
shipped AS (
  SELECT l_partkey,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
  FROM lineitem
  WHERE l_shipdate >= DATE '1997-01-01'
    AND l_shipdate < DATE '1998-01-01'
  GROUP BY 1
)
SELECT s_suppkey, s_name,
       CAST(COUNT(*) AS BIGINT) AS n_excess_parts
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN partsupp ON ps_suppkey = s_suppkey
JOIN part ON ps_partkey = p_partkey
JOIN shipped ON l_partkey = ps_partkey
WHERE n_name = 'NATION_11'
  AND p_name LIKE 'red%'
  AND 2 * ps_availqty > sum_qty
GROUP BY 1, 2
ORDER BY s_suppkey
""",
)
def tpch_q20_excess_stock_suppliers(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q20 (potential part promotion) on the synthesized partsupp:
    suppliers of one nation holding excess stock (availqty > half the
    1997 shipped quantity) of 'red' parts, with the count of such
    parts per supplier. Fixture adaptations, both documented: shipped
    quantity aggregates per PART (lineitem's l_suppkey was generated
    independently of the dbgen pair formula, so per-(part,supplier)
    totals barely intersect the synthetic pairs), and the half
    comparison is the exact integer form 2*availqty > sum_qty (the
    spec's 0.5 factor without a float). Parts with no 1997 shipments
    drop out via the inner join — the spec's NULL-comparison
    semantics. Plan: one filter-pruned lineitem aggregation by part,
    broadcast red-part and nation-supplier lists, partsupp as a
    projection; output bounded by |suppliers|."""
    ps = _partsupp(spark, sf_dir)
    li = fx._read(spark, sf_dir, "lineitem")
    pt = fx._read(spark, sf_dir, "part")
    su = fx._read(spark, sf_dir, "supplier")
    na = fx._read(spark, sf_dir, "nation")
    d = F.to_date("l_shipdate")
    shipped = (
        li.where(
            (d >= F.lit("1997-01-01")) & (d < F.lit("1998-01-01"))
        )
        .groupBy(F.col("l_partkey"))
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(38,0)"))
            .cast("bigint")
            .alias("sum_qty")
        )
    )
    nat_sup = (
        su.join(na, su.s_nationkey == na.n_nationkey)
        .where(F.col("n_name") == "NATION_11")
        .select("s_suppkey", "s_name")
    )
    red = pt.where(F.col("p_name").like("red%")).select("p_partkey")
    return (
        ps.join(F.broadcast(red), ps.ps_partkey == red.p_partkey)
        .join(shipped, ps.ps_partkey == shipped.l_partkey)
        .where(2 * F.col("ps_availqty") > F.col("sum_qty"))
        .join(F.broadcast(nat_sup), ps.ps_suppkey == nat_sup.s_suppkey)
        .groupBy("s_suppkey", "s_name")
        .agg(F.count(F.lit(1)).alias("n_excess_parts"))
        .orderBy("s_suppkey")
    )


@_register(
    "tpch_q2_min_cost_supplier",
    f"""
WITH {PARTSUPP_CTE_SQL}
SELECT s_acctbal, s_name, n_name, p_partkey, ps_supplycost_cents
FROM part, supplier, partsupp, nation, region
WHERE p_partkey = ps_partkey
  AND s_suppkey = ps_suppkey
  AND p_size = 15
  AND s_nationkey = n_nationkey
  AND n_regionkey = r_regionkey
  AND r_name = 'EUROPE'
  AND ps_supplycost_cents = (
    SELECT MIN(ps2.ps_supplycost_cents)
    FROM partsupp ps2, supplier s2, nation n2, region r2
    WHERE ps2.ps_partkey = p_partkey
      AND s2.s_suppkey = ps2.ps_suppkey
      AND s2.s_nationkey = n2.n_nationkey
      AND n2.n_regionkey = r2.r_regionkey
      AND r2.r_name = 'EUROPE'
  )
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
""",
)
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 (minimum-cost supplier) on the synthesized partsupp —
    the classic correlated-subquery shape: for each size-15 part, the
    EUROPE supplier(s) quoting the region-minimum supply cost. The
    oracle runs the TEXTBOOK correlated scalar subquery; this plan is
    the de-correlated rewrite (the Q21 discipline): build the
    region-filtered (part, supplier, cost) relation ONCE, take
    MIN(cost) per part with one |parts|-bounded aggregate, and
    join back on (part, cost) — a green row proves the rewrite.
    Deterministic top-100: (s_acctbal DESC, n_name, s_name, p_partkey)
    is a total order here (acctbal unique per supplier, one row per
    (part, supplier) pair at this scale). Plan: partsupp is a
    projection; supplier/nation/region broadcast; ONE part-keyed
    aggregate; TakeOrdered final. Scale: everything after the
    projection is bounded by |parts in region x suppliers-per-part|."""
    ps = _partsupp(spark, sf_dir)
    pt = fx._read(spark, sf_dir, "part")
    su = fx._read(spark, sf_dir, "supplier")
    na = fx._read(spark, sf_dir, "nation")
    re_ = fx._read(spark, sf_dir, "region")
    eu_sup = (
        su.join(na, su.s_nationkey == na.n_nationkey)
        .join(
            re_.where(F.col("r_name") == "EUROPE"),
            na.n_regionkey == re_.r_regionkey,
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    offers = ps.join(F.broadcast(eu_sup), ps.ps_suppkey == eu_sup.s_suppkey)
    # both sides derive from the same partsupp plan: rename the grouped
    # side's key or the join-back condition is ambiguous (self-join rule)
    min_cost = (
        offers.groupBy("ps_partkey")
        .agg(F.min("ps_supplycost_cents").alias("min_cost"))
        .withColumnRenamed("ps_partkey", "mc_partkey")
    )
    return (
        offers.join(
            min_cost,
            (offers.ps_partkey == F.col("mc_partkey"))
            & (offers.ps_supplycost_cents == F.col("min_cost")),
        )
        .join(
            F.broadcast(
                pt.where(F.col("p_size") == 15).select("p_partkey")
            ),
            offers.ps_partkey == F.col("p_partkey"),
        )
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey",
            "ps_supplycost_cents",
        )
        .orderBy(
            F.desc("s_acctbal"), "n_name", "s_name", "p_partkey"
        )
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Round-6 surface: the 24 queries staged in registry_next.py during round 5
# (attribution quartet, KM/Greenwood survival family, MWU/CUSUM/KS drift,
# Atkinson/weighted-Gini/Theil inequality, Markov steady-state, ABC
# migration, chained Laspeyres, HHI trend, basket entropy, stockout
# streaks, lapsed customers).  They were held out of this registry while
# the driver's ~50-query CORRECTNESS window drained the round-5 backlog
# (registry_next.py module doc); round 6 registers them by merging the
# staging dicts here rather than duplicating 2k lines of source.  The
# implementations, oracle pairs, and their sf0.001 parity tests
# (tests/test_registry_next_parity.py) are unchanged.
# ---------------------------------------------------------------------------


def _merge_round6_surface() -> None:
    from . import registry_next as _r6

    for _name in _r6.QUERIES:
        # same loud-failure contract as registry_next._stage: a silent
        # dict overwrite here would shadow a registered query with a
        # same-named staged one (or vice versa) and the oracle record
        # would quietly test the wrong implementation.
        if _name in QUERIES:
            raise ValueError(
                f"round-6 merge collision with registered query: {_name}"
            )
        QUERIES[_name] = _r6.QUERIES[_name]
        ORACLES[_name] = _r6.ORACLES[_name]


_merge_round6_surface()
