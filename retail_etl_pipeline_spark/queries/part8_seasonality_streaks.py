"""Registry part8: query registrations, in original registry order.

Sections:
- Seasonality analytics (lag-7 autocorrelation, weekday-adjusted outliers),
- Lorenz deciles + Theil index (inequality beyond the Gini scalar),

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
from ..functions.metrics import money
from ..functions.metrics import money_sum
from ..functions.stats import round6 as _round6
from ..operators import behavior as bh
from ..operators import fixtures_adapter as fx
from ..operators import privacy as pv
from ..operators import text as tx
from ._base import (_register)  # noqa: F401

# ---------------------------------------------------------------------------
# Seasonality analytics (lag-7 autocorrelation, weekday-adjusted outliers),
# l-diversity privacy audit, per-document token entropy
# ---------------------------------------------------------------------------

#: 6-decimal presentation rounding via the money() decimal hop at scale 6 —
#: for correlation/entropy outputs where 2 decimals is too coarse.
_ROUND6_SQL = "CAST(round(CAST({x} AS DECIMAL(30,12)), 6) AS DOUBLE)"

# single definition of the 6-decimal hop (functions/stats.py) — a second
# copy here could drift from the kernels' tie-break rule


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
    from ..functions.stats import CORR_DEN_EXPR, CORR_NUM_EXPR, moment_sums

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
    from ..functions.stats import gini_ppm

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
    from ..functions.stats import ks_statistic

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
    from ..functions.stats import SLOPE_PPM_EXPR, moment_sums

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
    from ..functions.stats import SLOPE_PPM_EXPR, moment_sums

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
    from ..functions.stats import lorenz_buckets

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
    from ..functions.stats import theil_index

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
