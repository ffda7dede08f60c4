"""Round-6 staging registry: validated (query, oracle) pairs NOT yet
exposed to the driver.

Why this module exists: the driver's CORRECTNESS window checks 50
queries per round and the round-5 rotation already fronts 46
never-checked entries (DEVNOTES "window math") — registering more now
would push the longest-waiting queries out of the window and break the
cumulative all-green record. These queries are therefore staged: fully
implemented on the round-5 prep kernels (``functions/stats.py``,
``functions/ordered.py``), oracle-paired, and parity-tested at sf0.001
on every suite run (``tests/test_registry_next_parity.py``), but kept
out of ``registry.QUERIES`` until round 6 moves them over (a mechanical
cut-paste of the ``@_stage`` blocks into ``registry.py`` ``@_register``
blocks).

Same alignment rules as ``registry.py`` (aliases identical on both
sides, DECIMAL-hop money rounding, HUGEINT ``//`` for exact integer
division in DuckDB, deterministic tie-breaks).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .operators import fixtures_adapter as fx

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def _stage(name: str, oracle: str):
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        ORACLES[name] = oracle
        return fn

    return deco


# shared with registry.py's customer-spend family (duplicated here so the
# staging module stays import-independent; the round-6 move dedupes it)
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


@_stage(
    "nation_spend_theil_decomposition",
    f"""
WITH {_SPEND_CTE.strip()},
gs AS (
  SELECT n_name AS g, cents
  FROM spend
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  WHERE cents > 0
),
grp AS (
  SELECT g, CAST(COUNT(*) AS DECIMAL(38,0)) AS ng,
         CAST(SUM(CAST(cents AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sg
  FROM gs GROUP BY 1
),
tot AS (
  SELECT CAST(SUM(ng) AS DECIMAL(38,0)) AS n,
         CAST(SUM(sg) AS DECIMAL(38,0)) AS sx,
         CAST(COUNT(*) AS BIGINT) AS n_groups
  FROM grp
),
rowc AS (
  SELECT
    SUM(CAST(cents AS DECIMAL(38,0))
        * CAST(round(CAST(ln(
            CAST(CAST(cents AS DECIMAL(38,0)) * n AS DOUBLE)
            / CAST(sx AS DOUBLE)
          ) AS DECIMAL(38,12)), 6) AS DECIMAL(38,6))) AS c_total,
    SUM(CAST(cents AS DECIMAL(38,0))
        * CAST(round(CAST(ln(
            CAST(CAST(cents AS DECIMAL(38,0)) * ng AS DOUBLE)
            / CAST(sg AS DOUBLE)
          ) AS DECIMAL(38,12)), 6) AS DECIMAL(38,6))) AS c_within
  FROM gs JOIN grp USING (g), tot
),
grpc AS (
  SELECT SUM(sg
        * CAST(round(CAST(ln(
            CAST(sg * n AS DOUBLE) / CAST(sx * ng AS DOUBLE)
          ) AS DECIMAL(38,12)), 6) AS DECIMAL(38,6))) AS c_between
  FROM grp, tot
)
SELECT CAST(n AS BIGINT) AS n_customers,
       n_groups,
       CAST(round(CAST(CAST(c_total AS DOUBLE) / CAST(sx AS DOUBLE)
            AS DECIMAL(30,12)), 6) AS DOUBLE) AS theil_total,
       CAST(round(CAST(CAST(c_between AS DOUBLE) / CAST(sx AS DOUBLE)
            AS DECIMAL(30,12)), 6) AS DOUBLE) AS theil_between,
       CAST(round(CAST(CAST(c_within AS DOUBLE) / CAST(sx AS DOUBLE)
            AS DECIMAL(30,12)), 6) AS DOUBLE) AS theil_within
FROM tot, rowc, grpc
""",
)
def nation_spend_theil_decomposition(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Between/within-nation decomposition of the customer-spend Theil
    index — the property the customer_spend_theil docstring teases:
    unlike Gini, Theil splits ADDITIVELY into "inequality of nation
    means" + "spend-weighted inequality inside nations", the standard
    where-does-the-inequality-live diagnostic. Kernel:
    :func:`.functions.stats.theil_decomposition` (additivity to ~1e-6
    through the rounding hops, float-mirror parity, and the
    all-within / all-between degenerate cases are property-tested in
    tests/test_r6_kernels.py). Scale: one row-level join of customers
    to the 25-row nation sums (AQE-broadcast), one 1-row total
    broadcast, three bounded aggregations — no window, no self-join."""
    from .functions.stats import theil_decomposition

    o = _spend(spark, sf_dir)
    c = fx._read(spark, sf_dir, "customer")
    n = fx._read(spark, sf_dir, "nation")
    gs = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select(F.col("n_name").alias("g"), "cents")
    )
    return theil_decomposition(gs, "g", "cents").select(
        F.col("n").alias("n_customers"),
        "n_groups",
        "theil_total",
        "theil_between",
        "theil_within",
    )


@_stage(
    "customer_spend_atkinson",
    f"""
WITH {_SPEND_CTE.strip()},
agg AS (
  SELECT CAST(COUNT(*) AS DECIMAL(38,0)) AS n,
         CAST(SUM(CAST(cents AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sx,
         CAST(SUM(CASE WHEN cents <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS nz,
         SUM(CASE WHEN cents > 0 THEN
               CAST(round(CAST(ln(CAST(cents AS DOUBLE)) AS DECIMAL(38,12)),
                          6) AS DECIMAL(38,6))
             ELSE CAST(0 AS DECIMAL(38,6)) END) AS slog
  FROM spend
)
SELECT CAST(n AS BIGINT) AS n_customers,
       CASE WHEN sx <= 0 THEN NULL
            WHEN nz > 0 THEN 1.0
            ELSE CAST(round(CAST(
                   1.0 - exp(CAST(slog AS DOUBLE) / CAST(n AS DOUBLE))
                         * CAST(n AS DOUBLE) / CAST(sx AS DOUBLE)
                 AS DECIMAL(30,12)), 6) AS DOUBLE)
       END AS atkinson
FROM agg
""",
)
def customer_spend_atkinson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Atkinson inequality index (aversion ε=1) of customer lifetime
    spend — the welfare-theoretic third leg beside the rank-based Gini
    and entropy-based Theil: A = 1 − geomean/mean reads directly as
    "society would give up A% of total spend to equalize it". Kernel:
    :func:`.functions.stats.atkinson_index` — the ln-micros discipline
    (each ln of an exact integer, decimal-rounded at 6, summed
    exactly), zero-holder → exactly 1, all-zero → NULL, [0,1) bound and
    float-mirror parity property-tested. Scale: one hash aggregation,
    one 1-row select — the cheapest query in the inequality family."""
    from .functions.stats import atkinson_index

    return atkinson_index(_spend(spark, sf_dir), "cents").select(
        F.col("n").alias("n_customers"), "atkinson"
    )


@_stage(
    "lineitem_revenue_mwu",
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
run AS (
  SELECT ca, cb,
         SUM(cb) OVER (ORDER BY v
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cumb
  FROM cnt
)
SELECT CAST(SUM(ca) AS BIGINT) AS n_early,
       CAST(SUM(cb) AS BIGINT) AS n_late,
       CAST(SUM(CAST(ca * (2 * (cumb - cb) + cb) AS DECIMAL(38,0)))
            AS BIGINT) AS u2_early
FROM run
""",
)
def lineitem_revenue_mwu(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Mann–Whitney rank-sum statistic (doubled, tie-split)
    between early (ship year ≤ 1997) and late per-line revenue — the
    rank-based drift twin beside lineitem_revenue_ks on the SAME
    populations: KS reacts to any ecdf gap, U to stochastic dominance
    (u2/2 ≈ n_early·n_late/2 means no direction). Kernel:
    :func:`.functions.stats.mann_whitney_u2` — one hash aggregation on
    value + one exact DECIMAL prefix sum, all integer arithmetic
    (brute-force pair-count parity and the u2_a + u2_b = 2·na·nb
    complement identity are property-tested). Scale: identical plan
    family to the KS query — per-value counts bound every stage after
    the first aggregation."""
    from .functions.stats import mann_whitney_u2

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
    return mann_whitney_u2(vals, "v", "a").select(
        F.col("n_a").alias("n_early"),
        F.col("n_b").alias("n_late"),
        F.col("u2_a").alias("u2_early"),
    )


@_stage(
    "daily_revenue_cusum_days",
    """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
         CAST(round(SUM(CAST(o_totalprice AS DECIMAL(30,6))), 2) * 100
              AS BIGINT) AS cents
  FROM orders GROUP BY 1
),
params AS (
  SELECT CAST(SUM(CAST(cents AS DECIMAL(38,0))) AS HUGEINT)
           // CAST(COUNT(*) AS HUGEINT) AS mu,
         (CAST(SUM(CAST(cents AS DECIMAL(38,0))) AS HUGEINT)
           // CAST(COUNT(*) AS HUGEINT)) // 20 AS k
  FROM daily
),
run AS (
  SELECT d,
         SUM(CAST(cents AS HUGEINT) - mu - k)
           OVER (ORDER BY d
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s
  FROM daily, params
),
c AS (
  SELECT d,
         s - LEAST(MIN(s) OVER (ORDER BY d
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW),
                   0) AS cusum
  FROM run
)
SELECT d, CAST(cusum AS BIGINT) AS excess_cents
FROM c, params
WHERE cusum > mu
ORDER BY d
""",
)
def daily_revenue_cusum_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-detection over daily order revenue: the days where
    the one-sided cumulative sum C_i = max(0, C_{i-1} + x_i − μ − k)
    exceeds one average day's revenue (h = μ, allowance k = μ/20) —
    the classic sequential drift alarm that catches a sustained small
    shift long before any single-day outlier screen
    (store_revenue_anomaly_days flags spikes; CUSUM flags regime
    changes). Kernel: :func:`.functions.stats.with_cusum` via the
    prefix identity C = S − min(0, min-prefix S) — an exact DECIMAL
    running sum plus a running MIN (:func:`.functions.ordered.
    with_running_min`), both two-level range-partitioned, no one-task
    window; μ and k are exact integer divisions broadcast as a 1-row
    relation. Property-tested against the textbook recursion in
    tests/test_r6_kernels.py. Scale: stages after the daily rollup are
    bounded by distinct days."""
    from .functions.stats import with_cusum

    o = fx._read(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        (F.round(F.sum(F.col("o_totalprice").cast("decimal(30,6)")), 2) * 100)
        .cast("bigint")
        .alias("cents")
    )
    params = daily.agg(
        F.expr(
            "CAST(SUM(CAST(cents AS DECIMAL(38,0)))"
            " div COUNT(*) AS DECIMAL(38,0))"
        ).alias("mu")
    ).select("mu", F.expr("CAST(mu div 20 AS DECIMAL(38,0))").alias("k"))
    dev = daily.crossJoin(F.broadcast(params)).select(
        "d",
        "mu",
        (
            F.col("cents").cast("decimal(38,0)") - F.col("mu") - F.col("k")
        )
        .cast("decimal(38,0)")
        .alias("dev"),
    )
    out = with_cusum(dev, [F.col("d")], "dev", cusum_col="cusum")
    return (
        out.where(F.col("cusum") > F.col("mu"))
        .select("d", F.col("cusum").cast("bigint").alias("excess_cents"))
        .orderBy("d")
    )


@_stage(
    "segment_second_order_km",
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
seg AS (
  SELECT c_mktsegment AS segment, d1, d2
  FROM subj JOIN customer ON o_custkey = c_custkey
),
mx AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS md FROM orders),
life AS (
  SELECT segment,
         CASE WHEN d2 IS NOT NULL THEN datediff('day', d1, d2)
              ELSE datediff('day', d1, md) END AS t,
         CASE WHEN d2 IS NOT NULL THEN 1 ELSE 0 END AS ev
  FROM seg, mx
),
per_t AS (
  SELECT segment, t, CAST(SUM(ev) AS DECIMAL(38,0)) AS d,
         CAST(COUNT(*) AS DECIMAL(38,0)) AS c
  FROM life GROUP BY 1, 2
),
risk AS (
  SELECT segment, t, d, c,
         SUM(c) OVER (PARTITION BY segment ORDER BY t DESC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS n
  FROM per_t
),
ev AS (
  SELECT segment, t, d, n,
         CASE WHEN n > d THEN
           CAST(round(CAST(ln(CAST(n - d AS DOUBLE) / CAST(n AS DOUBLE))
                           AS DECIMAL(38,12)), 6) AS DECIMAL(38,6))
         ELSE CAST(0 AS DECIMAL(38,6)) END AS lf,
         CASE WHEN n > d THEN
           CAST(round(CAST(CAST(d AS DOUBLE)
                           / CAST(n * (n - d) AS DOUBLE)
                           AS DECIMAL(38,18)), 12) AS DECIMAL(38,12))
         ELSE CAST(0 AS DECIMAL(38,12)) END AS gw
  FROM risk WHERE d > 0
),
curve AS (
  SELECT segment, t, d, n,
         SUM(lf) OVER (PARTITION BY segment ORDER BY t
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum,
         SUM(gw) OVER (PARTITION BY segment ORDER BY t
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS gcum
  FROM ev
)
SELECT segment,
       CAST(t AS BIGINT) AS t_days,
       CAST(n AS BIGINT) AS n_at_risk,
       CAST(d AS BIGINT) AS n_events,
       CASE WHEN n = d THEN 0.0
            ELSE CAST(round(CAST(exp(CAST(cum AS DOUBLE))
                                 AS DECIMAL(30,12)), 6) AS DOUBLE)
       END AS survival,
       CASE WHEN n = d THEN 0.0
            ELSE CAST(round(CAST(exp(CAST(cum AS DOUBLE))
                                 * sqrt(CAST(gcum AS DOUBLE))
                                 AS DECIMAL(30,12)), 6) AS DOUBLE)
       END AS greenwood_se
FROM curve ORDER BY segment, t_days
""",
)
def segment_second_order_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified Kaplan–Meier: the time-to-second-order survival curve
    of customer_second_order_km split by market segment, with Greenwood
    standard errors — "do BUILDING customers reorder faster than
    MACHINERY?" answered with censoring-correct curves AND confidence
    widths instead of naive gap ecdfs. Kernel:
    :func:`.functions.stats.kaplan_meier_by` — the segment key
    partitions every window (real partitions, not the banned
    empty-partitionBy shape), so no two-level machinery is needed;
    per-group parity with the unstratified kernel and the Greenwood
    float mirror are unit-tested in tests/test_r6_kernels.py. Scale:
    one per-customer window, one broadcast of the 1-row max date, one
    (segment, duration) aggregation — all later stages bounded by
    segments × distinct durations."""
    from .functions.stats import kaplan_meier_by

    o = fx._read(spark, sf_dir, "orders").select(
        "o_custkey", F.to_date("o_orderdate").alias("dd"), "o_orderkey"
    )
    w = Window.partitionBy("o_custkey").orderBy("dd", "o_orderkey")
    ranked = o.select("o_custkey", "dd", F.row_number().over(w).alias("rn"))
    subj = ranked.groupBy("o_custkey").agg(
        F.min(F.when(F.col("rn") == 1, F.col("dd"))).alias("d1"),
        F.min(F.when(F.col("rn") == 2, F.col("dd"))).alias("d2"),
    )
    c = fx._read(spark, sf_dir, "customer").select(
        "c_custkey", F.col("c_mktsegment").alias("segment")
    )
    seg = subj.join(c, subj.o_custkey == c.c_custkey)
    mx = o.agg(F.max("dd").alias("md"))
    life = seg.crossJoin(F.broadcast(mx)).select(
        "segment",
        F.when(F.col("d2").isNotNull(), F.datediff(F.col("d2"), F.col("d1")))
        .otherwise(F.datediff(F.col("md"), F.col("d1")))
        .cast("bigint")
        .alias("t"),
        F.when(F.col("d2").isNotNull(), F.lit(1)).otherwise(F.lit(0)).alias(
            "ev"
        ),
    )
    return kaplan_meier_by(life, ["segment"])
