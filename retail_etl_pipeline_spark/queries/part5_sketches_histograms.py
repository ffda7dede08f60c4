"""Registry part5: query registrations, in original registry order.

Sections:
- Mergeable-sketch distinct rollup: daily linear-counting bucket partials
- Count-min sketch (operators/sketches.py): bounded-state frequency
- k-anonymity audit (operators/privacy.py): release-risk over
- Higher moments via exact moment sums: skewness/kurtosis with bit-exact
- cume_dist — the one ranking-family window not yet exercised
- Declarative expectations (operators/expectations.py): N named rules,
- Sequence packing + training-mix rebalancing (operators/corpus.py):
- Equi-depth histogram without a global ranking window: exact percentile
- Linear interpolation over the densified day spine: fill silent gaps in
- Round-4-queue pulled forward: label-propagation communities, chi-square
- Market-basket association: pair support + lift over co-purchases.
- Exact discrete percentiles with an EXPLICIT rank convention — the
- Financial reconciliation: order header total vs recomputed line total.
- API-surface batch: grouped-agg Arrow UDF, metadata columns, null-safe
- Typed schema-on-read: from_json with an explicit schema + PERMISSIVE

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
from ..functions.metrics import decimal_sum
from ..functions.metrics import money
from ..functions.metrics import money_sum
from ..operators import corpus as cp
from ..operators import expectations as ex
from ..operators import fixtures_adapter as fx
from ..operators import graph as gph
from ..operators import privacy as pv
from ..operators import sampling as sp
from ..operators import sketches as sk
from ..operators import text as tx
from ._base import (_register, _m, _ms, _ds)  # noqa: F401
from .part4_corpus_graph import (_copurchase_edges_shared)

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
    # fanout (r11): the tokenize + 4-way cell explode + md5 chain is the
    # per-row hot path; with a single-file scan it ran in ONE task
    d = tx.fanout(fx._read(spark, sf_dir, "documents"), "doc_id")
    toks = d.select("doc_id", F.explode(tx.tokens(F.col("text"))).alias("tok"))
    sketch = sk.cms_build(toks, "tok")
    # probes is consumed TWICE (the cell-probe estimate AND the exact
    # truth count) — without pinning it, each consumer re-runs the full
    # tokenize+explode+distinct over the corpus (the plan showed 4
    # document scans; guide §5 twice-consumed-relation discipline). The
    # relation is tiny (distinct sampled tokens), so the eager
    # localCheckpoint is a bounded materialization.
    probes = (
        toks.where(F.expr(_CMS_PROBE_FILTER))
        .select("tok")
        .distinct()
        .localCheckpoint(eager=True)
    )
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
    from ..operators.pandas_aggs import weighted_median_lower as wmedian

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
