"""User-behavior analytics over the events stream table: funnel
conversion, weekly cohort retention, and event-type transition counts.

These are the batch forms of the session/window analytics in
``operators/windows.py`` — the same event-time semantics expressed as
grouped aggregations, so they run identically over a bounded table or a
``foreachBatch`` micro-batch. Reference parity: the reference's only
event-shaped processing is its pipeline trigger (SURVEY.md §2.10); these
extend the surface the way a training-data/product-analytics pipeline
needs.

Scale notes (100 TB): every operator here is a groupBy on ``user_id``
(high-cardinality, well-distributed — no skew mitigation needed) followed
by an aggregation on a tiny key space (event types, week keys). The only
window function (``lag`` in transitions) is partitioned by ``user_id``,
so its sort is per-user-partition, never global.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.weeks import YR_WK_NUM_SQL, yr_wk_num

FUNNEL_STAGES = ("view", "click", "purchase")


def funnel_conversion(events: DataFrame) -> DataFrame:
    """Ordered-mins funnel: users whose first view precedes their first
    click precedes their first purchase.

    One pass: per-user conditional MIN per stage (map-side combinable),
    then a single global roll-up. The "ordered mins" definition (first
    click after first view, not *every* click after a view) is the
    standard one-pass approximation — it needs no per-user event sort.
    """
    per_user = events.groupBy("user_id").agg(
        *[
            F.min(F.when(F.col("event_type") == s, F.col("ts"))).alias(
                f"t_{s}"
            )
            for s in FUNNEL_STAGES
        ]
    )
    viewed = F.col("t_view").isNotNull()
    clicked = F.col("t_click") > F.col("t_view")
    purchased = clicked & (F.col("t_purchase") > F.col("t_click"))
    return per_user.agg(
        F.count(F.when(viewed, 1)).alias("viewed"),
        F.count(F.when(clicked, 1)).alias("clicked_after_view"),
        F.count(F.when(purchased, 1)).alias("purchased_after_click"),
    )


FUNNEL_SQL = """
per_user AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
         MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
         MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
  FROM events_norm
  GROUP BY user_id
)
SELECT COUNT(*) FILTER (WHERE t_view IS NOT NULL) AS viewed,
       COUNT(*) FILTER (WHERE t_click > t_view) AS clicked_after_view,
       COUNT(*) FILTER (WHERE t_click > t_view AND t_purchase > t_click)
         AS purchased_after_click
FROM per_user
"""


def weekly_cohort_retention(events: DataFrame) -> DataFrame:
    """Cohort activity matrix: users grouped by their first active ISO
    week, counted in every week they return.

    Two aggregations, both keyed by user: per-user cohort week (min), and
    the distinct (user, week) activity pairs; the final count runs on the
    tiny (cohort, week) cross grain. The raw week key pair (not a
    derived offset) keeps year-boundary arithmetic out of the operator —
    downstream can pivot however it likes.
    """
    wk = yr_wk_num(F.to_date("ts")).alias("active_week")
    activity = events.select("user_id", wk).distinct()
    cohorts = activity.groupBy("user_id").agg(
        F.min("active_week").alias("cohort_week")
    )
    return (
        activity.join(cohorts, "user_id")
        .groupBy("cohort_week", "active_week")
        .agg(F.count("*").alias("users"))
        .orderBy("cohort_week", "active_week")
    )


_WK = YR_WK_NUM_SQL.format(d="CAST(ts AS DATE)")

COHORT_SQL = f"""
activity AS (
  SELECT DISTINCT user_id, {_WK} AS active_week
  FROM events_norm
),
cohorts AS (
  SELECT user_id, MIN(active_week) AS cohort_week
  FROM activity
  GROUP BY user_id
)
SELECT c.cohort_week, a.active_week, COUNT(*) AS users
FROM activity a
JOIN cohorts c ON a.user_id = c.user_id
GROUP BY c.cohort_week, a.active_week
ORDER BY c.cohort_week, a.active_week
"""


def event_transitions(events: DataFrame) -> DataFrame:
    """First-order transition counts between consecutive events of the
    same user (the Markov-chain view of user behavior).

    ``lag`` over (user_id, ts, event_id) — the event_id tie-break makes
    same-timestamp ordering deterministic across engines and
    partitionings. The window sort is per user partition; the final
    aggregation has at most |types|² rows.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        F.col("event_type").alias("to_type"),
        F.lag("event_type").over(w).alias("from_type"),
    )
    return (
        seq.where(F.col("from_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count("*").alias("transitions"))
        .orderBy("from_type", "to_type")
    )


TRANSITIONS_SQL = """
seq AS (
  SELECT event_type AS to_type,
         LAG(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
         ) AS from_type
  FROM events_norm
)
SELECT from_type, to_type, COUNT(*) AS transitions
FROM seq
WHERE from_type IS NOT NULL
GROUP BY from_type, to_type
ORDER BY from_type, to_type
"""


#: A fixed Monday: the origin of the LINEAR week index. Any Monday works;
#: this one precedes the fixture's earliest event.
WEEK_EPOCH_MONDAY = "1995-01-02"


def linear_week_index_sql(col: str) -> str:
    """Spark-SQL fragment for the contiguous integer week index of a
    date/timestamp column NAME: days-since-a-fixed-Monday of the week's
    Monday, div 7.

    The point versus ``isoyear*100 + weekofyear`` keys: week NUMBERS are
    non-contiguous at year boundaries (a 52-week year jumps ...9952 →
    ...0001), so arithmetic on them (gaps-and-islands, range frames)
    silently breaks for any run crossing New Year. This index is exact
    integer division of a difference of Mondays — always a multiple of
    7, so div == floor == exact on either side of the epoch."""
    return (
        f"CAST(datediff(CAST(date_trunc('week', {col}) AS DATE),"
        f" DATE '{WEEK_EPOCH_MONDAY}') AS BIGINT) div 7"
    )


def weekly_streak_histogram(activity: DataFrame) -> DataFrame:
    """Histogram of users by their LONGEST run of consecutive active
    weeks: ``(max_streak_weeks, n_users)`` from an ``(user_id, day)``
    activity relation (any granularity — days are collapsed to weeks
    here).

    Gaps-and-islands on the linear week index: ``widx − row_number()``
    is constant exactly along a consecutive run. All-integer; the only
    window partitions by user, then two hash aggregations."""
    wk = activity.select(
        "user_id", F.expr(linear_week_index_sql("day")).alias("widx")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("widx")
    runs = (
        wk.select(
            "user_id",
            "widx",
            (F.col("widx") - F.row_number().over(w)).alias("grp"),
        )
        .groupBy("user_id", "grp")
        .agg(F.count(F.lit(1)).cast("bigint").alias("len"))
    )
    mx = runs.groupBy("user_id").agg(F.max("len").alias("max_streak"))
    return mx.groupBy(
        F.col("max_streak").cast("bigint").alias("max_streak_weeks")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))


def consecutive_gap_stats(
    df: DataFrame, key_col: str, date_col: str, tiebreak_col: str
) -> DataFrame:
    """Per-key stats over the day gaps between CONSECUTIVE dated rows:
    ``(key, n_gaps, median_gap_days, min_gap_days, max_gap_days)`` for
    keys with >= 2 gaps (>= 3 rows).

    The median is rank-pinned at ceil(n/2) — the repo's lower-median
    convention: deterministic on both engines, and since equal gap
    values are interchangeable under the (gap) ordering the pick is
    order-insensitive. Same-date rows produce deterministic zero gaps
    via the tiebreak ordering. Both windows partition by key — one
    shuffle."""
    w_lag = Window.partitionBy(key_col).orderBy(date_col, tiebreak_col)
    gaps = df.select(
        key_col,
        F.datediff(F.col(date_col), F.lag(date_col).over(w_lag)).alias(
            "gap"
        ),
    ).where(F.col("gap").isNotNull())
    w_all = Window.partitionBy(key_col)
    w_rank = Window.partitionBy(key_col).orderBy("gap")
    r = gaps.select(
        key_col,
        "gap",
        F.row_number().over(w_rank).alias("rn"),
        F.count(F.lit(1)).over(w_all).cast("bigint").alias("n"),
    )
    return (
        r.where(F.col("n") >= 2)
        .groupBy(key_col, "n")
        .agg(
            F.max(
                F.when(F.col("rn") == F.expr("(n + 1) div 2"), F.col("gap"))
            )
            .cast("bigint")
            .alias("median_gap_days"),
            F.min("gap").cast("bigint").alias("min_gap_days"),
            F.max("gap").cast("bigint").alias("max_gap_days"),
        )
        .select(
            key_col,
            F.col("n").cast("bigint").alias("n_gaps"),
            "median_gap_days",
            "min_gap_days",
            "max_gap_days",
        )
    )


#: fixed-point scale for the Markov power iteration (1e12, the
#: graph-family convention — operators/graph.py SCALE)
MARKOV_SCALE = 1_000_000_000_000


def markov_power_iteration(
    events: DataFrame, iterations: int = 5
) -> DataFrame:
    """Fixed-point power iteration toward the stationary distribution of
    the user-behavior Markov chain (event_transitions' row-stochastic
    matrix): ``(event_type, mass_fp)`` after ``iterations`` steps from
    the uniform start, mass scaled by :data:`MARKOV_SCALE`.

    Exactly the PageRank determinism trick (operators/graph.py) on the
    |types|×|types| transition matrix: each update term is the exact
    floored integer division ``(mass·c_ij) div rowsum_i`` summed in
    DECIMAL(38,0) — no float mass anywhere, so Spark and the unrolled
    DuckDB twin agree bit-for-bit and per-(i,j) floor loss is identical
    on both engines. The transition relation is persisted once (bounded
    by |types|², trivially small — same cache contract as the pagerank
    adjacency); each iteration is one tiny join + aggregation.
    Sink-only types (no outgoing transitions) would leak mass; every
    fixture type has outgoing edges, and the kernel makes no
    redistribution attempt (documented, mirrored in the oracle)."""
    tr = event_transitions(events)
    rs = tr.groupBy("from_type").agg(
        F.sum("transitions").cast("decimal(38,0)").alias("rowsum")
    )
    trr = (
        tr.select(
            "from_type",
            "to_type",
            F.col("transitions").cast("decimal(38,0)").alias("c"),
        )
        .join(rs, "from_type")
        .persist()
    )
    pi = (
        events.select(F.col("event_type").alias("node"))
        .distinct()
        .select(
            "node",
            F.lit(MARKOV_SCALE).cast("decimal(38,0)").alias("mass"),
        )
    )
    for _ in range(iterations):
        pi = (
            trr.join(pi, trr.from_type == pi.node)
            .select(
                F.col("to_type").alias("n2"),
                F.expr("CAST((mass * c) div rowsum AS DECIMAL(38,0))").alias(
                    "m"
                ),
            )
            .groupBy(F.col("n2").alias("node"))
            .agg(F.sum("m").cast("decimal(38,0)").alias("mass"))
        )
    return pi.select(
        F.col("node").alias("event_type"),
        F.col("mass").cast("bigint").alias("mass_fp"),
    ).orderBy("event_type")


def markov_oracle_sql(events_cte: str, iterations: int = 5) -> str:
    """Unrolled-CTE DuckDB twin of :func:`markov_power_iteration` (the
    pagerank_oracle_sql pattern — recursive CTEs can't aggregate in the
    recursive member, so the bounded loop is unrolled). HUGEINT ``//``
    matches Spark decimal ``div`` on the all-positive masses."""
    cte = [
        events_cte.strip(),
        """seq AS (
  SELECT event_type AS to_type,
         LAG(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
         ) AS from_type
  FROM events_norm
)""",
        """tr AS (
  SELECT from_type, to_type, CAST(COUNT(*) AS HUGEINT) AS c
  FROM seq WHERE from_type IS NOT NULL GROUP BY 1, 2
)""",
        """rs AS (
  SELECT from_type, CAST(SUM(c) AS HUGEINT) AS rowsum FROM tr GROUP BY 1
)""",
        """trr AS (
  SELECT tr.from_type, tr.to_type, tr.c, rs.rowsum
  FROM tr JOIN rs USING (from_type)
)""",
        f"""m0 AS (
  SELECT DISTINCT event_type AS node,
         CAST({MARKOV_SCALE} AS HUGEINT) AS mass
  FROM events_norm
)""",
    ]
    for i in range(iterations):
        cte.append(
            f"""m{i + 1} AS (
  SELECT t.to_type AS node, SUM((m.mass * t.c) // t.rowsum) AS mass
  FROM trr t JOIN m{i} m ON t.from_type = m.node
  GROUP BY 1
)"""
        )
    return (
        "WITH "
        + ",\n".join(cte)
        + f"""
SELECT node AS event_type, CAST(mass AS BIGINT) AS mass_fp
FROM m{iterations} ORDER BY event_type
"""
    )


#: attribution lookback: a touch only earns credit if its user purchases
#: within this many microseconds (7 days)
ATTRIBUTION_LOOKBACK_US = 7 * 86400 * 1_000_000


def _with_next_purchase(events: DataFrame) -> DataFrame:
    """Annotate every event with the user's NEXT purchase (timestamp +
    event id) via an ignore-nulls last_value over the PRECEDING-only
    frame on the DESCENDING (ts, event_id) sort — the forward-looking
    inversion (no partial unbounded-FOLLOWING frame, no range join)."""
    w_desc = (
        Window.partitionBy("user_id")
        .orderBy(F.desc("ts"), F.desc("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    is_p = F.col("event_type") == "purchase"
    return events.select(
        "event_id",
        "event_type",
        F.unix_micros("ts").alias("us"),
        F.last(F.when(is_p, F.unix_micros("ts")), ignorenulls=True)
        .over(w_desc)
        .alias("next_us"),
        F.last(F.when(is_p, F.col("event_id")), ignorenulls=True)
        .over(w_desc)
        .alias("next_pid"),
    )


def attribute_last_touch(events: DataFrame) -> DataFrame:
    """Last-touch attribution over an (event_id, ts, user_id,
    event_type) stream: ``(attributed_to, n_purchases)`` — each
    purchase credited to the most recent prior non-purchase event
    within :data:`ATTRIBUTION_LOOKBACK_US`, else 'none'."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    np_ = F.col("event_type") != "purchase"
    ann = events.select(
        "event_type",
        F.unix_micros("ts").alias("us"),
        F.last(F.when(np_, F.unix_micros("ts")), ignorenulls=True)
        .over(w)
        .alias("attr_us"),
        F.last(F.when(np_, F.col("event_type")), ignorenulls=True)
        .over(w)
        .alias("attr_type"),
    )
    return (
        ann.where(F.col("event_type") == "purchase")
        .select(
            F.when(
                F.col("attr_us").isNotNull()
                & (
                    F.col("us") - F.col("attr_us")
                    <= ATTRIBUTION_LOOKBACK_US
                ),
                F.col("attr_type"),
            )
            .otherwise(F.lit("none"))
            .alias("attributed_to")
        )
        .groupBy("attributed_to")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_purchases"))
        .orderBy("attributed_to")
    )


def _qualifying_touches(events: DataFrame) -> DataFrame:
    """(channel, event_id, us, next_pid) for every non-purchase event
    whose user purchases within the lookback."""
    ann = _with_next_purchase(events)
    return ann.where(
        (F.col("event_type") != "purchase")
        & F.col("next_us").isNotNull()
        & (F.col("next_us") - F.col("us") <= ATTRIBUTION_LOOKBACK_US)
    ).select(
        F.col("event_type").alias("channel"), "event_id", "us", "next_pid"
    )


def attribute_linear(events: DataFrame) -> DataFrame:
    """Linear multi-touch attribution: every qualifying touch shares
    its purchase's credit equally (exact ppm floor division) —
    ``(channel, n_touches, credit_ppm)``."""
    touches = _qualifying_touches(events)
    k = touches.groupBy("next_pid").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n_t")
    )
    return (
        touches.join(k, "next_pid")
        .groupBy("channel")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_touches"),
            F.sum(F.expr("CAST(1000000 AS DECIMAL(38,0)) div n_t"))
            .cast("bigint")
            .alias("credit_ppm"),
        )
        .orderBy("channel")
    )


def attribute_u_shaped(events: DataFrame) -> DataFrame:
    """Position-based (U-shaped) attribution: first and last qualifying
    touches earn 400_000 ppm each, middles split 200_000 by floor
    division (single touch 1e6, two touches 500_000 each) —
    ``(channel, n_touches, credit_ppm)``."""
    touches = _qualifying_touches(events)
    wp = Window.partitionBy("next_pid").orderBy("us", "event_id")
    wk = Window.partitionBy("next_pid")
    pos = touches.select(
        "channel",
        F.row_number().over(wp).alias("r"),
        F.count(F.lit(1)).over(wk).cast("decimal(38,0)").alias("k"),
    )
    credit = pos.select(
        "channel",
        F.when(F.col("k") == 1, F.lit(1_000_000).cast("decimal(38,0)"))
        .when(F.col("k") == 2, F.lit(500_000).cast("decimal(38,0)"))
        .when(
            (F.col("r") == 1) | (F.col("r") == F.col("k")),
            F.lit(400_000).cast("decimal(38,0)"),
        )
        .otherwise(F.expr("CAST(200000 AS DECIMAL(38,0)) div (k - 2)"))
        .alias("c"),
    )
    return (
        credit.groupBy("channel")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_touches"),
            F.sum("c").cast("bigint").alias("credit_ppm"),
        )
        .orderBy("channel")
    )


def attribute_first_touch(events: DataFrame) -> DataFrame:
    """First-touch attribution: each purchase credited to the EARLIEST
    qualifying touch in its lookback window — ``(attributed_to,
    n_purchases)``, with purchases that have no qualifying touch
    counted under 'none' (mirroring :func:`attribute_last_touch`'s
    output contract). Completes the standard quartet
    (first/last/linear/U-shaped). The first touch is rank 1 of the
    same purchase-partitioned ordering the U-shaped model uses; the
    'none' count is total purchases minus attributed ones — a 1-row
    broadcast subtraction, no anti-join."""
    touches = _qualifying_touches(events)
    wp = Window.partitionBy("next_pid").orderBy("us", "event_id")
    first = touches.withColumn("r", F.row_number().over(wp)).where(
        F.col("r") == 1
    )
    attributed = first.groupBy(
        F.col("channel").alias("attributed_to")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_purchases"))
    tot = events.where(F.col("event_type") == "purchase").agg(
        F.count(F.lit(1)).cast("bigint").alias("t")
    )
    s = attributed.agg(
        F.coalesce(F.sum("n_purchases"), F.lit(0).cast("bigint")).alias("s")
    )
    none_row = (
        tot.crossJoin(F.broadcast(s))
        .select(
            F.lit("none").alias("attributed_to"),
            (F.col("t") - F.col("s")).cast("bigint").alias("n_purchases"),
        )
        .where(F.col("n_purchases") > 0)
    )
    return attributed.unionByName(none_row).orderBy("attributed_to")


def basket_entropy_by_size(items: DataFrame) -> DataFrame:
    """Basket-diversity profile: mean Shannon entropy of within-order
    item-class composition, grouped by basket size — ``(basket_size,
    n_orders, avg_entropy)`` from an ``(order_key, item_class)``
    relation (one row per item). H = 0 is a single-class basket,
    ln(k) a uniform k-class one; comparing the average against size
    tells merchandisers whether bigger baskets are stock-ups
    (low H) or cross-category shops (high H).

    The corpus doc_token_entropy discipline, per order: each ln
    argument is a ratio of exact small integers evaluated in double
    (bit-identical cross-engine), the per-class contribution
    ``n_t·ln(n/n_t)`` is decimal-rounded at 6 then summed exactly, and
    each order's H takes the scale-6 hop into DECIMAL(38,6) BEFORE the
    class average — so the mean is an exact decimal sum divided once.
    Plan: one (order, class) aggregation, one order-partitioned window
    for the basket size (real key), two bounded rollups."""
    per = items.groupBy("order_key", "item_class").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n_t")
    )
    w = Window.partitionBy("order_key")
    ann = per.withColumn("n", F.sum("n_t").over(w))
    contrib = ann.select(
        "order_key",
        "n",
        (
            F.col("n_t")
            * F.round(
                F.log(
                    F.col("n").cast("double") / F.col("n_t").cast("double")
                ).cast("decimal(38,12)"),
                6,
            ).cast("decimal(38,6)")
        )
        .cast("decimal(38,6)")
        .alias("c"),
    )
    per_order = (
        contrib.groupBy("order_key", "n")
        .agg(F.sum("c").alias("sc"))
        .select(
            F.col("n").cast("bigint").alias("basket_size"),
            F.round(
                (
                    F.col("sc").cast("double") / F.col("n").cast("double")
                ).cast("decimal(30,12)"),
                6,
            )
            .cast("decimal(38,6)")
            .alias("h"),
        )
    )
    return (
        per_order.groupBy("basket_size")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.round(
                (
                    F.sum("h").cast("double")
                    / F.count(F.lit(1)).cast("double")
                ).cast("decimal(30,12)"),
                6,
            )
            .cast("double")
            .alias("avg_entropy"),
        )
        .orderBy("basket_size")
    )
