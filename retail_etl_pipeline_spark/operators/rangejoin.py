"""Range (interval) join via time-bucketing — the scalable rewrite of a
non-equi BETWEEN join.

A naive ``l.ts BETWEEN r.start AND r.end`` join has no equi-key, so Spark
executes it as a broadcast nested loop — O(|L| x |R|) comparisons. The
bucketed form tiles time into fixed buckets, explodes each interval to the
buckets it overlaps (bounded: ceil(len/bucket)+1 rows), equi-joins on the
bucket id, then applies the exact range predicate — O(|L| + |R| x spread)
with a shuffle join, AQE/skew handling and all.

Demo intervals: 25 deterministic 70-day promo windows every 100 days from
1995-01-01 (deliberately NOT calendar-aligned, so no calendar-unit equi-key
exists). The DuckDB oracle runs the naive BETWEEN join — same result,
different plan — proving the rewrite exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.metrics import money_sum

#: bucket width in days (must be <= window length for full coverage math)
BUCKET_DAYS = 50
#: number of promo windows, spacing and length in days
N_PROMOS = 25
PROMO_EVERY_DAYS = 100
PROMO_LEN_DAYS = 70
PROMO_EPOCH = "1995-01-01"


def promo_windows(spark: SparkSession) -> DataFrame:
    """The deterministic interval relation: promo_id, [start_dt, end_dt),
    rate = (promo_id % 5) * 0.05 + 0.05."""
    return spark.range(N_PROMOS).select(
        F.col("id").cast("int").alias("promo_id"),
        F.date_add(
            F.lit(PROMO_EPOCH).cast("date"),
            (F.col("id") * PROMO_EVERY_DAYS).cast("int"),
        ).alias("start_dt"),
        F.date_add(
            F.lit(PROMO_EPOCH).cast("date"),
            (F.col("id") * PROMO_EVERY_DAYS + PROMO_LEN_DAYS).cast("int"),
        ).alias("end_dt"),
        ((F.col("id") % 5).cast("double") * 0.05 + 0.05).alias("rate"),
    )


PROMO_WINDOWS_SQL = f"""
promos AS (
  SELECT CAST(i AS INTEGER) AS promo_id,
         DATE '{PROMO_EPOCH}' + INTERVAL (i * {PROMO_EVERY_DAYS}) DAY AS start_dt,
         DATE '{PROMO_EPOCH}' + INTERVAL (i * {PROMO_EVERY_DAYS} + {PROMO_LEN_DAYS}) DAY AS end_dt,
         CAST(i % 5 AS DOUBLE) * 0.05 + 0.05 AS rate
  FROM range(0, {N_PROMOS}) AS t(i)
)"""


def _bucket_of(date_col) -> "F.Column":
    return (F.datediff(date_col, F.lit(PROMO_EPOCH).cast("date")) / BUCKET_DAYS).cast(
        "int"
    )


def orders_in_promo_windows(spark: SparkSession, orders: DataFrame) -> DataFrame:
    """Per promo window: order count and total price of orders whose
    o_orderdate falls in [start_dt, end_dt) — bucketed range join."""
    promos = promo_windows(spark)
    # explode each interval to every bucket it overlaps (end is exclusive)
    promo_buckets = promos.select(
        "promo_id",
        "start_dt",
        "end_dt",
        "rate",
        F.explode(
            F.sequence(
                _bucket_of(F.col("start_dt")),
                _bucket_of(F.date_sub(F.col("end_dt"), 1)),
            )
        ).alias("bucket"),
    )
    o = orders.select(
        F.to_date("o_orderdate").alias("odate"), F.col("o_totalprice")
    ).withColumn("bucket", _bucket_of(F.col("odate")))
    joined = o.join(F.broadcast(promo_buckets), "bucket", "inner").where(
        (F.col("odate") >= F.col("start_dt")) & (F.col("odate") < F.col("end_dt"))
    )
    return joined.groupBy("promo_id", "rate").agg(
        F.count(F.lit(1)).alias("order_count"),
        money_sum(F.col("o_totalprice")).alias("total_price"),
    )
