"""Salted aggregation / skew-join utilities: results must equal the direct
(unsalted) plans on skewed data."""

from __future__ import annotations

from pyspark.sql import functions as F

from retail_etl_pipeline_spark.functions.skew import (
    salted_agg,
    salted_broadcast_left,
    with_salt,
)


def _skewed(spark):
    # one hot key (90% of rows) + a long tail
    hot = spark.range(9000).select(
        F.lit(7).alias("k"), (F.col("id") % 100).cast("double").alias("x")
    )
    tail = spark.range(1000).select(
        (F.col("id") % 50).alias("k"), F.col("id").cast("double").alias("x")
    )
    return hot.unionByName(tail)


def test_salt_is_deterministic(spark):
    df = _skewed(spark)
    a = with_salt(df).groupBy("_salt").count().collect()
    b = with_salt(df).groupBy("_salt").count().collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_salted_agg_equals_direct(spark):
    df = _skewed(spark)
    direct = {
        (r["k"]): (r["s"], r["c"], r["mx"])
        for r in df.groupBy("k")
        .agg(
            F.sum("x").alias("s"),
            F.count(F.lit(1)).alias("c"),
            F.max("x").alias("mx"),
        )
        .collect()
    }
    salted = {
        (r["k"]): (r["s"], r["c"], r["mx"])
        for r in salted_agg(
            df,
            ["k"],
            {"s": F.sum("x"), "c": F.count(F.lit(1)), "mx": F.max("x")},
            {"s": F.sum("s"), "c": F.sum("c"), "mx": F.max("mx")},
        ).collect()
    }
    assert salted == direct


def test_salted_join_equals_direct(spark):
    big = _skewed(spark)
    small = spark.range(50).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v")
    )
    direct = big.join(small, "k", "inner").groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv")
    )
    salted = salted_broadcast_left(big, small, "k").groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv")
    )
    assert sorted(map(tuple, direct.collect())) == sorted(
        map(tuple, salted.collect())
    )


def test_aqe_splits_skewed_join_partition(spark):
    """Runtime proof of the SCALE.md claim that AQE handles hot JOIN keys:
    a 95%-one-key build side must execute as SortMergeJoin(skew=true)
    with an `AQEShuffleRead skewed` on the fat side (thresholds tuned to
    fixture bytes).

    Two conditions the production design must respect, learned here:
    AQE only splits when nothing downstream relies on the join's hash
    partitioning (a groupBy on the join key would forbid the split —
    exactly why the hot-GROUP-BY path needs functions/skew.py salting
    instead), and partition coalescing is turned off so the skew
    detector sees the raw partition sizes at these tiny volumes.
    """
    import pyspark.sql.functions as F

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        "spark.sql.shuffle.partitions": "8",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        left = spark.range(200_000).select(
            F.when(F.col("id") % 100 < 95, 7)
            .otherwise(F.col("id") % 1000)
            .alias("k"),
            F.sha2(F.col("id").cast("string"), 256).alias("pad"),
        )
        right = spark.range(1000).select(
            F.col("id").alias("k"), F.col("id").alias("v")
        )
        j = left.join(right, "k").select(F.sum(F.length("pad")).alias("s"))
        j.collect()  # the SAME QueryExecution must run for the final plan
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan
        assert "AQEShuffleRead skewed" in plan, plan
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
