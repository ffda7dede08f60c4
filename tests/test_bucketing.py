"""Bucketed-table co-located join (the pre-shuffle strategy for repeated
big-big joins at scale): two tables bucketed on the join key join WITHOUT
a shuffle on either side."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    )
    for name in ("li_bucketed", "o_bucketed"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
    (
        li.write.mode("overwrite")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable("li_bucketed")
    )
    (
        o.write.mode("overwrite")
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable("o_bucketed")
    )
    yield "li_bucketed", "o_bucketed"
    for name in ("li_bucketed", "o_bucketed"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    li_t, o_t = bucketed_tables
    # disable broadcast so the join planner must use the bucketed layout
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table(li_t).join(
            spark.table(o_t),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # co-located: bucket layout satisfies the join distribution on
        # BOTH sides -> zero exchanges
        assert len(re.findall(r"Exchange hashpartitioning", plan)) == 0, plan
        assert "SortMergeJoin" in plan
        # and it still computes the right thing
        n = joined.count()
        assert n == spark.table(li_t).count()  # every line has its order
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
