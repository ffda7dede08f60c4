"""Streaming sources, windowed rollups, watermark, sinks, custom state.

Scale notes: the file source with ``Trigger.AvailableNow`` is the batch-
catchup mode (S9's "process what's there" semantics); in production the
same code runs against Kafka with a processing-time trigger. Watermarks
bound state: the tumbling rollup keeps only windows newer than
(max event time - delay).
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..functions.metrics import money_sum

#: watermark delay for late events
WATERMARK_DELAY = "2 hours"

def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events parquet (one file = one batch
    under AvailableNow; a directory of files streams incrementally).

    The stream schema is inferred from a static footer read of the same
    glob, so the source works across fixture vintages (ts as nano-epoch
    BIGINT or as TIMESTAMP(MICROS)) — streaming file sources require an
    explicit schema, and hard-coding one pins the generator version.
    """
    from ..operators.fixtures_adapter import event_ts_micros

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # the file source wants a directory; select just the events file via glob
    static = (
        spark.read.option("pathGlobFilter", "events.parquet").parquet(sf_dir)
    )
    raw = (
        spark.readStream.schema(static.schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return raw.select(
        "event_id",
        event_ts_micros(raw).alias("ts"),
        "user_id",
        "event_type",
        "value",
    )


def stream_tumbling_counts(events: DataFrame, width: str = "1 hour") -> DataFrame:
    """Watermarked tumbling rollup — the streaming twin of
    ``operators.windows.tumbling`` (same aggregate expressions; watermark
    bounds the window state)."""
    return (
        events.withWatermark("ts", WATERMARK_DELAY)
        .groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            money_sum(F.col("value")).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def run_available_now(
    df: DataFrame,
    query_name: str,
    output_mode: str = "complete",
    timeout_s: int = 120,
):
    """Drain all available input into an in-memory table named
    ``query_name`` and stop. Test/drain harness."""
    q = (
        df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_s)
    return q


def stream_weekly_rollup_to_parquet(
    events: DataFrame, out_dir: str, checkpoint_dir: str, timeout_s: int = 120
):
    """Append-mode watermarked rollup to a parquet sink via foreachBatch —
    the streaming version of the batch publish (idempotent by batch id)."""
    rolled = stream_tumbling_counts(events)

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("append").parquet(out_dir)

    q = (
        rolled.writeStream.foreachBatch(_write)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_s)
    return q


# ---------------------------------------------------------------------------
# custom stateful operator (applyInPandasWithState)
# ---------------------------------------------------------------------------

_STATE_SCHEMA = "n BIGINT, total DOUBLE"
_OUT_SCHEMA = "user_id BIGINT, n_events BIGINT, total_value DOUBLE"


def _update_user_state(
    key: tuple,
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Arrow-batched per-user running totals: the custom-stateful-operator
    escape hatch for semantics the built-in windows can't express."""
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in batches:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
    )


def stateful_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running (count, sum) maintained in explicit state — emits
    the updated totals for every user seen in each micro-batch."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user_state,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_stream_purchase_join(events: DataFrame) -> DataFrame:
    """Stream-stream inner join: every event paired with purchases by the
    same user in the preceding hour. Both sides watermarked so Spark can
    bound the join state (rows older than watermark + interval are
    evicted) — the canonical enrich-stream-with-stream pattern."""
    left = events.select(
        F.col("event_id").alias("l_id"),
        F.col("ts").alias("l_ts"),
        F.col("user_id").alias("l_user"),
        F.col("event_type").alias("l_type"),
    ).withWatermark("l_ts", WATERMARK_DELAY)
    right = (
        events.where(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("r_id"),
            F.col("ts").alias("r_ts"),
            F.col("user_id").alias("r_user"),
            F.col("value").alias("purchase_value"),
        )
        .withWatermark("r_ts", WATERMARK_DELAY)
    )
    return left.join(
        right,
        (F.col("l_user") == F.col("r_user"))
        & (F.col("r_ts") <= F.col("l_ts"))
        & (F.col("r_ts") >= F.col("l_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("l_id") != F.col("r_id")),
        "inner",
    ).select("l_id", "l_ts", "l_user", "l_type", "r_id", "purchase_value")


# ---------------------------------------------------------------------------
# custom stateful operator with event-time TIMEOUT: gap-based sessionizer
# ---------------------------------------------------------------------------

#: inactivity gap that closes a session
SESSION_GAP_MS = 30 * 60 * 1000

_SESS_STATE_SCHEMA = "start_ms BIGINT, end_ms BIGINT, n BIGINT"
_SESS_OUT_SCHEMA = (
    "user_id BIGINT, session_start TIMESTAMP, session_end TIMESTAMP, "
    "n_events BIGINT"
)


def _update_session_state(
    key: tuple,
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Session accumulator with GroupStateTimeout.EventTimeTimeout.

    While a user stays active the state only accumulates (nothing is
    emitted); when the watermark passes last-event-time + gap, Spark calls
    this function once more with ``state.hasTimedOut`` and an empty batch
    iterator — the closed session is emitted exactly once and its state
    removed. This is the semantics `F.session_window` gives declaratively,
    re-expressed as an explicit state machine (the escape hatch for custom
    per-session logic the built-in can't express)."""
    if state.hasTimedOut:
        start_ms, end_ms, n = state.get
        state.remove()
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "session_start": [pd.Timestamp(start_ms, unit="ms")],
                "session_end": [pd.Timestamp(end_ms, unit="ms")],
                "n_events": [n],
            }
        )
        return
    start_ms, end_ms, n = state.get if state.exists else (None, None, 0)
    for pdf in batches:
        if len(pdf) == 0:
            continue
        ts_ms = pdf["ts"].astype("int64") // 1_000_000
        lo, hi = int(ts_ms.min()), int(ts_ms.max())
        start_ms = lo if start_ms is None else min(start_ms, lo)
        end_ms = hi if end_ms is None else max(end_ms, hi)
        n += len(pdf)
    state.update((start_ms, end_ms, n))
    state.setTimeoutTimestamp(end_ms + SESSION_GAP_MS)
    yield from ()


def stateful_sessions(events: DataFrame) -> DataFrame:
    """Gap-based user sessions via applyInPandasWithState + event-time
    timeout. Requires a watermark on ``ts`` (the timeout clock IS the
    watermark). Emits one row per CLOSED session; open sessions stay in
    state across micro-batches (and across restarts via the checkpoint)."""
    return (
        events.withWatermark("ts", "1 second")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_session_state,
            outputStructType=_SESS_OUT_SCHEMA,
            stateStructType=_SESS_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


# ---------------------------------------------------------------------------
# foreachBatch keyed upsert (merge-into emulation over plain parquet)
# ---------------------------------------------------------------------------

def upsert_latest_by_key(
    spark: SparkSession,
    batch_df: DataFrame,
    path: str,
    n_buckets: int = 16,
) -> None:
    """Merge a micro-batch into a parquet table keyed by user_id, keeping
    the latest (by ts) value per user.

    Plain parquet has no MERGE INTO; the emulation bounds the rewrite the
    way a transactional format would: rows are bucketed by key hash,
    ONLY the buckets present in the batch are read back and merged, and
    dynamic partition overwrite rewrites just those bucket directories.
    At scale the rewrite cost is (touched buckets / n_buckets) of the
    table, not the whole table."""
    b = batch_df.withColumn(
        "bucket", F.pmod(F.col("user_id"), F.lit(n_buckets)).cast("int")
    )
    if os.path.exists(path):
        touched = [r[0] for r in b.select("bucket").distinct().collect()]
        existing = (
            spark.read.parquet(path).where(F.col("bucket").isin(touched))
        )
        merged = existing.unionByName(b)
    else:
        merged = b
    latest = merged.groupBy("user_id", "bucket").agg(
        F.max_by("value", "ts").alias("value"), F.max("ts").alias("ts")
    )
    (
        latest.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("bucket")
        .parquet(path)
    )


def stream_upsert_latest(
    spark: SparkSession, events: DataFrame, path: str, ckpt: str
):
    """writeStream.foreachBatch upsert: each micro-batch merges into the
    keyed parquet table; exactly-once per batch via the checkpoint (a
    replayed batch overwrites the same buckets idempotently)."""
    return (
        events.writeStream.foreachBatch(
            lambda bdf, _id: upsert_latest_by_key(spark, bdf, path, 16)
        )
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )


def stream_dedup(events: DataFrame, within: str = WATERMARK_DELAY) -> DataFrame:
    """Exactly-once-per-id event stream with BOUNDED state:
    ``dropDuplicatesWithinWatermark`` on the event id.

    Plain streaming ``dropDuplicates`` keeps every seen key forever — state
    grows without bound and the job eventually dies; the WithinWatermark
    form expires a key once the watermark passes its event time, so state
    holds only the last ``within`` of ids. That is the correct semantic
    for at-least-once sources (Kafka redeliveries arrive close to the
    original). Duplicates arriving later than the watermark delay are NOT
    caught — that tail belongs to the batch dedup operators
    (``operators.dedup``), which is the standard lambda split."""
    return events.withWatermark("ts", within).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def stream_stream_purchase_join_outer(events: DataFrame) -> DataFrame:
    """LEFT OUTER stream-stream join: like
    :func:`stream_stream_purchase_join`, but events with NO purchase in
    the preceding hour still emit — with NULL purchase columns — once
    the watermark proves no match can still arrive (state eviction is
    the emission trigger: an outer result is only correct after the
    right side can no longer produce a matching row). Until the
    watermark passes an event's join window, the event sits in state and
    emits NOTHING — the test pins both halves of that contract."""
    left = events.select(
        F.col("event_id").alias("l_id"),
        F.col("ts").alias("l_ts"),
        F.col("user_id").alias("l_user"),
        F.col("event_type").alias("l_type"),
    ).withWatermark("l_ts", WATERMARK_DELAY)
    right = (
        events.where(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("r_id"),
            F.col("ts").alias("r_ts"),
            F.col("user_id").alias("r_user"),
            F.col("value").alias("purchase_value"),
        )
        .withWatermark("r_ts", WATERMARK_DELAY)
    )
    return left.join(
        right,
        (F.col("l_user") == F.col("r_user"))
        & (F.col("r_ts") <= F.col("l_ts"))
        & (F.col("r_ts") >= F.col("l_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("l_id") != F.col("r_id")),
        "leftOuter",
    ).select("l_id", "l_ts", "l_user", "l_type", "r_id", "purchase_value")


def stream_static_enriched_counts(
    events: DataFrame, user_dim: DataFrame, width: str = "1 hour"
) -> DataFrame:
    """Stream-static enrichment join + watermarked tumbling rollup: the
    event stream joined against a STATIC dimension (user -> segment)
    before windowed aggregation — the standard streaming-ETL enrichment
    shape. A stream-static equi-join is stateless (each micro-batch
    probes the static side; with a small dim Spark broadcasts it into
    every batch), so it needs no watermark of its own — only the
    aggregation holds state. The static side is re-read per batch,
    which is exactly what makes slowly-refreshed dim snapshots pick up
    between batches on a real deployment.

    Inner-join semantics: events whose user is absent from the dim are
    DROPPED before counting (the test pins this against the batch twin;
    use a left join + coalesce bucket to keep them instead)."""
    enriched = events.join(user_dim, "user_id")
    return (
        enriched.withWatermark("ts", WATERMARK_DELAY)
        .groupBy(F.window("ts", width).alias("w"), "segment")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            "segment",
            "n_events",
        )
    )
