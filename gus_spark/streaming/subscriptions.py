"""Structured Streaming surface — the completion of the reference's
Subscription stub (reference: src/cli/server/model/graphql.rs:193,
251-253 generate an empty Subscription type; execution is `todo!()` at
graphql.rs:353).

Each helper returns a *streaming* DataFrame transformation; the same
expressions power the batch twins in gus_spark.queries.events, so batch
and stream results agree (verified in tests via the file source +
``processAllAvailable``). Scale notes:

- watermarks bound state: the windowed aggregations keep only windows
  newer than (max event time - watermark), so state size is
  O(active windows × groups), independent of stream length;
- ``dropDuplicatesWithinWatermark`` keeps one key per watermark horizon
  — the streaming form of the exact-dedup operator;
- ``session_window`` merges gap-contiguous events in state, the
  streaming twin of the batch lag/cumsum sessionization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from gus_spark.functions.deterministic import dsum

# Same normalization contract as the batch reader (queries._read): events.ts
# is parquet TIMESTAMP(MICROS, isAdjustedToUTC=false); in a UTC session it is
# lossless to read it as TIMESTAMP, and declaring the type in the source
# schema keeps the streamed values bit-identical to the batch `table()` path.
EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def stream_events(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-source stream over the events table (one file per trigger —
    the local stand-in for a Kafka topic partition feed).

    Batch/stream parity: the declared TIMESTAMP schema plus the UTC
    session timezone makes streamed ``ts`` values identical to the batch
    ``queries.table()`` read (asserted in tests)."""
    if spark.conf.get("spark.sql.session.timeZone", None) != "UTC":
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    # glob form: the file stream source requires a directory/glob base
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(f"{sf_dir}/events.parquet*")
    )


def windowed_rollup(
    events: DataFrame,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling/sliding event-time window aggregation with late-data
    tolerance = ``watermark``. Streaming twin of events_hourly_rollup."""
    win = (
        F.window("ts", window)
        if slide is None
        else F.window("ts", window, slide)
    )
    return (
        events.withWatermark("ts", watermark)
        .groupBy(win.alias("win"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            dsum("value").alias("total_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def session_aggregates(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Per-user session windows (gap-merged in state). Streaming twin of
    the batch lag/cumsum sessionization."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("sess"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            dsum("value").alias("session_value"),
        )
        .select(
            "user_id",
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            "n_events",
            "session_value",
        )
    )


def dedup_stream(
    events: DataFrame,
    keys: list[str] | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming exact dedup: first event per key within the watermark
    horizon survives; state for keys older than the horizon is dropped."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        keys or ["event_id"]
    )


def attribution_join(
    clicks: DataFrame,
    purchases: DataFrame,
    watermark: str = "2 hours",
    horizon: str = "1 hour",
) -> DataFrame:
    """Watermarked stream-stream INNER join: attribute each purchase to
    every click by the same user within ``horizon`` before it — the
    canonical two-stream event-time interval join.

    Scale shape: both sides carry watermarks AND the join condition
    bounds purchase_ts to [click_ts, click_ts + horizon], which is what
    lets the state store evict — each side buffers at most
    watermark + horizon of events per user, independent of stream
    length. State partitions by the user_id equi-key across executors;
    without the time bound the buffers would grow forever (Spark
    rejects unbounded stream-stream outer joins for the same reason)."""
    c = clicks.select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    ).withWatermark("click_ts", watermark)
    p = purchases.select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    ).withWatermark("purchase_ts", watermark)
    return (
        c.join(
            p,
            (F.col("c_user") == F.col("p_user"))
            & (F.col("purchase_ts") >= F.col("click_ts"))
            & (
                F.col("purchase_ts")
                <= F.col("click_ts") + F.expr(f"INTERVAL {horizon}")
            ),
        )
        .select(
            F.col("c_user").alias("user_id"),
            "click_id",
            "click_ts",
            "purchase_id",
            "purchase_ts",
            "purchase_value",
        )
    )


def click_purchase_attribution(
    events: DataFrame,
    watermark: str = "2 hours",
    horizon: str = "1 hour",
) -> DataFrame:
    """Split one event stream into click/purchase sub-streams and join
    them (the common single-topic form of `attribution_join`)."""
    return attribution_join(
        events.filter(F.col("event_type") == "click"),
        events.filter(F.col("event_type") == "purchase"),
        watermark=watermark,
        horizon=horizon,
    )


def run_to_memory(stream_df: DataFrame, name: str, mode: str = "append"):
    """Drive a streaming DataFrame to completion against the memory sink
    (synchronous; for tests/smoke). Returns the stopped query; results
    are in the ``name`` in-memory table."""
    query = (
        stream_df.writeStream.outputMode(mode)
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    query.processAllAvailable()
    query.stop()
    return query
