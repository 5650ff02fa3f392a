"""Structured Streaming surface: the event pipeline of
operators/events.py as a watermarked streaming job.

The reference is batch-only (SURVEY §2.11 — its "real-time" features
are cache-TTL reloads, app.py:262); this module is the engine's
forward path for continuous ingestion: the SAME tumbling-window
aggregation expression runs over `readStream`, with a watermark
bounding late-data state. tests/test_streaming.py asserts
stream-batch equivalence using the availableNow trigger — Structured
Streaming's core guarantee, and the property that makes the batch
oracle meaningful for the streaming plan.

Scale notes: a watermarked tumbling-window count is incremental state
keyed by (type, window) — state size is bounded by (#types × windows
inside the watermark), independent of input volume. The parquet
source shards by file; on a cluster the same job reads a stream of
hub partitions or a message bus without plan changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_SCHEMA = (
    "event_id bigint, ts bigint, user_id bigint, event_type string, "
    "value double, props string"
)


def read_events_stream(spark: SparkSession, events_dir: str) -> DataFrame:
    """File-source stream over events parquet. The driver's files store
    TIMESTAMP(NANOS); with nanosAsLong (session conf) ts arrives as
    nanos-bigint and converts via integer division — identical to the
    batch loader (tables._load_events)."""
    raw = spark.readStream.schema(EVENTS_SCHEMA).parquet(events_dir)
    # keep TIMESTAMP (not NTZ): watermarks require event time on
    # TIMESTAMP; the session runs UTC so values align with the batch path
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def tumbling_counts(events: DataFrame, watermark: str = "1 day") -> DataFrame:
    """Watermarked 1-hour tumbling counts per event type — textually
    the same aggregation as operators/events.evt_tumbling; works on
    both batch and streaming frames (watermark applies on streams)."""
    if events.isStreaming:
        events = events.withWatermark("ts", watermark)
    return (
        events.groupBy(
            "event_type", F.window("ts", "1 hour").getField("start").alias("ws")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            "event_type",
            F.date_format("ws", "yyyy-MM-dd HH:00").alias("window_start"),
            "n_events",
            "total_value",
        )
    )


def run_available_now(result: DataFrame, table_name: str) -> None:
    """Drain everything currently available through the streaming
    engine into an in-memory sink (test/bootstrap harness; production
    sinks are parquet/Delta with checkpointing)."""
    q = (
        result.writeStream.format("memory")
        .queryName(table_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
