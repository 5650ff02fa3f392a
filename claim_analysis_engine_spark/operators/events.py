"""Event-stream operators over the `events` table: tumbling-window
aggregation, gap-based sessionization, and JSON property extraction.

These are the BATCH expressions of the streaming pipeline in
claim_analysis_engine_spark/streaming.py — identical transformations,
so the streaming test can assert stream-batch equivalence (the
Structured Streaming contract). The reference has no streaming
(SURVEY §2.11); this is the forward-looking surface for the driver's
events table.

Scale notes: tumbling windows and session windows are single hash/
window exchanges keyed by (type, window) / user; JSON extraction is a
JVM-side path expression (no UDF). Timestamps flatten to floored epoch
seconds in both engines so sub-second parity issues can't arise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from claim_analysis_engine_spark.registry import OpRegistry
from claim_analysis_engine_spark.tables import load

REG = OpRegistry()

SESSION_GAP_S = 1800  # 30-minute inactivity closes a session


# ------------------------------------------------------ evt_tumbling

@REG.op(
    "evt_tumbling",
    oracle="""
    SELECT event_type,
           strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS window_start,
           count(*) AS n_events,
           round(sum(value), 4) AS total_value
    FROM events GROUP BY 1, 2
    """,
)
def evt_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window aggregation per event type — the
    F.window() groupBy that becomes a watermarked streaming aggregation
    verbatim in streaming.py (same expression, readStream source)."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(
            "event_type",
            F.window("ts", "1 hour").getField("start").alias("ws"),
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


# ---------------------------------------------------- evt_sessionize

@REG.op(
    "evt_sessionize",
    oracle=f"""
    WITH ordered AS (
      SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s, event_id
      FROM events
    ),
    flagged AS (
      SELECT *,
             CASE WHEN ts_s - lag(ts_s) OVER (PARTITION BY user_id
                                              ORDER BY ts_s, event_id)
                       > {SESSION_GAP_S}
                  OR lag(ts_s) OVER (PARTITION BY user_id
                                     ORDER BY ts_s, event_id) IS NULL
                  THEN 1 ELSE 0 END AS is_start
      FROM ordered
    ),
    sess AS (
      -- CAST: DuckDB windowed sum() yields HUGEINT, which pandas renders
      -- as float64 ("3.0") while Spark emits bigint ("3") — same values,
      -- different canonical text, so the driver's value hash diverges.
      SELECT *, CAST(sum(is_start) OVER (PARTITION BY user_id
                                         ORDER BY ts_s, event_id)
                     AS BIGINT) AS session_id
      FROM flagged
    )
    SELECT user_id, session_id,
           count(*) AS n_events,
           max(ts_s) - min(ts_s) AS duration_s
    FROM sess GROUP BY 1, 2
    """,
)
def evt_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization: a 30-minute silence per user closes
    the session. Classic lag → boundary flag → running sum → one
    aggregate; everything partitions by user_id (a single shuffle on
    the natural key — at 100 TB this is the same plan with more
    executors). Ties on timestamp break by event_id so both engines
    see one deterministic ordering."""
    e = load(spark, sf_dir, "events").select(
        "user_id",
        F.col("ts").cast("timestamp").cast("long").alias("ts_s"),
        "event_id",
    )
    w = W.partitionBy("user_id").orderBy("ts_s", "event_id")
    flagged = e.withColumn(
        "is_start",
        F.when(
            (F.col("ts_s") - F.lag("ts_s").over(w) > SESSION_GAP_S)
            | F.lag("ts_s").over(w).isNull(),
            1,
        ).otherwise(0),
    )
    sess = flagged.withColumn("session_id", F.sum("is_start").over(w))
    return sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.max("ts_s") - F.min("ts_s")).alias("duration_s"),
    )


# ---------------------------------------------------- evt_json_props

@REG.op(
    "evt_json_props",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           min(CAST(props->>'k' AS INT)) AS min_k,
           max(CAST(props->>'k' AS INT)) AS max_k,
           round(avg(CAST(props->>'k' AS INT)), 4) AS avg_k
    FROM events GROUP BY 1
    """,
)
def evt_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured property extraction: pull a typed field out of
    the JSON props column with a path expression (JVM-side
    get_json_object, no UDF) and profile it per event type."""
    e = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
        F.round(F.avg(k), 4).alias("avg_k"),
    )
