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
FUNNEL_WINDOW_S = 7 * 86400  # each funnel step must fire within 7 days of the prior


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


# -------------------------------------------------------- evt_funnel

@REG.op(
    "evt_funnel",
    oracle=f"""
    WITH e AS (
      SELECT user_id, event_type,
             CAST(floor(epoch(ts)) AS BIGINT) AS ts_s
      FROM events
    ),
    v AS (
      SELECT user_id, min(ts_s) AS fv
      FROM e WHERE event_type = 'view' GROUP BY 1
    ),
    c AS (
      SELECT e.user_id, min(ts_s) AS fc
      FROM e JOIN v USING (user_id)
      WHERE event_type = 'click'
        AND ts_s > fv AND ts_s <= fv + {FUNNEL_WINDOW_S}
      GROUP BY 1
    ),
    p AS (
      SELECT e.user_id, min(ts_s) AS fp
      FROM e JOIN c USING (user_id)
      WHERE event_type = 'purchase'
        AND ts_s > fc AND ts_s <= fc + {FUNNEL_WINDOW_S}
      GROUP BY 1
    ),
    counts AS (
      SELECT 1 AS stage_ord, 'view' AS stage, count(*) AS n_users FROM v
      UNION ALL
      SELECT 2, 'click', count(*) FROM c
      UNION ALL
      SELECT 3, 'purchase', count(*) FROM p
    )
    SELECT stage_ord, stage, CAST(n_users AS BIGINT) AS n_users,
           round(CAST(n_users AS DOUBLE)
                 / (SELECT count(*) FROM v), 4) AS conv_from_entry
    FROM counts
    """,
)
def evt_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel view → click → purchase, each step
    within 7 days of the previous step's first completion.

    Classic event-analytics shape the reference lacks (SURVEY §2.12):
    each stage is a conditional min-aggregate keyed by user_id joined
    back to the raw stream, so the whole plan is three shuffles on the
    natural user key — no window over the full event history, no
    per-user collect. The 3-row summary plus the entry-count
    denominator is a broadcast, not a second scan."""
    e = load(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.col("ts").cast("timestamp").cast("long").alias("ts_s"),
    )
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts_s").alias("fv"))
    )
    c = (
        e.join(v, "user_id")
        .filter(
            (F.col("event_type") == "click")
            & (F.col("ts_s") > F.col("fv"))
            & (F.col("ts_s") <= F.col("fv") + FUNNEL_WINDOW_S)
        )
        .groupBy("user_id")
        .agg(F.min("ts_s").alias("fc"))
    )
    p = (
        e.join(c, "user_id")
        .filter(
            (F.col("event_type") == "purchase")
            & (F.col("ts_s") > F.col("fc"))
            & (F.col("ts_s") <= F.col("fc") + FUNNEL_WINDOW_S)
        )
        .groupBy("user_id")
        .agg(F.min("ts_s").alias("fp"))
    )

    # r14 (guide §7.2, duplicated subtrees): the summary used to build
    # each stage row from its own aggregate branch plus a separate
    # entry-count branch — v's subtree planned 4× (c's input, its own
    # stage row, the entry denominator, and p via c) and events scanned
    # 7×. One per-user left-join frame derives all three stage counts
    # (count(*) = |v|, count(fc) = |c|, count(fp) = |p| — the left
    # joins keep every viewer, and fc/fp are non-null exactly for
    # stage completers) in ONE aggregate; the 3-row shape comes from
    # an inline stack over that single row. v now plans 2×, p 1×,
    # events scans 7 → 4.
    u = v.join(c, "user_id", "left").join(p, "user_id", "left")
    tot = u.agg(
        F.count(F.lit(1)).alias("n_view"),
        F.count("fc").alias("n_click"),
        F.count("fp").alias("n_purchase"),
    )
    return tot.select(
        F.expr(
            "stack(3, 1, 'view', n_view, 2, 'click', n_click, "
            "3, 'purchase', n_purchase) AS (stage_ord, stage, n_users)"
        ),
        F.col("n_view").alias("entry_n"),
    ).select(
        "stage_ord",
        "stage",
        "n_users",
        F.round(F.col("n_users").cast("double") / F.col("entry_n"), 4).alias(
            "conv_from_entry"
        ),
    )


# ----------------------------------------------------- evt_retention

@REG.op(
    "evt_retention",
    oracle="""
    WITH e AS (
      SELECT user_id,
             CAST(floor(epoch(ts) / 86400) AS BIGINT) AS d
      FROM events
    ),
    f AS (SELECT user_id, min(d) AS d0 FROM e GROUP BY 1),
    a AS (
      SELECT e.user_id,
             CAST(floor(f.d0 / 7) AS BIGINT) AS cohort_week,
             CAST(floor((e.d - f.d0) / 7) AS BIGINT) AS week_offset
      FROM e JOIN f USING (user_id)
    ),
    r AS (
      SELECT cohort_week, week_offset,
             count(DISTINCT user_id) AS n_active
      FROM a GROUP BY 1, 2
    ),
    base AS (
      SELECT cohort_week, n_active AS cohort_size
      FROM r WHERE week_offset = 0
    )
    SELECT r.cohort_week, r.week_offset,
           CAST(r.n_active AS BIGINT) AS n_active,
           CAST(base.cohort_size AS BIGINT) AS cohort_size,
           round(CAST(r.n_active AS DOUBLE) / base.cohort_size, 4)
             AS retention
    FROM r JOIN base USING (cohort_week)
    """,
)
def evt_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users grouped by the epoch-week of
    their first event; each (cohort, week-offset) cell counts distinct
    users still active, normalized by the cohort's week-0 size.

    Epoch-day integers keep both engines in exact arithmetic (no
    calendar-week truncation-rule drift). The plan is two shuffles on
    user_id (first-event aggregate + the join back) and one on the
    small cohort grid; the week-0 self-join is broadcast-sized because
    the grid is |cohorts| × |offsets|, not |users|."""
    e = load(spark, sf_dir, "events").select(
        "user_id",
        F.floor(F.col("ts").cast("timestamp").cast("long") / 86400)
        .cast("long")
        .alias("d"),
    )
    f = e.groupBy("user_id").agg(F.min("d").alias("d0"))
    a = e.join(f, "user_id").select(
        "user_id",
        F.floor(F.col("d0") / 7).cast("long").alias("cohort_week"),
        F.floor((F.col("d") - F.col("d0")) / 7).cast("long").alias("week_offset"),
    )
    r = a.groupBy("cohort_week", "week_offset").agg(
        F.countDistinct("user_id").alias("n_active")
    )
    base = r.filter(F.col("week_offset") == 0).select(
        "cohort_week", F.col("n_active").alias("cohort_size")
    )
    return r.join(F.broadcast(base), "cohort_week").select(
        "cohort_week",
        "week_offset",
        "n_active",
        "cohort_size",
        F.round(F.col("n_active").cast("double") / F.col("cohort_size"), 4).alias(
            "retention"
        ),
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


# -------------------------------------------------- evt_props_variant

@REG.op(
    "evt_props_variant",
    oracle="""
    SELECT event_type,
           count(*) AS n_events,
           min(CAST(props->>'k' AS INT)) AS min_k,
           max(CAST(props->>'k' AS INT)) AS max_k,
           round(avg(CAST(props->>'k' AS INT)), 4) AS avg_k,
           count(*) AS n_missing_path,
           'OBJECT<k: BIGINT>' AS k_schema
    FROM events GROUP BY 1
    """,
)
def evt_props_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured props through the VARIANT type — Spark 4's
    native binary-encoded semi-structured value (the engine surface
    behind shredded JSON storage), vs evt_json_props's string-path
    twin: parse_json once, then typed path extraction
    (variant_get '$.k' as int), NULL-safe access to an absent path
    (try_variant_get '$.missing' — every row lacks it, so the count
    equals n_events; a get_json_object twin can't distinguish
    absent-path from null-value), and schema_of_variant_agg
    certifying the inferred object schema across the whole group —
    the oracle pins the aggregate schema literal, so a generation
    drift in props' shape (new key, type widening) hash-mismatches.

    Scale: VARIANT parses once per row into a binary value that all
    downstream extractions share (string-path extraction re-parses
    per call); whole-stage-codegen eligible, no UDF."""
    e = load(spark, sf_dir, "events")
    v = F.parse_json("props")
    k = F.variant_get(v, "$.k", "int")
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
        F.round(F.avg(k), 4).alias("avg_k"),
        F.sum(
            F.try_variant_get(v, "$.missing", "string").isNull().cast("long")
        ).alias("n_missing_path"),
        F.schema_of_variant_agg(v).alias("k_schema"),
    )


# --------------------------------------------------- evt_error_burst

BURST_TRAIL_H = 24  # trailing window (hours) for the error-rate baseline
BURST_Z = 3.0


@REG.op(
    "evt_error_burst",
    oracle=f"""
    WITH hourly AS (
      SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour,
             count(*) AS n_events,
             CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_errors
      FROM events GROUP BY 1
    ),
    rated AS (
      SELECT hour, n_events, n_errors,
             n_errors * 1.0 / n_events AS err_rate
      FROM hourly
    ),
    scored AS (
      SELECT hour, n_events, n_errors, err_rate,
             avg(err_rate) OVER w AS mu,
             stddev_samp(err_rate) OVER w AS sigma
      FROM rated
      WINDOW w AS (ORDER BY hour
                   ROWS BETWEEN {BURST_TRAIL_H} PRECEDING AND 1 PRECEDING)
    )
    SELECT hour, n_events, n_errors, round(err_rate, 4) AS err_rate,
           round(CASE WHEN sigma > 0 THEN (err_rate - mu) / sigma END, 4) AS z,
           coalesce(sigma > 0 AND (err_rate - mu) / sigma > {BURST_Z}, false)
             AS is_burst
    FROM scored
    """,
)
def evt_error_burst(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Operational anomaly detection on the event stream: each hour's
    error RATE is z-scored against its trailing 24-hour baseline
    (mean/std over the preceding hours only — no lookahead), bursts
    flagged above 3σ. The window runs over the HOURLY aggregate (the
    facts collapse first — ~|hours| rows however large the stream), so
    the single unpartitioned ordered window is bounded and cheap, the
    same justified exception as the lag-stats cumulative histogram.
    In production the identical expression runs incrementally over the
    streaming tumbling-counts sink."""
    hourly = (
        load(spark, sf_dir, "events")
        .groupBy(F.date_format("ts", "yyyy-MM-dd HH:00").alias("hour"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
            .cast("bigint")
            .alias("n_errors"),
        )
    )
    rated = hourly.withColumn(
        "err_rate", F.col("n_errors").cast("double") / F.col("n_events")
    )
    w = (
        W.orderBy("hour").rowsBetween(-BURST_TRAIL_H, -1)
    )
    scored = rated.select(
        "hour",
        "n_events",
        "n_errors",
        "err_rate",
        F.avg("err_rate").over(w).alias("mu"),
        F.stddev_samp("err_rate").over(w).alias("sigma"),
    )
    z = F.when(F.col("sigma") > 0, (F.col("err_rate") - F.col("mu")) / F.col("sigma"))
    return scored.select(
        "hour",
        "n_events",
        "n_errors",
        F.round("err_rate", 4).alias("err_rate"),
        F.round(z, 4).alias("z"),
        F.coalesce(z > BURST_Z, F.lit(False)).alias("is_burst"),
    )


# -------------------------------------------- evt_sessionize_native

@REG.op(
    "evt_sessionize_native",
    oracle=f"""
    WITH ordered AS (
      SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s, event_id
      FROM events
    ),
    flagged AS (
      SELECT *,
             CASE WHEN ts_s - lag(ts_s) OVER (PARTITION BY user_id
                                              ORDER BY ts_s, event_id)
                       >= {SESSION_GAP_S}
                  OR lag(ts_s) OVER (PARTITION BY user_id
                                     ORDER BY ts_s, event_id) IS NULL
                  THEN 1 ELSE 0 END AS is_start
      FROM ordered
    ),
    sess AS (
      SELECT *, CAST(sum(is_start) OVER (PARTITION BY user_id
                                         ORDER BY ts_s, event_id)
                     AS BIGINT) AS sid
      FROM flagged
    )
    SELECT user_id,
           CAST(min(ts_s) AS BIGINT) AS session_start,
           count(*) AS n_events,
           CAST(max(ts_s) - min(ts_s) AS BIGINT) AS duration_s
    FROM sess GROUP BY user_id, sid
    """,
)
def evt_sessionize_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization via Spark's NATIVE session_window — one
    groupBy(user, session_window(ts, gap)) instead of the manual
    lag → flag → running-sum cascade (evt_sessionize). Semantically
    the native window closes when the gap REACHES 30 min (merge while
    next_start < window_end = last + gap), so the oracle's boundary
    is `>= gap` where the manual op's is `> gap` — a real off-by-one
    between the two idioms, pinned here so both stay green. The
    native form is ALSO the streaming-native shape (session_window
    works under watermarks with merging session state), and plans as
    a single aggregate after one shuffle on user_id — no window
    exchange, no running sum."""
    e = load(spark, sf_dir, "events").select(
        "user_id",
        F.col("ts").cast("timestamp").alias("tts"),
    )
    return (
        e.groupBy(
            "user_id",
            F.session_window("tts", f"{SESSION_GAP_S} seconds").alias("sw"),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("sw.start").cast("long").alias("session_start"),
            "n_events",
            (F.col("sw.end").cast("long") - F.col("sw.start").cast("long")
             - SESSION_GAP_S).alias("duration_s"),
        )
    )


# --------------------------------------------------- evt_transitions

@REG.op(
    "evt_transitions",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (
               PARTITION BY user_id
               ORDER BY CAST(floor(epoch(ts)) AS BIGINT), event_id
             ) AS prev_type
      FROM events
    ),
    t AS (
      SELECT prev_type, event_type AS next_type, count(*) AS n
      FROM ordered WHERE prev_type IS NOT NULL
      GROUP BY 1, 2
    ),
    tot AS (SELECT prev_type, sum(n) AS row_total FROM t GROUP BY 1)
    SELECT t.prev_type, t.next_type, CAST(t.n AS BIGINT) AS n,
           round(t.n / CAST(tot.row_total AS DOUBLE), 6) AS p
    FROM t JOIN tot USING (prev_type)
    """,
)
def evt_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-journey transition matrix: for every consecutive event
    pair within a user's timeline, count (prev_type → next_type)
    transitions and the row-normalized probability — the first-order
    Markov view of product flows (what users do AFTER an error, what
    precedes a purchase) that funnels and retention don't show.
    Same-second events order by event_id, the events.py tie
    convention, so the chain is deterministic.

    Scale: one lag window per user (single shuffle on user_id — the
    sessionize partitioning) feeding a low-cardinality pair aggregate
    whose map-side combine reduces each partition to at most
    |event types|² rows; the probability join attaches a per-row-total
    frame of the same tiny cardinality. Nothing downstream of the
    window exceeds the type-pair grain."""
    e = load(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.col("ts").cast("timestamp").cast("long").alias("ts_s"),
        "event_id",
    )
    w = W.partitionBy("user_id").orderBy("ts_s", "event_id")
    pairs = (
        e.withColumn("prev_type", F.lag("event_type").over(w))
        .where(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    totals = pairs.groupBy("prev_type").agg(F.sum("n").alias("row_total"))
    return pairs.join(F.broadcast(totals), "prev_type").select(
        "prev_type",
        "next_type",
        "n",
        F.round(F.col("n") / F.col("row_total").cast("double"), 6).alias("p"),
    )


# --------------------------------------------------- evt_attribution

ATTR_LOOKBACK_US = 24 * 3600 * 1000_000  # last-touch lookback: 24 h, in µs


@REG.op(
    "evt_attribution",
    oracle=f"""
    WITH tagged AS (
      SELECT event_id, ts, user_id, event_type, value,
             last_value(CASE WHEN event_type IN ('view', 'click')
                             THEN ts END IGNORE NULLS)
               OVER w AS lt_ts,
             last_value(CASE WHEN event_type IN ('view', 'click')
                             THEN event_type END IGNORE NULLS)
               OVER w AS lt_type,
             first_value(CASE WHEN event_type IN ('view', 'click')
                              THEN event_type END IGNORE NULLS)
               OVER w AS ft_type
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING)
    ),
    conv AS (
      SELECT value,
             CASE WHEN lt_ts IS NOT NULL
                   AND epoch_us(ts) - epoch_us(lt_ts) <= {ATTR_LOOKBACK_US}
                  THEN lt_type ELSE 'direct' END AS last_channel,
             coalesce(ft_type, 'direct') AS first_channel
      FROM tagged WHERE event_type = 'purchase'
    )
    SELECT model, channel,
           count(*) AS n_conversions,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS attributed_value
    FROM (
      SELECT 'last_touch_24h' AS model, last_channel AS channel, value FROM conv
      UNION ALL
      SELECT 'first_touch' AS model, first_channel AS channel, value FROM conv
    ) GROUP BY 1, 2
    """,
)
def evt_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion attribution over raw event streams — the credit-
    assignment op behind every growth dashboard, and the same shape a
    training pipeline uses to label interaction sequences with
    outcomes. Two standard models side by side: last-touch within a
    24 h lookback (touch = view/click strictly before the purchase in
    (ts, event_id) order; no touch in window → 'direct') and
    first-touch over the user's full history.

    Scale shape: ONE window pass over the user-partitioned event
    stream (last/first IGNORE NULLS running values) — no
    purchase×touch join, so per-user cost is linear in events, and the
    single exchange is the same user_id hash shuffle sessionization
    already pays. Both models come out of the one pass via an explode,
    so the fact table is read once. Attribution sums go through
    decimal so cross-engine float addition order can't drift the
    cents. Window ties break on event_id — deterministic under
    same-timestamp events."""
    e = load(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    is_touch = F.col("event_type").isin("view", "click")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    touch = F.when(is_touch, F.struct("ts", "event_type"))
    tagged = e.select(
        "ts",
        "event_type",
        "value",
        F.last(touch, ignorenulls=True).over(w).alias("lt"),
        F.first(touch, ignorenulls=True).over(w).alias("ft"),
    )
    conv = tagged.where(F.col("event_type") == "purchase").select(
        "value",
        F.when(
            F.col("lt").isNotNull()
            & (
                F.unix_micros(F.col("ts").cast("timestamp"))
                - F.unix_micros(F.col("lt.ts").cast("timestamp"))
                <= ATTR_LOOKBACK_US
            ),
            F.col("lt.event_type"),
        )
        .otherwise("direct")
        .alias("last_channel"),
        F.coalesce(F.col("ft.event_type"), F.lit("direct")).alias("first_channel"),
    )
    both = conv.select(
        "value",
        F.explode(
            F.array(
                F.struct(
                    F.lit("last_touch_24h").alias("model"),
                    F.col("last_channel").alias("channel"),
                ),
                F.struct(
                    F.lit("first_touch").alias("model"),
                    F.col("first_channel").alias("channel"),
                ),
            )
        ).alias("m"),
    )
    return both.groupBy(
        F.col("m.model").alias("model"), F.col("m.channel").alias("channel")
    ).agg(
        F.count(F.lit(1)).alias("n_conversions"),
        F.sum(F.col("value").cast("decimal(18,2)"))
        .cast("double")
        .alias("attributed_value"),
    )


# ------------------------------------------------------- agg_ohlc_daily

@REG.op(
    "agg_ohlc_daily",
    oracle="""
    SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
           count(*) AS n,
           round(arg_min(value, ts), 4) AS open,
           round(max(value), 4)        AS high,
           round(min(value), 4)        AS low,
           round(arg_max(value, ts), 4) AS close
    FROM events GROUP BY 1, 2
    """,
)
def agg_ohlc_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily OHLC (open-high-low-close) resampling of the event value
    stream per event type — the canonical time-series downsample
    (candlesticks, sensor rollups, metric summaries). Spark's
    min_by/max_by are the arg_min/arg_max twins; both engines pick the
    value at the earliest/latest ts. Event timestamps are unique in
    this feed (enforced upstream), so the picks are deterministic
    without a tiebreak column; values round(4) for cross-engine hash
    stability.

    Scale: one hash-aggregate shuffle on (event_type, day); min_by
    partials are (ord, value) pairs, so the aggregate map-side combines
    like any min/max — no window, no sort, no per-group value
    materialization."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy("event_type", F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min_by("value", "ts"), 4).alias("open"),
            F.round(F.max("value"), 4).alias("high"),
            F.round(F.min("value"), 4).alias("low"),
            F.round(F.max_by("value", "ts"), 4).alias("close"),
        )
    )


# ---------------------------------------------- evt_power_users_rolling

ROLLING_WINDOW_DAYS = 7


@REG.op(
    "evt_power_users_rolling",
    oracle=f"""
    WITH ed AS (
        SELECT DISTINCT date_trunc('day', ts)::DATE AS d, user_id FROM events
    ), days AS (SELECT DISTINCT d FROM ed)
    SELECT strftime(days.d, '%Y-%m-%d') AS day,
           count(DISTINCT ed.user_id) AS active_users_7d
    FROM days JOIN ed
      ON ed.d BETWEEN days.d - {ROLLING_WINDOW_DAYS - 1} AND days.d
    GROUP BY 1
    """,
)
def evt_power_users_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-{ROLLING_WINDOW_DAYS}-day DISTINCT active users per
    observed day — the rolling-DAU/WAU engagement metric. Sliding
    DISTINCT is the one window aggregate Spark (and SQL) cannot
    incrementalize: distinct doesn't subtract, so a window frame can't
    slide. The scalable formulation inverts the window: each (user,
    event-day) SUPPORTS the {ROLLING_WINDOW_DAYS} anchor days it falls
    inside, so explode to (anchor, user), keep anchors that are
    observed days (broadcast semi join — the grid is |days|), and one
    countDistinct per anchor. The range join the oracle states becomes
    a pure equi-shuffle with a bounded ×{ROLLING_WINDOW_DAYS} row
    expansion of the already-deduped (user, day) frame.

    At 100 TB: the expansion factor is the window length, constant —
    vs a range join whose candidate set grows with |days| × |events|;
    for 90-day windows you'd explode per-week chunks then
    countDistinct over (anchor, user) pairs the same way."""
    ed = (
        load(spark, sf_dir, "events")
        .select(F.to_date("ts").alias("d"), "user_id")
        .distinct()
    )
    days = ed.select("d").distinct()
    anchors = ed.select(
        "user_id",
        F.explode(
            F.expr(
                f"sequence(d, date_add(d, {ROLLING_WINDOW_DAYS - 1}),"
                " interval 1 day)"
            )
        ).alias("anchor"),
    )
    return (
        anchors.join(
            F.broadcast(days.select(F.col("d").alias("anchor"))),
            "anchor",
            "left_semi",
        )
        .groupBy(F.date_format("anchor", "yyyy-MM-dd").alias("day"))
        .agg(F.countDistinct("user_id").alias("active_users_7d"))
    )


# -------------------------------------------------------- evt_anomaly_mad

MAD_K = 3.0  # flag days beyond k robust sigmas (MAD-scaled)


@REG.op(
    "evt_anomaly_mad",
    oracle=f"""
    WITH dc AS (
        SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, count(*) AS n
        FROM events GROUP BY 1, 2
    ), med AS (
        SELECT event_type, median(n) AS m FROM dc GROUP BY 1
    ), mad AS (
        SELECT dc.event_type, median(abs(dc.n - med.m)) AS s
        FROM dc JOIN med USING (event_type) GROUP BY 1
    )
    SELECT dc.event_type, dc.day, dc.n,
           round(med.m, 4) AS med_n,
           round(mad.s, 4) AS mad_n,
           abs(dc.n - med.m) > {MAD_K} * mad.s AS is_anomaly
    FROM dc JOIN med USING (event_type) JOIN mad USING (event_type)
    """,
)
def evt_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust daily-volume anomaly flags per event type: a day is
    anomalous when its count deviates from the type's MEDIAN by more
    than {MAD_K}× the median absolute deviation — the
    outlier-resistant sibling of detect_outliers_zscore (mean/stddev
    are themselves dragged by the outliers they're meant to find; the
    median/MAD pair has a 50% breakdown point).

    Exactness: counts are integers; both medians interpolate over
    sorted integers identically in each engine (round(4) guards the
    .5 interpolation). Two exact-percentile aggregates over the DAY
    grain (tiny — |types|×|days|), then broadcast joins back; the raw
    event table is touched once."""
    dc = (
        load(spark, sf_dir, "events")
        .groupBy("event_type", F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    med = dc.groupBy("event_type").agg(
        F.percentile("n", F.lit(0.5)).alias("m")
    )
    dm = dc.join(F.broadcast(med), "event_type")
    mad = dm.groupBy("event_type").agg(
        F.percentile(F.abs(F.col("n") - F.col("m")), F.lit(0.5)).alias("s")
    )
    return (
        dm.join(F.broadcast(mad), "event_type")
        .select(
            "event_type",
            "day",
            "n",
            F.round("m", 4).alias("med_n"),
            F.round("s", 4).alias("mad_n"),
            (F.abs(F.col("n") - F.col("m")) > MAD_K * F.col("s")).alias(
                "is_anomaly"
            ),
        )
    )


# ----------------------------------------------------------- evt_streaks

@REG.op(
    "evt_streaks",
    oracle="""
    WITH d AS (
        SELECT DISTINCT user_id, date_trunc('day', ts)::DATE AS d FROM events
    ), g AS (
        SELECT user_id, d,
               d - CAST(row_number() OVER (PARTITION BY user_id ORDER BY d)
                        AS INT) AS grp
        FROM d
    ), s AS (
        SELECT user_id, grp, count(*) AS len, min(d) AS s0
        FROM g GROUP BY 1, 2
    ), ranked AS (
        SELECT user_id, len, s0,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY len DESC, s0) AS rk,
               count(*) OVER (PARTITION BY user_id) AS n_streaks,
               CAST(sum(len) OVER (PARTITION BY user_id) AS BIGINT)
                 AS n_active_days
        FROM s
    )
    SELECT user_id, n_active_days, n_streaks,
           len AS longest_streak,
           strftime(s0, '%Y-%m-%d') AS streak_start
    FROM ranked WHERE rk = 1
    """,
)
def evt_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-day activity streak per user — the
    gaps-and-islands pattern (engagement scoring, habit metrics):
    distinct active days, then `day − row_number` is CONSTANT within a
    consecutive run, so one window + one aggregate finds every island
    without a self-join or recursion. Ties on streak length resolve to
    the EARLIEST streak so both engines elect the same row.

    Scale: everything partitions by user_id — one shuffle, windows and
    aggregates all share it (Catalyst reuses the exchange); per-user
    state is the handful of islands, never the raw event stream."""
    d = (
        load(spark, sf_dir, "events")
        .select("user_id", F.to_date("ts").alias("d"))
        .distinct()
    )
    wu = W.partitionBy("user_id").orderBy("d")
    g = d.withColumn("grp", F.date_sub("d", F.row_number().over(wu)))
    s = g.groupBy("user_id", "grp").agg(
        F.count(F.lit(1)).alias("len"), F.min("d").alias("s0")
    )
    wr = W.partitionBy("user_id")
    ranked = s.select(
        "user_id",
        "len",
        "s0",
        F.row_number().over(wr.orderBy(F.desc("len"), "s0")).alias("rk"),
        F.count(F.lit(1)).over(wr).alias("n_streaks"),
        F.sum("len").over(wr).alias("n_active_days"),
    )
    return ranked.where(F.col("rk") == 1).select(
        "user_id",
        "n_active_days",
        "n_streaks",
        F.col("len").alias("longest_streak"),
        F.date_format("s0", "yyyy-MM-dd").alias("streak_start"),
    )


# ----------------------------------------------------- evt_bot_detection

BOT_MIN_EVENTS = 20      # below this, rate estimates are noise
BOT_MAX_MEDIAN_GAP_S = 60  # humans don't sustain sub-minute median gaps


@REG.op(
    "evt_bot_detection",
    oracle=f"""
    WITH o AS (
        SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s, event_id
        FROM events
    ), g AS (
        SELECT user_id,
               ts_s - lag(ts_s) OVER (PARTITION BY user_id
                                      ORDER BY ts_s, event_id) AS gap
        FROM o
    ), stats AS (
        SELECT user_id, count(*) + 1 AS n_events,
               round(median(gap), 1) AS median_gap_s
        FROM g WHERE gap IS NOT NULL GROUP BY user_id
    )
    SELECT user_id, CAST(n_events AS BIGINT) AS n_events, median_gap_s,
           (n_events >= {BOT_MIN_EVENTS}
            AND median_gap_s <= {BOT_MAX_MEDIAN_GAP_S}) AS is_bot
    FROM stats
    """,
)
def evt_bot_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cadence-based bot screen: a user with ≥ {BOT_MIN_EVENTS} events
    whose MEDIAN inter-arrival gap is ≤ {BOT_MAX_MEDIAN_GAP_S}s is
    flagged — the median (not mean) makes the signal robust to one
    long idle break in an otherwise machine-paced stream, the inverse
    of evt_anomaly_mad's use of the same estimator. Timestamps flatten
    to epoch seconds (module convention), ties order by event_id, so
    the gap sequence is engine-identical.

    Scale: one user_id shuffle for the lag window; the exact median
    needs each user's gaps together, which the same partitioning
    already guarantees — no second exchange."""
    o = load(spark, sf_dir, "events").select(
        "user_id",
        F.col("ts").cast("timestamp").cast("long").alias("ts_s"),
        "event_id",
    )
    w = W.partitionBy("user_id").orderBy("ts_s", "event_id")
    g = o.select(
        "user_id", (F.col("ts_s") - F.lag("ts_s").over(w)).alias("gap")
    ).where(F.col("gap").isNotNull())
    stats = g.groupBy("user_id").agg(
        (F.count(F.lit(1)) + 1).alias("n_events"),
        F.round(F.percentile("gap", F.lit(0.5)), 1).alias("median_gap_s"),
    )
    return stats.select(
        "user_id",
        "n_events",
        "median_gap_s",
        (
            (F.col("n_events") >= BOT_MIN_EVENTS)
            & (F.col("median_gap_s") <= BOT_MAX_MEDIAN_GAP_S)
        ).alias("is_bot"),
    )


# ----------------------------------------------------- evt_heatmap_profile

@REG.op(
    "evt_heatmap_profile",
    oracle="""
    WITH c AS (
        SELECT event_type,
               CAST(dayofweek(ts) AS INT) + 1 AS dow,
               CAST(hour(ts) AS INT) AS hod,
               count(*) AS n
        FROM events GROUP BY 1, 2, 3
    ), t AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS total FROM c GROUP BY 1)
    SELECT c.event_type, c.dow, c.hod, CAST(c.n AS BIGINT) AS n,
           CAST(c.n * 10000 // t.total AS BIGINT) AS share_bp
    FROM c JOIN t ON t.event_type = c.event_type
    """,
)
def evt_heatmap_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week × hour-of-day activity heatmap per event type — the
    load-profile panel capacity planning and anomaly baselining read
    (an error burst at 3am Sunday means something different than at
    noon Monday). Share in integer BASIS POINTS via floor division (no
    float anywhere). Day-numbering convention is a cross-engine trap:
    Spark's dayofweek is Sunday=1..7, DuckDB's Sunday=0..6 — the
    oracle normalizes with +1 so both grids index Sunday=1.

    Scale: one map-side-combinable aggregate to a ≤ |types|×168-cell
    grid; the per-type total is a broadcast join back."""
    c = (
        load(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.dayofweek("ts").alias("dow"),
            F.hour("ts").alias("hod"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    t = c.groupBy("event_type").agg(F.sum("n").alias("total"))
    return c.join(F.broadcast(t), "event_type").select(
        "event_type",
        "dow",
        "hod",
        "n",
        F.expr("CAST(n * 10000 AS BIGINT) div total").alias("share_bp"),
    )


# ---------------------------------------------------------- evt_gap_hist

@REG.op(
    "evt_gap_hist",
    oracle="""
    WITH o AS (
        SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s, event_id
        FROM events
    ), g AS (
        SELECT ts_s - lag(ts_s) OVER (PARTITION BY user_id
                                      ORDER BY ts_s, event_id) AS gap
        FROM o
    ), b AS (
        SELECT CASE WHEN gap = 0 THEN 0 ELSE length(bin(gap)) END AS bucket
        FROM g WHERE gap IS NOT NULL
    ), c AS (
        SELECT bucket, count(*) AS n FROM b GROUP BY 1
    ), t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM c)
    SELECT CAST(c.bucket AS INT) AS bit_bucket, CAST(c.n AS BIGINT) AS n_gaps,
           CAST(c.n * 10000 // t.total AS BIGINT) AS share_bp
    FROM c CROSS JOIN t
    """,
)
def evt_gap_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival gap histogram in power-of-two second buckets —
    the cadence fingerprint of the whole event feed (evt_bot_detection
    judges one user; this is the population view that tells you WHERE
    to put its thresholds: human traffic shows a heavy 2^10-2^14 s
    mass, machine traffic piles under 2^6). Bucket = bit length of the
    gap (integer, no float log2 boundary); shares in basis points via
    floor division.

    One user_id window shuffle, then a ~40-cell aggregate."""
    o = load(spark, sf_dir, "events").select(
        "user_id",
        F.col("ts").cast("timestamp").cast("long").alias("ts_s"),
        "event_id",
    )
    w = W.partitionBy("user_id").orderBy("ts_s", "event_id")
    g = o.select((F.col("ts_s") - F.lag("ts_s").over(w)).alias("gap")).where(
        F.col("gap").isNotNull()
    )
    b = g.select(
        F.when(F.col("gap") == 0, 0)
        .otherwise(F.length(F.bin("gap")))
        .cast("int")
        .alias("bit_bucket")
    )
    c = b.groupBy("bit_bucket").agg(F.count(F.lit(1)).alias("n"))
    t = c.agg(F.sum("n").alias("total"))
    return c.crossJoin(F.broadcast(t)).select(
        "bit_bucket",
        F.col("n").alias("n_gaps"),
        F.expr("CAST(n * 10000 AS BIGINT) div total").alias("share_bp"),
    )


# --------------------------------------------------------- evt_stickiness

STICKY_WINDOWS = (1, 7, 28)  # day / week-ish / month-ish actives


@REG.op(
    "evt_stickiness",
    oracle=f"""
    WITH ed AS (
        SELECT DISTINCT date_trunc('day', ts)::DATE AS d, user_id FROM events
    ), days AS (SELECT DISTINCT d FROM ed),
    w AS (
        SELECT days.d,
               count(DISTINCT CASE WHEN ed.d = days.d
                                   THEN ed.user_id END) AS dau,
               count(DISTINCT CASE WHEN ed.d > days.d - 7
                                   THEN ed.user_id END) AS wau,
               count(DISTINCT ed.user_id) AS mau
        FROM days JOIN ed
          ON ed.d BETWEEN days.d - 27 AND days.d
        GROUP BY 1
    )
    SELECT strftime(d, '%Y-%m-%d') AS day,
           CAST(dau AS BIGINT) AS dau, CAST(wau AS BIGINT) AS wau,
           CAST(mau AS BIGINT) AS mau,
           CAST(dau * 10000 // greatest(mau, 1) AS BIGINT) AS dau_mau_bp,
           CAST(wau * 10000 // greatest(mau, 1) AS BIGINT) AS wau_mau_bp
    FROM w
    """,
)
def evt_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stickiness panel: DAU, trailing-7 WAU, trailing-28 MAU and the
    DAU/MAU + WAU/MAU ratios per observed day — the engagement-depth
    metric every growth team tracks (DAU/MAU near 10000 bp = daily
    habit; near 350 bp = monthly drop-in). Same inverted-window
    formulation as evt_power_users_rolling: each (user, day) explodes
    to the 28 anchor days it supports, ONE shuffle computes all three
    distinct counts as conditional aggregates over the widest window
    — not three separate range joins. Ratios in basis points by floor
    division (all-integer result)."""
    ed = (
        load(spark, sf_dir, "events")
        .select(F.to_date("ts").alias("d"), "user_id")
        .distinct()
    )
    days = ed.select("d").distinct()
    anchors = ed.select(
        "user_id",
        "d",
        F.explode(
            F.expr("sequence(d, date_add(d, 27), interval 1 day)")
        ).alias("anchor"),
    )
    w = (
        anchors.join(
            F.broadcast(days.select(F.col("d").alias("anchor"))),
            "anchor",
            "left_semi",
        )
        .groupBy("anchor")
        .agg(
            F.countDistinct(
                F.when(F.col("d") == F.col("anchor"), F.col("user_id"))
            ).alias("dau"),
            F.countDistinct(
                F.when(
                    F.col("d") > F.date_sub(F.col("anchor"), 7), F.col("user_id")
                )
            ).alias("wau"),
            F.countDistinct("user_id").alias("mau"),
        )
    )
    return w.select(
        F.date_format("anchor", "yyyy-MM-dd").alias("day"),
        "dau",
        "wau",
        "mau",
        F.expr("CAST(dau * 10000 AS BIGINT) div greatest(mau, 1L)").alias(
            "dau_mau_bp"
        ),
        F.expr("CAST(wau * 10000 AS BIGINT) div greatest(mau, 1L)").alias(
            "wau_mau_bp"
        ),
    )


# --------------------------------------------------- evt_conversion_lag

@REG.op(
    "evt_conversion_lag",
    oracle="""
    WITH e AS (
        SELECT user_id, event_type, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s
        FROM events
    ), v AS (
        SELECT user_id, min(ts_s) AS fv FROM e
        WHERE event_type = 'view' GROUP BY 1
    ), p AS (
        SELECT e.user_id, min(ts_s) AS fp
        FROM e JOIN v USING (user_id)
        WHERE event_type = 'purchase' AND ts_s > fv
        GROUP BY 1
    ), lag AS (
        SELECT p.fp - v.fv AS lag_s FROM p JOIN v USING (user_id)
    ), b AS (
        SELECT CASE WHEN lag_s = 0 THEN 0 ELSE length(bin(lag_s)) END AS bucket
        FROM lag
    ), c AS (SELECT bucket, count(*) AS n FROM b GROUP BY 1),
    t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM c)
    SELECT CAST(c.bucket AS INT) AS bit_bucket, CAST(c.n AS BIGINT) AS n_users,
           CAST(c.n * 10000 // t.total AS BIGINT) AS share_bp
    FROM c CROSS JOIN t
    """,
)
def evt_conversion_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution: seconds from a user's first view
    to their first subsequent purchase, in power-of-two buckets — the
    histogram behind evt_funnel's single conversion number (is the
    funnel minutes or days? that decides the attribution window and
    the remarketing cadence). Bit-length bucketing (integer), shares
    in basis points; two conditional min-aggregates on the user key —
    the funnel's plan shape, one extra subtraction."""
    e = load(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.col("ts").cast("timestamp").cast("long").alias("ts_s"),
    )
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts_s").alias("fv"))
    )
    p = (
        e.join(v, "user_id")
        .filter((F.col("event_type") == "purchase") & (F.col("ts_s") > F.col("fv")))
        .groupBy("user_id")
        .agg(F.min("ts_s").alias("fp"))
    )
    lag = p.join(v, "user_id").select((F.col("fp") - F.col("fv")).alias("lag_s"))
    b = lag.select(
        F.when(F.col("lag_s") == 0, 0)
        .otherwise(F.length(F.bin("lag_s")))
        .cast("int")
        .alias("bit_bucket")
    )
    c = b.groupBy("bit_bucket").agg(F.count(F.lit(1)).alias("n"))
    t = c.agg(F.sum("n").alias("total"))
    return c.crossJoin(F.broadcast(t)).select(
        "bit_bucket",
        F.col("n").alias("n_users"),
        F.expr("CAST(n * 10000 AS BIGINT) div total").alias("share_bp"),
    )


# ------------------------------------------------- evt_peak_concurrency

@REG.op(
    "evt_peak_concurrency",
    oracle=f"""
    WITH o AS (
        SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s, event_id
        FROM events
    ), flagged AS (
        SELECT user_id, ts_s, event_id,
               CASE WHEN ts_s - lag(ts_s) OVER (PARTITION BY user_id
                                                ORDER BY ts_s, event_id)
                         > {SESSION_GAP_S}
                    OR lag(ts_s) OVER (PARTITION BY user_id
                                       ORDER BY ts_s, event_id) IS NULL
                    THEN 1 ELSE 0 END AS is_start
        FROM o
    ), sess AS (
        SELECT user_id, session_id, min(ts_s) AS s0, max(ts_s) AS s1
        FROM (SELECT user_id, ts_s, event_id,
                     CAST(sum(is_start) OVER (PARTITION BY user_id
                                              ORDER BY ts_s, event_id)
                          AS BIGINT) AS session_id
              FROM flagged) g
        GROUP BY user_id, session_id
    ), bounds AS (
        SELECT s0 AS t, 1 AS delta, user_id, session_id FROM sess
        UNION ALL
        SELECT s1 + 1, -1, user_id, session_id FROM sess
    ), swept AS (
        SELECT t, delta,
               CAST(sum(delta) OVER (ORDER BY t, delta, user_id, session_id)
                    AS BIGINT) AS concurrency
        FROM bounds
    ), per_day AS (
        SELECT strftime(to_timestamp(t), '%Y-%m-%d') AS day,
               max(concurrency) AS day_max,
               sum(delta) AS day_delta
        FROM swept GROUP BY 1
    )
    SELECT day,
           CAST(greatest(day_max,
                COALESCE(sum(day_delta) OVER (ORDER BY day
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND 1 PRECEDING), 0))
                AS BIGINT) AS peak_concurrent
    FROM per_day
    """,
)
def evt_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent sessions per day — capacity sizing's headline
    number, computed by the classic SWEEP LINE: each session (gap-
    based, the evt_sessionize construction) emits +1 at its start and
    −1 one second after its end; the running sum over the globally
    time-ordered boundary stream IS the concurrency curve. The daily
    peak is max(carried-in level at the day's start, levels at the
    day's own boundaries): concurrency only changes at boundaries,
    but a day whose FIRST boundary is an ending would otherwise
    report the post-decrement level and miss the higher carried-in
    plateau (5 sessions all ending on day D must read peak 5, not
    4). The carried-in level is the running sum of all prior days'
    delta totals — a day-grain window, no second sweep. Days with no
    boundary at all emit no row (their level is the previous day's
    carry-out, constant all day). Ends sort before starts at the
    same second (delta ascending), so back-to-back sessions don't
    double-count.

    Scale: the boundary stream is 2×|sessions| rows — tiny next to
    the event table; the one global-order window serializes it
    through a single task, fine at millions of sessions; beyond that
    the sweep range-partitions by time with per-partition carry-in
    (prefix sums of each partition's deltas — sort_global_shards'
    two-stage pattern)."""
    e = load(spark, sf_dir, "events").select(
        "user_id",
        F.col("ts").cast("timestamp").cast("long").alias("ts_s"),
        "event_id",
    )
    wu = W.partitionBy("user_id").orderBy("ts_s", "event_id")
    flagged = e.withColumn(
        "is_start",
        F.when(
            (F.col("ts_s") - F.lag("ts_s").over(wu) > SESSION_GAP_S)
            | F.lag("ts_s").over(wu).isNull(),
            1,
        ).otherwise(0),
    )
    sess = (
        flagged.withColumn("session_id", F.sum("is_start").over(wu))
        .groupBy("user_id", "session_id")
        .agg(F.min("ts_s").alias("s0"), F.max("ts_s").alias("s1"))
    )
    bounds = sess.select(
        F.col("s0").alias("t"), F.lit(1).alias("delta"), "user_id", "session_id"
    ).unionByName(
        sess.select(
            (F.col("s1") + 1).alias("t"),
            F.lit(-1).alias("delta"),
            "user_id",
            "session_id",
        )
    )
    swept = bounds.select(
        "t",
        "delta",
        F.sum("delta")
        .over(W.orderBy("t", "delta", "user_id", "session_id"))
        .alias("concurrency"),
    )
    per_day = swept.groupBy(
        F.date_format(F.timestamp_seconds("t"), "yyyy-MM-dd").alias("day")
    ).agg(
        F.max("concurrency").alias("day_max"),
        F.sum("delta").alias("day_delta"),
    )
    carried_in = (
        F.sum("day_delta")
        .over(W.orderBy("day").rowsBetween(W.unboundedPreceding, -1))
    )
    return per_day.select(
        "day",
        F.greatest(
            F.col("day_max"), F.coalesce(carried_in, F.lit(0))
        ).alias("peak_concurrent"),
    )


# ---------------------------------------------------------- evt_path_topk

PATH_LEN = 3   # journey n-gram length
PATH_TOPK = 20


@REG.op(
    "evt_path_topk",
    oracle=f"""
    WITH o AS (
        SELECT user_id, event_type,
               CAST(floor(epoch(ts)) AS BIGINT) AS ts_s, event_id
        FROM events
    ), seq AS (
        SELECT event_type AS t0,
               lead(event_type, 1) OVER w AS t1,
               lead(event_type, 2) OVER w AS t2
        FROM o WINDOW w AS (PARTITION BY user_id ORDER BY ts_s, event_id)
    ), paths AS (
        SELECT t0 || '>' || t1 || '>' || t2 AS path, count(*) AS n
        FROM seq WHERE t2 IS NOT NULL GROUP BY 1
    ), t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM paths)
    SELECT path, CAST(n AS BIGINT) AS n,
           CAST(n * 10000 // total AS BIGINT) AS share_bp
    FROM paths, t
    ORDER BY n DESC, path LIMIT {PATH_TOPK}
    """,
)
def evt_path_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{PATH_TOPK} {PATH_LEN}-step user journeys — the path-mining
    panel behind funnel design ("what do users actually do?"): each
    user's event stream, ordered by (epoch second, event_id), yields
    overlapping {PATH_LEN}-grams of event types via lead(); counting
    the grams globally ranks the most-travelled paths, with share in
    integer basis points of ALL paths (not just the survivors).
    Deterministic top-k: ties break on the path string, and paths are
    unique group keys, so both engines elect the same {PATH_TOPK}
    rows.

    Scale: one user_id shuffle for the lead window (no self-joins —
    the naive 3-way event join is quadratic in per-user activity),
    one aggregate to the ≤ |types|^{PATH_LEN} path grain, and the
    top-k is a TakeOrderedAndProject (per-partition heaps, never a
    global sort); the grand total joins back as a broadcast scalar."""
    o = load(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.col("ts").cast("timestamp").cast("long").alias("ts_s"),
        "event_id",
    )
    w = W.partitionBy("user_id").orderBy("ts_s", "event_id")
    seq = o.select(
        F.col("event_type").alias("t0"),
        F.lead("event_type", 1).over(w).alias("t1"),
        F.lead("event_type", 2).over(w).alias("t2"),
    )
    paths = (
        seq.where(F.col("t2").isNotNull())
        .groupBy(F.concat_ws(">", "t0", "t1", "t2").alias("path"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    total = paths.agg(F.sum("n").alias("total"))
    return (
        paths.crossJoin(F.broadcast(total))
        .select(
            "path",
            "n",
            F.expr("CAST(n * 10000 AS BIGINT) div total").alias("share_bp"),
        )
        .orderBy(F.desc("n"), "path")
        .limit(PATH_TOPK)
    )


# ------------------------------------------------------------ evt_ab_lift

AB_SALT = "exp42:"  # experiment namespace — a new salt is a fresh split


@REG.op(
    "evt_ab_lift",
    oracle=f"""
    WITH assign AS (
        SELECT DISTINCT user_id,
               CASE WHEN substr(md5('{AB_SALT}' || CAST(user_id AS VARCHAR)),
                                1, 1) < '8'
                    THEN 'A' ELSE 'B' END AS arm
        FROM events
    ), conv AS (
        SELECT user_id,
               count(*) AS n_purchases,
               round(sum(value), 2) AS revenue
        FROM events WHERE event_type = 'purchase' GROUP BY 1
    )
    SELECT a.arm,
           count(*) AS n_users,
           CAST(count(c.user_id) AS BIGINT) AS n_converters,
           CAST(count(c.user_id) * 10000 // count(*) AS BIGINT) AS conv_bp,
           CAST(coalesce(sum(c.n_purchases), 0) AS BIGINT) AS n_purchases,
           round(coalesce(sum(c.revenue), 0), 2) AS revenue
    FROM assign a LEFT JOIN conv c ON c.user_id = a.user_id
    GROUP BY 1
    """,
)
def evt_ab_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout over a HASH-ASSIGNED split: the arm is a
    salted-md5 digit of user_id (the standard deterministic bucketing
    — no assignment table to store, no RNG state to replicate, and a
    new salt is an independent re-randomization), and the panel reads
    per-arm exposure, converter count, conversion rate in integer
    basis points, purchase volume, and revenue. Per-user revenue is
    rounded BEFORE the arm rollup so both engines fold identical
    2-decimal values in any order.

    Scale: assignment is an expression on the fact stream — no join
    against an assignment store; one distinct per grain and a
    broadcast-sized 2-row result. The same salted-digit split is how
    a 100 TB events table runs hundreds of concurrent experiments
    without any shared state but the salt registry."""
    e = load(spark, sf_dir, "events")
    assign = e.select(
        "user_id",
        F.when(
            F.substring(
                F.md5(F.concat(F.lit(AB_SALT), F.col("user_id").cast("string"))),
                1,
                1,
            )
            < "8",
            "A",
        )
        .otherwise("B")
        .alias("arm"),
    ).distinct()
    conv = (
        e.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.round(F.sum("value"), 2).alias("revenue"),
        )
    )
    return (
        assign.join(conv, "user_id", "left")
        .groupBy("arm")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.count("n_purchases").alias("n_converters"),
            F.expr(
                "CAST(count(n_purchases) * 10000 AS BIGINT) div count(*)"
            ).alias("conv_bp"),
            F.coalesce(F.sum("n_purchases"), F.lit(0)).alias("n_purchases"),
            F.round(F.coalesce(F.sum("revenue"), F.lit(0.0)), 2).alias(
                "revenue"
            ),
        )
    )


# ------------------------------------------------------ evt_alert_throttle

THROTTLE_COOLDOWN_S = 6 * 3600  # suppress repeat alerts within 6 h


@REG.op(
    "evt_alert_throttle",
    oracle=f"""
    WITH RECURSIVE a AS (
        SELECT user_id, event_id,
               CAST(floor(epoch(ts)) AS BIGINT) AS ts_s
        FROM events WHERE event_type = 'error'
    ), k AS (
        SELECT user_id,
               min_by(event_id, ts_s * 10000000 + event_id) AS event_id,
               min(ts_s) AS ts_s
        FROM a GROUP BY user_id
        UNION ALL
        SELECT a.user_id,
               min_by(a.event_id, a.ts_s * 10000000 + a.event_id) AS event_id,
               min(a.ts_s) AS ts_s
        FROM k JOIN a ON a.user_id = k.user_id
                     AND a.ts_s >= k.ts_s + {THROTTLE_COOLDOWN_S}
        GROUP BY a.user_id
    )
    SELECT user_id, event_id, ts_s FROM k
    """,
)
def evt_alert_throttle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GREEDY alert throttling (alert-fatigue suppression): per user,
    the first error fires an alert and every later error within
    {THROTTLE_COOLDOWN_S}s of the LAST FIRED alert is suppressed —
    the pager-dedup rule every ops pipeline needs. This is the
    canonical NOT-window-expressible fold: whether an event fires
    depends on which earlier events fired (the anchor moves), so no
    lag/session_window reformulation exists — evt_sessionize's gap
    rule looks similar but anchors on the previous EVENT, this
    anchors on the previous KEPT event.

    Spark side: one sorted per-user array fold (collect_list →
    sort_array → F.aggregate carrying (last_fired, kept[]) — pure
    JVM, no Python, state bounded by per-user alert count exactly
    like the sessionizers). Oracle side: a recursive CTE whose each
    level elects the next fired alert per user via min_by over the
    post-cooldown tail — an ORACLE-CHECKED sequential fold, the
    dedup_cluster_cc treatment applied to throttling.

    Scale: one user_id shuffle; per-user state is the alert list (the
    same bound sessionize carries). The streaming form is
    applyInPandasWithState with (last_fired) as the state row —
    noted, not duplicated."""
    a = (
        load(spark, sf_dir, "events")
        .where(F.col("event_type") == "error")
        .select(
            "user_id",
            F.col("ts").cast("timestamp").cast("long").alias("ts_s"),
            "event_id",
        )
    )
    per_user = a.groupBy("user_id").agg(
        F.sort_array(
            F.collect_list(F.struct("ts_s", "event_id"))
        ).alias("evs")
    )
    acc0 = F.struct(
        F.lit(-(10**15)).cast("long").alias("last"),
        F.array().cast(
            "array<struct<ts_s:bigint,event_id:bigint>>"
        ).alias("kept"),
    )
    kept = per_user.select(
        "user_id",
        F.aggregate(
            "evs",
            acc0,
            lambda acc, e: F.when(
                e["ts_s"] >= acc["last"] + THROTTLE_COOLDOWN_S,
                F.struct(
                    e["ts_s"].alias("last"),
                    F.concat(acc["kept"], F.array(e)).alias("kept"),
                ),
            ).otherwise(acc),
            lambda acc: acc["kept"],
        ).alias("kept"),
    )
    return kept.select(
        "user_id", F.explode("kept").alias("e")
    ).select(
        "user_id",
        F.col("e.event_id").alias("event_id"),
        F.col("e.ts_s").alias("ts_s"),
    )
