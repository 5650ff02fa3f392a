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

EVENTS_SCHEMA_NANOS = (
    "event_id bigint, ts bigint, user_id bigint, event_type string, "
    "value double, props string"
)
EVENTS_SCHEMA_MICROS = (
    "event_id bigint, ts timestamp_ntz, user_id bigint, event_type string, "
    "value double, props string"
)


_SUPPORTED_TS_UNITS = ("ns", "us")


def _events_ts_unit(events_dir: str, assume_unit: str | None = None) -> str:
    """Physical unit of the ts column in the staged parquet files.
    File streams need an explicit schema, and declaring `ts bigint`
    over a TIMESTAMP(MICROS) column silently coerces micros-to-long —
    a ×1000 time compression that collapses every session gap and
    watermark horizon. Inspect the footer instead of assuming:

    * TIMESTAMP-annotated columns carry their unit in the logical
      type — read it, and refuse units outside {ns, us} (an ms or s
      file silently routed down the micros branch would be off by
      ×1000 / ×10⁶);
    * raw int64 columns (no logical annotation) have NO unit in the
      footer — classify by the column-chunk min statistic's magnitude
      (epoch-nanos for any plausible event date is ~1e18, epoch-micros
      ~1e15: six orders apart, no overlap), and refuse when the file
      carries no statistics rather than guess;
    * an EMPTY dir has nothing to inspect: refuse unless the caller
      states the expected unit via ``assume_unit`` (a stream may
      legitimately start before its first file arrives, but which
      generation will write those files is the caller's knowledge,
      not a safe default).

    A mixed-generation dir (both units present) always refuses: one
    explicit schema reads the whole dir, so some files would go
    through the wrong unit — silent corruption."""
    import glob

    import pyarrow as pa
    import pyarrow.parquet as pq

    if assume_unit is not None and assume_unit not in _SUPPORTED_TS_UNITS:
        raise ValueError(
            f"assume_unit={assume_unit!r} unsupported (expected one of "
            f"{_SUPPORTED_TS_UNITS})"
        )

    def unit_of(f: str) -> str:
        t = pq.read_schema(f).field("ts").type
        if pa.types.is_timestamp(t):
            if t.unit not in _SUPPORTED_TS_UNITS:
                raise ValueError(
                    f"ts unit {t.unit!r} in {f} unsupported (expected one of "
                    f"{_SUPPORTED_TS_UNITS})"
                )
            return t.unit
        if pa.types.is_integer(t):
            # unannotated epoch-long: the footer stats give the scale
            meta = pq.ParquetFile(f).metadata
            rg0 = meta.row_group(0)
            idx = next(
                i for i in range(rg0.num_columns)
                if rg0.column(i).path_in_schema == "ts"
            )
            stats = rg0.column(idx).statistics
            if stats is None or stats.min is None:
                raise ValueError(
                    f"raw int64 ts in {f} has no column statistics — "
                    "cannot classify its epoch unit"
                )
            lo = int(stats.min)
            if lo >= 10**17:  # epoch-nanos ≥ ~1973; micros would be year 5138+
                return "ns"
            if lo >= 10**14:  # epoch-micros ≥ ~1973
                return "us"
            raise ValueError(
                f"raw int64 ts in {f} (min={lo}) is neither epoch-nanos nor "
                "epoch-micros scale — refusing to guess"
            )
        raise ValueError(f"ts column in {f} is {t} — not a timestamp or int64")

    files = sorted(glob.glob(f"{events_dir}/*.parquet"))
    if not files:
        if assume_unit is not None:
            return assume_unit
        raise ValueError(
            f"no parquet files in {events_dir} to sniff the ts unit from; "
            "pass assume_unit='ns'|'us' to start a stream against a "
            "not-yet-populated dir"
        )
    units = {unit_of(f) for f in files}
    if len(units) > 1:
        raise ValueError(
            f"mixed ts units {sorted(units)} across files in {events_dir}"
        )
    return units.pop()


def read_events_stream(
    spark: SparkSession,
    events_dir: str,
    max_files_per_trigger: int | None = None,
    assume_unit: str | None = None,
) -> DataFrame:
    """File-source stream over events parquet, robust to the ts
    column's physical unit: TIMESTAMP(NANOS) files (older generators)
    are read nanos-as-long (session conf nanosAsLong) and converted by
    integer division, exactly like the batch loader
    (tables._load_events); TIMESTAMP(MICROS) files are read as native
    timestamp_ntz. Both paths end in TIMESTAMP (not NTZ): the session
    runs UTC so values align with the batch path, and event-time
    watermarks apply.

    ``assume_unit`` ('ns'|'us') is required only when ``events_dir``
    is still empty at stream start (nothing to sniff); a populated dir
    is always footer-sniffed and a conflicting assumption is ignored
    in favor of the actual files.

    ``max_files_per_trigger`` bounds each micro-batch to N files
    (honored by availableNow since Spark 3.3), so a multi-file stage
    dir replays as a SEQUENCE of batches with the watermark advancing
    between them — the shape a real bus delivers, and the test knob
    that catches any single-batch assumption in stateful ops."""
    reader = spark.readStream
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    if _events_ts_unit(events_dir, assume_unit) == "ns":
        raw = reader.schema(EVENTS_SCHEMA_NANOS).parquet(events_dir)
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    raw = reader.schema(EVENTS_SCHEMA_MICROS).parquet(events_dir)
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))


def tumbling_counts(events: DataFrame, watermark: str = "1 day") -> DataFrame:
    """Watermarked 1-hour tumbling counts per event type — textually
    the same aggregation as operators/events.evt_tumbling; works on
    both batch and streaming frames (watermark applies on streams)."""
    if events.isStreaming:
        events = events.withWatermark("ts", watermark)
    # group on the FULL window struct (not .getField("start")): append
    # mode only recognizes the aggregation as watermarked when the
    # grouping key is the event-time window column itself
    return (
        events.groupBy("event_type", F.window("ts", "1 hour").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            "event_type",
            F.date_format(F.col("w").getField("start"), "yyyy-MM-dd HH:00").alias(
                "window_start"
            ),
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


# ------------------------------------------- stateful sessionization

SESSION_GAP_S = 1800  # 30-minute silence closes a session (events.py)

_SESSION_OUT_SCHEMA = (
    "user_id bigint, session_start bigint, n_events bigint, duration_s bigint"
)
_SESSION_STATE_SCHEMA = "start bigint, last bigint, cnt bigint"


def sessionize_stateful(events: DataFrame, gap_s: int = SESSION_GAP_S) -> DataFrame:
    """Gap-based sessionization as a CUSTOM STATEFUL streaming operator
    (applyInPandasWithState) — the streaming twin of the batch
    evt_sessionize (operators/events.py): per-user state carries the
    open session (start, last-seen, count); a row arriving more than
    ``gap_s`` after last-seen CLOSES the open session (emitted in
    append mode) and starts a new one. The still-open session stays in
    state, so the emitted rows are exactly the batch sessionization
    minus each user's final (unclosed) session — asserted in
    tests/test_streaming.py.

    Scale shape: state is one 3-long tuple per active user, shuffled by
    user_id — bounded by |users|, independent of event volume; Arrow
    moves micro-batch slices, never the history. Within a micro-batch
    rows sort by (ts, event_id); across batches the file source
    delivers in file order (a message-bus deployment would rely on
    per-key ordering or reorder inside the watermark)."""
    import pandas as pd  # noqa: PLC0415 — worker-side import

    def fn(key, pdf_iter, state):
        (user_id,) = key
        if state.exists:
            start, last, cnt = state.get
        else:
            start, last, cnt = None, None, 0
        closed: list[tuple] = []
        for pdf in pdf_iter:
            pdf = pdf.sort_values(["ts_s", "event_id"])
            for ts in pdf["ts_s"].tolist():
                if start is None:
                    start, last, cnt = ts, ts, 1
                elif ts - last > gap_s:
                    closed.append((user_id, start, cnt, last - start))
                    start, last, cnt = ts, ts, 1
                else:
                    last, cnt = ts, cnt + 1
        if start is not None:
            state.update((int(start), int(last), int(cnt)))
        if closed:
            yield pd.DataFrame(
                closed,
                columns=["user_id", "session_start", "n_events", "duration_s"],
            )

    from pyspark.sql.streaming.state import GroupStateTimeout

    prepared = events.select(
        "user_id",
        F.col("ts").cast("long").alias("ts_s"),
        "event_id",
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        fn,
        _SESSION_OUT_SCHEMA,
        _SESSION_STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )


def run_append_available_now(result: DataFrame, table_name: str, checkpoint: str) -> None:
    """Drain an append-mode stateful stream into a memory sink.
    Stateful ops require a checkpoint location (state store)."""
    q = (
        result.writeStream.format("memory")
        .queryName(table_name)
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


# ------------------------------------------- streaming exact dedup

def dedup_within_watermark(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming exact deduplication by event_id with bounded state:
    `dropDuplicatesWithinWatermark` keeps a key's fingerprint only
    until the watermark passes its event time plus the delay, so state
    is bounded by the duplicate-arrival horizon — the streaming twin of
    the batch dedup family (SURVEY §2.3) for an at-least-once bus that
    can redeliver within a known window. On a batch frame the same
    call degrades to plain dropDuplicates (no watermark semantics), so
    one function serves both the oracle-checked batch twin and the
    stream."""
    if events.isStreaming:
        deduped = events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
            ["event_id"]
        )
    else:
        deduped = events.dropDuplicates(["event_id"])
    return deduped.select(
        "event_id",
        "user_id",
        "event_type",
        F.col("ts").cast("long").alias("ts_s"),
        "value",
    )


# --------------------------------- stream-stream interval (attribution) join

ATTRIB_WINDOW_S = 3600  # purchase attributed to a view within 1 hour


def attribution_join(
    events: DataFrame,
    watermark: str = "2 hours",
    window_s: int = ATTRIB_WINDOW_S,
    how: str = "inner",
) -> DataFrame:
    """Stream-stream INTERVAL self-join: attribute every purchase to
    each view by the same user in the preceding ``window_s`` seconds.
    Both branches carry an event-time watermark and the join condition
    bounds purchase time on both sides of view time, which is exactly
    what Structured Streaming needs to bound join state: a view's row
    can be dropped from state once the watermark passes
    ``view.ts + window_s``, a purchase's once the watermark passes its
    own event time — state is O(events inside the watermark horizon),
    independent of stream length. Inner-join matches are emitted as
    soon as both rows have arrived (no finalization delay), so the
    availableNow drain over a staged file equals the batch interval
    join row-for-row.

    On a batch frame the same plan is an ordinary range join (the
    watermark call is skipped); one function serves stream and oracle
    twin. Scale shape: one exchange hash-partitions both branches by
    user_id; the per-key interval probe never turns cartesian."""
    # normalize: the batch loader yields TIMESTAMP_NTZ (which refuses a
    # direct cast to long); the session runs UTC so the cast is lossless
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    if events.isStreaming:
        events = events.withWatermark("ts", watermark)
    views = events.where(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("v_ts"),
    )
    purchases = events.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
    )
    cond = (
        (F.col("v_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("v_ts"))
        & (F.col("p_ts") <= F.col("v_ts") + F.expr(f"INTERVAL {window_s} SECONDS"))
    )
    # how="left_outer": a view with NO purchase in its window emits a
    # null-purchase row — but in a STREAM only once the (global)
    # watermark passes v_ts + window_s, the point where the engine can
    # prove no future purchase can still match and evicts the view
    # from join state. Views whose window is still open when the
    # stream ends are never emitted (state discarded, not finalized) —
    # the oracle twin reproduces that boundary from max(ts) and the
    # watermark delay.
    return views.join(purchases, cond, how).select(
        F.col("v_user").alias("user_id"),
        "view_id",
        "purchase_id",
        (F.col("p_ts").cast("long") - F.col("v_ts").cast("long"))
        .cast("bigint")
        .alias("secs_to_purchase"),
    )
