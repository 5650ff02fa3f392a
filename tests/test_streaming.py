"""Stream-batch equivalence: the watermarked streaming aggregation
must produce exactly the rows the batch expression produces over the
same files — Structured Streaming's core contract."""

from __future__ import annotations

import shutil
import tempfile
from pathlib import Path

from claim_analysis_engine_spark import streaming
from claim_analysis_engine_spark.operators.events import evt_tumbling
from tests.conftest import SF_SMALL


def test_stream_equals_batch(spark):
    # the file stream source consumes a DIRECTORY of arriving files —
    # stage the events file into one (the real ingestion layout)
    stage = Path(tempfile.mkdtemp(prefix="cae_events_stream_"))
    shutil.copy(f"{SF_SMALL}/events.parquet", stage / "part-000.parquet")
    stream = streaming.read_events_stream(spark, str(stage))
    assert stream.isStreaming
    result = streaming.tumbling_counts(stream)
    streaming.run_available_now(result, "evt_stream_test")

    got = {
        (r.event_type, r.window_start): (r.n_events, r.total_value)
        for r in spark.sql("SELECT * FROM evt_stream_test").collect()
    }
    want = {
        (r.event_type, r.window_start): (r.n_events, r.total_value)
        for r in evt_tumbling(spark, SF_SMALL).collect()
    }
    assert got == want
    assert len(want) > 0


def test_stateful_sessionize_equals_batch_minus_open_sessions(spark):
    """The applyInPandasWithState sessionizer must emit exactly the
    batch sessionization's CLOSED sessions — i.e. every session except
    each user's final one, which stays open in state."""
    stage = Path(tempfile.mkdtemp(prefix="cae_events_state_"))
    shutil.copy(f"{SF_SMALL}/events.parquet", stage / "part-000.parquet")
    ckpt = tempfile.mkdtemp(prefix="cae_events_ckpt_")

    stream = streaming.read_events_stream(spark, str(stage))
    result = streaming.sessionize_stateful(stream)
    streaming.run_append_available_now(result, "evt_sessions_state", ckpt)
    got = {
        (r.user_id, r.session_start, r.n_events, r.duration_s)
        for r in spark.sql("SELECT * FROM evt_sessions_state").collect()
    }

    # batch truth: same gap logic, with each session's start month and
    # the per-user LAST session (open in the stream) removed
    from claim_analysis_engine_spark.tables import load

    load(spark, SF_SMALL, "events").createOrReplaceTempView("_evt_batch")
    want = {
        (r.user_id, r.session_start, r.n_events, r.duration_s)
        for r in spark.sql(
            f"""
            WITH ordered AS (
              SELECT user_id,
                     CAST(CAST(ts AS TIMESTAMP) AS LONG) AS ts_s, event_id
              FROM _evt_batch
            ),
            flagged AS (
              SELECT *, CASE WHEN ts_s - lag(ts_s) OVER w > {streaming.SESSION_GAP_S}
                               OR lag(ts_s) OVER w IS NULL
                             THEN 1 ELSE 0 END AS is_start
              FROM ordered
              WINDOW w AS (PARTITION BY user_id ORDER BY ts_s, event_id)
            ),
            sess AS (
              SELECT *, sum(is_start) OVER (PARTITION BY user_id
                                            ORDER BY ts_s, event_id) AS sid
              FROM flagged
            ),
            agg AS (
              SELECT user_id, sid, min(ts_s) AS session_start,
                     count(*) AS n_events, max(ts_s) - min(ts_s) AS duration_s,
                     max(sid) OVER (PARTITION BY user_id) AS last_sid
              FROM sess GROUP BY user_id, sid
            )
            SELECT user_id, session_start, n_events, duration_s
            FROM agg WHERE sid < last_sid
            """
        ).collect()
    }
    assert len(got) > 0
    assert got == want


def test_watermark_drops_late_events_across_restarts(spark):
    """Late-data contract: after the watermark passes a window's end,
    the window is finalized (append-emitted exactly once) and a
    late-arriving event for it is DROPPED — state carries across
    restarts via the checkpoint. Built on synthetic two-batch arrivals:
    batch 1 fixes the watermark, batch 2 delivers one late + one fresh
    event."""
    import datetime as dt

    def nanos(h, m):
        t = dt.datetime(2024, 1, 1, h, m, tzinfo=dt.timezone.utc)
        return int(t.timestamp()) * 1_000_000_000

    stage = Path(tempfile.mkdtemp(prefix="cae_late_stream_"))
    ckpt = tempfile.mkdtemp(prefix="cae_late_ckpt_")
    out = tempfile.mkdtemp(prefix="cae_late_out_")
    schema = streaming.EVENTS_SCHEMA_NANOS

    batch1 = spark.createDataFrame(
        [
            (1, nanos(10, 0), 1, "click", 1.0, "{}"),
            (2, nanos(10, 30), 1, "click", 1.0, "{}"),
            (3, nanos(13, 0), 2, "click", 1.0, "{}"),  # watermark -> 12:00
        ],
        schema,
    )
    batch1.coalesce(1).write.mode("overwrite").parquet(str(stage / "b1"))

    def run_once():
        # file sink (not memory): append-mode output that RECOVERS from
        # the checkpoint across restarts — each finalized window lands
        # in the output exactly once
        stream = streaming.read_events_stream(spark, str(stage / "*"))
        result = streaming.tumbling_counts(stream, watermark="1 hour")
        q = (
            result.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        rows = spark.read.parquet(out).collect()
        got = {}
        for r in rows:
            assert r.window_start not in got, "window emitted twice"
            got[r.window_start] = r.n_events
        return got

    got1 = run_once()
    # watermark 12:00 finalized the 10:00 window (2 events); 13:00 open
    assert got1 == {"2024-01-01 10:00": 2}

    batch2 = spark.createDataFrame(
        [
            (4, nanos(10, 15), 1, "click", 1.0, "{}"),  # LATE: < watermark
            (5, nanos(15, 30), 2, "click", 1.0, "{}"),  # fresh: wm -> 14:30, past the 13:00 window's end
        ],
        schema,
    )
    batch2.coalesce(1).write.mode("overwrite").parquet(str(stage / "b2"))

    got2 = run_once()
    # the late 10:15 event is dropped (its window stays at batch-1's
    # count and appears exactly once); the fresh event closes the 13:00
    # window with the count from batch 1 only
    assert got2 == {"2024-01-01 10:00": 2, "2024-01-01 13:00": 1}


def test_dedup_within_watermark_across_restarts(spark):
    """A duplicate event_id redelivered in a LATER micro-batch (within
    the watermark horizon) must not re-emit — the dedup state carries
    across restarts via the checkpoint; fresh events still flow."""
    import datetime as dt

    def nanos(h, m):
        t = dt.datetime(2024, 1, 1, h, m, tzinfo=dt.timezone.utc)
        return int(t.timestamp()) * 1_000_000_000

    stage = Path(tempfile.mkdtemp(prefix="cae_dedup_stream_"))
    ckpt = tempfile.mkdtemp(prefix="cae_dedup_ckpt_")
    out = tempfile.mkdtemp(prefix="cae_dedup_out_")
    schema = streaming.EVENTS_SCHEMA_NANOS

    def run_once():
        stream = streaming.read_events_stream(spark, str(stage / "*"))
        result = streaming.dedup_within_watermark(stream, watermark="2 hours")
        q = (
            result.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return sorted(
            (r.event_id, r.ts_s) for r in spark.read.parquet(out).collect()
        )

    b1 = spark.createDataFrame(
        [
            (1, nanos(10, 0), 1, "click", 1.0, "{}"),
            (1, nanos(10, 0), 1, "click", 1.0, "{}"),  # same-batch duplicate
            (2, nanos(10, 30), 1, "view", 1.0, "{}"),
        ],
        schema,
    )
    b1.coalesce(1).write.mode("overwrite").parquet(str(stage / "b1"))
    assert run_once() == [(1, nanos(10, 0) // 10**9), (2, nanos(10, 30) // 10**9)]

    b2 = spark.createDataFrame(
        [
            (1, nanos(10, 0), 1, "click", 1.0, "{}"),  # redelivery, in horizon
            (3, nanos(11, 0), 2, "click", 1.0, "{}"),  # fresh
        ],
        schema,
    )
    b2.coalesce(1).write.mode("overwrite").parquet(str(stage / "b2"))
    assert run_once() == [
        (1, nanos(10, 0) // 10**9),
        (2, nanos(10, 30) // 10**9),
        (3, nanos(11, 0) // 10**9),
    ]


def test_append_finalization_across_many_microbatches(spark):
    """Multi-batch realism: the events file split into 6 contiguous
    time ranges, replayed one file per micro-batch (maxFilesPerTrigger
    honored under availableNow), must append-finalize EXACTLY the same
    tumbling windows as the single-batch run — i.e. every hourly window
    whose end precedes the final watermark (max ts − 1 h). Catches any
    single-batch assumption in watermark handling: with contiguous
    time-ordered files nothing is droppable as late, so a count
    mismatch means state or watermark mishandling across batches."""
    import time

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from claim_analysis_engine_spark.tables import load

    events = load(spark, SF_SMALL, "events")
    stage = Path(tempfile.mkdtemp(prefix="cae_events_multibatch_"))
    n_files = 6
    bucket = F.ntile(n_files).over(Window.orderBy("ts", "event_id"))
    ranked = events.withColumn("b", bucket).cache()
    for i in range(1, n_files + 1):
        (
            ranked.where(F.col("b") == i)
            .drop("b")
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(str(stage / f"b{i:02d}"))
        )
        time.sleep(0.05)  # distinct mtimes: files arrive oldest-first

    out = tempfile.mkdtemp(prefix="cae_multibatch_out_")
    ckpt = tempfile.mkdtemp(prefix="cae_multibatch_ckpt_")
    stream = streaming.read_events_stream(
        spark, str(stage / "*"), max_files_per_trigger=1
    )
    result = streaming.tumbling_counts(stream, watermark="1 hour")
    q = (
        result.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # multiple batches actually ran (the knob worked)
    assert q.lastProgress["batchId"] >= n_files - 1

    got = {
        (r.event_type, r.window_start): (r.n_events, r.total_value)
        for r in spark.read.parquet(out).collect()
    }
    events.createOrReplaceTempView("_evt_mb_batch")
    want = {
        (r.event_type, r.window_start): (r.n_events, r.total_value)
        for r in spark.sql(
            """
            WITH wm AS (
              SELECT max(ts) - INTERVAL 1 HOUR AS horizon FROM _evt_mb_batch
            )
            SELECT event_type,
                   date_format(date_trunc('hour', ts), 'yyyy-MM-dd HH:00')
                     AS window_start,
                   count(*) AS n_events,
                   round(sum(value), 4) AS total_value
            FROM _evt_mb_batch, wm
            GROUP BY event_type, date_trunc('hour', ts), horizon
            HAVING date_trunc('hour', min(ts)) + INTERVAL 1 HOUR <= horizon
            """
        ).collect()
    }
    assert len(want) > 0
    assert got == want


def test_restart_recovery_resumes_not_reprocesses(spark):
    """The checkpoint-restart gate's mechanics, pinned beyond the
    oracle compare: leg 1 must really commit its prefix as multiple
    micro-batches and stop with a non-empty (strictly partial) sink;
    leg 2's batch ids must CONTINUE from the checkpoint (a fresh query
    object resuming, not restarting at 0); and the accumulated sink
    must equal the single-run truth with no window emitted twice —
    the exactly-once-across-restart claim with the already-consumed
    files still present in the listing as redelivery bait."""
    import os

    import pyarrow.parquet as pq

    from claim_analysis_engine_spark.operators import streaming_gate as sg

    stage = Path(tempfile.mkdtemp(prefix="cae_restart_stage_"))
    pending = Path(tempfile.mkdtemp(prefix="cae_restart_pending_"))
    table = pq.read_table(f"{SF_SMALL}/events.parquet").sort_by(
        [("ts", "ascending")]
    )
    per = -(-table.num_rows // sg.RESTART_SPLIT)
    for i in range(sg.RESTART_SPLIT):
        dest = stage if i < sg.RESTART_PREFIX else pending
        pq.write_table(
            table.slice(i * per, per), str(dest / f"part-{i:03d}.parquet")
        )
    out = tempfile.mkdtemp(prefix="cae_restart_out_")
    ckpt = tempfile.mkdtemp(prefix="cae_restart_ckpt_")

    def run() -> int:
        stream = streaming.read_events_stream(
            spark, str(stage), max_files_per_trigger=1
        )
        result = streaming.tumbling_counts(stream, watermark="1 hour")
        q = (
            result.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return q.lastProgress["batchId"]

    last1 = run()
    assert last1 >= sg.RESTART_PREFIX - 1, "prefix did not run multi-batch"
    rows1 = spark.read.parquet(out).count()
    assert rows1 > 0, "pre-restart leg finalized nothing — vacuous restart"

    for f in sorted(pending.glob("*.parquet")):
        os.rename(f, stage / f.name)
    last2 = run()
    assert last2 > last1, "batch ids reset — leg 2 did not resume the checkpoint"

    final = spark.read.parquet(out)
    n = final.count()
    assert n > rows1, "restarted leg emitted nothing new"
    assert (
        final.select("event_type", "window_start").distinct().count() == n
    ), "a window was emitted twice across the restart"

    from claim_analysis_engine_spark.tables import load

    load(spark, SF_SMALL, "events").createOrReplaceTempView("_evt_restart_batch")
    want = {
        (r.event_type, r.window_start): (r.n_events, r.total_value)
        for r in spark.sql(
            """
            WITH wm AS (
              SELECT max(ts) - INTERVAL 1 HOUR AS horizon
              FROM _evt_restart_batch
            )
            SELECT event_type,
                   date_format(date_trunc('hour', ts), 'yyyy-MM-dd HH:00')
                     AS window_start,
                   count(*) AS n_events,
                   round(sum(value), 4) AS total_value
            FROM _evt_restart_batch, wm
            GROUP BY event_type, date_trunc('hour', ts), horizon
            HAVING date_trunc('hour', min(ts)) + INTERVAL 1 HOUR <= horizon
            """
        ).collect()
    }
    got = {
        (r.event_type, r.window_start): (r.n_events, r.total_value)
        for r in final.collect()
    }
    assert len(want) > 0
    assert got == want


# ---------------------------------------------------- ts-unit matrix

def _write_ts_file(path: Path, unit: str, annotated: bool = True) -> None:
    """One-row events-shaped parquet whose ts column is either a
    TIMESTAMP(unit) logical type or a raw unannotated int64 at that
    unit's epoch scale."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    epoch_s = 1_700_000_000  # 2023-11-14, a plausible event time
    per_s = {"s": 1, "ms": 10**3, "us": 10**6, "ns": 10**9}
    val = epoch_s * per_s[unit]
    ts = pa.array([val], type=pa.timestamp(unit) if annotated else pa.int64())
    t = pa.table({
        "event_id": pa.array([1], pa.int64()),
        "ts": ts,
        "user_id": pa.array([1], pa.int64()),
        "event_type": pa.array(["view"], pa.string()),
        "value": pa.array([1.0], pa.float64()),
        "props": pa.array(["{}"], pa.string()),
    })
    pq.write_table(t, path)


def test_ts_unit_sniffing_matrix(tmp_path):
    """The footer sniffer must classify every generation the testdata
    driver has produced (TIMESTAMP(NANOS), TIMESTAMP(MICROS), raw
    int64 at either scale), refuse mixed dirs and unsupported units,
    and refuse an empty dir unless the caller states the unit."""
    import pytest

    from claim_analysis_engine_spark.streaming import _events_ts_unit

    nanos = tmp_path / "nanos"; nanos.mkdir()
    _write_ts_file(nanos / "a.parquet", "ns")
    assert _events_ts_unit(str(nanos)) == "ns"

    micros = tmp_path / "micros"; micros.mkdir()
    _write_ts_file(micros / "a.parquet", "us")
    assert _events_ts_unit(str(micros)) == "us"

    raw_ns = tmp_path / "raw_ns"; raw_ns.mkdir()
    _write_ts_file(raw_ns / "a.parquet", "ns", annotated=False)
    assert _events_ts_unit(str(raw_ns)) == "ns"

    raw_us = tmp_path / "raw_us"; raw_us.mkdir()
    _write_ts_file(raw_us / "a.parquet", "us", annotated=False)
    assert _events_ts_unit(str(raw_us)) == "us"

    mixed = tmp_path / "mixed"; mixed.mkdir()
    _write_ts_file(mixed / "a.parquet", "ns")
    _write_ts_file(mixed / "b.parquet", "us")
    with pytest.raises(ValueError, match="mixed ts units"):
        _events_ts_unit(str(mixed))

    millis = tmp_path / "millis"; millis.mkdir()
    _write_ts_file(millis / "a.parquet", "ms")
    with pytest.raises(ValueError, match="unsupported"):
        _events_ts_unit(str(millis))

    empty = tmp_path / "empty"; empty.mkdir()
    with pytest.raises(ValueError, match="no parquet files"):
        _events_ts_unit(str(empty))
    # a not-yet-populated dir is usable when the caller KNOWS the unit
    assert _events_ts_unit(str(empty), assume_unit="us") == "us"
    with pytest.raises(ValueError, match="assume_unit"):
        _events_ts_unit(str(empty), assume_unit="ms")
    # a populated dir overrides a (stale) assumption — files win
    assert _events_ts_unit(str(nanos), assume_unit="us") == "ns"


# ------------------------------------- stream-stream attribution join

def test_attribution_join_multibatch_equals_batch(spark):
    """Stream-stream interval join replayed one file per micro-batch
    (time-contiguous split, watermark advancing between batches) must
    emit EXACTLY the batch interval join. Cross-batch matches are the
    point: a view arriving in batch k must still be in join state when
    its purchase arrives in batch k+1 — with a 2 h watermark delay and
    a 1 h join window no view eligible for a future match is ever
    evicted early, so any missing pair means premature state cleanup
    and any extra pair means duplicate emission across batches."""
    import time

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from claim_analysis_engine_spark.tables import load

    events = load(spark, SF_SMALL, "events")
    stage = Path(tempfile.mkdtemp(prefix="cae_attrib_multibatch_"))
    n_files = 6
    bucket = F.ntile(n_files).over(Window.orderBy("ts", "event_id"))
    ranked = events.withColumn("b", bucket).cache()
    for i in range(1, n_files + 1):
        (
            ranked.where(F.col("b") == i)
            .drop("b")
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(str(stage / f"b{i:02d}"))
        )
        time.sleep(0.05)  # distinct mtimes: files arrive oldest-first

    out = tempfile.mkdtemp(prefix="cae_attrib_out_")
    ckpt = tempfile.mkdtemp(prefix="cae_attrib_ckpt_")
    stream = streaming.read_events_stream(
        spark, str(stage / "*"), max_files_per_trigger=1
    )
    joined = streaming.attribution_join(stream)
    q = (
        joined.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert q.lastProgress["batchId"] >= n_files - 1  # the knob worked

    got = sorted(
        (r.user_id, r.view_id, r.purchase_id, r.secs_to_purchase)
        for r in spark.read.parquet(out).collect()
    )
    want = sorted(
        (r.user_id, r.view_id, r.purchase_id, r.secs_to_purchase)
        for r in streaming.attribution_join(events).collect()
    )
    assert len(want) > 0
    assert got == want


def test_mart_refresh_is_genuinely_incremental(spark):
    """The mart-refresh gate must run as MULTIPLE micro-batches whose
    foreachBatch merges are key-scoped: every version after the first
    carries the previous version's untouched keys forward unchanged,
    and key counts only grow (running totals in update mode). The
    oracle already proves final == full batch aggregate; this pins the
    refresh being incremental rather than one recompute-everything
    batch."""
    from claim_analysis_engine_spark.operators.streaming_gate import (
        MART_REFRESH_SPLITS,
        evt_mart_refresh_stream,
    )
    from tests.conftest import SF_SMALL

    evt_mart_refresh_stream(spark, SF_SMALL).collect()
    versions = evt_mart_refresh_stream.last_versions
    assert len(versions) == MART_REFRESH_SPLITS
    seen: dict[tuple, int] = {}
    for v in versions:
        cur = {
            (r.event_type, r.day): r.n_events
            for r in spark.read.parquet(v).collect()
        }
        for k, n in seen.items():
            assert k in cur, (v, k)  # carried forward, never dropped
            assert cur[k] >= n, (v, k)  # running totals only grow
        seen = cur
    assert sum(seen.values()) > 0


def test_scd2_refresh_stream_maintains_consistent_versions(spark):
    """The SCD2 maintenance gate must run one dimension version per
    micro-batch, each internally consistent (exactly one is_current
    row per user, intervals chaining gaplessly), with the covered user
    set only growing — and the final version must equal the batch
    dim_scd2 build row-for-row (the oracle proves this against DuckDB;
    here against our own batch op)."""
    from claim_analysis_engine_spark.operators.joins_temporal import dim_scd2
    from claim_analysis_engine_spark.operators.streaming_gate import (
        MART_REFRESH_SPLITS,
        evt_scd2_refresh_stream,
    )
    from tests.conftest import SF_SMALL

    final = evt_scd2_refresh_stream(spark, SF_SMALL)
    versions = evt_scd2_refresh_stream.last_versions
    assert len(versions) == MART_REFRESH_SPLITS
    prev_users: set = set()
    for v in versions:
        rows = spark.read.parquet(v).collect()
        by_user: dict = {}
        for r in rows:
            by_user.setdefault(r.user_id, []).append(r)
        users = set(by_user)
        assert prev_users <= users  # coverage only grows
        prev_users = users
        for hist in by_user.values():
            hist.sort(key=lambda r: r.version)
            assert sum(r.is_current for r in hist) == 1
            assert hist[-1].is_current  # the open interval is the last
            for a, b in zip(hist, hist[1:]):
                assert a.valid_to == b.valid_from  # gapless chain
    got = {tuple(r) for r in final.collect()}
    want = {tuple(r) for r in dim_scd2(spark, SF_SMALL).collect()}
    assert got == want


def test_outer_join_suppresses_views_still_open_at_stream_end(spark):
    """The outer gate's boundary is NON-VACUOUS: some views are
    unmatched in the batch sense but sit too close to the stream's end
    for the final watermark to prove abandonment — those must NOT be
    null-emitted. The oracle encodes the same boundary, so this pins
    that the boundary actually bites on the test data (if every
    unmatched view emitted, the gate would certify nothing)."""
    import duckdb

    from claim_analysis_engine_spark.operators.streaming_gate import (
        evt_outer_join_stream,
    )

    out = evt_outer_join_stream(spark, SF_SMALL).toPandas()
    emitted_nulls = int(out["purchase_id"].isna().sum())
    total_unmatched = duckdb.query(
        f"""
        WITH e AS (SELECT * FROM '{SF_SMALL}/events.parquet'),
        v AS (SELECT user_id, ts FROM e WHERE event_type = 'view'),
        p AS (SELECT user_id, ts FROM e WHERE event_type = 'purchase')
        SELECT count(*) FROM v
        WHERE NOT EXISTS (
          SELECT 1 FROM p WHERE p.user_id = v.user_id
          AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 3600 SECONDS)
        """
    ).fetchone()[0]
    assert emitted_nulls < total_unmatched, (
        "every unmatched view emitted — the watermark boundary is vacuous"
    )
    assert emitted_nulls > 0, "no null emissions — outer semantics inert"


def test_outer_join_null_emission_boundary_is_exact(spark, tmp_path):
    """The outer gate's oracle hard-codes the eviction inequality as
    STRICT: a view null-emits iff v_ts + window < max(ts) − delay.
    This plants one view EXACTLY on the boundary (must be suppressed)
    and one 1 s inside it (must emit) and drives them through the real
    streaming path — so a Spark-version change in the eviction
    inequality, or a view landing exactly on the boundary, fails HERE
    before the driver's hash gate does (ADVICE r9)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from claim_analysis_engine_spark.operators.streaming_gate import (
        _drain_to_parquet,
    )

    window_s = streaming.ATTRIB_WINDOW_S  # 3600
    delay_s = 7200  # attribution_join's "2 hours" watermark
    t_max = 1_700_000_000  # epoch seconds; any fixed instant works
    at_boundary = t_max - delay_s - window_s        # v_ts + w == max − d
    inside = at_boundary - 1                        # v_ts + w  < max − d
    rows = [
        # (event_id, ts_s, user_id, event_type) — no purchases for
        # users 1/2, so both views are unmatched in the batch sense
        (1, inside, 1, "view"),
        (2, at_boundary, 2, "view"),
        # a third user's purchase at t_max pins the global watermark
        (3, t_max, 3, "purchase"),
        (4, t_max - window_s, 3, "view"),  # matched pair (sanity row)
    ]
    table = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array(
                [r[1] * 1_000_000 for r in rows], pa.timestamp("us")
            ),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([1.0] * len(rows), pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    stage = tmp_path / "boundary_events"
    stage.mkdir()
    pq.write_table(table, stage / "part-000.parquet")

    stream = streaming.read_events_stream(spark, str(stage))
    out = _drain_to_parquet(
        spark, streaming.attribution_join(stream, how="left_outer")
    ).collect()
    null_users = {r.user_id for r in out if r.purchase_id is None}
    assert 1 in null_users, "view 1 s inside the boundary must null-emit"
    assert 2 not in null_users, (
        "view EXACTLY at the boundary emitted — Spark's eviction "
        "inequality is no longer strict; update the oracle in "
        "streaming_gate.evt_outer_join_stream to match"
    )
    matched = {r.user_id for r in out if r.purchase_id is not None}
    assert matched == {3}, "the sanity inner match must emit"


def test_pydatasource_reader_offsets_and_replay():
    """The simple stream reader's offset contract, driven directly (no
    Spark): read() walks row ranges exactly once, recovery re-reads
    (readBetweenOffsets) reproduce read() byte-for-byte, and at
    exhaustion the reader serves ONE empty sentinel batch (the
    watermark-flush trigger) then holds its offset."""
    from claim_analysis_engine_spark.pydatasource import (
        EventsReplayStreamReader,
    )

    rdr = EventsReplayStreamReader(
        {"path": f"{SF_SMALL}/events.parquet", "batch_rows": "400"}
    )
    n = rdr._sorted_table().num_rows
    off = rdr.initialOffset()
    seen = []
    hops = []
    while True:
        rows, nxt = rdr.read(off)
        rows = list(rows)
        if nxt == off:
            assert rows == []  # fully drained: no progress, no data
            break
        hops.append((off, nxt))
        replay = list(rdr.readBetweenOffsets(off, nxt))
        assert replay == rows  # recovery must reproduce the batch
        seen.extend(rows)
        off = nxt
    assert len(seen) == n
    assert len({r[0] for r in seen}) == n  # event_ids unique: no dup range
    # ts-ordered replay: non-decreasing across the whole stream
    ts = [r[1] for r in seen]
    assert all(a <= b for a, b in zip(ts, ts[1:]))
    # the last hop is the EOF sentinel: empty, offset progressed
    (lo, hi) = hops[-1]
    assert hi.get("eof") and lo.get("i") == n == hi.get("i")
    assert list(rdr.readBetweenOffsets(lo, hi)) == []
    # data batches before the sentinel
    assert len(hops) - 1 == -(-n // 400)


def test_pydatasource_stream_runs_real_micro_batches(spark):
    """The gate's claim is that ONE staged table streams as a SEQUENCE
    of micro-batches with the watermark advancing between them — pin
    it from the query progress (>= 3 data batches, watermark strictly
    advancing), not from the op's final result."""
    import tempfile as _tf
    import time

    from claim_analysis_engine_spark import streaming
    from claim_analysis_engine_spark.pydatasource import register_eventsreplay

    register_eventsreplay(spark)
    stream = (
        spark.readStream.format("eventsreplay")
        .option("path", f"{SF_SMALL}/events.parquet")
        .option("batch_rows", 300)
        .load()
    )
    agg = streaming.tumbling_counts(stream, watermark="1 hour")
    out, ckpt = _tf.mkdtemp(), _tf.mkdtemp()
    q = (
        agg.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(processingTime="0 seconds")
        .start()
    )
    deadline = time.time() + 120
    while time.time() < deadline:
        q.processAllAvailable()
        lp = q.lastProgress
        if lp and lp["sources"] and "eof" in (lp["sources"][0]["endOffset"] or ""):
            break
        time.sleep(0.2)
    progress = list(q.recentProgress)
    q.stop()
    q.awaitTermination()
    data_batches = [p for p in progress if p["numInputRows"] > 0]
    assert len(data_batches) >= 3, "replay collapsed into fewer batches"
    wms = [p["eventTime"].get("watermark") for p in progress]
    wms = [w for w in wms if w and not w.startswith("1970")]
    assert wms == sorted(wms) and len(set(wms)) >= 2, (
        "watermark did not advance across micro-batches"
    )
    assert spark.read.parquet(out).count() > 0


def test_cms_stream_versions_accumulate_to_the_batch_sketch(spark):
    """The 11th gate's mechanics: one sketch version per staged file,
    strictly growing mass, and the final version EQUALS the batch
    sketch bucket-for-bucket (the mergeability the monoid promises)."""
    from pyspark.sql import functions as F

    from claim_analysis_engine_spark.operators.scale_patterns import (
        CMS_D,
        _cms_table,
    )
    from claim_analysis_engine_spark.operators.streaming_gate import (
        CMS_STREAM_SPLITS,
        evt_cms_stream,
    )
    from claim_analysis_engine_spark.tables import load
    from tests.conftest import SF_ORACLE

    evt_cms_stream(spark, SF_ORACLE).collect()
    vs = evt_cms_stream.last_versions
    assert len(vs) == CMS_STREAM_SPLITS
    masses = [
        spark.read.parquet(v).agg(F.sum("cnt")).first()[0] for v in vs
    ]
    assert masses == sorted(masses) and len(set(masses)) == len(masses)
    n_events = load(spark, SF_ORACLE, "events").count()
    assert masses[-1] == n_events * CMS_D
    batch = _cms_table(load(spark, SF_ORACLE, "events").select("user_id"))
    final = spark.read.parquet(vs[-1])
    diff = (
        batch.withColumnRenamed("cnt", "b")
        .join(final.withColumnRenamed("cnt", "s"), ["i", "bucket"], "full")
        .where(
            F.coalesce(F.col("b"), F.lit(0)) != F.coalesce(F.col("s"), F.lit(0))
        )
        .count()
    )
    assert diff == 0


def test_mart_restart_splits_versions_across_the_boundary(spark):
    """The 12th gate's mechanics: the version trail grows on BOTH
    sides of the restart (disk-discovered, not closure-held), and the
    total covers every staged micro-batch."""
    from claim_analysis_engine_spark.operators.streaming_gate import (
        MART_RESTART_SPLIT,
        evt_mart_restart_stream,
    )
    from tests.conftest import SF_ORACLE

    evt_mart_restart_stream(spark, SF_ORACLE).collect()
    n_pre, n_post = evt_mart_restart_stream.versions
    assert 0 < n_pre < n_post
    assert n_post == MART_RESTART_SPLIT


def test_span_dedup_stream_visibility_follows_arrival_order(spark, tmp_path):
    """The 14th gate's defining semantics, planted: a passage shared by
    two docs arriving in the SAME wave is flagged in NEITHER (no
    new-vs-new within a micro-batch — the index appends only after the
    wave is stripped); the same passage arriving again in a LATER wave
    IS flagged (earlier waves joined the index); and a passage shared
    with the OLD corpus is flagged from wave zero. Oracle replayed on
    the planted corpus too, so the SQL first_b rule and the maintainer
    agree beyond the synthetic sf tables."""
    import duckdb

    from claim_analysis_engine_spark.operators import streaming_gate as sg
    from tests.oracle_harness import compare

    def words(prefix, n):
        return " ".join(f"{prefix}{i}" for i in range(n))

    passage_p = words("pp", 9)   # arrivals-only shared passage
    passage_q = words("qq", 9)   # shared with the old corpus
    rows = [
        # old corpus (doc_id % 5 != 0)
        (1, words("oldone", 12), "en", "t", 0),
        (2, words("leadq", 3) + " " + passage_q + " " + words("tailq", 3),
         "en", "t", 0),
        (3, words("oldthree", 12), "en", "t", 0),
        # wave 0: id 15 -> (3) % 3 == 0; shares Q with old doc 2
        (15, words("w0a", 4) + " " + passage_q + " " + words("w0b", 4),
         "en", "t", 0),
        # wave 1: ids 5 and 20 -> (1)%3 == (4)%3 == 1; share P with
        # each other ONLY (same-wave arrivals)
        (5, words("w1a", 4) + " " + passage_p, "en", "t", 0),
        (20, passage_p + " " + words("w1b", 4), "en", "t", 0),
        # wave 2: id 10 -> (2) % 3 == 2; P again, now previously seen
        (10, words("w2a", 2) + " " + passage_p + " " + words("w2b", 2),
         "en", "t", 0),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
        "n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{tmp_path}/documents.parquet"
    )
    out = sg.evt_span_dedup_stream(spark, str(tmp_path))
    got = {
        r.doc_id: (r.arrival_batch, r.span_tokens) for r in out.collect()
    }
    # doc 15 flagged against the old corpus in wave 0 (9-token Q run)
    assert got.get(15) == (0, 9), got
    # same-wave sharers NEVER flag each other
    assert 5 not in got and 20 not in got, got
    # the later wave sees wave 1's grams
    assert got.get(10) == (2, 9), got
    assert set(got) == {15, 10}

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{tmp_path}/documents.parquet/*.parquet'"
    )
    try:
        ok, msg = compare(
            sg.evt_span_dedup_stream(spark, str(tmp_path)).toPandas(),
            con,
            sg.REG.ops["evt_span_dedup_stream"].oracle,
        )
        assert ok, msg
    finally:
        con.close()
