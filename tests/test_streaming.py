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
