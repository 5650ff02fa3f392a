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
