"""transformWithStateInPandas upgrade probe — the Spark 4 arbitrary-
state streaming API (StatefulProcessor + ValueState/ListState/timers).

ENVIRONMENT-BLOCKED in this container: the API's Python state server
speaks protobuf to the JVM and `google.protobuf` is not installed
(verified: ModuleNotFoundError at import; the streaming runner then
dies with STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE — reproduced
on a minimal ValueState processor). The engine's custom stateful
streaming therefore ships on applyInPandasWithState (sessionizer gate
evt_sessionize_stream), which needs no protobuf.

This test is the skipif twin (the statsmodels/catboost pattern,
tests/test_forecast_upgrade.py): the day protobuf is installable, it
runs the alert-throttle fold — the canonical moving-anchor state op,
batch-certified by evt_alert_throttle's recursive-CTE oracle — through
a real transformWithStateInPandas query over ts-contiguous micro-
batches and asserts exact agreement with the batch fold, upgrading the
claim from 'API unavailable' to 'streaming twin certified'."""

from __future__ import annotations

import importlib.util

import pytest

HAVE_PROTOBUF = (
    importlib.util.find_spec("google") is not None
    and importlib.util.find_spec("google.protobuf") is not None
)


@pytest.mark.skipif(
    not HAVE_PROTOBUF,
    reason="google.protobuf not installed — transformWithStateInPandas's "
    "Python state server cannot start (verified env block)",
)
def test_tws_throttle_twin_matches_batch_fold(spark):
    import pandas as pd
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    from claim_analysis_engine_spark import streaming
    from claim_analysis_engine_spark.operators.events import (
        THROTTLE_COOLDOWN_S,
        evt_alert_throttle,
    )
    from claim_analysis_engine_spark.tmputil import fresh_dir
    from tests.conftest import SF_SMALL

    # stage ts-contiguous waves, cutting only BETWEEN distinct ts so
    # equal-ts rows never straddle a micro-batch boundary (the batch
    # fold's (ts, event_id) tie-break must see them together)
    stage = fresh_dir("cae_tws_stage_")
    t = pq.read_table(f"{SF_SMALL}/events.parquet")
    ts = t.column("ts").to_pylist()
    n = t.num_rows
    step = -(-n // 3)
    cuts = [0]
    for i in (1, 2):
        idx = min(i * step, n)
        while 0 < idx < n and ts[idx] == ts[idx - 1]:
            idx += 1
        cuts.append(idx)
    cuts.append(n)
    for i in range(3):
        lo, hi = cuts[i], cuts[i + 1]
        pq.write_table(t.slice(lo, hi - lo), f"{stage}/part-{i:03d}.parquet")

    class ThrottleProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._last = handle.getValueState("last_fired", "last_s BIGINT")

        def handleInputRows(self, key, rows, timerValues):
            pdf = pd.concat(list(rows), ignore_index=True).sort_values(
                ["ts_s", "event_id"]
            )
            prev = self._last.get()
            last_s = prev[0] if prev is not None else -(10**15)
            keep_e, keep_t = [], []
            for ts_s, eid in zip(pdf["ts_s"], pdf["event_id"]):
                if ts_s >= last_s + THROTTLE_COOLDOWN_S:
                    keep_e.append(int(eid))
                    keep_t.append(int(ts_s))
                    last_s = int(ts_s)
            self._last.update((int(last_s),))
            if keep_e:
                yield pd.DataFrame(
                    {
                        "user_id": int(key[0]),
                        "event_id": keep_e,
                        "ts_s": keep_t,
                    }
                )

        def close(self) -> None:
            pass

    stream = streaming.read_events_stream(spark, stage, max_files_per_trigger=1)
    errors = stream.where(F.col("event_type") == "error").select(
        "user_id",
        F.col("ts").cast("timestamp").cast("long").alias("ts_s"),
        "event_id",
    )
    out_df = errors.groupBy("user_id").transformWithStateInPandas(
        ThrottleProcessor(),
        "user_id bigint, event_id bigint, ts_s bigint",
        "append",
        "none",
    )
    outp, ckpt = fresh_dir("cae_tws_out_"), fresh_dir("cae_tws_ckpt_")
    prev_provider = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", ""
    )
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        q = (
            out_df.writeStream.format("parquet")
            .option("path", outp)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        if prev_provider:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev_provider
            )
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")

    got = {
        (r.user_id, r.event_id, r.ts_s)
        for r in spark.read.parquet(outp).collect()
    }
    want = {
        (r.user_id, r.event_id, r.ts_s)
        for r in evt_alert_throttle(spark, SF_SMALL).collect()
    }
    assert got == want
