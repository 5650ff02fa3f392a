"""Planted-sensitivity tests for the round-8 analytics operators: the
DuckDB oracle proves cross-engine AGREEMENT on clean testdata; these
prove the detectors actually FIRE on planted signal (and stay quiet on
planted noise) — the dq_expectations pattern."""

from __future__ import annotations

import datetime
import tempfile

from pyspark.sql import functions as F


def _stage(df, tmp: str, name: str) -> str:
    df.coalesce(1).write.mode("overwrite").parquet(f"{tmp}/{name}.parquet")
    return tmp


def test_anomaly_mad_flags_planted_burst_only(spark):
    from claim_analysis_engine_spark.operators.events import evt_anomaly_mad

    tmp = tempfile.mkdtemp(prefix="cae_planted_mad_")
    base = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for day in range(14):
        # steady 10 events/day, except day 7 bursts to 80
        n = 80 if day == 7 else 10
        for i in range(n):
            eid += 1
            rows.append(
                (eid, base + datetime.timedelta(days=day, seconds=i), 1, "click", 1.0, "{}")
            )
    events = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    _stage(events, tmp, "events")
    out = {r["day"]: r["is_anomaly"] for r in evt_anomaly_mad(spark, tmp).collect()}
    assert out["2024-01-08"] is True  # the burst day (day index 7)
    assert sum(out.values()) == 1, out  # nothing else flagged


def test_bot_detection_separates_cadences(spark):
    from claim_analysis_engine_spark.operators.events import evt_bot_detection

    tmp = tempfile.mkdtemp(prefix="cae_planted_bot_")
    base = datetime.datetime(2024, 1, 1)
    rows = []
    # user 1: machine cadence — 30 events, 10 s apart
    for i in range(30):
        rows.append((i, base + datetime.timedelta(seconds=10 * i), 1, "click", 1.0, "{}"))
    # user 2: human cadence — 30 events, 1 h apart
    for i in range(30):
        rows.append((100 + i, base + datetime.timedelta(hours=i), 2, "click", 1.0, "{}"))
    # user 3: machine cadence but below the event floor (5 events)
    for i in range(5):
        rows.append((200 + i, base + datetime.timedelta(seconds=5 * i), 3, "click", 1.0, "{}"))
    events = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    _stage(events, tmp, "events")
    out = {r["user_id"]: r["is_bot"] for r in evt_bot_detection(spark, tmp).collect()}
    assert out == {1: True, 2: False, 3: False}, out


def test_winnowing_guarantee_on_shared_run(spark):
    """Any shared token run of length >= WIN_W + WIN_K - 1 must yield a
    shared fingerprint; with a long planted overlap the pair count
    clears the report threshold. Disjoint docs must not pair."""
    from claim_analysis_engine_spark.operators.textops import txt_winnowing

    tmp = tempfile.mkdtemp(prefix="cae_planted_win_")
    shared = " ".join(f"tok{i}" for i in range(30))  # 30-token common run
    docs = spark.createDataFrame(
        [
            (1, "alpha beta " + shared + " gamma", "en", "s1", 1),
            (2, shared + " delta epsilon zeta", "en", "s2", 1),
            (3, " ".join(f"other{i}" for i in range(40)), "en", "s3", 1),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    _stage(docs, tmp, "documents")
    pairs = {(r["doc_a"], r["doc_b"]) for r in txt_winnowing(spark, tmp).collect()}
    assert (1, 2) in pairs, pairs
    assert all(3 not in p for p in pairs), pairs


def test_benford_uniform_digits_show_negative_excess_for_one(spark):
    """A fabricated uniform-first-digit ledger must show digit 1 far
    BELOW its Benford expectation (~30.1%) — the fraud signature."""
    from claim_analysis_engine_spark.operators.aggregates import agg_benford

    tmp = tempfile.mkdtemp(prefix="cae_planted_benford_")
    d = datetime.date(1998, 1, 1)
    rows = [
        (i, 1, float(d1) * 111.0, d, "F", "1-URGENT")
        for i, d1 in enumerate(list(range(1, 10)) * 20)
    ]
    orders = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_totalprice double, o_orderdate date, "
        "o_orderstatus string, o_orderpriority string",
    )
    _stage(orders, tmp, "orders")
    out = {r["digit"]: r for r in agg_benford(spark, tmp).collect()}
    assert set(out) == set(range(1, 10))
    one = out[1]
    assert abs(one["obs_freq"] - 1.0 / 9) < 1e-3  # obs_freq is round(4)
    assert one["excess"] < -0.15  # ~0.111 observed vs 0.301 expected


def test_km_censoring_excludes_edge_customers_from_churn(spark):
    from claim_analysis_engine_spark.operators.aggregates import (
        KM_CENSOR_DAYS,
        agg_survival_km,
    )

    tmp = tempfile.mkdtemp(prefix="cae_planted_km_")
    d = datetime.date
    rows = [
        # cust 1: lifetime 10 days, churned long before the edge
        (1, 1, 10.0, d(1997, 1, 1), "F", "x"),
        (2, 1, 10.0, d(1997, 1, 11), "F", "x"),
        # cust 2: lifetime 10 days, last order AT the edge → censored
        (3, 2, 10.0, d(1998, 5, 21), "F", "x"),
        (4, 2, 10.0, d(1998, 5, 31), "F", "x"),
        # cust 3: defines the as-of edge, lifetime 200 days, censored
        (5, 3, 10.0, d(1997, 11, 12), "F", "x"),
        (6, 3, 10.0, d(1998, 5, 31), "F", "x"),
    ]
    orders = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_totalprice double, o_orderdate date, "
        "o_orderstatus string, o_orderpriority string",
    )
    _stage(orders, tmp, "orders")
    out = agg_survival_km(spark, tmp).collect()
    assert KM_CENSOR_DAYS == 90
    # only cust 1's lifetime-10 churn is an event; the censored pair
    # must not appear as churn rows
    assert [(r["lifetime_days"], r["n_churned"]) for r in out] == [(10, 1)]
    # at t=10 all three customers were still at risk
    assert out[0]["n_at_risk"] == 3
    assert abs(out[0]["survival"] - round(1 - 1 / 3, 4)) < 1e-9


def test_peak_concurrency_carries_level_into_ending_only_day(spark):
    """The carried-in case the shared sweep-line definition used to
    miss: 5 sessions start on day 1 and all END early on day 2 — day
    2's first boundary is a −1, so an at-boundaries-only daily max
    reads 4 there; the true intra-day peak is the carried-in 5."""
    from claim_analysis_engine_spark.operators.events import (
        evt_peak_concurrency,
    )

    tmp = tempfile.mkdtemp(prefix="cae_planted_peak_")
    base = datetime.datetime(2024, 3, 1, 23, 0)  # 23:00 day 1
    rows = []
    eid = 0
    for u in range(1, 6):
        for k in range(5):  # events 23:00→24:00+, 15-min cadence: one
            eid += 1        # session per user spanning midnight
            rows.append(
                (eid, base + datetime.timedelta(minutes=15 * k), u,
                 "click", 1.0, "{}")
            )
    events = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    _stage(events, tmp, "events")
    out = {r["day"]: r["peak_concurrent"]
           for r in evt_peak_concurrency(spark, tmp).collect()}
    assert out["2024-03-01"] == 5
    # all 5 sessions end at 00:00+1s on day 2 — the day's boundaries
    # are all −1s, so only the carried-in seed can report 5
    assert out["2024-03-02"] == 5, out
