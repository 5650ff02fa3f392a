"""EP15 (plant-analysis page capstone): planted proofs of the two
semantics the hash alone can't isolate — (1) risk diagnosis scores
against WHOLE plant history, not the filtered display window
(reference pages/3_플랜트_분석.py:115-116 whole_history_df), and
(2) the history frame stays IN SYNC with the mode/dimension filters
(the page's '[Sync] History Data' blocks) — plus the panel structure
(subtotal rows skip diagnosis, lag tab rides the grand row only)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from claim_analysis_engine_spark.operators.dashboards import (
    _EP15_MODE_EXCL,
    _ep15_claims,
    _ep15_crit,
    ep15_plant_analysis,
)
from claim_analysis_engine_spark.operators.risk_tree import rs_tree_relational


def _month_range(start: dt.date, end: dt.date):
    cur = start
    while cur <= end:
        yield cur
        cur = (cur.replace(day=1) + dt.timedelta(days=32)).replace(day=1)


@pytest.fixture(scope="module")
def planted_sf(spark, tmp_path_factory) -> str:
    """Plant-F claims where window-only scoring MUST diverge from
    whole-history scoring for the (일반, BUILDING) series (measured on
    the real tree, not guessed):

    * 1995-01..1996-12 (PRE-window): 10 claims/month — high history
      only whole-plant scoring can see (whole mu ≈ 5.6, sd ≈ 4).
    * 1997-01..1999-05 (in window): flat 2 claims/month (window-only
      mu = 2, sd → 0).
    * 1999-06 (target): 4 claims — inside the whole-history band
      (⚪ 정상범주), a 🔴-grade spike vs the degenerate window series.

    Plus AUTOMOBILE (mode-EXCLUDED) claims in 1993 only: under a
    correctly synced history they are invisible; an unsynced history
    would stretch every key's zero-filled spine back to 1993-01 and
    shift BUILDING's mu/n_obs — the sync divergence probe."""
    tmp = tmp_path_factory.mktemp("ep15")
    orders = []
    ok = 0

    def add(seg_custkey: int, d: dt.date, n: int, prio="3-MEDIUM", plant="F"):
        nonlocal ok
        for _ in range(n):
            ok += 1
            orders.append((ok, seg_custkey, plant, prio, d))

    for m in _month_range(dt.date(1995, 1, 1), dt.date(1996, 12, 1)):
        add(1, m.replace(day=5), 10)
    for m in _month_range(dt.date(1997, 1, 1), dt.date(1999, 5, 1)):
        add(1, m.replace(day=5), 2)
    add(1, dt.date(1999, 6, 5), 4)
    # excluded-segment history (sync probe) + a wrong-plant claim that
    # must not count anywhere
    for m in _month_range(dt.date(1993, 1, 1), dt.date(1993, 6, 1)):
        add(2, m.replace(day=5), 3)
    add(1, dt.date(1998, 3, 5), 1, plant="O")

    spark.createDataFrame(
        orders,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_orderpriority string, o_orderdate date",
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp}/orders.parquet")
    spark.createDataFrame(
        [(1, "BUILDING"), (2, _EP15_MODE_EXCL)],
        "c_custkey long, c_mktsegment string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp}/customer.parquet")
    spark.createDataFrame(
        [(k, d + dt.timedelta(days=(k % 30))) for (k, _, _, _, d) in orders],
        "l_orderkey long, l_shipdate date",
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp}/lineitem.parquet")
    return str(tmp)


def _tree_on(spark, sf_dir: str, *, window: bool):
    """Score the planted corpus the way ep15 scores it, but with a
    selectable history frame — window=True is the WRONG (display-
    window-only) scoring a naive composition would produce."""
    hist = _ep15_claims(spark, sf_dir, window=window).select(
        F.col("c_mktsegment").alias("o_orderstatus"),
        F.when(_ep15_crit(), F.lit("1-URGENT"))
        .otherwise(F.lit("3-MEDIUM"))
        .alias("o_orderpriority"),
        "o_orderdate",
    )
    return {
        (r.status, r.grade): (r.risk_status, r.score, r.reason)
        for r in rs_tree_relational(spark, sf_dir, orders=hist).collect()
    }


@pytest.fixture(scope="module")
def ep15_rows(spark, planted_sf):
    """ONE ep15 evaluation for the module (each call rebuilds the full
    decision-tree plan on the substituted history frame — ~5 s of
    driver-side Column assembly alone)."""
    return {
        (r.grade, r.segment): r
        for r in ep15_plant_analysis(spark, planted_sf).collect()
    }


@pytest.fixture(scope="module")
def whole_scores(spark, planted_sf):
    """ONE whole-history tree run shared by the window- and sync-
    divergence tests."""
    return _tree_on(spark, planted_sf, window=False)


def test_ep15_scores_whole_history_not_window(spark, planted_sf, ep15_rows, whole_scores):
    rows = ep15_rows
    leaf = rows[("일반", "BUILDING")]
    whole = whole_scores[("BUILDING", "일반")]
    windowed = _tree_on(spark, planted_sf, window=True)[("BUILDING", "일반")]
    assert (leaf.risk_status, leaf.score) == (whole[0], whole[1])
    assert leaf.reason == f"[{whole[1]}점] {whole[2]}"
    # the planted series makes window-only scoring report a spike the
    # whole history absorbs — if these ever agree the fixture lost its
    # teeth, not just the assertion
    assert (whole[0], whole[1]) != (windowed[0], windowed[1]), (
        "window-only and whole-history scoring agreed on the planted"
        f" series: {whole} — fixture no longer separates them"
    )


def test_ep15_history_stays_in_sync_with_mode_filter(spark, planted_sf, whole_scores):
    """An UNSYNCED history (mode filter dropped from the history frame)
    pulls the excluded segment's 1993 claims into the spine bounds,
    stretching every series 24 months left — scores must move."""
    synced = whole_scores
    o = spark.read.parquet(f"{planted_sf}/orders.parquet")
    c = spark.read.parquet(f"{planted_sf}/customer.parquet")
    unsynced_hist = (
        o.where(
            (F.col("o_orderstatus") == "F")
            & (F.col("o_orderdate") < F.lit("1999-07-01").cast("date"))
        )
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            F.col("c_mktsegment").alias("o_orderstatus"),
            F.when(_ep15_crit(), F.lit("1-URGENT"))
            .otherwise(F.lit("3-MEDIUM"))
            .alias("o_orderpriority"),
            "o_orderdate",
        )
    )
    unsynced = {
        (r.status, r.grade): (r.risk_status, r.score, r.reason)
        for r in rs_tree_relational(spark, planted_sf, orders=unsynced_hist).collect()
    }
    key = ("BUILDING", "일반")
    assert synced[key][:2] != unsynced[key][:2], (
        "dropping the mode filter from the history frame did not move"
        f" the score ({synced[key]}) — sync probe lost its teeth"
    )


def test_ep15_panel_structure(spark, planted_sf, ep15_rows):
    rows = list(ep15_rows.values())
    by_key = ep15_rows
    # excluded segment and wrong-plant claims appear nowhere
    assert all(r.segment != _EP15_MODE_EXCL for r in rows)
    leaf = by_key[("일반", "BUILDING")]
    sub = by_key[("일반", "전체 합계")]
    grand = by_key[("Total", "")]
    # subtotal + grand rows skip diagnosis exactly like the page
    for r in (sub, grand):
        assert (r.risk_status, r.reason, r.score) == ("", "", None)
    # lag tab rides the grand row only
    assert grand.lag_n is not None and grand.lag_hist
    assert leaf.lag_n is None and leaf.lag_hist is None
    # window totals: 29 window months @2 + 4 target claims; plant-O row
    # excluded; grand == leaf (only one included series)
    assert leaf.total == 62 and grand.total == 62 and sub.total == 62
    # hybrid text: integer-tenths sum(avg); the OLD-year column covers
    # only the pre-cutoff months (1997 Jan-Jun @2 -> 12 over 6 months),
    # NOT the whole year — 1997 Jul+ live in the raw month columns
    assert leaf.y1997 == "12(2.0)"
    assert leaf.ly_1998 == "24(2.0)"
    assert leaf.ty_1999 == "14(2.3)"  # floor(14*10/6) = 23 tenths
    # recent raw month columns cover cutoff..end and sum to the rest
    month_cols = [c for c in rows[0].__fields__ if c.startswith("m19")]
    assert len(month_cols) == 24
    assert sum(leaf[c] for c in month_cols) == 50  # 23 months @2 + 4
