"""EP16 (sales-management page capstone): planted proofs of the Smart
Sync semantics the hash alone can't isolate — (1) claim months the
sales file never covered surface as NULL and get gap-ESTIMATED, not
silently dropped or zeroed into the stats (reference pages/2:66-99 +
core/storage.py:364-458), (2) a plant with claims but NO sales rows at
all still appears (the page's pre-entry state) with no ID and no
fabricated values, (3) the CSV batch updates matched months and
APPENDS beyond-claim months (pages/2:148-204), and (4) the saved frame
carries the reference's fixed column order (pages/2:53-64)."""

from __future__ import annotations

import datetime as dt

import pytest

from claim_analysis_engine_spark.operators.dashboards import (
    _EP16_CSV_NEW_QTY,
    _EP16_SAVED_COLS,
    ep16_sales_management,
)

# planted SEG_A monthly claim counts (1997): Apr and Nov fall on the
# sales file's %7-nulled serials, so their TRUE counts are hidden and
# the fill must reconstruct from the trailing window
_SEG_A_1997 = {1: 2, 2: 4, 3: 6, 4: 10, 5: 3, 6: 3, 7: 3, 8: 3, 9: 3, 10: 3, 11: 8, 12: 3}
_SEG_A_1998 = {1: 9, 2: 9, 3: 9}  # claims-only months (after sales cutoff)
_SEG_B_1998 = {2: 7}  # a plant with claims but NO sales file rows


@pytest.fixture(scope="module")
def planted_sf(spark, tmp_path_factory) -> str:
    tmp = tmp_path_factory.mktemp("ep16")
    orders = []
    ok = 0

    def add(custkey: int, year: int, month: int, n: int):
        nonlocal ok
        for _ in range(n):
            ok += 1
            orders.append((ok, custkey, dt.date(year, month, 5)))

    for m, n in _SEG_A_1997.items():
        add(1, 1997, m, n)
    for m, n in _SEG_A_1998.items():
        add(1, 1998, m, n)
    for m, n in _SEG_B_1998.items():
        add(2, 1998, m, n)
    # out-of-window noise that must not leak into any column
    add(1, 1995, 3, 5)

    spark.createDataFrame(
        orders, "o_orderkey long, o_custkey long, o_orderdate date"
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp}/orders.parquet")
    spark.createDataFrame(
        [(1, "SEG_A"), (2, "SEG_B")], "c_custkey long, c_mktsegment string"
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp}/customer.parquet")
    return str(tmp)


@pytest.fixture(scope="module")
def rows(spark, planted_sf):
    return {r.plant: r for r in ep16_sales_management(spark, planted_sf).collect()}


def test_sync_surfaces_unentered_claim_months_as_estimates(rows):
    """Claims-after-cutoff months (1998-01..03) exist only on the claim
    side; Smart Sync must surface them and gap fill must estimate them
    from the trailing window — NOT report the true claim counts (9),
    which the sales file never saw."""
    a = rows["SEG_A"]
    # trailing windows: Jan←(Oct 3, Nov NULL, Dec 3), Feb←(Nov NULL,
    # Dec 3, Jan NULL), Mar←(Dec 3, Jan NULL, Feb NULL) — all 3.0
    assert a.m1998_01 == 3.0 and a.m1998_02 == 3.0 and a.m1998_03 == 3.0
    # the %7-nulled manual-entry gaps: Apr ← mean(2,4,6), Nov ← mean(3,3,3)
    assert a.m1997_04 == 4.0
    assert a.m1997_11 == 3.0
    # estimated rows: Apr, Nov 1997 + Jan, Feb, Mar 1998
    assert a.n_estimated == 5
    # observed months pass through untouched
    assert a.m1997_01 == 2.0 and a.m1997_12 == 3.0


def test_plant_without_sales_file_appears_honest(rows):
    """SEG_B has claims (1998-02) but no sales rows at all (all its
    months are after the cutoff): it must appear with NO latest ID, a
    NULL (not zero, not fabricated) quantity, and nothing estimated —
    there is no trailing window to estimate from."""
    b = rows["SEG_B"]
    assert b.latest_id is None
    assert b.m1998_02 is None
    assert b.n_estimated == 0
    assert b.total is None
    assert b.roundtrip_ok  # vacuous round trip still holds


def test_csv_batch_updates_and_appends(rows):
    """The CSV merge half: (1998, 6) is beyond SEG_A's claim months in
    the planted corpus, so BOTH csv rows append; values are the batch's
    — latest_id % 1000 and the fixed new-month quantity."""
    a = rows["SEG_A"]
    assert a.latest_id is not None
    assert a.m1998_06 == float(a.latest_id % 1000)
    assert a.m1998_09 == float(_EP16_CSV_NEW_QTY)
    # SEG_B never had sales → no latest row → no csv rows for it
    assert rows["SEG_B"].m1998_09 is None


def test_total_row_carries_save_contract_and_roundtrip(rows):
    """The Total row certifies the SAVE (read-back schema in the
    reference's fixed BASE_COLUMNS order, exact row count) and the
    long↔pivot round trip across every plant."""
    t = rows["Total"]
    assert t.saved_cols == _EP16_SAVED_COLS
    # long rows: SEG_A 12+3 synced + 2 appended; SEG_B 1 synced
    assert t.saved_rows == 18
    assert t.roundtrip_ok
    assert t.latest_id is None
    # window noise check: 1995 claims are outside every month column
    assert t.n_estimated == 5
