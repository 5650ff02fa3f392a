"""Storage-layer behavior tests: hub merge-upsert keep-last semantics
with partition-scoped rewrite, the series-mart golden document
(reference scripts/run_phase1_verification.py fixture style), guarded
cleanup, and the gated Excel bridge."""

from __future__ import annotations

import datetime
import os
import tempfile

import pytest
from pyspark.sql import functions as F

from claim_analysis_engine_spark import storage


def _claims(spark, rows):
    return spark.createDataFrame(
        rows,
        "claim_id string, plant string, reception_year int, reception_month int, "
        "load_seq int",
    )


def test_merge_upsert_keep_last_and_partition_scope(spark):
    hub = tempfile.mkdtemp(prefix="cae_test_hub_")
    first = _claims(
        spark,
        [
            ("C1", "OLD", 2024, 1, 0),
            ("C2", "KEEP", 2024, 2, 0),
            ("C3", "KEEP", 2023, 12, 0),
        ],
    )
    storage.write_hub(first, hub)

    # second upload: updates C1 (same partition) and adds C4
    batch = _claims(spark, [("C1", "NEW", 2024, 1, 1), ("C4", "ADD", 2024, 1, 1)])
    storage.merge_upsert(spark, hub, batch)

    got = {
        r["claim_id"]: r["plant"] for r in spark.read.parquet(hub).collect()
    }
    assert got == {"C1": "NEW", "C2": "KEEP", "C3": "KEEP", "C4": "ADD"}

    periods = {
        (r["reception_year"], r["reception_month"]): r["n_rows"]
        for r in storage.available_periods(spark, hub).collect()
    }
    assert periods == {(2023, 12): 1, (2024, 1): 2, (2024, 2): 1}


def test_series_mart_golden(spark):
    # the reference dummy-fixture scenario: one group, 3-month spine,
    # mixed valid/invalid lag, two middle categories
    rows = [
        ("PLANT_A", "CAT2_X", "MAJOR_P", "M1", datetime.date(2024, 1, 5), 5, True),
        ("PLANT_A", "CAT2_X", "MAJOR_P", "M1", datetime.date(2024, 1, 9), -1, False),
        ("PLANT_A", "CAT2_X", "MAJOR_P", "M2", datetime.date(2024, 2, 2), 10, True),
        ("PLANT_A", "CAT2_X", "MAJOR_P", "M1", datetime.date(2024, 3, 7), 3, True),
    ]
    df = spark.createDataFrame(
        rows,
        "plant string, product_category2 string, major_category string, "
        "middle_category string, reception_date date, lag_days int, lag_valid boolean",
    )
    docs = storage.build_series_mart(df, as_of="2024-03-15").collect()
    assert len(docs) == 1
    doc = docs[0]
    assert doc["key"] == "PLANT_A_CAT2_X_MAJOR_P"
    assert doc["meta"]["last_updated"] == "2024-03-15"
    assert doc["meta"]["champion_model"] is None

    # zero-filled parent history: all-row counts [2, 1, 1]
    hist = [(h["date"], h["count"]) for h in doc["data"]["history"]]
    assert hist == [("2024-01", 2), ("2024-02", 1), ("2024-03", 1)]
    assert doc["data"]["forecast"] == []

    # stats over VALID counts [1, 1, 1]: mean 1, std 0, slope 0;
    # avg_lag = (5 + 10 + 3) / 3 = 6.0
    ps = doc["meta"]["parent_stats"]
    assert ps["mean"] == pytest.approx(1.0)
    assert ps["std"] == pytest.approx(0.0)
    assert ps["slope"] == pytest.approx(0.0)
    assert ps["avg_lag_days"] == pytest.approx(6.0)

    # children sorted by sub_key; M1 all-counts [2,0,1], valid [1,0,1]
    kids = {c["sub_key"]: c for c in doc["children"]}
    assert list(kids) == ["M1", "M2"]
    m1 = kids["M1"]
    assert [(h["date"], h["count"]) for h in m1["history"]] == [
        ("2024-01", 2),
        ("2024-02", 0),
        ("2024-03", 1),
    ]
    assert m1["stats"]["mean"] == pytest.approx(round(2 / 3, 6))
    assert m1["stats"]["std"] == pytest.approx(0.57735)
    assert m1["stats"]["slope"] == pytest.approx(0.0)
    assert m1["stats"]["avg_lag_days"] == pytest.approx(4.0)
    m2 = kids["M2"]
    assert m2["stats"]["avg_lag_days"] == pytest.approx(10.0)


def test_incremental_refresh_rebuilds_only_touched_groups(spark):
    rows = [
        ("PLANT_A", "C", "M1", "S1", datetime.date(2024, 1, 5), 5, True),
        ("PLANT_A", "C", "M1", "S1", datetime.date(2024, 2, 5), 4, True),
        ("PLANT_B", "C", "M2", "S1", datetime.date(2024, 1, 9), 3, True),
        ("PLANT_B", "C", "M2", "S1", datetime.date(2024, 2, 9), 2, True),
    ]
    schema = (
        "plant string, product_category2 string, major_category string, "
        "middle_category string, reception_date date, lag_days int, lag_valid boolean"
    )
    full = spark.createDataFrame(rows, schema)
    # upload touches only PLANT_A/C/M1 (a new claim within the spine)
    batch = spark.createDataFrame(
        [("PLANT_A", "C", "M1", "S1", datetime.date(2024, 2, 20), 7, True)], schema
    )
    merged = full.unionByName(batch)
    docs = storage.refresh_series_incremental(merged, batch, as_of="2024-02-28")
    keys = sorted(d["key"] for d in docs.collect())
    assert keys == ["PLANT_A_C_M1"]  # PLANT_B untouched → not rebuilt
    doc = docs.collect()[0]
    hist = [(h["date"], h["count"]) for h in doc["data"]["history"]]
    assert hist == [("2024-01", 1), ("2024-02", 2)]  # batch row included


def test_incremental_refresh_detects_spine_extension(spark):
    """A batch whose rows create a NEW boundary month extends the
    global zero-fill spine, which changes untouched documents too —
    the function must detect this itself and produce documents
    identical to a full rebuild."""
    rows = [
        ("PLANT_A", "C", "M1", "S1", datetime.date(2024, 1, 5), 5, True),
        ("PLANT_A", "C", "M1", "S1", datetime.date(2024, 2, 5), 4, True),
        ("PLANT_B", "C", "M2", "S1", datetime.date(2024, 1, 9), 3, True),
        ("PLANT_B", "C", "M2", "S1", datetime.date(2024, 2, 9), 2, True),
    ]
    schema = (
        "plant string, product_category2 string, major_category string, "
        "middle_category string, reception_date date, lag_days int, lag_valid boolean"
    )
    full = spark.createDataFrame(rows, schema)
    # the upload's 2024-04 row extends the spine beyond the hub's max
    batch = spark.createDataFrame(
        [("PLANT_A", "C", "M1", "S1", datetime.date(2024, 4, 2), 7, True)], schema
    )
    merged = full.unionByName(batch)
    inc = storage.refresh_series_incremental(merged, batch, as_of="2024-04-30")
    fullbuild = storage.build_series_mart(merged, as_of="2024-04-30")
    inc_rows = {r["key"]: r.asDict(recursive=True) for r in inc.collect()}
    full_rows = {r["key"]: r.asDict(recursive=True) for r in fullbuild.collect()}
    assert inc_rows == full_rows  # includes untouched PLANT_B
    # every document's spine now runs Jan..Apr (zero-filled Mar)
    hist_b = [
        (h["date"], h["count"]) for h in inc_rows["PLANT_B_C_M2"]["data"]["history"]
    ]
    assert hist_b == [("2024-01", 1), ("2024-02", 1), ("2024-03", 0), ("2024-04", 0)]


def test_incremental_refresh_uses_full_hub_spine_for_narrow_groups(spark):
    """A touched group narrower than the hub range must still zero-fill
    over the FULL hub spine (injected bounds), matching a full rebuild
    for that group exactly."""
    rows = [
        ("PLANT_A", "C", "M1", "S1", datetime.date(2024, 2, 5), 5, True),
        ("PLANT_B", "C", "M2", "S1", datetime.date(2024, 1, 9), 3, True),
        ("PLANT_B", "C", "M2", "S1", datetime.date(2024, 3, 9), 2, True),
    ]
    schema = (
        "plant string, product_category2 string, major_category string, "
        "middle_category string, reception_date date, lag_days int, lag_valid boolean"
    )
    full = spark.createDataFrame(rows, schema)
    # batch touches only PLANT_A, whose own rows span just 2024-02
    batch = spark.createDataFrame(
        [("PLANT_A", "C", "M1", "S1", datetime.date(2024, 2, 20), 7, True)], schema
    )
    merged = full.unionByName(batch)
    inc = {r["key"]: r.asDict(recursive=True)
           for r in storage.refresh_series_incremental(
               merged, batch, as_of="2024-03-31").collect()}
    assert set(inc) == {"PLANT_A_C_M1"}  # PLANT_B untouched
    fullbuild = {r["key"]: r.asDict(recursive=True)
                 for r in storage.build_series_mart(
                     merged, as_of="2024-03-31").collect()}
    assert inc["PLANT_A_C_M1"] == fullbuild["PLANT_A_C_M1"]
    hist = [(h["date"], h["count"]) for h in inc["PLANT_A_C_M1"]["data"]["history"]]
    assert hist == [("2024-01", 0), ("2024-02", 2), ("2024-03", 0)]


def test_util_clear_guards(tmp_path):
    target = tmp_path / "data" / "store"
    target.mkdir(parents=True)
    (target / "f.txt").write_text("x")
    # refuses without confirm
    assert storage.util_clear(str(target)) is False
    assert target.exists()
    assert storage.util_clear(str(target), confirm=True) is True
    assert not target.exists()
    # refuses suspicious short paths even with confirm
    with pytest.raises(ValueError):
        storage.util_clear("/tmp", confirm=True)


def test_excel_round_trip(spark):
    # built-in zip-of-XML xlsx path (no openpyxl in this environment);
    # values — including special XML characters — must round-trip
    out = os.path.join(tempfile.mkdtemp(), "t.xlsx")
    df = spark.createDataFrame(
        [("a", "1"), ("b & <c>", "2"), ("유형", "3")], "name string, v string"
    )
    storage.write_excel(df, out)
    back = storage.read_excel(spark, out)
    assert back.columns == ["name", "v"]
    assert sorted((r.name, r.v) for r in back.collect()) == [
        ("a", "1"),
        ("b & <c>", "2"),
        ("유형", "3"),
    ]


def test_xlsx_helpers_low_level(tmp_path):
    p = str(tmp_path / "x.xlsx")
    storage.xlsx_write_rows(p, ["h1", "h2"], [("r1", None), ("r2", "v")])
    header, rows = storage.xlsx_read_rows(p)
    assert header == ["h1", "h2"]
    assert rows == [("r1", ""), ("r2", "v")]


def test_mart_diff_exercises_all_change_classes(spark):
    """The version diff must surface every change class on this data
    (overlapping year windows + the version-B row drop) and its delta
    arithmetic must be internally consistent per class."""
    from claim_analysis_engine_spark.operators.storage_ops import snk_mart_diff
    from tests.conftest import SF_SMALL

    rows = snk_mart_diff(spark, SF_SMALL).collect()
    classes = {r.change_type for r in rows}
    assert classes == {"added", "removed", "changed", "unchanged"}
    for r in rows:
        assert r.delta == r.n_after - r.n_before
        if r.change_type == "added":
            assert r.n_before == 0 and r.n_after > 0
        elif r.change_type == "removed":
            assert r.n_after == 0 and r.n_before > 0
        elif r.change_type == "unchanged":
            assert r.n_before == r.n_after > 0
        else:
            assert 0 < r.n_after != r.n_before > 0


def test_pydatasource_corpus_golden_and_partition_invariant(spark):
    """The Python-DataSource generator's two contracts: the stats row
    is frozen (any generation drift, lost partition, or double-read
    flips a value — xxhash64-XOR is order-free, so only CONTENT
    matters), and the data is byte-identical under any partition count
    (per-doc seeding): reading at 3 partitions must reproduce the
    8-partition row exactly."""
    from claim_analysis_engine_spark.operators.storage_ops import (
        src_pydatasource_corpus,
    )
    from claim_analysis_engine_spark.pydatasource import register_zipfcorpus
    from tests.conftest import SF_SMALL

    row = src_pydatasource_corpus(spark, SF_SMALL).collect()[0].asDict()
    assert row == {
        "n_docs": 2000,
        "total_chars": 1906062,
        "n_distinct_words": 12477,
        "text_hash_xor": 1476364833668600688,
    }, row

    register_zipfcorpus(spark)
    alt = (
        spark.read.format("zipfcorpus")
        .option("n_docs", 2000)
        .option("n_parts", 3)
        .load()
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.length("text")).alias("total_chars"),
            F.bit_xor(F.xxhash64("text")).alias("text_hash_xor"),
        )
        .collect()[0]
    )
    assert (alt["n_docs"], alt["total_chars"], alt["text_hash_xor"]) == (
        row["n_docs"],
        row["total_chars"],
        row["text_hash_xor"],
    )


def test_jsonl_shard_sink_abort_removes_partial_output(spark, tmp_path):
    """The two-phase-commit claim the jsonlshards sink exists to
    demonstrate: a task failure mid-job must leave NO shards and NO
    manifest — the abort path removes what partial tasks wrote, so a
    reader keyed on the manifest can never observe torn output."""
    import os

    from pyspark.sql import functions as F

    from claim_analysis_engine_spark.pydatasource import (
        _MANIFEST,
        register_jsonlshards,
    )

    register_jsonlshards(spark)
    out = str(tmp_path / "sink")
    os.makedirs(out)
    # partition 0 writes fine; a later partition throws mid-write
    df = spark.range(100).withColumn(
        "boom",
        F.when(F.col("id") == 77, F.lit(1) / F.lit(0)).otherwise(F.lit(0.0)),
    ).repartition(4)
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        with __import__("pytest").raises(Exception):
            df.write.format("jsonlshards").option("path", out).mode(
                "append"
            ).save()
    finally:
        spark.conf.unset("spark.sql.ansi.enabled")
    assert not os.path.exists(os.path.join(out, _MANIFEST)), (
        "manifest published despite a failed task"
    )
    leftover = [f for f in os.listdir(out) if f.endswith(".jsonl")]
    assert not leftover, f"partial shards survived abort: {leftover}"


def test_jsonl_shard_sink_overwrite_replaces_and_append_accumulates(spark, tmp_path):
    """Mode semantics with job-tokenized shard names (r13 review): an
    'overwrite' save into a used directory must leave EXACTLY the new
    job's shards (a second job with fewer partitions used to strand the
    surplus), while 'append' leaves prior shards on disk with the
    manifest describing the latest job only."""
    import glob
    import json as _json
    import os

    from claim_analysis_engine_spark.pydatasource import (
        _MANIFEST,
        register_jsonlshards,
    )

    register_jsonlshards(spark)
    out = str(tmp_path / "sink")
    os.makedirs(out)

    def save(n_rows, n_parts, mode):
        df = spark.range(n_rows).selectExpr("id AS doc_id").repartition(n_parts)
        df.write.format("jsonlshards").option("path", out).mode(mode).save()

    save(8, 4, "append")
    assert len(glob.glob(f"{out}/shard-*.jsonl")) == 4
    # overwrite with FEWER partitions: the old failure mode stranded 2
    save(6, 2, "overwrite")
    shards = glob.glob(f"{out}/shard-*.jsonl")
    assert len(shards) == 2, f"stale shards survived overwrite: {shards}"
    manifest = _json.load(open(f"{out}/{_MANIFEST}"))
    assert manifest["n_rows"] == 6
    n_lines = sum(1 for p in shards for _ in open(p))
    assert n_lines == 6
    # append into the used dir: both jobs' shards on disk, manifest
    # covers the latest job only
    save(5, 3, "append")
    assert len(glob.glob(f"{out}/shard-*.jsonl")) == 5
    manifest = _json.load(open(f"{out}/{_MANIFEST}"))
    assert manifest["n_rows"] == 5


def test_jsonl_shard_sink_failed_overwrite_keeps_prior_output(spark, tmp_path):
    """Overwrite must be atomic at the manifest level (r13 advice): the
    old writer deleted prior shards + manifest at construction, so a
    failed overwrite job destroyed committed output. Now cleanup is
    deferred to commit() — a failed overwrite leaves the prior manifest
    and every shard it names intact."""
    import glob
    import json as _json
    import os

    from pyspark.sql import functions as F

    from claim_analysis_engine_spark.pydatasource import (
        _MANIFEST,
        register_jsonlshards,
    )

    register_jsonlshards(spark)
    out = str(tmp_path / "sink")
    os.makedirs(out)
    spark.range(8).selectExpr("id AS doc_id").repartition(4).write.format(
        "jsonlshards"
    ).option("path", out).mode("overwrite").save()
    before = _json.load(open(f"{out}/{_MANIFEST}"))
    assert before["n_rows"] == 8

    bad = spark.range(50).withColumn(
        "boom",
        F.when(F.col("id") == 13, F.lit(1) / F.lit(0)).otherwise(F.lit(0.0)),
    ).repartition(4)
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        with __import__("pytest").raises(Exception):
            bad.write.format("jsonlshards").option("path", out).mode(
                "overwrite"
            ).save()
    finally:
        spark.conf.unset("spark.sql.ansi.enabled")

    after = _json.load(open(f"{out}/{_MANIFEST}"))
    assert after == before, "failed overwrite mutated the manifest"
    on_disk = {os.path.basename(p) for p in glob.glob(f"{out}/shard-*.jsonl")}
    named = {s["shard"] for s in before["shards"]}
    assert named <= on_disk, (
        f"failed overwrite deleted committed shards: {named - on_disk}"
    )
