"""Sink/source round-trip operators (SURVEY.md §2.1): partitioned hub
write + pruned read-back, flat parquet write, nested series-mart JSON
sink, and the settings-JSON source. Each op performs the REAL write to
a unique temp dir, reads its own output back, and returns a frame the
DuckDB oracle reproduces from the source tables — proving the
round-trip preserved values, not just that a write succeeded.

Scale notes: hub writes go through partitionBy + dynamic partition
overwrite (only touched year/month dirs rewritten); the series mart is
one aggregation job writing JSON documents distributed — the
reference's 4,774-file driver loop (core/storage.py:642-650) never
appears here.
"""

from __future__ import annotations

import shutil
from claim_analysis_engine_spark.tmputil import fresh_dir

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from claim_analysis_engine_spark import storage
from claim_analysis_engine_spark.registry import OpRegistry
from claim_analysis_engine_spark.tables import load

REG = OpRegistry()


def _claims_from_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders → canonical-ish claims frame shared by the sink ops."""
    o = load(spark, sf_dir, "orders")
    lag = (F.col("o_orderkey") % 40 - 5).cast("int")
    return o.select(
        F.col("o_orderkey").cast("string").alias("claim_id"),
        F.col("o_orderstatus").alias("plant"),
        F.lit("ALL").alias("product_category2"),
        F.col("o_orderpriority").alias("major_category"),
        (F.col("o_custkey") % 3).cast("string").alias("middle_category"),
        F.col("o_orderdate").cast("date").alias("reception_date"),
        F.year("o_orderdate").cast("int").alias("reception_year"),
        F.month("o_orderdate").cast("int").alias("reception_month"),
        lag.alias("lag_days"),
        (lag >= 0).alias("lag_valid"),
    )


_CLAIMS_SQL = """
    claims AS (
      SELECT CAST(o_orderkey AS VARCHAR) AS claim_id,
             o_orderstatus AS plant,
             'ALL' AS product_category2,
             o_orderpriority AS major_category,
             CAST(o_custkey % 3 AS VARCHAR) AS middle_category,
             CAST(o_orderdate AS DATE) AS reception_date,
             year(o_orderdate) AS reception_year,
             month(o_orderdate) AS reception_month,
             CAST(o_orderkey % 40 - 5 AS INT) AS lag_days,
             (o_orderkey % 40 - 5) >= 0 AS lag_valid
      FROM orders
    )
"""


# ------------------------------------------------------ snk_parquet_part

@REG.op(
    "snk_parquet_part",
    oracle="WITH " + _CLAIMS_SQL + """
    SELECT reception_year, reception_month, count(*) AS n_rows
    FROM claims WHERE reception_year = 1996
    GROUP BY 1, 2
    """,
)
def snk_parquet_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitioned hub sink round-trip (reference core/storage.py:47-69):
    write partitionBy(year, month) parquet, read back WITH a partition
    filter — the read-back plan prunes to the 1996 directories — and
    count per partition. Values must match the pre-write aggregation."""
    hub = fresh_dir("cae_spark_hub_")
    storage.write_hub(_claims_from_orders(spark, sf_dir), hub)
    back = storage.read_hub(spark, hub, year=1996)
    return (
        back.groupBy(
            F.col("reception_year").cast("int").alias("reception_year"),
            F.col("reception_month").cast("int").alias("reception_month"),
        )
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )


# ------------------------------------------------------ snk_parquet_flat

@REG.op(
    "snk_parquet_flat",
    oracle="WITH " + _CLAIMS_SQL + """
    SELECT plant, reception_year AS year, reception_month AS month,
           count(*) AS claim_count
    FROM claims GROUP BY 1, 2, 3
    """,
)
def snk_parquet_flat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flat parquet sink round-trip with a fixed column order
    (reference sales save, pages/2_매출수량_관리.py:53-64): aggregate,
    write one flat file layout, read back verbatim."""
    out = fresh_dir("cae_spark_flat_")
    monthly = (
        _claims_from_orders(spark, sf_dir)
        .groupBy(
            "plant",
            F.col("reception_year").alias("year"),
            F.col("reception_month").alias("month"),
        )
        .agg(F.count(F.lit(1)).alias("claim_count"))
        .select("plant", "year", "month", "claim_count")
    )
    monthly.write.mode("overwrite").parquet(out)
    return spark.read.parquet(out)


# ------------------------------------------------------- snk_json_series

# shared by snk_json_series and snk_series_refresh (which appends a
# plant filter matching its touched-group set)
_SERIES_MART_ORACLE = "WITH " + _CLAIMS_SQL + """
    , months AS (
      SELECT strftime(reception_date, '%Y-%m') AS month, plant,
             major_category, lag_days, lag_valid
      FROM claims
    ),
    bounds AS (
      SELECT min(date_trunc('month', reception_date)) AS lo,
             max(date_trunc('month', reception_date)) AS hi
      FROM claims
    ),
    spine AS (
      SELECT strftime(CAST(unnest(generate_series(lo::TIMESTAMP, hi::TIMESTAMP,
                                   INTERVAL 1 MONTH)) AS DATE), '%Y-%m') AS month
      FROM bounds
    ),
    keys AS (SELECT DISTINCT plant, major_category FROM months),
    counts AS (
      SELECT plant, major_category, month,
             count(*) AS n_all,
             count(*) FILTER (lag_valid) AS n_valid
      FROM months GROUP BY 1, 2, 3
    ),
    zf AS (
      SELECT k.plant, k.major_category, s.month,
             coalesce(c.n_all, 0) AS n_all, coalesce(c.n_valid, 0) AS n_valid,
             row_number() OVER (PARTITION BY k.plant, k.major_category
                                ORDER BY s.month) AS idx,
             count(*) OVER (PARTITION BY k.plant, k.major_category) AS n_months
      FROM keys k CROSS JOIN spine s
      LEFT JOIN counts c ON c.plant = k.plant
         AND c.major_category = k.major_category AND c.month = s.month
    ),
    stats AS (
      SELECT plant, major_category,
             count(*) AS n_months, CAST(sum(n_all) AS BIGINT) AS total_count,
             round(avg(n_valid), 6) AS mean,
             round(coalesce(stddev_samp(n_valid), 0.0), 6) AS std,
             round(coalesce(regr_slope(
               CASE WHEN idx > n_months - 3 THEN CAST(n_valid AS DOUBLE) END,
               CASE WHEN idx > n_months - 3 THEN CAST(idx AS DOUBLE) END), 0.0), 6)
               AS slope
      FROM zf GROUP BY 1, 2
    ),
    lag AS (
      SELECT plant, major_category,
             round(coalesce(avg(CASE WHEN lag_valid THEN lag_days END), 0.0), 1)
               AS avg_lag_days
      FROM months GROUP BY 1, 2
    ),
    kids AS (
      SELECT plant, major_category, count(DISTINCT middle_category) AS n_children
      FROM claims GROUP BY 1, 2
    )
    SELECT concat(s.plant, '_ALL_', s.major_category) AS key,
           s.n_months, s.total_count, s.mean, s.std, s.slope,
           l.avg_lag_days, k.n_children
    FROM stats s
    JOIN lag l ON l.plant = s.plant AND l.major_category = s.major_category
    JOIN kids k ON k.plant = s.plant AND k.major_category = s.major_category
    """


@REG.op("snk_json_series", oracle=_SERIES_MART_ORACLE)
def snk_json_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Series-mart JSON sink round-trip (reference
    core/storage.py:504-653): build the nested documents, write them as
    JSON, read them BACK with an explicit schema, and flatten to
    verifiable scalars (spine length, total history count, parent
    stats, child count). The oracle recomputes the same numbers from
    the source table — proving zero-fill, stats, and the nested write
    all survived the round trip."""
    docs = storage.build_series_mart(
        _claims_from_orders(spark, sf_dir), as_of="2026-08-13"
    )
    out = fresh_dir("cae_spark_series_")
    storage.write_series_docs(docs, out)
    stats_t = "struct<mean:double,std:double,slope:double,avg_lag_days:double>"
    hist_t = "array<struct<date:string,count:bigint>>"
    schema = (
        "key string, "
        f"meta struct<last_updated:string,warning_level:int,champion_model:string,parent_stats:{stats_t}>, "
        f"data struct<history:{hist_t},forecast:{hist_t}>, "
        f"children array<struct<sub_key:string,stats:{stats_t},history:{hist_t}>>"
    )
    back = spark.read.schema(schema).json(out)
    return back.select(
        "key",
        F.size("data.history").cast("bigint").alias("n_months"),
        F.aggregate(
            "data.history", F.lit(0).cast("bigint"), lambda acc, h: acc + h["count"]
        ).alias("total_count"),
        F.col("meta.parent_stats.mean").alias("mean"),
        F.col("meta.parent_stats.std").alias("std"),
        F.col("meta.parent_stats.slope").alias("slope"),
        F.col("meta.parent_stats.avg_lag_days").alias("avg_lag_days"),
        F.size("children").cast("bigint").alias("n_children"),
    )


# --------------------------------------------------- snk_series_refresh

@REG.op(
    "snk_series_refresh",
    oracle=_SERIES_MART_ORACLE + " WHERE s.plant = 'P'",
)
def snk_series_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental series-mart refresh through the correctness gate
    (the reference's designed-but-unimplemented P6 item,
    docs/project_master.md:24): a batch touching only plant 'P' in an
    interior year rebuilds ONLY plant-P documents, zero-filled over the
    FULL hub spine via injected bounds. The oracle is the full-mart SQL
    restricted to the touched plant — values must equal what a full
    rebuild would produce for those groups, which is exactly the
    incremental contract (storage.refresh_series_incremental)."""
    claims = _claims_from_orders(spark, sf_dir)
    batch = claims.where(
        (F.col("plant") == "P") & (F.col("reception_year") == 1996)
    )
    docs = storage.refresh_series_incremental(claims, batch, as_of="2026-08-13")
    return docs.select(
        "key",
        F.size("data.history").cast("bigint").alias("n_months"),
        F.aggregate(
            "data.history", F.lit(0).cast("bigint"), lambda acc, h: acc + h["count"]
        ).alias("total_count"),
        F.col("meta.parent_stats.mean").alias("mean"),
        F.col("meta.parent_stats.std").alias("std"),
        F.col("meta.parent_stats.slope").alias("slope"),
        F.col("meta.parent_stats.avg_lag_days").alias("avg_lag_days"),
        F.size("children").cast("bigint").alias("n_children"),
    )


# ---------------------------------------------------- src_json_settings

_SETTINGS = [
    {
        "plant": "PLANT_A",
        "filter_business": ["food", "b2b_food"],
        "filter_grade": ["critical"],
        "saved_pivot_rows": 25,
    },
    {
        "plant": "PLANT_B",
        "filter_business": ["food"],
        "filter_grade": ["critical", "general"],
        "saved_pivot_rows": 50,
    },
]


@REG.op(
    "src_json_settings",
    oracle="""
    SELECT * FROM (VALUES
      ('PLANT_A', 2, 'b2b_food', 1, 25),
      ('PLANT_B', 1, 'food', 2, 50)
    ) AS t(plant, n_business_filters, first_business, n_grade_filters,
           saved_pivot_rows)
    """,
)
def src_json_settings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Settings-document source (reference data/plant_settings.json,
    consumed by the docs-only rule engine): write the per-plant filter
    presets as JSON, read back with spark.read.json + explicit schema,
    flatten array fields to verifiable scalars."""
    out = fresh_dir("cae_spark_settings_")
    spark.createDataFrame(_SETTINGS).write.mode("overwrite").json(out)
    schema = (
        "plant string, filter_business array<string>, "
        "filter_grade array<string>, saved_pivot_rows int"
    )
    back = spark.read.schema(schema).json(out)
    return back.select(
        "plant",
        F.size("filter_business").alias("n_business_filters"),
        F.element_at(F.array_sort("filter_business"), 1).alias("first_business"),
        F.size("filter_grade").alias("n_grade_filters"),
        "saved_pivot_rows",
    )


# ------------------------------------------------------ src_parquet_flat

@REG.op(
    "src_parquet_flat",
    oracle="SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier",
)
def src_parquet_flat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-table flat parquet scan (reference sales file read,
    core/storage.py:391, pages/2_매출수량_관리.py:45) — the unpartitioned
    single-file layout small dimension tables live in."""
    return load(spark, sf_dir, "supplier")


# ------------------------------------------------------------ src_excel

@REG.op(
    "src_excel",
    oracle="SELECT n_nationkey, n_name, n_regionkey FROM nation",
)
def src_excel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Excel scan (reference pd.read_excel, core/etl.py:39-40): write
    the nation table to a real .xlsx (zip-of-XML, built-in writer —
    no openpyxl in this environment), read it back through the Excel
    source, and re-type the string columns. Values must round-trip."""
    import os

    src = load(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    path = os.path.join(fresh_dir("cae_spark_xlsx_"), "nation.xlsx")
    storage.write_excel(src, path)
    back = storage.read_excel(spark, path)
    return back.select(
        F.col("n_nationkey").cast("bigint").alias("n_nationkey"),
        "n_name",
        F.col("n_regionkey").cast("int").alias("n_regionkey"),
    )


# ------------------------------------------------------------ snk_excel

@REG.op(
    "snk_excel",
    oracle="""
    SELECT o_orderpriority, count(*) AS n FROM orders GROUP BY 1
    """,
)
def snk_excel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Excel export round trip (reference download cards,
    app.py:509-516): aggregate, export the small result to .xlsx,
    read it back and re-type — export is driver-side by design
    (alert cards are tiny; raw facts never go through Excel)."""
    import os

    agg = (
        load(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    path = os.path.join(fresh_dir("cae_spark_xlsx_"), "report.xlsx")
    storage.write_excel(agg, path)
    back = storage.read_excel(spark, path)
    return back.select(
        "o_orderpriority", F.col("n").cast("bigint").alias("n")
    )


# ----------------------------------------------------------- util_clear

@REG.op(
    "util_clear",
    oracle="""
    SELECT * FROM (VALUES (false, true, false))
      AS t(cleared_without_confirm, cleared_with_confirm, exists_after)
    """,
)
def util_clear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Guarded store cleanup (reference clear_all_data,
    core/storage.py:274-293): a populated temp store must survive the
    unconfirmed call and disappear on the confirmed one."""
    import os
    from pathlib import Path

    store = Path(fresh_dir("cae_spark_clear_")) / "hub"
    store.mkdir()
    (store / "part-000.parquet").write_bytes(b"x")
    refused = storage.util_clear(str(store))  # no confirm → False
    cleared = storage.util_clear(str(store), confirm=True)
    return spark.createDataFrame(
        [(bool(refused), bool(cleared), os.path.exists(store))],
        "cleared_without_confirm boolean, cleared_with_confirm boolean, "
        "exists_after boolean",
    )


# ---------------------------------------------------- src_orc_roundtrip

@REG.op(
    "src_orc_roundtrip",
    oracle="""
    SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS order_month,
           count(*) AS n_orders,
           round(CAST(sum(o_totalprice) AS DOUBLE), 2) AS total_price
    FROM orders
    WHERE o_orderpriority = '1-URGENT'
    GROUP BY 1
    """,
)
def src_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC sink + scan round trip: write orders as ORC partitioned by
    priority, read back with a partition filter, aggregate monthly.
    ORC is the second columnar format a Spark lakehouse meets (Hive
    inheritance); the reference is parquet-only, so this extends §2.1.
    The read-back plan must prune to the single '1-URGENT' directory —
    partition pruning works identically to parquet because pruning
    happens in the file index, not the format reader. The money sum
    renders as round-to-2dp DOUBLE on both sides (DECIMAL would print
    trailing zeros differently across engines)."""
    out = fresh_dir("cae_spark_orc_")
    src = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderdate", "o_orderpriority"
    )
    src.write.mode("overwrite").partitionBy("o_orderpriority").orc(out)
    back = spark.read.orc(out).where(F.col("o_orderpriority") == "1-URGENT")
    return (
        back.groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("order_month"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
    )


# ---------------------------------------------- src_schema_evolution

@REG.op(
    "src_schema_evolution",
    oracle="""
    SELECT CAST(year(o_orderdate) AS INT) AS y, count(*) AS n_rows,
           CAST(count(o_totalprice) AS BIGINT) AS n_with_price,
           CAST(count(CASE WHEN year(o_orderdate) >= 1997
                           THEN o_orderpriority END) AS BIGINT)
             AS n_with_priority
    FROM orders GROUP BY 1
    """,
)
def src_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution across partition generations — the 100 TB
    reality every long-lived hub hits: old partitions were written
    before a column existed. Years < 1997 are written WITHOUT
    `o_orderpriority` (the pre-evolution generation), years ≥ 1997
    with it; the read
    mounts both generations in ONE scan via mergeSchema, and rows from
    old files surface the missing column as NULL instead of failing or
    silently dropping files (the reference handles this reindex-style
    per upload, core/storage.py:107-119 — here the SCAN layer absorbs
    it). The per-year profile counts the column's population so the
    oracle proves old partitions read as null-filled and new ones keep
    their values. Plan note: mergeSchema reconciles footers at
    planning; per-row cost is zero, which is why evolution-by-null is
    the lakehouse norm while full rewrites are compaction-sized
    events."""
    out = fresh_dir("cae_spark_evolve_")
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_totalprice",
        "o_orderpriority",
        F.year("o_orderdate").alias("y"),
    )
    old = o.where(F.col("y") < 1997).drop("o_orderpriority")
    new = o.where(F.col("y") >= 1997)
    old.write.partitionBy("y").mode("overwrite").parquet(out)
    new.write.partitionBy("y").mode("append").parquet(out)
    back = spark.read.option("mergeSchema", "true").parquet(out)
    return back.groupBy("y").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("o_totalprice").alias("n_with_price"),
        F.count("o_orderpriority").alias("n_with_priority"),
    )


# ------------------------------------------------------- snk_mart_diff

DIFF_YEARS_A = (1995, 1999)  # version A window (inclusive)
DIFF_YEARS_B = (1997, 2001)  # version B window — overlap ⇒ added+removed
DIFF_B_DROP_MOD = 101  # version B drops ~1% of rows (a simulated pipeline
# correction) so overlap months exercise the 'changed' class too


@REG.op(
    "snk_mart_diff",
    oracle=f"""
    WITH a AS (
      SELECT o_orderstatus AS status, strftime(o_orderdate, '%Y-%m') AS month,
             count(*) AS n
      FROM orders
      WHERE year(o_orderdate) BETWEEN {DIFF_YEARS_A[0]} AND {DIFF_YEARS_A[1]}
      GROUP BY 1, 2
    ),
    b AS (
      SELECT o_orderstatus AS status, strftime(o_orderdate, '%Y-%m') AS month,
             count(*) AS n
      FROM orders
      WHERE year(o_orderdate) BETWEEN {DIFF_YEARS_B[0]} AND {DIFF_YEARS_B[1]}
        AND o_orderkey % {DIFF_B_DROP_MOD} <> 0
      GROUP BY 1, 2
    )
    SELECT coalesce(a.status, b.status) AS status,
           coalesce(a.month, b.month) AS month,
           CAST(coalesce(a.n, 0) AS BIGINT) AS n_before,
           CAST(coalesce(b.n, 0) AS BIGINT) AS n_after,
           CAST(coalesce(b.n, 0) - coalesce(a.n, 0) AS BIGINT) AS delta,
           CASE WHEN a.n IS NULL THEN 'added'
                WHEN b.n IS NULL THEN 'removed'
                WHEN a.n <> b.n THEN 'changed'
                ELSE 'unchanged' END AS change_type
    FROM a FULL OUTER JOIN b ON a.status = b.status AND a.month = b.month
    """,
)
def snk_mart_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Version diff between two builds of the monthly mart — the audit
    report a data owner reads after an upload: which (status, month)
    keys appeared, disappeared, or changed counts, and by how much.
    The two versions here are overlapping year windows of the fact
    table so every change class (added / removed / changed /
    unchanged) is exercised; in production the inputs are two
    partition snapshots of the same mart (the versioned dirs the
    mart-refresh gates already write).

    Scale shape: a diff of AGGREGATES, never of raw rows — each side
    reduces map-side to its key grain first, then one full-outer join
    on the mart key compares two key-sized frames. Diffing raw
    snapshots row-by-row would shuffle the full fact table twice;
    diffing marts shuffles two aggregates."""
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_orderstatus").alias("status"),
        F.date_format("o_orderdate", "yyyy-MM").alias("month"),
        F.year("o_orderdate").alias("y"),
    )

    def mart(side: DataFrame, lo: int, hi: int, n_name: str) -> DataFrame:
        return (
            side.where(F.col("y").between(lo, hi))
            .groupBy("status", "month")
            .agg(F.count(F.lit(1)).alias(n_name))
        )

    a = mart(o, *DIFF_YEARS_A, "n_a")
    b = mart(
        o.where(F.col("o_orderkey") % DIFF_B_DROP_MOD != 0),
        *DIFF_YEARS_B,
        "n_b",
    )
    j = a.join(b, ["status", "month"], "full")
    return j.select(
        "status",
        "month",
        F.coalesce("n_a", F.lit(0)).alias("n_before"),
        F.coalesce("n_b", F.lit(0)).alias("n_after"),
        (F.coalesce("n_b", F.lit(0)) - F.coalesce("n_a", F.lit(0))).alias("delta"),
        F.when(F.col("n_a").isNull(), "added")
        .when(F.col("n_b").isNull(), "removed")
        .when(F.col("n_a") != F.col("n_b"), "changed")
        .otherwise("unchanged")
        .alias("change_type"),
    )


# --------------------------------------------------- src_jsonl_roundtrip

@REG.op(
    "src_jsonl_roundtrip",
    oracle="""
    SELECT lang, source, count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           count(DISTINCT doc_id) AS n_ids
    FROM documents
    GROUP BY 1, 2
    """,
)
def src_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSONL (one JSON document per line) round-trip — THE interchange
    format of training-data pipelines (every crawl dump, annotation
    export, and filtered-corpus handoff ships as .jsonl[.gz]). Writes
    the documents table as distributed JSONL, reads it back with an
    EXPLICIT schema plus a PERMISSIVE corrupt-record column, drops any
    unparseable line, and aggregates — the oracle reproduces the same
    aggregate from the original parquet, so a value anywhere lost or
    mangled in the text round-trip (unicode escapes, embedded
    newlines-as-\\n, 64-bit ids) breaks the hash.

    Scale: the write is one narrow map job (a file per partition; at
    100 TB you'd set maxRecordsPerFile); the read is line-splittable,
    so parallelism survives — unlike multiline JSON, which forces one
    task per file. The explicit schema skips Spark's whole-file
    inference pass; _corrupt_record quarantines bad lines instead of
    failing the job, which is the difference between a nightly crawl
    ingest finishing or not."""
    from pyspark.sql import types as T

    out = fresh_dir("cae_spark_jsonl_")
    load(spark, sf_dir, "documents").write.mode("overwrite").json(out)

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
            T.StructField("_corrupt_record", T.StringType()),
        ]
    )
    back = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(out)
    )
    return (
        back.filter(F.col("_corrupt_record").isNull())
        .groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.countDistinct("doc_id").alias("n_ids"),
        )
    )


# ---------------------------------------------------- snk_csv_roundtrip

@REG.op(
    "snk_csv_roundtrip",
    oracle="""
    SELECT lang, source, count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           count(DISTINCT doc_id) AS n_ids
    FROM documents
    GROUP BY 1, 2
    """,
)
def snk_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV round-trip under quoting-hostile content: every row gets a
    synthetic note column stuffed with the four characters that break
    naive CSV (delimiter, double-quote, embedded NEWLINE, backslash),
    is written with quoting+escaping on, read back with an explicit
    schema in multiLine mode, VERIFIED cell-by-cell (the note must
    reconstruct byte-identically or the row is dropped and the count
    aggregate breaks the hash), then aggregated — the oracle computes
    the same aggregate from the source parquet.

    The corpus-scale lesson this op encodes: multiLine CSV is NOT
    line-splittable (one task per file — fine here, a bottleneck at
    100 TB), which is exactly why src_jsonl_roundtrip exists as the
    interchange path; CSV stays for the spreadsheet-facing edge where
    the reference lives (upload page accepts .csv, app.py:61), and
    this op proves the escaping path preserves every byte when it IS
    used."""
    out = fresh_dir("cae_spark_csvrt_")
    docs = load(spark, sf_dir, "documents")
    hostile = docs.withColumn(
        "note",
        F.concat(
            F.lit('a,"b"\n'), F.col("lang"), F.lit("\\x|"), F.col("source")
        ),
    )
    (
        hostile.write.mode("overwrite")
        .option("header", True)
        .option("quoteAll", True)
        .option("escape", '"')
        .csv(out)
    )
    back = (
        spark.read.schema(
            "doc_id long, text string, lang string, source string,"
            " n_chars long, note string"
        )
        .option("header", True)
        .option("multiLine", True)
        .option("escape", '"')
        .csv(out)
    )
    verified = back.filter(
        F.col("note")
        == F.concat(
            F.lit('a,"b"\n'), F.col("lang"), F.lit("\\x|"), F.col("source")
        )
    )
    return verified.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.countDistinct("doc_id").alias("n_ids"),
    )


# ----------------------------------------------------- dedup_audit_hub

@REG.op(
    "dedup_audit_hub",
    oracle="""
    SELECT o_custkey AS dup_key, count(*) AS n_rows,
           count(DISTINCT year(o_orderdate) * 100 + month(o_orderdate))
             AS n_partitions,
           min(year(o_orderdate) * 100 + month(o_orderdate)) AS first_part,
           max(year(o_orderdate) * 100 + month(o_orderdate)) AS last_part
    FROM orders
    GROUP BY 1 HAVING count(*) > 1
    """,
)
def dedup_audit_hub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hub-wide duplicate audit WITH physical-file attribution — the
    reference's check_duplication.py end to end (rglob over every hub
    parquet, per-file 상담번호 dedup report, check_duplication.py:15-77)
    — but as one distributed scan instead of a driver loop that
    pd.concat's the whole hub. Writes a (year, month)-partitioned hub,
    reads it back, and attributes every duplicate key to the partition
    directories it spans, parsed from input_file_name() — proving the
    attribution comes from the PHYSICAL layout, not from re-deriving
    the partition columns. The oracle recomputes the same span from
    the source dates, so a row landing in the wrong partition dir (or
    an attribution regex bug) breaks the hash, not just a row count.

    At 100 TB this is the nightly integrity scan: one shuffle on the
    key; the per-file grain never leaves the executors (the reference
    collects every file into driver memory, check_duplication.py:46)."""
    hub = fresh_dir("cae_spark_audit_")
    (
        load(spark, sf_dir, "orders")
        .select(
            "o_orderkey",
            "o_custkey",
            F.year("o_orderdate").alias("y"),
            F.month("o_orderdate").alias("m"),
        )
        .write.partitionBy("y", "m")
        .mode("overwrite")
        .parquet(hub)
    )
    back = spark.read.parquet(hub).select(
        "o_custkey",
        (
            F.regexp_extract(F.input_file_name(), r"/y=(\d+)/m=(\d+)/", 1).cast(
                "int"
            )
            * 100
            + F.regexp_extract(F.input_file_name(), r"/y=(\d+)/m=(\d+)/", 2).cast(
                "int"
            )
        ).alias("part_ym"),
    )
    return (
        back.groupBy(F.col("o_custkey").alias("dup_key"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("part_ym").alias("n_partitions"),
            F.min("part_ym").alias("first_part"),
            F.max("part_ym").alias("last_part"),
        )
        .where(F.col("n_rows") > 1)
    )


# ------------------------------------------------------ src_logs_parse

@REG.op(
    "src_logs_parse",
    oracle="""
    SELECT event_type,
           count(*) AS n_lines,
           count(DISTINCT user_id) AS n_users,
           round(sum(value), 4) AS total_value,
           CAST(max(floor(epoch(ts))) AS BIGINT) AS max_ts_s
    FROM events GROUP BY 1
    """,
)
def src_logs_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw log-line ingestion: render the event stream as text log
    lines (`ts=… level=… user=… type=… value=… id=…`), write them
    with the TEXT sink, read them back with the line source, parse
    fields out with regexp_extract, and aggregate — the
    grep-able-logs-to-table path every observability pipeline starts
    from, exercised end to end (the oracle recomputes the aggregate
    from the structured source, so a field mangled anywhere in
    render→write→read→parse breaks the hash).

    Parity note: value survives the text round-trip exactly because
    Spark renders doubles shortest-round-trip — parsing the string
    back yields the identical double, so the sum matches the oracle's
    sum over the original column (round(4) covers fold order only).

    Scale: text lines are newline-splittable (unlike multiline
    formats), so read parallelism survives; parsing is JVM-side regex
    in whole-stage codegen — the anti-pattern this op replaces is a
    per-line Python loop over downloaded log files."""
    out = fresh_dir("cae_spark_logs_")
    e = load(spark, sf_dir, "events")
    lines = e.select(
        F.concat(
            F.lit("ts="),
            F.col("ts").cast("timestamp").cast("long").cast("string"),
            F.lit(" level=INFO user="),
            F.col("user_id").cast("string"),
            F.lit(" type="),
            F.col("event_type"),
            F.lit(" value="),
            F.col("value").cast("string"),
            F.lit(" id="),
            F.col("event_id").cast("string"),
        ).alias("value")
    )
    lines.write.mode("overwrite").text(out)
    back = spark.read.text(out)
    parsed = back.select(
        F.regexp_extract("value", r"ts=(\d+)", 1).cast("long").alias("ts_s"),
        F.regexp_extract("value", r"user=(\d+)", 1).cast("long").alias("user_id"),
        F.regexp_extract("value", r"type=(\S+)", 1).alias("event_type"),
        F.regexp_extract("value", r"value=(\S+)", 1).cast("double").alias("v"),
    )
    return parsed.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.countDistinct("user_id").alias("n_users"),
        F.round(F.sum("v"), 4).alias("total_value"),
        F.max("ts_s").alias("max_ts_s"),
    )


# -------------------------------------------------- snk_manifest_publish

@REG.op(
    "snk_manifest_publish",
    oracle="""
    SELECT o_orderpriority AS priority, count(*) AS n_orders,
           round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2)
             AS total_price
    FROM orders GROUP BY 1
    """,
)
def snk_manifest_publish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Atomic publish via a MANIFEST — the lakehouse commit primitive
    without a table format: the writer stages parquet files, then
    atomically publishes a manifest listing exactly the files of this
    snapshot; readers load ONLY manifest-listed files. A torn write
    (crashed job leaving partial files), a concurrent writer's
    stragglers, or an orphaned retry file are all INVISIBLE to
    readers, because directory listing is no longer the source of
    truth — the property Delta/Iceberg formalize, demonstrated here
    with nothing but parquet + one JSON rename. This op plants an
    ORPHAN parquet file in the directory after publishing; the
    aggregate still matches the source-table oracle only if the
    reader honored the manifest (a dir-listing read would double
    count).

    Scale: the manifest is file NAMES (KBs for thousands of files) —
    written once by the driver after all tasks commit, the same
    commit-protocol shape as Spark's v2 FileCommitProtocol; reads
    pass the explicit file list so planning skips the directory scan
    entirely."""
    import json
    import os
    import shutil

    out = fresh_dir("cae_spark_manifest_")
    data_dir = os.path.join(out, "data")
    (
        load(spark, sf_dir, "orders")
        .select("o_orderpriority", "o_totalprice")
        .write.mode("overwrite")
        .parquet(data_dir)
    )
    files = sorted(
        f for f in os.listdir(data_dir) if f.endswith(".parquet")
    )
    manifest = {"snapshot": 1, "files": files}
    tmp_manifest = os.path.join(out, "_manifest.json.tmp")
    with open(tmp_manifest, "w") as fh:
        json.dump(manifest, fh)
    # the atomic commit: a rename IS the publish
    os.rename(tmp_manifest, os.path.join(out, "manifest.json"))

    # plant an orphan AFTER publish — a torn concurrent write. A
    # directory-listing reader would now double-count; the manifest
    # reader must not see it.
    src_file = os.path.join(data_dir, files[0])
    shutil.copy(src_file, os.path.join(data_dir, "part-orphan-torn.parquet"))

    with open(os.path.join(out, "manifest.json")) as fh:
        published = json.load(fh)["files"]
    paths = [os.path.join(data_dir, f) for f in published]
    back = spark.read.parquet(*paths)
    return back.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double"), 2
        ).alias("total_price"),
    )


# ---------------------------------------------- snk_manifest_timetravel

TT_SPLIT_DATE = "1998-01-01"  # batch 1 = orders before; batch 2 = the rest


@REG.op(
    "snk_manifest_timetravel",
    oracle=f"""
    SELECT 1 AS version,
           count(*) AS n_orders,
           round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2)
             AS total_price
    FROM orders WHERE o_orderdate < DATE '{TT_SPLIT_DATE}'
    UNION ALL
    SELECT 2 AS version,
           count(*) AS n_orders,
           round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2)
             AS total_price
    FROM orders
    """,
)
def snk_manifest_timetravel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME TRAVEL over the manifest commit log — the second lakehouse
    primitive after snk_manifest_publish's atomic single commit: an
    append-only table accrues VERSIONED manifests (v2 = v1's files +
    the new batch's files; data files are immutable and never
    rewritten), and a reader picks any committed version and sees
    exactly that snapshot. Version 1 is read AFTER version 2 was
    committed and after a torn concurrent write left an orphan file in
    the v2 data directory — the v1 row only matches the oracle's
    "orders before {TT_SPLIT_DATE}" if old manifests stay immutable,
    and the v2 row only matches "all orders" if the reader ignores
    non-manifest files. This is Delta/Iceberg `VERSION AS OF` with
    nothing but parquet + JSON renames.

    Scale: each manifest is the file-name list of its snapshot (KBs
    per thousand files), written once by the driver after all tasks
    commit; appends reuse every prior data file by reference, so
    commit cost is O(new files), not O(table). Reads plan from the
    explicit list — no directory scan, no eventual-consistency
    listing hazards."""
    import json
    import os
    import shutil

    root = fresh_dir("cae_spark_timetravel_")
    orders = load(spark, sf_dir, "orders").select(
        "o_orderdate", "o_totalprice"
    )
    split = F.lit(TT_SPLIT_DATE).cast("date")

    def commit(version: int, batch_df, prior_files: list[str]) -> list[str]:
        batch_dir = os.path.join(root, f"batch{version}")
        batch_df.write.mode("overwrite").parquet(batch_dir)
        new = sorted(
            os.path.join(f"batch{version}", f)
            for f in os.listdir(batch_dir)
            if f.endswith(".parquet")
        )
        files = prior_files + new
        tmp = os.path.join(root, f"_manifest-{version}.json.tmp")
        with open(tmp, "w") as fh:
            json.dump({"version": version, "files": files}, fh)
        os.rename(tmp, os.path.join(root, f"manifest-{version}.json"))
        return files

    v1_files = commit(1, orders.where(F.col("o_orderdate") < split), [])
    commit(2, orders.where(F.col("o_orderdate") >= split), v1_files)

    # torn concurrent write after both commits: invisible to readers
    first_v2 = next(
        f for f in sorted(os.listdir(os.path.join(root, "batch2")))
        if f.endswith(".parquet")
    )
    shutil.copy(
        os.path.join(root, "batch2", first_v2),
        os.path.join(root, "batch2", "part-orphan-torn.parquet"),
    )

    def read_as_of(version: int):
        with open(os.path.join(root, f"manifest-{version}.json")) as fh:
            files = json.load(fh)["files"]
        snap = spark.read.parquet(*[os.path.join(root, f) for f in files])
        return snap.agg(
            F.lit(version).cast("int").alias("version"),
            F.count(F.lit(1)).alias("n_orders"),
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast(
                    "double"
                ),
                2,
            ).alias("total_price"),
        )

    return read_as_of(1).unionByName(read_as_of(2))


# ---------------------------------------------- snk_vacuum_retention

VAC_SPLIT_DATE = "1998-01-01"  # v1 = orders before; v2 = compaction rewrite
VAC_FILES_PER_COMMIT = 4       # repartition pins file counts → the
# removed/live accounting below is exact and oracle-checkable


@REG.op(
    "snk_vacuum_retention",
    oracle=f"""
    SELECT 'post_vacuum_v2' AS stage,
           CAST(count(*) AS BIGINT) AS n,
           round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2)
             AS total_price
    FROM orders
    UNION ALL
    SELECT 'removed_files', {VAC_FILES_PER_COMMIT + 1}, CAST(NULL AS DOUBLE)
    UNION ALL
    SELECT 'live_files', {VAC_FILES_PER_COMMIT}, CAST(NULL AS DOUBLE)
    """,
)
def snk_vacuum_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VACUUM with retention — the third lakehouse primitive after
    snk_manifest_publish (atomic commit) and snk_manifest_timetravel
    (versioned snapshots): version 2 is a COMPACTION REWRITE (the
    full table in fresh files, referencing none of v1's), so after
    the retention policy expires manifest 1, v1's data files and a
    planted torn-write orphan are unreferenced garbage. The vacuum
    deletes exactly the parquet files no retained manifest lists and
    expires the old manifest. Three hash-certified claims: the
    post-vacuum v2 read still equals the full source table (vacuum
    deleted NO live file), exactly {VAC_FILES_PER_COMMIT + 1} files
    were removed (v1's {VAC_FILES_PER_COMMIT} + the orphan — a vacuum
    that trusts directory listing over manifests would also eat live
    files and break row 1), and {VAC_FILES_PER_COMMIT} files remain.
    This is Delta VACUUM / Iceberg expire_snapshots with nothing but
    parquet + JSON. Reference parity: the reference's util_clear
    (core/storage.py) wipes the whole store; this is the incremental,
    snapshot-safe form a 100 TB table needs.

    Scale: the retained-file set is manifest-sized (file NAMES, KBs
    per thousands of files) — the deletion list is a set difference
    computed driver-side exactly as table formats do it; data files
    are never read. Retention here is keep-latest-1 for a
    deterministic fixture; time-based retention swaps the manifest
    filter only."""
    import json
    import os
    import shutil

    root = fresh_dir("cae_spark_vacuum_")
    orders = load(spark, sf_dir, "orders").select(
        "o_orderdate", "o_totalprice"
    )
    split = F.lit(VAC_SPLIT_DATE).cast("date")

    def commit(version: int, batch_df) -> list[str]:
        batch_dir = os.path.join(root, f"batch{version}")
        batch_df.repartition(VAC_FILES_PER_COMMIT).write.mode(
            "overwrite"
        ).parquet(batch_dir)
        files = sorted(
            os.path.join(f"batch{version}", f)
            for f in os.listdir(batch_dir)
            if f.endswith(".parquet")
        )
        tmp = os.path.join(root, f"_manifest-{version}.json.tmp")
        with open(tmp, "w") as fh:
            json.dump({"version": version, "files": files}, fh)
        os.rename(tmp, os.path.join(root, f"manifest-{version}.json"))
        return files

    commit(1, orders.where(F.col("o_orderdate") < split))
    commit(2, orders)  # the compaction rewrite: full table, fresh files

    # torn concurrent write after both commits — never referenced
    first_v1 = next(
        f for f in sorted(os.listdir(os.path.join(root, "batch1")))
        if f.endswith(".parquet")
    )
    shutil.copy(
        os.path.join(root, "batch1", first_v1),
        os.path.join(root, "batch1", "part-orphan-torn.parquet"),
    )

    # vacuum: retain the latest manifest only, delete every parquet
    # file no retained manifest references, expire old manifests
    with open(os.path.join(root, "manifest-2.json")) as fh:
        retained = set(json.load(fh)["files"])
    removed = 0
    for sub in sorted(os.listdir(root)):
        subdir = os.path.join(root, sub)
        if not os.path.isdir(subdir):
            continue
        for f in sorted(os.listdir(subdir)):
            rel = os.path.join(sub, f)
            if f.endswith(".parquet") and rel not in retained:
                os.remove(os.path.join(subdir, f))
                removed += 1
    os.remove(os.path.join(root, "manifest-1.json"))

    live = spark.read.parquet(*[os.path.join(root, f) for f in retained])
    # Materialize the post-vacuum read BEFORE removing the fixture root:
    # the returned frame must not depend on the temp files, and leaving
    # the root behind orphans two parquet copies of orders per
    # invocation (bench median-of-3 + correctness runs add up).
    n_live, total_price = live.agg(
        F.count(F.lit(1)),
        F.round(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double"), 2
        ),
    ).first()
    shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(
        [
            ("post_vacuum_v2", n_live, float(total_price)),
            ("removed_files", removed, None),
            ("live_files", len(retained), None),
        ],
        "stage string, n long, total_price double",
    )


# ---------------------------------------------- src_partition_evolution

PE_SPLIT_YEAR = 1998  # generations: < split by year; >= split by (year, month)
PE_QUERY_MONTH = 6

# (gen1 root, gen2 root, dir counts) per (session, sf_dir) — the
# two-generation layout is written once and queried many times (the
# prune_file_stats layout-memo lesson)
_PEVOLVE_MEMO: dict[tuple, tuple] = {}
_PEVOLVE_MEMO_MAX = 4


@REG.op(
    "src_partition_evolution",
    oracle=f"""
    WITH g1 AS (
        SELECT year(o_orderdate) AS y, month(o_orderdate) AS m,
               o_totalprice
        FROM orders WHERE year(o_orderdate) < {PE_SPLIT_YEAR}
    ), g2 AS (
        SELECT year(o_orderdate) AS y, month(o_orderdate) AS m,
               o_totalprice
        FROM orders WHERE year(o_orderdate) >= {PE_SPLIT_YEAR}
    )
    SELECT 'year-only' AS gen,
           (SELECT CAST(count(DISTINCT y) AS BIGINT) FROM g1) AS n_dirs_total,
           (SELECT CAST(count(DISTINCT y) AS BIGINT) FROM g1) AS n_dirs_read,
           count(*) AS n_rows,
           round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2)
             AS revenue
    FROM g1 WHERE m = {PE_QUERY_MONTH}
    UNION ALL
    SELECT 'year-month' AS gen,
           (SELECT CAST(count(DISTINCT (y, m)) AS BIGINT) FROM g2),
           (SELECT CAST(count(DISTINCT y) AS BIGINT) FROM g2
             WHERE m = {PE_QUERY_MONTH}),
           count(*),
           round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2)
    FROM g2 WHERE m = {PE_QUERY_MONTH}
    """,
)
def src_partition_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PARTITION-SCHEME evolution — the sibling of src_schema_evolution
    for the layout axis: the table's early generation was partitioned
    by year only, the later one by (year, month) (finer partitioning
    is the standard response to growth), and the same logical query —
    "all Junes" — prunes ASYMMETRICALLY: the year-month generation
    reads only its month=6 directories while the year-only generation
    must read every directory and row-filter. The op runs the query
    against both generations and emits each one's directory counts
    (total vs read, derived from the same directory listing Spark's
    FileIndex scans) beside the answer; the oracle recomputes BOTH the
    pruning arithmetic and the answers from the raw table. This is the
    measured argument for (and honest cost of) partition evolution:
    old data keeps its coarse layout until a compaction rewrite pays
    to re-partition it.

    Plan note (asserted in tests): the year-month scan carries the
    month predicate in PartitionFilters; the year-only scan can only
    carry it as a data Filter."""
    import os

    from claim_analysis_engine_spark.tables import session_memo_key

    memo_key = session_memo_key(spark, sf_dir)
    if memo_key not in _PEVOLVE_MEMO:
        root = fresh_dir("cae_spark_pevolve_")
        g1_root = os.path.join(root, "gen1")
        g2_root = os.path.join(root, "gen2")
        o = load(spark, sf_dir, "orders").select(
            "o_totalprice",
            F.year("o_orderdate").alias("y"),
            F.month("o_orderdate").alias("m"),
        )
        (
            o.where(F.col("y") < PE_SPLIT_YEAR)
            .repartition("y")
            .write.partitionBy("y")
            .mode("overwrite")
            .parquet(g1_root)
        )
        (
            o.where(F.col("y") >= PE_SPLIT_YEAR)
            .repartition("y", "m")
            .write.partitionBy("y", "m")
            .mode("overwrite")
            .parquet(g2_root)
        )
        if len(_PEVOLVE_MEMO) >= _PEVOLVE_MEMO_MAX:
            # reclaim the evicted session-private layout dirs — long
            # pytest/driver sessions would otherwise orphan them
            old_g1, old_g2 = _PEVOLVE_MEMO.pop(next(iter(_PEVOLVE_MEMO)))
            shutil.rmtree(old_g1, ignore_errors=True)
            shutil.rmtree(old_g2, ignore_errors=True)
        _PEVOLVE_MEMO[memo_key] = (g1_root, g2_root)
    g1_root, g2_root = _PEVOLVE_MEMO[memo_key]

    g1_dirs = [d for d in os.listdir(g1_root) if d.startswith("y=")]
    g2_dirs = [
        (yd, md)
        for yd in os.listdir(g2_root)
        if yd.startswith("y=")
        for md in os.listdir(os.path.join(g2_root, yd))
        if md.startswith("m=")
    ]
    g2_read = [(yd, md) for yd, md in g2_dirs if md == f"m={PE_QUERY_MONTH}"]

    def answer(df, gen, n_total, n_read):
        return df.agg(
            F.lit(gen).alias("gen"),
            F.lit(n_total).cast("long").alias("n_dirs_total"),
            F.lit(n_read).cast("long").alias("n_dirs_read"),
            F.count(F.lit(1)).alias("n_rows"),
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast(
                    "double"
                ),
                2,
            ).alias("revenue"),
        )

    # year-only generation: month can only be a row filter
    q1 = spark.read.parquet(g1_root).where(F.col("m") == PE_QUERY_MONTH)
    # year-month generation: month prunes partitions
    q2 = spark.read.parquet(g2_root).where(F.col("m") == PE_QUERY_MONTH)
    return answer(q1, "year-only", len(g1_dirs), len(g1_dirs)).unionByName(
        answer(q2, "year-month", len(g2_dirs), len(g2_read))
    )


# ---------------------------------------------- src_pydatasource_corpus

SYNTH_SRC_DOCS = 2000
SYNTH_SRC_PARTS = 8


@REG.op("src_pydatasource_corpus")  # rows-only BY DESIGN: the source
# GENERATES data (no sf_dir table exists for a SQL twin); the stats row
# is golden-pinned and partition-count-invariant in tests/test_storage.py
def src_pydatasource_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom Python DataSource under the gate — Spark 4's newest
    extension surface (pyspark.sql.datasource): a registered
    'zipfcorpus' format whose reader GENERATES the synthetic training
    corpus per partition on the executors (each partition owns a
    doc-id range; every doc is seeded by its own id, so the data is
    byte-identical under any partition count). The op reads
    {SYNTH_SRC_DOCS} docs in {SYNTH_SRC_PARTS} partitions and reduces
    them to one deterministic stats row: doc count, total characters,
    distinct words used, and an order-free XOR of per-doc xxhash64
    fingerprints — any generation drift, lost partition, or
    double-read flips the row. sf_dir is ignored (the source IS the
    data). See pydatasource.py for why generation-as-a-source matters
    at 100 TB: the driver never materializes the corpus; executors
    stream it partition-parallel, and the scan plans as a v2 data
    source, not a Python map stage."""
    from claim_analysis_engine_spark.pydatasource import register_zipfcorpus

    register_zipfcorpus(spark)
    docs = (
        spark.read.format("zipfcorpus")
        .option("n_docs", SYNTH_SRC_DOCS)
        .option("n_parts", SYNTH_SRC_PARTS)
        .load()
    )
    words = docs.select(F.explode(F.split("text", " ")).alias("w"))
    n_words = words.agg(F.countDistinct("w").alias("n_distinct_words"))
    return (
        docs.agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.length("text")).alias("total_chars"),
            F.bit_xor(F.xxhash64("text")).alias("text_hash_xor"),
        )
        .crossJoin(F.broadcast(n_words))
        .select("n_docs", "total_chars", "n_distinct_words", "text_hash_xor")
    )


# ---------------------------------------------- snk_pydatasource_jsonl

SNK_PYDS_SHARDS = 4  # write-side partitions -> one JSONL shard each


@REG.op(
    "snk_pydatasource_jsonl",
    oracle="""
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           min(md5(text)) AS min_md5,
           max(md5(text)) AS max_md5,
           CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_distinct_md5
    FROM documents GROUP BY lang
    """,
)
def snk_pydatasource_jsonl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The WRITE half of the Python DataSource surface (the engine
    already gates the batch reader and the streaming reader): the
    documents table flows through the registered 'jsonlshards' SINK —
    per-task `write` runs on the executors (one JSONL shard per
    partition), each task returns a commit message, and the
    driver-side `commit` publishes a manifest only after every task
    succeeded (two-phase commit: the protocol any external sink —
    feature store, search index, vendor API — needs; `abort` removes
    partial shards so a failed job is invisible to readers). The op
    then READS THE SHARDS BACK, checks the manifest row count against
    the read, and reduces to per-lang accounting the oracle recomputes
    from the source table directly — a dropped task, a torn shard, a
    JSON escaping bug, or a manifest drift flips the VALUES (content
    fidelity is carried by md5(text) computed BEFORE the sink and
    re-aggregated after the round trip).

    Scale: write parallelism is the input partitioning (shards ==
    tasks); the manifest is shard-count-sized; read-back is a plain
    distributed JSON scan with an explicit schema."""
    import json as _json
    import os

    from claim_analysis_engine_spark.pydatasource import (
        _MANIFEST,
        register_jsonlshards,
    )
    from claim_analysis_engine_spark.tmputil import fresh_dir

    register_jsonlshards(spark)
    out = fresh_dir("cae_spark_jsonlsink_")
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars", F.md5("text").alias("content_md5")
    )
    (
        docs.repartition(SNK_PYDS_SHARDS)
        .write.format("jsonlshards")
        .option("path", out)
        .mode("append")
        .save()
    )
    with open(os.path.join(out, _MANIFEST)) as fh:
        manifest = _json.load(fh)
    # read the DIRECTORY with a glob FILTER, not a glob PATH: Spark
    # status-probes a literal path for _spark_metadata before globbing
    # (FileStreamSink.hasMetadata), and a glob path makes that probe
    # log a swallowed FileNotFoundException stack trace on every read
    # — the unattributed py4j tail in the r12 bench artifact
    back = (
        spark.read.schema(
            "doc_id bigint, lang string, n_chars bigint, content_md5 string"
        )
        .option("pathGlobFilter", "shard-*.jsonl")
        .json(out)
    )
    n_back = back.count()
    if n_back != manifest["n_rows"]:
        raise RuntimeError(
            f"jsonl sink round-trip lost rows: manifest {manifest['n_rows']}"
            f" vs read-back {n_back}"
        )
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("sum_chars"),
        F.min("content_md5").alias("min_md5"),
        F.max("content_md5").alias("max_md5"),
        F.countDistinct("content_md5").cast("bigint").alias("n_distinct_md5"),
    )
