"""Canonical ETL chain (reference core/etl.py): canonicalizing
projection to the 54-field contract, cascade date parsing, reception-
date assembly, keep-last dedup with an explicit sequence, and lag
derivation. Pure Column transformations — composable with any source.

Every step is declarative DataFrame API, so Catalyst prunes unused
canonical columns right back out when a downstream query only reads a
few — canonicalizing to 54 columns costs nothing at scan time unless
all 54 are consumed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from claim_analysis_engine_spark.config import CANONICAL_COLS, KOREAN_TO_ASCII


def canonicalize(df: DataFrame, keep: tuple[str, ...] = ()) -> DataFrame:
    """Reindex any input frame to exactly the 54 canonical columns
    (reference extract_54_fields, core/etl.py:50-71): Korean source
    names map through the alias table, missing fields become typed
    nulls, extra columns are dropped. 1 row in = 1 row out. ``keep``
    names passthrough metadata columns (e.g. an ingest load_seq) to
    carry alongside the canonical 54."""
    renamed = df
    for kr, en in KOREAN_TO_ASCII.items():
        if kr in df.columns:
            renamed = renamed.withColumnRenamed(kr, en)
    present = set(renamed.columns)
    return renamed.select(
        *[
            (F.col(c).cast("string") if c in present else F.lit(None).cast("string")).alias(c)
            for c in CANONICAL_COLS
        ],
        *[F.col(c) for c in keep],
    )


def safe_date_parse(col: Column) -> Column:
    """3-format cascade parse: yyyy/MM/dd → yyyy-MM-dd → yyyy.MM.dd,
    unparseable → null (reference safe_date_parse, core/etl.py:149-178)."""
    return F.coalesce(
        F.try_to_timestamp(col, F.lit("yyyy/MM/dd")).cast("date"),
        F.try_to_timestamp(col, F.lit("yyyy-MM-dd")).cast("date"),
        F.try_to_timestamp(col, F.lit("yyyy.MM.dd")).cast("date"),
    )


def assemble_reception_date(year: Column, month: Column, day: Column) -> Column:
    """y+m+d → date only when all three parts are numeric-coercible
    (reference core/etl.py:217-227); make_date nulls invalid calendar
    combinations the way the reference's strict %Y-%m-%d parse does."""
    y = year.cast("int")
    m = month.cast("int")
    d = day.cast("int")
    return F.when(
        y.isNotNull() & m.isNotNull() & d.isNotNull(), F.make_date(y, m, d)
    )


def preprocess(df: DataFrame, load_seq: str | None = None) -> DataFrame:
    """The reference preprocess_data chain (core/etl.py:181-280) on a
    canonicalized frame:

    1. trim claim_id, drop null-id rows (flag-don't-drop applies to
       lag validity, NOT to the primary key);
    2. keep-LAST dedup per claim_id — ordered by the explicit
       ``load_seq`` column (callers ingesting multiple uploads must
       provide one; pandas relied on implicit row order, which a
       distributed engine must never do — SURVEY §7 hard parts);
    3. assemble reception_date from y/m/d parts;
    4. cascade-parse manufacture_date / expiry_date;
    5. lag_days = reception − manufacture (days); lag_valid = both
       present AND lag ≥ 0 — invalid rows are FLAGGED, never dropped;
    6. coerce partition ints reception_year/month, backfilled from
       reception_date only when the source column is entirely null
       (reference core/etl.py:270-277 all-NaN backfill).
    """
    out = df.withColumn("claim_id", F.trim("claim_id")).where(
        F.col("claim_id").isNotNull() & (F.col("claim_id") != "")
    )
    if load_seq is None:
        load_seq = "_load_seq"
        out = out.withColumn(load_seq, F.lit(0))
    w = W.partitionBy("claim_id").orderBy(F.col(load_seq).desc())
    out = (
        out.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )

    out = out.withColumn(
        "reception_date",
        assemble_reception_date(
            F.col("reception_year"), F.col("reception_month"), F.col("reception_day")
        ),
    )
    out = out.withColumn("manufacture_date_parsed", safe_date_parse(F.col("manufacture_date")))
    out = out.withColumn("expiry_date_parsed", safe_date_parse(F.col("expiry_date")))

    lag = F.datediff("reception_date", "manufacture_date_parsed")
    out = out.withColumn("lag_days", lag).withColumn(
        "lag_valid",
        F.col("reception_date").isNotNull()
        & F.col("manufacture_date_parsed").isNotNull()
        & (lag >= 0),
    )

    # partition ints; backfill from reception_date only when the whole
    # source column is null (global 1-row aggregate, broadcast back)
    counts = out.agg(
        F.count("reception_year").alias("_n_year"),
        F.count("reception_month").alias("_n_month"),
    )
    out = (
        out.crossJoin(F.broadcast(counts))
        .withColumn(
            "reception_year",
            F.when(
                F.col("_n_year") == 0, F.year("reception_date")
            ).otherwise(F.col("reception_year").cast("int")),
        )
        .withColumn(
            "reception_month",
            F.when(
                F.col("_n_month") == 0, F.month("reception_date")
            ).otherwise(F.col("reception_month").cast("int")),
        )
        .drop("_n_year", "_n_month")
    )
    return out
