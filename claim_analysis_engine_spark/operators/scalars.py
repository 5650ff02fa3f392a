"""Scalar functions (SURVEY.md §2.8): date cascade/assembly/arith,
string cleaning, math, regression slope.

Every function here is a pure Column expression (whole-stage codegen,
no Python in the hot path). ANSI-safe on Spark 4: parsing goes through
try_to_timestamp / try_cast so malformed input yields null — matching
the reference's errors='coerce' behavior — instead of failing the job.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from claim_analysis_engine_spark.registry import OpRegistry
from claim_analysis_engine_spark.tables import load

REG = OpRegistry()


def parse_date_cascade(col: Column) -> Column:
    """Multi-format date parse: yyyy/MM/dd → yyyy-MM-dd → yyyy.MM.dd,
    failures → null (reference core/etl.py:149-178). Reused by etl.py."""
    return F.coalesce(
        F.try_to_timestamp(col, F.lit("yyyy/MM/dd")),
        F.try_to_timestamp(col, F.lit("yyyy-MM-dd")),
        F.try_to_timestamp(col, F.lit("yyyy.MM.dd")),
    ).cast("date")


@REG.op(
    "f_date_cascade",
    oracle="""
    WITH raw AS (
      SELECT o_orderkey,
             CASE o_orderkey % 4
               WHEN 0 THEN strftime(o_orderdate, '%Y/%m/%d')
               WHEN 1 THEN strftime(o_orderdate, '%Y-%m-%d')
               WHEN 2 THEN strftime(o_orderdate, '%Y.%m.%d')
               ELSE 'garbage-' || o_orderkey
             END AS date_str
      FROM orders
    )
    SELECT o_orderkey, date_str,
           CAST(coalesce(
             try_strptime(date_str, '%Y/%m/%d'),
             try_strptime(date_str, '%Y-%m-%d'),
             try_strptime(date_str, '%Y.%m.%d')) AS DATE)::VARCHAR AS parsed_date
    FROM raw
    """,
)
def f_date_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-format date-parse cascade with garbage → null
    (reference core/etl.py:149-178). Strings are synthesized from
    o_orderdate in a key-determined format, then parsed back."""
    raw = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 4 == 0, F.date_format("o_orderdate", "yyyy/MM/dd"))
        .when(F.col("o_orderkey") % 4 == 1, F.date_format("o_orderdate", "yyyy-MM-dd"))
        .when(F.col("o_orderkey") % 4 == 2, F.date_format("o_orderdate", "yyyy.MM.dd"))
        .otherwise(F.concat(F.lit("garbage-"), F.col("o_orderkey").cast("string")))
        .alias("date_str"),
    )
    return raw.select(
        "o_orderkey",
        "date_str",
        F.date_format(parse_date_cascade(F.col("date_str")), "yyyy-MM-dd").alias("parsed_date"),
    )


@REG.op(
    "f_date_assemble",
    oracle="""
    SELECT o_orderkey,
           make_date(year(o_orderdate), month(o_orderdate),
                     CASE WHEN o_orderkey % 10 = 0 THEN NULL
                          ELSE day(o_orderdate) END)::VARCHAR AS assembled
    FROM orders
    """,
)
def f_date_assemble(spark: SparkSession, sf_dir: str) -> DataFrame:
    """y+m+d parts → date, null if any part missing (reference assembles
    접수일자 only when all three parts present, core/etl.py:217-227)."""
    df = load(spark, sf_dir, "orders")
    day = F.when(F.col("o_orderkey") % 10 != 0, F.dayofmonth("o_orderdate"))
    return df.select(
        "o_orderkey",
        F.date_format(
            F.make_date(F.year("o_orderdate"), F.month("o_orderdate"), day), "yyyy-MM-dd"
        ).alias("assembled"),
    )


@REG.op(
    "f_date_ms",
    oracle="""
    WITH raw AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 2 = 0
                  THEN (CAST(date_diff('day', DATE '1970-01-01',
                            CAST(o_orderdate AS DATE)) AS BIGINT) + 5000) * 86400000
                  ELSE NULL END AS ms_val,
             CASE WHEN o_orderkey % 2 = 1
                  THEN strftime(o_orderdate, '%Y-%m-%d') ELSE NULL END AS str_val
      FROM orders
    )
    SELECT o_orderkey,
           CASE WHEN ms_val IS NOT NULL AND ms_val > 1000000000000
                THEN DATE '1970-01-01' + CAST(ms_val / 86400000 AS INT)
                ELSE CAST(try_strptime(str_val, '%Y-%m-%d') AS DATE)
           END::VARCHAR AS decoded_date
    FROM raw
    """,
)
def f_date_ms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch-ms heuristic: numeric > 1e12 → ms timestamp, else parse
    string (reference app.py:449-461 LOT 제조일 handling). Decoding is
    pure integer day arithmetic — timezone-independent, so driver
    session TZ can't skew the oracle compare. Synthesized ms values get
    a +5000-day offset so every even-key row crosses the 1e12 heuristic
    threshold and the ms-decode branch is actually exercised (testdata
    dates alone top out below 1e12 ms)."""
    df = load(spark, sf_dir, "orders")
    epoch_days = F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date"))
    raw = df.select(
        "o_orderkey",
        F.when(
            F.col("o_orderkey") % 2 == 0, (epoch_days.cast("bigint") + 5000) * 86400000
        ).alias("ms_val"),
        F.when(F.col("o_orderkey") % 2 == 1, F.date_format("o_orderdate", "yyyy-MM-dd")).alias(
            "str_val"
        ),
    )
    decoded = F.when(
        F.col("ms_val").isNotNull() & (F.col("ms_val") > 1_000_000_000_000),
        F.date_add(F.lit("1970-01-01").cast("date"), (F.col("ms_val") / 86400000).cast("int")),
    ).otherwise(F.try_to_timestamp(F.col("str_val"), F.lit("yyyy-MM-dd")).cast("date"))
    return raw.select(
        "o_orderkey", F.date_format(decoded, "yyyy-MM-dd").alias("decoded_date")
    )


@REG.op(
    "f_datediff",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber,
           CAST(date_diff('day', o.o_orderdate, l.l_shipdate) AS INT) AS lag_days,
           date_diff('day', o.o_orderdate, l.l_shipdate) >= 0 AS lag_valid
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    """,
)
def f_datediff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day difference + validity flag (reference Lag_Days/Lag_Valid,
    core/etl.py:259-265 — invalid rows flagged, never dropped)."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber", "l_shipdate")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    j = li.join(o, li.l_orderkey == o.o_orderkey)
    lag = F.datediff("l_shipdate", "o_orderdate")
    return j.select(
        "l_orderkey",
        "l_linenumber",
        lag.alias("lag_days"),
        (lag >= 0).alias("lag_valid"),
    )


@REG.op(
    "f_month_trunc",
    oracle="""
    SELECT o_orderkey, strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
           strftime(o_orderdate, '%Y-%m') AS month_str
    FROM orders
    """,
)
def f_month_trunc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month truncation + 'YYYY-MM' formatting (reference to_period('M')
    / strftime, core/storage.py:543-544, app.py:273)."""
    return load(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias("month_start"),
        F.date_format("o_orderdate", "yyyy-MM").alias("month_str"),
    )


@REG.op(
    "f_month_arith",
    oracle="""
    SELECT o_orderkey,
           strftime(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus3,
           strftime(CAST(o_orderdate AS DATE) - INTERVAL 13 MONTH, '%Y-%m-%d') AS minus13
    FROM orders
    """,
)
def f_month_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month add/subtract with year wrap (reference manual wrap loops /
    relativedelta, core/storage.py:425-431, app.py:549) — add_months
    handles wrap and end-of-month clamping natively."""
    d = F.col("o_orderdate").cast("date")
    return load(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.date_format(F.add_months(d, 3), "yyyy-MM-dd").alias("plus3"),
        F.date_format(F.add_months(d, -13), "yyyy-MM-dd").alias("minus13"),
    )


@REG.op(
    "f_days_in_month",
    oracle="""
    SELECT o_orderkey, day(last_day(CAST(o_orderdate AS DATE))) AS days_in_month,
           round(CAST(day(o_orderdate) AS DOUBLE)
                 / day(last_day(CAST(o_orderdate AS DATE))), 4) AS month_progress
    FROM orders
    """,
)
def f_days_in_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Days-in-month and month-progress ratio (reference partial-month
    velocity guard inputs, core/analytics.py:75-80, app.py:404-407)."""
    d = F.col("o_orderdate").cast("date")
    dim = F.dayofmonth(F.last_day(d))
    return load(spark, sf_dir, "orders").select(
        "o_orderkey",
        dim.alias("days_in_month"),
        F.round(F.dayofmonth(d).cast("double") / dim, 4).alias("month_progress"),
    )


@REG.op(
    "f_str_clean",
    oracle="""
    SELECT o_orderkey,
           trim('  ' || CAST(o_orderkey AS VARCHAR) || ' ') AS id_norm,
           lpad(CAST(month(o_orderdate) AS VARCHAR), 2, '0') AS month_pad,
           concat_ws('-', o_orderstatus, o_orderpriority) AS label,
           replace(o_orderpriority, '-', '_') AS replaced
    FROM orders
    """,
)
def f_str_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """strip / zfill / concat / replace (reference id normalize + month
    pad + label build, core/etl.py:206,217-225)."""
    df = load(spark, sf_dir, "orders")
    return df.select(
        "o_orderkey",
        F.trim(F.concat(F.lit("  "), F.col("o_orderkey").cast("string"), F.lit(" "))).alias(
            "id_norm"
        ),
        F.lpad(F.month("o_orderdate").cast("string"), 2, "0").alias("month_pad"),
        F.concat_ws("-", "o_orderstatus", "o_orderpriority").alias("label"),
        F.replace(F.col("o_orderpriority"), F.lit("-"), F.lit("_")).alias("replaced"),
    )


@REG.op(
    "f_str_sanitize",
    oracle=r"""
    SELECT p_partkey,
           regexp_replace(concat(p_name, '/v:1*x?'), '[\\/:*?"<>|]', '-', 'g')
             AS safe_name
    FROM part
    """,
)
def f_str_sanitize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filename sanitizer: forbidden chars → '-' (reference series-doc
    filename sanitize regex, core/storage.py:465-469)."""
    dirty = F.concat(F.col("p_name"), F.lit("/v:1*x?"))
    return load(spark, sf_dir, "part").select(
        "p_partkey",
        F.regexp_replace(dirty, r'[\\/:*?"<>|]', "-").alias("safe_name"),
    )


@REG.op(
    "f_str_parse_label",
    oracle="""
    SELECT o_orderkey,
           concat(o_orderstatus, ' > ', o_orderpriority) AS composite,
           str_split(concat(o_orderstatus, ' > ', o_orderpriority), ' > ')[1] AS part1,
           str_split(concat(o_orderstatus, ' > ', o_orderpriority), ' > ')[2] AS part2
    FROM orders
    """,
)
def f_str_parse_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite-label build + split (reference '유형'.split(' > ') and
    trend-string round trip, app.py:563-566,303-304)."""
    composite = F.concat("o_orderstatus", F.lit(" > "), "o_orderpriority")
    parts = F.split(composite, " > ")
    return load(spark, sf_dir, "orders").select(
        "o_orderkey",
        composite.alias("composite"),
        parts.getItem(0).alias("part1"),
        parts.getItem(1).alias("part2"),
    )


@REG.op(
    "f_math",
    oracle="""
    SELECT o_orderkey,
           round(o_totalprice, 1) AS rounded,
           round(100.0 * o_totalprice / sum(o_totalprice) OVER (), 4) AS share_pct,
           greatest(o_totalprice - 100000, 0) AS clipped_low,
           least(o_totalprice, 200000) AS clipped_high
    FROM orders
    """,
)
def f_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """round / pct share / clip via greatest-least (reference score
    clipping max(0,·) min(100,·), core/analytics.py:127, app.py:361).

    The global total is a 1-row aggregate broadcast back into the scan
    (never an unpartitioned window, which would funnel the whole fact
    table through a single partition)."""
    df = load(spark, sf_dir, "orders")
    total = df.agg(F.sum("o_totalprice").alias("_grand_total"))
    return (
        df.crossJoin(F.broadcast(total))
        .select(
            "o_orderkey",
            F.round("o_totalprice", 1).alias("rounded"),
            F.round(F.lit(100.0) * F.col("o_totalprice") / F.col("_grand_total"), 4).alias(
                "share_pct"
            ),
            F.greatest(F.col("o_totalprice") - 100000, F.lit(0.0)).alias("clipped_low"),
            F.least(F.col("o_totalprice"), F.lit(200000.0)).alias("clipped_high"),
        )
    )


@REG.op(
    "f_polyfit_slope",
    oracle="""
    WITH monthly AS (
      SELECT o_orderstatus,
             (year(o_orderdate) - 1995) * 12 + month(o_orderdate) AS t,
             CAST(count(*) AS DOUBLE) AS n
      FROM orders GROUP BY 1, 2
    )
    SELECT o_orderstatus, round(regr_slope(n, t), 6) AS slope
    FROM monthly GROUP BY o_orderstatus
    """,
)
def f_polyfit_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-regression slope over a monthly series (reference
    np.polyfit(x,y,1)[0], core/storage.py:491-500) — built-in
    regr_slope aggregate, no UDF."""
    monthly = (
        load(spark, sf_dir, "orders")
        .groupBy(
            "o_orderstatus",
            ((F.year("o_orderdate") - 1995) * 12 + F.month("o_orderdate")).alias("t"),
        )
        .agg(F.count(F.lit(1)).cast("double").alias("n"))
    )
    return monthly.groupBy("o_orderstatus").agg(
        F.round(F.regr_slope("n", "t"), 6).alias("slope")
    )
