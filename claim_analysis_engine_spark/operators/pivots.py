"""Pivot / unpivot / subtotal / spine operators (SURVEY.md §2.6).

The reference renders month-pivoted tables with subtotal rows and a
zero-filled month spine; Spark-side these are groupBy().pivot(),
ROLLUP with grouping() labels, unpivot(), and a sequence()-generated
month spine left-joined to the counts.

Scale notes: pivot with an explicit value list avoids the extra
distinct-scan Spark otherwise runs; the spine is a few hundred rows
built from one min/max agg — broadcast to the counts, never the other
way round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from claim_analysis_engine_spark.registry import OpRegistry
from claim_analysis_engine_spark.tables import load

REG = OpRegistry()

_MONTH_COLS = [f"m{m:02d}" for m in range(1, 13)]


@REG.op(
    "pvt_months",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           {cols}
    FROM lineitem WHERE year(l_shipdate) = 1997
    GROUP BY l_returnflag, l_linestatus
    """.format(
        cols=",\n           ".join(
            f"count(*) FILTER (month(l_shipdate) = {m}) AS m{m:02d}"
            for m in range(1, 13)
        )
    ),
)
def pvt_months(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Months → columns pivot with zero-fill (reference
    pivot_table(columns=접수월, fill_value=0), app.py:281-282).
    Explicit month value list: no distinct pre-scan, stable columns.

    r14 (guide §6): the year()==1997 predicate wrapped the column in a
    function, so nothing reached PushedFilters. The equivalent
    half-open timestamp range pushes down to the parquet scan (row
    groups outside 1997 are skipped by min/max stats at scale) and
    replaces a per-row year extraction with two long compares."""
    df = (
        load(spark, sf_dir, "lineitem")
        .where(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
        )
        .withColumn("m", F.month("l_shipdate"))
        .groupBy("l_returnflag", "l_linestatus")
        .pivot("m", list(range(1, 13)))
        .count()
    )
    for m in range(1, 13):
        df = df.withColumnRenamed(str(m), f"m{m:02d}")
    return df.na.fill(0, _MONTH_COLS)


@REG.op(
    "pvt_subtotals",
    oracle="""
    SELECT coalesce(l_returnflag, 'Total') AS return_flag,
           CASE WHEN GROUPING(l_linestatus) = 1 AND GROUPING(l_returnflag) = 0
                THEN '소계'
                WHEN GROUPING(l_returnflag) = 1 THEN ''
                ELSE l_linestatus END AS line_status,
           count(*) AS n,
           round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS amount
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def pvt_subtotals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subtotal + grand-total rows (reference hand-built 소계/전체 합계
    rows, pages/3_플랜트_분석.py:270-326) — native ROLLUP with
    grouping() flags mapped to the reference's labels.

    r14 (guide §2.3 "aggregate before you shuffle"): ROLLUP's Expand
    used to triple every input row BEFORE the first aggregate (3
    grouping sets × 600k rows at sf0.1, each paying a decimal add in
    the scan task — which is ONE task here, the files are single row
    groups). Pre-aggregating by the full key first collapses the input
    to |flag×status| rows (~6), then the rollup expands THOSE. Exact
    equivalence: count and decimal sum are reassociative (two-level
    grouping-sets rewrite); the grand-total row of an EMPTY input keeps
    n=0 via the coalesce (sum over zero rows is NULL where count(*)
    was 0). Measured 1.56 → ~0.5 s; plan diff: Expand moves above the
    first HashAggregate, scan-stage rows 1.8M → 600k."""
    df = load(spark, sf_dir, "lineitem")
    base = df.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("_amt"),
    )
    g_flag = F.grouping("l_returnflag")
    g_stat = F.grouping("l_linestatus")
    return (
        base.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.coalesce(F.sum("_n"), F.lit(0).cast("bigint")).alias("n"),
            F.round(F.sum("_amt").cast("double"), 2).alias("amount"),
            g_flag.alias("_gf"),
            g_stat.alias("_gs"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("Total")).alias("return_flag"),
            F.when((F.col("_gs") == 1) & (F.col("_gf") == 0), F.lit("소계"))
            .when(F.col("_gf") == 1, F.lit(""))
            .otherwise(F.col("l_linestatus"))
            .alias("line_status"),
            "n",
            "amount",
        )
    )


@REG.op(
    "unpvt_melt",
    oracle="""
    SELECT l_orderkey, l_linenumber, 'quantity' AS measure,
           l_quantity AS value
    FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'extendedprice' AS measure,
           l_extendedprice AS value
    FROM lineitem
    """,
)
def unpvt_melt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide → long unpivot (reference melt(id_vars=[ID,플랜트]),
    pages/2_매출수량_관리.py:127-142) — native unpivot, no shuffle."""
    return (
        load(spark, sf_dir, "lineitem")
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_quantity",
            "l_extendedprice",
        )
        .withColumnRenamed("l_quantity", "quantity")
        .withColumnRenamed("l_extendedprice", "extendedprice")
        .unpivot(
            ["l_orderkey", "l_linenumber"],
            ["quantity", "extendedprice"],
            "measure",
            "value",
        )
    )


@REG.op(
    "pvt_hybrid",
    oracle="""
    WITH monthly AS (
      SELECT l_returnflag, year(l_shipdate) AS y, month(l_shipdate) AS m,
             count(*) AS n
      FROM lineitem GROUP BY 1, 2, 3
    )
    SELECT l_returnflag,
           CAST(concat(coalesce(CAST(sum(n) FILTER (y = 1995) AS BIGINT), 0), '(',
                  coalesce(round(avg(n) FILTER (y = 1995), 1), 0.0), ')') AS VARCHAR) AS y1995,
           CAST(concat(coalesce(CAST(sum(n) FILTER (y = 1996) AS BIGINT), 0), '(',
                  coalesce(round(avg(n) FILTER (y = 1996), 1), 0.0), ')') AS VARCHAR) AS y1996,
           CAST(sum(n) FILTER (y = 1997 AND m = 1) AS BIGINT) AS m1997_01,
           CAST(sum(n) FILTER (y = 1997 AND m = 2) AS BIGINT) AS m1997_02,
           CAST(sum(n) FILTER (y = 1997 AND m = 3) AS BIGINT) AS m1997_03
    FROM monthly GROUP BY l_returnflag
    """,
)
def pvt_hybrid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid wide view: old years collapsed to 'sum(avg)' text columns,
    recent months raw (reference pages/3_플랜트_분석.py:335-371)."""
    monthly = (
        load(spark, sf_dir, "lineitem")
        .groupBy(
            "l_returnflag",
            F.year("l_shipdate").alias("y"),
            F.month("l_shipdate").alias("m"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )

    def year_text(y: int):
        # coalesce before concat: an empty year bucket must render as
        # "0(0.0)" — bare concat would yield NULL on Spark but not on
        # engines that treat NULL as '' (oracle mirrors the coalesce)
        cond = F.col("y") == y
        s = F.coalesce(F.sum(F.when(cond, F.col("n"))).cast("bigint"), F.lit(0))
        a = F.coalesce(F.round(F.avg(F.when(cond, F.col("n"))), 1), F.lit(0.0))
        return F.concat(s.cast("string"), F.lit("("), a.cast("string"), F.lit(")"))

    def month_raw(y: int, m: int):
        return F.sum(F.when((F.col("y") == y) & (F.col("m") == m), F.col("n"))).cast(
            "bigint"
        )

    return monthly.groupBy("l_returnflag").agg(
        year_text(1995).alias("y1995"),
        year_text(1996).alias("y1996"),
        month_raw(1997, 1).alias("m1997_01"),
        month_raw(1997, 2).alias("m1997_02"),
        month_raw(1997, 3).alias("m1997_03"),
    )


@REG.op(
    "spine_zero",
    oracle="""
    WITH RECURSIVE bounds AS (
      SELECT date_trunc('month', min(o_orderdate)) AS lo,
             date_trunc('month', max(o_orderdate)) AS hi
      FROM orders
    ), months(month_d) AS (
      SELECT lo FROM bounds
      UNION ALL
      SELECT month_d + INTERVAL 1 MONTH FROM months, bounds WHERE month_d < hi
    ), spine AS (
      SELECT strftime(month_d, '%Y-%m') AS month FROM months
    ), statuses AS (SELECT DISTINCT o_orderstatus AS status FROM orders),
    counts AS (
      SELECT o_orderstatus AS status, strftime(o_orderdate, '%Y-%m') AS month,
             count(*) AS n
      FROM orders GROUP BY 1, 2
    )
    SELECT s.status, sp.month, CAST(coalesce(c.n, 0) AS BIGINT) AS n
    FROM statuses s CROSS JOIN spine sp
    LEFT JOIN counts c ON c.status = s.status AND c.month = sp.month
    """,
)
def spine_zero(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-spine zero-fill: every (group, month) in the global
    min..max span gets a row, absent months count 0 (reference series
    reindex onto global spine, core/storage.py:472-483,567-571).
    Spine built with sequence()+explode from one min/max agg —
    broadcast-joined; the fact side shuffles once for the count."""
    orders = load(spark, sf_dir, "orders")
    bounds = orders.agg(
        F.date_trunc("month", F.min("o_orderdate")).cast("date").alias("lo"),
        F.date_trunc("month", F.max("o_orderdate")).cast("date").alias("hi"),
    )
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 month"))).alias("month_d")
    )
    statuses = orders.select(F.col("o_orderstatus").alias("status")).distinct()
    # r14 (guide §2.3): group the fact side on the truncated-month DATE
    # (integer math, 4-byte key) instead of a per-row formatted string —
    # the formatter now runs once per spine/grid row (~hundreds), not
    # once per fact row in the single-task scan stage. Join key is the
    # month date; 'yyyy-MM' rendering happens after the join, so values
    # are byte-identical to the formatted-string grouping.
    counts = orders.groupBy(
        F.col("o_orderstatus").alias("status"),
        F.date_trunc("month", "o_orderdate").cast("date").alias("month_d"),
    ).agg(F.count(F.lit(1)).alias("n_raw"))
    grid = statuses.crossJoin(F.broadcast(spine))
    return grid.join(counts, ["status", "month_d"], "left").select(
        "status",
        F.date_format("month_d", "yyyy-MM").alias("month"),
        F.coalesce("n_raw", F.lit(0)).alias("n"),
    )


# ------------------------------------------------------------ pvt_cube

@REG.op(
    "pvt_cube",
    oracle="""
    WITH t AS (
      SELECT l_returnflag, CAST(year(l_shipdate) AS INT) AS ship_year,
             l_quantity
      FROM lineitem
    )
    SELECT coalesce(l_returnflag, '(all)') AS return_flag,
           coalesce(CAST(ship_year AS VARCHAR), '(all)') AS ship_year,
           GROUPING(l_returnflag, ship_year) AS gid,
           count(*) AS n,
           round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2)
             AS qty_total
    FROM t GROUP BY CUBE (l_returnflag, ship_year)
    """,
)
def pvt_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full CUBE over (return flag, ship year) — every subtotal
    combination plus the grand total in one pass, the grouping-sets
    analog §2.6's ROLLUP op doesn't cover. Spark expands the cube into
    grouping sets inside a single hash aggregate (partial map-side
    combine per set), and grouping_id disambiguates real NULLs from
    subtotal rows — both engines agree on the bitmask (left key =
    high bit; verified). At 100 TB a cube over low-cardinality dims is
    one shuffle of |sets| × |groups| combined rows, not |input|."""
    df = load(spark, sf_dir, "lineitem").select(
        "l_returnflag", F.year("l_shipdate").alias("ship_year"), "l_quantity"
    )
    return (
        df.cube("l_returnflag", "ship_year")
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double"), 2
            ).alias("qty_total"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("(all)")).alias("return_flag"),
            F.coalesce(F.col("ship_year").cast("string"), F.lit("(all)")).alias(
                "ship_year"
            ),
            "gid",
            "n",
            "qty_total",
        )
    )
