"""Sales-table operators: trailing-3-month gap estimation, the PPM
quality metric, Smart-Sync style exog alignment (SURVEY.md §1.3, §2.4
join_exog_align, and the documented-but-absent PPM from SURVEY §0).

The sales stand-in derives from the driver tables: monthly order
counts per plant (o_orderstatus) play the claims side; lineitem
quantity sums play the sales/exog side. Money/quantity sums go through
DECIMAL so they are exact and shuffle-order-independent.

Scale notes: gap fill is one window per plant ordered by month (rows
between -3 and -1) over an already-aggregated frame; PPM and exog
alignment are (year, month) key joins — the dimension side is months
(tiny) and broadcasts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from claim_analysis_engine_spark.registry import OpRegistry
from claim_analysis_engine_spark.tables import load

REG = OpRegistry()

_SALES_CTE = """
    sales AS (
      SELECT o_orderstatus AS plant,
             year(o_orderdate) AS y, month(o_orderdate) AS m,
             CASE WHEN (year(o_orderdate) * 12 + month(o_orderdate)) % 7 = 0
                  THEN NULL
                  ELSE count(*) END AS qty
      FROM orders GROUP BY 1, 2, 3
    )
"""


# ------------------------------------------------------ sales_gap_fill

@REG.op(
    "sales_gap_fill",
    oracle="WITH " + _SALES_CTE + """
    SELECT plant, y, m,
           round(coalesce(CAST(qty AS DOUBLE),
                 avg(CAST(qty AS DOUBLE)) OVER (
                   PARTITION BY plant ORDER BY y * 12 + m
                   ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING)), 4) AS qty_filled,
           (qty IS NULL AND avg(CAST(qty AS DOUBLE)) OVER (
              PARTITION BY plant ORDER BY y * 12 + m
              ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING) IS NOT NULL)
             AS is_estimated
    FROM sales
    """,
)
def sales_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sales gap estimation (reference core/storage.py:364-458): rows
    with missing quantity are filled with the SAME plant's trailing
    3-calendar-month mean (month arithmetic with year wrap — here the
    y*12+m ordering over a gap-free monthly frame) and flagged
    is_estimated. Nulls in the lookback window are skipped, exactly
    like the reference's collect-found-values loop. Every 7th month is
    nulled in the stand-in so the fill path is genuinely exercised."""
    o = load(spark, sf_dir, "orders")
    sales = (
        o.groupBy(
            F.col("o_orderstatus").alias("plant"),
            F.year("o_orderdate").alias("y"),
            F.month("o_orderdate").alias("m"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            "plant",
            "y",
            "m",
            F.when((F.col("y") * 12 + F.col("m")) % 7 == 0, None)
            .otherwise(F.col("cnt"))
            .alias("qty"),
        )
    )
    w = (
        W.partitionBy("plant")
        .orderBy(F.col("y") * 12 + F.col("m"))
        .rowsBetween(-3, -1)
    )
    trailing = F.avg(F.col("qty").cast("double")).over(w)
    return sales.select(
        "plant",
        "y",
        "m",
        F.round(F.coalesce(F.col("qty").cast("double"), trailing), 4).alias("qty_filled"),
        (F.col("qty").isNull() & trailing.isNotNull()).alias("is_estimated"),
    )


# ---------------------------------------------------------------- ppm

@REG.op(
    "ppm",
    oracle="""
    WITH claims AS (
      SELECT o_orderstatus AS plant,
             year(o_orderdate) AS y, month(o_orderdate) AS m,
             count(*) AS n_claims
      FROM orders GROUP BY 1, 2, 3
    ),
    qty AS (
      SELECT year(l_shipdate) AS y, month(l_shipdate) AS m,
             sum(CAST(l_quantity AS DECIMAL(18,2))) AS sales_qty
      FROM lineitem GROUP BY 1, 2
    )
    SELECT c.plant, c.y, c.m, c.n_claims,
           round(CAST(q.sales_qty AS DOUBLE), 2) AS sales_qty,
           round(c.n_claims * 1000000.0 / CAST(q.sales_qty AS DOUBLE), 4) AS ppm
    FROM claims c JOIN qty q ON q.y = c.y AND q.m = c.m
    """,
)
def ppm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PPM = claims / sales_qty × 1,000,000 — the reference's
    documented-but-never-implemented headline metric (SURVEY §0;
    reports/phase2_adaptive_report.md:150-180): monthly claim counts
    joined to monthly sales quantity on the (year, month) key. The
    month-level quantity side is tiny and broadcasts."""
    claims = (
        load(spark, sf_dir, "orders")
        .groupBy(
            F.col("o_orderstatus").alias("plant"),
            F.year("o_orderdate").alias("y"),
            F.month("o_orderdate").alias("m"),
        )
        .agg(F.count(F.lit(1)).alias("n_claims"))
    )
    qty = (
        load(spark, sf_dir, "lineitem")
        .groupBy(F.year("l_shipdate").alias("y"), F.month("l_shipdate").alias("m"))
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("sales_qty"))
    )
    return claims.join(F.broadcast(qty), ["y", "m"]).select(
        "plant",
        "y",
        "m",
        "n_claims",
        # DECIMAL keeps the sum exact and shuffle-order-independent; the
        # OUTPUT casts to rounded DOUBLE because Spark decimals render as
        # "18820.00" vs DuckDB/pandas "18820.0" — a driver hash mismatch
        # on numerically equal values
        F.round(F.col("sales_qty").cast("double"), 2).alias("sales_qty"),
        F.round(
            F.col("n_claims") * 1_000_000.0 / F.col("sales_qty").cast("double"), 4
        ).alias("ppm"),
    )


# ------------------------------------------------------ join_exog_align

@REG.op(
    "join_exog_align",
    oracle="""
    WITH claims AS (
      SELECT o_orderstatus AS plant,
             year(o_orderdate) AS y, month(o_orderdate) AS m,
             count(*) AS n_claims
      FROM orders GROUP BY 1, 2, 3
    ),
    exog AS (
      SELECT year(l_shipdate) AS y, month(l_shipdate) AS m,
             sum(CAST(l_quantity AS DECIMAL(18,2))) AS exog_qty
      FROM lineitem GROUP BY 1, 2
    )
    SELECT c.plant, c.y, c.m, c.n_claims,
           round(CAST(coalesce(e.exog_qty, 0) AS DOUBLE), 2) AS exog_qty
    FROM claims c LEFT JOIN exog e ON e.y = c.y AND e.m = c.m
    """,
)
def join_exog_align(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exogenous-series alignment as a PROPER (year, month) key join —
    a deliberate, documented improvement over the reference's
    positional .iloc alignment (pages/4_예측_시뮬레이션.py:88-101,
    models.py:242-244), which silently misaligns when either series
    has a gap. Missing exog months coalesce to 0 (the reference pads
    with zeros)."""
    claims = (
        load(spark, sf_dir, "orders")
        .groupBy(
            F.col("o_orderstatus").alias("plant"),
            F.year("o_orderdate").alias("y"),
            F.month("o_orderdate").alias("m"),
        )
        .agg(F.count(F.lit(1)).alias("n_claims"))
    )
    exog = (
        load(spark, sf_dir, "lineitem")
        .groupBy(F.year("l_shipdate").alias("y"), F.month("l_shipdate").alias("m"))
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("exog_qty"))
    )
    return claims.join(F.broadcast(exog), ["y", "m"], "left").select(
        "plant",
        "y",
        "m",
        "n_claims",
        # rounded-DOUBLE output for driver-hash parity (see ppm above)
        F.round(
            F.coalesce("exog_qty", F.lit(0).cast("decimal(18,2)")).cast("double"), 2
        ).alias("exog_qty"),
    )


# ------------------------------------------------- agg_discount_elasticity

@REG.op(
    "agg_discount_elasticity",
    oracle="""
    SELECT l_returnflag AS flag, count(*) AS n,
           round(regr_slope(l_quantity, l_discount), 4) AS qty_per_discount,
           round(corr(l_quantity, l_discount), 4) AS correlation,
           round(avg(l_discount), 4) AS mean_discount,
           round(avg(l_quantity), 4) AS mean_qty
    FROM lineitem GROUP BY 1
    """,
)
def agg_discount_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discount elasticity per return flag: OLS slope of quantity on
    discount (units moved per point of discount) with the correlation
    beside it — the does-discounting-work panel, and the engine's ANSI
    regression-aggregate surface (regr_slope / corr are built-in
    mergeable aggregates in BOTH engines: partial sums of x, y, xy,
    x², map-side combinable like any sum — the 100 TB plan is one
    aggregate exchange on the tiny flag key).

    Parity: both engines reduce the same (x, y) pairs through the
    same moment formulas; fold-order ulp drift over 60k rows sits ~10
    orders below the round(4) quantum."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy(F.col("l_returnflag").alias("flag")).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.regr_slope("l_quantity", "l_discount"), 4).alias(
            "qty_per_discount"
        ),
        F.round(F.corr("l_quantity", "l_discount"), 4).alias("correlation"),
        F.round(F.avg("l_discount"), 4).alias("mean_discount"),
        F.round(F.avg("l_quantity"), 4).alias("mean_qty"),
    )


# ----------------------------------------------------------- agg_cycle_time

@REG.op(
    "agg_cycle_time",
    oracle="""
    WITH c AS (
        SELECT o.o_orderpriority AS priority,
               date_diff('day', o.o_orderdate, max(l.l_shipdate)) AS cycle_d
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        GROUP BY o.o_orderkey, o.o_orderpriority, o.o_orderdate
    )
    SELECT priority, count(*) AS n_orders,
           round(avg(cycle_d), 4) AS mean_days,
           round(quantile_cont(cycle_d, 0.5), 4) AS p50_days,
           round(quantile_cont(cycle_d, 0.95), 4) AS p95_days,
           CAST(max(cycle_d) AS BIGINT) AS max_days
    FROM c GROUP BY 1
    """,
)
def agg_cycle_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-last-shipment cycle time per priority: mean, exact
    median, exact p95, max — the fulfillment SLA panel (did URGENT
    actually ship faster?), and the claims-domain sibling of the
    reference's reception-lag stats (agg_lag_stats) computed on the
    order lifecycle instead of the intake lag.

    One orderkey-grain aggregate (max shipdate per order — map-side
    combinable), then the exact percentiles over the per-order frame
    group on the 5-value priority key; integer day counts interpolate
    identically in both engines, round(4) on the interpolated values."""
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_orderdate"
    )
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    # r14 (guide §2.3 "aggregate before you shuffle"): reduce lineitem
    # to its orderkey grain BEFORE attaching order attributes — the
    # exchange now carries ~|orders| narrow (key, max-date) rows
    # instead of ~|lineitem| rows widened by priority+orderdate, and
    # the map-side max combines 4:1 before the wire. Equivalent to the
    # join-then-group form because o_orderkey is the orders primary
    # key (each group held exactly one order's attributes). Measured
    # 0.90 s → 0.46 s on the ep10 twin, rows identical.
    last = li.groupBy("l_orderkey").agg(F.max("l_shipdate").alias("last_ship"))
    c = last.join(o, last.l_orderkey == o.o_orderkey).select(
        F.col("o_orderpriority").alias("priority"),
        F.datediff("last_ship", "o_orderdate").alias("cycle_d"),
    )
    return c.groupBy("priority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.avg("cycle_d"), 4).alias("mean_days"),
        F.round(F.percentile("cycle_d", F.lit(0.5)), 4).alias("p50_days"),
        F.round(F.percentile("cycle_d", F.lit(0.95)), 4).alias("p95_days"),
        F.max("cycle_d").cast("long").alias("max_days"),
    )


# ---------------------------------------------------- agg_backtest_snaive

@REG.op(
    "agg_backtest_snaive",
    oracle="""
    WITH m AS (
        SELECT c.c_mktsegment AS segment,
               CAST(year(o.o_orderdate) * 12 + month(o.o_orderdate) AS BIGINT)
                 AS serial,
               CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100)
                    AS BIGINT) AS cents
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        GROUP BY 1, 2
    ), bt AS (
        SELECT cur.segment,
               abs(cur.cents - prev.cents) * 10000 // cur.cents AS ape_bp,
               CASE WHEN prev.cents > cur.cents THEN 1 ELSE 0 END AS over
        FROM m cur JOIN m prev
          ON prev.segment = cur.segment AND prev.serial = cur.serial - 12
        WHERE cur.cents > 0
    )
    SELECT segment,
           CAST(count(*) AS BIGINT) AS n_backtests,
           CAST(sum(ape_bp) // count(*) AS BIGINT) AS mape_bp,
           CAST(sum(over) AS BIGINT) AS n_over_forecast
    FROM bt GROUP BY 1
    """,
)
def agg_backtest_snaive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-origin BACKTEST of the seasonal-naive forecaster
    (ŷ(m) = y(m−12)) over monthly revenue per market segment — the
    accuracy floor every model in the ml_* family must beat before it
    earns compute (the reference tunes SARIMAX/GBDT/LSTM but ships no
    baseline to beat; this op is that missing yardstick, and unlike
    the learned models it is exactly SQL-expressible, so it gets a
    hash gate, not a rows-only check). Per segment: backtest count,
    mean absolute percentage error in integer basis points, and how
    many months the naive forecast OVERSHOT (bias direction). All
    arithmetic is integer cents and floor divisions — no float
    boundary can re-grade a month in one engine only.

    The 12-month alignment is a self-JOIN on month serial, not
    lag(12) over a window: a gap month would silently misalign lag's
    row offset, while serial−12 is calendar-exact under sparsity.

    Scale: the fact table aggregates straight to the (segment, month)
    grain — the self-join and the rollup run on frames of a few
    hundred rows regardless of fact size; one fact shuffle total."""
    o = load(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    )
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    m = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("c_mktsegment").alias("segment"),
            (F.year("o_orderdate") * 12 + F.month("o_orderdate"))
            .cast("long")
            .alias("serial"),
        )
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)") * 100)
            .cast("long")
            .alias("cents")
        )
    )
    # r14 (guide §2.4): the self-join planned m's whole subtree twice —
    # the orders⋈customer join + aggregate each ran two times. A range
    # window over (segment, serial) with frame [-12, -12] reads the
    # cents at EXACTLY serial−12 (serials are unique per segment — the
    # group key — so max() over the singleton frame IS that row, null
    # when the month is absent), which keeps the calendar-exact
    # sparsity semantics of the join while running the fact subtree
    # once. Inner-join semantics preserved by the isNotNull filter;
    # all arithmetic stays integer so no float boundary can move.
    wm = W.partitionBy("segment").orderBy("serial").rangeBetween(-12, -12)
    bt = (
        m.withColumn("prev_cents", F.max("cents").over(wm))
        .where(F.col("prev_cents").isNotNull() & (F.col("cents") > 0))
        .select(
            "segment",
            F.expr("abs(cents - prev_cents) * 10000 div cents").alias("ape_bp"),
            F.when(F.col("prev_cents") > F.col("cents"), 1)
            .otherwise(0)
            .alias("over"),
        )
    )
    return bt.groupBy("segment").agg(
        F.count(F.lit(1)).alias("n_backtests"),
        F.expr("CAST(sum(ape_bp) AS BIGINT) div count(*)").alias("mape_bp"),
        F.sum("over").alias("n_over_forecast"),
    )


# ------------------------------------------------ sales_interpolate_linear

INTERP_BUCKETS = 100  # sparse demand grain: ~40-60% of months missing


@REG.op(
    "sales_interpolate_linear",
    oracle=f"""
    WITH m AS (
        SELECT CAST(o_custkey % {INTERP_BUCKETS} AS BIGINT) AS bucket,
               CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT)
                 AS serial,
               count(*) AS n
        FROM orders GROUP BY 1, 2
    ), bounds AS (
        SELECT min(serial) AS lo, max(serial) AS hi FROM m
    ), spine AS (
        SELECT b.bucket, s.serial
        FROM (SELECT DISTINCT bucket FROM m) b,
             (SELECT unnest(generate_series(lo, hi)) AS serial
              FROM bounds) s
    ), g AS (
        SELECT sp.bucket, sp.serial, m.n,
               max(CASE WHEN m.n IS NOT NULL THEN sp.serial END)
                 OVER (PARTITION BY sp.bucket ORDER BY sp.serial
                       ROWS UNBOUNDED PRECEDING) AS prev_serial,
               min(CASE WHEN m.n IS NOT NULL THEN sp.serial END)
                 OVER (PARTITION BY sp.bucket ORDER BY sp.serial
                       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                 AS next_serial
        FROM spine sp LEFT JOIN m ON m.bucket = sp.bucket
                                 AND m.serial = sp.serial
    )
    SELECT g.bucket, g.serial,
           CASE WHEN g.n IS NOT NULL THEN 'obs'
                WHEN g.prev_serial IS NOT NULL AND g.next_serial IS NOT NULL
                  THEN 'interp'
                ELSE 'edge' END AS src,
           CASE WHEN g.n IS NOT NULL THEN g.n * 1000
                WHEN g.prev_serial IS NOT NULL AND g.next_serial IS NOT NULL
                  THEN (p.n * (g.next_serial - g.serial)
                        + q.n * (g.serial - g.prev_serial)) * 1000
                       // (g.next_serial - g.prev_serial)
                ELSE NULL END AS value_milli
    FROM g
    LEFT JOIN m p ON p.bucket = g.bucket AND p.serial = g.prev_serial
    LEFT JOIN m q ON q.bucket = g.bucket AND q.serial = g.next_serial
    """,
)
def sales_interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LINEAR gap interpolation over a sparse monthly demand series —
    the data-prep step between zero-fill (sales_gap_fill: absence
    means zero) and model input (many forecasters need absence to
    mean MISSING, bridged smoothly): per bucket, each missing month
    takes the line between its nearest observed neighbors, emitted in
    exact integer MILLI-units via one cross-multiplied floor division
    (no float ratio can round differently per engine). Months before
    the first / after the last observation stay null ('edge') — honest
    extrapolation refusal, flagged not faked.

    The nearest-observed-neighbor lookup is the portable idiom: a
    running max/min of observed serials (two frame windows), then the
    neighbor VALUES arrive by equi-join on (bucket, neighbor serial)
    — no IGNORE NULLS window support required of either engine.

    Scale: the spine is |buckets| × |months| (grain-sized, fact-size
    independent); two window passes over one bucket partitioning and
    two grain-sized equi-joins. The same plan interpolates any metric
    at any grain."""
    o = load(spark, sf_dir, "orders")
    m = (
        o.groupBy(
            (F.col("o_custkey") % INTERP_BUCKETS).cast("long").alias("bucket"),
            (F.year("o_orderdate") * 12 + F.month("o_orderdate"))
            .cast("long")
            .alias("serial"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    bounds = m.agg(
        F.min("serial").alias("lo"), F.max("serial").alias("hi")
    )
    spine = (
        m.select("bucket")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "bucket",
            F.explode(F.sequence("lo", "hi")).alias("serial"),
        )
    )
    g = spine.join(m, ["bucket", "serial"], "left")
    wb = W.partitionBy("bucket").orderBy("serial")
    obs_serial = F.when(F.col("n").isNotNull(), F.col("serial"))
    g = g.select(
        "bucket",
        "serial",
        "n",
        F.max(obs_serial)
        .over(wb.rowsBetween(W.unboundedPreceding, 0))
        .alias("prev_serial"),
        F.min(obs_serial)
        .over(wb.rowsBetween(0, W.unboundedFollowing))
        .alias("next_serial"),
    )
    p = m.select(
        F.col("bucket"),
        F.col("serial").alias("prev_serial"),
        F.col("n").alias("pn"),
    )
    q = m.select(
        F.col("bucket"),
        F.col("serial").alias("next_serial"),
        F.col("n").alias("qn"),
    )
    j = g.join(p, ["bucket", "prev_serial"], "left").join(
        q, ["bucket", "next_serial"], "left"
    )
    interp_ok = F.col("prev_serial").isNotNull() & F.col(
        "next_serial"
    ).isNotNull()
    return j.select(
        "bucket",
        "serial",
        F.when(F.col("n").isNotNull(), "obs")
        .when(interp_ok, "interp")
        .otherwise("edge")
        .alias("src"),
        F.when(F.col("n").isNotNull(), F.col("n") * 1000)
        .when(
            interp_ok,
            F.expr(
                "(pn * (next_serial - serial) + qn * (serial - prev_serial))"
                " * 1000 div (next_serial - prev_serial)"
            ),
        )
        .alias("value_milli"),
    )
